"""Hypothesis property tests over the trusted kernels (no Spark)."""

import numpy as np
from hypothesis import given, settings, strategies as st

from metaprofi_spark.kernels import (
    and_reduce,
    check_bits,
    mmh2_64_scalar,
    mmh2_64_windows,
    or_reduce,
    set_bits,
    shingle_positions,
    shingle_windows,
)
from metaprofi_spark.kernels.bits import bit_matrix_transpose
from metaprofi_spark.kernels.mmh2 import mmh2_64_bytes


@given(st.binary(min_size=1, max_size=40), st.integers(0, 7))
@settings(max_examples=200, deadline=None)
def test_mmh2_vectorized_equals_scalar(data, seed):
    w = np.frombuffer(data, dtype=np.uint8)[None, :]
    assert int(mmh2_64_windows(w, [seed])[0, 0]) == mmh2_64_scalar(data, seed)


@given(st.lists(st.binary(min_size=0, max_size=24), min_size=1, max_size=30))
@settings(max_examples=100, deadline=None)
def test_mmh2_bytes_batch_equals_scalar(vals):
    out = mmh2_64_bytes(vals, [0, 3])
    for i, v in enumerate(vals):
        assert int(out[i, 0]) == mmh2_64_scalar(v, 0)
        assert int(out[i, 1]) == mmh2_64_scalar(v, 3)


@given(
    st.lists(st.text(max_size=30), min_size=1, max_size=10),
    st.integers(1, 9),
)
@settings(max_examples=100, deadline=None)
def test_shingle_window_count_and_fast_parity(texts, k):
    doc_idx, windows = shingle_windows(texts, k, "lower")
    expected = sum(
        max(len(t.lower().encode("utf-8")) - k + 1, 0) for t in texts
    )
    assert len(windows) == expected
    # fast unaligned-load path == window-matrix path
    d2, pos = shingle_positions(texts, k, [0, 1], 1 << 20, "lower")
    assert (d2 == doc_idx).all()
    if len(windows):
        ref = mmh2_64_windows(windows, np.array([0, 1], dtype=np.uint64)) % np.uint64(1 << 20)
        assert (pos == ref).all()


@given(st.lists(st.integers(0, 255), min_size=1, max_size=64),
       st.lists(st.integers(0, 255), min_size=1, max_size=64))
@settings(max_examples=100, deadline=None)
def test_or_and_reduce_algebra(a_bytes, b_bytes):
    n = max(len(a_bytes), len(b_bytes))
    a = bytes(a_bytes)
    b = bytes(b_bytes)
    o1 = or_reduce([a, b], n)
    o2 = or_reduce([b, a], n)
    assert o1 == o2                       # commutative
    assert or_reduce([o1, a], n) == o1    # absorbing/idempotent
    assert and_reduce([a, a], len(a_bytes)) == a  # idempotent


@given(st.lists(st.integers(0, (1 << 16) - 1), min_size=1, max_size=100))
@settings(max_examples=100, deadline=None)
def test_set_then_check_bits(positions):
    buf = np.zeros(1 << 13, dtype=np.uint8)
    pos = np.array(positions, dtype=np.uint64)
    set_bits(buf, pos)
    assert check_bits(buf, pos).all()     # zero false negatives
    universe = np.arange(1 << 16, dtype=np.uint64)
    outside = np.setdiff1d(universe, pos)
    assert not check_bits(buf, outside).any()  # no stray bits => exact


@given(st.integers(1, 8), st.integers(1, 8), st.integers(0, 2**32 - 1))
@settings(max_examples=100, deadline=None)
def test_bit_transpose_involution(rows8, cols, seed):
    rng = np.random.default_rng(seed)
    mats = rng.integers(0, 256, (rows8 * 8, cols), dtype=np.uint8)
    t = bit_matrix_transpose(mats)
    back = bit_matrix_transpose(t)
    assert (back == mats).all()           # transpose is an involution
