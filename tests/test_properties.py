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


@given(st.lists(st.binary(min_size=0, max_size=24), min_size=0, max_size=30))
@settings(max_examples=100, deadline=None)
def test_mmh2_buffer_equals_bytes(vals):
    """Arrow-layout buffer kernel (the mapInArrow hot path) == the
    list[bytes] kernel == the scalar oracle, including empty strings,
    empty batches, and arbitrary length mixes."""
    from metaprofi_spark.kernels.mmh2 import mmh2_64_buffer

    data = np.frombuffer(b"".join(vals), dtype=np.uint8)
    offsets = np.concatenate(([0], np.cumsum([len(v) for v in vals]))).astype(np.int64)
    got = mmh2_64_buffer(data, offsets, [0, 3])
    want = mmh2_64_bytes(vals, [0, 3])
    assert got.shape == want.shape and (got == want).all()


@given(st.lists(st.text(min_size=0, max_size=12), min_size=0, max_size=25))
@settings(max_examples=100, deadline=None)
def test_series_utf8_buffer_matches_encode(vals):
    """pyarrow-extracted UTF-8 buffers == python .encode("utf-8") per
    element (the sketch-fold fast path must hash identical bytes)."""
    import pandas as pd

    from metaprofi_spark.kernels.arrowbuf import series_utf8_buffer

    buf = series_utf8_buffer(pd.Series(vals, dtype=object))
    assert buf is not None
    data, offsets = buf
    got = [bytes(data[offsets[i]:offsets[i + 1]]) for i in range(len(offsets) - 1)]
    assert got == [v.encode("utf-8") for v in vals]


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


@given(
    st.lists(st.integers(0, 500), min_size=1, max_size=300),
    st.integers(0, 2**31 - 1),
)
@settings(max_examples=50, deadline=None)
def test_hll_merge_tree_shape_irrelevant(items, seed):
    """Any random merge tree over any partition == one-shot build."""
    from metaprofi_spark.kernels import hll as H

    vals = [f"v{i}".encode() for i in items]
    one = H.hll_init(8)
    H.hll_add(one, vals)
    rng = np.random.default_rng(seed)
    # random partition into 1..4 parts
    nparts = int(rng.integers(1, 5))
    parts = [[] for _ in range(nparts)]
    for v in vals:
        parts[int(rng.integers(0, nparts))].append(v)
    sketches = []
    for part in parts:
        s = H.hll_init(8)
        H.hll_add(s, part)
        sketches.append(s)
    # random merge tree
    while len(sketches) > 1:
        i = int(rng.integers(0, len(sketches) - 1))
        a = sketches.pop(i)
        b = sketches.pop(int(rng.integers(0, len(sketches))))
        sketches.append(H.hll_merge(a, b))
    assert (sketches[0] == one).all()


@given(
    st.lists(st.tuples(st.text(min_size=1, max_size=6), st.integers(1, 50)),
             min_size=1, max_size=60),
    st.integers(0, 2**31 - 1),
)
@settings(max_examples=50, deadline=None)
def test_cms_merge_tree_shape_irrelevant(pairs, seed):
    from metaprofi_spark.kernels import cms as C

    keys = [k.encode() for k, _ in pairs]
    counts = np.array([c for _, c in pairs], dtype=np.int64)
    one = C.cms_init(3, 64)
    C.cms_add(one, keys, counts)
    rng = np.random.default_rng(seed)
    nparts = int(rng.integers(1, 4))
    tables = [C.cms_init(3, 64) for _ in range(nparts)]
    for i, (k, c) in enumerate(zip(keys, counts)):
        t = int(rng.integers(0, nparts))
        C.cms_add(tables[t], [k], np.array([c], dtype=np.int64))
    merged = tables[0]
    for t in tables[1:]:
        merged = C.cms_merge(merged, t)
    assert (merged == one).all()


@given(
    st.lists(st.binary(min_size=6, max_size=6), min_size=1, max_size=80),
)
@settings(max_examples=200, deadline=None)
def test_canonicalize_windows_matches_scalar(windows_bytes):
    """Vectorized canonical k-mer == per-row basemap min(kmer, revcomp)
    for ARBITRARY bytes (not just ACGT)."""
    from metaprofi_spark.kernels.shingle import canonicalize_windows

    table = {65: 84, 67: 71, 71: 67, 78: 78, 84: 65, 85: 65,
             97: 116, 99: 103, 103: 99, 116: 97, 117: 97}
    mat = np.frombuffer(b"".join(windows_bytes), dtype=np.uint8).reshape(
        len(windows_bytes), 6
    )
    got = canonicalize_windows(mat.copy())
    for i, w in enumerate(windows_bytes):
        rc = bytes(table.get(b, 0) for b in reversed(w))
        assert bytes(got[i]) == min(w, rc), w


@given(
    st.lists(
        st.text(alphabet="abcXY @", min_size=0, max_size=30),
        min_size=1, max_size=12,
    )
)
@settings(max_examples=100, deadline=None)
def test_hash_queries_invariants(texts):
    """Vectorized hash_queries invariants for arbitrary query batches:
    per-query weights sum to the occurrence count, n_slices equals the
    number of emitted rows per k-gram AND the count of distinct hash
    positions, kgram_idx is a dense 0..u-1 rank."""
    from metaprofi_spark import SketchConfig
    from metaprofi_spark.kernels.mmh2 import mmh2_64_windows
    from metaprofi_spark.operators.bloom_search import hash_queries

    cfg = SketchConfig(k=3, h=3, m=64, chunk_bits=64, slice_buckets=2,
                       slice_range_size=8)
    queries = [(f"q{i}", t) for i, t in enumerate(texts)]
    pdf, n_kgrams = hash_queries(queries, cfg)
    for i, t in enumerate(texts):
        qid = f"q{i}"
        sub = pdf[pdf["query_id"] == qid]
        nk_expected = max(len(t.lower().encode()) - cfg.k + 1, 0)
        assert n_kgrams[qid] == nk_expected
        if nk_expected == 0:
            assert len(sub) == 0
            continue
        # weight: each unique kgram's weight counted once (rows are
        # duplicated per distinct slice)
        per_kg = sub.groupby("kgram_idx")
        w_sum = sum(g["weight"].iloc[0] for _, g in per_kg)
        assert w_sum == nk_expected
        ks = sorted(sub["kgram_idx"].unique())
        assert ks == list(range(len(ks)))  # dense rank
        text_b = t.lower().encode()
        uniq_windows = sorted({text_b[j:j+cfg.k] for j in range(nk_expected)})
        assert len(ks) == len(uniq_windows)
        for kg, g in per_kg:
            w = uniq_windows[kg]
            pos = mmh2_64_windows(
                np.frombuffer(w, dtype=np.uint8).reshape(1, cfg.k),
                np.asarray(cfg.seeds, dtype=np.uint64),
            )[0] % np.uint64(cfg.m_padded)
            distinct = sorted(set(int(p) for p in pos))
            assert sorted(g["slice_id"]) == distinct
            assert (g["n_slices"] == len(distinct)).all()


@given(
    st.integers(1, 16),  # dim
    st.integers(0, 40),  # rows
    st.integers(0, 5),   # slice offset
    st.sampled_from(["list", "large_list", "fixed"]),
    st.integers(0, 2**32 - 1),
)
@settings(max_examples=60, deadline=None)
def test_list_float_matrix_property(dim, n, off, kind, seed):
    """list_float_matrix == np.array(rows) for every layout, any slice
    offset (the pyarrow buffer-offset trap), any dtype-roundtrippable
    float values."""
    import pyarrow as pa

    from metaprofi_spark.kernels.arrowbuf import list_float_matrix

    rng = np.random.default_rng(seed)
    rows = rng.standard_normal((n, dim)).astype(np.float32)
    typ = {
        "list": pa.list_(pa.float32()),
        "large_list": pa.large_list(pa.float32()),
        "fixed": pa.list_(pa.float32(), dim),
    }[kind]
    arr = pa.array([list(map(float, r)) for r in rows], typ)
    got = list_float_matrix(arr)
    assert got.shape == (n, dim) if n else got.size == 0
    if n:
        assert (got == rows).all()
    off = min(off, n)
    sliced = list_float_matrix(arr.slice(off, n - off))
    if n - off:
        assert (sliced == rows[off:]).all()
    else:
        assert sliced.size == 0


@given(
    st.lists(
        st.tuples(st.integers(0, 11), st.integers(0, 11)),
        min_size=0,
        max_size=20,
    ),
    st.integers(0, 2**32 - 1),
)
@settings(max_examples=40, deadline=None)
def test_min_label_chain_sql_equals_union_find(edge_list, seed):
    """The unrolled DuckDB min-label chain (the oracle behind the
    verified component gate rows) must equal union-find components on
    arbitrary graphs whenever rounds >= propagation distance — with 12
    nodes, 12 rounds always suffice, so the sentinel must never fire
    and the labels must match exactly."""
    import duckdb

    from metaprofi_spark.operators.dedup import min_label_chain_sql

    nodes = list(range(12))
    edges = [(a, b) for a, b in edge_list if a != b]
    # union-find ground truth
    parent = {i: i for i in nodes}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    expect = {i: find(i) for i in nodes}

    if edges:
        pair_vals = ", ".join(f"({a}, {b})" for a, b in edges)
        pairs_cte = f"pairs(id_a, id_b) AS (VALUES {pair_vals})"
    else:
        pairs_cte = "pairs(id_a, id_b) AS (SELECT 0, 0 WHERE 1=0)"
    node_vals = ", ".join(f"({i}, {i})" for i in nodes)
    q = f"""
WITH {pairs_cte},
e AS (SELECT id_a AS src, id_b AS dst FROM pairs
      UNION ALL SELECT id_b, id_a FROM pairs),
l0 AS (SELECT * FROM (VALUES {node_vals}) t(id, lbl)),
{min_label_chain_sql(12)}
SELECT id, lbl FROM l12
UNION ALL
SELECT -1, -1 FROM moved WHERE n > 0
"""
    got = dict(duckdb.connect().execute(q).fetchall())
    assert -1 not in got  # converged: sentinel silent
    assert got == expect
