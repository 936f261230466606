"""Kernel parity + property tests (no Spark): mmh2-64, shingling, bits."""

import numpy as np
import pytest

from metaprofi_spark.kernels import (
    and_reduce,
    mmh2_64_scalar,
    mmh2_64_windows,
    or_reduce,
    pack_bits,
    set_bits,
    shingle_positions,
    shingle_windows,
    check_bits,
    unpack_bits,
)

rng = np.random.default_rng(42)


# Known-answer vectors for canonical MurmurHash64A (computed with the
# public-domain reference C implementation semantics via the scalar path;
# pinned here so a regression in EITHER implementation is caught).
KNOWN = [
    (b"", 0),
    (b"a", 0),
    (b"a", 1),
    (b"abcdefgh", 0),        # exactly one block, no tail
    (b"abcdefghi", 7),       # block + 1-byte tail
    (b"hello world!", 3),    # tail size 4
    ("naïve-ütf8".encode("utf-8"), 2),
]


def test_scalar_matches_vectorized_known():
    for data, seed in KNOWN:
        if not data:
            continue
        w = np.frombuffer(data, dtype=np.uint8)[None, :]
        vec = mmh2_64_windows(w, [seed])[0, 0]
        assert int(vec) == mmh2_64_scalar(data, seed), (data, seed)


@pytest.mark.parametrize("length", list(range(1, 26)))  # all 7 tail cases, k<8,=8,>8
def test_vectorized_parity_all_tail_sizes(length):
    n = 64
    windows = rng.integers(0, 256, size=(n, length), dtype=np.uint8)
    seeds = [0, 1, 2]
    vec = mmh2_64_windows(windows, seeds)
    for i in range(0, n, 7):
        data = windows[i].tobytes()
        for s_i, s in enumerate(seeds):
            assert int(vec[i, s_i]) == mmh2_64_scalar(data, s)


def test_seed_zero_one_differ():
    w = rng.integers(0, 256, size=(10, 12), dtype=np.uint8)
    h = mmh2_64_windows(w, [0, 1])
    assert (h[:, 0] != h[:, 1]).all()


def test_shingle_windows_basic():
    doc_idx, windows = shingle_windows(["abcde", "xy", None, "hellO"], 3, "lower")
    # doc0: abc bcd cde; doc1: too short; doc3: hel ell llo (lowered)
    got = [(int(d), w.tobytes().decode()) for d, w in zip(doc_idx, windows)]
    assert got == [
        (0, "abc"), (0, "bcd"), (0, "cde"),
        (3, "hel"), (3, "ell"), (3, "llo"),
    ]


def test_shingle_no_cross_doc_windows():
    texts = ["aaaa", "bbbb"]
    _, windows = shingle_windows(texts, 4, "none")
    strs = {w.tobytes() for w in windows}
    assert strs == {b"aaaa", b"bbbb"}  # no 'aabb'-style boundary window


def test_shingle_utf8_bytes():
    # k-grams are over UTF-8 BYTES (multi-byte chars split), matching the
    # reference's char* windowing of the UTF-8 buffer.
    t = "héllo"
    b = t.encode("utf-8")
    _, windows = shingle_windows([t], 3, "none")
    assert len(windows) == len(b) - 3 + 1
    assert windows[0].tobytes() == b[:3]


def test_shingle_positions_bounds():
    doc_idx, pos = shingle_positions(["hello world"] * 3, 4, [0, 1], 1000)
    assert pos.shape == (3 * 8, 2)
    assert (pos < 1000).all()
    # same text => same positions per doc
    assert (pos[:8] == pos[8:16]).all()


def test_bits_roundtrip():
    m = 128
    buf = np.zeros(m // 8, dtype=np.uint8)
    pos = np.array([0, 1, 7, 8, 63, 127], dtype=np.uint64)
    set_bits(buf, pos)
    assert check_bits(buf, pos).all()
    assert not check_bits(buf, np.array([2, 9, 126], dtype=np.uint64)).any()
    bits = unpack_bits(buf, m)
    assert sorted(np.nonzero(bits)[0]) == sorted(int(p) for p in pos)
    assert pack_bits(bits).tobytes() == buf.tobytes()


def test_bits_little_endian_order():
    buf = np.zeros(2, dtype=np.uint8)
    set_bits(buf, np.array([0], dtype=np.uint64))
    assert buf[0] == 1  # bit 0 -> LSB of byte 0 (pyx:47-59 semantics)
    set_bits(buf, np.array([9], dtype=np.uint64))
    assert buf[1] == 2


def test_or_and_reduce_properties():
    nbytes = 16
    blobs = [rng.integers(0, 256, nbytes, dtype=np.uint8).tobytes() for _ in range(5)]
    o = or_reduce(blobs, nbytes)
    a = and_reduce(blobs, nbytes)
    # commutative + associative: any permutation/merge-tree equal
    perm = [blobs[i] for i in [3, 0, 4, 1, 2]]
    assert or_reduce(perm, nbytes) == o
    assert and_reduce(perm, nbytes) == a
    left = or_reduce([or_reduce(blobs[:2], nbytes), or_reduce(blobs[2:], nbytes)], nbytes)
    assert left == o
    # idempotent
    assert or_reduce([o, o], nbytes) == o
    # zero-extension of short buffers
    assert or_reduce([b"\x01", bytes(nbytes)], nbytes)[0] == 1


def test_bloom_merge_associativity():
    """bf(A ∪ B) == or(bf(A), bf(B)) — the north-rule merge property."""
    m = 4096
    texts_a = ["the quick brown fox", "jumps over"]
    texts_b = ["the lazy dog", "pack my box"]

    def build(texts):
        buf = np.zeros(m // 8, dtype=np.uint8)
        _, pos = shingle_positions(texts, 5, [0, 1], m)
        set_bits(buf, pos)
        return buf

    merged = or_reduce([build(texts_a).tobytes(), build(texts_b).tobytes()], m // 8)
    assert merged == build(texts_a + texts_b).tobytes()


def test_bit_matrix_transpose_vs_naive():
    from metaprofi_spark.kernels.bits import bit_matrix_transpose

    for n, w in [(8, 2), (16, 3), (24, 8), (2048, 64), (12, 4)]:  # incl. pad case
        mats = rng.integers(0, 256, (n, w), dtype=np.uint8)
        naive = np.packbits(
            np.unpackbits(mats, axis=1, bitorder="little").T, axis=1, bitorder="little"
        )
        got = bit_matrix_transpose(mats)
        assert got.shape == naive.shape and (got == naive).all(), (n, w)
        # width padding
        wide = bit_matrix_transpose(mats, out_width_bytes=naive.shape[1] + 2)
        assert (wide[:, : naive.shape[1]] == naive).all()
        assert not wide[:, naive.shape[1]:].any()


def test_list_float_matrix_layouts():
    """Arrow list<float>/large_list/fixed_size_list + slice offsets all
    yield the same (n, dim) matrix; ragged and null inputs raise."""
    import pyarrow as pa
    import pytest as _pytest

    from metaprofi_spark.kernels.arrowbuf import list_float_matrix

    rows = [[1.0, 2.0, 3.0], [4.0, 5.0, 6.0], [7.0, 8.0, 9.0]]
    want = np.asarray(rows, dtype=np.float32)
    for typ in (
        pa.list_(pa.float32()),
        pa.large_list(pa.float32()),
        pa.list_(pa.float32(), 3),
    ):
        arr = pa.array(rows, typ)
        assert (list_float_matrix(arr) == want).all(), typ
        # slice offsets honored (the pyarrow-16 buffer-offset trap)
        assert (list_float_matrix(arr.slice(1, 2)) == want[1:]).all(), typ
    with _pytest.raises(ValueError, match="ragged"):
        list_float_matrix(pa.array([[1.0], [2.0, 3.0]], pa.list_(pa.float32())))
    with _pytest.raises(ValueError, match="null rows"):
        list_float_matrix(pa.array([[1.0, 2.0], None], pa.list_(pa.float32())))
    with _pytest.raises(ValueError, match="null values"):
        list_float_matrix(pa.array([[1.0, None]], pa.list_(pa.float32())))
    assert list_float_matrix(pa.array([], pa.list_(pa.float32()))).size == 0


def test_list_string_runs_null_tokens_hash_as_empty():
    """Null TOKENS inside a list<string> are explicitly filled to ''
    before buffer slicing (r3 advice: the Arrow spec does not promise
    zero-width offsets for nulls, so relying on the layout would hash
    garbage)."""
    import pyarrow as pa

    from metaprofi_spark.kernels.arrowbuf import list_string_runs

    col = pa.array([["ab", None, "c"], None, ["d"]], pa.list_(pa.string()))
    counts, data, offsets = list_string_runs(col)
    assert counts.tolist() == [3, 0, 1]
    toks = [
        bytes(data[offsets[i]:offsets[i + 1]]) for i in range(len(offsets) - 1)
    ]
    assert toks == [b"ab", b"", b"c", b"d"]


def test_translate_vectorized_equals_scalar():
    """Vectorized base-5 LUT translation == the scalar dict oracle,
    incl. ambiguity codes, lowercase leftovers, and tail lengths."""
    import random

    from metaprofi_spark.kernels.bio import translate, translate_scalar

    r = random.Random(42)
    # incl. non-ACGT, a space, AND non-latin-1 chars (Ω, em-dash):
    # the r4 review caught a strict latin-1 encode crashing where the
    # scalar path mapped the codon to 'X'
    alphabet = "ACGTN RYacgtΩ—"
    for _ in range(200):
        s = "".join(r.choice(alphabet) for _ in range(r.randrange(0, 40)))
        assert translate(s) == translate_scalar(s), s
    assert translate("") == "" and translate("AC") == ""
    assert translate("ATGTAA") == "M_"
    assert translate("AΩGACG") == "XT"  # unicode codon -> X, frame kept
