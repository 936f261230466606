"""Byte-level k-gram shingling over batches of texts, vectorized.

The reference shingles the UTF-8 byte buffer of each sequence with a
sliding window of length k (loop at
/root/reference/metaprofi/lib/bloomfilter_cython.pyx:101-106); sequences
shorter than k produce nothing (pyx:103).  We do the same over a whole
Arrow batch at once: concatenate all texts into one byte buffer, take a
single strided window view, and keep only windows that do not cross a
document boundary.

Normalization ("lower") is the webtext analog of canonical_kmer
(pyx:272-306): a deterministic canonicalization applied before hashing;
"none" is the identity path (the aminoacid branch, pyx:114-129);
"canonical" is the reference's nucleotide mode — each window is
replaced by min(window, revcomp(window)) using the pyx basemap
(A<->T, C<->G, U->A, N->N, lowercase likewise; anything else
complements to NUL), vectorized over the whole window matrix.
"""

from __future__ import annotations

from collections.abc import Iterable, Sequence

import numpy as np
from numpy.lib.stride_tricks import sliding_window_view

from metaprofi_spark.kernels.mmh2 import mmh2_64_windows


def _encode_batch(texts: Iterable[str | None], k: int, normalize: str):
    """UTF-8 encode a batch; returns (joined uint8 buffer, doc lens).

    "canonical" normalization is per-WINDOW (min of window and its
    reverse complement), so the buffer itself is encoded identity here
    and canonicalized after windowing."""
    bufs = []
    lens = []
    for t in texts:
        if t is None:
            t = ""
        if normalize == "lower":
            t = t.lower()
        b = t.encode("utf-8")
        bufs.append(b)
        lens.append(len(b))
    joined = np.frombuffer(b"".join(bufs), dtype=np.uint8)
    return joined, np.asarray(lens, dtype=np.int64)


# the reference's canonical-kmer basemap (bloomfilter_cython.pyx:287):
# A<->T, C<->G, U->A, N->N, lowercase a<->t / c<->g / u->a; every other
# byte complements to NUL (which sorts first, exactly like the C code)
_CANON_TABLE = np.zeros(256, dtype=np.uint8)
for _a, _b in ((65, 84), (67, 71), (71, 67), (78, 78), (84, 65), (85, 65),
               (97, 116), (99, 103), (103, 99), (116, 97), (117, 97)):
    _CANON_TABLE[_a] = _b


def canonicalize_windows(windows: np.ndarray) -> np.ndarray:
    """min(window, revcomp(window)) per row, vectorized — T2 of
    SURVEY.md §2.3 (bloomfilter_cython.pyx:272-306 semantics: byte-wise
    lexicographic compare, ties keep the forward window)."""
    if len(windows) == 0:
        return windows
    comp = _CANON_TABLE[windows][:, ::-1]
    neq = windows != comp
    any_neq = neq.any(axis=1)
    first = np.where(any_neq, neq.argmax(axis=1), 0)
    rows = np.arange(len(windows))
    take_rc = windows[rows, first] > comp[rows, first]
    return np.where(take_rc[:, None], comp, windows)


def shingle_windows(
    texts: Sequence[str | None], k: int, normalize: str = "lower"
) -> tuple[np.ndarray, np.ndarray]:
    """All k-byte windows of every text in the batch.

    Returns:
        doc_idx: (W,) int64 — index into ``texts`` of each window's doc
        windows: (W, k) uint8 — the window bytes
    """
    joined, lens = _encode_batch(texts, k, normalize)
    counts = np.maximum(lens - k + 1, 0)  # windows per doc (pyx:103 filter)
    total = int(counts.sum())
    if total == 0:
        return np.empty(0, dtype=np.int64), np.empty((0, k), dtype=np.uint8)
    doc_idx = np.repeat(np.arange(len(lens), dtype=np.int64), counts)
    offsets = np.concatenate(([0], np.cumsum(lens)[:-1]))
    # global start byte of each window: doc offset + within-doc position
    within = np.arange(total, dtype=np.int64) - np.repeat(
        np.concatenate(([0], np.cumsum(counts)[:-1])), counts
    )
    starts = offsets[doc_idx] + within
    view = sliding_window_view(joined, k)
    windows = view[starts]
    if normalize == "canonical":
        windows = canonicalize_windows(np.ascontiguousarray(windows))
    return doc_idx, windows


_M = np.uint64(0xC6A4A7935BD1E995)
_R = np.uint64(47)


def _window_starts(lens: np.ndarray, k: int) -> tuple[np.ndarray, np.ndarray]:
    counts = np.maximum(lens - k + 1, 0)
    total = int(counts.sum())
    if total == 0:
        e = np.empty(0, dtype=np.int64)
        return e, e
    doc_idx = np.repeat(np.arange(len(lens), dtype=np.int64), counts)
    offsets = np.concatenate(([0], np.cumsum(lens)[:-1]))
    within = np.arange(total, dtype=np.int64) - np.repeat(
        np.concatenate(([0], np.cumsum(counts)[:-1])), counts
    )
    return doc_idx, offsets[doc_idx] + within


def shingle_positions(
    texts: Sequence[str | None],
    k: int,
    seeds: Sequence[int],
    m: int,
    normalize: str = "lower",
) -> tuple[np.ndarray, np.ndarray]:
    """Shingle + hash a batch: the fused T1→T5→T7 kernel.

    Never materializes the (W, k) window matrix: each window's 8-byte
    blocks are read as unaligned little-endian uint64 gathers straight
    from the concatenated text buffer (identical hash semantics to
    mmh2_64_windows — parity-tested against it).

    Returns:
        doc_idx: (W,) int64 — source doc of each k-gram
        positions: (W, h) uint64 — Bloom bit positions (hash % m,
            bloomfilter_cython.pyx:107-111)
    """
    seeds = np.asarray(seeds, dtype=np.uint64)
    if normalize == "canonical":
        # canonicalization rewrites window BYTES, so the zero-copy
        # gather path below doesn't apply: materialize windows,
        # canonicalize, hash the fixed-width matrix
        doc_idx, windows = shingle_windows(texts, k, normalize)
        if len(doc_idx) == 0:
            return doc_idx, np.empty((0, len(seeds)), dtype=np.uint64)
        with np.errstate(over="ignore"):
            h = mmh2_64_windows(windows, seeds) % np.uint64(m)
        return doc_idx, h
    joined, lens = _encode_batch(texts, k, normalize)
    doc_idx, starts = _window_starts(lens, k)
    if len(doc_idx) == 0:
        return doc_idx, np.empty((0, len(seeds)), dtype=np.uint64)
    # zero-padded buffer + unaligned uint64 view (stride = 1 byte)
    buf = np.empty(len(joined) + 8, dtype=np.uint8)
    buf[: len(joined)] = joined
    buf[len(joined):] = 0
    u64 = np.ndarray(
        buffer=buf.data, dtype="<u8", shape=(len(buf) - 7,), strides=(1,)
    )
    n = len(starts)
    nblocks = k // 8
    tail_size = k & 7
    # cache-resident window slices: the per-slice temporaries (kb, h)
    # stay in L2, which is what lets this stage scale with cores on a
    # RAM-bandwidth-limited box (see kernels/mmh2.py:_SLICE_ELEMS)
    from metaprofi_spark.kernels.mmh2 import _SLICE_ELEMS

    nseeds = len(seeds)
    limit = max(_SLICE_ELEMS // max(nseeds, 1), 1024)
    out = np.empty((n, nseeds), dtype=np.uint64)
    with np.errstate(over="ignore"):
        init = seeds ^ (_M * np.uint64(k))
        mod = np.uint64(m)
        for lo in range(0, n, limit):
            s = starts[lo : lo + limit]
            h = np.broadcast_to(init, (len(s), nseeds)).copy()
            for b in range(nblocks):
                kb = u64[s + 8 * b]
                kb *= _M
                kb ^= kb >> _R
                kb *= _M
                h ^= kb[:, None]
                h *= _M
            if tail_size:
                mask = np.uint64((1 << (8 * tail_size)) - 1)
                kt = u64[s + 8 * nblocks] & mask
                h ^= kt[:, None]
                h *= _M
            h ^= h >> _R
            h *= _M
            h ^= h >> _R
            h %= mod
            out[lo : lo + limit] = h
    return doc_idx, out
