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
"none" is the identity path (the aminoacid branch, pyx:114-129).
"""

from __future__ import annotations

from collections.abc import Iterable, Sequence

import numpy as np
from numpy.lib.stride_tricks import sliding_window_view

from metaprofi_spark.kernels.mmh2 import mmh2_64_windows


def _encode_batch(texts: Iterable[str | None], k: int, normalize: str):
    """UTF-8 encode a batch; returns (joined uint8 buffer, doc lens)."""
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
    return doc_idx, view[starts]


def shingle_positions(
    texts: Sequence[str | None],
    k: int,
    seeds: Sequence[int],
    m: int,
    normalize: str = "lower",
) -> tuple[np.ndarray, np.ndarray]:
    """Shingle + hash a batch: the fused T1→T5→T7 kernel.

    Returns:
        doc_idx: (W,) int64 — source doc of each k-gram
        positions: (W, h) uint64 — Bloom bit positions (hash % m,
            bloomfilter_cython.pyx:107-111)
    """
    doc_idx, windows = shingle_windows(texts, k, normalize)
    if len(doc_idx) == 0:
        return doc_idx, np.empty((0, len(seeds)), dtype=np.uint64)
    hashes = mmh2_64_windows(windows, np.asarray(seeds, dtype=np.uint64))
    return doc_idx, hashes % np.uint64(m)
