"""Count–min sketch kernel — (d, w) int64 counters, numpy-vectorized.

Cormode–Muthukrishnan CMS: row r uses MurmurHash2-64 with seed r
(mirroring the Bloom filter's seeds-0..h-1 convention,
/root/reference/metaprofi/lib/bloomfilter_cython.pyx:93-94);
estimate = min over rows — always an OVERestimate, and with
w = ceil(e/eps), d = ceil(ln(1/delta)) the published bound holds:
    true <= est <= true + eps * N   with prob >= 1 - delta.
Merge = elementwise sum (associative + commutative).
"""

from __future__ import annotations

import math

import numpy as np

from metaprofi_spark.kernels.mmh2 import mmh2_64_buffer, mmh2_64_bytes


def cms_params(eps: float, delta: float) -> tuple[int, int]:
    """(depth d, width w) for an (eps, delta) guarantee."""
    return math.ceil(math.log(1.0 / delta)), math.ceil(math.e / eps)


def cms_init(depth: int = 4, width: int = 2048) -> np.ndarray:
    if depth < 1 or width < 1:
        raise ValueError("depth and width must be >= 1")
    return np.zeros((depth, width), dtype=np.int64)


def _hash_any(values, seeds):
    """list[bytes] or Arrow-layout (data, offsets) tuple -> (n, len(seeds))."""
    if isinstance(values, tuple):
        data, offsets = values
        return mmh2_64_buffer(data, offsets, seeds)
    return mmh2_64_bytes(values, seeds)


def _n_values(values) -> int:
    return len(values[1]) - 1 if isinstance(values, tuple) else len(values)


def cms_add(table: np.ndarray, values, counts: np.ndarray | None = None) -> None:
    """Fold a batch (optionally pre-aggregated with counts) in place.
    ``values``: list[bytes] or an Arrow (data, offsets) tuple."""
    n = _n_values(values)
    if n == 0:
        return
    d, w = table.shape
    if counts is None:
        counts = np.ones(n, dtype=np.int64)
    h = _hash_any(values, list(range(d)))  # (n, d)
    idx = (h % np.uint64(w)).astype(np.int64)
    for r in range(d):
        np.add.at(table[r], idx[:, r], counts)


def cms_merge(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    if a.shape != b.shape:
        raise ValueError("cannot merge CMS sketches with different geometry")
    return a + b


def cms_query(table: np.ndarray, values) -> np.ndarray:
    """Point estimates (min over rows) for a batch of keys."""
    d, w = table.shape
    if _n_values(values) == 0:
        return np.empty(0, dtype=np.int64)
    h = _hash_any(values, list(range(d)))
    idx = (h % np.uint64(w)).astype(np.int64)
    ests = np.stack([table[r][idx[:, r]] for r in range(d)])
    return ests.min(axis=0)


def cms_serialize(table: np.ndarray) -> bytes:
    d, w = table.shape
    return np.array([d, w], dtype=np.int64).tobytes() + table.tobytes()


def cms_deserialize(blob: bytes) -> np.ndarray:
    hdr = np.frombuffer(blob[:16], dtype=np.int64)
    return np.frombuffer(blob[16:], dtype=np.int64).reshape(int(hdr[0]), int(hdr[1])).copy()
