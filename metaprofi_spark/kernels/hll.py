"""HyperLogLog kernel — dense 2^p registers, numpy-vectorized.

Classic Flajolet–Fuchs–Gandouet–Meunier HLL over the 64-bit
MurmurHash2 value stream (published relative error ~1.04/sqrt(2^p)),
with linear-counting small-range correction.  Registers merge by
elementwise max — associative, commutative, idempotent — which is what
makes it a valid Spark partial+final aggregate.

Sibling of the Bloom UDAF per SURVEY.md §2.4 (the reference has no HLL;
this is the north-rule extension sharing the same mergeable-UDAF shape).
"""

from __future__ import annotations

import numpy as np

from metaprofi_spark.kernels.mmh2 import mmh2_64_buffer, mmh2_64_bytes


def _alpha(m: int) -> float:
    if m == 16:
        return 0.673
    if m == 32:
        return 0.697
    if m == 64:
        return 0.709
    return 0.7213 / (1.0 + 1.079 / m)


def hll_init(p: int = 12) -> np.ndarray:
    if not 4 <= p <= 18:
        raise ValueError("p must be in [4, 18]")
    return np.zeros(1 << p, dtype=np.uint8)


def _clz_in_q_bits(w: np.ndarray, q: int) -> np.ndarray:
    """Number of leading zeros of w viewed as a q-bit integer."""
    # binary-search style clz, fully vectorized (6 steps for 64-bit)
    bitlen = np.zeros(w.shape, dtype=np.int64)
    v = w.copy()
    for shift in (32, 16, 8, 4, 2, 1):
        mask = v >= (np.uint64(1) << np.uint64(shift))
        bitlen[mask] += shift
        v[mask] >>= np.uint64(shift)
    bitlen[w > 0] += 1  # bit_length
    return q - bitlen


def hll_add(registers: np.ndarray, values) -> None:
    """Fold a batch into the register file, in place.  ``values`` is a
    list[bytes] OR an Arrow-layout (data uint8, offsets int64) tuple
    (kernels/arrowbuf.py) — the latter never touches per-row Python."""
    if isinstance(values, tuple):
        data, offsets = values
        if len(offsets) <= 1:
            return
        h = mmh2_64_buffer(data, offsets, [0])[:, 0]
    elif values:
        h = mmh2_64_bytes(values, [0])[:, 0]
    else:
        return
    p = int(np.log2(len(registers)))
    q = 64 - p
    idx = (h >> np.uint64(q)).astype(np.int64)
    w = h & ((np.uint64(1) << np.uint64(q)) - np.uint64(1))
    rho = (_clz_in_q_bits(w, q) + 1).astype(np.uint8)
    np.maximum.at(registers, idx, rho)


def hll_merge(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    if len(a) != len(b):
        raise ValueError("cannot merge HLL sketches with different p")
    return np.maximum(a, b)


def hll_estimate(registers: np.ndarray) -> float:
    m = len(registers)
    est = _alpha(m) * m * m / np.sum(np.exp2(-registers.astype(np.float64)))
    if est <= 2.5 * m:
        zeros = int(np.count_nonzero(registers == 0))
        if zeros:
            return m * np.log(m / zeros)  # linear counting
    return float(est)


def hll_error_bound(p: int) -> float:
    """Published standard error: 1.04 / sqrt(2^p)."""
    return 1.04 / np.sqrt(1 << p)


def hll_serialize(registers: np.ndarray) -> bytes:
    return registers.tobytes()


def hll_deserialize(blob: bytes) -> np.ndarray:
    return np.frombuffer(blob, dtype=np.uint8).copy()
