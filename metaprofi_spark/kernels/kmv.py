"""KMV (bottom-k / K-Minimum-Values) distinct sketch with SET
OPERATIONS — the theta-sketch capability HLL lacks.

State = the k smallest distinct mmh2-64 hash values seen (sorted
uint64 vector, possibly shorter than k).  Merge = bottom-k of the
union — associative, commutative, idempotent, so it is a valid Spark
partial+final aggregate with the same execution shape as the HLL/CMS/
KLL UDAFs (functions/sketch_agg.py).

Estimators (Beyer et al., "On Synopses for Distinct-Value Estimation
Under Multiset Operations", SIGMOD'07; Dasgupta et al. theta sketches):

* cardinality: exact ``len(state)`` while the sketch is unsaturated
  (fewer than k distinct values seen — the EXACT TIER used by the
  hash-exact gate row); else the unbiased ``(k-1) / U_(k)`` with
  ``U_(k)`` the k-th smallest normalized hash in (0,1).
* intersection / union / difference of two sketches: theta-style —
  theta = min of the two sketches' thetas (theta = U_(k) when
  saturated, else 1); both sample sets are filtered to hashes < theta;
  |A op B| is estimated as |{samples satisfying op}| / theta.  In the
  exact tier theta = 1 and every estimate is the exact set-op size.

The reference has no distinct sketch at all (its only set structure is
the Bloom matrix, SURVEY.md §2.4) — this extends the mergeable-UDAF
family the same way HLL/CMS/KLL do, adding the one thing HLL cannot
answer: how much do two groups' value sets OVERLAP.
"""

from __future__ import annotations

import numpy as np

from metaprofi_spark.kernels.mmh2 import mmh2_64_buffer, mmh2_64_bytes

_TWO64 = float(2**64)


def kmv_hash(values) -> np.ndarray:
    """mmh2-64 (seed 0) of a values batch — list[bytes] or the Arrow
    (data, offsets) buffer pair (kernels/arrowbuf.py)."""
    if isinstance(values, tuple):
        data, offsets = values
        if len(offsets) <= 1:
            return np.empty(0, np.uint64)
        return mmh2_64_buffer(data, offsets, [0])[:, 0]
    if not values:
        return np.empty(0, np.uint64)
    return mmh2_64_bytes(values, [0])[:, 0]


def kmv_init() -> np.ndarray:
    return np.empty(0, np.uint64)


def kmv_add(state: np.ndarray, values, k: int) -> np.ndarray:
    """Fold a batch of values; returns the new state (sorted, distinct,
    len <= k).  np.unique sorts, so bottom-k is a prefix slice."""
    h = kmv_hash(values)
    if len(h) == 0:
        return state
    return np.unique(np.concatenate([state, h]))[:k]


def kmv_merge(a: np.ndarray, b: np.ndarray, k: int) -> np.ndarray:
    return np.unique(np.concatenate([a, b]))[:k]


def kmv_serialize(state: np.ndarray) -> bytes:
    return np.ascontiguousarray(state, dtype=np.uint64).tobytes()


def kmv_deserialize(blob: bytes) -> np.ndarray:
    return np.frombuffer(bytes(blob), dtype=np.uint64)


def kmv_theta(state: np.ndarray, k: int) -> float:
    """Normalized sampling threshold in (0, 1]: every hash < theta*2^64
    is retained by the sketch."""
    if len(state) < k:
        return 1.0
    return float(state[k - 1]) / _TWO64


def kmv_estimate(state: np.ndarray, k: int) -> float:
    """Distinct-count estimate; EXACT (= len) while unsaturated."""
    if len(state) < k:
        return float(len(state))
    # unbiased (k-1)/U_(k), U_(k) = k-th smallest normalized hash
    return (k - 1) / (float(state[k - 1]) / _TWO64)


def kmv_set_ops(a: np.ndarray, b: np.ndarray, k: int) -> dict[str, float]:
    """Theta-style set-operation estimates between two sketches built
    with the same k and hash.  Returns estimates for |A|, |B|,
    |A ∩ B|, |A ∪ B|, |A \\ B| and the Jaccard ratio.  All EXACT when
    both sketches are unsaturated (theta == 1)."""
    # sampling threshold in the INTEGER hash domain (no float boundary
    # rounding): a saturated sketch retains hashes < its k-th value
    thrs = [int(s[k - 1]) for s in (a, b) if len(s) >= k]
    if not thrs:
        theta, sa, sb = 1.0, a, b
    else:
        cut = np.uint64(min(thrs))
        theta = min(thrs) / _TWO64
        sa, sb = a[a < cut], b[b < cut]
    inter = len(np.intersect1d(sa, sb, assume_unique=True))
    union = len(sa) + len(sb) - inter
    return {
        "n_a": kmv_estimate(a, k),
        "n_b": kmv_estimate(b, k),
        "intersection": inter / theta,
        "union": union / theta,
        "a_minus_b": (len(sa) - inter) / theta,
        "jaccard": (inter / union) if union else 0.0,
    }
