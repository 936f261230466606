"""Merging t-digest kernel (Dunning & Ertl) — the quantile sibling of
KLL named by the north rule.

Centroids are merged greedily under the k1 scale function
k(q) = (c / 2π) · asin(2q − 1), which concentrates resolution at the
tails (relative rank error ~O(1/c) mid-range, much tighter at q→0/1).
Merge = concatenate centroid lists + recompress — associative up to the
digest's approximation, deterministic (no randomness at all).
"""

from __future__ import annotations

import math
import pickle

import numpy as np


class TDigest:
    __slots__ = ("compression", "means", "weights", "_buf", "_n")

    def __init__(self, compression: float = 100.0):
        if compression < 20:
            raise ValueError("compression must be >= 20")
        self.compression = float(compression)
        self.means: np.ndarray = np.empty(0, dtype=np.float64)
        self.weights: np.ndarray = np.empty(0, dtype=np.float64)
        self._buf: list[np.ndarray] = []
        self._n = 0.0

    # -- scale function ----------------------------------------------------
    def _k(self, q: float) -> float:
        q = min(max(q, 0.0), 1.0)
        return self.compression / (2 * math.pi) * math.asin(2 * q - 1)

    # -- updates -------------------------------------------------------------
    def add(self, values) -> None:
        v = np.asarray(values, dtype=np.float64)
        v = v[~np.isnan(v)]
        if v.size == 0:
            return
        self._buf.append(v)
        self._n += v.size
        if sum(b.size for b in self._buf) > 8 * self.compression:
            self._compress()

    def _compress(self) -> None:
        if self._buf:
            bm = np.concatenate(self._buf)
            means = np.concatenate([self.means, bm])
            weights = np.concatenate([self.weights, np.ones(bm.size)])
            self._buf = []
        else:
            means, weights = self.means, self.weights
        if means.size == 0:
            return
        order = np.argsort(means, kind="stable")
        means, weights = means[order], weights[order]
        W = weights.sum()
        out_m: list[float] = []
        out_w: list[float] = []
        cur_m, cur_w = means[0], weights[0]
        k_left = self._k(0.0)
        acc = 0.0
        for m, w in zip(means[1:], weights[1:]):
            q_new = (acc + cur_w + w) / W
            if self._k(q_new) - k_left <= 1.0:
                cur_m += (m - cur_m) * (w / (cur_w + w))
                cur_w += w
            else:
                out_m.append(cur_m)
                out_w.append(cur_w)
                acc += cur_w
                k_left = self._k(acc / W)
                cur_m, cur_w = m, w
        out_m.append(cur_m)
        out_w.append(cur_w)
        self.means = np.asarray(out_m)
        self.weights = np.asarray(out_w)

    def merge(self, other: "TDigest") -> "TDigest":
        if self.compression != other.compression:
            raise ValueError("cannot merge t-digests with different compression")
        out = TDigest(self.compression)
        self._compress()
        other._compress()
        out.means = np.concatenate([self.means, other.means])
        out.weights = np.concatenate([self.weights, other.weights])
        out._n = self._n + other._n
        out._compress()
        return out

    # -- queries ------------------------------------------------------------
    @property
    def n(self) -> float:
        return self._n

    def quantile(self, q: float) -> float:
        if not 0.0 <= q <= 1.0:
            raise ValueError("q must be in [0, 1]")
        self._compress()
        m, w = self.means, self.weights
        if m.size == 0:
            return float("nan")
        if m.size == 1:
            return float(m[0])
        W = w.sum()
        target = q * W
        # centroid centers at cumulative weight - w/2
        cum = np.cumsum(w) - w / 2
        i = int(np.searchsorted(cum, target))
        if i == 0:
            return float(m[0])
        if i >= m.size:
            return float(m[-1])
        t = (target - cum[i - 1]) / (cum[i] - cum[i - 1])
        return float(m[i - 1] + t * (m[i] - m[i - 1]))

    def serialize(self) -> bytes:
        self._compress()
        return pickle.dumps(
            {"c": self.compression, "m": self.means, "w": self.weights, "n": self._n},
            protocol=4,
        )

    @classmethod
    def deserialize(cls, blob: bytes) -> "TDigest":
        d = pickle.loads(blob)
        out = cls(d["c"])
        out.means, out.weights, out._n = d["m"], d["w"], d["n"]
        return out
