"""KLL quantile sketch kernel (Karnin–Lang–Liberty 2016).

Streaming rank/quantile estimation with published additive rank error
O(1/k) at fixed k; merge is level-wise concatenation + recompression,
so the sketch is a valid Spark partial+final aggregate.  Compaction
offsets come from a deterministic seeded generator (no wall-clock /
global randomness — required for reproducible builds and the driver's
order-insensitive comparisons).
"""

from __future__ import annotations

import pickle

import numpy as np

_C = 2.0 / 3.0  # level capacity decay from the KLL paper


class KLLSketch:
    """Quantile sketch over float64 values."""

    __slots__ = ("k", "compactors", "_n", "_rng")

    def __init__(self, k: int = 200, seed: int = 42):
        if k < 8:
            raise ValueError("k must be >= 8")
        self.k = k
        self.compactors: list[list[float]] = [[]]
        self._n = 0
        self._rng = np.random.default_rng(seed)

    # -- geometry ---------------------------------------------------------
    def _capacity(self, level: int) -> int:
        height = len(self.compactors)
        return max(int(np.ceil(self.k * _C ** (height - level - 1))), 2)

    def _total_capacity(self) -> int:
        return sum(self._capacity(l) for l in range(len(self.compactors)))

    @property
    def n(self) -> int:
        return self._n

    # -- updates ------------------------------------------------------------
    def add(self, values) -> None:
        vals = np.asarray(values, dtype=np.float64)
        vals = vals[~np.isnan(vals)]
        if vals.size == 0:
            return
        self.compactors[0].extend(vals.tolist())
        self._n += int(vals.size)
        self._compress()

    def _compress(self) -> None:
        while sum(len(c) for c in self.compactors) > self._total_capacity():
            for level, c in enumerate(self.compactors):
                if len(c) > self._capacity(level):
                    c.sort()
                    offset = int(self._rng.integers(0, 2))
                    promoted = c[offset::2]
                    if level + 1 == len(self.compactors):
                        self.compactors.append([])
                    self.compactors[level + 1].extend(promoted)
                    self.compactors[level] = []
                    break
            else:
                break  # nothing over capacity (can happen mid-merge)

    def merge(self, other: "KLLSketch") -> "KLLSketch":
        if self.k != other.k:
            raise ValueError("cannot merge KLL sketches with different k")
        out = KLLSketch(self.k)
        # derive the result's RNG from self's STATE, not the object —
        # sharing the object would couple later compactions of the
        # merged sketch to self's RNG stream (the .state getter returns
        # a fresh dict, so this is a copy)
        out._rng.bit_generator.state = self._rng.bit_generator.state
        height = max(len(self.compactors), len(other.compactors))
        out.compactors = [[] for _ in range(height)]
        for level in range(height):
            if level < len(self.compactors):
                out.compactors[level].extend(self.compactors[level])
            if level < len(other.compactors):
                out.compactors[level].extend(other.compactors[level])
        out._n = self._n + other._n
        out._compress()
        return out

    # -- queries ------------------------------------------------------------
    def _weighted_items(self) -> tuple[np.ndarray, np.ndarray]:
        vals, weights = [], []
        for level, c in enumerate(self.compactors):
            vals.extend(c)
            weights.extend([1 << level] * len(c))
        v = np.asarray(vals, dtype=np.float64)
        w = np.asarray(weights, dtype=np.int64)
        order = np.argsort(v, kind="stable")
        return v[order], w[order]

    def quantile(self, q: float) -> float:
        """Smallest retained value whose estimated rank >= q * n."""
        if not 0.0 <= q <= 1.0:
            raise ValueError("q must be in [0, 1]")
        v, w = self._weighted_items()
        if v.size == 0:
            return float("nan")
        cw = np.cumsum(w)
        target = q * cw[-1]
        i = int(np.searchsorted(cw, target, side="left"))
        return float(v[min(i, v.size - 1)])

    def rank(self, value: float) -> float:
        """Estimated number of items <= value."""
        v, w = self._weighted_items()
        if v.size == 0:
            return 0.0
        i = int(np.searchsorted(v, value, side="right"))
        return float(np.cumsum(w)[i - 1]) if i else 0.0

    def error_bound(self) -> float:
        """Published additive rank error (fraction of n), ~2.3/k w.h.p."""
        return 3.0 / self.k

    # -- persistence ----------------------------------------------------------
    def serialize(self) -> bytes:
        return pickle.dumps(
            {"k": self.k, "compactors": self.compactors, "n": self._n,
             "rng": self._rng.bit_generator.state},
            protocol=4,
        )

    @classmethod
    def deserialize(cls, blob: bytes) -> "KLLSketch":
        d = pickle.loads(blob)
        out = cls(d["k"])
        out.compactors = d["compactors"]
        out._n = d["n"]
        out._rng.bit_generator.state = d["rng"]
        return out
