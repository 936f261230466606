"""Misra–Gries / SpaceSaving heavy-hitters sketch.

Finds the frequent items WITHOUT a watch list — the complement of the
count–min sketch (kernels/cms.py), which can only answer point queries
about keys you already know.  k counters; every item with true count
> n/(k+1) is guaranteed present, and each reported count c satisfies
true - n/(k+1) <= c <= true (the classic MG deterministic bound).

Merge (Agarwal et al., "Mergeable Summaries", PODS'12): sum counters
pairwise, then subtract the (k+1)-th largest count from every counter
and drop non-positives.  The bound degrades additively, so the sketch
is a valid Spark partial+final aggregate (same shape as HLL/CMS/KLL/
KMV in functions/sketch_agg.py).

EXACT TIER: while every partial's distinct-value count stays <= k no
decrement ever fires and every counter is the true count.  The sketch
carries a ``decremented`` flag so the exact tier is ASSERTABLE (the
hash-exact gate row fails loudly instead of silently estimating —
mirrors KMV's require_exact).

State is a plain dict[bytes, int]; folds are vectorized through
pandas value_counts (one python step per DISTINCT value per batch,
not per row).
"""

from __future__ import annotations

import numpy as np
import pandas as pd


class MGSketch:
    __slots__ = ("k", "counters", "decremented")

    def __init__(self, k: int):
        self.k = k
        self.counters: dict[bytes, int] = {}
        self.decremented = False

    def _trim(self) -> None:
        if len(self.counters) > self.k:
            cut = sorted(self.counters.values(), reverse=True)[self.k]
            self.counters = {
                v: c - cut for v, c in self.counters.items() if c > cut
            }
            self.decremented = True

    def fold_counts(self, values, counts) -> None:
        """Fold pre-aggregated (value, count) pairs.  Batch-folding
        then one (k+1)-th-largest subtraction preserves the MG
        invariant (counter error <= decremented mass) — it IS the
        mergeable-summaries merge with a size-|batch| exact sketch."""
        c_ = self.counters
        for v, c in zip(values, counts):
            c_[v] = c_.get(v, 0) + int(c)
        self._trim()

    def fold_series(self, series: pd.Series) -> None:
        counts = series.dropna().astype(str).value_counts()
        self.fold_counts(
            [s.encode("utf-8") for s in counts.index], counts.to_numpy()
        )

    def merge(self, other: "MGSketch") -> "MGSketch":
        out = MGSketch(self.k)
        out.counters = dict(self.counters)
        out.decremented = self.decremented or other.decremented
        for v, c in other.counters.items():
            out.counters[v] = out.counters.get(v, 0) + c
        out._trim()
        return out

    def topk(self, topn: int) -> list[tuple[bytes, int]]:
        """count-desc then value-asc — a total order, deterministic."""
        return sorted(self.counters.items(), key=lambda it: (-it[1], it[0]))[
            :topn
        ]

    def serialize(self) -> bytes:
        items = sorted(self.counters.items())
        head = np.empty(3 + 2 * len(items), dtype=np.int64)
        head[0], head[1], head[2] = self.k, int(self.decremented), len(items)
        for i, (v, c) in enumerate(items):
            head[3 + 2 * i] = len(v)
            head[4 + 2 * i] = c
        return head.tobytes() + b"".join(v for v, _ in items)

    @classmethod
    def deserialize(cls, blob: bytes) -> "MGSketch":
        blob = bytes(blob)
        k, dec, n = (int(x) for x in np.frombuffer(blob[:24], dtype=np.int64))
        head = np.frombuffer(blob[24 : 24 + 16 * n], dtype=np.int64)
        sk = cls(k)
        sk.decremented = bool(dec)
        pos = 24 + 16 * n
        for i in range(n):
            ln, c = int(head[2 * i]), int(head[2 * i + 1])
            sk.counters[blob[pos : pos + ln]] = c
            pos += ln
        return sk
