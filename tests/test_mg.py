"""Misra–Gries heavy hitters: deterministic bounds, merge law, the
exact tier, and the Spark UDAF (functions/sketch_agg.py mg_agg/mg_topk)."""

import numpy as np
import pandas as pd
import pytest
from hypothesis import given, settings, strategies as st

from metaprofi_spark.kernels.mg import MGSketch


def _fold(xs, k, parts=1):
    sk = MGSketch(k)
    for chunk in np.array_split(np.asarray(list(xs), dtype=object), parts):
        sk.fold_series(pd.Series(chunk))
    return sk


class TestKernel:
    def test_exact_tier_counts_and_flag(self):
        xs = ["a"] * 10 + ["b"] * 5 + ["c"] * 3
        sk = _fold(xs, k=8, parts=3)
        assert not sk.decremented
        assert sk.counters == {b"a": 10, b"b": 5, b"c": 3}
        assert sk.topk(2) == [(b"a", 10), (b"b", 5)]

    def test_mg_bound_adversarial_stream(self):
        """Zipf-ish stream with distinct >> k: every count within
        [true - n/(k+1), true]; every item with true > n/(k+1) present."""
        k = 16
        xs = []
        for i in range(40):
            xs += [f"h{i}"] * (200 - 4 * i)
        xs += [f"noise{i}" for i in range(2000)]
        rng = np.random.default_rng(7)
        rng.shuffle(xs)
        sk = _fold(xs, k, parts=5)
        assert sk.decremented and len(sk.counters) <= k
        true = pd.Series(xs).value_counts()
        slack = len(xs) / (k + 1)
        for v, c in sk.counters.items():
            t = int(true[v.decode()])
            assert t - slack <= c <= t, v
        for item, t in true.items():
            if t > slack:
                assert item.encode() in sk.counters, item

    def test_merge_bound_holds(self):
        k = 16
        a = _fold([f"x{i % 30}" for i in range(3000)], k)
        b = _fold([f"x{i % 50}" for i in range(2000)], k)
        m = a.merge(b)
        assert len(m.counters) <= k
        true = pd.Series(
            [f"x{i % 30}" for i in range(3000)]
            + [f"x{i % 50}" for i in range(2000)]
        ).value_counts()
        slack = 5000 / (k + 1) * 2  # additive degradation across merge
        for v, c in m.counters.items():
            t = int(true[v.decode()])
            assert t - slack <= c <= t

    def test_serialize_roundtrip(self):
        sk = _fold([f"v{i}" for i in range(100)] * 2, 32)
        rt = MGSketch.deserialize(sk.serialize())
        assert rt.counters == sk.counters
        assert rt.decremented == sk.decremented and rt.k == sk.k

    @given(
        st.lists(st.integers(0, 8), max_size=80),
        st.lists(st.integers(0, 8), max_size=80),
        st.integers(9, 12),
    )
    @settings(max_examples=50, deadline=None)
    def test_exact_tier_merge_is_exact_counts(self, xs, ys, k):
        """distinct <= 9 <= k: fold+merge in any split == true counts."""
        a, b = _fold(xs, k) if xs else MGSketch(k), _fold(ys, k) if ys else MGSketch(k)
        m = a.merge(b)
        true = pd.Series(list(xs) + list(ys), dtype=object).value_counts()
        assert not m.decremented
        assert m.counters == {
            str(v).encode(): int(c) for v, c in true.items()
        }


class TestAgg:
    def test_mg_topk_exact_vs_groupby(self, spark):
        import pyspark.sql.functions as F
        from pyspark.sql import Window
        from metaprofi_spark.functions.sketch_agg import mg_topk

        df = spark.range(0, 3000).select(
            (F.col("id") % 3).alias("g"),
            F.concat(F.lit("t"), (F.pmod(F.col("id") * 37, 41)).cast("string")).alias("v"),
        )
        got = {
            tuple(r)
            for r in mg_topk(
                df, ["g"], "v", 5, k=64, require_exact=True
            ).collect()
        }
        w = Window.partitionBy("g").orderBy(F.desc("cnt"), "v")
        want = {
            tuple(r)
            for r in df.groupBy("g", "v")
            .agg(F.count("*").alias("cnt"))
            .withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= 5)
            .select("g", "v", "cnt", "rank")
            .collect()
        }
        assert got == want and len(got) == 15

    def test_require_exact_raises_on_decrement(self, spark):
        import pyspark.sql.functions as F
        from metaprofi_spark.functions.sketch_agg import mg_topk

        df = spark.range(0, 2000).select(
            F.lit(0).alias("g"),
            F.col("id").cast("string").alias("v"),  # 2000 distinct >> k=16
        )
        with pytest.raises(Exception, match="exact tier|decremented"):
            mg_topk(df, ["g"], "v", 5, k=16, require_exact=True).collect()
