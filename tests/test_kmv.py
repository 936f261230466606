"""KMV bottom-k distinct sketch: kernel laws, estimator bounds, set
operations, and the Spark UDAF (functions/sketch_agg.py kmv_agg)."""

import numpy as np
import pytest
from hypothesis import given, settings, strategies as st

from metaprofi_spark.kernels import kmv as K


def _vals(xs):
    return [str(x).encode() for x in xs]


def _fold(xs, k, parts=1):
    state = K.kmv_init()
    for chunk in np.array_split(np.asarray(list(xs), dtype=object), parts):
        state = K.kmv_add(state, _vals(chunk), k)
    return state


class TestKernel:
    def test_exact_tier_estimate_is_cardinality(self):
        xs = [f"tok{i}" for i in range(500)] * 3  # duplicates collapse
        st_ = _fold(xs, k=1024)
        assert len(st_) == 500
        assert K.kmv_estimate(st_, 1024) == 500.0
        assert K.kmv_theta(st_, 1024) == 1.0

    def test_saturated_estimate_within_bound(self):
        n, k = 200_000, 1024
        st_ = _fold((f"v{i}" for i in range(n)), k)
        assert len(st_) == k
        est = K.kmv_estimate(st_, k)
        # published relative error ~1/sqrt(k-2) ≈ 3.1%; allow 5 sigma
        assert abs(est - n) / n < 5 / np.sqrt(k - 2)

    def test_merge_equals_single_fold(self):
        k = 256
        a = _fold((f"x{i}" for i in range(1000)), k)
        b = _fold((f"x{i}" for i in range(500, 1500)), k)
        merged = K.kmv_merge(a, b, k)
        whole = _fold((f"x{i}" for i in range(1500)), k)
        assert np.array_equal(merged, whole)

    def test_serialize_roundtrip(self):
        st_ = _fold((f"x{i}" for i in range(100)), 64)
        assert np.array_equal(K.kmv_deserialize(K.kmv_serialize(st_)), st_)

    def test_set_ops_exact_tier(self):
        k = 4096
        A = {f"a{i}" for i in range(300)} | {f"c{i}" for i in range(120)}
        B = {f"b{i}" for i in range(200)} | {f"c{i}" for i in range(120)}
        ops = K.kmv_set_ops(_fold(A, k), _fold(B, k), k)
        assert ops["n_a"] == len(A) and ops["n_b"] == len(B)
        assert ops["intersection"] == len(A & B)
        assert ops["union"] == len(A | B)
        assert ops["a_minus_b"] == len(A - B)
        assert ops["jaccard"] == pytest.approx(len(A & B) / len(A | B))

    def test_set_ops_estimate_tier_bound(self):
        k = 1024
        A = {f"s{i}" for i in range(30_000)} | {f"u{i}" for i in range(30_000)}
        B = {f"s{i}" for i in range(30_000)} | {f"w{i}" for i in range(30_000)}
        ops = K.kmv_set_ops(_fold(A, k), _fold(B, k), k)
        # intersection/union estimates: looser bound (two-sketch error
        # compounds through theta filtering) — 10x the single-sketch
        # sigma is far tighter than any real drift failure mode
        for key, truth in (("intersection", 30_000), ("union", 90_000)):
            assert abs(ops[key] - truth) / truth < 10 / np.sqrt(k - 2), key

    @given(
        st.lists(st.integers(0, 50), max_size=60),
        st.lists(st.integers(0, 50), max_size=60),
        st.integers(4, 16),
    )
    @settings(max_examples=60, deadline=None)
    def test_merge_commutative_and_idempotent(self, xs, ys, k):
        a = _fold(xs, k)
        b = _fold(ys, k)
        ab, ba = K.kmv_merge(a, b, k), K.kmv_merge(b, a, k)
        assert np.array_equal(ab, ba)
        assert np.array_equal(K.kmv_merge(ab, ab, k), ab)
        # merge law: bottom-k of union == fold of concatenation
        assert np.array_equal(ab, _fold(list(xs) + list(ys), k))


class TestAgg:
    def test_kmv_agg_exact_vs_count_distinct(self, spark):
        import pyspark.sql.functions as F
        from metaprofi_spark.functions.sketch_agg import kmv_agg

        df = spark.range(0, 2000).select(
            (F.col("id") % 4).alias("g"),
            F.concat(F.lit("v"), (F.col("id") % 137).cast("string")).alias("v"),
        )
        got = {
            (r["g"], r["n_distinct_est"])
            for r in kmv_agg(df, ["g"], "v", k=1024).collect()
        }
        want = {
            (r["g"], float(r["n"]))
            for r in df.groupBy("g").agg(
                F.countDistinct("v").alias("n")
            ).collect()
        }
        assert got == want

    def test_pairwise_ops_and_exact_guard(self, spark):
        import pyspark.sql.functions as F
        from metaprofi_spark.functions.sketch_agg import (
            kmv_agg,
            kmv_pairwise_ops,
        )

        df = spark.range(0, 300).select(
            (F.col("id") % 2).cast("string").alias("g"),
            # group "0": v0..v149 over evens; group "1": v100..v249 —
            # overlap v100..v149 on the 50 shared residues
            F.concat(
                F.lit("v"),
                ((F.col("id") % 150) + F.when(F.col("id") % 2 == 1, 100).otherwise(0)).cast("string"),
            ).alias("v"),
        )
        agg = kmv_agg(df, ["g"], "v", k=4096)
        row = kmv_pairwise_ops(agg, "g", k=4096, require_exact=True).collect()[0]
        va = {f"v{(i % 150)}" for i in range(0, 300, 2)}
        vb = {f"v{(i % 150) + 100}" for i in range(1, 300, 2)}
        assert (row["n_a"], row["n_b"]) == (len(va), len(vb))
        assert row["n_intersection"] == len(va & vb)
        assert row["n_union"] == len(va | vb)
        # guard: k=8 saturates on 150-distinct groups -> loud error
        with pytest.raises(ValueError, match="saturated"):
            kmv_pairwise_ops(
                kmv_agg(df, ["g"], "v", k=8), "g", k=8, require_exact=True
            )
