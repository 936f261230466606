"""HLL / CMS / KLL: published error bounds vs exact answers + merge laws."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from metaprofi_spark.kernels import cms as C
from metaprofi_spark.kernels import hll as H
from metaprofi_spark.kernels.kll import KLLSketch
from metaprofi_spark.functions.sketch_agg import (
    cms_agg,
    cms_query_blob,
    hll_agg,
    kll_agg,
    kll_quantiles,
)
from tests.conftest import SF01_DIR

rng = np.random.default_rng(42)


# ------------------------- kernel level -----------------------------------

def test_hll_kernel_accuracy_and_merge():
    p = 12
    n = 20000
    vals = [f"item-{i}".encode() for i in range(n)]
    regs = H.hll_init(p)
    H.hll_add(regs, vals)
    est = H.hll_estimate(regs)
    assert abs(est - n) / n <= 3 * H.hll_error_bound(p)  # 3 sigma
    # merge == build-on-union, register-exact
    a, b = H.hll_init(p), H.hll_init(p)
    H.hll_add(a, vals[: n // 2])
    H.hll_add(b, vals[n // 3 :])  # overlapping halves
    merged = H.hll_merge(a, b)
    assert (merged == regs).all()
    # commutative
    assert (H.hll_merge(b, a) == merged).all()


def test_hll_small_range_linear_counting():
    regs = H.hll_init(12)
    H.hll_add(regs, [f"x{i}".encode() for i in range(100)])
    assert abs(H.hll_estimate(regs) - 100) <= 3  # near-exact at tiny n


def test_cms_kernel_bounds_and_merge():
    eps, delta = 0.01, 0.01
    d, w = C.cms_params(eps, delta)
    table = C.cms_init(d, w)
    # zipf-ish stream
    keys = [f"tok{i}".encode() for i in range(500)]
    freqs = (10000 / np.arange(1, 501)).astype(np.int64)
    C.cms_add(table, keys, freqs)
    n_total = int(freqs.sum())
    ests = C.cms_query(table, keys)
    assert (ests >= freqs).all()  # overestimate-only
    assert (ests <= freqs + eps * n_total).all()
    # merge == sum
    t1, t2 = C.cms_init(d, w), C.cms_init(d, w)
    C.cms_add(t1, keys[:250], freqs[:250])
    C.cms_add(t2, keys[250:], freqs[250:])
    assert (C.cms_merge(t1, t2) == table).all()
    # serialization roundtrip
    assert (C.cms_deserialize(C.cms_serialize(table)) == table).all()


def test_kll_kernel_rank_error_and_merge():
    k = 64
    n = 50000
    data = rng.normal(size=n)
    sk = KLLSketch(k, seed=1)
    sk.add(data)
    assert sk.n == n
    sorted_data = np.sort(data)
    for q in (0.01, 0.1, 0.5, 0.9, 0.99):
        est = sk.quantile(q)
        true_rank = np.searchsorted(sorted_data, est) / n
        assert abs(true_rank - q) <= sk.error_bound(), (q, true_rank)
    # merge keeps the bound
    s1, s2 = KLLSketch(k, seed=2), KLLSketch(k, seed=3)
    s1.add(data[: n // 2])
    s2.add(data[n // 2 :])
    merged = s1.merge(s2)
    assert merged.n == n
    for q in (0.1, 0.5, 0.9):
        est = merged.quantile(q)
        true_rank = np.searchsorted(sorted_data, est) / n
        assert abs(true_rank - q) <= 2 * merged.error_bound()
    # roundtrip
    assert KLLSketch.deserialize(sk.serialize()).quantile(0.5) == sk.quantile(0.5)


# ------------------------- Spark UDAF level --------------------------------

@pytest.fixture(scope="module")
def docs(spark):
    return spark.read.parquet(f"{SF01_DIR}/documents.parquet").cache()


def test_hll_agg_vs_exact(spark, docs):
    got = {
        r.lang: r.n_distinct_est
        for r in hll_agg(docs, ["lang"], "doc_id", p=12).collect()
    }
    exact = {
        r.lang: r.n
        for r in docs.groupBy("lang").agg(F.countDistinct("doc_id").alias("n")).collect()
    }
    assert set(got) == set(exact)
    for lang, n in exact.items():
        assert abs(got[lang] - n) / n <= max(3 * H.hll_error_bound(12), 0.02), lang
    # cross-check the built-in HLL++ agrees with exact too (wiring sanity)
    builtin = {
        r.lang: r.est
        for r in docs.groupBy("lang")
        .agg(F.approx_count_distinct("doc_id", 0.02).alias("est"))
        .collect()
    }
    for lang, n in exact.items():
        assert abs(builtin[lang] - n) / n <= 0.1


def test_cms_agg_vs_exact_token_counts(spark, docs):
    tokens = docs.select(
        F.explode(F.split(F.col("text"), " ")).alias("token")
    ).filter(F.col("token") != "")
    eps, delta = 0.005, 0.01
    d, w = C.cms_params(eps, delta)
    res = cms_agg(tokens.withColumn("g", F.lit(1)), ["g"], "token", d, w).collect()
    assert len(res) == 1
    blob, n_total = res[0]["sketch"], res[0]["n_total"]
    exact = {
        r.token: r.n
        for r in tokens.groupBy("token").agg(F.count("*").alias("n")).collect()
    }
    assert n_total == sum(exact.values())
    ests = cms_query_blob(blob, list(exact))
    for t, n in exact.items():
        assert ests[t] >= n, t  # never underestimates
        assert ests[t] <= n + eps * n_total, t


def test_kll_quantiles_vs_exact(spark, docs):
    qs = [0.1, 0.5, 0.9, 0.99]
    got = {
        r.qp: r.value
        for r in kll_quantiles(
            docs.withColumn("g", F.lit(1)), ["g"], "n_chars", qs, k=200
        ).collect()
    }
    vals = np.sort(np.array([r.n_chars for r in docs.select("n_chars").collect()]))
    n = len(vals)
    for q in qs:
        est = got[q]
        true_rank = np.searchsorted(vals, est, side="right") / n
        assert abs(true_rank - q) <= 3.0 / 200 + 1.0 / n, (q, true_rank)
    # cross-check built-in percentile_approx in the same ballpark
    pa = docs.agg(F.percentile_approx("n_chars", 0.5).alias("p")).first().p
    assert abs(np.searchsorted(vals, pa) / n - 0.5) <= 0.02


def test_kll_agg_merge_associativity(spark, docs):
    """Sketch of all rows == merge of per-lang sketches (any order)."""
    per_lang = kll_agg(docs, ["lang"], "n_chars", k=128).collect()
    merged = None
    for r in sorted(per_lang, key=lambda r: r.lang):
        sk = KLLSketch.deserialize(r.sketch)
        merged = sk if merged is None else merged.merge(sk)
    assert merged.n == docs.count()
    vals = np.sort(np.array([r.n_chars for r in docs.select("n_chars").collect()]))
    est = merged.quantile(0.5)
    true_rank = np.searchsorted(vals, est, side="right") / len(vals)
    assert abs(true_rank - 0.5) <= 2 * merged.error_bound()


def test_tdigest_kernel_accuracy_and_merge():
    from metaprofi_spark.kernels.tdigest import TDigest

    n = 50000
    data = rng.normal(size=n)
    td = TDigest(100)
    td.add(data)
    sorted_data = np.sort(data)
    for q in (0.001, 0.01, 0.5, 0.99, 0.999):
        est = td.quantile(q)
        true_rank = np.searchsorted(sorted_data, est) / n
        # k1 scale: tight at tails, ~1% mid-range at c=100
        tol = 0.02 if 0.1 < q < 0.9 else 0.005
        assert abs(true_rank - q) <= tol, (q, true_rank)
    # merge keeps accuracy; deterministic
    a, b = TDigest(100), TDigest(100)
    a.add(data[: n // 2]); b.add(data[n // 2 :])
    m = a.merge(b)
    assert m.n == n
    est = m.quantile(0.5)
    assert abs(np.searchsorted(sorted_data, est) / n - 0.5) <= 0.03
    # roundtrip
    assert TDigest.deserialize(td.serialize()).quantile(0.5) == td.quantile(0.5)
    import pytest as _pt
    with _pt.raises(ValueError):
        TDigest(100).merge(TDigest(200))


def test_tdigest_agg_spark(spark, docs):
    from metaprofi_spark.functions.sketch_agg import tdigest_agg
    from metaprofi_spark.kernels.tdigest import TDigest

    res = tdigest_agg(docs.withColumn("g", F.lit(1)), ["g"], "n_chars").collect()
    assert len(res) == 1 and res[0]["n"] == docs.count()
    td = TDigest.deserialize(res[0]["sketch"])
    vals = np.sort(np.array([r.n_chars for r in docs.select("n_chars").collect()]))
    est = td.quantile(0.5)
    true_rank = np.searchsorted(vals, est, side="right") / len(vals)
    assert abs(true_rank - 0.5) <= 0.05


def test_kll_merge_does_not_mutate_input_rng():
    """merge() derives the result's RNG from self's STATE (a copy) —
    compactions in the merged sketch must not advance self's stream."""
    a, b = KLLSketch(8), KLLSketch(8)
    a.add(np.arange(100, dtype=np.float64))
    b.add(np.arange(100, 200, dtype=np.float64))
    state_before = a._rng.bit_generator.state
    m = a.merge(b)
    m.add(np.arange(5000, dtype=np.float64))  # forces compactions in m
    assert a._rng.bit_generator.state == state_before
    # and the merged sketch still answers sane quantiles
    assert 0 <= m.quantile(0.5) <= 5000
