"""Structured-Streaming windowed rollup + stateful sessionization."""

import os

import pytest
from pyspark.sql import functions as F

from metaprofi_spark.streaming.windows import hourly_event_rollup, sessionize_stream
from tests.conftest import SF_DIR

GAP_MIN = 30


@pytest.fixture(scope="module")
def events(spark):
    return spark.read.parquet(f"{SF_DIR}/events.parquet").cache()


def _stream_from(spark, events, tmp_path, name):
    src = str(tmp_path / name)
    events.write.mode("overwrite").parquet(src)
    return spark.readStream.schema(events.schema).parquet(src)


def test_hourly_rollup_stream_equals_batch(spark, events, tmp_path):
    stream = _stream_from(spark, events, tmp_path, "ev_roll")
    q = (
        hourly_event_rollup(stream)
        .writeStream.format("memory")
        .queryName("roll")
        .outputMode("complete")
        .start()
    )
    q.processAllAvailable()
    q.stop()
    got = {
        (r.hour, r.event_type): (r.n_events, r.sum_value_e6)
        for r in spark.sql("select * from roll").collect()
    }
    expect = {
        (r.hour, r.event_type): (r.n_events, r.sum_value_e6)
        for r in events.groupBy(
            F.date_trunc("hour", F.col("ts").cast("timestamp")).alias("hour"),
            "event_type",
        )
        .agg(
            F.count("*").alias("n_events"),
            F.sum(F.round(F.col("value") * 1e6).cast("long")).alias("sum_value_e6"),
        )
        .collect()
    }
    assert got == expect and got


def test_sessionize_stream_emits_closed_sessions(spark, events, tmp_path):
    # expected: per-user gap-split sessions, batch-side; the LAST session
    # of each user stays open in state (no timeout fires in-test)
    rows = events.select("user_id", F.col("ts").cast("timestamp").cast("long").alias("t")).collect()
    by_user: dict[int, list[int]] = {}
    for r in rows:
        by_user.setdefault(r.user_id, []).append(r.t)
    expect = set()
    for uid, ts in by_user.items():
        ts.sort()
        sessions = []
        start, last, n = ts[0], ts[0], 0
        for t in ts:
            if t - last > GAP_MIN * 60:
                sessions.append((uid, start, last, n))
                start, n = t, 0
            last = t
            n += 1
        # final session stays open — excluded
        expect.update(sessions)
    assert expect, "fixture has no closed sessions; pick a bigger gap corpus"

    stream = _stream_from(spark, events, tmp_path, "ev_sess")
    ckpt = str(tmp_path / "sess_ckpt")
    q = (
        sessionize_stream(stream, gap_minutes=GAP_MIN)
        .writeStream.format("memory")
        .queryName("sess")
        .outputMode("append")
        .option("checkpointLocation", ckpt)
        .start()
    )
    q.processAllAvailable()
    q.stop()
    got = {
        (
            r.user_id,
            int(r.session_start.timestamp()),
            int(r.session_end.timestamp()),
            r.n_events,
        )
        for r in spark.sql("select * from sess").collect()
    }
    assert got == expect


def test_streaming_hll_equals_batch_fold(spark, events, tmp_path):
    """The stateful streaming HLL (applyInPandasWithState; state = the
    serialized register file) must end at EXACTLY the batch UDAF's
    estimate over everything streamed — the mergeable-sketch law lifted
    to micro-batch folding, across MULTIPLE batches."""
    from metaprofi_spark.functions.sketch_agg import hll_agg
    from metaprofi_spark.streaming.sketches import streaming_hll_distinct

    # two separate files => at least two micro-batches with 1 file/trigger
    src = str(tmp_path / "ev_hll")
    ev = events.select("event_type", F.col("user_id").cast("string").alias("uid"))
    ev.filter(F.col("uid").cast("long") % 2 == 0).write.parquet(src + "/a")
    ev.filter(F.col("uid").cast("long") % 2 == 1).write.parquet(src + "/b")
    stream = (
        spark.readStream.schema(ev.schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(src + "/*")
    )
    q = (
        streaming_hll_distinct(stream, "event_type", "uid", p=12)
        .writeStream.format("memory")
        .queryName("shll")
        .outputMode("update")
        .start()
    )
    q.processAllAvailable()
    q.stop()
    # last emitted row per key is the final state's estimate
    rows = spark.sql(
        "select * from (select *, row_number() over "
        "(partition by event_type order by mono desc) rn from "
        "(select *, monotonically_increasing_id() mono from shll)) where rn=1"
    ).collect()
    got = {r.event_type: r.n_distinct_est for r in rows}
    expect = {
        r.event_type: r.n_distinct_est
        for r in hll_agg(
            ev.withColumnRenamed("event_type", "event_type"), ["event_type"], "uid", p=12
        ).collect()
    }
    assert got == expect and got


def test_streaming_kmv_equals_batch_fold(spark, events, tmp_path):
    """Streaming KMV (state = the bottom-k hash vector) must end at the
    batch UDAF's sketch exactly — and the emitted sketches must support
    cross-key set ops (the capability the HLL twin lacks)."""
    import numpy as np

    from metaprofi_spark.functions.sketch_agg import kmv_agg
    from metaprofi_spark.kernels import kmv as K
    from metaprofi_spark.streaming.sketches import streaming_kmv_distinct

    src = str(tmp_path / "ev_kmv")
    ev = events.select("event_type", F.col("user_id").cast("string").alias("uid"))
    ev.filter(F.col("uid").cast("long") % 2 == 0).write.parquet(src + "/a")
    ev.filter(F.col("uid").cast("long") % 2 == 1).write.parquet(src + "/b")
    stream = (
        spark.readStream.schema(ev.schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(src + "/*")
    )
    q = (
        streaming_kmv_distinct(stream, "event_type", "uid", k=512)
        .writeStream.format("memory")
        .queryName("skmv")
        .outputMode("update")
        .start()
    )
    q.processAllAvailable()
    q.stop()
    rows = spark.sql(
        "select * from (select *, row_number() over "
        "(partition by event_type order by mono desc) rn from "
        "(select *, monotonically_increasing_id() mono from skmv)) where rn=1"
    ).collect()
    got = {r.event_type: (r.n_distinct_est, bytes(r.sketch)) for r in rows}
    expect = {
        r[0]: (r[1], bytes(r[2]))
        for r in kmv_agg(ev, ["event_type"], "uid", k=512)
        .select("event_type", "n_distinct_est", "sketch")
        .collect()
    }
    assert got == expect and got
    # cross-key set ops on the emitted sketches match exact set algebra
    # (k=512 may saturate; compare only where both are exact)
    uids = {
        r.event_type: set(r.us)
        for r in ev.groupBy("event_type")
        .agg(F.collect_set("uid").alias("us"))
        .collect()
    }
    types = sorted(got)
    a, b = types[0], types[1]
    sa, sb = K.kmv_deserialize(got[a][1]), K.kmv_deserialize(got[b][1])
    if len(sa) < 512 and len(sb) < 512:
        ops = K.kmv_set_ops(sa, sb, 512)
        assert ops["intersection"] == len(uids[a] & uids[b])
        assert ops["union"] == len(uids[a] | uids[b])


def test_streaming_mg_equals_batch_topk(spark, events, tmp_path):
    """Streaming MG (state = the counter dict) must end at the batch
    mg_topk answer exactly in the exact tier (distinct <= k)."""
    from metaprofi_spark.functions.sketch_agg import mg_topk
    from metaprofi_spark.streaming.sketches import streaming_mg_topk

    src = str(tmp_path / "ev_mg")
    ev = events.select(
        "event_type", (F.col("user_id") % 37).cast("string").alias("uid")
    )
    ev.filter(F.col("user_id") % 2 == 0).write.parquet(src + "/a")
    ev.filter(F.col("user_id") % 2 == 1).write.parquet(src + "/b")
    stream = (
        spark.readStream.schema(ev.schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(src + "/*")
    )
    q = (
        streaming_mg_topk(stream, "event_type", "uid", topn=5, k=64)
        .writeStream.format("memory")
        .queryName("smg")
        .outputMode("update")
        .start()
    )
    q.processAllAvailable()
    q.stop()
    rows = spark.sql(
        "select event_type, uid, cnt, rank from (select *, row_number() over "
        "(partition by event_type, rank order by mono desc) rn from "
        "(select *, monotonically_increasing_id() mono from smg)) where rn=1"
    ).collect()
    got = {tuple(r) for r in rows}
    want = {
        tuple(r)
        for r in mg_topk(ev, ["event_type"], "uid", 5, k=64).collect()
    }
    assert got == want and got


def test_streaming_cms_equals_batch_fold(spark, events, tmp_path):
    """Streaming CMS state fold across micro-batches == batch cms_agg
    over the full input (same kernel, same watched-value estimates)."""
    import numpy as np

    from metaprofi_spark.kernels import cms as C
    from metaprofi_spark.streaming.sketches import streaming_cms_topk

    src = str(tmp_path / "ev_cms")
    ev = events.select("event_type", F.col("user_id").cast("string").alias("uid"))
    ev.filter(F.col("uid").cast("long") % 2 == 0).write.parquet(src + "/a")
    ev.filter(F.col("uid").cast("long") % 2 == 1).write.parquet(src + "/b")
    watch = ["1", "2", "17", "absent-user"]
    stream = (
        spark.readStream.schema(ev.schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(src + "/*")
    )
    q = (
        streaming_cms_topk(stream, "event_type", "uid", watch, 4, 1024)
        .writeStream.format("memory")
        .queryName("scms")
        .outputMode("update")
        .start()
    )
    q.processAllAvailable()
    q.stop()
    rows = spark.sql(
        "select * from (select *, row_number() over "
        "(partition by event_type, value order by mono desc) rn from "
        "(select *, monotonically_increasing_id() mono from scms)) where rn=1"
    ).collect()
    got = {(r.event_type, r.value): (r.est, r.n_total) for r in rows}
    # batch twin: fold everything per event_type with the same kernel
    expect = {}
    for et_row in ev.select("event_type").distinct().collect():
        et = et_row.event_type
        vals = [r.uid for r in ev.filter(F.col("event_type") == et).collect()]
        table = C.cms_init(4, 1024)
        C.cms_add(table, [v.encode() for v in vals])
        ests = C.cms_query(table, [w.encode() for w in watch])
        for w, e in zip(watch, ests):
            expect[(et, w)] = (int(e), len(vals))
    assert got == expect and got


def test_streaming_kll_equals_sequential_fold(spark, events, tmp_path):
    """Streaming KLL state across micro-batches == the kernel folded
    over the same rows in the same micro-batch order (exact state
    equality), and rank error stays within the published bound."""
    from metaprofi_spark.kernels.kll import KLLSketch
    from metaprofi_spark.streaming.sketches import streaming_kll_quantiles

    src = str(tmp_path / "ev_kll")
    ev = events.select(
        F.lit("g").alias("g"),
        F.col("value").cast("double"),
        (F.col("user_id") % 2 == 0).alias("__a"),
    )
    ev.filter("__a").drop("__a").write.parquet(src + "/a")
    ev.filter("NOT __a").drop("__a").write.parquet(src + "/b")
    ev = ev.drop("__a")
    stream = (
        spark.readStream.schema(ev.schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(src + "/*")
    )
    pcts = [10, 50, 90]
    q = (
        streaming_kll_quantiles(stream, "g", "value", pcts, k=200)
        .writeStream.format("memory")
        .queryName("skll")
        .outputMode("update")
        .start()
    )
    q.processAllAvailable()
    q.stop()
    rows = spark.sql(
        "select * from (select *, row_number() over "
        "(partition by q_pct order by mono desc) rn from "
        "(select *, monotonically_increasing_id() mono from skll)) where rn=1"
    ).collect()
    got = {r.q_pct: (r.value, r.n) for r in rows}
    n_total = ev.count()
    assert all(got[p][1] == n_total for p in pcts)
    # rank-error bound vs the exact quantile
    exact = sorted(r.value for r in ev.collect())
    eps = KLLSketch(k=200).error_bound() * 1.5  # slack for merge-free bound
    for p in pcts:
        v = got[p][0]
        rank = sum(1 for x in exact if x <= v) / n_total
        assert abs(rank - p / 100) <= eps + 1.0 / n_total, (p, rank)


def test_streaming_tdigest_exact_n_and_sane_quantiles(spark, events, tmp_path):
    """Streaming t-digest: exact total weight across micro-batches and
    quantile estimates within the value range ordered by percentile."""
    from metaprofi_spark.streaming.sketches import streaming_tdigest_centiles

    src = str(tmp_path / "ev_td")
    ev = events.select(
        F.lit("g").alias("g"),
        F.col("value").cast("double"),
        (F.col("user_id") % 2 == 0).alias("__a"),
    )
    ev.filter("__a").drop("__a").write.parquet(src + "/a")
    ev.filter("NOT __a").drop("__a").write.parquet(src + "/b")
    ev = ev.drop("__a")
    stream = (
        spark.readStream.schema(ev.schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(src + "/*")
    )
    pcts = [5, 50, 95]
    q = (
        streaming_tdigest_centiles(stream, "g", "value", pcts)
        .writeStream.format("memory")
        .queryName("std")
        .outputMode("update")
        .start()
    )
    q.processAllAvailable()
    q.stop()
    rows = spark.sql(
        "select * from (select *, row_number() over "
        "(partition by q_pct order by mono desc) rn from "
        "(select *, monotonically_increasing_id() mono from std)) where rn=1"
    ).collect()
    got = {r.q_pct: (r.value, r.n) for r in rows}
    n_total = ev.count()
    assert all(got[p][1] == n_total for p in pcts)
    lo = ev.agg(F.min("value")).first()[0]
    hi = ev.agg(F.max("value")).first()[0]
    assert lo <= got[5][0] <= got[50][0] <= got[95][0] <= hi


def test_streaming_dedup_equals_batch_groups(spark, tmp_path):
    """Streaming exact dedup == batch exact_duplicate_groups on the same
    rows, fed as MULTIPLE micro-batches (state folds across batches):
    exactly one survivor per fingerprint group, each a member of its
    group — the guarantee the batch twin gives, minus which member
    (batch keeps min id, stream keeps first seen)."""
    from metaprofi_spark.operators.dedup import exact_duplicate_groups
    from metaprofi_spark.streaming.dedup import stream_drop_exact_duplicates
    from tests.conftest import SF_DIR

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    # plant cross-batch duplicates: same text, whitespace/case variants
    extra = spark.createDataFrame(
        [(9001, "THE  planted   duplicate"), (9002, "the planted duplicate"),
         (9003, " The Planted Duplicate ")],
        "doc_id long, text string",
    )
    all_docs = docs.select("doc_id", "text").unionByName(extra)
    src = str(tmp_path / "dedup_src")
    # two files => at least two micro-batch-able splits; the planted
    # dupes straddle them (9002/9003 in file B, 9001 in file A)
    docs.select("doc_id", "text").filter(F.col("doc_id") < 250).unionByName(
        extra.filter(F.col("doc_id") == 9001)
    ).write.parquet(src + "/a")
    docs.select("doc_id", "text").filter(F.col("doc_id") >= 250).unionByName(
        extra.filter(F.col("doc_id") > 9001)
    ).write.parquet(src + "/b")
    stream = spark.readStream.schema(all_docs.schema).option(
        "maxFilesPerTrigger", 1
    ).parquet(src + "/*")
    q = (
        stream_drop_exact_duplicates(stream)
        .writeStream.format("memory").queryName("dedup_out")
        .outputMode("append").start()
    )
    q.processAllAvailable()
    q.stop()
    got = spark.sql("select * from dedup_out").collect()

    groups = exact_duplicate_groups(all_docs).collect()
    from metaprofi_spark.functions.text import fingerprint as fp_col

    fp_of = {r.doc_id: r.fp for r in all_docs.select(
        "doc_id", fp_col(F.col("text")).alias("fp")).collect()}
    # exactly one survivor per fingerprint group
    surv_fps = [fp_of[r.doc_id] for r in got]
    assert len(surv_fps) == len(set(surv_fps)) == len(groups)
    assert set(surv_fps) == {g.fp for g in groups}
    # the planted 3-row group collapsed to one survivor
    planted = [r.doc_id for r in got if r.doc_id in (9001, 9002, 9003)]
    assert len(planted) == 1


def test_streaming_dedup_watermark_mode_runs(spark, tmp_path):
    """dropDuplicatesWithinWatermark path: state is keyed by fingerprint
    with event-time eviction; same one-survivor-per-group result on a
    bounded replay (all rows inside the watermark)."""
    from metaprofi_spark.streaming.dedup import stream_drop_exact_duplicates

    rows = [(1, "same text", "2024-01-01 00:00:00"),
            (2, "same  TEXT ", "2024-01-01 00:10:00"),
            (3, "other text", "2024-01-01 00:20:00")]
    src = str(tmp_path / "wm_src")
    spark.createDataFrame(
        rows, "doc_id long, text string, ts string"
    ).withColumn("ts", F.col("ts").cast("timestamp")).write.parquet(src)
    stream = spark.readStream.schema(
        "doc_id long, text string, ts timestamp"
    ).parquet(src)
    q = (
        stream_drop_exact_duplicates(stream, ts_col="ts", watermark="1 hour")
        .writeStream.format("memory").queryName("dedup_wm")
        .outputMode("append").start()
    )
    q.processAllAvailable()
    q.stop()
    got = sorted(r.doc_id for r in spark.sql("select * from dedup_wm").collect())
    assert len(got) == 2 and 3 in got and (1 in got or 2 in got)


def test_streaming_near_dedup_single_batch_equals_batch_operator(spark, tmp_path):
    """A single-micro-batch stream through the near-dup sink must equal
    the batch pipeline exactly (step 3 IS drop_near_duplicates when the
    store is empty)."""
    from metaprofi_spark.operators.dedup import drop_near_duplicates
    from metaprofi_spark.streaming.dedup import stream_drop_near_duplicates
    from tests.conftest import SF_DIR

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").select("doc_id", "text")
    src = str(tmp_path / "nd_src")
    docs.write.parquet(src)
    stream = spark.readStream.schema(docs.schema).parquet(src)
    q = stream_drop_near_duplicates(
        stream, str(tmp_path / "sigs"), str(tmp_path / "out"),
        str(tmp_path / "ckpt"),
    )
    q.processAllAvailable()
    q.stop()
    got = {r.doc_id for r in spark.read.parquet(str(tmp_path / "out/batch=0")).collect()}
    want = {r.doc_id for r in drop_near_duplicates(docs).collect()}
    assert got == want and got


def test_streaming_near_dedup_multi_batch_invariants(spark, tmp_path):
    """Multi-batch fold: (a) no kept doc of a later batch shares a band
    bucket with ANY earlier-batch doc; (b) batch-1 kept == the batch
    operator over the store-survivors; (c) an at-least-once RETRY of a
    committed batch is idempotent (per-batch overwrite dirs + the
    batch< filter keep it from colliding with its own signatures)."""
    from metaprofi_spark.operators.dedup import drop_near_duplicates, minhash_bands
    from metaprofi_spark.streaming.dedup import foreach_batch_near_dedup
    from tests.conftest import SF_DIR

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").select("doc_id", "text")
    d0 = docs.filter(F.col("doc_id") < 250)
    # plant one token-disjoint doc in batch 1: this corpus is near-dup
    # heavy by construction (clean_corpus keeps ~8%), so batch 1 can
    # legitimately keep nothing — the planted doc guarantees the kept
    # set is non-trivially exercised
    unique = spark.createDataFrame(
        [(9999, "zqx wvy kjh pqr mnb vcx " * 4)], "doc_id long, text string"
    )
    d1 = docs.filter(F.col("doc_id") >= 250).unionByName(unique)
    sigs, out = str(tmp_path / "sigs"), str(tmp_path / "out")
    fn = foreach_batch_near_dedup(sigs, out)
    fn(d0, 0)
    fn(d1, 1)
    kept0 = spark.read.parquet(out + "/batch=0")
    kept1 = spark.read.parquet(out + "/batch=1")
    # (a) later-batch kept docs never collide with ANY earlier-batch doc
    b0 = minhash_bands(d0)
    bk1 = minhash_bands(kept1.select("doc_id", "text"))
    collisions = bk1.join(b0, ["band_id", "band_hash"], "left_semi").count()
    assert collisions == 0
    # (b) batch-1 kept == batch operator over the store-survivors
    hit = (
        minhash_bands(d1).join(b0, ["band_id", "band_hash"], "left_semi")
        .select(F.col("id").alias("doc_id")).distinct()
    )
    survivors = d1.join(hit, "doc_id", "left_anti")
    want1 = {r.doc_id for r in drop_near_duplicates(survivors).collect()}
    got1 = {r.doc_id for r in kept1.collect()}
    assert got1 == want1
    assert 9999 in got1  # the token-disjoint plant always survives
    # (c) retry of committed batch 1: identical output, no self-collision
    before = sorted(got1)
    fn(d1, 1)
    after = sorted(r.doc_id for r in spark.read.parquet(out + "/batch=1").collect())
    assert after == before and after


def test_streaming_near_dedup_compaction_equivalence(spark, tmp_path):
    """Folding batch dirs into the bucketed layout must not change
    results: same kept sets with compaction forced every batch as with
    it disabled; a replay of a FOLDED batch is still idempotent (rows
    keep their batch column through folding); a full rewrite collapses
    generations without changing history."""
    from metaprofi_spark.streaming.dedup import (
        _read_sig_manifest,
        compact_sig_store,
        foreach_batch_near_dedup,
    )

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").select(
        "doc_id", "text"
    )
    batches = [docs.filter((F.col("doc_id") % 3) == i) for i in range(3)]
    results = {}
    for tag, ce in (("c", 1), ("n", None)):
        sigs, out = str(tmp_path / f"sigs_{tag}"), str(tmp_path / f"out_{tag}")
        fn = foreach_batch_near_dedup(sigs, out, compact_every=ce)
        for i, bdf in enumerate(batches):
            fn(bdf, i)
        results[tag] = {
            i: sorted(
                r.doc_id
                for r in spark.read.parquet(out + f"/batch={i}").collect()
            )
            for i in range(3)
        }
    assert results["c"] == results["n"]
    sigs, out = str(tmp_path / "sigs_c"), str(tmp_path / "out_c")
    man = _read_sig_manifest(sigs)
    assert man and set(man["folded_batches"]) >= {0, 1}
    # replay of a folded batch: idempotent
    fn = foreach_batch_near_dedup(sigs, out, compact_every=1)
    fn(batches[1], 1)
    after = sorted(
        r.doc_id for r in spark.read.parquet(out + "/batch=1").collect()
    )
    assert after == results["c"][1] and after
    # full rewrite: one generation, history unchanged for a batch-2 replay
    compact_sig_store(spark, sigs, full=True)
    man2 = _read_sig_manifest(sigs)
    assert man2 and len(man2["generations"]) == 1
    fn(batches[2], 2)
    after2 = sorted(
        r.doc_id for r in spark.read.parquet(out + "/batch=2").collect()
    )
    assert after2 == results["c"][2]


def test_streaming_near_dedup_history_scan_prunes_buckets(spark, tmp_path):
    """The compacted history read prunes to the probing batch's bucket
    partitions (PartitionFilters on `bucket`) — per-batch history cost
    is O(colliding buckets), not O(all history), the r4 scale fix."""
    from metaprofi_spark.streaming.dedup import (
        compact_sig_store,
        foreach_batch_near_dedup,
        read_signature_history,
    )

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").select(
        "doc_id", "text"
    )
    sigs, out = str(tmp_path / "sigs"), str(tmp_path / "out")
    fn = foreach_batch_near_dedup(sigs, out, compact_every=None)
    fn(docs, 0)
    compact_sig_store(spark, sigs, n_buckets=8)
    hist = read_signature_history(spark, sigs, 1, buckets=[0, 3])
    plan = hist._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan and "bucket" in plan, plan
    assert 0 < hist.count() < docs.count() * 16  # strictly pruned
    # the probe joins broadcast the (trigger-bounded) batch keys:
    # history streams through map-side, never shuffled or sorted
    from metaprofi_spark.operators.dedup import minhash_bands

    bkeys = minhash_bands(docs.limit(50)).select(
        "band_id", "band_hash"
    ).distinct()
    probe = hist.join(
        F.broadcast(bkeys), ["band_id", "band_hash"], "left_semi"
    )
    jplan = probe._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in jplan and "SortMergeJoin" not in jplan, jplan


def test_sig_store_tiered_merge_bounds_generations(spark, tmp_path):
    """Size-tiered generation merging (binary-counter LSM policy):
    folding many equal-size batches one at a time keeps the generation
    count logarithmic — not one per fold — and never loses or
    duplicates a signature row."""
    from metaprofi_spark.operators.dedup import minhash_bands
    from metaprofi_spark.streaming.dedup import (
        _read_sig_manifest,
        compact_sig_store,
        read_signature_history,
    )

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").select(
        "doc_id", "text"
    )
    sigs = str(tmp_path / "sigs")
    total = 0
    n_batches = 6
    for i in range(n_batches):
        part = docs.filter((F.col("doc_id") % n_batches) == i)
        b = minhash_bands(part)
        b.write.mode("overwrite").parquet(
            os.path.join(sigs, "batches", f"batch={i}")
        )
        total += b.count()
        compact_sig_store(spark, sigs, n_buckets=8)
    man = _read_sig_manifest(sigs)
    assert len(man["generations"]) <= 3, man["generations"]  # ~log2(6)
    assert sum(man["gen_rows"].values()) == total
    hist = read_signature_history(spark, sigs, batch_id=n_batches)
    assert hist.count() == total
    # per-batch retry invariant survives every merge: rows of batch 3+
    # are invisible to a replay of batch 3
    h3 = read_signature_history(spark, sigs, batch_id=3)
    b3 = minhash_bands(docs.filter((F.col("doc_id") % n_batches) < 3))
    assert h3.count() == b3.count()


def test_sig_store_random_sequence_matches_model(spark, tmp_path):
    """Model-based interaction test for the LSM signature store: a
    fixed-seed random sequence of {fold new batch, replay a committed
    batch (same content, the at-least-once contract), incremental
    compact, full compact} against a driver-side model dict.  After
    every op, read_signature_history at several batch horizons must
    equal the model's union EXACTLY — catches fold/merge/replay
    interactions (e.g. replaying a batch already folded through a
    tiered cascade) that no single-op test sees."""
    import random

    from metaprofi_spark.streaming.dedup import (
        _read_sig_manifest,
        compact_sig_store,
        read_signature_history,
    )

    rng = random.Random(11)
    sigs = str(tmp_path / "sigs")
    model = {}

    def write_batch(b, rows=None):
        if rows is None:
            rows = [
                (
                    rng.randrange(10**6),
                    rng.randrange(4),
                    rng.randrange(-(2**40), 2**40),
                )
                for _ in range(rng.randrange(5, 40))
            ]
        spark.createDataFrame(
            rows, "id long, band_id int, band_hash long"
        ).coalesce(1).write.mode("overwrite").parquet(
            os.path.join(sigs, "batches", f"batch={b}")
        )
        model[b] = rows

    def check():
        for horizon in sorted({1, 3, max(model) + 1}):
            want = sorted(
                r for b, rows in model.items() if b < horizon for r in rows
            )
            hist = read_signature_history(spark, sigs, horizon)
            got = (
                sorted((r.id, r.band_id, r.band_hash) for r in hist.collect())
                if hist is not None
                else []
            )
            assert got == want, f"horizon {horizon}: {len(got)} vs {len(want)}"

    next_b = 0
    compactions = 0
    for _ in range(14):
        op = rng.choice(["new", "new", "replay", "compact", "full"])
        if op == "new" or not model:
            write_batch(next_b)
            next_b += 1
        elif op == "replay":
            b = rng.randrange(next_b)
            write_batch(b, rows=model[b])
        elif op == "compact":
            compact_sig_store(spark, sigs, n_buckets=4)
            compactions += 1
        else:
            compact_sig_store(spark, sigs, n_buckets=4, full=True)
            compactions += 1
        check()
    assert compactions and next_b >= 4
    man = _read_sig_manifest(sigs)
    assert man and man["generations"]


def test_sig_store_recency_window_and_expiry(spark, tmp_path):
    """history_batches=W (the near-dup dropDuplicatesWithinWatermark
    analog): a duplicate of a batch OUTSIDE the window is kept again,
    a duplicate INSIDE the window is still dropped, and compaction with
    the expire mark physically reclaims wholly-expired generations
    (manifest range pruning) without touching in-window history."""
    from metaprofi_spark.streaming.dedup import (
        _read_sig_manifest,
        compact_sig_store,
        foreach_batch_near_dedup,
        read_signature_history,
    )

    base = spark.read.parquet(f"{SF_DIR}/documents.parquet").select(
        "doc_id", "text"
    )
    # three token-disjoint planted docs so collisions are fully controlled
    mk = lambda i, txt: spark.createDataFrame(  # noqa: E731
        [(i, txt)], "doc_id long, text string"
    )
    t_old = "aaa bbb ccc ddd eee fff " * 4
    t_new = "ggg hhh iii jjj kkk lll " * 4
    sigs, out = str(tmp_path / "sigs"), str(tmp_path / "out")
    fn = foreach_batch_near_dedup(
        sigs, out, compact_every=1, history_batches=2
    )
    fn(base.filter(F.col("doc_id") < 100).unionByName(mk(9001, t_old)), 0)
    fn(mk(9002, t_new), 1)
    fn(mk(9003, "mmm nnn ooo ppp qqq rrr " * 4), 2)
    # batch 3: window = batches {1, 2}. 9001's dup (batch 0, expired)
    # must survive; 9002's dup (batch 1, in window) must be dropped.
    fn(mk(9004, t_old).unionByName(mk(9005, t_new)), 3)
    kept3 = {
        r.doc_id for r in spark.read.parquet(out + "/batch=3").collect()
    }
    assert 9004 in kept3  # old-history dup re-admitted: window semantics
    assert 9005 not in kept3  # in-window dup still dropped
    # physical expiry: every surviving generation's range ends >= 1,
    # no committed signature older than the mark remains readable
    man = _read_sig_manifest(sigs)
    assert man["expired_before"] >= 1
    for g in man["generations"]:
        lo, hi = man["gen_ranges"][g]
        assert hi is None or hi >= man["expired_before"]
    hist = read_signature_history(spark, sigs, batch_id=4)
    assert hist.filter(F.col("id") == 9001).count() == 0  # batch-0 gone
    assert hist.filter(F.col("id") == 9002).count() > 0  # in-window kept
