#!/usr/bin/env python
"""Stage-isolation profiler for the query_1000_* bench keys (guide §1).

Replicates bench.py's query_throughput setup exactly (same store, same
1000-query workbook), then times each stage of the search plan with a
noop sink so the computation is measured, not the sink:

  stage "hash":     hash_queries_df + eager localCheckpoint + bucket list
  stage "join":     broadcast join + slab substring cut -> noop
  stage "shuffle":  + repartition(query_id, sample_bucket) -> noop
  stage "full_t100"/"full_t75": the complete search_df -> count

All keys are timed interleaved round-robin (min-of-N) per the repo's
host-drift protocol.  Explain output goes to plans/r06/.
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from metaprofi_spark import SketchConfig  # noqa: E402
from metaprofi_spark.operators import load_index, search_df  # noqa: E402
from metaprofi_spark.operators.bloom_index import plan_index_geometry, slice_bucket_size  # noqa: E402
from metaprofi_spark.operators.bloom_search import hash_queries_df  # noqa: E402
from metaprofi_spark.plans.session import get_spark  # noqa: E402

BENCH_DOCS = 100000
BENCH_CFG = SketchConfig(k=12, h=2, m=1 << 16, chunk_bits=1 << 16, slice_buckets=32)
PAGES_PATH = f"/tmp/metaprofi_bench_pages_{BENCH_DOCS}.parquet"
STORE = f"/tmp/metaprofi_bench_store_{BENCH_DOCS}"
REPS = int(os.environ.get("REPS", "3"))


def noop(df):
    df.write.format("noop").mode("overwrite").save()


def main() -> None:
    spark = get_spark(cores=32, app_name="profile-search")
    spark.sparkContext.setLogLevel("ERROR")
    index_df, cfg, manifest = load_index(spark, STORE, BENCH_CFG)
    index_df = index_df.cache()
    index_df.count()
    bucket = manifest["sample_bucket_size"]

    pages = spark.read.parquet(PAGES_PATH).withColumn(
        "doc_id", F.substring_index(F.col("url"), "/", -1).cast("long")
    )
    base = pages.filter(F.octet_length("text") > 12 * BENCH_CFG.k).limit(700).collect()
    queries = [(f"p{i}", r.text[11 : 11 + 6 * BENCH_CFG.k]) for i, r in enumerate(base)]
    queries += [
        (f"n{i}", f"@@decoy-{i:04d}-not-in-corpus-@@##$$%%^^&&**")
        for i in range(1000 - len(queries))
    ]
    qdf = (
        spark.createDataFrame(queries, "query_id string, query_text string")
        .repartition(32).cache()
    )
    qdf.count()

    rsize = cfg.slice_range_size
    width_bytes = (bucket + 7) // 8
    sb_size = slice_bucket_size(cfg)
    shuffle_p = int(spark.conf.get("spark.sql.shuffle.partitions", "32"))

    def stage_hash():
        t0 = time.time()
        hashes = hash_queries_df(qdf, cfg).localCheckpoint(eager=True)
        buckets = sorted(
            r["b"]
            for r in hashes.select(
                (F.col("slice_id") / F.lit(sb_size)).cast("int").alias("b")
            ).distinct().collect()
        )
        dt = time.time() - t0
        return dt, hashes, buckets

    def build_joined(hashes, buckets):
        hdf = hashes.withColumn("range_id", F.expr(f"slice_id div {rsize}"))
        pruned = index_df.filter(F.col("slice_bucket").isin(buckets))
        return (
            pruned.join(F.broadcast(hdf), "range_id")
            .withColumn(
                "bits",
                F.expr(
                    f"substring(bits, cast((slice_id % {rsize}) * {width_bytes} + 1 as int), {width_bytes})"
                ),
            )
            .select(
                "query_id", "kgram_idx", "sample_bucket", "weight", "n_slices",
                "n_kgrams", "bits",
            )
        )

    def run_stage(name, fn):
        spark.sparkContext.setJobDescription(name)
        t0 = time.time()
        fn()
        dt = time.time() - t0
        spark.sparkContext.setJobDescription(None)
        return round(dt, 3)

    # prepare hash rows once for the stage probes
    _, hashes0, buckets0 = stage_hash()
    joined0 = build_joined(hashes0, buckets0)

    keys = {
        "hash": lambda: stage_hash(),
        "join_noop": lambda: noop(joined0),
        "shuffle_noop": lambda: noop(
            joined0.repartition(shuffle_p, "query_id", "sample_bucket")
        ),
        "full_t100": lambda: search_df(
            spark, index_df, qdf, cfg, 100, bucket, broadcast_queries=True
        ).count(),
        "full_t75": lambda: search_df(
            spark, index_df, qdf, cfg, 75, bucket, broadcast_queries=True
        ).count(),
        "full_t75_shuffle": lambda: search_df(
            spark, index_df, qdf, cfg, 75, bucket, broadcast_queries=False
        ).count(),
    }
    # row/byte shape of the join output
    n_hash = hashes0.count()
    n_join = joined0.count()
    print(f"hash_rows={n_hash} joined_rows={n_join} width_bytes={width_bytes}", flush=True)

    walls = {k: [] for k in keys}
    for k, fn in keys.items():  # warm pass
        run_stage(f"warm:{k}", fn)
    for rep in range(REPS):
        for k, fn in keys.items():
            walls[k].append(run_stage(f"rep{rep}:{k}", fn))
        print(f"rep{rep}: " + " ".join(f"{k}={walls[k][-1]}" for k in keys), flush=True)
    print("MIN: " + " ".join(f"{k}={min(v)}" for k, v in walls.items()), flush=True)

    os.makedirs("/root/repo/plans/r06", exist_ok=True)
    for name, t, bq in [("query_1000_t100", 100, True), ("query_1000_t75", 75, True),
                        ("query_1000_t75_shuffle", 75, False)]:
        df = search_df(spark, index_df, qdf, cfg, t, bucket, broadcast_queries=bq)
        with open(f"/root/repo/plans/r06/{name}_before.txt", "w") as f:
            f.write(df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"))
    spark.stop()


if __name__ == "__main__":
    main()
