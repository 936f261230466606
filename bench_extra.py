#!/usr/bin/env python
"""EXTRA benchmarks (not part of the frozen bench.py contract).

Prints one JSON line with:
  * query-count scaling: the workbook search at 1k / 5k / 20k queries
    with broadcast_queries=False (the reference's million-read shape,
    benchmarks/tara_oceans_index/README.md:59-64) — 1k/5k pin the
    cogrouped fused tier's per-query cost, 20k crosses the cogroup cap
    and pins the streaming joined tier;
  * maintenance surface: compact_store + vacuum_store walls on a copy
    of the bench store after one update (the 100-TB operator's
    compaction cost as a first-class number).

Same interleaved min-of-N discipline as bench.py.  Usage:
  PYTHONPATH=. python bench_extra.py
"""
from __future__ import annotations

import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import functions as F  # noqa: E402

from metaprofi_spark import SketchConfig  # noqa: E402
from metaprofi_spark.operators import load_index, search_df  # noqa: E402
from metaprofi_spark.plans.session import get_spark  # noqa: E402

BENCH_DOCS = int(os.environ.get("SPARK_GRAFT_BENCH_DOCS", "100000"))
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
REPS = int(os.environ.get("SPARK_GRAFT_QUERY_REPS", "3"))
BENCH_CFG = SketchConfig(k=12, h=2, m=1 << 16, chunk_bits=1 << 16, slice_buckets=32)
PAGES_PATH = f"/tmp/metaprofi_bench_pages_{BENCH_DOCS}.parquet"
STORE = f"/tmp/metaprofi_bench_store_{BENCH_DOCS}"


def main() -> None:
    spark = get_spark(cores=CPUS, app_name="bench-extra")
    spark.sparkContext.setLogLevel("ERROR")
    result: dict = {"metric": "extra_benchmarks", "unit": "sec"}

    index_df, cfg, manifest = load_index(spark, STORE, BENCH_CFG)
    index_df = index_df.cache()
    index_df.count()
    bucket = manifest["sample_bucket_size"]
    pages = spark.read.parquet(PAGES_PATH).withColumn(
        "doc_id", F.substring_index(F.col("url"), "/", -1).cast("long")
    )
    base = pages.filter(F.octet_length("text") > 12 * BENCH_CFG.k).limit(700).collect()

    def make_qdf(n: int):
        qs = []
        for i in range(n):
            r = base[i % len(base)]
            qs.append((f"p{i}", r.text[11 + (i // len(base)) % 5: 11 + 6 * BENCH_CFG.k]))
        qdf = spark.createDataFrame(
            qs, "query_id string, query_text string"
        ).repartition(CPUS).cache()
        qdf.count()
        return qdf

    scaling = {}
    qdfs = {n: make_qdf(n) for n in (1000, 5000, 20000)}

    def run(qdf) -> float:
        t0 = time.time()
        n = search_df(
            spark, index_df, qdf, cfg, 75, bucket, broadcast_queries=False
        ).count()
        assert n >= 0
        return round(time.time() - t0, 3)

    # 1k/5k run under the cogrouped fused tier; 20k (~2.1M hash rows)
    # exceeds the cogroup cap and exercises the streaming joined tier —
    # expensive (its n_hash x n_buckets shuffle is ~30 GB raw; 50k would
    # need ~80 GB and does not fit this sandbox's disk), so one rep
    reps_for = {n: (1 if n >= 20000 else REPS) for n in qdfs}
    for n, qdf in qdfs.items():
        if reps_for[n] > 1:
            run(qdf)  # warm
    walls = {n: [] for n in qdfs}
    for rep in range(REPS):
        for n, qdf in qdfs.items():
            if rep < reps_for[n]:
                walls[n].append(run(qdf))
    for n in qdfs:
        scaling[str(n)] = {
            "sec": min(walls[n]),
            "walls": walls[n],
            "ms_per_query": round(min(walls[n]) / n * 1000, 3),
        }
        qdfs[n].unpersist()
    result["query_count_scaling_t75_shuffle"] = scaling

    # maintenance surface: compact + vacuum on a throwaway copy of the
    # bench store (never touches the real store the frozen bench uses)
    from metaprofi_spark.operators.bloom_update import (
        compact_store,
        update_store,
        vacuum_store,
    )

    mstore = f"/tmp/metaprofi_bench_maint_{BENCH_DOCS}"
    shutil.rmtree(mstore, ignore_errors=True)
    shutil.copytree(STORE, mstore)
    new_docs = (
        pages.filter(F.col("doc_id") < 5000)
        .select((F.col("doc_id")).alias("doc_id"), "text")
    )
    t0 = time.time()
    update_store(spark, mstore, new_docs, BENCH_CFG, sample_bucket_size=bucket)
    update_sec = round(time.time() - t0, 3)
    t0 = time.time()
    compact_info = compact_store(spark, mstore)
    compact_sec = round(time.time() - t0, 3)
    t0 = time.time()
    vacuumed = vacuum_store(mstore)
    vacuum_sec = round(time.time() - t0, 3)
    result["maintenance"] = {
        "store_docs": BENCH_DOCS,
        "update_5000_docs_sec": update_sec,
        "compact_sec": compact_sec,
        "compact_info": {k: v for k, v in compact_info.items()
                         if isinstance(v, (int, str, float))},
        "vacuum_sec": vacuum_sec,
        "vacuum_reclaimed_segments": vacuumed,
    }
    shutil.rmtree(mstore, ignore_errors=True)
    spark.stop()
    print(json.dumps(result))


if __name__ == "__main__":
    main()
