#!/usr/bin/env python
"""Focused workbook-key timer: replicates bench.py's query_throughput
setup exactly (same store, same workbook), times only the three
query_1000_* keys interleaved min-of-N.  Usage: REPS=5 python
scripts/bench_workbook.py"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from metaprofi_spark import SketchConfig  # noqa: E402
from metaprofi_spark.operators import load_index, search_df  # noqa: E402
from metaprofi_spark.plans.session import get_spark  # noqa: E402

BENCH_DOCS = 100000
BENCH_CFG = SketchConfig(k=12, h=2, m=1 << 16, chunk_bits=1 << 16, slice_buckets=32)
PAGES_PATH = f"/tmp/metaprofi_bench_pages_{BENCH_DOCS}.parquet"
STORE = f"/tmp/metaprofi_bench_store_{BENCH_DOCS}"
REPS = int(os.environ.get("REPS", "4"))


def main() -> None:
    spark = get_spark(cores=32, app_name="bench-workbook")
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
    keys = [
        ("t100", dict(threshold=100, broadcast_queries=True)),
        ("t75", dict(threshold=75, broadcast_queries=True)),
        ("t75_shuffle", dict(threshold=75, broadcast_queries=False)),
    ]

    def run(kw) -> float:
        t0 = time.time()
        n = search_df(spark, index_df, qdf, cfg, kw["threshold"], bucket,
                      broadcast_queries=kw["broadcast_queries"]).count()
        assert n >= 0
        return round(time.time() - t0, 3)

    for _, kw in keys:
        run(kw)  # warm
    walls = {k: [] for k, _ in keys}
    for rep in range(REPS):
        for k, kw in keys:
            walls[k].append(run(kw))
        print(f"rep{rep}: " + " ".join(f"{k}={walls[k][-1]}" for k, _ in keys), flush=True)
    print("MIN: " + " ".join(f"{k}={min(v)}" for k, v in walls.items()), flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
