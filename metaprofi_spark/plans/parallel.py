"""Scan fan-out guard for heavy map-side work over tiny inputs.

A single small parquet file (one row group) plans as ONE scan
partition, so every downstream narrow operation — n-gram generation,
signature kernels, tokenize+explode — runs single-threaded no matter
how many cores the session has.  Parquet cannot split below row-group
boundaries, so no file-source conf fixes this; only an exchange does.

``fan_out`` adds that exchange ONLY when the input has fewer
partitions than the session's default parallelism: at production
scale a table scan has thousands of splits and this is a no-op (the
partition-count probe plans the query but runs no job).  The
round-robin repartition is deterministic under retries
(sort-before-repartition, SPARK-23207 — on by default), and every
operator using it is partitioning-invariant by construction.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def fan_out(df: DataFrame, factor: int = 1) -> DataFrame:
    """Repartition ``df`` to ``defaultParallelism * factor`` partitions
    iff it currently has fewer — no-op (and no shuffle) otherwise."""
    sc = df.sparkSession.sparkContext
    target = sc.defaultParallelism * factor
    if df.rdd.getNumPartitions() >= target:
        return df
    return df.repartition(target)
