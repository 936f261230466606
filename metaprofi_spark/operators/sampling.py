"""Deterministic stratified sampling — per-stratum quota selection by
hash order, the mixture-construction step of a training-data pipeline
("take N docs per language/domain/quality-bucket, reproducibly").

Rank key = md5(seed:doc_id) — a seeded uniform permutation both Spark
and any SQL engine compute identically (hex strings compare byte-wise
the same everywhere), so runs are reproducible across engines and
cluster sizes, unlike rand()-based sampling.

Scale shape: a naive window (row_number over partitionBy(stratum))
shuffles the WHOLE corpus into #strata partitions — with 5 languages
at 100 TB that is 5 executors doing everything (the skew failure).
Selection here is two-phase top-N instead:

  phase 1: per (stratum, salt) top-N via window over SALT*#strata
      evenly sized groups — each group holds a superset guarantee
      (the global per-stratum top-N is contained in the union of its
      salt groups' top-N);
  phase 2: top-N over the phase-1 survivors — at most SALT*N rows per
      stratum, a bounded relation.

The same trick the Bloom build uses for size-sorted packing skew
(operators/bloom_build.py O1).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F


def rank_key(id_col, seed: int):
    """Deterministic per-row permutation key: md5('<seed>:<id>')."""
    return F.md5(F.concat_ws(":", F.lit(str(seed)), F.col(id_col).cast("string")))


def stratified_sample(
    df: DataFrame,
    strata_cols: list[str],
    n_per_stratum: int,
    id_col: str = "doc_id",
    seed: int = 42,
    salt: int = 16,
) -> DataFrame:
    """The n_per_stratum hash-smallest rows of every stratum
    (deterministic; fewer if the stratum is smaller).  Returns the
    input columns unchanged."""
    key = rank_key(id_col, seed).alias("_rk")
    salted = df.select("*", key, (F.pmod(F.xxhash64(F.col(id_col)), F.lit(salt))).alias("_salt"))
    w1 = Window.partitionBy(*strata_cols, "_salt").orderBy("_rk", id_col)
    phase1 = (
        salted.withColumn("_rn", F.row_number().over(w1))
        .filter(F.col("_rn") <= n_per_stratum)
        .drop("_rn", "_salt")
    )
    w2 = Window.partitionBy(*strata_cols).orderBy("_rk", id_col)
    return (
        phase1.withColumn("_rn", F.row_number().over(w2))
        .filter(F.col("_rn") <= n_per_stratum)
        .drop("_rn", "_rk")
    )


def stratified_sample_sql(
    table: str,
    strata_cols: list[str],
    n_per_stratum: int,
    id_col: str = "doc_id",
    seed: int = 42,
    select_cols: str | None = None,
) -> str:
    """The single-window ANSI-SQL twin (the oracle): QUALIFY
    row_number() over (partition by strata order by md5-key)."""
    strata = ", ".join(strata_cols)
    cols = select_cols or f"{id_col}, {strata}"
    return f"""
SELECT {cols}
FROM {table}
QUALIFY row_number() OVER (
  PARTITION BY {strata}
  ORDER BY md5(concat('{seed}', ':', CAST({id_col} AS VARCHAR))), {id_col}
) <= {n_per_stratum}
"""
