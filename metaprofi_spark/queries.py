"""Registry of driver-checkable queries.

Each query is a ``(spark, sf_dir) -> DataFrame`` callable paired (where
SQL-expressible) with an ANSI-SQL oracle that DuckDB runs on the same
parquet tables.  Column names are aligned between both sides — the
driver compares row count + schema + order-insensitive value hash.

Queries whose Spark answer is a SKETCH ESTIMATE (HLL/CMS/KLL) have no
SQL oracle (the driver records a rows-only check); their error bounds
are asserted in tests/ against exact answers instead.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, functions as F

from metaprofi_spark.config import SketchConfig
from metaprofi_spark.operators import build_index, build_matrix, search

# ---------------------------------------------------------------------------
# shared fixtures
# ---------------------------------------------------------------------------

QUERY_CFG = SketchConfig(k=8, h=2, m=1 << 18, chunk_bits=1 << 15, slice_buckets=16)
_BUCKET = 4096

# literal probe strings, >= k bytes each; mixed expected-positive
# (corpus vocabulary) and expected-negative (decoy) probes
PROBES = [
    "table part",
    "spark order",
    "window spark",
    "zz@@ absent-from-corpus @@zz",
]


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/documents.parquet")


def _probes_sql_values() -> str:
    return ", ".join("('" + p.replace("'", "''") + "')" for p in PROBES)


# ---------------------------------------------------------------------------
# Bloom membership (A1+A3+A5+A6+J1+J2): index prefilter + exact verify
# ---------------------------------------------------------------------------

def bloom_substring_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact substring search accelerated by the Bloom bit-sliced index.

    The index pass (threshold=100 membership) returns candidate docs with
    ZERO false negatives; an exact `contains` verification join removes
    Bloom false positives, so the final answer is exact and SQL-checkable.
    This is the scale architecture: the index prunes the corpus, the
    verify join touches only candidates.
    """
    docs = _docs(spark, sf_dir)
    bf = build_matrix(docs, QUERY_CFG, id_col="doc_id", text_col="text")
    idx = build_index(bf, QUERY_CFG, sample_bucket_size=_BUCKET)
    cand = search(
        spark, idx, [(p, p) for p in PROBES], QUERY_CFG,
        threshold=100, sample_bucket_size=_BUCKET,
    )
    verified = (
        cand.withColumnRenamed("query_id", "probe")
        .join(docs, cand.sample_idx == docs.doc_id)
        .filter(F.instr(F.lower(F.col("text")), F.lower(F.col("probe"))) > 0)
        .select(F.col("probe"), F.col("doc_id"))
    )
    return verified


BLOOM_SUBSTRING_SQL = f"""
SELECT q.probe AS probe, d.doc_id AS doc_id
FROM (VALUES {_probes_sql_values()}) q(probe)
JOIN documents d ON instr(lower(d.text), lower(q.probe)) > 0
"""


# ---------------------------------------------------------------------------
# Bloom threshold search (A7): candidates verified by exact k-gram counting
# ---------------------------------------------------------------------------

THRESHOLD_PROBE = "query lineitem batch window spark order"
THRESHOLD_T = 40


def bloom_threshold_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Thresholded membership: docs containing >= t% of the probe's
    k-gram occurrences.  Index gives a superset (counts can only be
    inflated by false positives); exact per-candidate recount trims it.
    """
    docs = _docs(spark, sf_dir)
    cfg = QUERY_CFG
    bf = build_matrix(docs, cfg, id_col="doc_id", text_col="text")
    idx = build_index(bf, cfg, sample_bucket_size=_BUCKET)
    cand = search(
        spark, idx, [("t", THRESHOLD_PROBE)], cfg,
        threshold=THRESHOLD_T, sample_bucket_size=_BUCKET,
    )
    # exact verify: recount which probe k-grams truly occur in each
    # candidate doc (JVM-side: sequence/substring, no python)
    probe = THRESHOLD_PROBE.lower()
    n = len(probe.encode()) - cfg.k + 1
    kgrams = [probe[i : i + cfg.k] for i in range(n)]
    kg_df = spark.createDataFrame([(g,) for g in kgrams], "kgram string")
    hits = (
        cand.join(docs, cand.sample_idx == docs.doc_id)
        .crossJoin(F.broadcast(kg_df))
        .filter(F.instr(F.lower(F.col("text")), F.col("kgram")) > 0)
        .groupBy("doc_id")
        .agg(F.count("*").alias("true_hits"))
        .filter(F.col("true_hits") * 100 >= F.lit(THRESHOLD_T) * F.lit(n))
        .select("doc_id", "true_hits")
    )
    return hits


def _threshold_sql() -> str:
    probe = THRESHOLD_PROBE.lower()
    k = QUERY_CFG.k
    n = len(probe.encode()) - k + 1
    vals = ", ".join(
        "('" + probe[i : i + k].replace("'", "''") + "')" for i in range(n)
    )
    return f"""
SELECT d.doc_id AS doc_id, count(*) AS true_hits
FROM documents d JOIN (VALUES {vals}) g(kgram)
  ON instr(lower(d.text), g.kgram) > 0
GROUP BY d.doc_id
HAVING count(*) * 100 >= {THRESHOLD_T} * {n}
"""


# ---------------------------------------------------------------------------
# registry
# ---------------------------------------------------------------------------

def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
        "bloom_substring_search": bloom_substring_search,
        "bloom_threshold_search": bloom_threshold_search,
    }


def oracle_sql() -> dict[str, str]:
    return {
        "bloom_substring_search": BLOOM_SUBSTRING_SQL,
        "bloom_threshold_search": _threshold_sql(),
    }
