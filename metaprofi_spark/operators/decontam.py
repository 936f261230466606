"""Benchmark decontamination — the n-gram overlap sweep every LLM
training pipeline runs before training (the GPT-3 appendix-C /
Dolma-style 13-gram check): flag corpus documents sharing word
n-grams with a benchmark/eval set.

Execution shape (the 100-TB plan):

* n-gram extraction is pure JVM (split → sequence → transform →
  slice → array_join) — codegen'd, no Python, no UDF;
* the benchmark side is TINY relative to the corpus (eval suites are
  MBs; the corpus is TBs) — its distinct grams are BROADCAST, so the
  only shuffle on the corpus side is the final per-doc count, which
  is partial-agg friendly (map-side combine on doc_id);
* corpus grams are joined AS GENERATED — never materialized corpus-wide.

The reference's analog is the exact-search membership sweep over the
Bloom matrix (search_index.py); here the "probe set" is the benchmark
n-grams and exactness is required, so a broadcast hash semi-join
replaces the sketch.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from metaprofi_spark.functions.text import tokens_col


def word_ngrams(text_col, n: int):
    """Column expression: array of space-joined word n-grams of
    lower(text), whitespace-tokenized, empties dropped.  Docs with
    fewer than n tokens yield an empty array (the sequence() guard —
    Spark's sequence(0, negative) would COUNT DOWN, not stay empty)."""
    toks = tokens_col(F.lower(text_col))
    grams = F.transform(
        F.sequence(F.lit(1), F.size(toks) - (n - 1)),
        lambda i: F.array_join(F.slice(toks, i, n), " "),
    )
    return F.when(F.size(toks) >= n, grams).otherwise(
        F.array().cast("array<string>")
    )


def ngram_rows(df: DataFrame, n: int, id_col: str = "doc_id",
               text_col: str = "text") -> DataFrame:
    """(id, gram) — DISTINCT word n-grams per document."""
    return df.select(
        F.col(id_col).alias("id"),
        F.explode(F.array_distinct(word_ngrams(F.col(text_col), n))).alias("gram"),
    )


def contamination_report(
    corpus: DataFrame,
    benchmark: DataFrame,
    n: int = 5,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Per contaminated corpus doc: (doc_id, n_hits, contaminated)
    where n_hits = #distinct word n-grams shared with ANY benchmark
    doc.  Clean docs are absent (filter them downstream with an
    anti-join, or invert via drop_contaminated)."""
    from metaprofi_spark.plans.parallel import fan_out

    bench_grams = F.broadcast(
        ngram_rows(benchmark, n, id_col, text_col).select("gram").distinct()
    )
    # gram generation is the expensive map stage (~0.6 ms/doc of JVM
    # array building); fan_out guards against a tiny corpus scan
    # pinning it to one task — no-op at real corpus scale
    hits = ngram_rows(fan_out(corpus), n, id_col, text_col).join(bench_grams, "gram")
    return (
        hits.groupBy("id")
        .agg(F.count("*").alias("n_hits"))  # grams distinct per doc upstream
        .select(
            F.col("id").alias(id_col),
            F.col("n_hits"),
            F.lit(True).alias("contaminated"),
        )
    )


def benchmark_grams(
    benchmark: DataFrame,
    n: int,
    min_len: int,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> list[str]:
    """The benchmark's distinct word n-grams of length >= min_len,
    collected to the driver — bounded by the EVAL-SUITE size (MBs),
    never the corpus; the same boundedness class as the search
    workbook's probe list (SCALE.md driver-materialization table)."""
    rows = (
        ngram_rows(benchmark, n, id_col, text_col)
        .filter(F.length("gram") >= min_len)
        .select("gram")
        .distinct()
        .collect()
    )
    return sorted(r["gram"] for r in rows)


def contamination_report_indexed(
    spark,
    index_df: DataFrame,
    corpus: DataFrame,
    grams: list[str],
    cfg,
    sample_bucket_size: int | None = None,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Index-accelerated decontamination: the Bloom bit-sliced index as
    the contamination PREFILTER, exact `instr` containment as the
    verify — per contaminated doc, (doc_id, n_hits) with n_hits =
    #distinct benchmark grams contained in lower(text).

    Two-tier shape (identical to bloom_substring_search): the t=100
    index pass has zero false negatives, so the verify join touches
    candidates only — the corpus is never grammed or shuffled at all,
    which beats contamination_report when the corpus dwarfs the
    benchmark and an index already exists (the persisted-store serving
    case).  Semantics are SUBSTRING containment of the
    single-space-normalized gram (matches mid-word too) — the
    word-boundary variant is contamination_report.
    """
    from metaprofi_spark.operators.bloom_search import search

    cand = search(
        spark, index_df, [(g, g) for g in grams], cfg,
        threshold=100, sample_bucket_size=sample_bucket_size,
    )
    return (
        cand.withColumnRenamed("query_id", "gram")
        .join(corpus, cand.sample_idx == corpus[id_col])
        .filter(F.instr(F.lower(F.col(text_col)), F.col("gram")) > 0)
        .groupBy(id_col)
        .agg(F.count_distinct("gram").alias("n_hits"))
    )


def drop_contaminated(
    corpus: DataFrame,
    benchmark: DataFrame,
    n: int = 5,
    min_hits: int = 1,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Corpus minus documents sharing >= min_hits distinct n-grams
    with the benchmark — the actual pipeline step."""
    bad = contamination_report(corpus, benchmark, n, id_col, text_col).filter(
        F.col("n_hits") >= min_hits
    )
    return corpus.join(bad.select(id_col), id_col, "left_anti")
