"""Composed training-data pipelines — the workflows a 100-TB corpus
actually runs, assembled from the library's operators.

`clean_corpus` is the canonical pre-training sweep:
    exact dedup -> near-dup dedup (LSH components) -> quality floor
Each stage is a documented scale shape (one shuffle / linear star
edges / pure map); stats are per-stage retention counts.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from metaprofi_spark.functions.text import quality_score
from metaprofi_spark.operators.dedup import (
    drop_exact_duplicates,
    drop_near_duplicates,
)


def clean_corpus(
    docs: DataFrame,
    min_quality: float = 0.3,
    n_perm: int = 64,
    bands: int = 8,
    id_col: str = "doc_id",
    text_col: str = "text",
    with_stats: bool = True,
) -> tuple[DataFrame, dict]:
    """Returns (cleaned docs, per-stage retention stats).

    Exact dedup first (one cheap shuffle on a 16-byte key) so the
    near-dup stage hashes each surviving text once; near-dup dedup via
    connected components (linear star edges — never candidate pairs);
    quality floor last (pure map, JVM expressions).  ``with_stats``
    triggers one count per stage — pass False to keep the pipeline a
    single lazy plan.

    The default S-curve is CONSERVATIVE (r = n_perm/bands = 8 rows per
    band: collision ~ 1-(1-j^8)^8, steep around j~0.8) — dedup that
    deletes documents should only fire on high-Jaccard near-dups;
    candidate-mining workloads that want recall at lower similarity use
    the operators directly with wider bands.
    """
    stats: dict = {}
    if with_stats:
        stats["n_input"] = docs.count()
    exact = drop_exact_duplicates(docs, id_col, text_col)
    if with_stats:
        stats["n_after_exact_dedup"] = exact.count()
    near = drop_near_duplicates(exact, n_perm, bands, id_col, text_col)
    if with_stats:
        stats["n_after_near_dedup"] = near.count()
    cleaned = near.filter(quality_score(F.col(text_col)) >= min_quality)
    if with_stats:
        stats["n_after_quality"] = cleaned.count()
        stats["retention"] = round(stats["n_after_quality"] / max(stats["n_input"], 1), 4)
    return cleaned, stats


def curate_corpus(
    docs: DataFrame,
    benchmark: DataFrame,
    strata_cols: list[str],
    n_per_stratum: int,
    min_quality: float = 0.3,
    decontam_n: int = 3,
    seed: int = 42,
    n_perm: int = 64,
    bands: int = 8,
    id_col: str = "doc_id",
    text_col: str = "text",
    with_stats: bool = True,
) -> tuple[DataFrame, dict]:
    """The FULL training-data curation sweep:

        clean_corpus (exact dedup -> near-dup -> quality floor)
        -> benchmark decontamination (drop docs sharing word n-grams
           with the eval set)
        -> deterministic stratified quota sample

    Every stage keeps its documented scale shape (one md5 shuffle /
    linear star edges / pure map / broadcast gram join / two-phase
    top-N) and the result is reproducible across engines and cluster
    sizes (md5 rank keys, no rand()).  The hash-exact gate twin is
    ``curated_sample_ids`` (verified-pair components + the whole chain
    re-expressed in one DuckDB SQL)."""
    from metaprofi_spark.operators.decontam import drop_contaminated
    from metaprofi_spark.operators.sampling import stratified_sample

    cleaned, stats = clean_corpus(
        docs, min_quality, n_perm, bands, id_col, text_col, with_stats
    )
    decon = drop_contaminated(
        cleaned, benchmark, n=decontam_n, id_col=id_col, text_col=text_col
    )
    if with_stats:
        stats["n_after_decontam"] = decon.count()
    sample = stratified_sample(
        decon, strata_cols, n_per_stratum, id_col, seed=seed
    )
    if with_stats:
        stats["n_sampled"] = sample.count()
    return sample, stats
