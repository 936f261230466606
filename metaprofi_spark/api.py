"""High-level API — 1:1 facade over the reference's CLI surface
(/root/reference/metaprofi/metaprofi_main.py:19-282):

    reference subcommand     -> this module
    build / build-seq        -> build(spark, docs, cfg, path)
    build_matrix             -> matrix(docs, cfg)
    build_index              -> index(spark, docs, cfg, path)
    update / update-seq      -> update(spark, path, new_docs, cfg)
    search_index             -> query(spark, path, queries, threshold)
    summary                  -> summary(spark, path)

Everything returns DataFrames / dicts; persistence uses the
partitioned-parquet store with a JSON manifest.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from metaprofi_spark.config import SketchConfig
from metaprofi_spark.operators import (
    build_index,
    build_matrix,
    build_matrix_grouped,
    densify_samples,
    load_index,
    persist_index,
    search,
    search_df,
    store_summary,
    update_store,
)


def matrix(docs: DataFrame, cfg: SketchConfig,
           id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """`metaprofi build_matrix` analog: per-sample Bloom filter chunks."""
    return build_matrix(docs, cfg, id_col=id_col, text_col=text_col)


def build_matrix_store(
    spark: SparkSession,
    docs: DataFrame,
    cfg: SketchConfig,
    matrix_path: str,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> dict:
    """Staged `build_matrix` subcommand (metaprofi_main.py:216-225):
    persist the Bloom matrix alone; `build_index_from_matrix` turns it
    into a searchable store later."""
    from metaprofi_spark.operators import persist_matrix

    n = docs.count()
    bf = build_matrix(docs, cfg, id_col=id_col, text_col=text_col)
    persist_matrix(bf, matrix_path, cfg, n_samples=n)
    return {"n_samples": n, "matrix_path": matrix_path}


def build_index_from_matrix(
    spark: SparkSession,
    matrix_path: str,
    path: str,
    sample_bucket_size: int | None = None,
) -> dict:
    """Staged `build_index` subcommand (metaprofi_main.py:227-236):
    index a PRE-BUILT matrix store.  Config and n_samples come from the
    matrix manifest (F8-guarded)."""
    from metaprofi_spark.operators import load_matrix

    bf, cfg, manifest = load_matrix(spark, matrix_path)
    idx = build_index(bf, cfg, sample_bucket_size=sample_bucket_size)
    persist_index(
        idx, path, cfg, n_samples=int(manifest["n_samples"]),
        sample_bucket_size=sample_bucket_size,
    )
    return store_summary(spark, path)


def update_index_from_matrix(
    spark: SparkSession, path: str, matrix_path: str
) -> dict:
    """Staged `update_index` subcommand (metaprofi_main.py:238-247):
    append a pre-built update matrix (sample_idx dense 0..n_new-1) to
    an existing index store as a new snapshot segment."""
    return update_store(spark, path, matrix_path=matrix_path)


def build(
    spark: SparkSession,
    docs: DataFrame,
    cfg: SketchConfig,
    path: str,
    sample_bucket_size: int | None = None,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> dict:
    """`metaprofi build` analog: matrix + bit-sliced index + persist.
    Returns the store summary."""
    n = docs.count()
    bf = build_matrix(docs, cfg, id_col=id_col, text_col=text_col)
    idx = build_index(bf, cfg, sample_bucket_size=sample_bucket_size)
    persist_index(idx, path, cfg, n_samples=n, sample_bucket_size=sample_bucket_size)
    return store_summary(spark, path)


def build_grouped(
    spark: SparkSession,
    docs: DataFrame,
    cfg: SketchConfig,
    path: str,
    group_col: str,
    sample_bucket_size: int | None = None,
    text_col: str = "text",
) -> dict:
    """The reference's FILE-LEVEL `build` (one sample = all rows of a
    group, metaprofi_main.py:148-181 / zarrstore.py:37-48), vs
    :func:`build` which is the per-row `build-seq` mode.

    Group keys are densified to a deterministic sample_idx (sorted key
    order) and the (sample_idx -> group_key) dim table is persisted
    next to the index as ``samples/`` — the J2 lookup surface.
    """
    bf = build_matrix_grouped(docs, cfg, group_col=group_col, text_col=text_col)
    dim = densify_samples(bf.select("group_key").distinct(), "group_key").select(
        "group_key", "sample_idx"
    )
    n = dim.count()
    bfi = bf.join(dim, "group_key").select("sample_idx", "chunk_id", "bf")
    idx = build_index(bfi, cfg, sample_bucket_size=sample_bucket_size)
    persist_index(idx, path, cfg, n_samples=n, sample_bucket_size=sample_bucket_size,
                  extra_meta={"group_col": group_col})
    dim.write.mode("overwrite").parquet(f"{path}/samples")
    return store_summary(spark, path)


def samples_dim(spark: SparkSession, path: str) -> DataFrame:
    """Load the (group_key, sample_idx) dim of a grouped store (J2)."""
    return spark.read.parquet(f"{path}/samples")


def update(
    spark: SparkSession,
    path: str,
    new_docs: DataFrame,
    cfg: SketchConfig,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> dict:
    """`metaprofi update` analog: bucket-aligned snapshot append."""
    return update_store(spark, path, new_docs, cfg, id_col=id_col, text_col=text_col)


def query(
    spark: SparkSession,
    path: str,
    queries: list[tuple[str, str]] | DataFrame,
    threshold: int = 100,
    cfg: SketchConfig | None = None,
    write_to_file: str | None = None,
    seq_type: str | None = None,
    sample_ids: list[int] | None = None,
    sample_names: list[str] | None = None,
    snapshot: int | None = None,
) -> DataFrame:
    """`metaprofi search_index` analog; accepts a query list (single
    sequences, §3.2) or a DataFrame (file of queries, §3.3).  Optionally
    writes the reference-format text report (S9).  ``seq_type`` /
    ``sample_ids`` forward to :func:`search` (six-frame translation,
    sample-scoped lookup).

    ``sample_names`` scopes by sample IDENTIFIERS — the reference's
    user-facing scoping (search_index.py:549-553 takes names, not
    matrix positions): resolved to sample_idx via the grouped store's
    ``samples/`` dim (J2), then pruned exactly like ``sample_ids``.
    Unknown names raise (matching the reference's keyerror behavior).

    ``snapshot=N`` searches a historical committed snapshot (time
    travel; valid until vacuum/compact reclaims its segments)."""
    index_df, stored_cfg, manifest = load_index(spark, path, cfg, snapshot=snapshot)
    bucket = manifest["sample_bucket_size"]
    if sample_names is not None:
        if sample_ids is not None:
            raise ValueError("pass sample_ids or sample_names, not both")
        rows = _resolve_sample_names(spark, path, sample_names)
        sample_ids = [int(r.sample_idx) for r in rows]
        if snapshot is not None:
            # the dim is the CURRENT store's; a name whose sample joined
            # after the queried snapshot must error, not silently match
            # nothing (r3 review)
            beyond = [r.group_key for r in rows
                      if int(r.sample_idx) >= int(manifest["n_samples"])]
            if beyond:
                raise KeyError(
                    f"sample names not present in snapshot {snapshot}: "
                    f"{sorted(beyond)}"
                )
    if isinstance(queries, DataFrame):
        res = search_df(spark, index_df, queries, stored_cfg, threshold, bucket,
                        sample_ids=sample_ids)
    else:
        res = search(spark, index_df, queries, stored_cfg, threshold, bucket,
                     sample_ids=sample_ids, seq_type=seq_type)
    # tombstones (logical deletes): excluded at the result edge — the
    # manifest is snapshot-scoped, so time travel shows pre-delete hits
    from metaprofi_spark.operators.bloom_update import load_tombstones

    tomb = load_tombstones(spark, path, manifest)
    if tomb is not None:
        res = res.join(tomb, "sample_idx", "left_anti")
    if write_to_file:
        from metaprofi_spark.operators.bloom_search import write_results_stream

        write_results_stream(res, write_to_file, threshold)
    return res


def _resolve_sample_names(spark: SparkSession, path: str, names: list[str]):
    """Sample NAMES -> dim rows via the grouped store's samples/ dim
    (the reference's user-facing scoping, search_index.py:549-553);
    unknown names raise — shared by query() and delete()."""
    dim = samples_dim(spark, path)
    rows = dim.filter(dim.group_key.isin(list(names))).collect()
    missing = set(names) - {r.group_key for r in rows}
    if missing:
        raise KeyError(f"unknown sample names: {sorted(missing)}")
    return rows


def delete(
    spark: SparkSession,
    path: str,
    sample_ids: list[int] | None = None,
    sample_names: list[str] | None = None,
) -> dict:
    """Logical sample deletion (tombstones — no reference analog; the
    takedown/opt-out operation a training-data pipeline needs).  Deleted
    samples stop appearing in :func:`query` results immediately;
    physical bits are reclaimed at the next full rebuild.  Accepts
    matrix positions or, for grouped stores, sample NAMES (resolved via
    the samples dim exactly like query's scoping)."""
    from metaprofi_spark.operators.bloom_update import delete_samples

    if sample_names is not None:
        if sample_ids is not None:
            raise ValueError("pass sample_ids or sample_names, not both")
        rows = _resolve_sample_names(spark, path, sample_names)
        sample_ids = [int(r.sample_idx) for r in rows]
    if not sample_ids:
        raise ValueError("delete needs sample_ids or sample_names")
    return delete_samples(spark, path, sample_ids)


def rollback(path: str, snapshot: int) -> dict:
    """Iceberg ``rollback_to_snapshot``: make snapshot N the current
    state via a NEW commit (history stays linear; rolled-past snapshots
    remain readable until vacuum expires them).  Undoes updates AND
    deletes committed after N."""
    from metaprofi_spark.operators.bloom_update import rollback_store

    return rollback_store(path, snapshot)


def summary(spark: SparkSession, path: str) -> dict:
    """`metaprofi summary` analog (utilities.py:598-638)."""
    return store_summary(spark, path)


def compact(spark: SparkSession, path: str, vacuum: bool = True) -> dict:
    """Store maintenance: collapse all committed segments into one
    (atomic snapshot swap) and optionally reclaim orphan dirs."""
    from metaprofi_spark.operators import compact_store, vacuum_store

    manifest = compact_store(spark, path)
    if vacuum:
        manifest = dict(manifest, vacuumed=vacuum_store(path))
    return manifest
