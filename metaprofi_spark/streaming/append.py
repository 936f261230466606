"""Structured-Streaming incremental index maintenance.

The reference's closest feature is the batch `update` CLI
(/root/reference/metaprofi/lib/metaprofi_main.py:184-213 →
build_index_zarr.py:217-430) with a monotonically growing sample
dimension.  Because our Bloom build is a MERGEABLE aggregate
(bucket-aligned appends, bitwise-OR partials), the same ``update_store``
used for batch appends drops directly into ``foreachBatch``:

    stream of new docs -> foreachBatch(append_batch) -> snapshot append

Each micro-batch is one update snapshot (update_count bumps per batch);
exactly-once comes from the streaming checkpoint + the append being a
new set of files per batch.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

from metaprofi_spark.config import SketchConfig
from metaprofi_spark.operators.bloom_update import update_store


def foreach_batch_appender(path: str, cfg: SketchConfig,
                           id_col: str = "doc_id", text_col: str = "text"):
    """Returns the foreachBatch callback appending each micro-batch to
    the persisted index store at ``path``."""

    def append_batch(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        spark = batch_df.sparkSession
        # segment named by the micro-batch id: foreachBatch is
        # at-least-once, and a retry of an already-committed batch must
        # be a no-op (update_store skips committed segment names)
        update_store(
            spark, path, batch_df, cfg, id_col=id_col, text_col=text_col,
            segment_name=f"batch{batch_id}",
        )

    return append_batch


def stream_append(
    stream_df: DataFrame,
    path: str,
    cfg: SketchConfig,
    checkpoint_dir: str,
    id_col: str = "doc_id",
    text_col: str = "text",
):
    """Wire a streaming DataFrame of documents into the index store.
    Returns the StreamingQuery (caller awaits/stops it)."""
    return (
        stream_df.writeStream.outputMode("append")
        .option("checkpointLocation", checkpoint_dir)
        .foreachBatch(foreach_batch_appender(path, cfg, id_col, text_col))
        .start()
    )
