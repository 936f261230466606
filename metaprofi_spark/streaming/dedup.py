"""Structured-Streaming exact dedup — the streaming twin of
operators/dedup.exact_duplicate_groups / drop_exact_duplicates (the one
pre-training pipeline stage that had no streaming sibling: a stream of
crawled pages needs duplicate pages dropped BEFORE any downstream
build/sketch stage sees them).

Semantics: the batch twin keeps the min-id representative of every
normalized-text fingerprint group; a stream cannot know the future min
id, so the streaming operator keeps the FIRST-SEEN row per fingerprint
— the standard streaming-dedup contract (Spark's dropDuplicates
state semantics).  What IS identical to batch: the surviving
fingerprint set (exactly one survivor per group, each a member of its
group), pinned by test against exact_duplicate_groups on the same rows.

State shape at 100 TB: one state row per DISTINCT fingerprint (16-byte
md5 key), partitioned by the shuffle on the dedup key — linear in
unique documents, constant per duplicate.  With an event-time column,
``watermark`` bounds the state instead
(dropDuplicatesWithinWatermark): fingerprints older than the watermark
are evicted, which is the only sustainable mode on an unbounded crawl
stream (an unwatermarked stream's state grows with the corpus — fine
for bounded backfills, documented trade).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, functions as F

from metaprofi_spark.functions.text import fingerprint

_FP = "__fp"


def stream_drop_exact_duplicates(
    stream_df: DataFrame,
    text_col: str = "text",
    ts_col: str | None = None,
    watermark: str | None = None,
) -> DataFrame:
    """Keep the first-seen row per normalized-text fingerprint.

    ``ts_col``+``watermark`` (e.g. ``("ts", "1 hour")``) switches to
    dropDuplicatesWithinWatermark: state for fingerprints whose event
    time has passed the watermark is evicted, bounding state on
    unbounded streams.  The ts column is cast to TIMESTAMP first
    (event-time watermarks reject TIMESTAMP_NTZ).
    """
    fp = stream_df.withColumn(_FP, fingerprint(F.col(text_col)))
    if ts_col is not None:
        if watermark is None:
            raise ValueError("ts_col given without a watermark duration")
        fp = (
            fp.withColumn(ts_col, F.col(ts_col).cast("timestamp"))
            .withWatermark(ts_col, watermark)
            .dropDuplicatesWithinWatermark([_FP])
        )
    else:
        fp = fp.dropDuplicates([_FP])
    return fp.drop(_FP)


def foreach_batch_near_dedup(
    sig_store: str,
    out_dir: str,
    n_perm: int = 64,
    bands: int = 16,
    id_col: str = "doc_id",
    text_col: str = "text",
):
    """foreachBatch callback: MinHash near-dup dedup of a document
    stream against everything seen before — the streaming twin of
    operators/dedup.drop_near_duplicates, with the LSH signature state
    in a PARQUET STORE instead of executor memory (the only shape that
    survives an unbounded crawl: state is ~b longs per doc, readable by
    any later job, and partition-pruned per micro-batch).

    Per micro-batch:

    1. band signatures of the batch (`minhash_bands` — the same
       Arrow-buffer kernel as batch dedup);
    2. drop docs sharing ANY band bucket with a PREVIOUS batch
       (left_anti against the store, partition-filtered to
       batch < current — so a retry never collides with its own
       half-written signatures);
    3. within-batch: the exact batch operator (`drop_near_duplicates`:
       connected components, min-id representative) over the survivors
       — a single-batch stream is therefore IDENTICAL to the batch
       pipeline (pinned by test);
    4. append the batch's signatures (`batch=N` partition) and write
       the kept docs (`out/batch=N`) — both mode=overwrite into
       per-batch dirs, so at-least-once retries are idempotent.

    Invariant pinned by test: no kept doc shares a band bucket with any
    doc of an earlier batch, and within a batch the kept set equals the
    batch operator's output on the store-survivors.
    """
    from metaprofi_spark.operators.dedup import drop_near_duplicates, minhash_bands

    def fn(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        spark = batch_df.sparkSession
        b = minhash_bands(batch_df, n_perm, bands, id_col, text_col)
        survivors = batch_df
        if os.path.isdir(sig_store) and any(
            e.startswith("batch=") for e in os.listdir(sig_store)
        ):
            prev = spark.read.option("basePath", sig_store).parquet(
                sig_store + "/batch=*"
            ).filter(F.col("batch") < batch_id)
            hit = (
                b.join(prev, ["band_id", "band_hash"], "left_semi")
                .select(F.col("id").alias(id_col))
                .distinct()
            )
            survivors = batch_df.join(hit, id_col, "left_anti")
        kept = drop_near_duplicates(survivors, n_perm, bands, id_col, text_col)
        kept.write.mode("overwrite").parquet(
            os.path.join(out_dir, f"batch={batch_id}")
        )
        b.write.mode("overwrite").parquet(
            os.path.join(sig_store, f"batch={batch_id}")
        )

    return fn


def stream_drop_near_duplicates(
    stream_df: DataFrame,
    sig_store: str,
    out_dir: str,
    checkpoint_dir: str,
    n_perm: int = 64,
    bands: int = 16,
    id_col: str = "doc_id",
    text_col: str = "text",
):
    """Wire a document stream through MinHash near-dup dedup; kept docs
    land under ``out_dir/batch=N``.  Returns the StreamingQuery."""
    return (
        stream_df.writeStream.outputMode("append")
        .option("checkpointLocation", checkpoint_dir)
        .foreachBatch(
            foreach_batch_near_dedup(
                sig_store, out_dir, n_perm, bands, id_col, text_col
            )
        )
        .start()
    )
