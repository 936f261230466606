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
