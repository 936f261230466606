"""Structured-Streaming analytics over event streams.

Completes the engine's streaming surface next to the index-append path
(streaming/append.py):

* :func:`hourly_event_rollup` — watermarked tumbling-window aggregation
  (the streaming twin of queries.events_hourly; late rows beyond the
  watermark are dropped, counts/sums are exact per window, distinct
  users is the HLL estimate since exact distinct is unbounded state).
* :func:`sessionize_stream` — custom stateful operator via
  ``applyInPandasWithState``: gap-based sessionization per user with
  explicit timeout handling, the pattern for operators Spark's built-in
  windows can't express.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

SESSION_SCHEMA = "user_id long, session_start timestamp, session_end timestamp, n_events long"
_STATE_SCHEMA = "start long, last long, n long"


def hourly_event_rollup(stream_df: DataFrame, watermark: str = "2 hours") -> DataFrame:
    """Tumbling 1-hour windows per event_type with a late-data watermark.

    Quantized integer value sums (bit-exact vs the batch twin); distinct
    users via HLL (bounded state — exact distinct over an unbounded
    stream is not).
    """
    # parquet timestamps read as TIMESTAMP_NTZ; event-time watermarks
    # require TIMESTAMP
    stream_df = stream_df.withColumn("ts", F.col("ts").cast("timestamp"))
    return (
        stream_df.withWatermark("ts", watermark)
        .groupBy(F.window("ts", "1 hour").alias("w"), F.col("event_type"))
        .agg(
            F.count("*").alias("n_events"),
            F.sum(F.round(F.col("value") * 1e6).cast("long")).alias("sum_value_e6"),
            F.approx_count_distinct("user_id").alias("n_users_est"),
        )
        .select(
            F.col("w.start").alias("hour"),
            "event_type",
            "n_events",
            "sum_value_e6",
            "n_users_est",
        )
    )


def sessionize_stream(
    stream_df: DataFrame, gap_minutes: int = 30, timeout_minutes: int | None = None
) -> DataFrame:
    """Gap-based sessionization as a custom stateful streaming operator.

    State per user = (session start, last event, count) as epoch
    seconds; a batch's events extend the open session or close it and
    open a new one when the gap exceeds ``gap_minutes``.  With
    ``timeout_minutes`` set, a processing-time timeout flushes sessions
    of users that went quiet (long-running deployments); ``None`` keeps
    open sessions in state until more events arrive.  Closed sessions
    are emitted as rows — the ``applyInPandasWithState`` pattern for
    operators tumbling/sliding windows cannot express.
    """
    gap_s = gap_minutes * 60

    def fn(key, pdfs, state: GroupState):
        user_id = key[0]
        out = []
        if state.hasTimedOut:
            if state.exists:
                start, last, n = state.get
                out.append((user_id, start, last, n))
            state.remove()
        else:
            ts = []
            for pdf in pdfs:
                ts.extend(int(t.timestamp()) for t in pdf["ts"])
            ts.sort()
            if state.exists:
                start, last, n = state.get
            else:
                start, last, n = ts[0], ts[0], 0
            for t in ts:
                if t - last > gap_s:
                    out.append((user_id, start, last, n))
                    start, n = t, 0
                last = t
                n += 1
            state.update((start, last, n))
            if timeout_minutes is not None:
                state.setTimeoutDuration(timeout_minutes * 60 * 1000)
        if out:
            yield pd.DataFrame(
                {
                    "user_id": pd.array([o[0] for o in out], dtype="int64"),
                    "session_start": pd.to_datetime([o[1] for o in out], unit="s"),
                    "session_end": pd.to_datetime([o[2] for o in out], unit="s"),
                    "n_events": pd.array([o[3] for o in out], dtype="int64"),
                }
            )

    return (
        stream_df.select("user_id", F.col("ts").cast("timestamp").alias("ts"))
        .groupBy("user_id")
        .applyInPandasWithState(
            fn,
            outputStructType=SESSION_SCHEMA,
            stateStructType=_STATE_SCHEMA,
            outputMode="append",
            timeoutConf=(
                GroupStateTimeout.ProcessingTimeTimeout
                if timeout_minutes is not None
                else GroupStateTimeout.NoTimeout
            ),
        )
    )
