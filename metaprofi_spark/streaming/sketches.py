"""Mergeable sketches as CUSTOM STATEFUL streaming operators.

Spark's built-in streaming aggregations can't run our Arrow-vectorized
sketch UDAFs (pandas aggregation UDFs are unsupported in streaming
aggs), but the sketches' mergeability is exactly what
``applyInPandasWithState`` needs: the group state IS the serialized
sketch, each micro-batch folds its rows in (bounded state regardless of
stream length), and every update emits the refreshed estimate.

This is the streaming twin of functions/sketch_agg.py — same kernels,
same register layout, so a streaming HLL state equals the batch fold of
everything it has seen (pinned by test).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

import numpy as np

from metaprofi_spark.kernels import cms as C
from metaprofi_spark.kernels import hll as H
from metaprofi_spark.kernels.arrowbuf import utf8_values


def streaming_hll_distinct(
    stream_df: DataFrame,
    key_col: str,
    value_col: str,
    p: int = 12,
) -> DataFrame:
    """Running distinct-count estimate per key over a stream:
    (key, n_distinct_est), one refreshed row per key per micro-batch.

    State per key = one 2^p-byte HLL register file — constant-size no
    matter how many rows stream through, the property that makes exact
    streaming distinct impossible but sketch streaming trivial.  Uses
    NoTimeout: state lives for the query lifetime (eviction policy is
    the caller's via timeouts if desired).
    """
    out_schema = f"{key_col} string, n_distinct_est double"
    state_schema = "regs binary"

    def fn(key, pdfs, state: GroupState):
        regs = (
            H.hll_deserialize(bytes(state.get[0]))
            if state.exists
            else H.hll_init(p)
        )
        for pdf in pdfs:
            H.hll_add(regs, utf8_values(pdf[value_col]))
        state.update((H.hll_serialize(regs),))
        yield pd.DataFrame(
            {key_col: [key[0]], "n_distinct_est": [H.hll_estimate(regs)]}
        )

    return (
        stream_df.select(key_col, value_col)
        .groupBy(key_col)
        .applyInPandasWithState(
            fn, out_schema, state_schema, "update", GroupStateTimeout.NoTimeout
        )
    )


def streaming_cms_topk(
    stream_df: DataFrame,
    key_col: str,
    value_col: str,
    watch: list[str],
    depth: int = 4,
    width: int = 2048,
) -> DataFrame:
    """Running count-min frequency estimates per key for a WATCHED value
    list: (key, value, est, n_total), refreshed per micro-batch.

    State per key = one depth*width counter table (constant-size).  The
    watch list makes the emission bounded — the CMS answers point
    queries, so a streaming heavy-hitter surface needs a candidate set;
    the watched values are estimated against the full folded state
    every batch (overestimate-only, <= true + eps*N, the published CMS
    bound).  The streaming fold equals the batch cms_agg over
    everything seen (same kernel, pinned by test)."""
    out_schema = f"{key_col} string, value string, est long, n_total long"
    state_schema = "table binary, n long"
    wvals = [w.encode("utf-8") for w in watch]

    def fn(key, pdfs, state: GroupState):
        if state.exists:
            blob, n = state.get
            table = C.cms_deserialize(bytes(blob))
            n = int(n)
        else:
            table = C.cms_init(depth, width)
            n = 0
        for pdf in pdfs:
            counts = pdf[value_col].value_counts()
            if len(counts):
                C.cms_add(table, utf8_values(pd.Series(counts.index)),
                          counts.to_numpy().astype(np.int64))
                n += int(counts.sum())
        state.update((C.cms_serialize(table), n))
        ests = C.cms_query(table, wvals)
        yield pd.DataFrame(
            {
                key_col: [key[0]] * len(watch),
                "value": watch,
                "est": pd.array(ests, dtype="int64"),
                "n_total": pd.array([n] * len(watch), dtype="int64"),
            }
        )

    return (
        stream_df.select(key_col, value_col)
        .groupBy(key_col)
        .applyInPandasWithState(
            fn, out_schema, state_schema, "update", GroupStateTimeout.NoTimeout
        )
    )


def streaming_kll_quantiles(
    stream_df: DataFrame,
    key_col: str,
    value_col: str,
    q_pcts: list[int],
    k: int = 200,
) -> DataFrame:
    """Running rank-error-bounded quantile estimates per key:
    (key, q_pct, value, n), refreshed per micro-batch.

    State per key = one serialized KLL sketch — O(k log(n/k)) items, the
    published KLL bound, so state stays tiny no matter how long the
    stream runs.  The micro-batch fold IS the sketch's add(); the
    streaming state after all batches equals the batch fold of the same
    rows in the same encounter order (KLL compaction is
    arrival-order-dependent by design — rank error bounds, not
    bit-equality, are the cross-order guarantee)."""
    from metaprofi_spark.kernels.kll import KLLSketch

    out_schema = f"{key_col} string, q_pct int, value double, n long"
    state_schema = "blob binary"

    def fn(key, pdfs, state: GroupState):
        sk = (
            KLLSketch.deserialize(bytes(state.get[0]))
            if state.exists
            else KLLSketch(k=k)
        )
        for pdf in pdfs:
            vals = pdf[value_col].dropna().to_numpy(dtype=float)
            if len(vals):
                sk.add(vals)
        state.update((sk.serialize(),))
        yield pd.DataFrame(
            {
                key_col: [key[0]] * len(q_pcts),
                "q_pct": pd.array(q_pcts, dtype="int32"),
                "value": [sk.quantile(p / 100) for p in q_pcts],
                "n": pd.array([sk.n] * len(q_pcts), dtype="int64"),
            }
        )

    return (
        stream_df.select(key_col, value_col)
        .groupBy(key_col)
        .applyInPandasWithState(
            fn, out_schema, state_schema, "update", GroupStateTimeout.NoTimeout
        )
    )


def streaming_kmv_distinct(
    stream_df: DataFrame,
    key_col: str,
    value_col: str,
    k: int = 8192,
) -> DataFrame:
    """Running KMV bottom-k distinct sketch per key: (key,
    n_distinct_est, sketch), refreshed per micro-batch.

    State per key = the serialized bottom-k hash vector (≤ 8k bytes) —
    constant-size like the HLL twin, but the emitted SKETCH column
    supports downstream SET OPERATIONS (kernels/kmv.py kmv_set_ops):
    intersect/union the latest sketches of two keys to track, e.g.,
    rolling audience overlap — the query streaming HLL cannot answer.
    The estimate is exact while a key's distinct count stays under k
    (pinned == batch kmv_agg by test)."""
    from metaprofi_spark.kernels import kmv as K

    out_schema = f"{key_col} string, n_distinct_est double, sketch binary"
    state_schema = "blob binary"

    def fn(key, pdfs, state: GroupState):
        st = (
            K.kmv_deserialize(bytes(state.get[0]))
            if state.exists
            else K.kmv_init()
        )
        for pdf in pdfs:
            st = K.kmv_add(st, utf8_values(pdf[value_col]), k)
        blob = K.kmv_serialize(st)
        state.update((blob,))
        yield pd.DataFrame(
            {
                key_col: [key[0]],
                "n_distinct_est": [K.kmv_estimate(st, k)],
                "sketch": [blob],
            }
        )

    return (
        stream_df.select(key_col, value_col)
        .groupBy(key_col)
        .applyInPandasWithState(
            fn, out_schema, state_schema, "update", GroupStateTimeout.NoTimeout
        )
    )


def streaming_mg_topk(
    stream_df: DataFrame,
    key_col: str,
    value_col: str,
    topn: int,
    k: int = 4096,
) -> DataFrame:
    """Running Misra–Gries heavy hitters per key — the streaming top-n
    WITHOUT a watch list (streaming_cms_topk needs one): (key, value,
    cnt, rank), refreshed per micro-batch.

    State per key = <= k counters; counts stay exact while the key's
    distinct values never exceed k (pinned == batch mg_topk by test),
    degrading to the MG n/(k+1) bound after."""
    from metaprofi_spark.kernels.mg import MGSketch

    out_schema = f"{key_col} string, {value_col} string, cnt long, rank int"
    state_schema = "blob binary"

    def fn(key, pdfs, state: GroupState):
        sk = (
            MGSketch.deserialize(bytes(state.get[0]))
            if state.exists
            else MGSketch(k)
        )
        for pdf in pdfs:
            sk.fold_series(pdf[value_col])
        state.update((sk.serialize(),))
        top = sk.topk(topn)
        yield pd.DataFrame(
            {
                key_col: [key[0]] * len(top),
                value_col: [v.decode("utf-8") for v, _ in top],
                "cnt": pd.array([c for _, c in top], dtype="int64"),
                "rank": pd.array(range(1, len(top) + 1), dtype="int32"),
            }
        )

    return (
        stream_df.select(key_col, value_col)
        .groupBy(key_col)
        .applyInPandasWithState(
            fn, out_schema, state_schema, "update", GroupStateTimeout.NoTimeout
        )
    )


def streaming_tdigest_centiles(
    stream_df: DataFrame,
    key_col: str,
    value_col: str,
    q_pcts: list[int],
    compression: float = 100.0,
) -> DataFrame:
    """Running t-digest quantile estimates per key:
    (key, q_pct, value, n) — the fourth mergeable sketch lifted to a
    stateful streaming operator.  State per key = one serialized digest
    (<= ~2*compression centroids after compaction, constant-size);
    total weight n is EXACT (every value folds with weight 1)."""
    from metaprofi_spark.kernels.tdigest import TDigest

    out_schema = f"{key_col} string, q_pct int, value double, n long"
    state_schema = "blob binary"

    def fn(key, pdfs, state: GroupState):
        td = (
            TDigest.deserialize(bytes(state.get[0]))
            if state.exists
            else TDigest(compression)
        )
        for pdf in pdfs:
            vals = pdf[value_col].dropna().to_numpy(dtype=float)
            if len(vals):
                td.add(vals)
        state.update((td.serialize(),))
        yield pd.DataFrame(
            {
                key_col: [key[0]] * len(q_pcts),
                "q_pct": pd.array(q_pcts, dtype="int32"),
                "value": [td.quantile(p / 100) for p in q_pcts],
                "n": pd.array([int(td.n)] * len(q_pcts), dtype="int64"),
            }
        )

    return (
        stream_df.select(key_col, value_col)
        .groupBy(key_col)
        .applyInPandasWithState(
            fn, out_schema, state_schema, "update", GroupStateTimeout.NoTimeout
        )
    )
