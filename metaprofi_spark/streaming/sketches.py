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

from metaprofi_spark.kernels import hll as H
from metaprofi_spark.kernels.arrowbuf import series_utf8_buffer


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
            buf = series_utf8_buffer(pdf[value_col])
            if buf is not None:
                H.hll_add(regs, buf)
            else:
                H.hll_add(
                    regs,
                    [str(v).encode("utf-8") for v in pdf[value_col] if v is not None],
                )
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
