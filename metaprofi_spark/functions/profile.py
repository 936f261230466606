"""Table profiling for training-data QA: one row per column with null
counts, exact distinct counts, and min/max rendered as strings — the
standard pre-ingest sanity sweep.  Everything is JVM expressions in a
single aggregation pass per column set (no python), so the profile is
SQL-checkable bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def profile_table(df: DataFrame, columns: list[str] | None = None) -> DataFrame:
    """DataFrame(column, n_rows, n_nulls, n_distinct, min_s, max_s).

    One wide aggregation computes every column's stats in a single
    pass, then a stack() pivot emits one row per column — no per-column
    jobs, no driver loops.
    """
    cols = columns or [f.name for f in df.schema.fields]
    aggs = [F.count(F.lit(1)).alias("__n")]
    for c in cols:
        aggs.append(F.sum(F.when(F.col(c).isNull(), 1).otherwise(0)).alias(f"{c}__nulls"))
        aggs.append(F.countDistinct(F.col(c)).alias(f"{c}__distinct"))
        aggs.append(F.min(F.col(c)).cast("string").alias(f"{c}__min"))
        aggs.append(F.max(F.col(c)).cast("string").alias(f"{c}__max"))
    wide = df.agg(*aggs)
    stack_args = ", ".join(
        f"'{c}', `{c}__nulls`, `{c}__distinct`, `{c}__min`, `{c}__max`" for c in cols
    )
    return wide.select(
        F.col("__n").alias("n_rows"),
        F.expr(
            f"stack({len(cols)}, {stack_args}) as "
            "(column, n_nulls, n_distinct, min_s, max_s)"
        ),
    ).select("column", "n_rows", "n_nulls", "n_distinct", "min_s", "max_s")
