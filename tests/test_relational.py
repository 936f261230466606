"""Relational analytics queries: plan-shape assertions (pushdown,
pruning, broadcast dims) + result sanity.  Value-exactness vs DuckDB is
the driver gate's job (scripts/check_oracles.py replicates it)."""

import metaprofi_spark.queries as Q
from tests.conftest import SF01_DIR


def test_pricing_summary_pushdown_and_pruning(spark):
    df = Q.pricing_summary(spark, SF01_DIR)
    plan = df._jdf.queryExecution().executedPlan().toString()
    # the shipdate predicate reaches the parquet reader
    assert "LessThanOrEqual(l_shipdate" in plan, plan
    # column pruning: 6 of 11 lineitem columns
    assert (
        "ReadSchema: struct<l_quantity:double,l_extendedprice:double,l_discount:double,"
        in plan
    ), plan
    rows = df.collect()
    assert rows and all(r.sum_qty_c > 0 and r.n_rows > 0 for r in rows)


def test_customers_per_region_broadcasts_dims(spark):
    df = Q.customers_per_region(spark, SF01_DIR)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert plan.count("BroadcastHashJoin") >= 2, plan
    assert "SortMergeJoin" not in plan, plan
    rows = df.collect()
    assert sum(r.n_customers for r in rows) == (
        spark.read.parquet(f"{SF01_DIR}/customer.parquet").count()
    )


def test_top_orders_deterministic(spark):
    a = [(r.o_orderkey, r.revenue_cc) for r in Q.top_orders_by_revenue(spark, SF01_DIR).collect()]
    b = [(r.o_orderkey, r.revenue_cc) for r in Q.top_orders_by_revenue(spark, SF01_DIR).collect()]
    assert a == b and len(a) == Q.TOPK_N
    revs = [r for _, r in a]
    assert revs == sorted(revs, reverse=True)
