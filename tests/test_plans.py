"""Physical-plan assertions: the scale properties the queries rely on,
locked as tests so a regression in composition (or a Spark upgrade)
surfaces here instead of at 100 TB.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from kafka_streams_tcp_reconciliation_spark.plans import all_queries
from kafka_streams_tcp_reconciliation_spark.sources.tables import load_table

QUERIES = all_queries()


def plan_of(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_q1_filter_pushdown_and_pruning(spark, sf_dir):
    plan = plan_of(QUERIES["q1_pricing_summary"](spark, sf_dir))
    assert "PushedFilters: [IsNotNull(l_shipdate), LessThanOrEqual(l_shipdate" in plan
    # column pruning: the scan must not read l_orderkey/l_partkey/l_suppkey
    read_schema = [l for l in plan.splitlines() if "ReadSchema" in l][0]
    assert "l_orderkey" not in read_schema and "l_partkey" not in read_schema


@pytest.mark.parametrize(
    "name, n_bhj",
    [("q3_top_revenue_orders", 2), ("q5_local_supplier_volume", 5), ("q10_returned_items", 2)],
)
def test_star_joins_broadcast_dimensions(spark, sf_dir, name, n_bhj):
    plan = plan_of(QUERIES[name](spark, sf_dir))
    assert plan.count("BroadcastHashJoin") >= n_bhj, (
        f"{name}: expected >= {n_bhj} broadcast joins\n{plan}"
    )


def test_topk_uses_window_group_limit(spark, sf_dir):
    plan = plan_of(QUERIES["window_topk_orders_per_customer"](spark, sf_dir))
    assert "WindowGroupLimit" in plan


def test_global_topk_avoids_full_sort(spark, sf_dir):
    plan = plan_of(QUERIES["orderby_limit_top_lineitems"](spark, sf_dir))
    assert "TakeOrderedAndProject" in plan


def test_observe_metrics(spark, sf_dir):
    """P7 peek: observe() accumulates pass-through metrics without
    changing the plan's results."""
    ev = load_table(spark, sf_dir, "events")
    observed = ev.observe(
        "ev_metrics",
        F.count(F.lit(1)).alias("rows_seen"),
        F.sum("value").alias("value_sum"),
    )
    n = observed.count()
    # metrics surface through the observation API on the last action
    from pyspark.sql import Observation  # noqa: F401  (API presence)

    assert n == ev.count()
