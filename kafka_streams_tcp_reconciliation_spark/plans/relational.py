"""Relational core queries — SURVEY.md §2.2 (P1–P7), §2.3 (J3–J8), §2.4 (A1–A8).

Each query maps one or more operator-inventory IDs to an idiomatic Spark
plan plus a DuckDB oracle. Conventions:

- aggregate outputs over doubles are ``round(…, 2)`` (sums of prices) or
  ``round(…, 6)`` (averages/ratios) on BOTH sides so the driver's
  value-hash is stable under differing summation orders;
- per-row arithmetic is left UNrounded — identical IEEE evaluation order on
  both engines gives bitwise-equal doubles;
- dimension joins carry explicit ``broadcast()`` hints (at 100 TB the fact
  side never shuffles for these joins).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from kafka_streams_tcp_reconciliation_spark.functions import money as mny
from kafka_streams_tcp_reconciliation_spark.operators.ktable import latest_by_key
from kafka_streams_tcp_reconciliation_spark.plans import register
from kafka_streams_tcp_reconciliation_spark.sources.tables import load_table


# --- P1/P2/A1-A3/A8 + O1: scan → filter → project → agg → sort ------------


@register(
    "q1_pricing_summary",
    oracle=f"""
    SELECT l_returnflag, l_linestatus,
           round(sum(l_quantity), 2)      AS sum_qty,
           round(sum(l_extendedprice), 2) AS sum_base_price,
           {mny.duck_money2(f"sum({mny.rev_units()})", 100)}      AS sum_disc_price,
           {mny.duck_money2(f"sum({mny.charge_units()})", 10000)} AS sum_charge,
           round(avg(l_quantity), 6)      AS avg_qty,
           round(avg(l_extendedprice), 6) AS avg_price,
           round(avg(l_discount), 6)      AS avg_disc,
           count(*)                       AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
    GROUP BY l_returnflag, l_linestatus
    """,
)
def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q1-style pricing summary: the flagship scan→agg pipeline.

    Catalyst plans this as parquet scan (filter pushed to the reader,
    ReadSchema pruned to 7 columns) → partial HashAggregate → single
    shuffle on (l_returnflag, l_linestatus) → final HashAggregate.

    The disc-price and charge sums live on sub-cent grids (10⁻⁴/10⁻⁶
    dollars), so they run in exact integer units and round to cents in
    integer arithmetic (functions/money.py) — a float sum re-associated
    differently between engines (or cluster layouts) can flip a cent at
    a half-cent boundary. Quantity (integer) and base price (cent-grid)
    sums cannot sit on a rounding boundary and stay plain float sums.
    """
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02 00:00:00").cast("timestamp_ntz"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
            F.expr(
                mny.spark_money2(f"sum({mny.rev_units()})", 100)
            ).alias("sum_disc_price"),
            F.expr(
                mny.spark_money2(f"sum({mny.charge_units()})", 10000)
            ).alias("sum_charge"),
            F.round(F.avg("l_quantity"), 6).alias("avg_qty"),
            F.round(F.avg("l_extendedprice"), 6).alias("avg_price"),
            F.round(F.avg("l_discount"), 6).alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


@register(
    "q3_top_revenue_orders",
    oracle=f"""
    SELECT o_orderkey,
           {mny.duck_money2(f"sum({mny.rev_units()})", 100)} AS revenue,
           strftime(o_orderdate, '%Y-%m-%d')                 AS order_date,
           o_orderpriority
    FROM customer
    JOIN orders   ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    WHERE c_mktsegment = 'BUILDING'
      AND o_orderdate < TIMESTAMP '1999-06-01 00:00:00'
      AND l_shipdate  > TIMESTAMP '1999-06-01 00:00:00'
    GROUP BY o_orderkey, o_orderdate, o_orderpriority
    ORDER BY revenue DESC, o_orderkey
    LIMIT 10
    """,
)
def q3_top_revenue_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q3-style: 3-way join → agg → global top-k (O2: TakeOrdered).

    customer is broadcast (dimension); orders⋈lineitem is the only shuffle.
    """
    cutoff = F.lit("1999-06-01 00:00:00").cast("timestamp_ntz")
    cust = load_table(spark, sf_dir, "customer").filter(
        F.col("c_mktsegment") == "BUILDING"
    )
    orders = load_table(spark, sf_dir, "orders").filter(F.col("o_orderdate") < cutoff)
    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_shipdate") > cutoff)
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .groupBy("o_orderkey", "o_orderdate", "o_orderpriority")
        .agg(
            F.expr(mny.spark_money2(f"sum({mny.rev_units()})", 100)).alias(
                "revenue"
            )
        )
        .select(
            "o_orderkey",
            "revenue",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("order_date"),
            "o_orderpriority",
        )
        .orderBy(F.desc("revenue"), F.asc("o_orderkey"))
        .limit(10)
    )


@register(
    "q5_local_supplier_volume",
    oracle="""
    SELECT n_name,
           CAST(((sum(CAST(round((l_extendedprice) * 100) AS BIGINT) * CAST(round((1 - l_discount) * 100) AS BIGINT))) + 50) // 100 AS DOUBLE) / 100.0 AS revenue
    FROM customer
    JOIN orders   ON c_custkey  = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    JOIN supplier ON l_suppkey  = s_suppkey AND c_nationkey = s_nationkey
    JOIN nation   ON s_nationkey = n_nationkey
    JOIN region   ON n_regionkey = r_regionkey
    WHERE r_name = 'ASIA'
      AND o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
      AND o_orderdate <  TIMESTAMP '2001-01-01 00:00:00'
    GROUP BY n_name
    """,
)
def q5_local_supplier_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q5-style: star join through 4 broadcast dims + fact⋈fact (J8)."""
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1997-01-01 00:00:00").cast("timestamp_ntz"))
        & (F.col("o_orderdate") < F.lit("2001-01-01 00:00:00").cast("timestamp_ntz"))
    )
    li = load_table(spark, sf_dir, "lineitem")
    supp = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .join(
            F.broadcast(supp),
            (li.l_suppkey == supp.s_suppkey)
            & (cust.c_nationkey == supp.s_nationkey),
        )
        .join(F.broadcast(nation), supp.s_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .groupBy("n_name")
        .agg(F.expr('CAST(((sum(CAST(round((l_extendedprice) * 100) AS BIGINT) * CAST(round((1 - l_discount) * 100) AS BIGINT))) + 50) DIV 100 AS DOUBLE) / 100.0').alias("revenue"))
    )


# --- P1/P2: stateless filter + projection (KStream#filter / #mapValues) ----


@register(
    "filter_project",
    oracle="""
    SELECT l_orderkey, l_linenumber, l_quantity,
           l_extendedprice * (1 - l_discount) AS net_price
    FROM lineitem
    WHERE l_discount > 0.05 AND l_quantity < 25
    """,
)
def filter_project(spark: SparkSession, sf_dir: str) -> DataFrame:
    """KStream#filter + #mapValues: predicate + computed projection (P1, P2)."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.filter((F.col("l_discount") > 0.05) & (F.col("l_quantity") < 25)).select(
        "l_orderkey",
        "l_linenumber",
        "l_quantity",
        (F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("net_price"),
    )


# --- P5/P6: branch (split) + merge ----------------------------------------


@register(
    "branch_merge",
    oracle="""
    SELECT event_id, user_id, value, 'high' AS branch FROM events WHERE value >= 100
    UNION ALL
    SELECT event_id, user_id, value, 'low'  AS branch FROM events WHERE value < 100
    """,
)
def branch_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """KStream#split into predicate branches, then #merge (P5, P6).

    Spark shares the underlying scan across both branches (ReuseExchange /
    common subplan); no data is read twice.
    """
    ev = load_table(spark, sf_dir, "events").select("event_id", "user_id", "value")
    high = ev.filter(F.col("value") >= 100).withColumn("branch", F.lit("high"))
    low = ev.filter(F.col("value") < 100).withColumn("branch", F.lit("low"))
    return high.unionByName(low)


# --- A2/A3/A6: grouped aggregations ---------------------------------------


@register(
    "agg_stats_by_type",
    oracle="""
    SELECT event_type,
           count(*)                 AS n_events,
           count(DISTINCT user_id)  AS n_users,
           round(sum(value), 2)     AS total_value,
           round(avg(value), 6)     AS avg_value,
           min(value)               AS min_value,
           max(value)               AS max_value
    FROM events
    GROUP BY event_type
    """,
)
def agg_stats_by_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    """KGroupedStream#count/#reduce + distinct cardinality (A2, A3, A6)."""
    ev = load_table(spark, sf_dir, "events")
    return ev.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.countDistinct("user_id").alias("n_users"),
        F.round(F.sum("value"), 2).alias("total_value"),
        F.round(F.avg("value"), 6).alias("avg_value"),
        F.min("value").alias("min_value"),
        F.max("value").alias("max_value"),
    )


# --- A7: rollup / cube -----------------------------------------------------


@register(
    "rollup_orders",
    oracle="""
    SELECT o_orderstatus, o_orderpriority,
           count(*)                    AS n_orders,
           round(sum(o_totalprice), 2) AS total_price
    FROM orders
    GROUP BY ROLLUP (o_orderstatus, o_orderpriority)
    """,
)
def rollup_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hierarchical rollup with subtotal rows (A7)."""
    orders = load_table(spark, sf_dir, "orders")
    return orders.rollup("o_orderstatus", "o_orderpriority").agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.round(F.sum("o_totalprice"), 2).alias("total_price"),
    )


@register(
    "cube_orders",
    oracle="""
    SELECT o_orderstatus, o_orderpriority,
           count(*)                    AS n_orders,
           round(sum(o_totalprice), 2) AS total_price
    FROM orders
    GROUP BY CUBE (o_orderstatus, o_orderpriority)
    """,
)
def cube_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full cube over two grouping dimensions (A7)."""
    orders = load_table(spark, sf_dir, "orders")
    return orders.cube("o_orderstatus", "o_orderpriority").agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.round(F.sum("o_totalprice"), 2).alias("total_price"),
    )


# --- J7: semi / anti joins -------------------------------------------------


@register(
    "join_semi_customers_with_orders",
    oracle="""
    SELECT c_custkey, c_name, c_acctbal
    FROM customer c
    WHERE EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
    """,
)
def join_semi_customers_with_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXISTS reconciliation check as a left-semi join (J7)."""
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    return cust.join(
        orders, cust.c_custkey == orders.o_custkey, "left_semi"
    ).select("c_custkey", "c_name", "c_acctbal")


@register(
    "join_anti_customers_without_orders",
    oracle="""
    SELECT c_custkey, c_name, c_acctbal
    FROM customer c
    WHERE NOT EXISTS (
        SELECT 1 FROM orders o
        WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 300000
    )
    """,
)
def join_anti_customers_without_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NOT EXISTS — the unmatched-record detection at the heart of
    reconciliation workloads (J7; the batch analogue of J2's null branch).

    Predicated on high-value orders so the result is non-empty at every
    scale factor (every customer has *some* order in the test data)."""
    cust = load_table(spark, sf_dir, "customer")
    big_orders = load_table(spark, sf_dir, "orders").filter(
        F.col("o_totalprice") > 300000
    )
    return cust.join(
        big_orders, cust.c_custkey == big_orders.o_custkey, "left_anti"
    ).select("c_custkey", "c_name", "c_acctbal")


# --- J3/J4: enrichment joins (stream-table / stream-globalTable) -----------


@register(
    "enrich_customer_geo",
    oracle="""
    SELECT c_custkey, c_name, c_mktsegment,
           n_name AS nation, r_name AS region
    FROM customer
    JOIN nation ON c_nationkey = n_nationkey
    JOIN region ON n_regionkey = r_regionkey
    """,
)
def enrich_customer_geo(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GlobalKTable-style broadcast enrichment through two dims (J4).

    Both dims are broadcast: zero shuffles of the fact side — the plan that
    must survive a 100 TB fact table.
    """
    cust = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region")
    return (
        cust.join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .select(
            "c_custkey",
            "c_name",
            "c_mktsegment",
            F.col("n_name").alias("nation"),
            F.col("r_name").alias("region"),
        )
    )


@register(
    "stream_table_enrich",
    oracle="""
    SELECT event_id, user_id, event_type, value,
           c_name AS user_name, c_mktsegment AS user_segment
    FROM events
    JOIN customer ON user_id = c_custkey
    """,
)
def stream_table_enrich(spark: SparkSession, sf_dir: str) -> DataFrame:
    """KStream⋈KTable enrichment: each event gains its user's dimension
    attributes (J3). customer is the broadcast side."""
    ev = load_table(spark, sf_dir, "events")
    cust = load_table(spark, sf_dir, "customer")
    return ev.join(F.broadcast(cust), ev.user_id == cust.c_custkey).select(
        "event_id",
        "user_id",
        "event_type",
        "value",
        F.col("c_name").alias("user_name"),
        F.col("c_mktsegment").alias("user_segment"),
    )


# --- J5/J6: table-table (foreign-key) join --------------------------------


@register(
    "join_fk_orders_customer",
    oracle="""
    SELECT o_orderkey, o_totalprice, o_orderstatus, c_name, c_mktsegment
    FROM orders
    JOIN customer ON o_custkey = c_custkey
    """,
)
def join_fk_orders_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """KTable-KTable foreign-key join, batch snapshot semantics (J5, J6)."""
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    return orders.join(F.broadcast(cust), orders.o_custkey == cust.c_custkey).select(
        "o_orderkey", "o_totalprice", "o_orderstatus", "c_name", "c_mktsegment"
    )


# --- S2: KTable snapshot (latest per key) ---------------------------------


@register(
    "ktable_latest_event_per_user",
    oracle="""
    SELECT user_id,
           event_id   AS last_event_id,
           event_type AS last_event_type,
           value      AS last_value
    FROM (
        SELECT *, row_number() OVER (
            PARTITION BY user_id ORDER BY ts DESC, event_id DESC
        ) AS rn
        FROM events
    )
    WHERE rn = 1
    """,
)
def ktable_latest_event_per_user(spark: SparkSession, sf_dir: str) -> DataFrame:
    """KTable materialization of an event stream: latest record per key (S2)."""
    ev = load_table(spark, sf_dir, "events")
    return latest_by_key(
        ev, ["user_id"], [F.col("ts").desc(), F.col("event_id").desc()]
    ).select(
        "user_id",
        F.col("event_id").alias("last_event_id"),
        F.col("event_type").alias("last_event_type"),
        F.col("value").alias("last_value"),
    )


# --- more TPC-H-shaped coverage (filter-agg, group-filter join, having) ----


@register(
    "q6_revenue_forecast",
    oracle="""
    SELECT CAST(((sum(CAST(round((l_extendedprice) * 100) AS BIGINT) * CAST(round((l_discount) * 100) AS BIGINT))) + 50) // 100 AS DOUBLE) / 100.0 AS revenue,
           count(*) AS n_lines
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1997-01-01'
      AND l_shipdate <  TIMESTAMP '1998-01-01'
      AND l_discount BETWEEN 0.03 AND 0.07
      AND l_quantity < 24
    """,
)
def q6_revenue_forecast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6 shape: pure filter + global aggregate. The whole predicate
    reaches the parquet scan (PushedFilters on shipdate/discount/quantity),
    so at 100 TB this is a row-group-pruned scan + map-side partial agg —
    no shuffle beyond the final single-row merge."""
    lineitem = load_table(spark, sf_dir, "lineitem")
    return (
        lineitem.filter(
            (F.col("l_shipdate") >= "1997-01-01")
            & (F.col("l_shipdate") < "1998-01-01")
            & (F.col("l_discount").between(0.03, 0.07))
            & (F.col("l_quantity") < 24)
        )
        .agg(
            F.expr('CAST(((sum(CAST(round((l_extendedprice) * 100) AS BIGINT) * CAST(round((l_discount) * 100) AS BIGINT))) + 50) DIV 100 AS DOUBLE) / 100.0').alias("revenue"),
            F.count(F.lit(1)).alias("n_lines"),
        )
    )


@register(
    "q10_returned_items",
    oracle="""
    SELECT c.c_custkey, c.c_name,
           CAST(((sum(CAST(round((l.l_extendedprice) * 100) AS BIGINT) * CAST(round((1 - l.l_discount) * 100) AS BIGINT))) + 50) // 100 AS DOUBLE) / 100.0 AS revenue,
           n.n_name
    FROM customer c
    JOIN orders o   ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    JOIN nation n   ON c.c_nationkey = n.n_nationkey
    WHERE o.o_orderdate >= TIMESTAMP '1997-01-01'
      AND o.o_orderdate <  TIMESTAMP '1998-01-01'
      AND l.l_returnflag = 'R'
    GROUP BY c.c_custkey, c.c_name, n.n_name
    ORDER BY revenue DESC, c_custkey
    LIMIT 20
    """,
)
def q10_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10 shape: who returned the most revenue. Fact-side filters
    push to both scans; customer and nation broadcast; TakeOrderedAndProject
    caps the result without a global sort materialization."""
    customer = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    lineitem = load_table(spark, sf_dir, "lineitem")
    nation = load_table(spark, sf_dir, "nation")
    return (
        lineitem.filter(F.col("l_returnflag") == "R")
        .join(
            orders.filter(
                (F.col("o_orderdate") >= "1997-01-01")
                & (F.col("o_orderdate") < "1998-01-01")
            ),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .join(F.broadcast(customer), F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(nation), F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy("c_custkey", "c_name", "n_name")
        .agg(
            F.expr('CAST(((sum(CAST(round((l_extendedprice) * 100) AS BIGINT) * CAST(round((1 - l_discount) * 100) AS BIGINT))) + 50) DIV 100 AS DOUBLE) / 100.0').alias("revenue")
        )
        .select("c_custkey", "c_name", "revenue", "n_name")
        .orderBy(F.col("revenue").desc(), F.col("c_custkey").asc())
        .limit(20)
    )


@register(
    "q18_large_volume_customer",
    oracle="""
    SELECT c.c_custkey, o.o_orderkey, o.o_totalprice,
           round(t.sum_qty, 2) AS sum_qty
    FROM orders o
    JOIN (
        SELECT l_orderkey, sum(l_quantity) AS sum_qty
        FROM lineitem
        GROUP BY l_orderkey
        HAVING sum(l_quantity) > 150
    ) t ON o.o_orderkey = t.l_orderkey
    JOIN customer c ON c.c_custkey = o.o_custkey
    ORDER BY o.o_totalprice DESC, o.o_orderkey
    """,
)
def q18_large_volume_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18 shape: HAVING-filtered pre-aggregation joined back to the
    fact. The lineitem aggregate runs first (partial+final on l_orderkey)
    and the surviving keys — a tiny set after HAVING — drive the join, the
    aggregate-before-join pattern that keeps the big table off the shuffle."""
    orders = load_table(spark, sf_dir, "orders")
    lineitem = load_table(spark, sf_dir, "lineitem")
    customer = load_table(spark, sf_dir, "customer")
    big = (
        lineitem.groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("sum_qty_raw"))
        .filter(F.col("sum_qty_raw") > 150)
    )
    return (
        orders.join(big, F.col("o_orderkey") == F.col("l_orderkey"))
        .join(F.broadcast(customer), F.col("c_custkey") == F.col("o_custkey"))
        .select(
            "c_custkey",
            "o_orderkey",
            "o_totalprice",
            F.round(F.col("sum_qty_raw"), 2).alias("sum_qty"),
        )
        .orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey").asc())
    )


@register(
    "q4_late_shipment_priority",
    oracle="""
    SELECT o.o_orderpriority, count(*) AS n_orders
    FROM orders o
    WHERE EXISTS (
        SELECT 1 FROM lineitem l
        WHERE l.l_orderkey = o.o_orderkey
          AND l.l_shipdate > o.o_orderdate + INTERVAL '90 days'
    )
    GROUP BY o.o_orderpriority
    """,
)
def q4_late_shipment_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4 shape (adapted to the available columns): priority counts
    of orders having at least one lineitem shipped >90 days after the
    order date. The EXISTS becomes a left-semi join — the probe side
    deduplicates on the join key, so the aggregate input is one row per
    qualifying order, not per lineitem."""
    orders = load_table(spark, sf_dir, "orders")
    lineitem = load_table(spark, sf_dir, "lineitem")
    qualifying = orders.alias("o").join(
        lineitem.alias("l"),
        (F.col("l.l_orderkey") == F.col("o.o_orderkey"))
        & (F.col("l.l_shipdate") > F.expr("o.o_orderdate + INTERVAL 90 DAYS")),
        "left_semi",
    )
    return qualifying.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).alias("n_orders")
    )


@register(
    "q14_promo_revenue_ratio",
    oracle="""
    SELECT round(
               100.0 * CAST(sum(CASE WHEN p.p_type = 'PROMO'
                                     THEN CAST(round((l.l_extendedprice) * 100) AS BIGINT) * CAST(round((1 - l.l_discount) * 100) AS BIGINT)
                                     ELSE 0 END) AS DOUBLE)
               / CAST(sum(CAST(round((l.l_extendedprice) * 100) AS BIGINT) * CAST(round((1 - l.l_discount) * 100) AS BIGINT)) AS DOUBLE), 4)
               AS promo_pct
    FROM lineitem l
    JOIN part p ON p.p_partkey = l.l_partkey
    WHERE l.l_shipdate >= TIMESTAMP '1997-06-01'
      AND l.l_shipdate <  TIMESTAMP '1997-09-01'
    """,
)
def q14_promo_revenue_ratio(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14 shape: conditional-aggregate ratio over a broadcast
    dimension join; the date filter pushes to the fact scan."""
    lineitem = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    rev_u = F.expr('CAST(round((l_extendedprice) * 100) AS BIGINT) * CAST(round((1 - l_discount) * 100) AS BIGINT)')
    return (
        lineitem.filter(
            (F.col("l_shipdate") >= "1997-06-01")
            & (F.col("l_shipdate") < "1997-09-01")
        )
        .join(F.broadcast(part), F.col("p_partkey") == F.col("l_partkey"))
        .agg(
            F.round(
                100.0
                * F.sum(
                    F.when(F.col("p_type") == "PROMO", rev_u).otherwise(
                        F.lit(0).cast("long")
                    )
                ).cast("double")
                / F.sum(rev_u).cast("double"),
                4,
            ).alias("promo_pct")
        )
    )


@register(
    "q19_disjunctive_predicates",
    oracle="""
    SELECT CAST(((sum(CAST(round((l.l_extendedprice) * 100) AS BIGINT) * CAST(round((1 - l.l_discount) * 100) AS BIGINT))) + 50) // 100 AS DOUBLE) / 100.0 AS revenue,
           count(*) AS n_lines
    FROM lineitem l
    JOIN part p ON p.p_partkey = l.l_partkey
    WHERE (p.p_brand = 'Brand#1' AND p.p_size BETWEEN 1 AND 15
           AND l.l_quantity BETWEEN 1 AND 20)
       OR (p.p_brand = 'Brand#2' AND p.p_size BETWEEN 10 AND 30
           AND l.l_quantity BETWEEN 10 AND 35)
       OR (p.p_brand = 'Brand#3' AND p.p_size BETWEEN 20 AND 50
           AND l.l_quantity BETWEEN 20 AND 50)
    """,
)
def q19_disjunctive_predicates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19 shape: disjunction of conjunctive brand/size/quantity
    ranges across the join. Catalyst extracts the common l_partkey equi-key
    for the (broadcast) join and evaluates the OR as a post-join filter;
    per-side implied filters (brand IN (...), size ranges) are pushed to
    the part scan."""
    lineitem = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    cond = (
        (F.col("p_brand") == "Brand#1")
        & F.col("p_size").between(1, 15)
        & F.col("l_quantity").between(1, 20)
    ) | (
        (F.col("p_brand") == "Brand#2")
        & F.col("p_size").between(10, 30)
        & F.col("l_quantity").between(10, 35)
    ) | (
        (F.col("p_brand") == "Brand#3")
        & F.col("p_size").between(20, 50)
        & F.col("l_quantity").between(20, 50)
    )
    return (
        lineitem.join(F.broadcast(part), F.col("p_partkey") == F.col("l_partkey"))
        .filter(cond)
        .agg(
            F.expr('CAST(((sum(CAST(round((l_extendedprice) * 100) AS BIGINT) * CAST(round((1 - l_discount) * 100) AS BIGINT))) + 50) DIV 100 AS DOUBLE) / 100.0').alias("revenue"),
            F.count(F.lit(1)).alias("n_lines"),
        )
    )


_SQL_REVENUE_BY_NATION = """
    SELECT n.n_name AS nation,
           count(DISTINCT o.o_orderkey) AS n_orders,
           sum(CAST(round(l.l_extendedprice * 100) AS BIGINT)
               * CAST(round((1 - l.l_discount) * 100) AS BIGINT))
               / CAST(10000.0 AS DOUBLE) AS revenue
    FROM {li} l
    JOIN {ord} o ON l.l_orderkey = o.o_orderkey
    JOIN {cust} c ON o.o_custkey = c.c_custkey
    JOIN {nat} n ON c.c_nationkey = n.n_nationkey
    GROUP BY n.n_name
"""


@register(
    "sql_revenue_by_nation",
    oracle=_SQL_REVENUE_BY_NATION.format(
        li="lineitem", ord="orders", cust="customer", nat="nation"
    ),
)
def sql_revenue_by_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SQL-authored entry path: the ONE query text runs on both engines —
    tables registered as temp views, the plan built by ``spark.sql``
    rather than the DataFrame DSL (proving the engine's SQL surface is
    the same Catalyst plan space; the reference's DSL-only lifecycle is
    SURVEY §3.1, this is the analog of adding a SQL front end to it).

    Scale: identical to the DSL star joins — customer/nation broadcast
    (BROADCAST_TABLES hint comes free from their size), revenue summed
    in exact 10⁻⁴-dollar integers (functions/money.py contract).
    """
    for t in ("lineitem", "orders", "customer", "nation"):
        load_table(spark, sf_dir, t).createOrReplaceTempView(f"sqlrev_{t}")
    return spark.sql(
        _SQL_REVENUE_BY_NATION.format(
            li="sqlrev_lineitem",
            ord="sqlrev_orders",
            cust="sqlrev_customer",
            nat="sqlrev_nation",
        )
    )
