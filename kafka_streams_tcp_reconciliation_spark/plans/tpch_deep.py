"""Deep relational shapes — the remaining TPC-H query patterns (q2, q7-q9,
q11-q13, q15, q16, q20-q22), adapted to the driver's slim star schema.

The test schema has no ``partsupp`` table and omits several TPC-H columns
(``l_shipmode``, ``l_commitdate``/``l_receiptdate``, ``c_phone``,
``o_comment``).  Each query below keeps the *plan shape* that makes the
original interesting — correlated min subquery, dual-nation flow matrix,
market-share ratio, HAVING against a global scalar, EXISTS/NOT-EXISTS
anti-join chains — while substituting expressible columns:

- ``partsupp`` → the distinct ``(l_partkey, l_suppkey)`` pairs observed in
  ``lineitem`` (the natural supply bridge), with unit price
  ``l_extendedprice / l_quantity`` standing in for ``ps_supplycost``;
- ``l_shipmode`` → ``l_returnflag``; lateness → ``l_shipdate`` vs
  ``o_orderdate + INTERVAL``; country code → ``c_nationkey % 7``.

Determinism rules (see plans/relational.py): group-aggregated doubles are
rounded before any comparison/ranking that feeds control flow, per-row
arithmetic is left unrounded, and every count surfaces as BIGINT on both
engines (``F.count`` ↔ ``count(*) FILTER``).

Scale notes: nation/region are always broadcast (25/5 rows at any SF).
supplier/part joins are left to Catalyst+AQE — they are broadcastable here
but scale with SF, so hard-coding the hint would be wrong at 100 TB.
Scalar thresholds (global totals, max revenue) are computed as 1-row
aggregates and broadcast-cross-joined — never collected to the driver.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from kafka_streams_tcp_reconciliation_spark.plans import register
from kafka_streams_tcp_reconciliation_spark.sources.tables import load_table


def _ts(s: str):
    return F.lit(s).cast("timestamp_ntz")


def _supply(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The partsupp stand-in: per (part, supplier) min observed unit price.

    Unit price is a per-row division (bitwise-identical across engines);
    min is exact; round(6) locks the last ulp before it feeds comparisons.
    """
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_partkey", "l_suppkey").agg(
        F.round(F.min(F.col("l_extendedprice") / F.col("l_quantity")), 6).alias(
            "supplycost"
        )
    )


_SUPPLY_SQL = """
  supply AS (
    SELECT l_partkey, l_suppkey,
           round(min(l_extendedprice / l_quantity), 6) AS supplycost
    FROM lineitem GROUP BY 1, 2
  )
"""


@register(
    "q2_min_cost_supplier",
    oracle=f"""
    WITH {_SUPPLY_SQL},
    eu AS (
      SELECT l_partkey, supplycost, s_acctbal, s_name, n_name
      FROM supply
      JOIN supplier ON s_suppkey   = l_suppkey
      JOIN nation   ON s_nationkey = n_nationkey
      JOIN region   ON n_regionkey = r_regionkey
      WHERE r_name = 'EUROPE'
    )
    SELECT s_acctbal, s_name, n_name, p_partkey, p_brand, supplycost
    FROM eu JOIN part ON p_partkey = l_partkey
    WHERE p_size BETWEEN 1 AND 15 AND p_type = 'STANDARD'
    QUALIFY supplycost = min(supplycost) OVER (PARTITION BY p_partkey)
    ORDER BY s_acctbal DESC, n_name, s_name, p_partkey
    LIMIT 100
    """,
)
def q2_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q2 shape: correlated MIN subquery → per-part window min.

    The classic decorrelation: instead of re-running the min-cost subquery
    per part, compute ``min(supplycost) OVER (PARTITION BY p_partkey)`` on
    the already-filtered candidate set — one shuffle on p_partkey, no
    second scan of the supply bridge.
    """
    supply = _supply(spark, sf_dir)
    supp = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "EUROPE")
    part = load_table(spark, sf_dir, "part").filter(
        F.col("p_size").between(1, 15) & (F.col("p_type") == "STANDARD")
    )
    eu = (
        supply.join(supp, supply.l_suppkey == supp.s_suppkey)
        .join(F.broadcast(nation), supp.s_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
    )
    cand = eu.join(part, eu.l_partkey == part.p_partkey)
    w = Window.partitionBy("p_partkey")
    return (
        cand.withColumn("min_cost", F.min("supplycost").over(w))
        .filter(F.col("supplycost") == F.col("min_cost"))
        .select("s_acctbal", "s_name", "n_name", "p_partkey", "p_brand", "supplycost")
        .orderBy(F.desc("s_acctbal"), "n_name", "s_name", "p_partkey")
        .limit(100)
    )


@register(
    "q7_volume_shipping",
    oracle="""
    SELECT n1.n_name                                      AS supp_nation,
           n2.n_name                                      AS cust_nation,
           CAST(year(l_shipdate) AS BIGINT)               AS l_year,
           CAST(((sum(CAST(round((l_extendedprice) * 100) AS BIGINT) * CAST(round((1 - l_discount) * 100) AS BIGINT))) + 50) // 100 AS DOUBLE) / 100.0 AS revenue
    FROM supplier
    JOIN lineitem  ON s_suppkey = l_suppkey
    JOIN orders    ON o_orderkey = l_orderkey
    JOIN customer  ON c_custkey = o_custkey
    JOIN nation n1 ON s_nationkey = n1.n_nationkey
    JOIN nation n2 ON c_nationkey = n2.n_nationkey
    WHERE ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
        OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
      AND l_shipdate BETWEEN TIMESTAMP '1996-01-01 00:00:00'
                         AND TIMESTAMP '1997-12-31 00:00:00'
    GROUP BY 1, 2, 3
    """,
)
def q7_volume_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q7 shape: dual-aliased dimension (nation × nation flow matrix).

    The nation pair filter lands on two *different* broadcast copies of the
    same 25-row table; the fact side shuffles once for lineitem⋈orders.
    """
    li = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate").between(_ts("1996-01-01 00:00:00"), _ts("1997-12-31 00:00:00"))
    )
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    supp = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    n1 = nation.select(
        F.col("n_nationkey").alias("n1_key"), F.col("n_name").alias("supp_nation")
    )
    n2 = nation.select(
        F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("cust_nation")
    )
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .join(F.broadcast(n1), supp.s_nationkey == F.col("n1_key"))
        .join(F.broadcast(n2), cust.c_nationkey == F.col("n2_key"))
        .filter(
            ((F.col("supp_nation") == "NATION_1") & (F.col("cust_nation") == "NATION_2"))
            | ((F.col("supp_nation") == "NATION_2") & (F.col("cust_nation") == "NATION_1"))
        )
        .groupBy(
            "supp_nation",
            "cust_nation",
            F.year("l_shipdate").cast("long").alias("l_year"),
        )
        .agg(F.expr('CAST(((sum(CAST(round((l_extendedprice) * 100) AS BIGINT) * CAST(round((1 - l_discount) * 100) AS BIGINT))) + 50) DIV 100 AS DOUBLE) / 100.0').alias("revenue"))
    )


@register(
    "q8_market_share",
    oracle="""
    SELECT o_year,
           round(CAST(sum(CASE WHEN nation = 'NATION_3' THEN vu ELSE 0 END) AS DOUBLE)
                 / CAST(sum(vu) AS DOUBLE), 6) AS mkt_share
    FROM (
      SELECT CAST(year(o_orderdate) AS BIGINT)        AS o_year,
             CAST(round((l_extendedprice) * 100) AS BIGINT) * CAST(round((1 - l_discount) * 100) AS BIGINT)                                  AS vu,
             n2.n_name                                AS nation
      FROM part
      JOIN lineitem  ON p_partkey = l_partkey
      JOIN supplier  ON s_suppkey = l_suppkey
      JOIN orders    ON l_orderkey = o_orderkey
      JOIN customer  ON o_custkey = c_custkey
      JOIN nation n1 ON c_nationkey = n1.n_nationkey
      JOIN region    ON n1.n_regionkey = r_regionkey
      JOIN nation n2 ON s_nationkey = n2.n_nationkey
      WHERE r_name = 'ASIA'
        AND o_orderdate BETWEEN TIMESTAMP '1995-01-01 00:00:00'
                            AND TIMESTAMP '1996-12-31 00:00:00'
        AND p_type = 'PROMO'
    ) nations
    GROUP BY o_year
    """,
)
def q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q8 shape: market-share ratio (conditional sum / total sum).

    Both the numerator and denominator are rounded to cents BEFORE the
    division so the ratio is identical across engines despite differing
    summation orders; the quotient is then rounded to 6.
    """
    part = load_table(spark, sf_dir, "part").filter(F.col("p_type") == "PROMO")
    li = load_table(spark, sf_dir, "lineitem")
    supp = load_table(spark, sf_dir, "supplier")
    orders = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate").between(_ts("1995-01-01 00:00:00"), _ts("1996-12-31 00:00:00"))
    )
    cust = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    n1 = nation.select(
        F.col("n_nationkey").alias("n1_key"), F.col("n_regionkey").alias("n1_region")
    )
    n2 = nation.select(
        F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("nation")
    )
    vu = F.expr('CAST(round((l_extendedprice) * 100) AS BIGINT) * CAST(round((1 - l_discount) * 100) AS BIGINT)')
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(part, li.l_partkey == part.p_partkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .join(F.broadcast(n1), cust.c_nationkey == F.col("n1_key"))
        .join(F.broadcast(region), F.col("n1_region") == region.r_regionkey)
        .join(F.broadcast(n2), supp.s_nationkey == F.col("n2_key"))
        .groupBy(F.year("o_orderdate").cast("long").alias("o_year"))
        .agg(
            F.round(
                F.sum(
                    F.when(F.col("nation") == "NATION_3", vu).otherwise(
                        F.lit(0).cast("long")
                    )
                ).cast("double")
                / F.sum(vu).cast("double"),
                6,
            ).alias("mkt_share")
        )
    )


@register(
    "q9_product_profit",
    oracle="""
    SELECT nation, o_year,
           CAST(CAST(sign(sum(au)) AS BIGINT) * ((abs(sum(au)) + 50) // 100) AS DOUBLE) / 100.0 AS sum_profit
    FROM (
      SELECT n_name                                AS nation,
             CAST(year(o_orderdate) AS BIGINT)     AS o_year,
             CAST(round((l_extendedprice) * 100) AS BIGINT) * CAST(round((1 - l_discount) * 100) AS BIGINT) - 60 * CAST(round((p_retailprice) * 100) AS BIGINT) * CAST(l_quantity AS BIGINT)                            AS au
      FROM part
      JOIN lineitem ON p_partkey = l_partkey
      JOIN supplier ON s_suppkey = l_suppkey
      JOIN orders   ON o_orderkey = l_orderkey
      JOIN nation   ON s_nationkey = n_nationkey
      WHERE p_name LIKE '%red%'
    ) profit
    GROUP BY nation, o_year
    """,
)
def q9_product_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q9 shape: per-nation yearly profit over a pattern-filtered part
    set. ``ps_supplycost`` is adapted to ``0.6 * p_retailprice`` (no
    partsupp table); the per-row amount expression evaluates in the same
    left-associative IEEE order on both engines.
    """
    part = load_table(spark, sf_dir, "part").filter(F.col("p_name").like("%red%"))
    li = load_table(spark, sf_dir, "lineitem")
    supp = load_table(spark, sf_dir, "supplier")
    orders = load_table(spark, sf_dir, "orders")
    nation = load_table(spark, sf_dir, "nation")
    # exact 1e-4-dollar units; cost = 0.6*retail*qty = 60*retail_cents*qty units
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(part, li.l_partkey == part.p_partkey)
        .join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .join(F.broadcast(nation), supp.s_nationkey == nation.n_nationkey)
        .groupBy(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").cast("long").alias("o_year"),
        )
        .agg(
            F.expr('CAST(CAST(sign(sum(CAST(round((l_extendedprice) * 100) AS BIGINT) * CAST(round((1 - l_discount) * 100) AS BIGINT) - 60 * CAST(round((p_retailprice) * 100) AS BIGINT) * CAST(l_quantity AS BIGINT))) AS BIGINT) * ((abs(sum(CAST(round((l_extendedprice) * 100) AS BIGINT) * CAST(round((1 - l_discount) * 100) AS BIGINT) - 60 * CAST(round((p_retailprice) * 100) AS BIGINT) * CAST(l_quantity AS BIGINT))) + 50) DIV 100) AS DOUBLE) / 100.0').alias(
                "sum_profit"
            )
        )
    )


@register(
    "q11_important_parts",
    oracle="""
    WITH value_by_part AS (
      SELECT l_partkey AS partkey,
             CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)
                      * CAST(round((1 - l_discount) * 100) AS BIGINT))
                  AS BIGINT) AS vc
      FROM lineitem
      JOIN supplier ON l_suppkey = s_suppkey
      JOIN nation   ON s_nationkey = n_nationkey
      JOIN region   ON n_regionkey = r_regionkey
      WHERE r_name = 'ASIA'
      GROUP BY 1
    ),
    thr AS (
      SELECT CAST(sum(vc) AS HUGEINT) AS sum_vc,
             CAST(count(*) AS HUGEINT) AS n
      FROM value_by_part
    )
    SELECT partkey,
           CAST((vc + 50) // 100 AS DOUBLE) / 100.0 AS value
    FROM value_by_part, thr
    WHERE CAST(vc AS HUGEINT) * n > 2 * sum_vc
    """,
)
def q11_important_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q11 shape: HAVING against an uncorrelated global scalar.

    The threshold (2× the average per-part value — scale-invariant, unlike
    TPC-H's fixed fraction-of-total, which vacuously empties as the part
    count grows) is a 1-row aggregate broadcast-cross-joined to the
    per-part values — no collect, no single-partition window.

    Money arithmetic is EXACT-INTEGER end to end: prices and discounts
    are 2-decimal, so each line's revenue is an integer number of
    10⁻⁴-dollar units and the per-part/corpus sums commute in any
    aggregation/partitioning order — a float sum re-associated
    differently flipped one part by a cent at the sf0.1 rounding
    boundary (637327.075), the classic non-deterministic-at-scale bug.
    The threshold predicate is pure integer (vc·n > 2·Σvc, widened to
    decimal/HUGEINT against overflow at 100 TB row counts), and the
    displayed value rounds to cents in integer arithmetic
    ((vc+50) div 100 — HALF_UP): engines also disagree on float
    ``round()`` at representation boundaries (Spark rounds the shortest
    decimal repr, DuckDB the binary value), so no float ever reaches a
    round or a comparison. The one remaining float op is the final
    cents/100 display division of identical integers — bit-identical
    everywhere.
    """
    li = load_table(spark, sf_dir, "lineitem")
    supp = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    unit_rev = F.expr(
        "CAST(round(l_extendedprice * 100) AS BIGINT)"
        " * CAST(round((1 - l_discount) * 100) AS BIGINT)"
    )
    value_by_part = (
        li.join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .join(F.broadcast(nation), supp.s_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .groupBy(F.col("l_partkey").alias("partkey"))
        .agg(F.sum(unit_rev).alias("vc"))
    )
    threshold = value_by_part.agg(
        F.sum("vc").cast("decimal(38,0)").alias("sum_vc"),
        F.count(F.lit(1)).cast("decimal(38,0)").alias("n"),
    )
    value = F.expr("CAST((vc + 50) DIV 100 AS DOUBLE) / 100.0")
    return (
        value_by_part.join(F.broadcast(threshold))
        .filter(F.col("vc").cast("decimal(38,0)") * F.col("n") > 2 * F.col("sum_vc"))
        .select("partkey", value.alias("value"))
    )


@register(
    "q12_late_shipment_modes",
    oracle="""
    SELECT l_returnflag AS ship_mode,
           count(*) FILTER (WHERE o_orderpriority IN ('1-URGENT', '2-HIGH'))
             AS high_line_count,
           count(*) FILTER (WHERE o_orderpriority NOT IN ('1-URGENT', '2-HIGH'))
             AS low_line_count
    FROM orders
    JOIN lineitem ON o_orderkey = l_orderkey
    WHERE l_shipdate >= o_orderdate + INTERVAL 60 DAY
      AND l_shipdate BETWEEN TIMESTAMP '1997-01-01 00:00:00'
                         AND TIMESTAMP '1997-12-31 00:00:00'
    GROUP BY 1
    """,
)
def q12_late_shipment_modes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q12 shape: conditional counting by priority class over late
    shipments. ``l_shipmode`` → ``l_returnflag``; lateness → shipped ≥60
    days after the order date (no commit/receipt dates in the schema).
    """
    li = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate").between(_ts("1997-01-01 00:00:00"), _ts("1997-12-31 00:00:00"))
    )
    orders = load_table(spark, sf_dir, "orders")
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .filter(F.col("l_shipdate") >= F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS"))
        .groupBy(F.col("l_returnflag").alias("ship_mode"))
        .agg(
            F.count(F.when(high, 1)).alias("high_line_count"),
            F.count(F.when(~high, 1)).alias("low_line_count"),
        )
    )


@register(
    "q13_customer_order_distribution",
    oracle="""
    SELECT c_count, count(*) AS custdist
    FROM (
      SELECT c_custkey, count(o_orderkey) AS c_count
      FROM customer
      LEFT JOIN orders ON c_custkey = o_custkey
                      AND o_orderpriority <> '5-LOW'
      GROUP BY c_custkey
    ) c_orders
    GROUP BY c_count
    """,
)
def q13_customer_order_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q13 shape: distribution of per-customer order counts via a
    left join (customers with zero orders land in the c_count=0 bucket).
    The priority filter lives on the right side BEFORE the left join —
    equivalent to the ON-clause predicate of the original.
    """
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderpriority") != "5-LOW"
    )
    return (
        cust.join(orders, cust.c_custkey == orders.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
        .groupBy("c_count")
        .agg(F.count(F.lit(1)).alias("custdist"))
    )


@register(
    "q15_top_supplier",
    oracle="""
    WITH revenue AS (
      SELECT l_suppkey AS supplier_no,
             CAST(sum(CAST(round((l_extendedprice) * 100) AS BIGINT) * CAST(round((1 - l_discount) * 100) AS BIGINT)) AS BIGINT) AS ru
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
        AND l_shipdate <  TIMESTAMP '1996-04-01 00:00:00'
      GROUP BY 1
    )
    SELECT s_suppkey, s_name, CAST(((ru) + 50) // 100 AS DOUBLE) / 100.0 AS total_revenue
    FROM supplier JOIN revenue ON s_suppkey = supplier_no
    WHERE ru = (SELECT max(ru) FROM revenue)
    """,
)
def q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q15 shape: view + MAX scalar subquery (ties preserved).

    Revenue is rounded to cents before the max comparison, so "equal to
    the maximum" is a decided predicate on both engines.
    """
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= _ts("1996-01-01 00:00:00"))
        & (F.col("l_shipdate") < _ts("1996-04-01 00:00:00"))
    )
    supp = load_table(spark, sf_dir, "supplier")
    revenue = li.groupBy(F.col("l_suppkey").alias("supplier_no")).agg(
        F.expr("CAST(sum({}) AS BIGINT)".format('CAST(round((l_extendedprice) * 100) AS BIGINT) * CAST(round((1 - l_discount) * 100) AS BIGINT)')).alias("ru")
    )
    max_rev = revenue.agg(F.max("ru").alias("max_ru"))
    return (
        revenue.join(F.broadcast(max_rev))
        .filter(F.col("ru") == F.col("max_ru"))
        .join(supp, F.col("supplier_no") == supp.s_suppkey)
        .select(
            "s_suppkey",
            "s_name",
            F.expr('CAST(((ru) + 50) DIV 100 AS DOUBLE) / 100.0').alias("total_revenue"),
        )
    )


@register(
    "q16_supplier_part_counts",
    oracle="""
    SELECT p_brand, p_type, p_size,
           count(DISTINCT l_suppkey) AS supplier_cnt
    FROM (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem) bridge
    JOIN part ON p_partkey = l_partkey
    WHERE p_brand <> 'Brand#5'
      AND p_type <> 'PROMO'
      AND p_size IN (1, 9, 14, 19, 23, 36, 45, 49)
      AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
    GROUP BY 1, 2, 3
    """,
)
def q16_supplier_part_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q16 shape: distinct-supplier counts per part attribute group
    with a NOT-IN exclusion (→ left-anti join; the excluded set contains
    no NULLs, so anti-join and NOT IN agree).
    """
    bridge = load_table(spark, sf_dir, "lineitem").select("l_partkey", "l_suppkey").distinct()
    part = load_table(spark, sf_dir, "part").filter(
        (F.col("p_brand") != "Brand#5")
        & (F.col("p_type") != "PROMO")
        & F.col("p_size").isin(1, 9, 14, 19, 23, 36, 45, 49)
    )
    bad_supp = load_table(spark, sf_dir, "supplier").filter(
        F.col("s_acctbal") < 0
    ).select("s_suppkey")
    return (
        bridge.join(F.broadcast(bad_supp), bridge.l_suppkey == bad_supp.s_suppkey, "left_anti")
        .join(part, F.col("l_partkey") == part.p_partkey)
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
    )


@register(
    "q20_excess_inventory_suppliers",
    oracle="""
    SELECT s_name, s_acctbal
    FROM supplier
    JOIN nation ON s_nationkey = n_nationkey
    JOIN region ON n_regionkey = r_regionkey
    WHERE r_name = 'AFRICA'
      AND s_suppkey IN (
        SELECT l_suppkey
        FROM lineitem JOIN part ON p_partkey = l_partkey
        WHERE p_name LIKE '%blue%'
          AND l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
          AND l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'
        GROUP BY l_suppkey
        HAVING sum(l_quantity) > 300
      )
    """,
)
def q20_excess_inventory_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q20 shape: nested IN-subquery chain → aggregate-then-semi-join.

    Quantities are small integers stored as doubles, so their sums are
    exact — the HAVING threshold needs no rounding.
    """
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= _ts("1996-01-01 00:00:00"))
        & (F.col("l_shipdate") < _ts("1997-01-01 00:00:00"))
    )
    part = load_table(spark, sf_dir, "part").filter(F.col("p_name").like("%blue%"))
    supp = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "AFRICA")
    heavy = (
        li.join(part, li.l_partkey == part.p_partkey)
        .groupBy("l_suppkey")
        .agg(F.sum("l_quantity").alias("qty"))
        .filter(F.col("qty") > 300)
        .select("l_suppkey")
    )
    return (
        supp.join(F.broadcast(nation), supp.s_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .join(heavy, supp.s_suppkey == heavy.l_suppkey, "left_semi")
        .select("s_name", "s_acctbal")
    )


@register(
    "q21_waiting_suppliers",
    oracle="""
    SELECT s_name, count(*) AS numwait
    FROM supplier
    JOIN lineitem l1 ON s_suppkey = l1.l_suppkey
    JOIN orders      ON o_orderkey = l1.l_orderkey
    JOIN nation      ON s_nationkey = n_nationkey
    JOIN region      ON n_regionkey = r_regionkey
    WHERE o_orderstatus = 'F'
      AND r_name = 'AFRICA'
      AND EXISTS (
        SELECT 1 FROM lineitem l2
        WHERE l2.l_orderkey = l1.l_orderkey
          AND l2.l_suppkey <> l1.l_suppkey)
      AND NOT EXISTS (
        SELECT 1 FROM lineitem l3
        WHERE l3.l_orderkey = l1.l_orderkey
          AND l3.l_suppkey <> l1.l_suppkey
          AND l3.l_shipdate > l1.l_shipdate)
    GROUP BY s_name
    ORDER BY numwait DESC, s_name
    LIMIT 100
    """,
)
def q21_waiting_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q21 shape: EXISTS + NOT-EXISTS self-join chain.

    "Which suppliers were the last to ship in a multi-supplier finalized
    order" — the EXISTS becomes a left-semi self-join on the order key
    (with a supplier-inequality residual), the NOT EXISTS a left-anti
    with an additional shipdate comparison. Lateness uses ``l_shipdate``
    (no receipt/commit dates in the schema); ties for latest ship date
    mean no supplier strictly shipped later, matching NOT EXISTS on both
    engines.
    """
    li = load_table(spark, sf_dir, "lineitem")
    supp = load_table(spark, sf_dir, "supplier")
    orders = load_table(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "F")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "AFRICA")
    l1 = li.select(
        F.col("l_orderkey").alias("l1_orderkey"),
        F.col("l_suppkey").alias("l1_suppkey"),
        F.col("l_shipdate").alias("l1_shipdate"),
    )
    l2 = li.select(
        F.col("l_orderkey").alias("l2_orderkey"), F.col("l_suppkey").alias("l2_suppkey")
    )
    l3 = li.select(
        F.col("l_orderkey").alias("l3_orderkey"),
        F.col("l_suppkey").alias("l3_suppkey"),
        F.col("l_shipdate").alias("l3_shipdate"),
    )
    waiting = (
        l1.join(orders, F.col("l1_orderkey") == orders.o_orderkey)
        .join(
            l2,
            (F.col("l1_orderkey") == F.col("l2_orderkey"))
            & (F.col("l1_suppkey") != F.col("l2_suppkey")),
            "left_semi",
        )
        .join(
            l3,
            (F.col("l1_orderkey") == F.col("l3_orderkey"))
            & (F.col("l1_suppkey") != F.col("l3_suppkey"))
            & (F.col("l3_shipdate") > F.col("l1_shipdate")),
            "left_anti",
        )
    )
    return (
        waiting.join(F.broadcast(supp), F.col("l1_suppkey") == supp.s_suppkey)
        .join(F.broadcast(nation), supp.s_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).alias("numwait"))
        .orderBy(F.desc("numwait"), "s_name")
        .limit(100)
    )


@register(
    "q22_idle_customer_balance",
    oracle="""
    SELECT cntrycode,
           count(*) AS numcust,
           round(sum(c_acctbal), 2) AS totacctbal
    FROM (
      SELECT CAST(c_nationkey % 7 AS BIGINT) AS cntrycode, c_acctbal, c_custkey
      FROM customer
      WHERE c_acctbal > (SELECT round(avg(c_acctbal), 6)
                         FROM customer WHERE c_acctbal > 0.0)
    ) rich
    WHERE NOT EXISTS (SELECT 1 FROM orders
                      WHERE o_custkey = c_custkey
                        AND o_orderpriority = '1-URGENT')
    GROUP BY cntrycode
    """,
)
def q22_idle_customer_balance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q22 shape: AVG scalar subquery + NOT EXISTS anti-join.

    "Wealthy customers with no urgent orders", bucketed by a country code
    (``c_nationkey % 7`` — no phone column; the NOT-EXISTS side is
    restricted to urgent orders because this synthetic data gives every
    customer ~10 orders, which would make the original predicate vacuous).
    The average is rounded to 6 before the comparison; per-row balances
    are raw data, so the predicate decides identically on both engines.
    """
    cust = load_table(spark, sf_dir, "customer")
    orders = (
        load_table(spark, sf_dir, "orders")
        .filter(F.col("o_orderpriority") == "1-URGENT")
        .select("o_custkey")
    )
    avg_bal = cust.filter(F.col("c_acctbal") > 0.0).agg(
        F.round(F.avg("c_acctbal"), 6).alias("avg_bal")
    )
    return (
        cust.join(F.broadcast(avg_bal))
        .filter(F.col("c_acctbal") > F.col("avg_bal"))
        .join(orders, cust.c_custkey == orders.o_custkey, "left_anti")
        .groupBy((F.col("c_nationkey") % 7).cast("long").alias("cntrycode"))
        .agg(
            F.count(F.lit(1)).alias("numcust"),
            F.round(F.sum("c_acctbal"), 2).alias("totacctbal"),
        )
    )
