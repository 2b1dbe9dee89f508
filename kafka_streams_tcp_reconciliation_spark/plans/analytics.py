"""Analytic queries — SURVEY.md §2.6 (F1–F4), §2.7 (O1–O5), §2.8 (scalars).

Cross-engine gotchas encoded here (each the product of a DuckDB/Spark
differential run):

- DuckDB ranking fns return BIGINT; Spark's return INT → cast Spark side
  to long.
- Spark ``ceil``/``floor`` on doubles return LONG; DuckDB return DOUBLE →
  cast Spark side to double.
- ``length``/``year``/``month`` are INT in Spark, BIGINT in DuckDB → cast.
- libm functions (ln, sqrt) can differ by 1 ulp between engines → round 6.
- windowed sums: DuckDB uses segment trees (different fp addition order)
  → round aggregate outputs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from kafka_streams_tcp_reconciliation_spark.operators.topk import top_k_per_group
from kafka_streams_tcp_reconciliation_spark.plans import register
from kafka_streams_tcp_reconciliation_spark.sources.tables import load_table


# --- F1/F4: ranking + top-k per group -------------------------------------


@register(
    "window_topk_orders_per_customer",
    oracle="""
    SELECT o_custkey, o_orderkey, o_totalprice, rank
    FROM (
        SELECT o_custkey, o_orderkey, o_totalprice,
               row_number() OVER (
                   PARTITION BY o_custkey
                   ORDER BY o_totalprice DESC, o_orderkey
               ) AS rank
        FROM orders
    )
    WHERE rank <= 3
    """,
)
def window_topk_orders_per_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 orders per customer (F1 row_number + F4 top-k).

    Spark 3.5+ plans the rank filter as WindowGroupLimit: only k rows per
    key survive the partition-local sort — no full ranking materialized.
    """
    orders = load_table(spark, sf_dir, "orders")
    return top_k_per_group(
        orders.select("o_custkey", "o_orderkey", "o_totalprice"),
        ["o_custkey"],
        [F.col("o_totalprice").desc(), F.col("o_orderkey").asc()],
        k=3,
    ).withColumn("rank", F.col("rank").cast("long"))


@register(
    "window_ntile_percent_rank",
    oracle="""
    SELECT c_custkey,
           ntile(4)       OVER (ORDER BY c_acctbal DESC, c_custkey) AS quartile,
           round(percent_rank() OVER (ORDER BY c_acctbal DESC, c_custkey), 6)
                                                                    AS pct_rank
    FROM customer
    """,
)
def window_ntile_percent_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quartile bucketing + relative rank of customers by balance (F1)."""
    cust = load_table(spark, sf_dir, "customer")
    w = Window.orderBy(F.col("c_acctbal").desc(), F.col("c_custkey").asc())
    return cust.select(
        "c_custkey",
        F.ntile(4).over(w).cast("long").alias("quartile"),
        F.round(F.percent_rank().over(w), 6).alias("pct_rank"),
    )


# --- F2: lag/lead — inter-event gap (batch analogue of reconciliation gap
# detection, the core per-flow statistic of the reference workload) --------


@register(
    "window_lag_event_gap",
    oracle="""
    SELECT event_id, user_id,
           date_diff('microseconds',
                     lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id),
                     ts) AS gap_us
    FROM events
    """,
)
def window_lag_event_gap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user inter-event gap in microseconds via lag (F2).

    µs granularity because engines disagree at coarser units: Spark's
    timestampdiff truncates the interval, DuckDB's date_diff counts
    boundary crossings — at µs (the storage precision) both are exact.

    This is the batch form of the reference's sequence-gap tracking: the
    same partition-by-key + event-time order a Kafka Streams state store
    scan would impose.
    """
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return ev.select(
        "event_id",
        "user_id",
        F.expr(
            "timestampdiff(MICROSECOND, lag(ts) OVER "
            "(PARTITION BY user_id ORDER BY ts, event_id), ts)"
        ).alias("gap_us"),
    )


@register(
    "window_moving_avg",
    oracle="""
    SELECT event_id, user_id,
           round(avg(value) OVER (
               PARTITION BY user_id ORDER BY ts, event_id
               ROWS BETWEEN 2 PRECEDING AND CURRENT ROW
           ), 6) AS mavg_3
    FROM events
    """,
)
def window_moving_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """3-event moving average per user (F3 framed aggregate)."""
    ev = load_table(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(-2, Window.currentRow)
    )
    return ev.select(
        "event_id", "user_id", F.round(F.avg("value").over(w), 6).alias("mavg_3")
    )


@register(
    "window_running_total",
    oracle="""
    SELECT o_custkey, o_orderkey,
           round(sum(o_totalprice) OVER (
               PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
           ), 2) AS running_total
    FROM orders
    """,
)
def window_running_total(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cumulative revenue per customer in order-date order (F3)."""
    orders = load_table(spark, sf_dir, "orders")
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return orders.select(
        "o_custkey",
        "o_orderkey",
        F.round(F.sum("o_totalprice").over(w), 2).alias("running_total"),
    )


# --- O1/O2: global sort + limit -------------------------------------------


@register(
    "orderby_limit_top_lineitems",
    oracle="""
    SELECT l_orderkey, l_linenumber, l_extendedprice
    FROM lineitem
    ORDER BY l_extendedprice DESC, l_orderkey, l_linenumber
    LIMIT 20
    """,
)
def orderby_limit_top_lineitems(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global top-20 (O1+O2). Spark plans TakeOrderedAndProject — each
    partition keeps 20 rows, the driver merges; no global sort happens."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.select("l_orderkey", "l_linenumber", "l_extendedprice")
        .orderBy(
            F.col("l_extendedprice").desc(),
            F.col("l_orderkey").asc(),
            F.col("l_linenumber").asc(),
        )
        .limit(20)
    )


# --- O3–O5: set operations ------------------------------------------------


@register(
    "set_intersect",
    oracle="""
    SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING'
    INTERSECT
    SELECT o_custkey AS c_custkey FROM orders WHERE o_orderstatus = 'F'
    """,
)
def set_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BUILDING-segment customers who have a finished order (O4)."""
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    a = cust.filter(F.col("c_mktsegment") == "BUILDING").select("c_custkey")
    b = orders.filter(F.col("o_orderstatus") == "F").select(
        F.col("o_custkey").alias("c_custkey")
    )
    return a.intersect(b)


@register(
    "set_except",
    oracle="""
    SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING'
    EXCEPT
    SELECT o_custkey AS c_custkey FROM orders WHERE o_orderstatus = 'F'
    """,
)
def set_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BUILDING-segment customers with no finished order (O4)."""
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    a = cust.filter(F.col("c_mktsegment") == "BUILDING").select("c_custkey")
    b = orders.filter(F.col("o_orderstatus") == "F").select(
        F.col("o_custkey").alias("c_custkey")
    )
    return a.subtract(b)


@register(
    "dedup_exact_rows",
    oracle="""
    SELECT DISTINCT l_returnflag, l_linestatus, l_shipmode
    FROM (SELECT l_returnflag, l_linestatus,
                 CASE WHEN l_linenumber % 2 = 0 THEN 'EVEN' ELSE 'ODD' END AS l_shipmode
          FROM lineitem)
    """,
)
def dedup_exact_rows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact distinct over a projection (O5 batch dedup)."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.select(
            "l_returnflag",
            "l_linestatus",
            F.when(F.col("l_linenumber") % 2 == 0, "EVEN")
            .otherwise("ODD")
            .alias("l_shipmode"),
        )
        .distinct()
    )


# --- §2.8 scalar function families ----------------------------------------


@register(
    "scalar_string_funcs",
    oracle="""
    SELECT p_partkey,
           upper(p_name)                   AS name_upper,
           CAST(length(p_name) AS INTEGER) AS name_len,
           substring(p_type, 1, 5)         AS type_prefix,
           concat(p_brand, '#', p_type)    AS brand_type,
           replace(p_name, ' ', '_')       AS name_snake,
           trim(p_name)                    AS name_trim,
           (p_name LIKE '%a%')             AS has_a
    FROM part
    """,
)
def scalar_string_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """String-function family over part (§2.8)."""
    part = load_table(spark, sf_dir, "part")
    return part.select(
        "p_partkey",
        F.upper("p_name").alias("name_upper"),
        F.length("p_name").alias("name_len"),
        F.substring("p_type", 1, 5).alias("type_prefix"),
        F.concat_ws("#", "p_brand", "p_type").alias("brand_type"),
        F.replace(F.col("p_name"), F.lit(" "), F.lit("_")).alias("name_snake"),
        F.trim("p_name").alias("name_trim"),
        F.col("p_name").like("%a%").alias("has_a"),
    )


@register(
    "scalar_date_funcs",
    oracle="""
    SELECT o_orderkey,
           CAST(year(o_orderdate)  AS INTEGER)             AS order_year,
           CAST(month(o_orderdate) AS INTEGER)             AS order_month,
           strftime(date_trunc('month', o_orderdate), '%Y-%m-%d') AS month_start,
           date_diff('day', o_orderdate, TIMESTAMP '2000-01-01 00:00:00') AS days_to_y2k
    FROM orders
    """,
)
def scalar_date_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Date/time family over orders (§2.8); all TZ-independent on NTZ."""
    orders = load_table(spark, sf_dir, "orders")
    return orders.select(
        "o_orderkey",
        F.year("o_orderdate").alias("order_year"),
        F.month("o_orderdate").alias("order_month"),
        F.date_format(F.date_trunc("month", "o_orderdate"), "yyyy-MM-dd").alias(
            "month_start"
        ),
        F.expr(
            "timestampdiff(DAY, o_orderdate, TIMESTAMP_NTZ '2000-01-01 00:00:00')"
        ).alias("days_to_y2k"),
    )


@register(
    "scalar_math_funcs",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           round(sqrt(l_quantity), 6)      AS qty_sqrt,
           abs(l_discount - 0.05)          AS disc_dev,
           CAST(ceil(l_extendedprice)  AS BIGINT) AS price_ceil,
           CAST(floor(l_extendedprice) AS BIGINT) AS price_floor,
           round(ln(l_extendedprice), 6)   AS price_ln,
           round(pow(l_tax, 2), 6)         AS tax_sq
    FROM lineitem
    WHERE l_quantity > 0 AND l_extendedprice > 0
    """,
)
def scalar_math_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Math family over lineitem (§2.8); libm outputs rounded to 6."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.filter((F.col("l_quantity") > 0) & (F.col("l_extendedprice") > 0)).select(
        "l_orderkey",
        "l_linenumber",
        F.round(F.sqrt("l_quantity"), 6).alias("qty_sqrt"),
        F.abs(F.col("l_discount") - 0.05).alias("disc_dev"),
        F.ceil("l_extendedprice").alias("price_ceil"),
        F.floor("l_extendedprice").alias("price_floor"),
        F.round(F.log("l_extendedprice"), 6).alias("price_ln"),
        F.round(F.pow("l_tax", F.lit(2)), 6).alias("tax_sq"),
    )


@register(
    "conditional_case",
    oracle="""
    SELECT o_orderkey,
           CASE WHEN o_totalprice >= 300000 THEN 'large'
                WHEN o_totalprice >= 100000 THEN 'medium'
                ELSE 'small' END                        AS size_class,
           coalesce(nullif(o_orderstatus, 'O'), 'OPEN') AS status_resolved
    FROM orders
    """,
)
def conditional_case(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CASE/WHEN, coalesce, nullif (§2.8 conditional family)."""
    orders = load_table(spark, sf_dir, "orders")
    return orders.select(
        "o_orderkey",
        F.when(F.col("o_totalprice") >= 300000, "large")
        .when(F.col("o_totalprice") >= 100000, "medium")
        .otherwise("small")
        .alias("size_class"),
        F.coalesce(F.nullif(F.col("o_orderstatus"), F.lit("O")), F.lit("OPEN")).alias(
            "status_resolved"
        ),
    )


@register(
    "json_extract_props",
    oracle="""
    SELECT event_id,
           CAST(json_extract_string(props, '$.k') AS BIGINT) AS k_value
    FROM events
    """,
)
def json_extract_props(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Schema-on-read JSON access on events.props (§2.8 JSON) — the serde
    layer of the reference (JSON values deserialized per record)."""
    ev = load_table(spark, sf_dir, "events")
    return ev.select(
        "event_id",
        F.get_json_object("props", "$.k").cast("long").alias("k_value"),
    )


@register(
    "array_funcs_embeddings",
    oracle="""
    SELECT vec_id,
           CAST(len(embedding) AS INTEGER) AS dim,
           round((SELECT sum(CAST(x AS DOUBLE)) FROM unnest(embedding) AS t(x)), 6)
                                           AS emb_sum,
           round(CAST(embedding[1] AS DOUBLE), 6) AS first_coord,
           round((SELECT max(CAST(x AS DOUBLE)) FROM unnest(embedding) AS t(x)), 6)
                                           AS emb_max
    FROM embeddings
    """,
)
def array_funcs_embeddings(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Higher-order array functions over the 64-dim embedding column
    (§2.8 array): the JVM-side path for vector math — no Python UDF."""
    emb = load_table(spark, sf_dir, "embeddings")
    return emb.select(
        "vec_id",
        F.size("embedding").alias("dim"),
        F.round(
            F.aggregate(
                "embedding",
                F.lit(0.0).cast("double"),
                lambda acc, x: acc + x.cast("double"),
            ),
            6,
        ).alias("emb_sum"),
        F.round(F.col("embedding")[0].cast("double"), 6).alias("first_coord"),
        F.round(F.array_max("embedding").cast("double"), 6).alias("emb_max"),
    )


@register(
    "explode_wordcount",
    oracle="""
    SELECT word, count(*) AS n
    FROM (SELECT unnest(string_split(text, ' ')) AS word FROM documents)
    GROUP BY word
    """,
)
def explode_wordcount(spark: SparkSession, sf_dir: str) -> DataFrame:
    """flatMap (1→N) + count: KStream#flatMapValues analogue (P4, A2)."""
    docs = load_table(spark, sf_dir, "documents")
    return (
        docs.select(F.explode(F.split("text", " ")).alias("word"))
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("n"))
    )


@register(
    "filter_like_regexp",
    oracle="""
    SELECT doc_id, lang, source
    FROM documents
    WHERE text LIKE '%spark%' AND regexp_matches(text, 'join|merge')
    """,
)
def filter_like_regexp(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LIKE + regexp predicates over text (§2.8 string predicates)."""
    docs = load_table(spark, sf_dir, "documents")
    return docs.filter(
        F.col("text").like("%spark%") & F.col("text").rlike("join|merge")
    ).select("doc_id", "lang", "source")


@register(
    "window_value_functions",
    oracle="""
    SELECT o_orderkey,
           o_custkey,
           first_value(o_totalprice) OVER w                  AS first_price,
           last_value(o_totalprice)  OVER w_full             AS last_price,
           nth_value(o_totalprice, 2) OVER w_full            AS second_price,
           round(cume_dist() OVER (
               PARTITION BY o_custkey ORDER BY o_totalprice
           ), 6)                                             AS price_cume_dist
    FROM orders
    WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey),
           w_full AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                      ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
    """,
)
def window_value_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Value-positional window functions (F1 completeness:
    first_value / last_value / nth_value / cume_dist): each order sees the
    customer's first, latest, and second order price plus its own price's
    cumulative distribution within the customer.

    Scale: one shuffle on o_custkey; the unbounded-following frame is a
    per-key full-frame scan (WindowExec buffers one customer's orders —
    bounded by per-key cardinality, not table size). Ties broken by
    (o_orderdate, o_orderkey); prices surface raw (no arithmetic), only
    cume_dist — a ratio of ranks, continuous-safe — is rounded.
    """
    orders = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    w_full = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    w_cd = Window.partitionBy("o_custkey").orderBy("o_totalprice")
    return orders.select(
        "o_orderkey",
        "o_custkey",
        F.first("o_totalprice").over(w).alias("first_price"),
        F.last("o_totalprice").over(w_full).alias("last_price"),
        F.nth_value("o_totalprice", 2).over(w_full).alias("second_price"),
        F.round(F.cume_dist().over(w_cd), 6).alias("price_cume_dist"),
    )


@register(
    "null_semantics_funcs",
    oracle="""
    SELECT event_id,
           nullif(event_type, 'error')                    AS type_or_null,
           coalesce(nullif(event_type, 'error'), 'n/a')   AS type_filled,
           (nullif(event_type, 'error')
            IS NOT DISTINCT FROM 'purchase')              AS is_purchase_nullsafe,
           CASE WHEN value > 100 THEN value END           AS big_value,
           ifnull(CASE WHEN value > 100 THEN value END,
                  -1.0)                                   AS big_value_filled
    FROM events
    """,
)
def null_semantics_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NULL-handling semantics (§2.8 conditional depth): nullif /
    coalesce / ifnull and null-safe equality (Spark `<=>` ≡ SQL
    IS NOT DISTINCT FROM) — the trap corner of SQL three-valued logic,
    pinned cross-engine.

    Scale: narrow per-row expressions, no shuffle; value doubles surface
    raw (no arithmetic, bit-identical across engines).
    """
    ev = load_table(spark, sf_dir, "events")
    type_or_null = F.expr("nullif(event_type, 'error')")
    big_value = F.when(F.col("value") > 100, F.col("value"))
    return ev.select(
        "event_id",
        type_or_null.alias("type_or_null"),
        F.coalesce(type_or_null, F.lit("n/a")).alias("type_filled"),
        type_or_null.eqNullSafe(F.lit("purchase")).alias("is_purchase_nullsafe"),
        big_value.alias("big_value"),
        F.ifnull(big_value, F.lit(-1.0)).alias("big_value_filled"),
    )


@register(
    "range_frame_weekly_revenue",
    oracle="""
    SELECT o_orderkey, o_custkey,
           strftime(o_orderdate, '%Y-%m-%d') AS order_date,
           sum(CAST(round(o_totalprice * 100) AS BIGINT)) OVER (
               PARTITION BY o_custkey ORDER BY o_orderdate
               RANGE BETWEEN INTERVAL 6 DAYS PRECEDING AND CURRENT ROW
           ) / 100.0 AS trailing_7d_total
    FROM orders
    """,
)
def range_frame_weekly_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Value-based (RANGE) window frame (F3 completeness — the ROWS-frame
    queries count positions; this one bounds the frame by TIME): each
    order sees the customer's trailing-7-day order total, including all
    same-date peers regardless of row position.

    Scale: one shuffle on o_custkey, one streaming frame pass per key —
    WindowExec's range frame advances two pointers monotonically, O(n)
    per key. The sum runs in exact cents (frame membership is identical
    across engines since the bound is date arithmetic, and integer sums
    are order-free — see functions/money.py).
    """
    orders = load_table(spark, sf_dir, "orders")
    return orders.select(
        "o_orderkey",
        "o_custkey",
        F.date_format("o_orderdate", "yyyy-MM-dd").alias("order_date"),
        (
            F.expr(
                """sum(CAST(round(o_totalprice * 100) AS BIGINT)) OVER (
                       PARTITION BY o_custkey ORDER BY o_orderdate
                       RANGE BETWEEN INTERVAL 6 DAYS PRECEDING AND CURRENT ROW
                   )"""
            )
            / 100.0
        ).alias("trailing_7d_total"),
    )


@register(
    "topk_with_ties_orders",
    oracle="""
    SELECT o_custkey, o_orderkey, o_totalprice, rnk
    FROM (
        SELECT o_custkey, o_orderkey, o_totalprice,
               CAST(rank() OVER (
                   PARTITION BY o_custkey
                   ORDER BY CAST(round(o_totalprice * 100) AS BIGINT) DESC
               ) AS BIGINT) AS rnk
        FROM orders
    )
    WHERE rnk <= 3
    """,
)
def topk_with_ties_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-k WITH ties (F4 variant): rank() keeps every order tied at the
    boundary — the correct semantics when "top 3 prices" means price
    levels, not arbitrary tie-broken rows (`window_topk_orders_per_customer`
    is the row_number variant). Ranking on exact cents so tie groups are
    bit-identical across engines.

    Scale: same WindowGroupLimit plan as the row_number form — partition-
    local rank pruning keeps ~k rows per key per partition before the
    shuffle (ties can exceed k; the limit is rank-aware).
    """
    orders = load_table(spark, sf_dir, "orders")
    cents = F.round(F.col("o_totalprice") * 100).cast("long")
    w = Window.partitionBy("o_custkey").orderBy(cents.desc())
    return (
        orders.select(
            "o_custkey",
            "o_orderkey",
            "o_totalprice",
            F.rank().over(w).cast("long").alias("rnk"),
        )
        .filter(F.col("rnk") <= 3)
    )
