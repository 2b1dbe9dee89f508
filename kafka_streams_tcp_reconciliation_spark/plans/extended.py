"""Extended operator coverage: aggregation completeness (SURVEY.md §2.4
A5–A7) and the UDF/UDAF/UDTF surface (§2.10).

The UDF queries are deliberately the *slow path* demos — each docstring
says what the built-in equivalent is. They exist because the reference's
API (ValueMapper lambdas, Initializer+Aggregator folds, flatMap) lets
users drop to arbitrary code, so the engine must expose the same escape
hatches — Arrow-vectorized, never row-at-a-time Python.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from kafka_streams_tcp_reconciliation_spark.plans import register
from kafka_streams_tcp_reconciliation_spark.sources.tables import load_table

# ---------------------------------------------------------------------------
# A5 — cogroup: multi-stream aggregate into one state
# ---------------------------------------------------------------------------


@register(
    "cogroup_order_lineitem",
    oracle="""
    SELECT k AS o_orderkey,
           round(sum(CASE WHEN src = 'o' THEN v END), 2)  AS order_total,
           count(CASE WHEN src = 'l' THEN 1 END)          AS n_lines,
           round(sum(CASE WHEN src = 'l' THEN v END), 2)  AS line_total
    FROM (
        SELECT o_orderkey AS k, 'o' AS src, o_totalprice AS v FROM orders
        UNION ALL
        SELECT l_orderkey AS k, 'l' AS src, l_extendedprice AS v FROM lineitem
    )
    GROUP BY k
    """,
)
def cogroup_order_lineitem(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cogroup (A5, KGroupedStream#cogroup): aggregate two keyed inputs
    into ONE grouped state via a tagged union — a single shuffle on the
    shared key instead of aggregate-then-join (two shuffles + a join).
    This is exactly how Kafka Streams cogroup folds multiple streams into
    one store, and the cheaper plan at 100 TB."""
    orders = load_table(spark, sf_dir, "orders")
    lineitem = load_table(spark, sf_dir, "lineitem")
    tagged = orders.select(
        F.col("o_orderkey").alias("k"), F.lit("o").alias("src"),
        F.col("o_totalprice").alias("v"),
    ).unionByName(
        lineitem.select(
            F.col("l_orderkey").alias("k"), F.lit("l").alias("src"),
            F.col("l_extendedprice").alias("v"),
        )
    )
    o = F.when(F.col("src") == "o", F.col("v"))
    l = F.when(F.col("src") == "l", F.col("v"))
    return tagged.groupBy(F.col("k").alias("o_orderkey")).agg(
        F.round(F.sum(o), 2).alias("order_total"),
        F.count(l).alias("n_lines"),
        F.round(F.sum(l), 2).alias("line_total"),
    )


# ---------------------------------------------------------------------------
# A7 — grouping sets (+ grouping_id)
# ---------------------------------------------------------------------------


@register(
    "grouping_sets_orders",
    oracle="""
    SELECT o_orderstatus, o_orderpriority,
           count(*)                   AS n_orders,
           round(sum(o_totalprice), 2) AS total_price,
           CAST(CASE WHEN o_orderstatus IS NULL THEN 2 ELSE 0 END
                + CASE WHEN o_orderpriority IS NULL THEN 1 ELSE 0 END
                AS BIGINT)            AS gid
    FROM orders
    GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
    """,
)
def grouping_sets_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GROUPING SETS with grouping_id (A7): per-status totals, per-priority
    totals, and the grand total in one pass (Catalyst plans a single
    Expand + HashAggregate — one shuffle for all three rollup levels).
    gid mirrors Spark's grouping_id() bit order (first grouping column =
    MSB); the oracle reconstructs it from NULL-ness, valid because neither
    column is nullable in the data."""
    orders = load_table(spark, sf_dir, "orders")
    orders.createOrReplaceTempView("gs_orders")
    return spark.sql(
        """
        SELECT o_orderstatus, o_orderpriority,
               count(*)                    AS n_orders,
               round(sum(o_totalprice), 2) AS total_price,
               CAST(grouping_id(o_orderstatus, o_orderpriority) AS BIGINT)
                                           AS gid
        FROM gs_orders
        GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
        """
    )


# ---------------------------------------------------------------------------
# pivot (wide aggregation)
# ---------------------------------------------------------------------------


@register(
    "pivot_orders_status",
    oracle="""
    SELECT o_orderpriority,
           count(CASE WHEN o_orderstatus = 'O' THEN 1 END) AS n_open,
           count(CASE WHEN o_orderstatus = 'F' THEN 1 END) AS n_filled,
           count(CASE WHEN o_orderstatus = 'P' THEN 1 END) AS n_partial
    FROM orders
    GROUP BY o_orderpriority
    """,
)
def pivot_orders_status(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot (wide aggregation): order counts by priority, one column per
    status. Explicit pivot values keep the plan a single pass (no extra
    distinct-values job) — required practice at scale."""
    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.groupBy("o_orderpriority")
        .pivot("o_orderstatus", ["O", "F", "P"])
        .agg(F.count(F.lit(1)))
        .select(
            "o_orderpriority",
            F.coalesce("O", F.lit(0)).alias("n_open"),
            F.coalesce("F", F.lit(0)).alias("n_filled"),
            F.coalesce("P", F.lit(0)).alias("n_partial"),
        )
    )


# ---------------------------------------------------------------------------
# A6 — approximate distinct (HLL). Sketch VALUES are engine-specific, so the
# sketch half is validated via its deterministic error bound (the same
# technique as approx_percentile_value): for a fixed input and hash, the
# estimate is deterministic, and |approx − exact| must sit inside a slacked
# multiple of the configured rsd — a column both engines agree on iff the
# sketch honours its guarantee. The exact half is value-checked directly.
# Tight-accuracy + merge-losslessness remain pytest-locked
# (tests/test_extended.py).
# ---------------------------------------------------------------------------


@register(
    "approx_distinct_users",
    oracle="""
    SELECT event_type, count(DISTINCT user_id) AS exact_users,
           TRUE AS within_bound
    FROM events GROUP BY event_type
    """,
)
def approx_distinct_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """approx_count_distinct (A6): HyperLogLog++ per-key cardinality — the
    constant-memory path for 100 TB flow-cardinality counting (exact
    countDistinct needs a full distinct shuffle; HLL merges 1.5 KB
    sketches map-side). ``within_bound`` checks the estimate against the
    exact count at 3x the configured rsd (+2 absolute slack for tiny
    groups); tests assert the tight <5% bound."""
    ev = load_table(spark, sf_dir, "events")
    return ev.groupBy("event_type").agg(
        F.countDistinct("user_id").alias("exact_users"),
        (
            F.abs(
                F.approx_count_distinct("user_id", rsd=0.02)
                - F.countDistinct("user_id")
            )
            <= F.countDistinct("user_id") * 0.06 + F.lit(2)
        ).alias("within_bound"),
    )


# ---------------------------------------------------------------------------
# §2.10 — UDF / UDAF / UDTF surface
# ---------------------------------------------------------------------------


def _make_rms_udf():
    # built lazily: pandas_udf parses its return type against the active
    # session, which doesn't exist at plan-module import time
    @F.pandas_udf("double")
    def rms(v: pd.Series) -> float:  # GROUPED_AGG
        # dropna: SQL aggregates ignore NULLs — the kernel must too, or a
        # single NULL poisons the group mean with NaN
        return float(
            np.sqrt(np.mean(np.square(v.dropna().to_numpy(dtype="float64"))))
        )

    return rms


@register(
    "udaf_rms_value_by_type",
    oracle="""
    SELECT event_type,
           round(sqrt(avg(value * value)), 6) AS rms_value
    FROM events
    GROUP BY event_type
    """,
)
def udaf_rms_value_by_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Custom UDAF via Arrow GROUPED_AGG pandas_udf (2.10; the
    Initializer+Aggregator escape hatch). Built-in equivalent:
    sqrt(avg(value*value)) — always prefer it; this query exists to pin
    the vectorized-UDAF path. Rounded to 6 so numpy's pairwise summation
    agrees with the oracle's sequential sum."""
    ev = load_table(spark, sf_dir, "events")
    rms = _make_rms_udf()
    return ev.groupBy("event_type").agg(
        F.round(rms("value"), 6).alias("rms_value")
    )


def _make_normalize_udf():
    @F.pandas_udf("string")
    def normalize(s: pd.Series) -> pd.Series:  # SCALAR
        return s.str.strip().str.lower().str.replace(r"\s+", " ", regex=True)

    return normalize


@register(
    "udf_normalize_part_names",
    oracle="""
    SELECT p_partkey,
           lower(trim(regexp_replace(p_name, '\\s+', ' ', 'g')))
               AS norm_name
    FROM part
    """,
)
def udf_normalize_part_names(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scalar Arrow pandas_udf (2.10; the ValueMapper escape hatch):
    whitespace-normalize + lowercase part names. Built-in equivalent:
    lower(trim(regexp_replace(...))) — this query pins the vectorized
    scalar-UDF path (one Arrow batch per ~10k rows, never per-row)."""
    part = load_table(spark, sf_dir, "part")
    normalize = _make_normalize_udf()
    return part.select(
        "p_partkey", normalize("p_name").alias("norm_name")
    )


_CHUNK_TOKENS = 10


@register(
    "udtf_chunk_documents",
    oracle=f"""
    SELECT doc_id,
           ch_i AS chunk_idx,
           array_to_string(
               string_split(text, ' ')[ch_i * {_CHUNK_TOKENS} + 1
                                       : ch_i * {_CHUNK_TOKENS} + {_CHUNK_TOKENS}],
               ' ') AS chunk_text
    FROM documents,
         (SELECT unnest(range(0, 200)) AS ch_i)
    WHERE ch_i * {_CHUNK_TOKENS} < len(string_split(text, ' '))
    """,
)
def udtf_chunk_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Python UDTF (2.10; the flatMap 1→N escape hatch): split each
    document into fixed-size token chunks — the context-window chunking
    step of an LLM data pipeline. Built-in equivalent: posexplode over a
    transform(sequence(...)) — this query pins the UDTF path (lateral
    table function over every row)."""
    from pyspark.sql.functions import udtf

    @udtf(returnType="doc_id: long, chunk_idx: long, chunk_text: string")
    class ChunkDoc:
        def eval(self, doc_id: int, text: str):
            if text is None:  # a NULL document yields no chunks
                return
            words = text.split(" ")
            for i in range(0, len(words), _CHUNK_TOKENS):
                yield doc_id, i // _CHUNK_TOKENS, " ".join(
                    words[i : i + _CHUNK_TOKENS]
                )

    spark.udtf.register("chunk_doc", ChunkDoc)
    docs = load_table(spark, sf_dir, "documents")
    docs.createOrReplaceTempView("udtf_docs")
    return spark.sql(
        "SELECT c.doc_id, c.chunk_idx, c.chunk_text "
        "FROM udtf_docs d, LATERAL chunk_doc(d.doc_id, d.text) c"
    )


# ---------------------------------------------------------------------------
# correlated subquery (Catalyst decorrelation) + map/struct + approx quantile
# ---------------------------------------------------------------------------


@register(
    "q17_small_quantity_revenue",
    oracle="""
    SELECT round(sum(l.l_extendedprice) / 7.0, 2) AS avg_yearly,
           count(*) AS n_lines
    FROM lineitem l
    JOIN part p ON p.p_partkey = l.l_partkey
    WHERE p.p_brand = 'Brand#1'
      AND l.l_quantity < (
          SELECT 0.2 * avg(l2.l_quantity)
          FROM lineitem l2
          WHERE l2.l_partkey = l.l_partkey
      )
    """,
)
def q17_small_quantity_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17 shape: correlated scalar subquery. Catalyst decorrelates
    it into an aggregate-then-join (one extra shuffle on l_partkey), so the
    SQL stays declarative and the plan is the one you would hand-write.
    Written in SQL deliberately to pin the decorrelation path."""
    load_table(spark, sf_dir, "lineitem").createOrReplaceTempView("q17_lineitem")
    load_table(spark, sf_dir, "part").createOrReplaceTempView("q17_part")
    return spark.sql(
        """
        SELECT round(sum(l.l_extendedprice) / 7.0, 2) AS avg_yearly,
               count(*) AS n_lines
        FROM q17_lineitem l
        JOIN q17_part p ON p.p_partkey = l.l_partkey
        WHERE p.p_brand = 'Brand#1'
          AND l.l_quantity < (
              SELECT 0.2 * avg(l2.l_quantity)
              FROM q17_lineitem l2
              WHERE l2.l_partkey = l.l_partkey
          )
        """
    )


@register(
    "map_struct_funcs",
    oracle="""
    SELECT o_orderkey,
           to_json(struct_pack(status := o_orderstatus,
                               priority := o_orderpriority)) AS meta_json,
           map_keys(map {'status': o_orderstatus,
                         'priority': o_orderpriority})[1]    AS first_key,
           (map {'status': o_orderstatus,
                 'priority': o_orderpriority}['status'])[1]  AS status_val
    FROM orders
    """,
)
def map_struct_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Map/struct scalar family (§2.8): struct pack → JSON, map literal,
    map_keys, map element access — the pass-through completeness row of
    the survey, exercised rather than assumed."""
    orders = load_table(spark, sf_dir, "orders")
    m = F.create_map(
        F.lit("status"), F.col("o_orderstatus"),
        F.lit("priority"), F.col("o_orderpriority"),
    )
    return orders.select(
        "o_orderkey",
        F.to_json(
            F.struct(
                F.col("o_orderstatus").alias("status"),
                F.col("o_orderpriority").alias("priority"),
            )
        ).alias("meta_json"),
        F.map_keys(m).getItem(0).alias("first_key"),
        m.getItem("status").alias("status_val"),
    )


@register(
    "approx_percentile_value",
    oracle="""
    SELECT event_type, q, round(exact_v, 6) AS exact_v, TRUE AS within_bound
    FROM (
        SELECT event_type, CAST(0.5 AS DOUBLE) AS q,
               quantile_cont(value, 0.5) AS exact_v
        FROM events GROUP BY event_type HAVING count(value) > 0
        UNION ALL
        SELECT event_type, CAST(0.95 AS DOUBLE),
               quantile_cont(value, 0.95)
        FROM events GROUP BY event_type HAVING count(value) > 0
    )
    """,
)
def approx_percentile_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """approx_percentile (A4/A6 companion): KLL/GK-sketch quantiles — the
    constant-memory path for latency percentiles over 100 TB (exact
    percentile sorts each group).

    Sketch values are engine-specific, so the sketch half is validated by
    its deterministic guarantee instead of its raw value: with accuracy
    1/eps = 1000, the returned quantile's rank must lie within eps*n of
    q*n. The query re-ranks the sketch output against the data (one extra
    pass, broadcast of a per-type row) and emits ``within_bound`` — a
    column both engines agree on iff the sketch honours its bound (5x
    slack vs the nominal eps; pytest asserts the tight bound). The exact
    half (Spark ``percentile`` == DuckDB ``quantile_cont``, linear
    interpolation) is value-checked directly. Scalar rows (event_type, q)
    keep the output canonicalizer-friendly — no array columns.

    All-NULL groups are excluded by a mirrored ``count(value) > 0``
    contract: Spark's ``percentile`` returns a NULL *array* for such a
    group (posexplode then yields zero rows) while DuckDB emits NULL
    scalars — filtering both sides keeps the row sets identical on any
    corpus."""
    ev = load_table(spark, sf_dir, "events")
    agg = ev.groupBy("event_type").agg(
        # count(value), not count(*): the sketch and the exact percentile
        # both ignore NULLs, so the rank bound must rank over the same
        # non-null population
        F.count("value").alias("n"),
        F.expr("percentile(value, array(0.5, 0.95))").alias("exact_p"),
        F.expr("approx_percentile(value, array(0.5, 0.95), 1000)").alias("approx_p"),
    )
    agg = agg.where(F.col("n") > 0)
    exploded = agg.select(
        "event_type",
        "n",
        F.posexplode(F.arrays_zip("exact_p", "approx_p")).alias("pos", "pe"),
    ).select(
        "event_type",
        "n",
        F.element_at(F.array(F.lit(0.5), F.lit(0.95)), F.col("pos") + 1).alias("q"),
        F.col("pe.exact_p").alias("exact_v"),
        F.col("pe.approx_p").alias("approx_v"),
    )
    ranked = (
        ev.select("event_type", "value")
        .join(F.broadcast(exploded), "event_type")
        .groupBy("event_type", "q")
        .agg(
            F.first("n").alias("n"),
            F.first("exact_v").alias("exact_v"),
            F.sum(
                F.when(F.col("value") <= F.col("approx_v"), 1).otherwise(0)
            ).alias("rank_le"),
        )
    )
    return ranked.select(
        "event_type",
        "q",
        F.round("exact_v", 6).alias("exact_v"),
        (
            F.abs(F.col("rank_le") - F.col("q") * F.col("n"))
            <= F.col("n") * 0.005 + F.lit(2)
        ).alias("within_bound"),
    )


@register(
    "unpivot_lineitem_measures",
    oracle="""
    SELECT l_orderkey, l_linenumber, 'quantity' AS measure, l_quantity AS val
    FROM lineitem
    UNION ALL
    SELECT l_orderkey, l_linenumber, 'extendedprice', l_extendedprice
    FROM lineitem
    UNION ALL
    SELECT l_orderkey, l_linenumber, 'discount', l_discount FROM lineitem
    UNION ALL
    SELECT l_orderkey, l_linenumber, 'tax', l_tax FROM lineitem
    """,
)
def unpivot_lineitem_measures(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unpivot / melt (the inverse of `pivot_orders_status`): the four
    lineitem measures go long — one (measure, val) row each — the shape
    feature stores and metric pipelines ingest.

    Scale: `stack` is a narrow 1→4 generate (no shuffle, no join — the
    UNION-ALL oracle formulation would scan the table 4 times; stack
    scans once). Values surface raw, no arithmetic.
    """
    li = load_table(spark, sf_dir, "lineitem")
    return li.selectExpr(
        "l_orderkey",
        "l_linenumber",
        """stack(4,
            'quantity', l_quantity,
            'extendedprice', l_extendedprice,
            'discount', l_discount,
            'tax', l_tax) AS (measure, val)""",
    )


@register(
    "part_pair_cooccurrence",
    oracle="""
    WITH op AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
    pair_counts AS (
        SELECT a.l_partkey AS a_partkey, b.l_partkey AS b_partkey,
               count(*) AS n_both
        FROM op a JOIN op b
          ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
        GROUP BY a.l_partkey, b.l_partkey
    ),
    part_counts AS (SELECT l_partkey, count(*) AS n FROM op GROUP BY l_partkey),
    total AS (SELECT count(DISTINCT l_orderkey) AS n_orders FROM op)
    SELECT a_partkey, b_partkey, n_both,
           round(CAST(n_both AS DOUBLE) * n_orders
                 / (ca.n * cb.n), 6) AS lift
    FROM pair_counts
    JOIN part_counts ca ON ca.l_partkey = a_partkey
    JOIN part_counts cb ON cb.l_partkey = b_partkey
    CROSS JOIN total
    """,
)
def part_pair_cooccurrence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Market-basket co-occurrence: for every pair of parts appearing in
    the same order, the co-order count and its lift (observed / expected
    under independence) — association mining's first pass.

    Scale: the self-join keys on l_orderkey, so fan-out is bounded by
    order size squared (~4 lines/order → ~8 pairs), never corpus²; the
    pair rollup is map-side combinable; per-part counts are a
    |parts|-sized relation broadcast onto the pairs, and the order total
    is a 1-row broadcast. Lift is a continuous ratio — round(…, 6) is
    boundary-safe.
    """
    # Round 13 (guide §2.4): pair generation through the shared NARROW
    # per-order shape (collect_set + HOF pair emission — see
    # plans/advanced._copurchase_pair_counts) instead of the l_orderkey
    # self-join; the per-order part arrays also feed the per-part counts
    # and the order total, so ONE lineitem shuffle replaces the previous
    # three (distinct + two join sides). Same pairs, same counts: the
    # arrays are the distinct per-order part sets.
    from kafka_streams_tcp_reconciliation_spark.plans.advanced import (
        _copurchase_pair_counts,
        _copurchase_per_order,
    )

    li = load_table(spark, sf_dir, "lineitem")
    # no .cache(): the three consumers share the groupBy's exchange (AQE
    # reuse); a cache barrier measured SLOWER than recomputing the narrow
    # explode from the shared shuffle output (probe: 1.7 vs 2.2 s median)
    per_order = _copurchase_per_order(li)
    pair_counts = _copurchase_pair_counts(per_order).select(
        F.col("u").alias("a_partkey"),
        F.col("v").alias("b_partkey"),
        F.col("n_co").alias("n_both"),
    )
    part_counts = (
        per_order.select(F.explode("ps").alias("l_partkey"))
        .groupBy("l_partkey")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    total = per_order.agg(F.count(F.lit(1)).alias("n_orders"))
    ca = part_counts.select(
        F.col("l_partkey").alias("a_partkey"), F.col("n").alias("n_a")
    )
    cb = part_counts.select(
        F.col("l_partkey").alias("b_partkey"), F.col("n").alias("n_b")
    )
    return (
        pair_counts.join(F.broadcast(ca), "a_partkey")
        .join(F.broadcast(cb), "b_partkey")
        .crossJoin(F.broadcast(total))
        .select(
            "a_partkey",
            "b_partkey",
            "n_both",
            F.round(
                F.col("n_both").cast("double")
                * F.col("n_orders")
                / (F.col("n_a") * F.col("n_b")),
                6,
            ).alias("lift"),
        )
    )


@register(
    "hll_user_sketch_rollup",
    oracle="""
    SELECT event_type AS scope, count(DISTINCT user_id) AS exact_users,
           TRUE AS within_bound
    FROM events GROUP BY event_type
    UNION ALL
    SELECT 'ALL', count(DISTINCT user_id), TRUE FROM events
    """,
)
def hll_user_sketch_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mergeable-sketch rollup (A6 at warehouse scale): per-event-type
    Datasketches HLL sketches of the user population, unioned into an
    'ALL' row WITHOUT rescanning — the additive-cube pattern that lets a
    100 TB daily job persist per-partition sketches and answer any
    rollup by sketch union (HLL union is lossless, so the merged
    estimate is bit-identical to a direct whole-table sketch; locked by
    `tests/test_extended.py`). Sketch estimates are engine-specific, so
    the driver check validates each scope's estimate against the exact
    distinct via the sketch's deterministic error bound (5% + 2 slack at
    the default lgConfigK=12, rse ~1.6%); the exact column is
    value-checked. Accuracy/merge-consistency stay pytest-locked.
    """
    ev = load_table(spark, sf_dir, "events")
    per_type = ev.groupBy("event_type").agg(
        F.hll_sketch_agg("user_id").alias("sk"),
        F.countDistinct("user_id").alias("exact_users"),
    )
    typed = per_type.select(
        F.col("event_type").alias("scope"),
        "exact_users",
        (
            F.abs(F.hll_sketch_estimate("sk") - F.col("exact_users"))
            <= F.col("exact_users") * 0.05 + F.lit(2)
        ).alias("within_bound"),
    )
    merged = (
        per_type.agg(
            F.hll_sketch_estimate(F.hll_union_agg("sk")).alias("approx_all")
        )
        .crossJoin(
            F.broadcast(
                ev.agg(F.countDistinct("user_id").alias("exact_users"))
            )
        )
        .select(
            F.lit("ALL").alias("scope"),
            "exact_users",
            (
                F.abs(F.col("approx_all") - F.col("exact_users"))
                <= F.col("exact_users") * 0.05 + F.lit(2)
            ).alias("within_bound"),
        )
    )
    return typed.unionByName(merged)


@register(
    "graph_degree_distribution",
    oracle="""
    WITH op AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
    edges AS (
        SELECT a.l_partkey AS a_partkey, b.l_partkey AS b_partkey
        FROM op a JOIN op b
          ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
        GROUP BY a.l_partkey, b.l_partkey
        HAVING count(*) >= 2
    ),
    degrees AS (
        SELECT node, count(*) AS degree FROM (
            SELECT a_partkey AS node FROM edges
            UNION ALL
            SELECT b_partkey FROM edges
        ) GROUP BY node
    )
    SELECT degree, count(*) AS n_nodes
    FROM degrees GROUP BY degree
    """,
)
def graph_degree_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Degree distribution of the part co-purchase graph (edges = part
    pairs co-ordered >= 2 times) — the first diagnostic a graph pipeline
    runs before committing to an algorithm (connected components and
    PageRank upstream assume no pathological hub).

    Scale: edges derive from the order-bounded self-join (see
    `part_pair_cooccurrence`); the degree count is one shuffle of the
    edge list keyed by node (each edge contributes two map-side rows);
    the final histogram collapses to O(max degree) groups map-side. No
    adjacency materialization.
    """
    # Round 13 (guide §2.4): the same (u, v) edge set through the shared
    # NARROW per-order pair generation triangle_count/two_hop already use
    # (plans/advanced._copurchase_edges — collect_set + HOF emission, one
    # lineitem shuffle) instead of the l_orderkey self-join; the degree
    # count explodes each edge's two endpoints in one scan (no unionAll
    # re-reading the edge lineage twice).
    from kafka_streams_tcp_reconciliation_spark.plans.advanced import (
        _copurchase_edges,
    )

    li = load_table(spark, sf_dir, "lineitem")
    edges = _copurchase_edges(li)
    degrees = (
        edges.select(F.explode(F.array("u", "v")).alias("node"))
        .groupBy("node")
        .agg(F.count(F.lit(1)).alias("degree"))
    )
    return degrees.groupBy("degree").agg(F.count(F.lit(1)).alias("n_nodes"))
