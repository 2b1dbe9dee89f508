"""Data-governance and statistics queries (SURVEY.md §2.11 extensions).

A 100 TB training-data pipeline is as much about *trusting* the data as
transforming it. This module adds the governance layer a production corpus
build runs before and after the heavy operators in ``plans/llm.py`` /
``plans/pipeline.py``:

- contract auditing (null/domain/referential/uniqueness checks),
- distribution profiling (histograms, correlation/moment statistics),
- change-history modelling (SCD2 validity intervals from an event log),
- rolling engagement (trailing-24h distinct users, the streaming-friendly
  fan-out formulation),
- semantic dedup (SemDeDup-style: cluster first, then compare only within
  a cluster — arXiv:2303.09540's recipe for making near-dup detection
  sub-quadratic at corpus scale).

Every query follows the house rules (SURVEY.md §5.2): identical aliases in
the Spark plan and the DuckDB oracle, floats rounded the same on both
sides or kept exact-integer (see ``functions/money.py``), timestamps
surfaced as strings with explicit microsecond formatting.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from kafka_streams_tcp_reconciliation_spark.operators import similarity as sim
from kafka_streams_tcp_reconciliation_spark.plans import register
from kafka_streams_tcp_reconciliation_spark.sources.tables import load_table, scale_out

_TS_FMT_US = "yyyy-MM-dd HH:mm:ss.SSSSSS"
_TS_FMT_US_DUCK = "%Y-%m-%d %H:%M:%S.%f"

_ORDER_STATUSES = "'O', 'F', 'P'"
_EVENT_TYPES = "'view', 'click', 'purchase', 'signup', 'error'"


# --- data-quality contract audit ------------------------------------------


@register(
    "dq_audit_contracts",
    oracle=f"""
    SELECT 'orders_rows' AS check_name, count(*) AS n FROM orders
    UNION ALL
    SELECT 'orders_null_custkey', count(*) FROM orders WHERE o_custkey IS NULL
    UNION ALL
    SELECT 'orders_orphan_custkey', count(*)
    FROM orders o LEFT JOIN customer c ON o.o_custkey = c.c_custkey
    WHERE c.c_custkey IS NULL
    UNION ALL
    SELECT 'orders_dup_orderkey', count(*) FROM (
        SELECT o_orderkey FROM orders GROUP BY o_orderkey HAVING count(*) > 1
    )
    UNION ALL
    SELECT 'orders_status_out_of_domain', count(*)
    FROM orders WHERE o_orderstatus NOT IN ({_ORDER_STATUSES})
    UNION ALL
    SELECT 'orders_price_out_of_range', count(*)
    FROM orders WHERE o_totalprice <= 0 OR o_totalprice > 1000000
    UNION ALL
    SELECT 'lineitem_rows', count(*) FROM lineitem
    UNION ALL
    SELECT 'lineitem_dup_orderkey_linenumber', count(*) FROM (
        SELECT l_orderkey, l_linenumber FROM lineitem
        GROUP BY l_orderkey, l_linenumber HAVING count(*) > 1
    )
    UNION ALL
    SELECT 'lineitem_discount_out_of_range', count(*)
    FROM lineitem WHERE l_discount < 0 OR l_discount > 0.1
    UNION ALL
    SELECT 'lineitem_nonpositive_quantity', count(*)
    FROM lineitem WHERE l_quantity <= 0
    UNION ALL
    SELECT 'events_rows', count(*) FROM events
    UNION ALL
    SELECT 'events_type_out_of_domain', count(*)
    FROM events WHERE event_type NOT IN ({_EVENT_TYPES})
    UNION ALL
    SELECT 'events_ts_out_of_range', count(*)
    FROM events WHERE ts < TIMESTAMP '2024-01-01'
                   OR ts >= TIMESTAMP '2025-01-01'
    UNION ALL
    SELECT 'events_value_out_of_domain', count(*)
    FROM events WHERE abs(value) > 1000000000
    """,
)
def dq_audit_contracts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Contract audit: one row per data-quality check, with the violation
    count (plus raw row counts so the result always carries nonzero values
    to hash).

    Scale: ALL predicate checks on a table fuse into ONE scan — a single
    multi-count aggregate (conditional sums, map-side combinable) whose
    1-row result stacks to long form. Only checks that genuinely need
    another topology stand alone: referential integrity (broadcast
    anti-join against the customer dim, BROADCAST_TABLES) and key
    uniqueness (a groupBy shuffling just the candidate key). No check
    materializes violating rows — counts only — so the audit output is
    O(#checks) regardless of table size: 3 table scans + 1 anti-join +
    2 key aggregates for 13 checks.
    """
    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")
    lineitem = load_table(spark, sf_dir, "lineitem")
    events = load_table(spark, sf_dir, "events")

    def one(name: str, df: DataFrame) -> DataFrame:
        return df.select(F.lit(name).alias("check_name"), F.col("n"))

    def cnt(df: DataFrame) -> DataFrame:
        return df.agg(F.count(F.lit(1)).alias("n"))

    def viol(pred) -> F.Column:
        # coalesce: sum over an EMPTY table is NULL, but "no rows" means
        # zero violations — and the oracle's count(*) forms yield 0
        return F.coalesce(F.sum(F.when(pred, 1).otherwise(0)), F.lit(0))

    orders_scan = orders.agg(
        F.count(F.lit(1)).alias("orders_rows"),
        viol(F.col("o_custkey").isNull()).alias("orders_null_custkey"),
        viol(~F.col("o_orderstatus").isin("O", "F", "P")).alias(
            "orders_status_out_of_domain"
        ),
        viol(
            (F.col("o_totalprice") <= 0) | (F.col("o_totalprice") > 1000000)
        ).alias("orders_price_out_of_range"),
    ).selectExpr(
        """stack(4,
            'orders_rows', orders_rows,
            'orders_null_custkey', orders_null_custkey,
            'orders_status_out_of_domain', orders_status_out_of_domain,
            'orders_price_out_of_range', orders_price_out_of_range
        ) AS (check_name, n)"""
    )
    lineitem_scan = lineitem.agg(
        F.count(F.lit(1)).alias("lineitem_rows"),
        viol(
            (F.col("l_discount") < 0) | (F.col("l_discount") > 0.1)
        ).alias("lineitem_discount_out_of_range"),
        viol(F.col("l_quantity") <= 0).alias("lineitem_nonpositive_quantity"),
    ).selectExpr(
        """stack(3,
            'lineitem_rows', lineitem_rows,
            'lineitem_discount_out_of_range', lineitem_discount_out_of_range,
            'lineitem_nonpositive_quantity', lineitem_nonpositive_quantity
        ) AS (check_name, n)"""
    )
    events_scan = events.agg(
        F.count(F.lit(1)).alias("events_rows"),
        viol(
            ~F.col("event_type").isin("view", "click", "purchase", "signup", "error")
        ).alias("events_type_out_of_domain"),
        viol(
            (F.col("ts") < F.expr("TIMESTAMP_NTZ '2024-01-01 00:00:00'"))
            | (F.col("ts") >= F.expr("TIMESTAMP_NTZ '2025-01-01 00:00:00'"))
        ).alias("events_ts_out_of_range"),
        # magnitude gate for the micro-unit quantization contract: every
        # exact-integer money/value pipeline (drawdown, CUPED, LTV, ...)
        # is exact for |value| <= 1e9 and FAILS LOUDLY (ANSI CAST_OVERFLOW
        # at ~9.2e12) beyond int64/1e6 — this check is the ingest gate
        # that catches such garbage before those jobs run
        viol(F.abs(F.col("value")) > 1_000_000_000).alias(
            "events_value_out_of_domain"
        ),
    ).selectExpr(
        """stack(4,
            'events_rows', events_rows,
            'events_type_out_of_domain', events_type_out_of_domain,
            'events_ts_out_of_range', events_ts_out_of_range,
            'events_value_out_of_domain', events_value_out_of_domain
        ) AS (check_name, n)"""
    )
    orphans = orders.join(
        F.broadcast(customer),
        orders["o_custkey"] == customer["c_custkey"],
        "left_anti",
    )
    dup_orders = (
        orders.groupBy("o_orderkey")
        .agg(F.count(F.lit(1)).alias("c"))
        .filter(F.col("c") > 1)
    )
    dup_lines = (
        lineitem.groupBy("l_orderkey", "l_linenumber")
        .agg(F.count(F.lit(1)).alias("c"))
        .filter(F.col("c") > 1)
    )
    out = orders_scan
    for part in (
        one("orders_orphan_custkey", cnt(orphans)),
        one("orders_dup_orderkey", cnt(dup_orders)),
        lineitem_scan,
        one("lineitem_dup_orderkey_linenumber", cnt(dup_lines)),
        events_scan,
    ):
        out = out.unionByName(part)
    return out


# --- distribution profiling: equi-width histogram -------------------------

_HIST_WIDTH = 25_000
_HIST_BUCKETS = 20


@register(
    "histogram_order_totals",
    oracle=f"""
    SELECT bucket_lo,
           count(*) AS n_orders,
           min(CAST(round(o_totalprice * 100) AS BIGINT)) / 100.0 AS min_price,
           max(CAST(round(o_totalprice * 100) AS BIGINT)) / 100.0 AS max_price
    FROM (
        SELECT o_totalprice,
               least({_HIST_BUCKETS - 1},
                     CAST(floor(o_totalprice / {_HIST_WIDTH}) AS BIGINT))
               * {_HIST_WIDTH} AS bucket_lo
        FROM orders
    )
    GROUP BY bucket_lo
    """,
)
def histogram_order_totals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equi-width histogram of order totals ($25k buckets, top bucket
    open-ended) — the profiling pass a pipeline runs to pick salting /
    range-partition boundaries before a heavy job.

    Scale: bucket id is a narrow per-row expression; the aggregate is
    map-side combinable into at most ``_HIST_BUCKETS`` groups, so the
    shuffle carries O(buckets × partitions) rows no matter the input
    size. Min/max go through exact cents (``functions/money.py``) so the
    displayed bounds are bit-identical across engines.
    """
    orders = load_table(spark, sf_dir, "orders")
    bucket = F.least(
        F.lit(_HIST_BUCKETS - 1),
        F.floor(F.col("o_totalprice") / _HIST_WIDTH).cast("long"),
    )
    cents = F.round(F.col("o_totalprice") * 100).cast("long")
    return (
        orders.select(
            (bucket * _HIST_WIDTH).alias("bucket_lo"), cents.alias("cents")
        )
        .groupBy("bucket_lo")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            (F.min("cents") / 100.0).alias("min_price"),
            (F.max("cents") / 100.0).alias("max_price"),
        )
    )


# --- moment / correlation statistics --------------------------------------


@register(
    "stats_corr_lineitem",
    oracle="""
    SELECT round(corr(l_quantity, l_extendedprice), 6)       AS corr_qty_price,
           round(covar_samp(l_quantity, l_extendedprice), 2) AS covar_qty_price,
           round(stddev_samp(l_discount), 6)                 AS stddev_discount,
           round(avg(l_quantity), 6)                         AS avg_qty,
           count(*)                                          AS n
    FROM lineitem
    """,
)
def stats_corr_lineitem(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Second-moment profile of lineitem (corr / covariance / stddev) —
    the statistics a feature-selection or drift-detection pass computes.

    Scale: all five aggregates are single-pass streaming moments with
    exact partial+final merge (Catalyst's ``corr``/``covar_samp`` use the
    numerically-stable co-moment update), so one scan, one 1-row result,
    no shuffle beyond the final merge. Values are continuous (not on a
    decimal grid), so rounding after the float aggregate cannot sit on a
    representable half-way boundary — the round(…, k) is cross-engine
    safe (see functions/money.py for the grid-valued counterexample).
    """
    li = load_table(spark, sf_dir, "lineitem")
    return li.agg(
        F.round(F.corr("l_quantity", "l_extendedprice"), 6).alias("corr_qty_price"),
        F.round(F.covar_samp("l_quantity", "l_extendedprice"), 2).alias(
            "covar_qty_price"
        ),
        F.round(F.stddev_samp("l_discount"), 6).alias("stddev_discount"),
        F.round(F.avg("l_quantity"), 6).alias("avg_qty"),
        F.count(F.lit(1)).alias("n"),
    )


# --- SCD2 validity intervals from an event log ----------------------------


@register(
    "scd2_purchase_value_history",
    oracle=f"""
    SELECT user_id,
           value,
           strftime(ts, '{_TS_FMT_US_DUCK}') AS valid_from,
           strftime(lead(ts) OVER w, '{_TS_FMT_US_DUCK}') AS valid_to,
           CAST(CASE WHEN lead(ts) OVER w IS NULL THEN 1 ELSE 0 END
                AS BIGINT) AS is_current
    FROM events
    WHERE event_type = 'purchase'
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    """,
)
def scd2_purchase_value_history(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Type-2 slowly-changing-dimension build: each purchase's value is
    valid from its event time until the user's next purchase (open-ended
    for the latest). The standard CDC-log → SCD2 transform, expressed as
    one ``lead`` window.

    Scale: one shuffle on ``user_id``; per-key state is a single row of
    lookahead (Spark's WindowExec streams the frame). The (ts, event_id)
    ordering makes interval boundaries deterministic under same-timestamp
    events. Microsecond-formatted strings keep the interval endpoints
    bit-identical across engines.
    """
    ev = load_table(spark, sf_dir, "events").filter(
        F.col("event_type") == "purchase"
    )
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    nxt = F.lead("ts").over(w)
    return ev.select(
        "user_id",
        "value",
        F.date_format("ts", _TS_FMT_US).alias("valid_from"),
        F.date_format(nxt, _TS_FMT_US).alias("valid_to"),
        F.when(nxt.isNull(), F.lit(1)).otherwise(F.lit(0)).cast("long")
        .alias("is_current"),
    )


# --- rolling trailing-24h distinct users ----------------------------------

_ROLL_HOURS = 24
_EPOCH_NTZ = "TIMESTAMP_NTZ '2024-01-01 00:00:00'"
_EPOCH_DUCK = "TIMESTAMP '2024-01-01 00:00:00'"


@register(
    "rolling_active_users_24h",
    oracle=f"""
    WITH hourly AS (
        SELECT DISTINCT
               datediff('hour', {_EPOCH_DUCK}, date_trunc('hour', ts)) AS hb,
               user_id
        FROM events
    ),
    observed AS (SELECT DISTINCT hb FROM hourly),
    contrib AS (
        SELECT hourly.hb + k.k AS target_hb, user_id
        FROM hourly, (SELECT unnest(range({_ROLL_HOURS})) AS k) k
    )
    SELECT strftime({_EPOCH_DUCK} + INTERVAL 1 HOUR * target_hb,
                    '%Y-%m-%d %H:%M:%S') AS window_start,
           count(DISTINCT user_id) AS active_users
    FROM contrib JOIN observed ON observed.hb = contrib.target_hb
    GROUP BY target_hb
    """,
)
def rolling_active_users_24h(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trailing-24-hour distinct active users, evaluated at every observed
    hour — the rolling-engagement KPI (DAU over a sliding day).

    Formulated as a hopping-window fan-out rather than a RANGE window:
    dedup to (hour, user) pairs first (the only cardinality reducer that
    preserves DISTINCT semantics), then each pair contributes to the 24
    hours it keeps the user "active" for, then count-distinct per target
    hour. Scale: the fan-out happens AFTER the dedup, so it is 24× the
    *unique pair* count, not 24× the raw event count; both joins key on
    integer hour buckets; the semi-join against observed hours prunes the
    ragged tail. This is exactly the shape the streaming twin maintains
    incrementally (``streaming/windows.py`` hopping composition).
    """
    ev = load_table(spark, sf_dir, "events")
    hourly = (
        ev.select(
            F.expr(
                f"timestampdiff(HOUR, {_EPOCH_NTZ}, date_trunc('hour', ts))"
            ).alias("hb"),
            "user_id",
        )
        .distinct()
    )
    observed = hourly.select("hb").distinct()
    contrib = (
        hourly.select(
            "hb",
            "user_id",
            F.explode(F.sequence(F.lit(0), F.lit(_ROLL_HOURS - 1))).alias("k"),
        )
        .select((F.col("hb") + F.col("k")).alias("target_hb"), "user_id")
    )
    return (
        contrib.join(observed, contrib["target_hb"] == observed["hb"], "left_semi")
        .groupBy("target_hb")
        .agg(F.count_distinct("user_id").alias("active_users"))
        .select(
            F.date_format(
                F.expr(f"timestampadd(HOUR, target_hb, {_EPOCH_NTZ})"),
                "yyyy-MM-dd HH:mm:ss",
            ).alias("window_start"),
            "active_users",
        )
    )


# --- SemDeDup-style clustered semantic dedup ------------------------------

# Seed centroids (vec_id < K). SemDeDup's scale contract is K GROWS WITH
# THE CORPUS so per-cluster population (and the quadratic within-cluster
# pair stage) stays bounded — the round-7 sf1.0 sweep measured exactly
# the n²/K growth this predicts at fixed K (SCALE.md round-7 table).
# The env knob exists so the scaling study can demonstrate the contract
# (K∝n flattens the curve) without touching the driver-visible default;
# it is read ONCE at import, so the oracle SQL and the Spark plan always
# agree on the same K.
import os as _os

_SEM_K = int(_os.environ.get("SPARK_GRAFT_SEMDEDUP_K", "8"))


@register(
    "dedup_semantic_clusters",
    oracle=f"""
    WITH cent AS (
        SELECT vec_id AS cid, embedding AS cv
        FROM embeddings WHERE vec_id < {_SEM_K}
    ),
    assign AS (
        SELECT vec_id, cid FROM (
            SELECT e.vec_id, cent.cid,
                   row_number() OVER (
                       PARTITION BY e.vec_id
                       ORDER BY round({sim.duck_cosine_expr("e.embedding", "cent.cv")}, 6)
                                DESC, cent.cid
                   ) AS rn
            FROM embeddings e, cent
        ) WHERE rn = 1
    ),
    pairs AS (
        SELECT ax.cid,
               x.vec_id AS a_id, y.vec_id AS b_id,
               round({sim.duck_cosine_expr("x.embedding", "y.embedding")}, 6) AS cosine
        FROM embeddings x
        JOIN assign ax ON x.vec_id = ax.vec_id
        JOIN assign ay ON ay.cid = ax.cid AND ay.vec_id > ax.vec_id
        JOIN embeddings y ON y.vec_id = ay.vec_id
    ),
    top_pair AS (
        SELECT cid, a_id, b_id, cosine FROM (
            SELECT *, row_number() OVER (
                PARTITION BY cid ORDER BY cosine DESC, a_id, b_id
            ) AS rn FROM pairs
        ) WHERE rn = 1
    ),
    sizes AS (SELECT cid, count(*) AS n_members FROM assign GROUP BY cid)
    SELECT sizes.cid, n_members, a_id, b_id, cosine AS top_cosine
    FROM sizes JOIN top_pair ON top_pair.cid = sizes.cid
    """,
)
def dedup_semantic_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup-style semantic dedup (arXiv:2303.09540): assign every
    embedding to its nearest seed centroid, then look for near-duplicates
    only WITHIN a cluster. Reports per-cluster size and the most similar
    intra-cluster pair (the pair a thresholded variant would drop first).

    Scale: the assignment is a broadcast of K centroids against a single
    corpus scan (linear, no shuffle of the corpus); the pair stage
    shuffles once on cluster id and is quadratic only within a cluster —
    SemDeDup's contract is that K grows with corpus size so cluster
    cardinality stays bounded (~N/K docs each). The within-cluster top
    pair comes from one vectorized numpy cosine matrix per cluster (fold
    order preserved — see the pair-stage comment below). Cosines are
    rounded to 6 before every rank so tiebreaks agree across engines.
    """
    # Self-dots are computed ONCE per vector (and once per centroid) and
    # carried; every cosine downstream is then a single 64-d fold instead
    # of three. sqrt(selfdot_a * selfdot_b) multiplies the SAME doubles the
    # inline form would, so results (and the rounded tiebreaks) are
    # bit-identical to the oracle's inline cosine — and the pair stage,
    # the engine's hottest HOF loop, drops ~3× of its flops.
    emb = scale_out(load_table(spark, sf_dir, "embeddings")).select(
        "vec_id",
        "embedding",
        F.expr(sim.dot_expr("embedding", "embedding")).alias("sd"),
    )
    cent = (
        load_table(spark, sf_dir, "embeddings")
        .filter(F.col("vec_id") < _SEM_K)
        .select(
            F.col("vec_id").alias("cid"),
            F.col("embedding").alias("cv"),
            F.expr(sim.dot_expr("embedding", "embedding")).alias("csd"),
        )
    )
    w_assign = Window.partitionBy("vec_id").orderBy(
        F.col("cos_c").desc(), F.col("cid").asc()
    )
    assign = (
        emb.crossJoin(F.broadcast(cent))
        .select(
            "vec_id",
            "embedding",
            "sd",
            "cid",
            F.round(
                F.expr(sim.dot_expr("embedding", "cv"))
                / F.sqrt(F.col("sd") * F.col("csd")),
                6,
            ).alias("cos_c"),
        )
        .withColumn("rn", F.row_number().over(w_assign))
        .filter(F.col("rn") == 1)
        .select("vec_id", "embedding", "sd", "cid")
    )
    # Pair stage: one shuffle on cluster id (groupBy → Arrow), then the
    # within-cluster pair set is scored by the ROW-BLOCKED numpy cosine
    # kernel with the JVM fold order replayed exactly (see
    # operators/similarity.pairwise_cosine_blocked) — bit-identical
    # cosines and tiebreaks to the oracle's inline folds, without
    # |cluster|² interpreted per-pair folds, and with per-task memory
    # capped at block·|cluster| doubles even when a cluster outgrows
    # SemDeDup's K-grows-with-corpus contract (round-7 sf1.0 sweep).
    # Single-member clusters have no pair and emit nothing, matching
    # the oracle's inner join against top_pair. The local binding keeps
    # the kernel closure self-contained (captured by value) — a
    # foreign-cwd driver's workers can't import this package.
    pairwise_blocked = sim.pairwise_cosine_blocked

    def cluster_top_pair(pdf):
        import numpy as np
        import pandas as pd

        n = len(pdf)
        if n < 2:
            return pd.DataFrame(
                columns=["cid", "n_members", "a_id", "b_id", "top_cosine"]
            ).astype(
                {
                    "cid": "int64",
                    "n_members": "int64",
                    "a_id": "int64",
                    "b_id": "int64",
                    "top_cosine": "float64",
                }
            )
        pdf = pdf.sort_values("vec_id")
        ids = pdf["vec_id"].to_numpy()
        # NULL embeddings score NULL cosine against everything (the
        # oracle's fold over a NULL list is NULL); both engines rank NULL
        # below every real cosine under DESC, so a NULL-cosine pair can
        # only win when the cluster has <2 non-NULL embeddings — then the
        # smallest (a_id, b_id) pair wins with a NULL top_cosine, exactly
        # the oracle's row_number tiebreak. Same valid-mask shape as the
        # kNN cell_topk kernel (plans/advanced.py).
        valid = [
            i for i in range(n) if pdf["embedding"].iloc[i] is not None
        ]
        if len(valid) >= 2:
            m = len(valid)
            vids = ids[valid]
            # Blocked scan of the upper triangle: per-task memory stays
            # block·m however large a skewed cluster grows, every double
            # bitwise-equal to the full matrix (pairwise_cosine_blocked).
            # Rows arrive in ascending vec_id and within a row the FIRST
            # maximal column is the smallest b, so strictly-greater
            # updates reproduce max(key=(score, -a, -b)) exactly. NaN
            # (zero-norm) maps to +inf for ranking — Spark's NaN-greatest
            # — while the emitted value keeps the raw NaN.
            best = None  # (rank_key, a_id, b_id, raw_score)
            for s0, M in pairwise_blocked(pdf["embedding"].iloc[valid].to_numpy()):
                ranked = np.where(np.isnan(M), np.inf, M)
                for bi in range(M.shape[0]):
                    i = s0 + bi
                    if i + 1 >= m:
                        continue
                    seg = ranked[bi, i + 1 :]
                    mx = seg.max()
                    if best is None or mx > best[0]:
                        j = i + 1 + int(np.argmax(seg == mx))
                        best = (
                            float(mx),
                            int(vids[i]),
                            int(vids[j]),
                            float(M[bi, j]),
                        )
            a_id, b_id, top = best[1], best[2], best[3]
        else:
            a_id, b_id = int(ids[0]), int(ids[1])
            top = None
        out = pd.DataFrame(
            [(int(pdf["cid"].iloc[0]), n, a_id, b_id)],
            columns=["cid", "n_members", "a_id", "b_id"],
        )
        # object dtype so a None survives Arrow conversion as a true SQL
        # NULL (a float64 column would coerce it to NaN ≠ NULL)
        out["top_cosine"] = pd.Series([top], dtype="object")
        return out

    return assign.groupBy("cid").applyInPandas(
        cluster_top_pair,
        schema="cid long, n_members long, a_id long, b_id long,"
        " top_cosine double",
    )


# --- ANALYZE-style column profile -----------------------------------------


@register(
    "profile_orders_columns",
    oracle="""
    SELECT 'o_orderkey' AS col_name,
           count(*) - count(o_orderkey)     AS n_nulls,
           count(DISTINCT o_orderkey)       AS n_distinct,
           CAST(min(o_orderkey) AS VARCHAR) AS min_val,
           CAST(max(o_orderkey) AS VARCHAR) AS max_val
    FROM orders
    UNION ALL
    SELECT 'o_custkey', count(*) - count(o_custkey), count(DISTINCT o_custkey),
           CAST(min(o_custkey) AS VARCHAR), CAST(max(o_custkey) AS VARCHAR)
    FROM orders
    UNION ALL
    SELECT 'o_orderstatus', count(*) - count(o_orderstatus),
           count(DISTINCT o_orderstatus),
           min(o_orderstatus), max(o_orderstatus)
    FROM orders
    UNION ALL
    SELECT 'o_orderpriority', count(*) - count(o_orderpriority),
           count(DISTINCT o_orderpriority),
           min(o_orderpriority), max(o_orderpriority)
    FROM orders
    """,
)
def profile_orders_columns(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANALYZE-style column profile: null count, distinct count, min/max
    per column (stringified for a uniform schema) — the statistics a
    cost-based optimizer or a data catalog collects.

    Scale: all four columns profile in ONE scan — the per-column
    aggregates compute side by side in a single HashAggregate (the
    UNION-ALL oracle formulation scans 4×), then pivot to long form via
    a tiny literal stack. count(DISTINCT) over multiple columns expands
    to Spark's single-pass multi-distinct plan; for columns where exact
    NDV is not worth the expand, swap in approx_count_distinct
    (`hll_user_sketch_rollup` shows the sketch path).
    """
    orders = load_table(spark, sf_dir, "orders")
    stats = orders.agg(
        F.count(F.lit(1)).alias("n_rows"),
        *[
            e
            for c in ("o_orderkey", "o_custkey", "o_orderstatus", "o_orderpriority")
            for e in (
                F.count(c).alias(f"nn_{c}"),
                F.count_distinct(c).alias(f"nd_{c}"),
                F.min(c).cast("string").alias(f"mn_{c}"),
                F.max(c).cast("string").alias(f"mx_{c}"),
            )
        ],
    )
    return stats.selectExpr(
        """stack(4,
            'o_orderkey', n_rows - nn_o_orderkey, nd_o_orderkey,
                mn_o_orderkey, mx_o_orderkey,
            'o_custkey', n_rows - nn_o_custkey, nd_o_custkey,
                mn_o_custkey, mx_o_custkey,
            'o_orderstatus', n_rows - nn_o_orderstatus, nd_o_orderstatus,
                mn_o_orderstatus, mx_o_orderstatus,
            'o_orderpriority', n_rows - nn_o_orderpriority, nd_o_orderpriority,
                mn_o_orderpriority, mx_o_orderpriority
        ) AS (col_name, n_nulls, n_distinct, min_val, max_val)"""
    )


# --- equal-frequency (decile) binning -------------------------------------


@register(
    "decile_binning_prices",
    oracle="""
    SELECT decile,
           count(*) AS n_orders,
           min(CAST(round(o_totalprice * 100) AS BIGINT)) / 100.0 AS lo_price,
           max(CAST(round(o_totalprice * 100) AS BIGINT)) / 100.0 AS hi_price
    FROM (
        SELECT o_totalprice,
               ntile(10) OVER (ORDER BY o_totalprice, o_orderkey) AS decile
        FROM orders
    )
    GROUP BY decile
    """,
)
def decile_binning_prices(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equal-frequency binning: decile boundaries of order totals — the
    equi-depth complement of `histogram_order_totals` (equi-width), used
    for quantile features and range-partition boundary picking.

    Scale: ntile over a global ORDER BY is a single-partition sort at
    the limit — correct here because the output is 10 rows and the sort
    input is the (price, key) projection only. At 100 TB swap the exact
    global ntile for approx percentile boundaries (the engine carries
    both: `approx_percentile_value`) and keep this exact form for
    partition-local binning. Tie order (price, orderkey) fixes bin
    membership deterministically; bounds surface as exact cents.
    """
    orders = load_table(spark, sf_dir, "orders")
    w = Window.orderBy("o_totalprice", "o_orderkey")
    cents = F.round(F.col("o_totalprice") * 100).cast("long")
    return (
        orders.select(
            cents.alias("cents"), F.ntile(10).over(w).cast("long").alias("decile")
        )
        .groupBy("decile")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            (F.min("cents") / 100.0).alias("lo_price"),
            (F.max("cents") / 100.0).alias("hi_price"),
        )
    )


# --- chi-square independence (drift detection) ----------------------------


@register(
    "chisq_type_by_daypart",
    oracle="""
    WITH obs AS (
        SELECT event_type,
               CAST(floor(extract(hour FROM ts) / 6) AS BIGINT) AS daypart,
               count(*) AS o
        FROM events GROUP BY 1, 2
    ),
    margins AS (
        SELECT obs.*,
               sum(o) OVER (PARTITION BY event_type) AS row_total,
               sum(o) OVER (PARTITION BY daypart)    AS col_total,
               sum(o) OVER ()                        AS grand
        FROM obs
    )
    SELECT round(sum(pow(o - row_total * col_total / CAST(grand AS DOUBLE), 2)
                     / (row_total * col_total / CAST(grand AS DOUBLE))), 6)
               AS chi2,
           count(*) AS n_cells,
           CAST(max(grand) AS BIGINT) AS n_events
    FROM margins
    """,
)
def chisq_type_by_daypart(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Chi-square independence statistic between event type and 6-hour
    daypart — the drift/seasonality detector a monitoring pipeline runs
    on categorical distributions (a large chi2 means the type mix moves
    with time of day).

    Scale: the contingency table collapses map-side to |types|×4 cells;
    every window (row/column/grand totals) runs over that matrix-sized
    relation, never the event stream. One event-sized shuffle total. The
    statistic is a continuous sum of ratios — round(…, 6) is
    boundary-safe.
    """
    ev = load_table(spark, sf_dir, "events")
    obs = (
        ev.select(
            "event_type",
            F.floor(F.hour("ts") / 6).cast("long").alias("daypart"),
        )
        .groupBy("event_type", "daypart")
        .agg(F.count(F.lit(1)).alias("o"))
    )
    w_row = Window.partitionBy("event_type")
    w_col = Window.partitionBy("daypart")
    w_all = Window.partitionBy()
    margins = obs.select(
        "o",
        F.sum("o").over(w_row).alias("row_total"),
        F.sum("o").over(w_col).alias("col_total"),
        F.sum("o").over(w_all).alias("grand"),
    )
    expected = F.col("row_total") * F.col("col_total") / F.col("grand").cast(
        "double"
    )
    return margins.agg(
        F.round(
            F.sum(F.pow(F.col("o") - expected, 2) / expected), 6
        ).alias("chi2"),
        F.count(F.lit(1)).alias("n_cells"),
        F.max("grand").alias("n_events"),
    )


# --- key-skew diagnostic --------------------------------------------------


@register(
    "skew_profile_lineitem_orderkey",
    oracle="""
    WITH sizes AS (
        SELECT l_orderkey, count(*) AS rows_per_key
        FROM lineitem GROUP BY l_orderkey
    )
    SELECT count(*)                                   AS n_keys,
           max(rows_per_key)                          AS max_rows,
           round(avg(rows_per_key), 6)                AS avg_rows,
           round(quantile_cont(rows_per_key, 0.99), 6) AS p99_rows,
           round(max(rows_per_key) / avg(rows_per_key), 6) AS skew_ratio
    FROM sizes
    """,
)
def skew_profile_lineitem_orderkey(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Join/shuffle-key skew profile: per-key row counts summarized to
    max / avg / p99 and the skew ratio — the diagnostic that decides
    whether a key needs salting (`operators/skew.py`) or AQE skew-join
    splitting before a 100 TB shuffle is attempted.

    Scale: one shuffle keyed by the candidate key with map-side combine
    (the per-key count), then a global 1-row summary; the exact p99 over
    key sizes shuffles only the |keys|-sized relation.
    """
    li = load_table(spark, sf_dir, "lineitem")
    sizes = li.groupBy("l_orderkey").agg(F.count(F.lit(1)).alias("rows_per_key"))
    return sizes.agg(
        F.count(F.lit(1)).alias("n_keys"),
        F.max("rows_per_key").alias("max_rows"),
        F.round(F.avg("rows_per_key"), 6).alias("avg_rows"),
        F.round(F.expr("percentile(rows_per_key, 0.99)"), 6).alias("p99_rows"),
        F.round(
            F.max("rows_per_key") / F.avg("rows_per_key"), 6
        ).alias("skew_ratio"),
    )


# --- regression / boolean aggregate completeness --------------------------


@register(
    "stats_regression_lineitem",
    oracle="""
    SELECT round(regr_slope(l_extendedprice, l_quantity), 6)     AS slope,
           round(regr_intercept(l_extendedprice, l_quantity), 4) AS intercept,
           round(regr_r2(l_extendedprice, l_quantity), 6)        AS r2,
           CAST(regr_count(l_extendedprice, l_quantity) AS BIGINT) AS n,
           CAST(coalesce(count_if(l_discount > 0.05), 0) AS BIGINT) AS n_high_disc,
           bool_and(l_quantity > 0)                              AS all_qty_pos,
           bool_or(l_discount = 0)                               AS any_zero_disc
    FROM lineitem
    """,
)
def stats_regression_lineitem(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Linear-regression and boolean aggregates (§2.4 completeness):
    OLS slope/intercept/R² of price against quantity plus count_if /
    bool_and / bool_or — the one-pass fit a drift monitor or a quick
    EDA cell computes.

    Scale: all seven are single-pass streaming aggregates with exact
    partial+final merge (regr_* ride the same co-moment machinery as
    corr) — one scan, 1-row output. Regression outputs are continuous;
    round(…, k) is boundary-safe.
    """
    li = load_table(spark, sf_dir, "lineitem")
    return li.agg(
        F.round(F.expr("regr_slope(l_extendedprice, l_quantity)"), 6).alias(
            "slope"
        ),
        F.round(F.expr("regr_intercept(l_extendedprice, l_quantity)"), 4).alias(
            "intercept"
        ),
        F.round(F.expr("regr_r2(l_extendedprice, l_quantity)"), 6).alias("r2"),
        F.expr("regr_count(l_extendedprice, l_quantity)").cast("long").alias("n"),
        F.expr("count_if(l_discount > 0.05)").alias("n_high_disc"),
        F.expr("bool_and(l_quantity > 0)").alias("all_qty_pos"),
        F.expr("bool_or(l_discount = 0)").alias("any_zero_disc"),
    )


# --- exact equi-depth deciles -------------------------------------------------------


@register(
    "equidepth_deciles_order_total",
    oracle="""
    WITH vd AS (
        SELECT CAST(round(o_totalprice * 100) AS BIGINT) AS cents,
               CAST(count(*) AS BIGINT) AS cnt
        FROM orders GROUP BY 1
    ),
    cum AS (
        SELECT cents,
               CAST(sum(cnt) OVER (ORDER BY cents
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                    AS BIGINT) AS cum,
               CAST(sum(cnt) OVER () AS BIGINT) AS n
        FROM vd
    ),
    ks AS (SELECT unnest(range(1, 10)) AS k)
    SELECT k,
           CAST(min(cents) AS BIGINT) AS boundary_cents,
           min(n) AS n_orders
    FROM ks JOIN cum ON cum.cum * 10 >= k * cum.n
    GROUP BY k
    """,
)
def equidepth_deciles_order_total(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT equi-depth deciles of the order-total distribution — the
    profiling twin of ``histogram_order_totals`` (equi-width) and the
    exact ground truth the GK sketch (``approx_percentile_value``)
    approximates. Boundary k is the smallest value whose cumulative count
    reaches k·n/10 (the lower-decile convention of
    ``weighted_median_quantity``, generalized to all nine cuts).

    Exactness: totals collapse to an int64-cents VALUE-DOMAIN rollup;
    the cumulative is an integer window sum and every comparison is the
    cross-multiplied integer test ``cum·10 ≥ k·n`` — no division, no
    float anywhere. Scale: the window and the 9-way band join run over
    |distinct cents| rows, never the fact table; at 100 TB the rollup is
    bounded by the value grid (and the same plan accepts a coarser grid —
    round to dollars — if even that is too wide).
    """
    orders = load_table(spark, sf_dir, "orders")
    vd = orders.groupBy(
        F.expr("CAST(round(o_totalprice * 100) AS BIGINT)").alias("cents")
    ).agg(F.count(F.lit(1)).cast("long").alias("cnt"))
    w = Window.orderBy("cents")
    cum = vd.select(
        "cents",
        F.sum("cnt")
        .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
        .cast("long")
        .alias("cum"),
        F.sum("cnt")
        .over(Window.partitionBy())
        .cast("long")
        .alias("n"),
    )
    ks = spark.range(1, 10).select(F.col("id").alias("k"))
    return (
        F.broadcast(ks)
        .join(cum, F.col("cum") * 10 >= F.col("k") * F.col("n"))
        .groupBy("k")
        .agg(
            F.min("cents").cast("long").alias("boundary_cents"),
            F.min("n").alias("n_orders"),
        )
    )


# --- right-to-erasure impact audit -------------------------------------------

_ERASE_MOD = 97  # deterministic erasure cohort: user_id % 97 == 0


@register(
    "user_erasure_audit",
    oracle=f"""
    SELECT event_type,
           CAST(count(*) FILTER (WHERE user_id % {_ERASE_MOD} = 0)
                AS BIGINT) AS n_rows_erased,
           CAST(count(DISTINCT CASE WHEN user_id % {_ERASE_MOD} = 0
                                    THEN user_id END) AS BIGINT)
               AS n_users_erased,
           CAST(count(*) FILTER (WHERE user_id % {_ERASE_MOD} = 0)
                * 1000000 // count(*) AS BIGINT) AS share_ppm,
           strftime(min(CASE WHEN user_id % {_ERASE_MOD} = 0 THEN ts END),
                    '{_TS_FMT_US_DUCK}') AS first_erased_ts,
           strftime(max(CASE WHEN user_id % {_ERASE_MOD} = 0 THEN ts END),
                    '{_TS_FMT_US_DUCK}') AS last_erased_ts
    FROM events
    GROUP BY event_type
    """,
)
def user_erasure_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Right-to-erasure (GDPR Art. 17) impact report: before deleting a
    user cohort, quantify the blast radius per event type — rows and
    distinct users to be erased, the ppm share of each type's volume,
    and the affected time range. The cohort here is the deterministic
    ``user_id % 97 == 0`` stand-in for an erasure-request list.

    Scale: a single conditional-aggregation pass over the fact table —
    one map-side-combinable shuffle on ``event_type``, no join with the
    request list (at 100 TB the request list broadcasts as a filter or
    Bloom filter instead of the modulus predicate; the aggregate shape
    is identical). Share is exact integer ppm.
    """
    ev = load_table(spark, sf_dir, "events")
    erased = F.col("user_id") % _ERASE_MOD == 0
    return ev.groupBy("event_type").agg(
        F.count(F.when(erased, 1)).cast("long").alias("n_rows_erased"),
        F.count_distinct(F.when(erased, F.col("user_id")))
        .cast("long")
        .alias("n_users_erased"),
        F.expr(
            f"CAST(count(CASE WHEN user_id % {_ERASE_MOD} = 0 THEN 1 END)"
            " * 1000000 DIV count(*) AS BIGINT)"
        ).alias("share_ppm"),
        F.date_format(F.min(F.when(erased, F.col("ts"))), _TS_FMT_US).alias(
            "first_erased_ts"
        ),
        F.date_format(F.max(F.when(erased, F.col("ts"))), _TS_FMT_US).alias(
            "last_erased_ts"
        ),
    )
