"""Sequence / temporal analytics over the event log (SURVEY.md §2.9 depth).

The reference's domain is ordered per-key event streams; this module adds
the sequence-shaped analytics a product or telemetry team runs on top of
the windowing core in ``plans/events.py``:

- session path mining (which ordered journeys happen, how often),
- first-order transition matrix (the Markov view of the same journeys),
- calendar gap-filling / resampling (dense hourly series from sparse
  events — the feature-store prerequisite),
- robust outlier detection (median/MAD — immune to the heavy tails that
  poison the z-score variant in ``plans/analytics.py``).

House rules as everywhere (SURVEY.md §5.2): identical aliases both sides,
deterministic tiebreaks (ts, event_id), floats rounded identically or kept
exact, timestamps surfaced as formatted strings.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from kafka_streams_tcp_reconciliation_spark.plans import register
from kafka_streams_tcp_reconciliation_spark.sources.tables import load_table

_TS_FMT = "yyyy-MM-dd HH:mm:ss"
_TS_FMT_DUCK = "%Y-%m-%d %H:%M:%S"
_GAP_MIN = 30  # session gap, minutes — same knob as session_window_stats


# --- session path mining ---------------------------------------------------


@register(
    "session_event_paths",
    oracle=f"""
    WITH flagged AS (
        SELECT user_id, ts, event_id, event_type,
               CASE WHEN lag(ts) OVER w IS NULL
                         OR ts - lag(ts) OVER w >= INTERVAL '{_GAP_MIN} minutes'
                    THEN 1 ELSE 0 END AS new_session
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ),
    sessions AS (
        SELECT *, sum(new_session) OVER (
            PARTITION BY user_id ORDER BY ts, event_id
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
        ) AS session_id
        FROM flagged
    ),
    paths AS (
        SELECT user_id, session_id,
               string_agg(event_type, '>' ORDER BY ts, event_id) AS path
        FROM sessions GROUP BY user_id, session_id
    )
    SELECT path,
           count(*) AS n_sessions,
           count(DISTINCT user_id) AS n_users
    FROM paths GROUP BY path
    """,
)
def session_event_paths(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Session path mining: sessionize on a 30-minute inactivity gap, then
    count each ordered event-type journey ("view>click>purchase") across
    sessions and users.

    Scale: ONE shuffle on user_id feeds both stacked windows (gap flag +
    running session id — same sort order, Catalyst reuses the exchange
    and sort); the path build is a per-(user, session) aggregate that
    collects only event-type tokens (bytes per event, not rows), and the
    final path rollup is map-side combinable. Path cardinality is bounded
    by journey diversity, not event count. Ordering inside the path is
    (ts, event_id) — deterministic under same-timestamp events.
    """
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gap_ok = (F.col("ts") - F.lag("ts").over(w)) >= F.expr(
        f"INTERVAL {_GAP_MIN} MINUTES"
    )
    flagged = ev.select(
        "user_id",
        "ts",
        "event_id",
        "event_type",
        F.when(F.lag("ts").over(w).isNull() | gap_ok, F.lit(1))
        .otherwise(F.lit(0))
        .alias("new_session"),
    )
    sessions = flagged.withColumn(
        "session_id",
        F.sum("new_session").over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ),
    )
    paths = (
        sessions.groupBy("user_id", "session_id")
        .agg(
            F.array_join(
                F.transform(
                    F.sort_array(
                        F.collect_list(F.struct("ts", "event_id", "event_type"))
                    ),
                    lambda s: s["event_type"],
                ),
                ">",
            ).alias("path")
        )
    )
    return paths.groupBy("path").agg(
        F.count(F.lit(1)).alias("n_sessions"),
        F.count_distinct("user_id").alias("n_users"),
    )


# --- first-order transition matrix ----------------------------------------


@register(
    "event_transition_matrix",
    oracle="""
    WITH seq AS (
        SELECT user_id, event_type AS to_type,
               lag(event_type) OVER (
                   PARTITION BY user_id ORDER BY ts, event_id
               ) AS from_type
        FROM events
    ),
    counts AS (
        SELECT from_type, to_type, count(*) AS n
        FROM seq WHERE from_type IS NOT NULL
        GROUP BY from_type, to_type
    )
    SELECT from_type, to_type, n,
           round(CAST(n AS DOUBLE)
                 / sum(n) OVER (PARTITION BY from_type), 6) AS p
    FROM counts
    """,
)
def event_transition_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-order Markov transition matrix of per-user event sequences:
    for each (from, to) event-type pair, the transition count and its
    row-normalized probability.

    Scale: lag() is one shuffle on user_id with O(1) per-row state; the
    count rollup collapses to at most |types|² groups map-side, so the
    normalizing window runs over a matrix-sized (not event-sized)
    relation. The probability divide happens once per matrix cell —
    continuous value, round(…, 6) is cross-engine safe.
    """
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = ev.select(
        F.lag("event_type").over(w).alias("from_type"),
        F.col("event_type").alias("to_type"),
    ).filter(F.col("from_type").isNotNull())
    counts = seq.groupBy("from_type", "to_type").agg(F.count(F.lit(1)).alias("n"))
    w_row = Window.partitionBy("from_type")
    return counts.select(
        "from_type",
        "to_type",
        "n",
        F.round(F.col("n").cast("double") / F.sum("n").over(w_row), 6).alias("p"),
    )


# --- calendar gap-fill / resample -----------------------------------------

_EPOCH_NTZ = "TIMESTAMP_NTZ '2024-01-01 00:00:00'"
_EPOCH_DUCK = "TIMESTAMP '2024-01-01 00:00:00'"


@register(
    "events_gapfill_hourly",
    oracle=f"""
    WITH bounds AS (
        SELECT datediff('hour', {_EPOCH_DUCK}, date_trunc('hour', min(ts))) AS lo,
               datediff('hour', {_EPOCH_DUCK}, date_trunc('hour', max(ts))) AS hi
        FROM events
    ),
    spine AS (
        SELECT unnest(range(lo, hi + 1)) AS hb FROM bounds
    ),
    types AS (SELECT DISTINCT event_type FROM events),
    counts AS (
        SELECT datediff('hour', {_EPOCH_DUCK}, date_trunc('hour', ts)) AS hb,
               event_type, count(*) AS c
        FROM events GROUP BY 1, 2
    )
    SELECT strftime({_EPOCH_DUCK} + INTERVAL 1 HOUR * spine.hb,
                    '{_TS_FMT_DUCK}') AS window_start,
           types.event_type,
           coalesce(c, 0) AS n_events
    FROM spine
    CROSS JOIN types
    LEFT JOIN counts ON counts.hb = spine.hb
                    AND counts.event_type = types.event_type
    """,
)
def events_gapfill_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Resample the event log to a DENSE hourly series per event type:
    every hour between the global min and max gets a row, zero-filled
    where no events landed — the gap-filling pass a feature store or
    forecasting job needs before lag-based features.

    Scale: the raw counts collapse map-side to (hour, type) granularity
    BEFORE any join; the spine (hours × types) is generated from a 1-row
    bounds aggregate — its size is calendar-bounded (8.8k rows/year/type),
    so the fill join is a broadcast of spine-sized relations regardless of
    event volume. No event-sized relation crosses a second exchange.
    """
    ev = load_table(spark, sf_dir, "events")
    hb = F.expr(f"timestampdiff(HOUR, {_EPOCH_NTZ}, date_trunc('hour', ts))")
    counts = (
        ev.select(hb.alias("hb"), "event_type")
        .groupBy("hb", "event_type")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    bounds = ev.agg(
        F.expr(f"timestampdiff(HOUR, {_EPOCH_NTZ}, date_trunc('hour', min(ts)))").alias(
            "lo"
        ),
        F.expr(f"timestampdiff(HOUR, {_EPOCH_NTZ}, date_trunc('hour', max(ts)))").alias(
            "hi"
        ),
    )
    spine = bounds.select(
        F.explode(F.sequence(F.col("lo"), F.col("hi"))).alias("hb")
    )
    types = ev.select("event_type").distinct()
    dense = spine.crossJoin(types)
    return (
        dense.join(F.broadcast(counts), ["hb", "event_type"], "left")
        .select(
            F.date_format(
                F.expr(f"timestampadd(HOUR, hb, {_EPOCH_NTZ})"), _TS_FMT
            ).alias("window_start"),
            "event_type",
            F.coalesce(F.col("c"), F.lit(0)).alias("n_events"),
        )
    )


# --- robust (median/MAD) outlier detection --------------------------------

_MAD_K = 1.4826  # consistency constant: MAD × k estimates σ under normality
_MAD_Z = 3.0


@register(
    "events_mad_outliers",
    oracle=f"""
    WITH med AS (
        SELECT event_type, quantile_cont(value, 0.5) AS med
        FROM events GROUP BY event_type
    ),
    mad AS (
        SELECT e.event_type, med,
               quantile_cont(abs(e.value - med), 0.5) AS mad
        FROM events e JOIN med ON e.event_type = med.event_type
        GROUP BY e.event_type, med
    )
    SELECT e.event_id, e.event_type, e.value,
           round((e.value - mad.med) / ({_MAD_K} * mad.mad), 6) AS robust_z
    FROM events e JOIN mad ON e.event_type = mad.event_type
    WHERE mad.mad <> 0
      AND abs((e.value - mad.med) / ({_MAD_K} * mad.mad)) > {_MAD_Z}
    """,
)
def events_mad_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robust per-type outliers: flag events whose value deviates from the
    type median by more than 3 robust sigmas (1.4826 × MAD). Unlike the
    z-score twin (``value_zscore_outliers``), the median/MAD scale is not
    dragged by the outliers it is trying to find.

    Scale: two aggregate passes (median, then median-of-deviations), each
    collapsing to |types| rows, then the tiny stats relation broadcasts
    back onto the scan for the flag filter — event-sized data shuffles on
    event_type twice (the exact-percentile shuffles) and never joins
    shuffled. Exact interpolated percentiles cross-check between engines
    (proven by ``percentile_value_by_user``); the robust_z divide is
    continuous, so round(…, 6) is boundary-safe.
    """
    ev = load_table(spark, sf_dir, "events")
    med = ev.groupBy("event_type").agg(
        F.expr("percentile(value, 0.5)").alias("med")
    )
    mad = (
        ev.join(F.broadcast(med), "event_type")
        .groupBy("event_type", "med")
        .agg(F.expr("percentile(abs(value - med), 0.5)").alias("mad"))
    )
    rz = (F.col("value") - F.col("med")) / (_MAD_K * F.col("mad"))
    return (
        ev.join(F.broadcast(mad), "event_type")
        # MAD=0 (a majority-constant group) -> robust z undefined; by the
        # same convention as sigma=0, nothing is flagged
        .filter((F.col("mad") != 0) & (F.abs(rz) > _MAD_Z))
        .select(
            "event_id",
            "event_type",
            "value",
            F.round(rz, 6).alias("robust_z"),
        )
    )


# --- point-in-time (feature-store) join -----------------------------------


@register(
    "pit_click_purchase_context",
    oracle="""
    SELECT click_id, user_id, ctx_purchase_id, ctx_value
    FROM (
        SELECT c.event_id AS click_id,
               c.user_id,
               p.event_id AS ctx_purchase_id,
               p.value    AS ctx_value,
               row_number() OVER (
                   PARTITION BY c.event_id
                   ORDER BY p.ts DESC, p.event_id DESC
               ) AS rn
        FROM events c
        JOIN events p
          ON p.user_id = c.user_id
         AND p.event_type = 'purchase'
         AND p.ts <= c.ts
        WHERE c.event_type = 'click'
    )
    WHERE rn = 1
    """,
)
def pit_click_purchase_context(
    spark: SparkSession, sf_dir: str, events: DataFrame | None = None
) -> DataFrame:
    """Point-in-time join (the feature-store lookup): each click is
    enriched with the user's purchase state AS OF the click's event time
    — no leakage from future purchases. The inverse direction of
    ``asof_last_click_before_purchase``, composed from the same
    union-and-carry operator.

    Scale: one shuffle on user_id, single ordered pass, O(1) carry state
    — the quadratic join+rank in the oracle is the semantics spec, not
    the plan. This is how training-feature extraction must read mutable
    state at 100 TB (joining the current dimension row would leak).

    ``events`` overrides the table scan for the ``*_deduped`` composition.
    """
    from kafka_streams_tcp_reconciliation_spark.operators.joins import asof_join

    ev = events if events is not None else load_table(spark, sf_dir, "events")
    clicks = ev.filter(F.col("event_type") == "click")
    purchases = ev.filter(F.col("event_type") == "purchase")
    out = asof_join(
        clicks,
        purchases,
        ["user_id"],
        "ts",
        "ts",
        right_value_cols=["event_id", "value"],
        tiebreak="event_id",
    )
    return out.select(
        F.col("event_id").alias("click_id"),
        "user_id",
        F.col("asof_event_id").alias("ctx_purchase_id"),
        F.col("asof_value").alias("ctx_value"),
    )


# --- exponentially time-decayed aggregate ---------------------------------

_EWMA_TAU_S = 86_400  # decay time-constant: 1 day


@register(
    "ewma_value_by_user",
    oracle=f"""
    WITH anchored AS (
        SELECT user_id, value,
               date_diff('microseconds', ts,
                         max(ts) OVER (PARTITION BY user_id)) AS age_us
        FROM events
    )
    SELECT user_id,
           round(sum(value * exp(-age_us / ({_EWMA_TAU_S}.0 * 1e6)))
                 / sum(exp(-age_us / ({_EWMA_TAU_S}.0 * 1e6))), 6)
               AS ewma_value,
           count(*) AS n_events
    FROM anchored
    GROUP BY user_id
    """,
)
def ewma_value_by_user(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exponentially time-decayed mean of `value` per user (1-day decay
    constant, anchored at each user's latest event): recent activity
    dominates — the recency-weighted profile feature a ranking or
    anomaly model consumes.

    Formulated as commutative weighted sums (sum w·v / sum w with
    w = exp(-age/τ)) rather than the sequential EWMA recurrence, so it
    is one shuffle (the max-ts window and the aggregate share the
    user_id exchange) and needs no ordered pass; round(…, 6) absorbs
    summation-order ulps (weights are continuous — no boundary risk).
    Ages are exact integer MICROSECONDS on both sides (DuckDB's
    date_diff counts boundary crossings, Spark counts complete units —
    they agree only at the native µs precision), so the exp() arguments
    are identical doubles across engines.
    """
    ev = load_table(spark, sf_dir, "events")
    w_user = Window.partitionBy("user_id")
    age_us = F.expr("timestampdiff(MICROSECOND, ts, max_ts)")
    weight = F.exp(-age_us / F.lit(_EWMA_TAU_S * 1e6))
    return (
        ev.select(
            "user_id", "value", "ts", F.max("ts").over(w_user).alias("max_ts")
        )
        .select("user_id", "value", weight.alias("w"))
        .groupBy("user_id")
        .agg(
            F.round(
                F.sum(F.col("value") * F.col("w")) / F.sum("w"), 6
            ).alias("ewma_value"),
            F.count(F.lit(1)).alias("n_events"),
        )
    )


# --- windowed funnel attribution ------------------------------------------

_ATTR_WINDOW = "1 hour"
_ATTR_WINDOW_DUCK = "INTERVAL '1 hour'"


@register(
    "funnel_attribution_windowed",
    oracle=f"""
    WITH s1 AS (
        SELECT p.event_id AS purchase_id, p.user_id, p.ts AS p_ts,
               c.event_id AS click_id, c.ts AS c_ts,
               row_number() OVER (
                   PARTITION BY p.event_id ORDER BY c.ts DESC, c.event_id DESC
               ) AS rn
        FROM events p
        JOIN events c
          ON c.user_id = p.user_id AND c.event_type = 'click' AND c.ts <= p.ts
        WHERE p.event_type = 'purchase'
    ),
    st1 AS (
        SELECT * FROM s1 WHERE rn = 1 AND p_ts - c_ts <= {_ATTR_WINDOW_DUCK}
    ),
    s2 AS (
        SELECT st1.purchase_id, st1.user_id, st1.click_id, st1.c_ts,
               v.event_id AS view_id, v.ts AS v_ts,
               row_number() OVER (
                   PARTITION BY st1.purchase_id
                   ORDER BY v.ts DESC, v.event_id DESC
               ) AS rn2
        FROM st1
        JOIN events v
          ON v.user_id = st1.user_id AND v.event_type = 'view'
         AND v.ts <= st1.c_ts
    )
    SELECT purchase_id, user_id, click_id, view_id
    FROM s2 WHERE rn2 = 1 AND c_ts - v_ts <= {_ATTR_WINDOW_DUCK}
    """,
)
def funnel_attribution_windowed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Last-touch funnel attribution: each purchase attributes to the
    LATEST click at or before it (within 1 hour), which attributes to
    the LATEST view at or before THAT click (within 1 hour) — strict
    last-touch: if the last touch is outside its window the purchase
    drops out (no falling back to an older in-window touch).

    Implemented as TWO composed as-of joins (union-and-carry — one
    shuffle each), with the window applied as a post-filter on the
    carried timestamp. The oracle states the same semantics with nested
    rank subqueries (quadratic — the spec, not the plan). Streaming twin
    `streaming/sequences.funnel_attribution_stream`: ONE per-user FSM
    with three O(1) state slots.
    """
    from kafka_streams_tcp_reconciliation_spark.operators.joins import asof_join

    ev = load_table(spark, sf_dir, "events")
    p = ev.filter(F.col("event_type") == "purchase").select(
        "user_id", F.col("event_id").alias("purchase_id"), "ts"
    )
    c = ev.filter(F.col("event_type") == "click").select(
        "user_id", "event_id", "ts"
    )
    v = ev.filter(F.col("event_type") == "view").select(
        "user_id", "event_id", "ts"
    )
    win = F.expr(f"INTERVAL {_ATTR_WINDOW}")
    s1 = (
        asof_join(p, c, ["user_id"], "ts", "ts",
                  right_value_cols=["event_id", "ts"], tiebreak="event_id")
        .filter(F.col("ts") - F.col("asof_ts") <= win)
        .select(
            "user_id",
            "purchase_id",
            F.col("asof_event_id").alias("click_id"),
            F.col("asof_ts").alias("ts"),  # probe ts for stage 2 = click ts
        )
    )
    return (
        asof_join(s1, v, ["user_id"], "ts", "ts",
                  right_value_cols=["event_id", "ts"], tiebreak="event_id")
        .filter(F.col("ts") - F.col("asof_ts") <= win)
        .select(
            "purchase_id",
            "user_id",
            "click_id",
            F.col("asof_event_id").alias("view_id"),
        )
    )


# --- growth analytics: acquisition, churn, latency ------------------------


@register(
    "cumulative_new_users_daily",
    oracle="""
    WITH first_seen AS (
        SELECT user_id, strftime(date_trunc('day', min(ts)), '%Y-%m-%d') AS day
        FROM events GROUP BY user_id
    ),
    daily AS (
        SELECT day, count(*) AS new_users FROM first_seen GROUP BY day
    )
    SELECT day, new_users,
           CAST(sum(new_users) OVER (
               ORDER BY day
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
           ) AS BIGINT) AS cumulative_users
    FROM daily
    """,
)
def cumulative_new_users_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """User-acquisition curve: per day, the count of users seen for the
    FIRST time, plus the running cumulative total — the growth chart
    every product review starts with.

    Scale: first-seen collapses to one row per user (map-side combinable
    min), the daily rollup to one row per day; the running total windows
    over the day-sized relation only. The global-order cumulative window
    is a single partition of O(days) rows — calendar-bounded, never
    data-bounded.
    """
    ev = load_table(spark, sf_dir, "events")
    first_seen = (
        ev.groupBy("user_id")
        .agg(F.min("ts").alias("first_ts"))
        .select(
            F.date_format(F.date_trunc("day", "first_ts"), "yyyy-MM-dd").alias(
                "day"
            )
        )
    )
    daily = first_seen.groupBy("day").agg(F.count(F.lit(1)).alias("new_users"))
    w = Window.orderBy("day").rowsBetween(Window.unboundedPreceding, Window.currentRow)
    return daily.select(
        "day",
        "new_users",
        F.sum("new_users").over(w).alias("cumulative_users"),
    )


_CHURN_DAYS = 7


@register(
    "churned_users",
    oracle=f"""
    WITH horizon AS (SELECT max(ts) AS max_ts FROM events),
    last_seen AS (
        SELECT user_id, max(ts) AS last_ts, count(*) AS lifetime_events
        FROM events GROUP BY user_id
    )
    SELECT user_id,
           strftime(last_ts, '%Y-%m-%d %H:%M:%S.%f') AS last_seen,
           lifetime_events
    FROM last_seen, horizon
    WHERE last_ts < max_ts - INTERVAL '{_CHURN_DAYS} days'
    """,
)
def churned_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Churn detection: users with NO activity in the trailing
    {7}-day window of the observed data — the retention complement of
    `rolling_active_users_24h`.

    Scale: per-user last-seen is one map-side-combinable aggregate; the
    data horizon is a 1-row broadcast; the churn test is a narrow filter
    on the |users|-sized relation. Anchoring on max(ts) (not wall clock)
    keeps the query deterministic and replayable.
    """
    ev = load_table(spark, sf_dir, "events")
    horizon = ev.agg(F.max("ts").alias("max_ts"))
    last_seen = ev.groupBy("user_id").agg(
        F.max("ts").alias("last_ts"), F.count(F.lit(1)).alias("lifetime_events")
    )
    return (
        last_seen.crossJoin(F.broadcast(horizon))
        .filter(
            F.col("last_ts")
            < F.col("max_ts") - F.expr(f"INTERVAL {_CHURN_DAYS} DAYS")
        )
        .select(
            "user_id",
            F.date_format("last_ts", _TS_FMT + ".SSSSSS").alias("last_seen"),
            "lifetime_events",
        )
    )


@register(
    "fulfillment_latency_histogram",
    oracle="""
    SELECT latency_days, count(*) AS n_orders
    FROM (
        SELECT CAST(date_diff('day', o.o_orderdate, max(l.l_shipdate))
                    AS BIGINT) AS latency_days
        FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
        GROUP BY o.o_orderkey, o.o_orderdate
    )
    GROUP BY latency_days
    """,
)
def fulfillment_latency_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Order-fulfillment latency distribution: days from order date to
    the LAST line shipment, histogrammed — the operational-SLA view of
    the orders↔lineitem join.

    Scale: the join keys on l_orderkey (the natural co-partition key —
    bucketed layouts make it exchange-free, `sources/bucketing.py`);
    per-order max is map-side combinable; the histogram collapses to
    O(distinct latencies) groups. Day arithmetic on date-truncated
    values — integer on both engines.
    """
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderdate"
    )
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    per_order = (
        orders.join(li, orders["o_orderkey"] == li["l_orderkey"])
        .groupBy("o_orderkey", "o_orderdate")
        .agg(F.max("l_shipdate").alias("last_ship"))
        .select(
            F.expr("timestampdiff(DAY, o_orderdate, last_ship)")
            .cast("long")
            .alias("latency_days")
        )
    )
    return per_order.groupBy("latency_days").agg(
        F.count(F.lit(1)).alias("n_orders")
    )


# --- daily growth accounting (new / retained / resurrected) -------------------------

_RESURRECT_GAP_DAYS = 7  # inactivity gap that turns a return into a resurrection


@register(
    "growth_accounting_daily",
    oracle=f"""
    WITH active AS (
        SELECT DISTINCT user_id, CAST(ts AS DATE) AS d FROM events
    ),
    classed AS (
        SELECT d,
               CASE
                   WHEN lag(d) OVER (PARTITION BY user_id ORDER BY d) IS NULL
                       THEN 'new'
                   WHEN date_diff('day',
                        lag(d) OVER (PARTITION BY user_id ORDER BY d), d)
                        > {_RESURRECT_GAP_DAYS}
                       THEN 'resurrected'
                   ELSE 'retained'
               END AS status
        FROM active
    )
    SELECT strftime(d, '%Y-%m-%d') AS day,
           CAST(count(*) FILTER (WHERE status = 'new') AS BIGINT) AS n_new,
           CAST(count(*) FILTER (WHERE status = 'retained') AS BIGINT)
               AS n_retained,
           CAST(count(*) FILTER (WHERE status = 'resurrected') AS BIGINT)
               AS n_resurrected,
           CAST(count(*) AS BIGINT) AS n_active
    FROM classed GROUP BY d
    """,
)
def growth_accounting_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily growth accounting: every active user classified as NEW (first
    day ever), RETAINED (active within the last 7 days), or RESURRECTED
    (returned after a 7+ day gap) — the standard DAU decomposition
    (new + retained + resurrected = active) behind every growth dashboard,
    complementing ``churned_users`` (the outflow side) and
    ``cumulative_new_users_daily`` (new only).

    Exactness: pure date arithmetic and counts. Scale: events collapse to
    DISTINCT (user, day) first (map-side combinable); the lag runs per
    user over that collapsed series (ONE user_id shuffle, ≤ |days| rows
    per user); the final rollup is |days| rows.
    """
    ev = load_table(spark, sf_dir, "events")
    active = ev.select(
        "user_id", F.col("ts").cast("date").alias("d")
    ).distinct()
    lag_d = F.lag("d").over(Window.partitionBy("user_id").orderBy("d"))
    classed = active.select(
        "d",
        F.when(lag_d.isNull(), "new")
        .when(F.datediff(F.col("d"), lag_d) > _RESURRECT_GAP_DAYS, "resurrected")
        .otherwise("retained")
        .alias("status"),
    )
    return classed.groupBy("d").agg(
        F.count_if(F.col("status") == "new").cast("long").alias("n_new"),
        F.count_if(F.col("status") == "retained").cast("long").alias("n_retained"),
        F.count_if(F.col("status") == "resurrected")
        .cast("long")
        .alias("n_resurrected"),
        F.count(F.lit(1)).cast("long").alias("n_active"),
    ).select(
        F.date_format("d", "yyyy-MM-dd").alias("day"),
        "n_new",
        "n_retained",
        "n_resurrected",
        "n_active",
    )
