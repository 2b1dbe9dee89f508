"""Event-time queries — the batch analogues of the reference's streaming
core (SURVEY.md §2.5 W1–W3, §2.3 J1/J2/J9, §2.9).

Every operator here is defined once over DataFrames; the incremental
(Structured Streaming) forms in ``streaming/`` reuse the same composition
with watermarks. Batch forms get the strong DuckDB check (SURVEY.md §5.2).

The reconciliation pair (``reconcile_purchase_click`` /
``reconcile_unmatched_purchases``) is the engine's flagship semantics: match
records of two streams on key within an event-time window; surface the
unmatched remainder. In the reference's TCP domain, that is sent-segment ⋈
received-segment on flow+seq with loss detection.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from kafka_streams_tcp_reconciliation_spark.operators.joins import asof_join, windowed_anti_join, windowed_join
from kafka_streams_tcp_reconciliation_spark.operators.ktable import latest_by_key
from kafka_streams_tcp_reconciliation_spark.plans import register
from kafka_streams_tcp_reconciliation_spark.sources.tables import load_table

_TS_FMT = "yyyy-MM-dd HH:mm:ss"
_TS_FMT_DUCK = "%Y-%m-%d %H:%M:%S"


# --- W1: tumbling window --------------------------------------------------


@register(
    "tumbling_window_hourly",
    oracle=f"""
    SELECT strftime(date_trunc('hour', ts), '{_TS_FMT_DUCK}') AS window_start,
           event_type,
           count(*)             AS n_events,
           round(sum(value), 2) AS total_value
    FROM events
    GROUP BY 1, 2
    """,
)
def tumbling_window_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed 1-hour event-time buckets (W1, TimeWindows.ofSize).

    Uses Spark's window() — the same operator the streaming form uses with
    a watermark; epoch-aligned, so identical to date_trunc('hour').
    """
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 2).alias("total_value"),
        )
        .select(
            F.date_format("w.start", _TS_FMT).alias("window_start"),
            "event_type",
            "n_events",
            "total_value",
        )
    )


# --- W2: hopping (sliding) window -----------------------------------------


@register(
    "hopping_window_counts",
    oracle=f"""
    SELECT strftime(time_bucket(INTERVAL '15 minutes', ts)
                    - INTERVAL '15 minutes' * k, '{_TS_FMT_DUCK}') AS window_start,
           count(*)             AS n_events,
           round(sum(value), 2) AS total_value
    FROM events, (SELECT unnest([0, 1, 2, 3]) AS k)
    GROUP BY 1
    """,
)
def hopping_window_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """1-hour windows advancing every 15 min (W2, TimeWindows#advanceBy):
    each event lands in 4 overlapping windows."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy(F.window("ts", "1 hour", "15 minutes").alias("w"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 2).alias("total_value"),
        )
        .select(
            F.date_format("w.start", _TS_FMT).alias("window_start"),
            "n_events",
            "total_value",
        )
    )


# --- W2b: event-aligned sliding window (KS SlidingWindows) ------------------


@register(
    "sliding_window_event_counts",
    oracle="""
    SELECT user_id, event_id,
           CAST(count(*) OVER w AS BIGINT) AS n_30m,
           round(sum(CAST(round(value * 1000000) AS BIGINT)) OVER w
                 / 1000000.0, 6) AS sum_value_30m
    FROM (
        SELECT user_id, event_id, value,
               date_diff('microsecond', TIMESTAMP '1970-01-01', ts) AS t_us
        FROM events WHERE user_id % 20 = 0
    )
    WINDOW w AS (PARTITION BY user_id ORDER BY t_us
                 RANGE BETWEEN 1800000000 PRECEDING AND CURRENT ROW)
    """,
)
def sliding_window_event_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """True event-aligned sliding window (W2, the SlidingWindows half of
    the family — ofTimeDifference(30 min)): one trailing window PER EVENT
    [ts − 30 min, ts], not the discretized hopping approximation. In
    Spark this is a RANGE frame over event-time microseconds — the
    per-event continuous formulation Kafka Streams materializes via
    window-store scans.

    Scale: one shuffle on user_id + one sort; the RANGE frame is a
    sliding two-pointer over each key's sorted run — O(n) amortized,
    state bounded by events inside the 30-min horizon. Value sums
    quantize to integer micro-units, so the trailing sum is exact int64
    on both engines regardless of frame-combination strategy. The
    user_id filter only bounds the checked output; the plan is unchanged
    without it.
    """
    from pyspark.sql import Window

    ev = load_table(spark, sf_dir, "events").filter(F.col("user_id") % 20 == 0)
    t_us = F.expr(
        "timestampdiff(MICROSECOND, TIMESTAMP_NTZ '1970-01-01', ts)"
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy(t_us.alias("t_us"))
        .rangeBetween(-1_800_000_000, 0)
    )
    return ev.select(
        "user_id",
        "event_id",
        F.count(F.lit(1)).over(w).cast("long").alias("n_30m"),
        F.round(
            F.sum(F.expr("CAST(round(value * 1000000) AS BIGINT)")).over(w)
            / 1_000_000.0,
            6,
        ).alias("sum_value_30m"),
    )


# --- W3: session window (gap-based) ---------------------------------------


@register(
    "session_window_stats",
    oracle=f"""
    WITH flagged AS (
        SELECT user_id, ts, value,
               CASE WHEN lag(ts) OVER w IS NULL
                         OR ts - lag(ts) OVER w >= INTERVAL '30 minutes'
                    THEN 1 ELSE 0 END AS new_session
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ),
    sessions AS (
        SELECT *, sum(new_session) OVER (
            PARTITION BY user_id ORDER BY ts
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
        ) AS session_id
        FROM flagged
    )
    SELECT user_id,
           strftime(min(ts), '{_TS_FMT_DUCK}') AS session_start,
           count(*)                            AS n_events,
           round(sum(value), 2)                AS total_value
    FROM sessions
    GROUP BY user_id, session_id
    """,
)
def session_window_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-based session reconstruction per user (W3,
    SessionWindows.ofInactivityGap 30min) — flow/session reconstruction in
    the reference's domain.

    Spark's session_window() merges events whose gap is STRICTLY less than
    30min (window end = last_ts + gap, end-exclusive); the oracle's
    gaps-and-islands formulation uses >= accordingly.
    """
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy(F.session_window("ts", "30 minutes").alias("w"), "user_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 2).alias("total_value"),
        )
        .select(
            "user_id",
            F.date_format("w.start", _TS_FMT).alias("session_start"),
            "n_events",
            "total_value",
        )
    )


# --- J1: stream-stream windowed join (THE reconciliation op) --------------


@register(
    "reconcile_purchase_click",
    oracle="""
    SELECT a.event_id AS purchase_id,
           b.event_id AS click_id,
           a.user_id,
           date_diff('microseconds', b.ts, a.ts) AS lag_us
    FROM events a
    JOIN events b
      ON a.user_id = b.user_id
     AND a.event_type = 'purchase'
     AND b.event_type = 'click'
     AND b.ts BETWEEN a.ts - INTERVAL '10 minutes'
                  AND a.ts + INTERVAL '10 minutes'
    """,
)
def reconcile_purchase_click(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Windowed stream-stream inner join (J1): match each purchase to click
    events by the same user within ±10 minutes.

    This is the reference's core reconciliation shape (sent ⋈ received on
    flow-key within JoinWindows.ofTimeDifference): equi-key shuffle join
    with the time bound as a post-join filter.
    """
    ev = load_table(spark, sf_dir, "events")
    purchases = ev.filter(F.col("event_type") == "purchase")
    clicks = ev.filter(F.col("event_type") == "click")
    joined = windowed_join(
        purchases,
        clicks,
        ["user_id"],
        "ts",
        "ts",
        "10 minutes",
        "10 minutes",
        left_alias="a",
        right_alias="b",
    )
    return joined.select(
        F.col("a.event_id").alias("purchase_id"),
        F.col("b.event_id").alias("click_id"),
        F.col("a.user_id").alias("user_id"),
        F.expr("timestampdiff(MICROSECOND, b.ts, a.ts)").alias("lag_us"),
    )


@register(
    "reconcile_unmatched_purchases",
    oracle="""
    SELECT a.event_id AS purchase_id, a.user_id, a.value
    FROM events a
    WHERE a.event_type = 'purchase'
      AND NOT EXISTS (
          SELECT 1 FROM events b
          WHERE b.user_id = a.user_id
            AND b.event_type = 'click'
            AND b.ts BETWEEN a.ts - INTERVAL '10 minutes'
                         AND a.ts + INTERVAL '10 minutes'
      )
    """,
)
def reconcile_unmatched_purchases(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unmatched-side detection (J2's null branch): purchases with no click
    within the window — "lost segments" in the reference's domain."""
    ev = load_table(spark, sf_dir, "events")
    purchases = ev.filter(F.col("event_type") == "purchase")
    clicks = ev.filter(F.col("event_type") == "click")
    return windowed_anti_join(
        purchases, clicks, ["user_id"], "ts", "ts", "10 minutes", "10 minutes"
    ).select(
        F.col("event_id").alias("purchase_id"),
        "user_id",
        "value",
    )


# --- J9: as-of join -------------------------------------------------------


@register(
    "asof_last_click_before_purchase",
    oracle="""
    SELECT purchase_id, user_id, last_click_id
    FROM (
        SELECT p.event_id AS purchase_id,
               p.user_id,
               c.event_id AS last_click_id,
               row_number() OVER (
                   PARTITION BY p.event_id
                   ORDER BY c.ts DESC, c.event_id DESC
               ) AS rn
        FROM (SELECT * FROM events WHERE event_type = 'purchase') p
        JOIN (SELECT * FROM events WHERE event_type = 'click') c
          ON p.user_id = c.user_id AND c.ts <= p.ts
    )
    WHERE rn = 1
    """,
)
def asof_last_click_before_purchase(
    spark: SparkSession, sf_dir: str, events: DataFrame | None = None
) -> DataFrame:
    """As-of join (J9): each purchase picks up the latest click at or
    before its event time, per user.

    Implemented union-and-carry (one shuffle, linear state per key) — see
    operators/joins.asof_join. The oracle uses the quadratic join+rank
    formulation, correct at oracle scale.

    ``events`` overrides the table scan — the at-least-once composition
    (``*_deduped`` registration) passes the exact-deduped stream here.
    """
    ev = events if events is not None else load_table(spark, sf_dir, "events")
    purchases = ev.filter(F.col("event_type") == "purchase")
    clicks = ev.filter(F.col("event_type") == "click")
    out = asof_join(
        purchases,
        clicks,
        ["user_id"],
        "ts",
        "ts",
        right_value_cols=["event_id"],
        tiebreak="event_id",
    )
    return out.select(
        F.col("event_id").alias("purchase_id"),
        "user_id",
        F.col("asof_event_id").alias("last_click_id"),
    )


# --- percentile aggregation (per-flow latency stats in the reference) -----


@register(
    "percentile_value_by_user",
    oracle="""
    SELECT user_id,
           round(quantile_cont(value, 0.5), 6)  AS p50_value,
           round(quantile_cont(value, 0.95), 6) AS p95_value,
           count(*)                             AS n_events
    FROM events
    GROUP BY user_id
    """,
)
def percentile_value_by_user(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact interpolated percentiles per key (A4-shaped custom aggregate;
    per-flow latency percentiles in the reference's domain)."""
    ev = load_table(spark, sf_dir, "events")
    return ev.groupBy("user_id").agg(
        F.round(F.expr("percentile(value, 0.5)"), 6).alias("p50_value"),
        F.round(F.expr("percentile(value, 0.95)"), 6).alias("p95_value"),
        F.count(F.lit(1)).alias("n_events"),
    )


# --- O5 streaming-dedup semantics (keep-first per key) --------------------


@register(
    "dedup_first_event_per_user_type",
    oracle="""
    SELECT user_id, event_type, event_id AS first_event_id
    FROM (
        SELECT *, row_number() OVER (
            PARTITION BY user_id, event_type ORDER BY ts, event_id
        ) AS rn
        FROM events
    )
    WHERE rn = 1
    """,
)
def dedup_first_event_per_user_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Keep-first dedup per key — the batch semantics of streaming
    dropDuplicatesWithinWatermark (O5/T1)."""
    ev = load_table(spark, sf_dir, "events")
    return latest_by_key(
        ev, ["user_id", "event_type"], [F.col("ts").asc(), F.col("event_id").asc()]
    ).select("user_id", "event_type", F.col("event_id").alias("first_event_id"))


# --- event-analytics suite: time rollup, funnel, retention ----------------


@register(
    "time_rollup_events",
    oracle=f"""
    SELECT strftime(date_trunc('day', ts), '{_TS_FMT_DUCK}')  AS day,
           strftime(date_trunc('hour', ts), '{_TS_FMT_DUCK}') AS hour,
           count(*)             AS n_events,
           round(sum(value), 2) AS total_value,
           CAST(CASE WHEN strftime(date_trunc('day', ts), '{_TS_FMT_DUCK}')
                     IS NULL THEN 2 ELSE 0 END
                + CASE WHEN strftime(date_trunc('hour', ts), '{_TS_FMT_DUCK}')
                       IS NULL THEN 1 ELSE 0 END AS BIGINT) AS gid
    FROM events
    GROUP BY GROUPING SETS ((day, hour), (day), ())
    """,
)
def time_rollup_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hierarchical time rollup (hour → day → total) in ONE pass via
    GROUPING SETS — the continuous-aggregate/hypertable-rollup analogue:
    a single Expand + HashAggregate computes every level, instead of one
    shuffle per granularity."""
    ev = load_table(spark, sf_dir, "events")
    ev.select(
        F.date_format(F.date_trunc("day", "ts"), _TS_FMT).alias("day"),
        F.date_format(F.date_trunc("hour", "ts"), _TS_FMT).alias("hour"),
        "value",
    ).createOrReplaceTempView("tr_events")
    return spark.sql(
        """
        SELECT day, hour,
               count(*)             AS n_events,
               round(sum(value), 2) AS total_value,
               CAST(grouping_id(day, hour) AS BIGINT) AS gid
        FROM tr_events
        GROUP BY GROUPING SETS ((day, hour), (day), ())
        """
    )


@register(
    "funnel_view_click_purchase",
    oracle="""
    WITH v AS (
        SELECT user_id, min(ts) AS t_view
        FROM events WHERE event_type = 'view' GROUP BY user_id
    ),
    c AS (
        SELECT e.user_id, min(e.ts) AS t_click
        FROM events e JOIN v ON e.user_id = v.user_id AND e.ts > v.t_view
        WHERE e.event_type = 'click'
        GROUP BY e.user_id
    ),
    p AS (
        SELECT e.user_id, min(e.ts) AS t_buy
        FROM events e JOIN c ON e.user_id = c.user_id AND e.ts > c.t_click
        WHERE e.event_type = 'purchase'
        GROUP BY e.user_id
    )
    SELECT (SELECT count(*) FROM v) AS n_view,
           (SELECT count(*) FROM c) AS n_click_after_view,
           (SELECT count(*) FROM p) AS n_purchase_after_click
    """,
)
def funnel_view_click_purchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered funnel (view → click → purchase): each stage requires an
    event strictly after the user's previous stage. Three per-key
    min-aggregations chained by key joins — shuffle count stays at the
    number of stages regardless of data size."""
    ev = load_table(spark, sf_dir, "events")
    v = (
        ev.filter(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("ts").alias("t_view"))
    )
    c = (
        ev.filter(F.col("event_type") == "click")
        .alias("e")
        .join(v.alias("v"), "user_id")
        .filter(F.col("e.ts") > F.col("t_view"))
        .groupBy("user_id")
        .agg(F.min("e.ts").alias("t_click"))
    )
    p = (
        ev.filter(F.col("event_type") == "purchase")
        .alias("e")
        .join(c.alias("c"), "user_id")
        .filter(F.col("e.ts") > F.col("t_click"))
        .groupBy("user_id")
        .agg(F.min("e.ts").alias("t_buy"))
    )
    return (
        v.agg(F.count(F.lit(1)).alias("n_view"))
        .crossJoin(c.agg(F.count(F.lit(1)).alias("n_click_after_view")))
        .crossJoin(p.agg(F.count(F.lit(1)).alias("n_purchase_after_click")))
    )


@register(
    "cohort_hourly_retention",
    oracle=f"""
    WITH ua AS (
        SELECT DISTINCT date_trunc('hour', ts) AS h, user_id FROM events
    )
    SELECT strftime(a.h, '{_TS_FMT_DUCK}') AS hour,
           count(*)          AS n_active,
           count(b.user_id)  AS n_retained
    FROM ua a
    LEFT JOIN ua b ON b.user_id = a.user_id
                  AND b.h = a.h + INTERVAL '1 hour'
    GROUP BY a.h
    """,
)
def cohort_hourly_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hour-over-hour retention: of the users active in hour H, how many
    are also active in H+1. Distinct (hour, user) pairs self-joined on
    (user, next hour) — the cohort-retention shape; at scale the distinct
    pre-aggregation is what keeps the join input small."""
    ev = load_table(spark, sf_dir, "events")
    ua = ev.select(
        F.date_trunc("hour", "ts").alias("h"), "user_id"
    ).distinct()
    return (
        ua.alias("a")
        .join(
            ua.alias("b"),
            (F.col("b.user_id") == F.col("a.user_id"))
            & (F.col("b.h") == F.col("a.h") + F.expr("INTERVAL 1 HOUR")),
            "left",
        )
        .groupBy(F.col("a.h").alias("h"))
        .agg(
            F.count(F.lit(1)).alias("n_active"),
            F.count(F.col("b.user_id")).alias("n_retained"),
        )
        .select(
            F.date_format("h", _TS_FMT).alias("hour"), "n_active", "n_retained"
        )
    )


@register(
    "windowed_topk_users",
    oracle=f"""
    WITH agg AS (
        SELECT date_trunc('hour', ts) AS w, user_id,
               round(sum(value), 2) AS total_value
        FROM events
        GROUP BY 1, 2
    )
    SELECT strftime(w, '{_TS_FMT_DUCK}') AS window_start,
           user_id, total_value, rank
    FROM (
        SELECT *, row_number() OVER (
            PARTITION BY w ORDER BY total_value DESC, user_id
        ) AS rank
        FROM agg
    )
    WHERE rank <= 3
    """,
)
def windowed_topk_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 users by spend per hour window — the batch twin of the
    incremental windowed top-k (streaming/topk.py): windowed aggregation
    then per-window rank, planned as WindowGroupLimit so only k rows per
    window survive the partition-local sorts."""
    from pyspark.sql import Window

    ev = load_table(spark, sf_dir, "events")
    agg = ev.groupBy(F.window("ts", "1 hour").alias("w"), "user_id").agg(
        F.round(F.sum("value"), 2).alias("total_value")
    )
    rank_w = Window.partitionBy("w").orderBy(
        F.col("total_value").desc(), F.col("user_id").asc()
    )
    return (
        agg.withColumn("rank", F.row_number().over(rank_w).cast("long"))
        .filter(F.col("rank") <= 3)
        .select(
            F.date_format("w.start", _TS_FMT).alias("window_start"),
            "user_id",
            "total_value",
            "rank",
        )
    )


# --- anomaly detection: per-type z-score outliers -------------------------


@register(
    "value_zscore_outliers",
    oracle="""
    WITH s AS (
        SELECT event_type,
               avg(value)        AS mu,
               stddev_pop(value) AS sigma
        FROM events GROUP BY event_type
    )
    SELECT e.event_id, e.event_type, e.value,
           round((e.value - s.mu) / s.sigma, 4) AS z
    FROM events e JOIN s USING (event_type)
    WHERE s.sigma <> 0 AND abs((e.value - s.mu) / s.sigma) > 2
    """,
)
def value_zscore_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-event-type z-score anomaly flagging — the reconciliation
    domain's "this flow's latency is abnormal" query. Two-pass shape that
    scales: a tiny per-type stats aggregate (4 rows) broadcast back onto
    the event scan; no window over the full corpus, no second wide
    shuffle.

    Cross-engine: mu/sigma differ between engines in the last ulp (double
    summation order), so z is rounded(4); the >2 cut sits far from any
    fixture value's ulp neighborhood.
    """
    ev = load_table(spark, sf_dir, "events")
    stats = ev.groupBy("event_type").agg(
        F.avg("value").alias("mu"), F.stddev_pop("value").alias("sigma")
    )
    z = (F.col("value") - F.col("mu")) / F.col("sigma")
    return (
        ev.join(F.broadcast(stats), "event_type")
        # sigma=0 (degenerate group: one event, or all-identical values)
        # means nothing is an outlier — and guards the ANSI-mode division
        .filter((F.col("sigma") != 0) & (F.abs(z) > 2))
        .select(
            "event_id",
            "event_type",
            "value",
            F.round(z, 4).alias("z"),
        )
    )


# --- reconciliation KPI: per-hour loss rate -------------------------------


@register(
    "reconcile_loss_rate_hourly",
    oracle="""
    SELECT strftime(date_trunc('hour', a.ts), '%Y-%m-%d %H:%M:%S') AS hour,
           CAST(count(*) AS BIGINT) AS n_purchases,
           CAST(count(*) FILTER (WHERE NOT EXISTS (
               SELECT 1 FROM events b
               WHERE b.user_id = a.user_id
                 AND b.event_type = 'click'
                 AND b.ts BETWEEN a.ts - INTERVAL '10 minutes'
                              AND a.ts + INTERVAL '10 minutes'
           )) AS BIGINT) AS n_lost,
           round(count(*) FILTER (WHERE NOT EXISTS (
               SELECT 1 FROM events b
               WHERE b.user_id = a.user_id
                 AND b.event_type = 'click'
                 AND b.ts BETWEEN a.ts - INTERVAL '10 minutes'
                              AND a.ts + INTERVAL '10 minutes'
           )) / CAST(count(*) AS DOUBLE), 6) AS loss_rate
    FROM events a
    WHERE a.event_type = 'purchase'
    GROUP BY 1
    """,
)
def reconcile_loss_rate_hourly(
    spark: SparkSession, sf_dir: str, events: DataFrame | None = None
) -> DataFrame:
    """The reconciliation KPI: per hour, how many purchases found no
    click within the ±10-minute window, and the loss fraction — the
    reference domain's per-interval segment-loss-rate dashboard.

    Composition, not new machinery: the windowed anti-join that powers
    ``reconcile_unmatched_purchases`` tagged back onto all purchases
    (left_anti → left join on the anti result's id, so the count and the
    denominator come from one purchase scan), then an hourly rollup.

    ``events`` overrides the table scan for the ``*_deduped`` composition.
    """
    ev = events if events is not None else load_table(spark, sf_dir, "events")
    purchases = ev.filter(F.col("event_type") == "purchase")
    clicks = ev.filter(F.col("event_type") == "click")
    lost = windowed_anti_join(
        purchases, clicks, ["user_id"], "ts", "ts", "10 minutes", "10 minutes"
    ).select(F.col("event_id"), F.lit(1).alias("is_lost"))
    tagged = purchases.join(lost, "event_id", "left")
    return (
        tagged.groupBy(F.date_trunc("hour", "ts").alias("h"))
        .agg(
            F.count(F.lit(1)).alias("n_purchases"),
            F.count("is_lost").alias("n_lost"),
        )
        .select(
            F.date_format("h", _TS_FMT).alias("hour"),
            "n_purchases",
            "n_lost",
            F.round(
                F.col("n_lost") / F.col("n_purchases").cast("double"), 6
            ).alias("loss_rate"),
        )
    )


# --- delivery-quality report (the reconciliation QoS readout) ---------------


@register(
    "delivery_quality_report",
    oracle="""
    WITH seq AS (
        SELECT user_id, event_id, ts,
               max(ts) OVER (PARTITION BY user_id ORDER BY event_id
                             ROWS BETWEEN UNBOUNDED PRECEDING
                             AND 1 PRECEDING) AS prev_max_ts
        FROM events
    )
    SELECT CAST(count(*) AS BIGINT) AS n_events,
           CAST(count(*) - count(DISTINCT event_id) AS BIGINT)
               AS n_dup_event_ids,
           CAST(count(CASE WHEN ts < prev_max_ts THEN 1 END) AS BIGINT)
               AS n_inversions,
           round(CASE WHEN count(*) = 0 THEN 0.0 ELSE
                 count(CASE WHEN ts < prev_max_ts THEN 1 END)
                 / CAST(count(*) AS DOUBLE) END, 6) AS inversion_rate
    FROM seq
    """,
)
def delivery_quality_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Delivery-quality QoS readout — the summary a TCP/Kafka
    reconciliation pipeline publishes about its OWN transport: duplicate
    event-id count (at-least-once redelivery volume) and sequence/time
    INVERSIONS — events whose timestamp precedes the maximum timestamp of
    any earlier-sequenced event of the same key (event_id as the producer
    sequence), i.e. reordering that any in-order consumer will observe.

    Determinism: counts are exact integers; the inversion test compares
    stored timestamps (no arithmetic); one rounded division.

    Scale: ONE shuffle on user_id for the running-max window (same
    partitioning every sequence analytic shares), then a
    map-side-combinable global rollup to a single row. The distinct-id
    count rides Spark's partial-distinct aggregation — no second
    full-rows shuffle.
    """
    ev = load_table(spark, sf_dir, "events")
    from pyspark.sql import Window

    w = (
        Window.partitionBy("user_id")
        .orderBy("event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    seq = ev.select(
        "event_id",
        "ts",
        F.max("ts").over(w).alias("prev_max_ts"),
    )
    return seq.agg(
        F.count(F.lit(1)).cast("long").alias("n_events"),
        (F.count(F.lit(1)) - F.count_distinct("event_id"))
        .cast("long")
        .alias("n_dup_event_ids"),
        F.count(F.when(F.col("ts") < F.col("prev_max_ts"), 1))
        .cast("long")
        .alias("n_inversions"),
        # empty input: zero events means a 0 rate, not 0/0 (lazy CASE —
        # the ANSI division never fires; DuckDB mirrors)
        F.round(
            F.when(F.count(F.lit(1)) == 0, F.lit(0.0)).otherwise(
                F.count(F.when(F.col("ts") < F.col("prev_max_ts"), 1))
                / F.count(F.lit(1)).cast("double")
            ),
            6,
        ).alias("inversion_rate"),
    )
