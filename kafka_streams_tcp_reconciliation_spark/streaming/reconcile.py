"""Streaming reconciliation — the engine's flagship pipeline
(SURVEY.md §2.3 J1/J2, §1.2).

The reference's purpose: two record streams (sent-side and received-side
captures) reconciled on key within an event-time window; matches produce
latency samples, the unmatched remainder signals loss. Here the two sides
are event_type partitions of one stream; in production they are two Kafka
topics — the pipeline composition is identical.

Watermark mechanics (J2): Spark holds each side's rows in the state store
until the watermark guarantees no counterpart can still arrive
(watermark - window bound), then emits outer nulls. That is exactly Kafka
Streams' JoinWindows grace semantics.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _sides(
    events: DataFrame, left_type: str, right_type: str, watermark: str
) -> tuple[DataFrame, DataFrame]:
    left = (
        events.filter(F.col("event_type") == left_type)
        .withColumnRenamed("ts", "l_ts")
        .withColumnRenamed("event_id", "l_id")
        .select("l_id", "l_ts", "user_id", "value")
        .withWatermark("l_ts", watermark)
    )
    right = (
        events.filter(F.col("event_type") == right_type)
        .withColumnRenamed("ts", "r_ts")
        .withColumnRenamed("event_id", "r_id")
        .withColumnRenamed("user_id", "r_user_id")
        .select("r_id", "r_ts", "r_user_id")
        .withWatermark("r_ts", watermark)
    )
    return left, right


def reconcile_join_stream(
    events: DataFrame,
    left_type: str = "purchase",
    right_type: str = "click",
    window: str = "10 minutes",
    watermark: str = "30 minutes",
) -> DataFrame:
    """J1 incremental: windowed stream-stream inner join.

    Same equi-key + interval condition as the batch twin
    (plans/events.reconcile_purchase_click); state bounded by
    watermark + window on both sides.
    """
    left, right = _sides(events, left_type, right_type, watermark)
    cond = (
        (F.col("user_id") == F.col("r_user_id"))
        & (F.col("r_ts") >= F.col("l_ts") - F.expr(f"INTERVAL {window}"))
        & (F.col("r_ts") <= F.col("l_ts") + F.expr(f"INTERVAL {window}"))
    )
    return left.join(right, cond, "inner").select(
        F.col("l_id").alias("purchase_id"),
        F.col("r_id").alias("click_id"),
        "user_id",
        F.expr("timestampdiff(MICROSECOND, r_ts, l_ts)").alias("lag_us"),
    )


def reconcile_unmatched_stream(
    events: DataFrame,
    left_type: str = "purchase",
    right_type: str = "click",
    window: str = "10 minutes",
    watermark: str = "30 minutes",
) -> DataFrame:
    """J2 incremental: left-outer windowed join; rows whose right side is
    NULL after watermark close are the unmatched records ("lost segments").

    The streaming twin of plans/events.reconcile_unmatched_purchases —
    which uses an anti-join, since batch needs no emission timing."""
    left, right = _sides(events, left_type, right_type, watermark)
    cond = (
        (F.col("user_id") == F.col("r_user_id"))
        & (F.col("r_ts") >= F.col("l_ts") - F.expr(f"INTERVAL {window}"))
        & (F.col("r_ts") <= F.col("l_ts") + F.expr(f"INTERVAL {window}"))
    )
    return (
        left.join(right, cond, "leftOuter")
        .filter(F.col("r_id").isNull())
        .select(
            F.col("l_id").alias("purchase_id"),
            "user_id",
            "value",
        )
    )
