"""Streaming windowed aggregations (SURVEY.md §2.5 W1–W5, §2.9 T1/T6).

Kafka Streams ↔ Spark semantics mapping:

- grace period  ≡ ``withWatermark(ts, delay)`` (W4/T1): records later than
  watermark are dropped; state below watermark is evicted.
- ``suppress(untilWindowCloses)`` ≡ output mode ``append`` — one final
  result per window when the watermark passes its end (W5).
- KS default eager emission per update ≡ output mode ``update`` (T6).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def tumbling_window_stream(
    events: DataFrame,
    window_size: str = "1 hour",
    watermark: str = "30 minutes",
) -> DataFrame:
    """W1 incremental: same composition as plans/events.tumbling_window_hourly
    plus a watermark. Run in 'update' mode for eager (KS-default) emission or
    'append' for final-only (KS suppress)."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window_size).alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 2).alias("total_value"),
        )
        .select(
            F.date_format("w.start", "yyyy-MM-dd HH:mm:ss").alias("window_start"),
            "event_type",
            "n_events",
            "total_value",
        )
    )


def session_window_stats_stream(
    events: DataFrame,
    gap: str = "30 minutes",
    watermark: str = "30 minutes",
) -> DataFrame:
    """W3 incremental: gap-based session windows per user — dynamic,
    merging windows maintained in the state store."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.session_window("ts", gap).alias("w"), "user_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 2).alias("total_value"),
        )
        .select(
            "user_id",
            F.date_format("w.start", "yyyy-MM-dd HH:mm:ss").alias("session_start"),
            "n_events",
            "total_value",
        )
    )


def dedup_stream(events: DataFrame, watermark: str = "1 hour") -> DataFrame:
    """O5 incremental: keep-first per (user_id, event_type) with bounded
    state — dropDuplicatesWithinWatermark evicts keys older than the
    watermark, the streaming twin of plans/events.dedup_first_event_per_user_type."""
    return events.withWatermark("ts", watermark).dropDuplicatesWithinWatermark(
        ["user_id", "event_type"]
    )


def hopping_window_stream(
    events: DataFrame,
    window_size: str = "1 hour",
    slide: str = "15 minutes",
    watermark: str = "30 minutes",
) -> DataFrame:
    """W2 incremental: overlapping windows (size + advance) — each event
    contributes to size/slide windows; same composition as the batch twin
    plans/events.hopping_window_counts plus a watermark."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window_size, slide).alias("w"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 2).alias("total_value"),
        )
        .select(
            F.date_format("w.start", "yyyy-MM-dd HH:mm:ss").alias("window_start"),
            "n_events",
            "total_value",
        )
    )


def chained_hourly_daily_stream(
    events: DataFrame,
    watermark: str = "30 minutes",
) -> DataFrame:
    """W1 chained: TWO stacked windowed aggregations in one streaming
    query — hourly counts re-aggregated into daily rollups via
    ``window_time()`` (the event-time column a finished window exposes).
    Spark 3.5+ multi-stateful-operator support; the Kafka Streams analog
    is a windowed store feeding a second aggregation through a
    repartition topic, here it is one watermark domain end to end.

    Append mode: a daily row emits once its day closes under the
    watermark — the KS `suppress(untilWindowCloses)` semantics at the
    outer level too.
    """
    hourly = (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 2).alias("total_value"),
        )
    )
    return (
        hourly.groupBy(
            F.window(F.window_time("w"), "1 day").alias("d"), "event_type"
        )
        .agg(
            F.sum("n_events").alias("n_events"),
            F.round(F.sum("total_value"), 2).alias("total_value"),
        )
        .select(
            F.date_format("d.start", "yyyy-MM-dd").alias("day"),
            "event_type",
            "n_events",
            "total_value",
        )
    )
