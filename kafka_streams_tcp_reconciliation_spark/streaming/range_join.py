"""Streaming KEYLESS time-range join (SURVEY.md §2.3 J1 generalization).

The streaming twin of ``operators/joins.bucketed_range_join``
(batch query ``range_join_coactivity``): pair events from two streams whose
timestamps fall within ±radius of each other with NO shared key. Spark's
stream-stream join requires an equality predicate to partition state — the
synthetic radius-width bucket id IS that key: the probe side explodes into
the three buckets its window can touch, the build side keeps its home
bucket, and every qualifying pair matches on exactly one bucket (the build
row's home bucket), so no dedup is needed.

State stays bounded exactly as in the keyed reconcile join: both sides carry
watermarks and the join condition includes the event-time interval, so rows
are evicted once the watermark guarantees no counterpart can still arrive.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _bucket_of(col: str, width_us: int) -> Column:
    # Integer `div` (never float floor): see operators/joins.bucketed_range_join.
    return F.expr(
        "timestampdiff(MICROSECOND, TIMESTAMP_NTZ '1970-01-01 00:00:00',"
        f" {col}) div {width_us}"
    )


def coactivity_pairs_stream(
    events: DataFrame,
    probe_type: str = "purchase",
    radius_seconds: int = 300,
    watermark: str = "30 minutes",
) -> DataFrame:
    """Inner keyless range join over one replayed stream: every
    (purchase, any-other-user event) pair within ±radius seconds.

    Emits (probe_id, other_id, other_user) rows incrementally; converges to
    the pair set underlying the batch ``range_join_coactivity`` aggregate
    (tests assert set equality after full replay).
    """
    width_us = radius_seconds * 1_000_000
    probe = (
        events.filter(F.col("event_type") == probe_type)
        .select(
            F.col("event_id").alias("p_id"),
            F.col("ts").alias("p_ts"),
            F.col("user_id").alias("p_user"),
        )
        .withColumn(
            "bucket",
            F.explode(
                F.array(
                    _bucket_of("p_ts", width_us) - 1,
                    _bucket_of("p_ts", width_us),
                    _bucket_of("p_ts", width_us) + 1,
                )
            ),
        )
        .withWatermark("p_ts", watermark)
    )
    build = (
        events.select(
            F.col("event_id").alias("o_id"),
            F.col("ts").alias("o_ts"),
            F.col("user_id").alias("o_user"),
        )
        .withColumn("bucket", _bucket_of("o_ts", width_us))
        .withWatermark("o_ts", watermark)
    )
    cond = (
        (probe["bucket"] == build["bucket"])
        & (F.col("o_ts") >= F.col("p_ts") - F.expr(f"INTERVAL {radius_seconds} SECONDS"))
        & (F.col("o_ts") <= F.col("p_ts") + F.expr(f"INTERVAL {radius_seconds} SECONDS"))
        & (F.col("o_user") != F.col("p_user"))
    )
    return probe.join(build, cond, "inner").select(
        "p_id", "o_id", "o_user"
    )
