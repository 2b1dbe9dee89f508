"""Streaming anomaly flagging — the incremental twin of
``value_zscore_outliers`` and the reference domain's live alerting path
("this flow's latency just went abnormal").

Model split, the standard production shape:

- The per-key (mu, sigma) profile is TRAINED OFFLINE by the batch query
  (or any scheduled job) — a tiny frame, one row per event type.
- The STREAM applies it: broadcast the profile into every micro-batch,
  flag |z| > threshold. Stateless, no watermark, no shuffle on the
  stream side — each batch is a broadcast hash join + filter, so
  throughput is scan-bound at any scale.

A slowly-retrained profile is swapped in by re-reading the profile
source per batch (same composition as streaming/enrich.py dims).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from kafka_streams_tcp_reconciliation_spark.sources.tables import load_table


def value_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-event-type (mu, sigma) trained from the batch corpus — the
    same stats the batch z-score query computes."""
    return (
        load_table(spark, sf_dir, "events")
        .groupBy("event_type")
        .agg(F.avg("value").alias("mu"), F.stddev_pop("value").alias("sigma"))
    )


def flag_anomalies_stream(
    events: DataFrame, profile: DataFrame, threshold: float = 2.0
) -> DataFrame:
    """Flag streaming events whose value deviates more than
    ``threshold`` sigmas from their type's profile."""
    z = (F.col("value") - F.col("mu")) / F.col("sigma")
    return (
        events.join(F.broadcast(profile), "event_type")
        .filter(F.abs(z) > threshold)
        .select(
            "event_id",
            "event_type",
            "ts",
            "value",
            F.round(z, 4).alias("z"),
        )
    )
