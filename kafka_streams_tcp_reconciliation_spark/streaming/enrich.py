"""Stream-table enrichment (SURVEY.md §2.3 J3/J4, streaming form).

The KStream#join(GlobalKTable) shape: every stream record picks up the
current dimension row by key. In Spark a stream-static join needs no
watermark and no state — each micro-batch hash-joins against the
(broadcast) static side, which may be re-read per batch for slowly
changing dimensions (swap in a Delta/JDBC read in production; the
composition is identical).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from kafka_streams_tcp_reconciliation_spark.sources.tables import load_table


def customer_geo_dim(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Static enrichment dimension: customer → nation/region names."""
    customer = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region")
    return (
        customer.join(nation, F.col("c_nationkey") == F.col("n_nationkey"))
        .join(region, F.col("n_regionkey") == F.col("r_regionkey"))
        .select(
            F.col("c_custkey").alias("dim_key"),
            F.col("c_name").alias("customer_name"),
            F.col("n_name").alias("nation"),
            F.col("r_name").alias("region"),
        )
    )


def enrich_stream(events: DataFrame, dim: DataFrame) -> DataFrame:
    """J4 incremental: broadcast the dimension into every micro-batch.
    Left join — events without a dimension row pass through with nulls
    (KStream#leftJoin semantics)."""
    return events.join(
        F.broadcast(dim), events["user_id"] == dim["dim_key"], "left"
    ).select(
        "event_id", "ts", "user_id", "event_type", "value",
        "customer_name", "nation", "region",
    )
