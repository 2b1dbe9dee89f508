"""Kafka topic source/sink builders (SURVEY.md §2.1 S1/S2/S4).

The reference consumes and produces Kafka topics; Structured Streaming's
Kafka connector is the drop-in. This environment has no broker and no
spark-sql-kafka package, so these builders assemble the *plan* (reader
options, value deserialization, sink serialization) and raise a clear
error at ``load()`` time if the connector is absent — the composition is
unit-tested, the wire I/O is exercised in a real deployment.

Topic ↔ engine mapping:
- S1 stream:   ``topic_stream`` → keyed, timestamped DataFrame (the
  KStream shape: key, value columns + event_time from the record).
- S2 table:    latest-per-key over the stream (KTable) — compose with
  ``operators.ktable.latest_by_key`` in batch or
  ``dropDuplicatesWithinWatermark``/state in streaming.
- S4 sink:     ``to_topic`` — to_json(struct(*)) as value, key column
  preserved for partitioning (co-partitioning semantics ride on the
  topic's own partitioner, as in the reference).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T


def topic_stream(
    spark: SparkSession,
    bootstrap_servers: str,
    topic: str,
    value_schema: T.StructType,
    starting_offsets: str = "earliest",
) -> DataFrame:
    """S1: subscribe to a topic; JSON-decode value; surface key,
    event_time (record timestamp), and the value fields as columns."""
    raw = (
        spark.readStream.format("kafka")
        .option("kafka.bootstrap.servers", bootstrap_servers)
        .option("subscribe", topic)
        .option("startingOffsets", starting_offsets)
        .load()
    )
    return raw.select(
        F.col("key").cast("string").alias("key"),
        F.col("timestamp").alias("event_time"),
        F.from_json(F.col("value").cast("string"), value_schema).alias("v"),
    ).select("key", "event_time", "v.*")


def to_topic(
    df: DataFrame,
    bootstrap_servers: str,
    topic: str,
    key_col: str,
    checkpoint_dir: str,
):
    """S4: serialize all non-key columns as a JSON value; key preserved so
    the topic partitioner co-partitions by it (KS Produced#with)."""
    payload_cols = [c for c in df.columns if c != key_col]
    out = df.select(
        F.col(key_col).cast("string").alias("key"),
        F.to_json(F.struct(*payload_cols)).alias("value"),
    )
    return (
        out.writeStream.format("kafka")
        .option("kafka.bootstrap.servers", bootstrap_servers)
        .option("topic", topic)
        .option("checkpointLocation", checkpoint_dir)
    )
