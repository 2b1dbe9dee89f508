"""Streaming sources (SURVEY.md §2.1 S1/S2).

``chunked_event_stream`` materializes the batch events table into N
time-ordered parquet chunks and replays them as a file-source stream with
``maxFilesPerTrigger=1`` — a deterministic stand-in for a Kafka topic:
each chunk is a micro-batch, so watermarks advance between batches and
late/outer emission paths are actually exercised (a single-batch replay
never fires them).

A real deployment swaps this for::

    spark.readStream.format("kafka")
        .option("subscribe", topic)...
    .select(from_json(col("value").cast("string"), schema).alias("r"))
    .select("r.*")

Everything downstream is identical — pipelines take DataFrames.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

from kafka_streams_tcp_reconciliation_spark.sources.tables import load_table


def chunked_event_stream(
    spark: SparkSession,
    sf_dir: str,
    chunk_dir: str,
    n_chunks: int = 4,
) -> DataFrame:
    """Write events as ``n_chunks`` time-range parquet files under
    ``chunk_dir`` (once), then open them as a file-source stream that
    replays one chunk per micro-batch in event-time order."""
    marker = os.path.join(chunk_dir, "_chunks_ready")
    if not os.path.exists(marker):
        ev = load_table(spark, sf_dir, "events")
        # time-ordered chunks: rows are assigned to chunks by ntile over ts
        # so replay approximates an in-order stream (as a Kafka topic with
        # a time-aligned producer would)
        from pyspark.sql import Window
        from pyspark.sql import functions as F

        w = Window.orderBy("ts", "event_id")
        chunked = ev.withColumn("__chunk", F.ntile(n_chunks).over(w))
        for i in range(1, n_chunks + 1):
            part = chunked.filter(F.col("__chunk") == i).drop("__chunk")
            path = os.path.join(chunk_dir, f"chunk_{i:02d}")
            part.coalesce(1).write.mode("overwrite").parquet(path)
        with open(marker, "w") as f:
            f.write("ok")
    return event_stream_from_dir(spark, os.path.join(chunk_dir, "chunk_*"))


def event_stream_from_dir(spark: SparkSession, glob_path: str) -> DataFrame:
    """Open a parquet file-source stream with the events schema,
    one file per micro-batch.

    ``ts`` is cast to TIMESTAMP (LTZ): Spark watermarks require it
    (EVENT_TIME_IS_NOT_ON_TIMESTAMP_TYPE on NTZ). Streaming sessions run
    with UTC session timezone (session.get_spark), so wall-clock values are
    unchanged and results remain comparable to the NTZ batch twins.
    """
    # schema must be explicit for streaming file sources; these chunks were
    # written by Spark (µs timestamps), so the batch loader's ns special
    # case does not apply — infer from a static read
    static = spark.read.parquet(glob_path)
    from pyspark.sql import functions as F

    stream = (
        spark.readStream.schema(static.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(glob_path)
    )
    return stream.withColumn("ts", F.col("ts").cast("timestamp"))
