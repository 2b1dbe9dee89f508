"""Runnable end-to-end streaming reconciliation demo.

Replays the events table as a micro-batched stream (the Kafka stand-in),
runs the reconciliation core — windowed stream-stream join + unmatched
detection — and delivers results through the exactly-once sink. Prints a
summary and exits.

    python examples/streaming_reconciliation.py [sf_dir]

Swap ``chunked_event_stream`` for ``sources.kafka.topic_stream`` against
a real broker; every pipeline below is unchanged.
"""

from __future__ import annotations

import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from kafka_streams_tcp_reconciliation_spark.session import get_spark
from kafka_streams_tcp_reconciliation_spark.streaming.reconcile import (
    reconcile_join_stream,
    reconcile_unmatched_stream,
)
from kafka_streams_tcp_reconciliation_spark.streaming.sink import IdempotentBatchSink
from kafka_streams_tcp_reconciliation_spark.streaming.source import chunked_event_stream


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = get_spark(app_name="streaming-reconciliation-demo")
    spark.sparkContext.setLogLevel("ERROR")
    work = tempfile.mkdtemp(prefix="recon_demo_")

    stream = chunked_event_stream(spark, sf_dir, f"{work}/chunks", n_chunks=4)
    matched_sink = IdempotentBatchSink(f"{work}/matched")
    q1 = (
        reconcile_join_stream(stream)
        .writeStream.foreachBatch(matched_sink)
        .outputMode("append")
        .option("checkpointLocation", f"{work}/ckpt_m")
        .trigger(availableNow=True)
        .start()
    )
    q1.awaitTermination(timeout=600)

    stream2 = chunked_event_stream(spark, sf_dir, f"{work}/chunks", n_chunks=4)
    unmatched_sink = IdempotentBatchSink(f"{work}/unmatched")
    q2 = (
        reconcile_unmatched_stream(stream2)
        .writeStream.foreachBatch(unmatched_sink)
        .outputMode("append")
        .option("checkpointLocation", f"{work}/ckpt_u")
        .trigger(availableNow=True)
        .start()
    )
    q2.awaitTermination(timeout=600)

    matched = spark.read.parquet(f"{work}/matched/data")
    unmatched = spark.read.parquet(f"{work}/unmatched/data")
    print(f"matched pairs:        {matched.count()}")
    print(f"unmatched (emitted):  {unmatched.count()}")
    print(f"outputs under:        {work}")
    spark.stop()


if __name__ == "__main__":
    main()
