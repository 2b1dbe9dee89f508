"""transformWithStateInPandas (T2 v2) — converges to the batch truth.

Environment gate: Spark's TransformWithStateInPySpark state server
requires google.protobuf, which is not installed in this container (no
pip allowed). The operator implementation is complete; this test runs
wherever protobuf exists. applyInPandasWithState (stateful.py) is the
fully-tested T2/T3 path here.
"""

from __future__ import annotations

import pytest

try:
    from google.protobuf import descriptor  # noqa: F401

    _HAVE_PROTOBUF = True
except ImportError:
    _HAVE_PROTOBUF = False

pytestmark = pytest.mark.skipif(
    not _HAVE_PROTOBUF,
    reason="google.protobuf absent: transformWithStateInPandas state server "
    "cannot start in this container",
)

from pyspark.sql import functions as F

from kafka_streams_tcp_reconciliation_spark.streaming.source import chunked_event_stream
from kafka_streams_tcp_reconciliation_spark.streaming.stateful_v2 import seq_gap_stream
from kafka_streams_tcp_reconciliation_spark.sources.tables import load_table


def test_seq_gap_tracker_converges(spark, sf_dir, tmp_path):
    stream = chunked_event_stream(spark, sf_dir, str(tmp_path / "chunks"), n_chunks=3)
    q = (
        seq_gap_stream(stream)
        .writeStream.format("memory")
        .queryName("t2v2")
        .outputMode("update")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(timeout=300)
    # update mode: last emission per key is the final state
    got = {
        r.user_id: (r.max_seq, r.n_events)
        for r in spark.sql(
            """
            SELECT user_id, max_seq, n_events FROM (
              SELECT *, row_number() OVER (
                  PARTITION BY user_id ORDER BY n_events DESC) AS rn
              FROM t2v2
            ) WHERE rn = 1
            """
        ).collect()
    }
    want = {
        r.user_id: (r.max_seq, r.n_events)
        for r in load_table(spark, sf_dir, "events")
        .groupBy("user_id")
        .agg(F.max("event_id").alias("max_seq"), F.count(F.lit(1)).alias("n_events"))
        .collect()
    }
    assert got == want
