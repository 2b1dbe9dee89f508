"""J5 streaming KTable-KTable join — final emission per key must equal
the batch join of the two latest-per-key snapshots."""

from __future__ import annotations

from pyspark.sql import functions as F

from kafka_streams_tcp_reconciliation_spark.operators.ktable import latest_by_key
from kafka_streams_tcp_reconciliation_spark.sources.tables import load_table
from kafka_streams_tcp_reconciliation_spark.streaming.source import chunked_event_stream
from kafka_streams_tcp_reconciliation_spark.streaming.table_join import ktable_join_stream


def test_ktable_join_converges_to_batch_snapshot(spark, sf_dir, tmp_path):
    stream = chunked_event_stream(spark, sf_dir, str(tmp_path / "chunks"), n_chunks=3)
    left = stream.filter(F.col("event_type") == "purchase")
    right = stream.filter(F.col("event_type") == "click")
    q = (
        ktable_join_stream(left, right)
        .writeStream.format("memory")
        .queryName("t_ktjoin")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(timeout=300)
    # changelog semantics: the LAST emission per key is the current join row
    got = {
        r.user_id: (r.left_value, r.right_value)
        for r in spark.sql(
            """
            SELECT user_id, left_value, right_value FROM (
              SELECT *, row_number() OVER (
                  PARTITION BY user_id
                  ORDER BY left_ts_us DESC, right_ts_us DESC) AS rn
              FROM t_ktjoin
            ) WHERE rn = 1
            """
        ).collect()
    }

    ev = load_table(spark, sf_dir, "events")
    latest = lambda et: latest_by_key(  # noqa: E731
        ev.filter(F.col("event_type") == et),
        ["user_id"],
        [F.col("ts").desc(), F.col("event_id").desc()],
    ).select("user_id", "value")
    want = {
        r.user_id: (r.lv, r.rv)
        for r in latest("purchase")
        .alias("a")
        .join(latest("click").alias("b"), "user_id")
        .select("user_id", F.col("a.value").alias("lv"), F.col("b.value").alias("rv"))
        .collect()
    }
    assert set(got) == set(want)
    for k in want:
        assert got[k] == want[k], (k, got[k], want[k])
