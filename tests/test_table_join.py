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
                  PARTITION BY user_id ORDER BY emit_seq DESC) AS rn
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


def test_ktable_join_tombstone_retracts(spark, sf_dir, tmp_path):
    """A null value on either side deletes that side's row and retracts
    the join row; re-upserting re-emits it."""
    from pyspark.sql import types as T

    schema = T.StructType(
        [
            T.StructField("user_id", T.LongType()),
            T.StructField("ts", T.TimestampNTZType()),
            T.StructField("value", T.DoubleType()),
            T.StructField("event_type", T.StringType()),
        ]
    )

    def mk(rows):
        import datetime

        return spark.createDataFrame(
            [
                (u, datetime.datetime(2024, 1, 1, 0, 0, s), v, et)
                for u, s, v, et in rows
            ],
            schema,
        )

    chunk_dir = tmp_path / "chunks"
    chunk_dir.mkdir()
    rows = [
        # user 1: both sides arrive, then LEFT tombstone, then re-upsert
        (1, 1, 10.0, "purchase"),
        (1, 2, 20.0, "click"),
        (1, 3, None, "purchase"),
        (1, 4, 11.0, "purchase"),
        # user 2: joined, then RIGHT tombstone — must end retracted
        (2, 1, 30.0, "purchase"),
        (2, 2, 40.0, "click"),
        (2, 3, None, "click"),
        # user 3: left only, tombstone — never joined, never emitted
        (3, 1, 50.0, "purchase"),
        (3, 2, None, "purchase"),
    ]
    for i, r in enumerate(rows):
        out = tmp_path / f"stage{i}"
        mk([r]).coalesce(1).write.parquet(str(out))
        (pf,) = out.glob("part-*.parquet")
        pf.rename(chunk_dir / f"c{i:02d}.parquet")

    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(chunk_dir))
    )
    left = stream.filter(F.col("event_type") == "purchase")
    right = stream.filter(F.col("event_type") == "click")
    q = (
        ktable_join_stream(left, right)
        .writeStream.format("memory")
        .queryName("t_ktjoin_tomb")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(timeout=300)
    final = {
        r.user_id: (r.left_value, r.right_value)
        for r in spark.sql(
            """
            SELECT user_id, left_value, right_value FROM (
              SELECT *, row_number() OVER (
                  PARTITION BY user_id ORDER BY emit_seq DESC) AS rn
              FROM t_ktjoin_tomb
            ) WHERE rn = 1
            """
        ).collect()
    }
    assert final[1] == (11.0, 20.0)      # re-upsert after delete re-joins
    assert final[2] == (None, None)      # right tombstone retracts
    assert 3 not in final                # never joined -> nothing emitted
