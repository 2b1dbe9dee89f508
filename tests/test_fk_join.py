"""J6 streaming foreign-key KTable join (KIP-213 topology) — the final
emission per PK must equal the batch FK join of the two latest-per-key
snapshots, including PKs whose FK CHANGED mid-stream (the unsubscribe
path) and dimension updates after subscription (the re-broadcast path).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from kafka_streams_tcp_reconciliation_spark.operators.ktable import latest_by_key
from kafka_streams_tcp_reconciliation_spark.sources.tables import load_table
from kafka_streams_tcp_reconciliation_spark.streaming.fk_join import (
    SUB_SCHEMA,
    fk_join_stream,
    fk_subscription_stream,
)
from kafka_streams_tcp_reconciliation_spark.streaming.source import chunked_event_stream


def test_fk_join_converges_to_batch_snapshot(spark, sf_dir, tmp_path):
    # left KTable: latest event per user (PK=user_id, FK=event_type);
    # right KTable: latest event value per event_type. Users change event
    # types over time, so FK moves (unsubscribes) really happen.
    chunks = str(tmp_path / "chunks")
    topic = str(tmp_path / "subs_topic")

    # stage 1: subscription router, PK-keyed state, writes the
    # "repartition topic" (a replayable parquet dir here)
    left = chunked_event_stream(spark, sf_dir, chunks, n_chunks=3)
    q1 = (
        fk_subscription_stream(left, pk="user_id", fk="event_type")
        .writeStream.format("parquet")
        .option("path", topic)
        .option("checkpointLocation", str(tmp_path / "ckpt1"))
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q1.awaitTermination(timeout=300)

    # stage 2: FK-keyed joiner over subscriptions ∪ dimension changelog
    subs = spark.readStream.schema(SUB_SCHEMA).parquet(topic)
    right = chunked_event_stream(spark, sf_dir, chunks, n_chunks=3)
    q2 = (
        fk_join_stream(subs, right, rkey="event_type")
        .writeStream.format("memory")
        .queryName("t_fkjoin")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt2"))
        .trigger(availableNow=True)
        .start()
    )
    q2.awaitTermination(timeout=300)

    got = {
        r.pk: (r.fk, r.left_value, r.right_value)
        for r in spark.sql(
            """
            SELECT pk, fk, left_value, right_value FROM (
              SELECT *, row_number() OVER (
                  PARTITION BY pk
                  ORDER BY left_ts_us DESC, left_seq DESC,
                           right_ts_us DESC) AS rn
              FROM t_fkjoin
            ) WHERE rn = 1
            """
        ).collect()
    }

    ev = load_table(spark, sf_dir, "events")
    latest_user = latest_by_key(
        ev, ["user_id"], [F.col("ts").desc(), F.col("event_id").desc()]
    ).select("user_id", "event_type", "value")
    latest_type = latest_by_key(
        ev, ["event_type"], [F.col("ts").desc(), F.col("event_id").desc()]
    ).select("event_type", F.col("value").alias("rv"))
    want = {
        r.user_id: (r.event_type, r.value, r.rv)
        for r in latest_user.join(latest_type, "event_type").collect()
    }

    assert set(got) == set(want)
    n_moved = 0
    first_type = {
        r.user_id: r.event_type
        for r in latest_by_key(
            ev, ["user_id"], [F.col("ts").asc(), F.col("event_id").asc()]
        ).collect()
    }
    for k in want:
        assert got[k] == want[k], (k, got[k], want[k])
        if first_type[k] != want[k][0]:
            n_moved += 1
    # the fixture must actually exercise the FK-change/unsubscribe path
    assert n_moved > 0, "no user ever changed event_type — test is vacuous"


def test_fk_join_tombstone_retracts_join_row(spark, sf_dir, tmp_path):
    """A null left value is a KTable delete: after the tombstone the
    final emission for that PK must be a retraction (null values), and
    every surviving PK must still match the batch snapshot with the
    deleted users excluded."""
    ev = load_table(spark, sf_dir, "events")
    max_ts = ev.agg(F.max("ts")).first()[0]
    dead = [0, 1, 2]
    tombs = (
        ev.filter(F.col("user_id").isin(dead))
        .groupBy("user_id")
        .agg(F.first("event_type").alias("event_type"))
        .select(
            "user_id",
            "event_type",
            F.lit(max_ts + __import__("datetime").timedelta(hours=1)).alias("ts"),
            F.lit(None).cast("double").alias("value"),
        )
    )
    live = ev.select("user_id", "event_type", "ts", "value")
    chunk_dir = tmp_path / "left_chunks"
    chunk_dir.mkdir()
    for i, part in enumerate([live, tombs]):
        out = tmp_path / f"stage{i}"
        part.coalesce(1).write.parquet(str(out))
        (pf,) = out.glob("part-*.parquet")
        pf.rename(chunk_dir / f"c{i:02d}.parquet")

    left = (
        spark.readStream.schema(live.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(chunk_dir))
    )
    topic = str(tmp_path / "subs_topic")
    q1 = (
        fk_subscription_stream(left, pk="user_id", fk="event_type")
        .writeStream.format("parquet")
        .option("path", topic)
        .option("checkpointLocation", str(tmp_path / "ckpt1"))
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q1.awaitTermination(timeout=300)

    subs = spark.readStream.schema(SUB_SCHEMA).parquet(topic)
    right = chunked_event_stream(spark, sf_dir, str(tmp_path / "rchunks"), n_chunks=3)
    q2 = (
        fk_join_stream(subs, right, rkey="event_type")
        .writeStream.format("memory")
        .queryName("t_fkjoin_tomb")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt2"))
        .trigger(availableNow=True)
        .start()
    )
    q2.awaitTermination(timeout=300)

    final = {
        r.pk: (r.left_value, r.right_value)
        for r in spark.sql(
            """
            SELECT pk, left_value, right_value FROM (
              SELECT *, row_number() OVER (
                  PARTITION BY pk
                  ORDER BY left_ts_us DESC, left_seq DESC,
                           right_ts_us DESC) AS rn
              FROM t_fkjoin_tomb
            ) WHERE rn = 1
            """
        ).collect()
    }
    for u in dead:
        assert u in final and final[u] == (None, None), (u, final.get(u))

    latest_user = latest_by_key(
        ev, ["user_id"], [F.col("ts").desc(), F.col("event_id").desc()]
    ).select("user_id", "event_type", "value")
    latest_type = latest_by_key(
        ev, ["event_type"], [F.col("ts").desc(), F.col("event_id").desc()]
    ).select("event_type", F.col("value").alias("rv"))
    want = {
        r.user_id: (r.value, r.rv)
        for r in latest_user.join(latest_type, "event_type").collect()
        if r.user_id not in dead
    }
    survivors = {k: v for k, v in final.items() if v[0] is not None}
    assert survivors == want


def test_fk_join_same_timestamp_flapping(spark, sf_dir, tmp_path):
    """Two FK moves sharing one event timestamp (A->B->A) must end
    subscribed at A: the router's per-PK seq linearizes the sub/unsub
    chain that the timestamp alone cannot order."""
    import datetime

    from pyspark.sql import types as T

    schema = T.StructType(
        [
            T.StructField("user_id", T.LongType()),
            T.StructField("event_type", T.StringType()),
            T.StructField("ts", T.TimestampNTZType()),
            T.StructField("value", T.DoubleType()),
        ]
    )
    t0 = datetime.datetime(2024, 1, 1)
    left_rows = [
        (1, "A", t0, 10.0),          # subscribe A
        (1, "B", t0, 11.0),          # same-ts move to B
        (1, "A", t0, 12.0),          # same-ts move back to A
        (2, "B", t0, 20.0),          # control row
    ]
    right_rows = [
        ("A", t0, 100.0),
        ("B", t0, 200.0),
    ]
    chunk = tmp_path / "left_chunks"
    chunk.mkdir()
    out = tmp_path / "stage0"
    spark.createDataFrame(left_rows, schema).coalesce(1).write.parquet(str(out))
    (pf,) = out.glob("part-*.parquet")
    pf.rename(chunk / "c00.parquet")

    left = spark.readStream.schema(schema).parquet(str(chunk))
    topic = str(tmp_path / "subs_topic")
    q1 = (
        fk_subscription_stream(left, pk="user_id", fk="event_type")
        .writeStream.format("parquet")
        .option("path", topic)
        .option("checkpointLocation", str(tmp_path / "ckpt1"))
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q1.awaitTermination(timeout=300)

    rschema = T.StructType(
        [
            T.StructField("event_type", T.StringType()),
            T.StructField("ts", T.TimestampNTZType()),
            T.StructField("value", T.DoubleType()),
        ]
    )
    rchunk = tmp_path / "right_chunks"
    rchunk.mkdir()
    rout = tmp_path / "rstage0"
    spark.createDataFrame(right_rows, rschema).coalesce(1).write.parquet(str(rout))
    (rpf,) = rout.glob("part-*.parquet")
    rpf.rename(rchunk / "c00.parquet")

    subs = spark.readStream.schema(SUB_SCHEMA).parquet(topic)
    right = spark.readStream.schema(rschema).parquet(str(rchunk))
    q2 = (
        fk_join_stream(subs, right, rkey="event_type")
        .writeStream.format("memory")
        .queryName("t_fkjoin_flap")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt2"))
        .trigger(availableNow=True)
        .start()
    )
    q2.awaitTermination(timeout=300)

    final = {
        r.pk: (r.fk, r.left_value, r.right_value)
        for r in spark.sql(
            """
            SELECT pk, fk, left_value, right_value FROM (
              SELECT *, row_number() OVER (
                  PARTITION BY pk
                  ORDER BY left_ts_us DESC, left_seq DESC,
                           right_ts_us DESC) AS rn
              FROM t_fkjoin_flap
            ) WHERE rn = 1
            """
        ).collect()
    }
    assert final[1] == ("A", 12.0, 100.0), final
    assert final[2] == ("B", 20.0, 200.0), final
