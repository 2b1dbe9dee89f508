"""T4 exactly-once sink + T5 state-store reader tests."""

from __future__ import annotations

import pandas as pd
from pyspark.sql import functions as F

from kafka_streams_tcp_reconciliation_spark.streaming.sink import IdempotentBatchSink
from kafka_streams_tcp_reconciliation_spark.streaming.source import chunked_event_stream


def test_idempotent_sink_dedups_replayed_batches(spark, sf_dir, tmp_path):
    """Applying the same (batch_df, batch_id) twice must write once —
    the replay-after-restart path of exactly-once delivery."""
    out = str(tmp_path / "sink_out")
    sink = IdempotentBatchSink(out)
    batch = spark.range(0, 100).withColumn("v", F.col("id") * 2)

    sink(batch, batch_id=7)
    assert not sink.already_applied(3)
    assert sink.already_applied(7)
    sink(batch, batch_id=7)  # replay — must be a no-op
    sink(batch, batch_id=8)

    written = spark.read.parquet(f"{out}/data")
    assert written.count() == 200  # two distinct batches, no replay dup


def test_streaming_pipeline_through_idempotent_sink(spark, sf_dir, tmp_path):
    """End-to-end: chunked replay -> windowed agg -> foreachBatch sink with
    checkpoint; total delivered rows equal the one-shot batch result."""
    chunk_dir = str(tmp_path / "chunks")
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    stream = chunked_event_stream(spark, sf_dir, chunk_dir, n_chunks=3)
    counts = (
        stream.withWatermark("ts", "1 minute")
        .groupBy(F.window("ts", "1 hour"), "event_type")
        .agg(F.count(F.lit(1)).alias("n"))
        .select("window.start", "event_type", "n")
    )
    sink = IdempotentBatchSink(out)
    q = (
        counts.writeStream.foreachBatch(sink)
        .outputMode("update")
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(timeout=300)
    delivered = spark.read.parquet(f"{out}/data")
    # update-mode emits refinements; the latest row per (start,event_type)
    # must equal the batch result
    latest = (
        delivered.toPandas()
        .sort_values("n")
        .groupby(["start", "event_type"], as_index=False)
        .last()
    )
    batch = (
        spark.read.parquet(f"{chunk_dir}/chunk_*")
        .groupBy(F.date_trunc("hour", F.col("ts").cast("timestamp")).alias("start"), "event_type")
        .agg(F.count(F.lit(1)).alias("n"))
        .toPandas()
    )
    merged = latest.merge(batch, on=["start", "event_type"], suffixes=("_s", "_b"))
    assert len(merged) == len(batch)
    assert (merged.n_s == merged.n_b).all()


def test_state_store_reader(spark, sf_dir, tmp_path):
    """T5 interactive queries: read the streaming aggregation's state store
    from its checkpoint with the statestore data source."""
    chunk_dir = str(tmp_path / "chunks")
    ckpt = str(tmp_path / "ckpt")
    stream = chunked_event_stream(spark, sf_dir, chunk_dir, n_chunks=2)
    agg = stream.groupBy("event_type").agg(F.count(F.lit(1)).alias("n"))
    q = (
        agg.writeStream.format("memory")
        .queryName("t5_state")
        .outputMode("complete")
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(timeout=300)
    state = spark.read.format("statestore").load(ckpt)
    # state rows carry (key, value) structs; the value field names are
    # internal (aggregate buffer columns) — read positionally
    got = {r.key.event_type: r.value[0] for r in state.collect()}
    want = {
        r.event_type: r.n
        for r in spark.sql("SELECT * FROM t5_state").collect()
    }
    assert got == want


def test_rocksdb_state_store_provider_runs_stateful_query(spark, sf_dir, tmp_path):
    """S7 durability: the same windowed stateful pipeline must run (and
    produce identical results) with the RocksDB state store provider —
    the store the reference's RocksDB-backed KTables correspond to. Set
    per-test and restored, since tiny local tests don't need it."""
    key = "spark.sql.streaming.stateStore.providerClass"
    prev = spark.conf.get(key, None)
    spark.conf.set(
        key,
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider",
    )
    try:
        stream = chunked_event_stream(
            spark, sf_dir, str(tmp_path / "chunks"), n_chunks=3
        )
        counts = (
            stream.withWatermark("ts", "1 minute")
            .groupBy(F.window("ts", "1 hour"), "event_type")
            .agg(F.count(F.lit(1)).alias("n"))
            .select("window.start", "event_type", "n")
        )
        q = (
            counts.writeStream.format("memory")
            .queryName("t_rocksdb")
            .outputMode("complete")
            .option("checkpointLocation", str(tmp_path / "ckpt"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(timeout=300)
        got = {
            (r.start, r.event_type): r.n
            for r in spark.sql("SELECT * FROM t_rocksdb").collect()
        }
        from kafka_streams_tcp_reconciliation_spark.sources.tables import load_table

        want = {
            (r.start, r.event_type): r.n
            for r in load_table(spark, sf_dir, "events")
            .groupBy(F.window("ts", "1 hour"), "event_type")
            .agg(F.count(F.lit(1)).alias("n"))
            .select("window.start", "event_type", "n")
            .collect()
        }
        assert got == want and got
    finally:
        if prev is None:
            spark.conf.unset(key)
        else:
            spark.conf.set(key, prev)


def test_transition_fsm_state_survives_restart(spark, sf_dir, tmp_path):
    """Kill-and-resume for the sequence FSM: run the transition stream
    over the first half of the replay, stop, add the remaining chunks,
    and restart FROM THE SAME CHECKPOINT. The per-user last-event state
    must be restored — the combined emissions equal the batch transition
    matrix, including every pair that SPANS the restart boundary (those
    are only correct if state survived)."""
    import shutil

    from kafka_streams_tcp_reconciliation_spark.plans import all_queries
    from kafka_streams_tcp_reconciliation_spark.streaming.sequences import (
        transition_stream,
    )
    from kafka_streams_tcp_reconciliation_spark.streaming.source import (
        chunked_event_stream,
        event_stream_from_dir,
    )

    chunk_dir = str(tmp_path / "chunks")
    chunked_event_stream(spark, sf_dir, chunk_dir, n_chunks=4)  # writes chunks
    in_dir = tmp_path / "in"
    in_dir.mkdir()
    ckpt = str(tmp_path / "ckpt")

    out = str(tmp_path / "out")
    sink = IdempotentBatchSink(out)

    def run() -> None:
        # memory sink cannot recover from a checkpoint; the idempotent
        # foreachBatch parquet sink is the restart-capable path
        s = event_stream_from_dir(spark, str(in_dir / "chunk_*"))
        q = (
            transition_stream(s)
            .writeStream.foreachBatch(sink)
            .outputMode("append")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(timeout=300)

    for c in ("chunk_01", "chunk_02"):
        shutil.copytree(f"{chunk_dir}/{c}", in_dir / c)
    run()
    n_first = len(spark.read.parquet(f"{out}/data").toPandas())

    for c in ("chunk_03", "chunk_04"):
        shutil.copytree(f"{chunk_dir}/{c}", in_dir / c)
    run()
    delivered = spark.read.parquet(f"{out}/data").toPandas()
    assert n_first and len(delivered) > n_first

    combined = (
        delivered.groupby(["from_type", "to_type"], as_index=False)
        .size()
        .rename(columns={"size": "n"})
    )
    want = (
        all_queries()["event_transition_matrix"](spark, sf_dir)
        .toPandas()[["from_type", "to_type", "n"]]
    )
    combined["n"] = combined["n"].astype(want["n"].dtype)
    c = combined.sort_values(["from_type", "to_type"]).reset_index(drop=True)
    w = want.sort_values(["from_type", "to_type"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(c, w)
