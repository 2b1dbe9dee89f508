"""W3/W4 streaming semantics under controlled event-time replay:
session windows over the chunked stream, and explicit late-data drop.

These use hand-written parquet chunks (not the events table) so the
watermark positions are exact and the expected outputs are computable by
hand — SURVEY.md §5.3's 'controlled out-of-order input' requirement.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import functions as F

from kafka_streams_tcp_reconciliation_spark.streaming.source import event_stream_from_dir
from kafka_streams_tcp_reconciliation_spark.streaming.windows import (
    session_window_stats_stream,
    tumbling_window_stream,
)

BASE = pd.Timestamp("2026-01-01 00:00:00")


def _write_chunk(spark, path: str, rows: list[tuple[int, str, int]]) -> None:
    """rows: (event_id, ts_offset_minutes, user_id) as simplified events."""
    pdf = pd.DataFrame(
        {
            "event_id": [r[0] for r in rows],
            "ts": [BASE + pd.Timedelta(minutes=r[1]) for r in rows],
            "user_id": [r[2] for r in rows],
            "event_type": ["click"] * len(rows),
            "value": [1.0] * len(rows),
            "props": ["{}"] * len(rows),
        }
    )
    spark.createDataFrame(pdf).coalesce(1).write.mode("overwrite").parquet(path)


def _run(spark, df, name: str, mode: str) -> pd.DataFrame:
    q = (
        df.writeStream.format("memory")
        .queryName(name)
        .outputMode(mode)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(timeout=300)
    return spark.sql(f"SELECT * FROM {name}").toPandas()


def test_late_row_after_window_close_is_dropped(spark, tmp_path):
    """W4/T1: once the watermark closes a window (append emission + state
    eviction), a later row stamped inside it is discarded — the KS
    "outside grace period" drop.

    Measured nuance (Spark 4.1): a below-watermark row arriving while the
    window's state is still live MERGES into the final result (emission
    happens at the end of the batch that advances the watermark past the
    window). The hard drop applies only after eviction — hence the
    three-chunk sequence here: open -> advance+emit -> late arrival.
    """
    d = str(tmp_path / "late")
    # chunk 1: hour-0 rows + hour-10 rows (watermark still at epoch
    # during this batch; advances to ~09:40 after it)
    _write_chunk(spark, f"{d}/chunk_01", [(1, 5, 1), (2, 10, 1), (3, 600, 1), (4, 610, 1)])
    # chunk 2: fresh row; during this batch wm=09:40 closes hour 0 (n=2)
    _write_chunk(spark, f"{d}/chunk_02", [(5, 620, 1)])
    # chunk 3: a LATE hour-0 row — its window is already emitted+evicted
    _write_chunk(spark, f"{d}/chunk_03", [(6, 20, 1), (7, 630, 1)])
    stream = event_stream_from_dir(spark, f"{d}/chunk_*")
    got = _run(
        spark,
        tumbling_window_stream(stream, "1 hour", "30 minutes"),
        "t_late",
        "append",
    )
    hour0 = got[got["window_start"] == "2026-01-01 00:00:00"]
    # exactly one final result for hour 0 (append mode cannot revise) and
    # the post-eviction late row (event 6) is not in it
    assert len(hour0) == 1
    assert int(hour0.iloc[0]["n_events"]) == 2


def test_session_window_stream_closes_sessions(spark, tmp_path):
    """W3 streaming: a session closes (append emission) once the watermark
    passes its end; rows merging into one session aggregate together."""
    d = str(tmp_path / "sess")
    # user 1: rows at 0,10,20 min (one session, gap 30), then silence;
    # chunk 2 at minute 600 advances the watermark far past session end
    _write_chunk(spark, f"{d}/chunk_01", [(1, 0, 1), (2, 10, 1), (3, 20, 1)])
    _write_chunk(spark, f"{d}/chunk_02", [(4, 600, 2)])
    stream = event_stream_from_dir(spark, f"{d}/chunk_*")
    got = _run(
        spark,
        session_window_stats_stream(stream, "30 minutes", "30 minutes"),
        "t_sess",
        "append",
    )
    u1 = got[got["user_id"] == 1]
    assert len(u1) == 1, f"expected one closed session, got\n{got}"
    assert int(u1.iloc[0]["n_events"]) == 3
    assert u1.iloc[0]["session_start"] == "2026-01-01 00:00:00"


def test_streaming_anomaly_flags_match_batch_query(spark, sf_dir, tmp_path):
    """Replaying the corpus through the streaming flagger with the
    batch-trained profile must flag exactly the batch query's outlier
    set (same ids, same rounded z)."""
    from kafka_streams_tcp_reconciliation_spark.plans import all_queries
    from kafka_streams_tcp_reconciliation_spark.streaming.anomaly import (
        flag_anomalies_stream,
        value_profile,
    )
    from kafka_streams_tcp_reconciliation_spark.streaming.source import (
        chunked_event_stream,
    )

    stream = chunked_event_stream(spark, sf_dir, str(tmp_path / "chunks"), n_chunks=3)
    q = (
        flag_anomalies_stream(stream, value_profile(spark, sf_dir))
        .writeStream.format("memory")
        .queryName("t_anomaly")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(timeout=300)
    got = {
        r.event_id: r.z
        for r in spark.sql("SELECT event_id, z FROM t_anomaly").collect()
    }
    want = {
        r.event_id: r.z
        for r in all_queries()["value_zscore_outliers"](spark, sf_dir).collect()
    }
    assert got == want and got
