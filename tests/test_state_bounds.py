"""Long-horizon state-boundedness for every FSM twin (r06 VERDICT task 5).

The replay fuzzer proves the FSMs CONVERGE; this file proves their state
stays BOUNDED over a long stream — the 100 TB failure class where a
state store grows with stream length (a leaked buffer, an eviction that
never fires) and the job dies days into production.

Method: replay the same event corpus as N time-shifted copies (each copy
a micro-batch 40 days after the previous, so the event-time watermark
sweeps far past every prior copy's horizon), then read the checkpoint's
state store with the `statestore` data source and measure (state rows,
serialized state size). A 5× longer stream must NOT carry measurably
more state than a short one:

- EventTimeTimeout FSMs (sliding, nearest) evict idle keys once the
  watermark passes their horizon;
- self-evicting buffers (attribution's trailing click window) trim on
  every event;
- last-value / fixed-k FSMs (asof, transitions, scd2, reservoir) hold
  O(keys) rows regardless of length.

Either way the bound is key-count/horizon-shaped, never stream-length-
shaped — exactly what these assertions pin.
"""

from __future__ import annotations

import os

import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

SHIFT_US = 40 * 24 * 3600 * 1_000_000  # 40 days > every FSM horizon
SHORT, LONG = 2, 10


def _fsm_builders():
    from kafka_streams_tcp_reconciliation_spark.streaming.asof import (
        asof_enrich_stream,
    )
    from kafka_streams_tcp_reconciliation_spark.streaming.attribution import (
        attribution_stream,
    )
    from kafka_streams_tcp_reconciliation_spark.streaming.nearest import (
        nearest_enrich_stream,
    )
    from kafka_streams_tcp_reconciliation_spark.streaming.reservoir import (
        reservoir_sample_stream,
    )
    from kafka_streams_tcp_reconciliation_spark.streaming.sequences import (
        scd2_stream,
        transition_stream,
    )
    from kafka_streams_tcp_reconciliation_spark.streaming.sliding import (
        sliding_window_stream,
    )

    return {
        "sliding": sliding_window_stream,
        "nearest": nearest_enrich_stream,
        "asof": asof_enrich_stream,
        "transitions": transition_stream,
        "scd2": scd2_stream,
        "attribution": attribution_stream,
        "reservoir": reservoir_sample_stream,
    }


def _write_copies(base: pd.DataFrame, chunk_dir: str, n_copies: int) -> None:
    os.makedirs(chunk_dir)
    for k in range(n_copies):
        part = base.copy()
        part["ts"] = (
            part["ts"] + pd.Timedelta(microseconds=k * SHIFT_US)
        ).astype("datetime64[us]")  # keep µs physical type (ns is illegal
        # for the streaming parquet reader's TIMESTAMP_NTZ schema)
        part["event_id"] = part["event_id"] + k * 10_000_000
        p = os.path.join(chunk_dir, f"chunk_{k:02d}.parquet")
        pq.write_table(pa.Table.from_pandas(part, preserve_index=False), p)
        os.utime(p, (1_600_000_000 + k * 10,) * 2)


def _state_metrics(spark, build, chunk_dir: str, ckpt: str, qname: str):
    from kafka_streams_tcp_reconciliation_spark.streaming.source import (
        event_stream_from_dir,
    )

    stream = event_stream_from_dir(spark, os.path.join(chunk_dir, "chunk_*"))
    q = (
        build(stream)
        .writeStream.format("memory")
        .queryName(qname)
        .outputMode("append")
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(timeout=600)
    rows = spark.read.format("statestore").load(ckpt).collect()
    # str(value) length is a generic, schema-agnostic monotone proxy for
    # per-key state size (buffer arrays render element-by-element)
    return len(rows), sum(len(str(r.value)) for r in rows)


@pytest.fixture(scope="module")
def base_events(sf_dir) -> pd.DataFrame:
    ev = pq.read_table(os.path.join(sf_dir, "events.parquet")).to_pandas()
    return ev.sort_values(["ts", "event_id"]).reset_index(drop=True)[
        ["event_id", "ts", "user_id", "event_type", "value", "props"]
    ]


@pytest.mark.parametrize("name", sorted(_fsm_builders()))
def test_fsm_state_is_bounded_over_long_streams(
    name, spark, base_events, tmp_path
):
    build = _fsm_builders()[name]
    metrics = {}
    for tag, n_copies in (("short", SHORT), ("long", LONG)):
        chunk_dir = str(tmp_path / f"chunks_{tag}")
        _write_copies(base_events, chunk_dir, n_copies)
        metrics[tag] = _state_metrics(
            spark,
            build,
            chunk_dir,
            str(tmp_path / f"ckpt_{tag}"),
            f"t_bound_{name}_{tag}",
        )
    (rows_s, bytes_s), (rows_l, bytes_l) = metrics["short"], metrics["long"]
    # a 5x longer stream may not hold measurably more state: the bound is
    # keys x horizon, never stream length (linear growth would read ~5x)
    assert rows_l <= rows_s * 1.5 + 2, (name, metrics)
    assert bytes_l <= bytes_s * 1.5 + 512, (name, metrics)
