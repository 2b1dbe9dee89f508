"""Arbitrary stateful processing — SURVEY.md §2.9 T2/T3.

The Kafka Streams Processor API surface (``KStream#process`` with a
``KeyValueStore`` + ``ProcessorContext#schedule`` punctuation timers) maps
to ``applyInPandasWithState``: per-key mutable state across micro-batches
plus ``GroupStateTimeout`` for timer-driven emission.

``pending_match_processor`` is the reference's connection-tracking shape as
a per-key FSM: probe records wait in state for their counterpart; a match
emits a latency sample; a processing-time timeout flushes the unmatched
(the punctuation-driven "declare it lost" path that a pure join cannot
express).
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql import types as T

OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("kind", T.StringType()),  # matched | timeout
        T.StructField("probe_id", T.LongType()),
        T.StructField("match_id", T.LongType()),
        T.StructField("lag_us", T.LongType()),
    ]
)

STATE_SCHEMA = T.StructType(
    [
        T.StructField("pending_ids", T.ArrayType(T.LongType())),
        T.StructField("pending_ts_us", T.ArrayType(T.LongType())),
    ]
)


def pending_match_stream(events: DataFrame) -> DataFrame:
    """T2+T3: per-key FSM over the event stream with timer-driven flush.

    The processor is a CLOSURE so cloudpickle ships it by value — executors
    of an external driver session don't have this package on sys.path.
    """
    def match_fsm(
        key: tuple[Any, ...],
        batches: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        """Per-key matcher: 'purchase' rows wait in state; a 'click' row matches
        the oldest pending purchase (FIFO, like seq-number order); a timeout
        flushes all pending as unmatched."""
        (user_id,) = key
        if state.hasTimedOut:
            pending_ids, pending_ts = state.get if state.exists else ([], [])
            state.remove()
            out = pd.DataFrame(
                {
                    "user_id": [user_id] * len(pending_ids),
                    "kind": ["timeout"] * len(pending_ids),
                    "probe_id": pending_ids,
                    "match_id": [None] * len(pending_ids),
                    "lag_us": [None] * len(pending_ids),
                }
            )
            yield out
            return

        pending_ids, pending_ts = (state.get if state.exists else ([], []))
        pending_ids, pending_ts = list(pending_ids), list(pending_ts)
        rows: list[dict[str, Any]] = []
        for pdf in batches:
            pdf = pdf.sort_values("ts")
            for r in pdf.itertuples(index=False):
                ts_us = int(pd.Timestamp(r.ts).value // 1000)
                if r.event_type == "purchase":
                    pending_ids.append(int(r.event_id))
                    pending_ts.append(ts_us)
                elif r.event_type == "click" and pending_ids:
                    pid = pending_ids.pop(0)
                    pts = pending_ts.pop(0)
                    rows.append(
                        {
                            "user_id": user_id,
                            "kind": "matched",
                            "probe_id": pid,
                            "match_id": int(r.event_id),
                            "lag_us": ts_us - pts,
                        }
                    )
        state.update((pending_ids, pending_ts))
        state.setTimeoutDuration(60_000)  # punctuation: flush unmatched after 60s idle
        yield pd.DataFrame(rows, columns=["user_id", "kind", "probe_id", "match_id", "lag_us"])

    return (
        events.select("user_id", "event_id", "event_type", "ts")
        .groupBy("user_id")
        .applyInPandasWithState(
            match_fsm,
            outputStructType=OUTPUT_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.ProcessingTimeTimeout,
        )
    )
