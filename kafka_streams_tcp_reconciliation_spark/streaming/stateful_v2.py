"""Arbitrary stateful processing on the Spark 4.x StatefulProcessor API
(SURVEY.md §2.9 T2/T3 — transformWithStateInPandas).

Complements ``stateful.py`` (applyInPandasWithState): same Processor-API
capability ceiling, newer engine — typed state handles (value/list/map),
first-class timers, and initial-state bootstrap. The demo operator is the
reference's per-flow bookkeeping shape: track the running max sequence
number and count gaps (out-of-order or missing segments) per key —
a per-connection TCP state machine in the original domain.

Environment note: running this requires google.protobuf (Spark's
transform-with-state driver worker imports it); absent in this container,
so the convergence test self-skips and applyInPandasWithState is the
tested stateful path. The code is the production-intended form.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T
from pyspark.sql.streaming.stateful_processor import (
    StatefulProcessor,
    StatefulProcessorHandle,
)

GAP_OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("max_seq", T.LongType()),
        T.StructField("n_events", T.LongType()),
        T.StructField("n_gaps", T.LongType()),
    ]
)


def seq_gap_stream(events: DataFrame) -> DataFrame:
    """T2 on the v2 API: per-key running (max_seq, n_events, n_gaps);
    update-mode emission each micro-batch (KTable-style changelog).

    The processor class is defined INSIDE this function so cloudpickle
    serializes it by value — the external driver's workers don't have
    this package importable."""

    class SeqGapTracker(StatefulProcessor):
        """Per-key FSM: events carry a monotone-intended sequence
        (event_id); an arrival below the running max is a
        reordering/retransmit 'gap'."""

        def init(self, handle: StatefulProcessorHandle) -> None:
            self._state = handle.getValueState(
                "seq", "max_seq LONG, n_events LONG, n_gaps LONG"
            )

        def handleInputRows(
            self, key: Any, rows: Iterator[pd.DataFrame], timerValues
        ) -> Iterator[pd.DataFrame]:
            (user_id,) = key
            if self._state.exists():
                max_seq, n_events, n_gaps = self._state.get()
            else:
                max_seq, n_events, n_gaps = -1, 0, 0
            for pdf in rows:
                for seq in pdf["event_id"].astype("int64").sort_index():
                    n_events += 1
                    if seq < max_seq:
                        n_gaps += 1
                    else:
                        max_seq = int(seq)
            self._state.update((max_seq, n_events, n_gaps))
            yield pd.DataFrame(
                {
                    "user_id": pd.Series([user_id], dtype="int64"),
                    "max_seq": pd.Series([max_seq], dtype="int64"),
                    "n_events": pd.Series([n_events], dtype="int64"),
                    "n_gaps": pd.Series([n_gaps], dtype="int64"),
                }
            )

        def close(self) -> None:
            pass

    return (
        events.select("user_id", "event_id")
        .groupBy("user_id")
        .transformWithStateInPandas(
            statefulProcessor=SeqGapTracker(),
            outputStructType=GAP_OUTPUT_SCHEMA,
            outputMode="Update",
            timeMode="None",
        )
    )
