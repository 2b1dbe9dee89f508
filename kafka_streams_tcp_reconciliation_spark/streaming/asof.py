"""Streaming as-of enrichment — the incremental twin of
``operators/joins.asof_join`` / ``asof_last_click_before_purchase``
(SURVEY.md §2.3 J9 + §2.9 T2).

The batch form sorts (ts, side, tiebreak) per key and carries the latest
right row forward; the streaming form IS that carry, kept in per-key
state: one (ts_us, event_id) pair per user — the most recent click seen.
Each purchase probes the state and emits its enrichment immediately.
O(1) state per key (vs the windowed join's O(window) buffer) — the
cheapest stateful operator in the engine, and the shape a 100 TB
clickstream enrichment actually deploys (state size = #active keys, not
event volume).

Ordering contract (same as batch): rows process in (ts, side, event_id)
order with clicks before purchases at equal timestamps, so an
equal-instant click is visible to its purchase ("at or before" includes
same-instant) and the highest event_id wins among equal-ts clicks.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("purchase_id", T.LongType()),
        T.StructField("user_id", T.LongType()),
        T.StructField("last_click_id", T.LongType()),
    ]
)

STATE_SCHEMA = T.StructType(
    [
        T.StructField("click_ts_us", T.LongType()),
        T.StructField("click_id", T.LongType()),
    ]
)


def asof_enrich_stream(events: DataFrame) -> DataFrame:
    """Each purchase picks up the user's latest click at or before its
    event time, carried across micro-batches in O(1) per-key state.
    Inner semantics (purchases before any click emit nothing), matching
    the batch ``asof_last_click_before_purchase``."""

    def fsm(
        key: tuple[Any, ...],
        batches: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        (user_id,) = key
        click_ts_us, click_id = state.get if state.exists else (None, None)
        rows: list[dict[str, Any]] = []
        for pdf in batches:
            # clicks sort before purchases at equal ts (side 0 < 1), then
            # event_id — the batch carry's exact order
            pdf = pdf.assign(__side=(pdf["event_type"] == "purchase").astype(int))
            pdf = pdf.sort_values(["ts", "__side", "event_id"])
            for r in pdf.itertuples(index=False):
                if r.event_type == "click":
                    click_ts_us = int(pd.Timestamp(r.ts).value // 1000)
                    click_id = int(r.event_id)
                elif r.event_type == "purchase" and click_id is not None:
                    rows.append(
                        {
                            "purchase_id": int(r.event_id),
                            "user_id": user_id,
                            "last_click_id": click_id,
                        }
                    )
        if click_id is not None:
            state.update((click_ts_us, click_id))
        yield pd.DataFrame(
            rows, columns=["purchase_id", "user_id", "last_click_id"]
        )

    return (
        events.filter(F.col("event_type").isin("click", "purchase"))
        .select("user_id", "event_id", "event_type", "ts")
        .groupBy("user_id")
        .applyInPandasWithState(
            fsm,
            outputStructType=OUTPUT_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
