"""Streaming event-aligned sliding window — the incremental twin of
``plans/events.sliding_window_event_counts`` (SURVEY.md §2.5 W2, the
SlidingWindows.ofTimeDifference half).

Kafka Streams materializes sliding windows by scanning a window store per
event; the Spark batch form is a RANGE frame. The streaming form keeps,
per user, exactly the events inside the trailing horizon (a time-bounded
deque) and emits each arriving event's trailing (count, sum) on arrival.

RANGE-frame peer semantics are preserved: events sharing an event-time
microsecond are processed as one group — every peer's frame includes ALL
peers, matching both engines' SQL-standard RANGE behaviour.

State is bounded by the horizon (events inside 30 min per key), never
stream length: arrivals evict eagerly, and an event-time timer (T3)
clears what idle keys leave behind once the watermark passes their
horizon, so abandoned keys drop to empty state.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

HORIZON_US = 1_800 * 1_000_000  # 30 min, matching the batch RANGE frame

OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("event_id", T.LongType()),
        T.StructField("n_30m", T.LongType()),
        T.StructField("sum_value_30m", T.DoubleType()),
    ]
)

# v_valid: 1 where value was non-NULL. SQL window sums IGNORE NULLs and
# return NULL for an all-NULL frame — the deque mirrors that exactly
# instead of crashing on int(NaN) or silently zero-filling.
STATE_SCHEMA = T.StructType(
    [
        T.StructField("t_us", T.ArrayType(T.LongType())),
        T.StructField("v_micro", T.ArrayType(T.LongType())),
        T.StructField("v_valid", T.ArrayType(T.LongType())),
    ]
)


def sliding_window_stream(events: DataFrame) -> DataFrame:
    """Per-user trailing 30-minute (count, exact micro-unit sum) emitted
    once per event — converges to the batch RANGE-frame query under
    in-order replay."""

    def fsm(
        key: tuple[Any, ...],
        batches: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        (user_id,) = key
        if state.exists:
            t_us, v_micro, v_valid = state.get
            t_us, v_micro, v_valid = list(t_us), list(v_micro), list(v_valid)
        else:
            t_us, v_micro, v_valid = [], [], []
        out: list[dict[str, Any]] = []
        wm_ms = state.getCurrentWatermarkMs()

        if state.hasTimedOut:
            # nothing older than (watermark - horizon) can enter a future
            # frame: future events carry ts >= watermark
            cut = wm_ms * 1000 - HORIZON_US
            keep = [
                (t, v, g)
                for t, v, g in zip(t_us, v_micro, v_valid)
                if t >= cut
            ]
            if keep:
                t_us = [t for t, _, _ in keep]
                v_micro = [v for _, v, _ in keep]
                v_valid = [g for _, _, g in keep]
                state.update((t_us, v_micro, v_valid))
                state.setTimeoutTimestamp(
                    max((min(t_us) + HORIZON_US) // 1000 + 1, wm_ms + 1)
                )
            else:
                state.remove()
            yield pd.DataFrame(
                out, columns=["user_id", "event_id", "n_30m", "sum_value_30m"]
            )
            return

        for pdf in batches:
            pdf = pdf.sort_values(["ts", "event_id"])
            # one group per event-time microsecond: peers share a frame
            for ts_val, grp in pdf.groupby("ts", sort=True):
                cur = int(pd.Timestamp(ts_val).value // 1000)
                cut = cur - HORIZON_US
                while t_us and t_us[0] < cut:
                    t_us.pop(0)
                    v_micro.pop(0)
                    v_valid.pop(0)
                for r in grp.itertuples(index=False):
                    t_us.append(cur)
                    if pd.isna(r.value):
                        v_micro.append(0)
                        v_valid.append(0)
                    else:
                        v_micro.append(int(round(r.value * 1_000_000)))
                        v_valid.append(1)
                n = len(t_us)
                n_valid = sum(v_valid)
                s = sum(v_micro)
                sum_out = (
                    round(s / 1_000_000.0, 6) if n_valid else None
                )
                for r in grp.sort_values("event_id").itertuples(index=False):
                    out.append(
                        {
                            "user_id": user_id,
                            "event_id": int(r.event_id),
                            "n_30m": n,
                            "sum_value_30m": sum_out,
                        }
                    )
        if t_us:
            state.update((t_us, v_micro, v_valid))
            state.setTimeoutTimestamp(
                max((min(t_us) + HORIZON_US) // 1000 + 1, wm_ms + 1)
            )
        else:
            if state.exists:
                state.remove()
        yield pd.DataFrame(
            out, columns=["user_id", "event_id", "n_30m", "sum_value_30m"]
        )

    return (
        events.select("user_id", "event_id", "ts", "value")
        .withWatermark("ts", "0 seconds")
        .groupBy("user_id")
        .applyInPandasWithState(
            fsm,
            outputStructType=OUTPUT_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
    )
