"""Streaming event-aligned sliding window — the incremental twin of
``plans/events.sliding_window_event_counts`` (SURVEY.md §2.5 W2, the
SlidingWindows.ofTimeDifference half).

Kafka Streams materializes sliding windows by scanning a window store per
event; the Spark batch form is a RANGE frame. The streaming form keeps,
per user, the events inside the trailing horizon plus the not-yet-final
tail, and emits each event's trailing (count, sum) once its frame is
provably complete.

RANGE-frame peer semantics are preserved across micro-batch boundaries by
buffering at the watermark frontier: a timestamp group is emitted only
once the watermark has passed it strictly, at which point Spark drops any
further row at that timestamp as late — so every peer that will ever be
admitted is already in the frame. Events at or ahead of the watermark
stay pending (the standard append-mode finalization contract, identical
to how Spark finalizes windowed aggregates); an event-time timer (T3)
flushes them as the watermark advances even if the key never receives
another event.

State is bounded by the horizon plus the pending frontier tail (events
inside 30 min of the watermark per key), never stream length: flushes
evict eagerly, and the timer clears what idle keys leave behind once the
watermark passes their horizon, so abandoned keys drop to empty state.
"""

from __future__ import annotations

import bisect
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
# return NULL for an all-NULL frame — the log mirrors that exactly
# instead of crashing on int(NaN) or silently zero-filling.
# emitted_to_us: frontier marker — every event with t < emitted_to_us has
# already produced its output row (kept in the log only while still inside
# some future frame's horizon).
STATE_SCHEMA = T.StructType(
    [
        T.StructField("t_us", T.ArrayType(T.LongType())),
        T.StructField("v_micro", T.ArrayType(T.LongType())),
        T.StructField("v_valid", T.ArrayType(T.LongType())),
        T.StructField("e_id", T.ArrayType(T.LongType())),
        T.StructField("emitted_to_us", T.LongType()),
    ]
)

_NEG_INF = -(2**62)


def sliding_window_stream(events: DataFrame) -> DataFrame:
    """Per-user trailing 30-minute (count, exact micro-unit sum) emitted
    once per event when the watermark finalizes its frame — converges to
    the batch RANGE-frame query for every event the watermark has passed
    (the tail at/after the final watermark is legitimately still
    pending)."""

    def fsm(
        key: tuple[Any, ...],
        batches: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        (user_id,) = key
        if state.exists:
            t_us, v_micro, v_valid, e_id, emitted_to = state.get
            rows = sorted(
                zip(t_us, e_id, v_micro, v_valid), key=lambda r: (r[0], r[1])
            )
        else:
            rows = []
            emitted_to = _NEG_INF
        wm_ms = state.getCurrentWatermarkMs()
        wm_us = wm_ms * 1000

        if not state.hasTimedOut:
            for pdf in batches:
                for r in pdf.itertuples(index=False):
                    cur = int(pd.Timestamp(r.ts).value // 1000)
                    if pd.isna(r.value):
                        rows.append((cur, int(r.event_id), 0, 0))
                    else:
                        rows.append(
                            (
                                cur,
                                int(r.event_id),
                                int(round(r.value * 1_000_000)),
                                1,
                            )
                        )
            # new events are never late (ts >= the admitting watermark >=
            # emitted_to), so sorting keeps the emitted prefix a prefix
            rows.sort(key=lambda r: (r[0], r[1]))

        # flush: finalize every pending frame the watermark has passed.
        # A group at t is complete once wm > t — any further peer at t
        # would be dropped as late — so its RANGE frame [t - H, t] is
        # exactly the batch frame.
        out: list[dict[str, Any]] = []
        ts_sorted = [r[0] for r in rows]
        for i, (t, eid, _v, _g) in enumerate(rows):
            if t < emitted_to or t >= wm_us:
                continue
            lo = bisect.bisect_left(ts_sorted, t - HORIZON_US)
            hi = bisect.bisect_right(ts_sorted, t)
            frame = rows[lo:hi]
            n_valid = sum(g for _, _, _, g in frame)
            s = sum(v for _, _, v, _ in frame)
            out.append(
                {
                    "user_id": user_id,
                    "event_id": eid,
                    "n_30m": len(frame),
                    "sum_value_30m": (
                        round(s / 1_000_000.0, 6) if n_valid else None
                    ),
                }
            )
        emitted_to = max(emitted_to, wm_us)

        # evict: future frames (pending or not-yet-arrived) all sit at
        # ts >= wm, so nothing below wm - horizon can ever be framed again
        cut = wm_us - HORIZON_US
        start = bisect.bisect_left(ts_sorted, cut)
        rows = rows[start:]

        if rows:
            state.update(
                (
                    [r[0] for r in rows],
                    [r[2] for r in rows],
                    [r[3] for r in rows],
                    [r[1] for r in rows],
                    emitted_to,
                )
            )
            # wake at whichever comes first: the earliest pending frame's
            # finalization (wm passes its ts) or the earliest retained
            # event's horizon expiry (state eviction for idle keys)
            pending = [t for t, _, _, _ in rows if t >= emitted_to]
            wakes = [(rows[0][0] + HORIZON_US) // 1000 + 1]
            if pending:
                # fires when wm_ms > t//1000, i.e. wm_us > t — the exact
                # finalization point (a +1 here could strand the group if
                # the stream ends within the same millisecond)
                wakes.append(pending[0] // 1000)
            state.setTimeoutTimestamp(max(min(wakes), wm_ms + 1))
        elif state.exists:
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
