"""Streaming twins of the sequence analytics in ``plans/sequences.py``
(SURVEY.md §2.9 T2 — arbitrary stateful processing).

Two per-key FSMs over ``applyInPandasWithState``:

- ``transition_stream``: the incremental form of
  ``event_transition_matrix`` — per-user state is just the LAST event
  (type, ts, id); each micro-batch emits the (from, to) transition pairs
  it completes, including the one that spans the batch boundary. O(1)
  state per key; the downstream count is a plain windowless rollup of the
  emitted pairs.

- ``rolling_distinct_stream``: the incremental form of
  ``rolling_active_users_24h`` — events fan out (statelessly) to the 24
  hour-buckets they keep the user active for; per-bucket state is the set
  of users seen so far, and each batch re-emits the bucket's running
  distinct count (monotone, so the LAST emission per bucket is the
  answer). Exact distinct requires user-set state per bucket — the same
  memory the batch count-distinct shuffles; at 100 TB swap the set for an
  HLL sketch (``approx_count_distinct`` keeps this same topology) when
  ±2% is acceptable.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

_ROLL_HOURS = 24
_EPOCH_NTZ = "TIMESTAMP_NTZ '2024-01-01 00:00:00'"

TRANSITION_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("from_type", T.StringType()),
        T.StructField("to_type", T.StringType()),
    ]
)

TRANSITION_STATE = T.StructType(
    [
        T.StructField("last_ts_us", T.LongType()),
        T.StructField("last_event_id", T.LongType()),
        T.StructField("last_type", T.StringType()),
    ]
)


def transition_stream(events: DataFrame) -> DataFrame:
    """Per-user incremental transition extraction: emits one (from, to)
    row per consecutive event pair, carrying the last event across
    micro-batches in state.

    The processor is a closure so cloudpickle ships it by value (foreign
    drivers don't have this package on executor sys.path).
    """

    def fsm(
        key: tuple[Any, ...],
        batches: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        (user_id,) = key
        if state.exists:
            last_ts_us, last_eid, last_type = state.get
        else:
            last_ts_us, last_eid, last_type = None, None, None
        rows: list[dict[str, Any]] = []
        for pdf in batches:
            pdf = pdf.sort_values(["ts", "event_id"])
            for r in pdf.itertuples(index=False):
                if last_type is not None:
                    rows.append(
                        {
                            "user_id": user_id,
                            "from_type": last_type,
                            "to_type": r.event_type,
                        }
                    )
                last_ts_us = int(pd.Timestamp(r.ts).value // 1000)
                last_eid = int(r.event_id)
                last_type = r.event_type
        if last_type is not None:
            state.update((last_ts_us, last_eid, last_type))
        yield pd.DataFrame(rows, columns=["user_id", "from_type", "to_type"])

    return (
        events.select("user_id", "event_id", "event_type", "ts")
        .groupBy("user_id")
        .applyInPandasWithState(
            fsm,
            outputStructType=TRANSITION_SCHEMA,
            stateStructType=TRANSITION_STATE,
            outputMode="append",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


ROLLING_SCHEMA = T.StructType(
    [
        T.StructField("target_hb", T.LongType()),
        T.StructField("active_users", T.LongType()),
    ]
)

ROLLING_STATE = T.StructType(
    [T.StructField("seen_users", T.ArrayType(T.LongType()))]
)


def rolling_distinct_stream(events: DataFrame) -> DataFrame:
    """Incremental trailing-24h distinct users: stateless 24× fan-out to
    hour buckets, then a per-bucket user-set union in state; each batch
    re-emits the running count (monotone — take the last per bucket)."""
    fan = (
        events.select(
            F.expr(
                f"timestampdiff(HOUR, {_EPOCH_NTZ}, date_trunc('hour', ts))"
            ).alias("hb"),
            "user_id",
            F.explode(F.sequence(F.lit(0), F.lit(_ROLL_HOURS - 1))).alias("k"),
        )
        .select((F.col("hb") + F.col("k")).alias("target_hb"), "user_id")
    )

    def fsm(
        key: tuple[Any, ...],
        batches: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        (target_hb,) = key
        seen = set(state.get[0]) if state.exists else set()
        for pdf in batches:
            seen.update(int(u) for u in pdf["user_id"])
        state.update((sorted(seen),))
        yield pd.DataFrame(
            {"target_hb": [int(target_hb)], "active_users": [len(seen)]}
        )

    return fan.groupBy("target_hb").applyInPandasWithState(
        fsm,
        outputStructType=ROLLING_SCHEMA,
        stateStructType=ROLLING_STATE,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


SCD2_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("value", T.DoubleType()),
        T.StructField("valid_from", T.StringType()),
        T.StructField("valid_to", T.StringType()),
    ]
)

SCD2_STATE = T.StructType(
    [
        T.StructField("open_ts_us", T.LongType()),
        T.StructField("open_event_id", T.LongType()),
        T.StructField("open_value", T.DoubleType()),
    ]
)


def _fmt_us(ts_us: int) -> str:
    # always 6 fraction digits — str() would drop '.000000', diverging from
    # the batch twin's %f formatting on whole-second timestamps
    return pd.Timestamp(ts_us * 1000).strftime("%Y-%m-%d %H:%M:%S.%f")


def scd2_stream(events: DataFrame) -> DataFrame:
    """Incremental SCD2 maintenance (the streaming twin of
    ``scd2_purchase_value_history``): per-user state holds the OPEN
    interval (latest purchase); each newer purchase CLOSES it — emitting
    the finished validity row — and becomes the new open interval.

    Append mode emits exactly the closed intervals; the still-open row
    per user lives in state (queryable via the state-store reader,
    `tests/test_streaming_sink.py`). O(1) state per key — the same
    footprint as the as-of carry.
    """

    def fsm(
        key: tuple[Any, ...],
        batches: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        (user_id,) = key
        open_ts_us, open_eid, open_val = (
            state.get if state.exists else (None, None, None)
        )
        rows: list[dict[str, Any]] = []
        for pdf in batches:
            pdf = pdf.sort_values(["ts", "event_id"])
            for r in pdf.itertuples(index=False):
                ts_us = int(pd.Timestamp(r.ts).value // 1000)
                if open_ts_us is not None:
                    rows.append(
                        {
                            "user_id": user_id,
                            "value": float(open_val),
                            "valid_from": _fmt_us(open_ts_us),
                            "valid_to": _fmt_us(ts_us),
                        }
                    )
                open_ts_us, open_eid, open_val = ts_us, int(r.event_id), float(r.value)
        if open_ts_us is not None:
            state.update((open_ts_us, open_eid, open_val))
        yield pd.DataFrame(
            rows, columns=["user_id", "value", "valid_from", "valid_to"]
        )

    return (
        events.filter(F.col("event_type") == "purchase")
        .select("user_id", "event_id", "ts", "value")
        .groupBy("user_id")
        .applyInPandasWithState(
            fsm,
            outputStructType=SCD2_SCHEMA,
            stateStructType=SCD2_STATE,
            outputMode="append",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


FUNNEL_SCHEMA = T.StructType(
    [
        T.StructField("purchase_id", T.LongType()),
        T.StructField("user_id", T.LongType()),
        T.StructField("click_id", T.LongType()),
        T.StructField("view_id", T.LongType()),
    ]
)

FUNNEL_STATE = T.StructType(
    [
        T.StructField("view_ts_us", T.LongType()),
        T.StructField("view_id", T.LongType()),
        T.StructField("click_ts_us", T.LongType()),
        T.StructField("click_id", T.LongType()),
        T.StructField("click_view_ts_us", T.LongType()),
        T.StructField("click_view_id", T.LongType()),
    ]
)

_ATTR_WINDOW_US = 3_600_000_000  # 1 hour, matches the batch twin


def funnel_attribution_stream(events: DataFrame) -> DataFrame:
    """Incremental last-touch funnel attribution (the streaming twin of
    ``funnel_attribution_windowed``): one per-user FSM with three O(1)
    state slots — latest view, latest click, and the view that was
    latest WHEN that click happened (snapshotted at click time, because
    by purchase time a newer view may have displaced it). A purchase
    emits iff its click is within the window and that click's snapshot
    view is within the click's window — strict last-touch, identical to
    the two chained as-of joins."""

    def fsm(
        key: tuple[Any, ...],
        batches: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        (user_id,) = key
        if state.exists:
            v_ts, v_id, c_ts, c_id, cv_ts, cv_id = state.get
        else:
            v_ts = v_id = c_ts = c_id = cv_ts = cv_id = None
        rows: list[dict[str, Any]] = []
        for pdf in batches:
            pdf = pdf.assign(
                __side=pdf["event_type"].map({"view": 0, "click": 1, "purchase": 2})
            )
            # views before clicks before purchases at equal ts — the
            # union-and-carry sort order of the batch operator
            pdf = pdf.sort_values(["ts", "__side", "event_id"])
            for r in pdf.itertuples(index=False):
                ts_us = int(pd.Timestamp(r.ts).value // 1000)
                if r.event_type == "view":
                    v_ts, v_id = ts_us, int(r.event_id)
                elif r.event_type == "click":
                    c_ts, c_id = ts_us, int(r.event_id)
                    cv_ts, cv_id = v_ts, v_id  # snapshot last view NOW
                elif r.event_type == "purchase":
                    if (
                        c_id is not None
                        and ts_us - c_ts <= _ATTR_WINDOW_US
                        and cv_id is not None
                        and c_ts - cv_ts <= _ATTR_WINDOW_US
                    ):
                        rows.append(
                            {
                                "purchase_id": int(r.event_id),
                                "user_id": user_id,
                                "click_id": c_id,
                                "view_id": cv_id,
                            }
                        )
        state.update((v_ts, v_id, c_ts, c_id, cv_ts, cv_id))
        yield pd.DataFrame(
            rows, columns=["purchase_id", "user_id", "click_id", "view_id"]
        )

    return (
        events.filter(F.col("event_type").isin("view", "click", "purchase"))
        .select("user_id", "event_id", "event_type", "ts")
        .groupBy("user_id")
        .applyInPandasWithState(
            fsm,
            outputStructType=FUNNEL_SCHEMA,
            stateStructType=FUNNEL_STATE,
            outputMode="append",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


def rolling_dau_hll_stream(
    events: DataFrame,
    watermark: str = "25 hours",
) -> DataFrame:
    """The documented 100 TB scale path for rolling distinct users: a
    native hopping-window aggregation (24h window, 1h slide) with
    HyperLogLog++ cardinality instead of the exact user-set FSM.
    Constant ~KB state per open window versus O(users) — the trade is
    ±2% error (rsd=0.02). Update mode emits refinements; the final row
    per window is the estimate."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", "24 hours", "1 hour").alias("w"))
        .agg(F.approx_count_distinct("user_id", rsd=0.02).alias("approx_users"))
        .select(
            F.date_format("w.end", "yyyy-MM-dd HH:mm:ss").alias("window_end"),
            "approx_users",
        )
    )


GROWTH_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("day", T.StringType()),
        T.StructField("status", T.StringType()),
    ]
)

GROWTH_STATE = T.StructType([T.StructField("last_day", T.LongType())])

_GROWTH_GAP_DAYS = 7


def growth_stream(events: DataFrame) -> DataFrame:
    """Incremental growth accounting — the streaming twin of
    ``plans/sequences.growth_accounting_daily``. Per-user state is ONE
    int (last active day since epoch); each micro-batch emits a
    (user, day, status) row for every user-day it newly observes:
    'new' (no state), 'resurrected' (gap > 7 days), else 'retained'.
    A day re-seen in a later batch is skipped (already classified), so
    the emitted set is exactly the batch DISTINCT (user, day) set and
    the per-day status rollup converges to the batch decomposition.
    """

    def fsm(
        key: tuple[Any, ...],
        batches: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        (user_id,) = key
        last_day = state.get[0] if state.exists else None
        rows: list[dict[str, Any]] = []
        for pdf in batches:
            days = sorted(
                {int(pd.Timestamp(t).normalize().value // 86_400_000_000_000)
                 for t in pdf["ts"]}
            )
            for d in days:
                if last_day is not None and d <= last_day:
                    continue
                if last_day is None:
                    status = "new"
                elif d - last_day > _GROWTH_GAP_DAYS:
                    status = "resurrected"
                else:
                    status = "retained"
                rows.append(
                    {
                        "user_id": user_id,
                        "day": str(pd.Timestamp(d * 86_400_000_000_000)
                                   .date()),
                        "status": status,
                    }
                )
                last_day = d
        if last_day is not None:
            state.update((last_day,))
        yield pd.DataFrame(rows, columns=["user_id", "day", "status"])

    return (
        events.select("user_id", "ts")
        .groupBy("user_id")
        .applyInPandasWithState(
            fsm,
            outputStructType=GROWTH_SCHEMA,
            stateStructType=GROWTH_STATE,
            outputMode="append",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
