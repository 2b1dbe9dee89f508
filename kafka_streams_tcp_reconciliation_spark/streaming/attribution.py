"""Streaming positional multi-touch attribution — the incremental twin of
``plans/mlprep.positional_attribution_daily`` (SURVEY.md §2.9 T2 applied
to the U-shaped credit model).

Unlike the nearest-in-time join (which must WAIT for a possible forward
candidate), positional attribution only consumes clicks AT OR BEFORE the
purchase — so every purchase resolves the moment it arrives: the per-user
state is just the clicks of the trailing attribution window (a deque
bounded by window × click rate; older clicks evict as event time
advances). Credits are the identical integer-ppm U-shape as the batch
operator, so full replay converges bit-for-bit on the per-touch credit
set.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

WINDOW_US = 30 * 60 * 1_000_000  # 30 min, matching the batch op
FIRST_PPM = 400_000
LAST_PPM = 400_000
MID_POOL_PPM = 200_000

OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("purchase_id", T.LongType()),
        T.StructField("click_id", T.LongType()),
        T.StructField("day", T.StringType()),
        T.StructField("position_class", T.StringType()),
        T.StructField("credit_ppm", T.LongType()),
    ]
)

STATE_SCHEMA = T.StructType(
    [
        T.StructField("c_ids", T.ArrayType(T.LongType())),
        T.StructField("c_ts_us", T.ArrayType(T.LongType())),
    ]
)


def _credit(pos: int, n: int) -> tuple[str, int]:
    """U-shaped ppm credit for touch `pos` (1-based) of `n` — the exact
    integer schedule of the batch operator."""
    if n == 1:
        return "only", 1_000_000
    if n == 2:
        return ("first" if pos == 1 else "last"), 500_000
    if pos == 1:
        return "first", FIRST_PPM
    if pos == n:
        return "last", LAST_PPM
    share = MID_POOL_PPM // (n - 2)
    if pos == 2:
        share += MID_POOL_PPM % (n - 2)
    return "middle", share


def attribution_stream(events: DataFrame) -> DataFrame:
    """Per-touch U-shaped credits, emitted at each purchase from the
    trailing-window click buffer kept in per-user state."""

    def fsm(
        key: tuple[Any, ...],
        batches: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        if state.exists:
            c_ids, c_ts = [list(x) for x in state.get]
        else:
            c_ids, c_ts = [], []
        out: list[dict[str, Any]] = []
        for pdf in batches:
            pdf = pdf.assign(__side=(pdf["event_type"] == "purchase").astype(int))
            pdf = pdf.sort_values(["ts", "__side", "event_id"])
            for r in pdf.itertuples(index=False):
                ts_us = int(pd.Timestamp(r.ts).value // 1000)
                # evict clicks that fell out of every future window
                cut = ts_us - WINDOW_US
                while c_ts and c_ts[0] <= cut:
                    c_ts.pop(0)
                    c_ids.pop(0)
                if r.event_type == "click":
                    c_ids.append(int(r.event_id))
                    c_ts.append(ts_us)
                else:  # purchase resolves instantly from the buffer
                    n = len(c_ids)
                    for pos, (cid, cts) in enumerate(
                        zip(c_ids, c_ts), start=1
                    ):
                        cls, ppm = _credit(pos, n)
                        day = str(
                            pd.Timestamp(cts * 1000).date()
                        )
                        out.append(
                            {
                                "purchase_id": int(r.event_id),
                                "click_id": cid,
                                "day": day,
                                "position_class": cls,
                                "credit_ppm": ppm,
                            }
                        )
        state.update((c_ids, c_ts))
        yield pd.DataFrame(
            out,
            columns=[
                "purchase_id",
                "click_id",
                "day",
                "position_class",
                "credit_ppm",
            ],
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


__all__ = ["attribution_stream"]
