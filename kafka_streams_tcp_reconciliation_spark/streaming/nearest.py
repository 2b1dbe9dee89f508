"""Streaming nearest-in-time enrichment — the incremental twin of
``plans/mlprep.nearest_event_join`` (SURVEY.md §2.3 J9 generalized).

The batch form interleaves clicks and purchases per user and carries the
nearest click from BOTH directions. The streaming form keeps, per user:

- the latest click seen (the backward candidate carry — same O(1) state
  as ``streaming/asof.py``), and
- the purchases still awaiting their FORWARD candidate.

A purchase cannot resolve on arrival: a closer click may still be ahead.
It resolves at either of two decision points, whichever comes first:

1. the user's NEXT click — the first later click is by construction the
   nearest forward candidate, so comparing it against the backward
   candidate captured at purchase time decides the match exactly
   (ties → backward, matching batch); or
2. an event-time TIMER at ``purchase_ts + tolerance`` (T3 punctuation):
   once the watermark passes that point no in-tolerance forward click can
   still arrive, so the backward candidate (or NULL) is final — the same
   row the batch operator emits for that purchase.

The timer bounds both result latency and state: click-less users no
longer pin their purchases in state forever, so per-key state is
O(1 + purchases inside the tolerance horizon) — bounded by
tolerance × arrival rate, never stream length.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

TOL_US = 600 * 1_000_000  # ±10 min, matching plans/mlprep._NEAREST_TOL_US

OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("purchase_id", T.LongType()),
        T.StructField("user_id", T.LongType()),
        T.StructField("click_id", T.LongType()),
        T.StructField("gap_us", T.LongType()),
    ]
)

# carry: latest click; pending: parallel arrays of unresolved purchases
# (-1 sentinels encode "no backward candidate" — state structs can't hold
# per-element nulls portably across the Arrow state codec)
STATE_SCHEMA = T.StructType(
    [
        T.StructField("click_ts_us", T.LongType()),
        T.StructField("click_id", T.LongType()),
        T.StructField("p_ids", T.ArrayType(T.LongType())),
        T.StructField("p_ts_us", T.ArrayType(T.LongType())),
        T.StructField("p_back_ids", T.ArrayType(T.LongType())),
        T.StructField("p_back_gaps", T.ArrayType(T.LongType())),
    ]
)


def nearest_enrich_stream(events: DataFrame) -> DataFrame:
    """Per-user nearest-click (±tolerance, both directions) enrichment of
    purchases, resolved incrementally at each user's next click or — for
    users who never click again — at the event-time timer that proves no
    in-tolerance click can still arrive."""

    def fsm(
        key: tuple[Any, ...],
        batches: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        (user_id,) = key
        if state.exists:
            click_ts_us, click_id, p_ids, p_ts_us, p_back_ids, p_back_gaps = (
                state.get
            )
            p_ids, p_ts_us = list(p_ids), list(p_ts_us)
            p_back_ids, p_back_gaps = list(p_back_ids), list(p_back_gaps)
            if click_id is not None and click_id < 0:  # -1 sentinel
                click_ts_us, click_id = None, None
        else:
            click_ts_us, click_id = None, None
            p_ids, p_ts_us, p_back_ids, p_back_gaps = [], [], [], []
        out: list[dict[str, Any]] = []

        def backward_final(pid: int, bid: int, bgap: int) -> None:
            """Emit a purchase whose decision point passed with no forward
            click: backward candidate if in tolerance, else NULL."""
            if bid >= 0 and bgap <= TOL_US:
                out.append(
                    {"purchase_id": pid, "user_id": user_id,
                     "click_id": bid, "gap_us": -bgap}
                )
            else:
                out.append(
                    {"purchase_id": pid, "user_id": user_id,
                     "click_id": None, "gap_us": None}
                )

        def resolve_pending(fwd_ts_us: int, fwd_id: int) -> None:
            nonlocal p_ids, p_ts_us, p_back_ids, p_back_gaps
            for pid, pts, bid, bgap in zip(
                p_ids, p_ts_us, p_back_ids, p_back_gaps
            ):
                fwd_gap = fwd_ts_us - pts
                back_ok = bid >= 0 and bgap <= TOL_US
                fwd_ok = fwd_gap <= TOL_US
                if back_ok and (not fwd_ok or bgap <= fwd_gap):
                    out.append(
                        {"purchase_id": pid, "user_id": user_id,
                         "click_id": bid, "gap_us": -bgap}
                    )
                elif fwd_ok:
                    out.append(
                        {"purchase_id": pid, "user_id": user_id,
                         "click_id": fwd_id, "gap_us": fwd_gap}
                    )
                else:  # decision point reached, nothing in tolerance
                    out.append(
                        {"purchase_id": pid, "user_id": user_id,
                         "click_id": None, "gap_us": None}
                    )
            p_ids, p_ts_us, p_back_ids, p_back_gaps = [], [], [], []

        wm_ms = state.getCurrentWatermarkMs()
        if state.hasTimedOut:
            # The watermark passed (earliest purchase_ts + TOL): every
            # pending purchase whose horizon expired can never gain an
            # in-tolerance forward click (in-order within watermark), so
            # its backward snapshot is final.
            wm_us = wm_ms * 1000
            keep: tuple[list[int], list[int], list[int], list[int]] = (
                [], [], [], [],
            )
            for pid, pts, bid, bgap in zip(
                p_ids, p_ts_us, p_back_ids, p_back_gaps
            ):
                if pts + TOL_US <= wm_us:
                    backward_final(pid, bid, bgap)
                else:
                    keep[0].append(pid)
                    keep[1].append(pts)
                    keep[2].append(bid)
                    keep[3].append(bgap)
            p_ids, p_ts_us, p_back_ids, p_back_gaps = keep
        else:
            for pdf in batches:
                pdf = pdf.assign(
                    __side=(pdf["event_type"] == "purchase").astype(int)
                )
                pdf = pdf.sort_values(["ts", "__side", "event_id"])
                for r in pdf.itertuples(index=False):
                    ts_us = int(pd.Timestamp(r.ts).value // 1000)
                    if r.event_type == "click":
                        # first later click == nearest forward candidate
                        # for everything pending
                        resolve_pending(ts_us, int(r.event_id))
                        click_ts_us, click_id = ts_us, int(r.event_id)
                    else:  # purchase: snapshot backward candidate, wait
                        if click_id is not None:
                            bid, bgap = click_id, ts_us - click_ts_us
                        else:
                            bid, bgap = -1, -1
                        p_ids.append(int(r.event_id))
                        p_ts_us.append(ts_us)
                        p_back_ids.append(bid)
                        p_back_gaps.append(bgap)
        state.update(
            (
                click_ts_us if click_ts_us is not None else -1,
                click_id if click_id is not None else -1,
                p_ids,
                p_ts_us,
                p_back_ids,
                p_back_gaps,
            )
        )
        if p_ids:
            # next decision point: earliest unresolved purchase's horizon
            # (must be strictly ahead of the current watermark or Spark
            # rejects the timestamp)
            desired_ms = (min(p_ts_us) + TOL_US) // 1000
            state.setTimeoutTimestamp(max(desired_ms, wm_ms + 1))
        yield pd.DataFrame(
            out, columns=["purchase_id", "user_id", "click_id", "gap_us"]
        )

    return (
        events.filter(F.col("event_type").isin("click", "purchase"))
        .select("user_id", "event_id", "event_type", "ts")
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
