"""Streaming KTable-KTable join (SURVEY.md §2.3 J5 — the known-hard one).

Kafka Streams joins two changelog tables by keeping the latest value per
key on each side and re-emitting the joined row whenever either side
updates. Spark has no built-in dual-changelog join, so this composes it
from the engine's own primitives: tag and union the two changelogs (one
co-partitioned shuffle on the key — exactly the reference's
co-partitioning contract), then an ``applyInPandasWithState`` keeper with
two state slots per key that emits on every update once both sides are
populated (inner-join semantics; update-mode changelog output). A NULL
value is a KTable tombstone: it clears its side's slot and retracts the
join row (null-valued emission) if one existed.

State is two scalars per key — constant memory, 100 TB-safe. Batch
snapshot semantics of the same operator: ``latest_by_key`` each side +
ordinary join (see plans join_fk_orders_customer / ktable queries).
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
        T.StructField("user_id", T.LongType()),
        T.StructField("left_value", T.DoubleType()),
        T.StructField("right_value", T.DoubleType()),
        T.StructField("left_ts_us", T.LongType()),
        T.StructField("right_ts_us", T.LongType()),
        # per-key monotone emission counter: the keeper is the sole
        # emitter for a key, so ordering by emit_seq alone is total —
        # same-timestamp upserts stay ordered downstream
        T.StructField("emit_seq", T.LongType()),
    ]
)

STATE_SCHEMA = T.StructType(
    [
        T.StructField("l_val", T.DoubleType()),
        T.StructField("l_ts", T.LongType()),
        T.StructField("r_val", T.DoubleType()),
        T.StructField("r_ts", T.LongType()),
        T.StructField("seq", T.LongType()),
    ]
)


def ktable_join_stream(
    left: DataFrame, right: DataFrame, key: str = "user_id"
) -> DataFrame:
    """J5: dual-changelog inner join. ``left``/``right`` are streams of
    (key, ts, value) upserts; output is the joined changelog (update
    semantics — downstream keeps the last row per key). The keeper is a
    by-value closure (executors need no access to this package)."""
    def join_keeper(
        key: tuple[Any, ...],
        batches: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        """Latest-per-side keeper: consume tagged changelog rows in event-time
        order, update the side's slot, emit the joined row per update when
        both slots are filled (KTable inner-join emission rule)."""
        (user_id,) = key
        l_val, l_ts, r_val, r_ts, seq = (
            state.get if state.exists else (None, None, None, None, 0)
        )
        out: list[dict[str, Any]] = []
        for pdf in batches:
            pdf = pdf.sort_values("ts")
            for r in pdf.itertuples(index=False):
                ts_us = int(pd.Timestamp(r.ts).value // 1000)
                # a null value is a KTable tombstone: it clears the
                # side's slot and (if the join row existed) retracts it
                had_join = l_val is not None and r_val is not None
                if r.side == "l":
                    if l_ts is None or ts_us >= l_ts:
                        l_val = None if pd.isna(r.value) else float(r.value)
                        l_ts = ts_us
                else:
                    if r_ts is None or ts_us >= r_ts:
                        r_val = None if pd.isna(r.value) else float(r.value)
                        r_ts = ts_us
                if l_val is not None and r_val is not None:
                    seq += 1
                    out.append(
                        {
                            "user_id": user_id,
                            "left_value": l_val,
                            "right_value": r_val,
                            "left_ts_us": l_ts,
                            "right_ts_us": r_ts,
                            "emit_seq": seq,
                        }
                    )
                elif had_join:
                    seq += 1
                    out.append(
                        {
                            "user_id": user_id,
                            "left_value": None,
                            "right_value": None,
                            "left_ts_us": ts_us,
                            "right_ts_us": ts_us,
                            "emit_seq": seq,
                        }
                    )
        state.update((l_val, l_ts, r_val, r_ts, seq))
        yield pd.DataFrame(
            out,
            columns=["user_id", "left_value", "right_value",
                     "left_ts_us", "right_ts_us", "emit_seq"],
        )

    tagged = left.select(
        F.col(key), F.col("ts"), F.col("value"), F.lit("l").alias("side")
    ).unionByName(
        right.select(F.col(key), F.col("ts"), F.col("value"), F.lit("r").alias("side"))
    )
    return tagged.groupBy(key).applyInPandasWithState(
        join_keeper,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
