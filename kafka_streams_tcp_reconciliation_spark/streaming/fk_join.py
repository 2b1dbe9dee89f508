"""Streaming KTable foreign-key join (SURVEY.md §2.3 J6 in TRUE streaming
mode — Kafka Streams' KIP-213, the hardest join in the reference's DSL).

A FK join differs from the equi-key J5 join in two ways the simple
dual-changelog keeper cannot express:

1. The left table is keyed by its own PK but joins on a FIELD of the
   value (the FK). When a left upsert CHANGES the FK, the join row built
   against the old FK's dimension must be retracted — some operator has
   to remember "which FK did this PK reference last time".
2. When the dimension row for a FK changes, EVERY left row referencing
   it must be re-emitted (one-to-many fan-out on the right side's
   update).

Kafka Streams solves this with a two-stage topology split at repartition
topics: a subscription processor on the left (keyed by PK, emits
subscribe/unsubscribe messages re-keyed by FK) and a join processor on
the right (keyed by FK, stores the dimension row plus the subscriber
set). This module composes the same topology from Spark primitives:

- ``fk_subscription_stream`` — ``applyInPandasWithState`` keyed by PK;
  state = latest (fk, ts); emits ``sub`` for the new FK and ``unsub``
  for the previous FK when it changed. A NULL left value is a KTable
  tombstone (delete): it unsubscribes with a ``d`` marker and the
  joiner emits a null-valued retraction so downstream latest-per-PK
  consumers see the row disappear.
- ``fk_join_stream`` — union of the subscription stream and the tagged
  dimension changelog, ``applyInPandasWithState`` keyed by FK; state =
  latest dimension value + the subscriber set; emits the joined
  changelog on subscription (if the dimension exists) and re-broadcasts
  all subscribers on a dimension update.

The stage boundary is any replayable sink+source pair (in Kafka Streams
it is literally a repartition topic; the test uses a parquet directory).
Downstream consumers keep the last emission per PK ordered by
(left_ts, left_seq, right_ts) — update-mode changelog semantics, exactly
like the J5 keeper, with the router's per-PK seq breaking same-timestamp
ties.

State per FK group is the dimension row plus one (pk, value, ts) triple
per subscriber — proportional to the FK's fan-in, not the corpus; the
shuffles are the two re-keyings the reference also pays (PK, then FK).
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

SUB_SCHEMA = T.StructType(
    [
        T.StructField("fk", T.StringType()),
        T.StructField("pk", T.LongType()),
        T.StructField("value", T.DoubleType()),
        T.StructField("ts_us", T.LongType()),
        # 's'ubscribe / 'u'nsubscribe (FK move) / 'd'elete (tombstone —
        # unsubscribe AND retract the join row downstream)
        T.StructField("op", T.StringType()),
        # per-PK monotone counter: linearizes this PK's sub/unsub
        # messages even when several upserts share one event timestamp
        # (same-ts FK flapping A->B->A must end subscribed at A)
        T.StructField("seq", T.LongType()),
    ]
)

_SUB_STATE_SCHEMA = T.StructType(
    [
        T.StructField("fk", T.StringType()),
        T.StructField("ts", T.LongType()),
        T.StructField("seq", T.LongType()),
    ]
)

OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("pk", T.LongType()),
        T.StructField("fk", T.StringType()),
        T.StructField("left_value", T.DoubleType()),
        T.StructField("right_value", T.DoubleType()),
        T.StructField("left_ts_us", T.LongType()),
        # the originating subscription's per-PK seq: downstream
        # latest-per-PK consumers order by (left_ts_us, left_seq,
        # right_ts_us) so same-timestamp FK flapping still resolves
        T.StructField("left_seq", T.LongType()),
        T.StructField("right_ts_us", T.LongType()),
    ]
)

_JOIN_STATE_SCHEMA = T.StructType(
    [
        T.StructField("r_val", T.DoubleType()),
        T.StructField("r_ts", T.LongType()),
        T.StructField("sub_pks", T.ArrayType(T.LongType())),
        T.StructField("sub_vals", T.ArrayType(T.DoubleType())),
        T.StructField("sub_tss", T.ArrayType(T.LongType())),
        T.StructField("sub_seqs", T.ArrayType(T.LongType())),
    ]
)


def fk_subscription_stream(left: DataFrame, pk: str, fk: str) -> DataFrame:
    """Stage 1 (KIP-213 subscription side): consume the left changelog
    keyed by ``pk``, remember the last FK each PK referenced, and emit
    subscription messages keyed by FK — ``sub`` to the current FK, plus
    ``unsub`` to the previous FK whenever an upsert moved the PK."""

    def router(
        key: tuple[Any, ...],
        batches: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        (pk_val,) = key
        prev_fk, prev_ts, seq = (
            state.get if state.exists else (None, None, 0)
        )
        out: list[dict[str, Any]] = []

        def put(fk: str, value: float | None, ts_us: int, op: str) -> None:
            nonlocal seq
            seq += 1
            out.append(
                {"fk": fk, "pk": pk_val, "value": value, "ts_us": ts_us,
                 "op": op, "seq": seq}
            )

        for pdf in batches:
            for r in pdf.sort_values("ts").itertuples(index=False):
                ts_us = int(pd.Timestamp(r.ts).value // 1000)
                if prev_ts is not None and ts_us < prev_ts:
                    continue  # stale upsert — KTable keeps the latest
                if pd.isna(r.value):
                    # tombstone: the left row is DELETED — unsubscribe
                    # from whatever FK it referenced (KTable null-value
                    # semantics); the joiner emits the retraction
                    if prev_fk is not None:
                        put(prev_fk, None, ts_us, "d")
                    prev_fk, prev_ts = None, ts_us
                    continue
                new_fk = str(r.fk)
                if prev_fk is not None and prev_fk != new_fk:
                    put(prev_fk, None, ts_us, "u")
                put(new_fk, float(r.value), ts_us, "s")
                prev_fk, prev_ts = new_fk, ts_us
        state.update((prev_fk, prev_ts, seq))
        yield pd.DataFrame(
            out, columns=["fk", "pk", "value", "ts_us", "op", "seq"]
        )

    keyed = left.select(
        F.col(pk).alias("pk"), F.col(fk).alias("fk"), F.col("ts"), F.col("value")
    )
    return keyed.groupBy("pk").applyInPandasWithState(
        router,
        outputStructType=SUB_SCHEMA,
        stateStructType=_SUB_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def fk_join_stream(subs: DataFrame, right: DataFrame, rkey: str) -> DataFrame:
    """Stage 2 (KIP-213 join side): union the subscription stream with
    the dimension changelog, key by FK, and maintain (dimension row +
    subscriber set) per FK. Emits the inner-join changelog: on ``sub``
    when the dimension exists, and for every subscriber when the
    dimension updates."""

    def joiner(
        key: tuple[Any, ...],
        batches: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        (fk_val,) = key
        if state.exists:
            r_val, r_ts, sub_pks, sub_vals, sub_tss, sub_seqs = state.get
            subs_map = {
                int(p): (float(v), int(t), int(q))
                for p, v, t, q in zip(sub_pks, sub_vals, sub_tss, sub_seqs)
            }
        else:
            r_val, r_ts = None, None
            subs_map = {}
        out: list[dict[str, Any]] = []

        def emit(pk_val: int, l_val: float, l_ts: int, l_seq: int) -> None:
            out.append(
                {"pk": pk_val, "fk": fk_val, "left_value": l_val,
                 "right_value": r_val, "left_ts_us": l_ts,
                 "left_seq": l_seq, "right_ts_us": r_ts}
            )

        for pdf in batches:
            # deterministic replay order: event time, then the router's
            # per-PK seq (dim updates carry seq -1 → first at equal ts),
            # then pk. The seq linearizes one PK's sub/unsub chain even
            # when several FK moves share a timestamp.
            for r in pdf.sort_values(["ts_us", "seq", "pk"]).itertuples(index=False):
                if r.op == "r":
                    if r_ts is None or r.ts_us >= r_ts:
                        r_val, r_ts = float(r.value), int(r.ts_us)
                        for p, (lv, lt, lq) in sorted(subs_map.items()):
                            emit(p, lv, lt, lq)
                elif r.op == "s":
                    subs_map[int(r.pk)] = (
                        float(r.value), int(r.ts_us), int(r.seq)
                    )
                    if r_ts is not None:
                        emit(int(r.pk), float(r.value), int(r.ts_us), int(r.seq))
                elif r.op == "u":  # the PK moved to another FK — the new
                    subs_map.pop(int(r.pk), None)  # sub's row supersedes
                else:  # 'd' — tombstone: retract the join row downstream
                    subs_map.pop(int(r.pk), None)
                    out.append(
                        {"pk": int(r.pk), "fk": fk_val, "left_value": None,
                         "right_value": None, "left_ts_us": int(r.ts_us),
                         "left_seq": int(r.seq), "right_ts_us": int(r.ts_us)}
                    )
        state.update(
            (
                r_val,
                r_ts,
                list(subs_map),
                [v for v, _, _ in subs_map.values()],
                [t for _, t, _ in subs_map.values()],
                [q for _, _, q in subs_map.values()],
            )
        )
        yield pd.DataFrame(
            out,
            columns=["pk", "fk", "left_value", "right_value",
                     "left_ts_us", "left_seq", "right_ts_us"],
        )

    tagged_right = right.select(
        F.col(rkey).cast("string").alias("fk"),
        F.lit(None).cast("long").alias("pk"),
        F.col("value").cast("double").alias("value"),
        # naive-as-UTC epoch micros — same convention as pd.Timestamp
        # .value in the stage-1 router, so cross-stage ordering agrees
        F.expr(
            "timestampdiff(MICROSECOND, TIMESTAMP_NTZ '1970-01-01 00:00:00', ts)"
        ).alias("ts_us"),
        F.lit("r").alias("op"),
        F.lit(-1).cast("long").alias("seq"),
    )
    unioned = subs.select("fk", "pk", "value", "ts_us", "op", "seq").unionByName(
        tagged_right
    )
    return unioned.groupBy("fk").applyInPandasWithState(
        joiner,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=_JOIN_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
