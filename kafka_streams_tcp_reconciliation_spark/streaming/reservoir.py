"""Streaming per-key reservoir sample — the incremental twin of
``plans/pipeline.reservoir_sample_per_user`` (the deterministic hash-rank
keep-K cap).

Sample membership is RETRACTIVE: a later event with a smaller hash evicts
an earlier pick. An append-only stream of picks would therefore go stale,
so the operator emits a CHANGELOG — (user_id, event_id, op) with op in
{'add', 'evict'} — exactly how Kafka Streams materializes a KTable: the
downstream applies adds and evicts and its materialized view converges to
the batch sample after full replay (locked by the convergence test).

State per key is O(K): the K smallest (hash, event_id) pairs seen so far.
The hash is the same cross-engine polynomial as the batch operator, so
the converged membership is bit-equal to the batch WindowGroupLimit
query, not merely statistically equivalent.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

K = 3  # matches plans/pipeline._RESERVOIR_K

OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("event_id", T.LongType()),
        T.StructField("op", T.StringType()),
    ]
)

STATE_SCHEMA = T.StructType(
    [
        T.StructField("hashes", T.ArrayType(T.LongType())),
        T.StructField("event_ids", T.ArrayType(T.LongType())),
    ]
)


def _sample_hash(event_id: int) -> int:
    """Python twin of plans/pipeline._SAMPLE_HASH — the same affine
    scramble, so streaming picks match the batch ranking exactly."""
    return ((event_id % 1000000007) * 2654435761 + 1013904223) % 1000000007


def reservoir_sample_stream(events: DataFrame) -> DataFrame:
    """Changelog of the deterministic keep-K-by-hash sample per user."""

    def fsm(
        key: tuple[Any, ...],
        batches: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        (user_id,) = key
        if state.exists:
            hashes, event_ids = state.get
            kept = sorted(zip(list(hashes), list(event_ids)))
        else:
            kept = []
        out: list[dict[str, Any]] = []
        for pdf in batches:
            for r in pdf.sort_values("event_id").itertuples(index=False):
                eid = int(r.event_id)
                h = _sample_hash(eid)
                cand = (h, eid)
                if cand in kept:
                    # at-least-once redelivery: already a member — an
                    # idempotent no-op, never a self-evicting re-add
                    continue
                if len(kept) < K:
                    kept.append(cand)
                    kept.sort()
                    out.append(
                        {"user_id": user_id, "event_id": eid, "op": "add"}
                    )
                elif cand < kept[-1]:
                    evicted = kept[-1]
                    kept[-1] = cand
                    kept.sort()
                    out.append(
                        {
                            "user_id": user_id,
                            "event_id": evicted[1],
                            "op": "evict",
                        }
                    )
                    out.append(
                        {"user_id": user_id, "event_id": eid, "op": "add"}
                    )
        state.update(([h for h, _ in kept], [e for _, e in kept]))
        yield pd.DataFrame(out, columns=["user_id", "event_id", "op"])

    return (
        events.select("user_id", "event_id")
        .groupBy("user_id")
        .applyInPandasWithState(
            fsm,
            outputStructType=OUTPUT_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
