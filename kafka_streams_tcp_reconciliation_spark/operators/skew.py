"""Skew-mitigation operators (SURVEY.md §4.2): salted aggregation and
salted join for hot keys.

AQE's skew-join splitting (enabled in session.py) handles most cases at
runtime by splitting oversized partitions. These explicit operators are
for the cases AQE cannot fix: a *single key* so hot that one reducer
drowns — the classic power-law key (the reconciliation domain's version:
one flow carrying most segments).

- ``salted_agg``: two-phase aggregate. Phase 1 groups on
  (key, salt = crc32(row) % n) — hot keys fan out over n reducers;
  phase 2 merges the n partials per key. Works for any algebraic
  aggregate (sum/count/min/max — pass the merge fns).
- ``salted_broadcast_left``: for joins where the hot side is large and
  the other side is broadcastable, broadcast replaces the shuffle
  entirely — the first remedy to try; included as the named operator so
  call sites document intent.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def salted_agg(
    df: DataFrame,
    keys: Sequence[str],
    aggs: dict[str, tuple[Column, Column]],
    n_salts: int = 16,
    salt_expr: Column | None = None,
) -> DataFrame:
    """Two-phase skew-safe aggregation.

    ``aggs`` maps output column name -> (phase1_agg_expr, phase2_merge_expr
    over the phase-1 column). Example::

        salted_agg(ev, ["user_id"], {
            "n":     (F.count(F.lit(1)),  F.sum("n")),
            "total": (F.sum("value"),     F.sum("total")),
            "mx":    (F.max("value"),     F.max("mx")),
        })

    Phase 1 shuffles on (keys..., salt): a key receiving K rows spreads
    them over min(K, n_salts) reducers; phase 2 shuffles only the
    n_salts partial rows per key.

    The default salt is a hash of the FULL row — deterministic under task
    retries (a non-deterministic salt such as rand() or
    monotonically_increasing_id can double-route rows when a map task is
    re-executed after reducers fetched its first output). Pass
    ``salt_expr`` (e.g., hash of a unique id column) when rows can be
    exact duplicates and must still spread.
    """
    salt = (
        (
            F.abs(salt_expr if salt_expr is not None else F.hash(F.struct(*df.columns)))
            % n_salts
        ).alias("__salt")
    )
    phase1 = (
        df.withColumn("__salt", salt)
        .groupBy(*keys, "__salt")
        .agg(*[expr.alias(name) for name, (expr, _) in aggs.items()])
    )
    return phase1.groupBy(*keys).agg(
        *[merge.alias(name) for name, (_, merge) in aggs.items()]
    )


def salted_broadcast_left(
    big: DataFrame, small: DataFrame, on: Sequence[str], how: str = "inner"
) -> DataFrame:
    """Hot-key join remedy #1: broadcast the small side — no shuffle of
    the big (skewed) side at all."""
    return big.join(F.broadcast(small), list(on), how)


def salted_replicate_join(
    skewed: DataFrame,
    other: DataFrame,
    on: Sequence[str],
    n_salts: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Hot-key join remedy #2 — both sides too big to broadcast: salt the
    SKEWED side (crc32 of its whole row % n), REPLICATE the other side
    across all n salt values (explode of a literal range), and equi-join
    on (keys..., salt). A key holding K rows spreads over min(K, n)
    reducers at the cost of n× duplicating the other side's shuffle — the
    classic trade when AQE's skew split isn't available (e.g. a
    non-shuffle-boundary join or a deliberately pinned plan).

    Result is row-identical to the plain join: every skewed row meets each
    matching other row exactly once (at its own salt).
    """
    keys = list(on)
    salt = F.abs(
        F.crc32(F.concat_ws("\x1f", *[F.col(c).cast("string") for c in skewed.columns]))
        % n_salts
    ).alias("__salt")
    left = skewed.withColumn("__salt", salt)
    right = other.withColumn(
        "__salt", F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1)).cast("array<long>"))
    )
    out = left.join(right, keys + ["__salt"], how)
    return out.drop("__salt")
