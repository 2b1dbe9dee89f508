"""Join operators beyond Spark's built-ins — SURVEY.md §2.3 J1/J2/J9.

``windowed_join`` / ``windowed_anti_join`` are the batch form of the
reference's core operation: match records of two keyed streams within an
event-time window (Kafka Streams ``KStream#join(KStream, JoinWindows)``),
and detect the unmatched remainder (``#leftJoin`` null branch → loss
detection). The streaming forms live in ``streaming/reconcile.py`` and share
the same join condition builder.

``asof_join`` is the "latest state at or before event time" lookup (J9).
It is implemented as union + last_value(ignorenulls) over a single
partition-by-key sort — ONE shuffle, linear state, no quadratic
per-key join blowup — the formulation that survives 100 TB keys with skew
handled by AQE. (A naive join+rank needs |L|×|R| intermediate rows per key.)
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def interval_join_cond(
    keys: Sequence[str],
    left_ts: str,
    right_ts: str,
    lower: str,
    upper: str,
    left_alias: str = "l",
    right_alias: str = "r",
) -> Column:
    """Equi-key + event-time-interval join condition over aliased sides:
    right.ts ∈ [left.ts - lower, left.ts + upper].

    Built from qualified names (not DataFrame[col]) so self-joins — the
    normal case for reconciliation, where both streams come from one
    source — resolve unambiguously.
    """
    cond = F.lit(True)
    for k in keys:
        cond = cond & (F.col(f"{left_alias}.{k}") == F.col(f"{right_alias}.{k}"))
    lts, rts = F.col(f"{left_alias}.{left_ts}"), F.col(f"{right_alias}.{right_ts}")
    cond = (
        cond
        & (rts >= lts - F.expr(f"INTERVAL {lower}"))
        & (rts <= lts + F.expr(f"INTERVAL {upper}"))
    )
    return cond


def windowed_join(
    left: DataFrame,
    right: DataFrame,
    keys: Sequence[str],
    left_ts: str,
    right_ts: str,
    lower: str,
    upper: str,
    how: str = "inner",
    left_alias: str = "l",
    right_alias: str = "r",
) -> DataFrame:
    """Stream-stream windowed join, batch semantics (J1/J2).

    Catalyst plans the equi-key part as the shuffle key (hash join) and the
    interval bounds as a post-join filter — co-partitioning by key exactly
    as the reference's repartition topics would. Refer to output columns
    via the aliases (default ``l.…`` / ``r.…``).
    """
    return left.alias(left_alias).join(
        right.alias(right_alias),
        interval_join_cond(keys, left_ts, right_ts, lower, upper, left_alias, right_alias),
        how,
    )


def windowed_anti_join(
    left: DataFrame,
    right: DataFrame,
    keys: Sequence[str],
    left_ts: str,
    right_ts: str,
    lower: str,
    upper: str,
    left_alias: str = "l",
    right_alias: str = "r",
) -> DataFrame:
    """Unmatched-record detection: left rows with NO right match in the
    window (the reconciliation "loss" branch)."""
    return left.alias(left_alias).join(
        right.alias(right_alias),
        interval_join_cond(keys, left_ts, right_ts, lower, upper, left_alias, right_alias),
        "left_anti",
    )


def asof_join(
    left: DataFrame,
    right: DataFrame,
    keys: Sequence[str],
    left_ts: str,
    right_ts: str,
    right_value_cols: Sequence[str],
    tiebreak: str | None = None,
) -> DataFrame:
    """As-of join: for each left row, the latest right row with
    right.ts <= left.ts on the same key (J9). Inner semantics: left rows
    with no prior right row are dropped.

    Implementation: tag and union both sides, sort each key partition by
    (ts, side, tiebreak) with right rows ordered before left rows at equal
    ts ("at or before" includes same-instant), then carry the most recent
    right values forward with last(ignorenulls) and keep left rows.
    """
    ts = "__ts"
    side = "__side"  # 0 = right (state), 1 = left (probe)
    tb = "__tb"
    key_cols = list(keys)

    l_tagged = left.withColumn(ts, F.col(left_ts)).withColumn(side, F.lit(1))
    l_tagged = l_tagged.withColumn(tb, F.lit(None).cast("long"))
    for c in right_value_cols:
        l_tagged = l_tagged.withColumn(f"__r_{c}", F.lit(None).cast(right.schema[c].dataType))

    r_tagged = right.select(
        *key_cols,
        F.col(right_ts).alias(ts),
        F.lit(0).alias(side),
        (F.col(tiebreak).cast("long") if tiebreak else F.lit(0)).alias(tb),
        *[F.col(c).alias(f"__r_{c}") for c in right_value_cols],
    )
    for c in left.columns:
        if c not in r_tagged.columns:
            r_tagged = r_tagged.withColumn(c, F.lit(None).cast(left.schema[c].dataType))

    unioned = l_tagged.select(r_tagged.columns).unionByName(
        r_tagged.select(r_tagged.columns)
    )

    w = (
        Window.partitionBy(*key_cols)
        .orderBy(F.col(ts).asc(), F.col(side).asc(), F.col(tb).asc_nulls_last())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    # carry the right row as ONE struct (NULL on left rows): a per-column
    # last(ignorenulls) would skip a NULL member and splice values from
    # DIFFERENT right rows; the struct is atomic, so a matched row's NULL
    # columns survive as NULL — and a right row whose first value column
    # is NULL still counts as a match
    r_row = F.when(
        F.col(side) == 0,
        F.struct(*[F.col(f"__r_{c}").alias(c) for c in right_value_cols]),
    )
    carried = unioned.select(
        "*", F.last(r_row, ignorenulls=True).over(w).alias("__asof_row")
    )
    out = carried.filter(F.col(side) == 1).filter(
        F.col("__asof_row").isNotNull()
    )
    keep = [c for c in left.columns] + [
        F.col("__asof_row")[c].alias(f"asof_{c}") for c in right_value_cols
    ]
    return out.select(*keep)


def bucketed_range_join(
    left: DataFrame,
    right: DataFrame,
    left_ts: str,
    right_ts: str,
    radius_seconds: int,
    how: str = "inner",
    left_alias: str = "l",
    right_alias: str = "r",
) -> DataFrame:
    """KEYLESS time-range join: pair every left row with every right row
    whose timestamp lies in [left.ts - radius, left.ts + radius] (inclusive),
    with no equi-key at all — the shape Spark would otherwise plan as a
    BroadcastNestedLoopJoin / cartesian product, O(|L|·|R|).

    Implementation: the classic bucketed range join. Time is floored into
    buckets of width = radius; the PROBE (left) side is exploded into the
    three buckets its window can touch {b-1, b, b+1}, the BUILD (right)
    side keeps its single home bucket, and the join becomes an equi-join
    on the bucket id with the exact interval bound re-checked after. Each
    qualifying pair matches on exactly ONE bucket (the right row's home
    bucket), so no dedup pass is needed. With ``how="left"`` the 3×
    explosion surfaces an unmatched left row as three null-padded rows —
    callers aggregate per left key (the normal use) or dedup.

    Scale: cost is O(|L|·3 + |R|) shuffle rows on an int64 key + true
    candidates — data-density-bounded instead of |L|·|R|. Bucket hot spots
    (a traffic spike) are ordinary shuffle skew: AQE skew-join splits them.
    Refer to output columns via the aliases (default ``l.…`` / ``r.…``).
    """
    if radius_seconds <= 0:
        raise ValueError("radius_seconds must be positive")
    width_us = radius_seconds * 1_000_000

    def bucket_of(col: str) -> Column:
        # NTZ-safe epoch; integer `div` (not float floor) so a timestamp
        # 1 µs from a bucket boundary can never round into the wrong
        # bucket. Positive epochs only, where `div` == floor.
        return F.expr(
            "timestampdiff(MICROSECOND, TIMESTAMP_NTZ '1970-01-01 00:00:00',"
            f" {col}) div {width_us}"
        )

    bucket = "__bucket"
    l_b = left.withColumn(
        bucket,
        F.explode(
            F.array(bucket_of(left_ts) - 1, bucket_of(left_ts), bucket_of(left_ts) + 1)
        ),
    )
    r_b = right.withColumn(bucket, bucket_of(right_ts))

    lts = F.col(f"{left_alias}.{left_ts}")
    rts = F.col(f"{right_alias}.{right_ts}")
    cond = (
        (F.col(f"{left_alias}.{bucket}") == F.col(f"{right_alias}.{bucket}"))
        & (rts >= lts - F.expr(f"INTERVAL {radius_seconds} SECONDS"))
        & (rts <= lts + F.expr(f"INTERVAL {radius_seconds} SECONDS"))
    )
    return l_b.alias(left_alias).join(r_b.alias(right_alias), cond, how)
