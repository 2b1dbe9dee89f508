"""Streaming bitmap-index maintenance (SURVEY.md §2.11 + §2.9).

``bitmap_words_stream`` keeps the exact distinct-user bitmap of
``plans/mlprep.bitmap_distinct_users_by_type`` incrementally: the
(event_type, word) → bits table is a streaming groupBy with ``bit_or``,
so Spark's update-mode state IS the bitmap — bounded at
|types| × |id-space|/64 rows forever, independent of event volume.
Distinct counts (and boolean audience combinations) then read popcounts
off the word table exactly as the batch op does.

Because OR is idempotent, commutative, and associative, replay order and
micro-batch boundaries cannot change the converged words — after a full
replay the streaming word table is bit-identical to the batch one (the
convergence test asserts exact set equality and equal popcount rollups).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_SET_BIT = (
    "CASE WHEN user_id % 64 = 63 THEN -9223372036854775808 "
    "ELSE CAST(1 AS BIGINT) << CAST(user_id % 64 AS INT) END"
)


def bitmap_words_stream(events: DataFrame) -> DataFrame:
    """Incrementally maintained per-(event_type, word) user bitmap.

    Output (update mode): one row per touched (event_type, w) with the
    running int64 ``bits``. State is the word table itself — constant
    once the id space is covered, exact forever.
    """
    return (
        events.select(
            "event_type",
            F.expr("user_id DIV 64").alias("w"),
            F.expr(_SET_BIT).alias("m"),
        )
        .groupBy("event_type", "w")
        .agg(F.expr("bit_or(m)").alias("bits"))
    )


__all__ = ["bitmap_words_stream"]
