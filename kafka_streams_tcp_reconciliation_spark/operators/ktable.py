"""KTable semantics — latest value per key (SURVEY.md §2.1 S2, §1.1).

A Kafka Streams ``KTable`` is a changelog materialized as "latest value per
key". The batch snapshot of that semantics is a per-key argmax over event
time; the streaming version keeps the same state incrementally (see
``streaming/stateful.py``).

Scale notes: implemented as a ranked window, which Spark executes as a
single hash-partition shuffle on the key + per-partition sort. At 100 TB the
shuffle is unavoidable for this op (it IS the repartition-by-key a Kafka
Streams changelog consumer would do); AQE handles skewed keys.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def latest_by_key(
    df: DataFrame,
    key_cols: Sequence[str],
    order_cols: Sequence[Column],
) -> DataFrame:
    """Latest record per key: KTable snapshot of an append stream.

    ``order_cols`` must impose a total order per key (pass a unique
    tiebreaker last, e.g. ``[F.col("ts").desc(), F.col("event_id").desc()]``)
    or results are nondeterministic.
    """
    w = Window.partitionBy(*key_cols).orderBy(*order_cols)
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )
