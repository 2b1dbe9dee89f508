"""Top-k per group (SURVEY.md §2.6 F4).

Ranked-window + filter. Catalyst pushes the rank filter into the window
operator at runtime (``WindowGroupLimit`` physical optimization in Spark
3.5+), so only k rows per key survive each partition-local sort — this does
NOT materialize the full ranked set at scale.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def top_k_per_group(
    df: DataFrame,
    partition_cols: Sequence[str],
    order_cols: Sequence[Column],
    k: int,
    rank_col: str = "rank",
) -> DataFrame:
    """Keep the top ``k`` rows per group under ``order_cols`` ordering.

    Pass a unique tiebreaker in ``order_cols`` for deterministic results.
    The rank is kept in ``rank_col`` (drop it if unwanted).
    """
    w = Window.partitionBy(*partition_cols).orderBy(*order_cols)
    return df.withColumn(rank_col, F.row_number().over(w)).filter(
        F.col(rank_col) <= k
    )
