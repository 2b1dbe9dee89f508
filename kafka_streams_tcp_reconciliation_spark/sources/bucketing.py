"""Bucketed tables — co-located, shuffle-free joins (SURVEY.md §4.2).

Kafka Streams gets co-partitioned joins for free because both topics are
partitioned by key with equal partition counts. The Spark equivalent for
batch is bucketing: write both tables bucketed by the join key into the
same number of buckets, and Catalyst plans a SortMergeJoin with NO
Exchange on either side — at 100 TB that deletes the two largest
shuffles of a fact-fact join.

Bucketed writes require a catalog table (``saveAsTable``); callers point
the session's warehouse at a real directory (tests use a tmp dir).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table_name: str,
    bucket_cols: list[str],
    num_buckets: int = 8,
    sort_cols: list[str] | None = None,
) -> None:
    """Persist ``df`` as a bucketed (and optionally sort-ordered) catalog
    table. Matching ``num_buckets`` + ``bucket_cols`` across tables makes
    their joins exchange-free; ``sort_cols`` additionally removes the
    per-task sort of an SMJ."""
    w = (
        df.write.mode("overwrite")
        .format("parquet")
        .bucketBy(num_buckets, *bucket_cols)
    )
    if sort_cols:
        w = w.sortBy(*sort_cols)
    w.saveAsTable(table_name)


def read_bucketed(spark: SparkSession, table_name: str) -> DataFrame:
    return spark.table(table_name)


def zorder_expr(cols: list[str], bits: int = 16) -> str:
    """Spark SQL expression interleaving the low ``bits`` bits of each
    (non-negative integer) column into one Morton code.

    Rows close in the code are close in EVERY dimension, so range-
    partitioning + sorting by it clusters multi-column locality into few
    files — parquet min/max row-group pruning then skips most of the
    table for a selective filter on ANY of the z-ordered columns, not
    just the leading sort column. This is the write-side companion to
    predicate pushdown: the layout makes the pushed filter cheap.

    Pure integer bit arithmetic (shiftleft/or), whole-stage codegen.
    """
    terms = []
    for b in range(bits):
        for i, c in enumerate(cols):
            # bit b of col i lands at interleaved position b*len(cols)+i
            terms.append(
                f"shiftleft(shiftright(CAST({c} AS BIGINT), {b}) & 1,"
                f" {b * len(cols) + i})"
            )
    return " | ".join(terms)


def write_zordered(
    df: DataFrame,
    path: str,
    zorder_cols: list[str],
    num_files: int = 8,
    bits: int = 16,
) -> None:
    """Write ``df`` as parquet laid out in Morton-code order over
    ``zorder_cols``: range-partition by the code (one shuffle), sort
    within partitions, one tight file per range."""
    from pyspark.sql import functions as F

    coded = df.withColumn("__z", F.expr(zorder_expr(zorder_cols, bits)))
    (
        coded.repartitionByRange(num_files, "__z")
        .sortWithinPartitions("__z")
        .drop("__z")
        .write.mode("overwrite")
        .parquet(path)
    )
