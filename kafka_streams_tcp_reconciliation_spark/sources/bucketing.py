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
