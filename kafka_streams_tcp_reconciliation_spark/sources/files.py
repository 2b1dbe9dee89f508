"""File-format sources/sinks beyond parquet (SURVEY.md §2.1 S-family).

The engine's canonical storage is parquet (columnar, predicate-pushdown,
splittable). CSV and JSON-lines exist for interchange: both readers take
the SAME explicit schema as the parquet catalog — schema-on-read like the
reference's serdes, but declared once so every downstream operator sees
identical types regardless of the wire format.

Scale notes: CSV/JSON are row-oriented and non-pushdown — fine for ingest
edges, wrong for the 100 TB hot path; ``to_parquet`` is the normalization
step. All writers partition by the caller's choice and never coalesce to
one file except for tests.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from kafka_streams_tcp_reconciliation_spark.sources.tables import schema_for

_TS_FMT = "yyyy-MM-dd HH:mm:ss.SSSSSS"


def write_csv(df: DataFrame, path: str, header: bool = True) -> None:
    (
        df.write.mode("overwrite")
        .option("header", str(header).lower())
        .option("timestampNTZFormat", _TS_FMT)
        .csv(path)
    )


def read_csv(
    spark: SparkSession, path: str, schema: T.StructType, header: bool = True
) -> DataFrame:
    return (
        spark.read.schema(schema)
        .option("header", str(header).lower())
        .option("timestampNTZFormat", _TS_FMT)
        .csv(path)
    )


def write_jsonl(df: DataFrame, path: str) -> None:
    df.write.mode("overwrite").option("timestampNTZFormat", _TS_FMT).json(path)


def read_jsonl(spark: SparkSession, path: str, schema: T.StructType) -> DataFrame:
    return (
        spark.read.schema(schema)
        .option("timestampNTZFormat", _TS_FMT)
        .json(path)
    )


def write_orc(df: DataFrame, path: str) -> None:
    """ORC interchange: columnar like parquet (pushdown, splittable) —
    for pipelines whose upstream lake is ORC/Hive."""
    df.write.mode("overwrite").orc(path)


def read_orc(spark: SparkSession, path: str, schema: T.StructType) -> DataFrame:
    return spark.read.schema(schema).orc(path)


def read_table_orc(spark: SparkSession, path: str, table: str) -> DataFrame:
    return read_orc(spark, path, schema_for(table))


def to_parquet(df: DataFrame, path: str, partition_by: list[str] | None = None) -> None:
    """Normalize any ingested frame to the engine's canonical format."""
    w = df.write.mode("overwrite")
    if partition_by:
        w = w.partitionBy(*partition_by)
    w.parquet(path)


def read_table_csv(spark: SparkSession, path: str, table: str) -> DataFrame:
    """Read a CSV export of a catalog table with its canonical schema."""
    return read_csv(spark, path, schema_for(table))


def read_table_jsonl(spark: SparkSession, path: str, table: str) -> DataFrame:
    return read_jsonl(spark, path, schema_for(table))


def write_training_shards(
    df: DataFrame,
    path: str,
    key_col: str,
    n_shards: int,
    partition_by: list[str] | None = None,
    max_records_per_file: int = 0,
) -> None:
    """Write a corpus as deterministic training shards.

    The layout a trainer consumes: ``repartition(n_shards, hash-of-key)``
    fixes both the shard COUNT and the shard MEMBERSHIP (a pure function
    of the key — re-running the write yields byte-stable shard contents,
    so a training job can resume against re-generated data), optional
    hive-style ``partition_by`` directories (e.g. split=train/valid/test)
    for partition-pruned reads, and ``maxRecordsPerFile`` to cap file
    size so no shard exceeds executor/loader memory. One shuffle total;
    at 100 TB pick n_shards ≈ corpus_bytes / 512 MB.
    """
    w = df.repartition(n_shards, F.col(key_col)).write.mode("overwrite")
    if max_records_per_file:
        w = w.option("maxRecordsPerFile", max_records_per_file)
    if partition_by:
        w = w.partitionBy(*partition_by)
    w.parquet(path)


def write_text(df: DataFrame, path: str, column: str = "text") -> None:
    """One-column plain-text sink (spark.write.text): each row one line —
    the rawest interchange format a corpus pipeline meets."""
    df.select(F.col(column).cast("string").alias("value")).write.mode(
        "overwrite"
    ).text(path)


def read_text(spark: SparkSession, path: str) -> DataFrame:
    """Line-per-row text source; one `value: string` column."""
    return spark.read.text(path)


def read_binary_dir(
    spark: SparkSession, path: str, glob: str | None = None
) -> DataFrame:
    """Opaque-blob source (format="binaryFile"): one row per file with
    (path, modificationTime, length, content: binary) — the ingest door
    for image/audio/video payloads before `functions/multimodal.py`
    decode kernels run.

    Scale: binaryFile is a real FileFormat — the file index prunes on
    pathGlobFilter, rows stream as whole files (so partition sizing is by
    file count; pack small assets into larger archives upstream), and
    `content` stays opaque bytes until an Arrow-batched kernel touches it.
    """
    reader = spark.read.format("binaryFile")
    if glob:
        reader = reader.option("pathGlobFilter", glob)
    return reader.load(path)
