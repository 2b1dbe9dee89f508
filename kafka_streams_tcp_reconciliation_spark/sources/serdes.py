"""Record serdes (SURVEY.md §1.1: Kafka Streams ``Consumed#with`` /
``Produced#with`` — schema lives in the serializer, not the engine).

For a Kafka wire format the value column is binary; these helpers decode
to typed columns and encode back:

- **JSON** — fully supported here (`from_json`/`to_json`).
- **Avro** — Spark's `from_avro`/`to_avro`; the spark-avro connector jar
  is NOT bundled in this environment, so the builders raise a clear
  error at call time if absent (`avro_available()` to probe). On a real
  deployment add `--packages org.apache.spark:spark-avro_2.13:<ver>`.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


def decode_json(df: DataFrame, value_col: str, schema: T.StructType) -> DataFrame:
    """Binary/string JSON value column → typed columns (other columns kept)."""
    return df.withColumn(
        "__v", F.from_json(F.col(value_col).cast("string"), schema)
    ).select(*[c for c in df.columns if c != value_col], "__v.*")


def encode_json(df: DataFrame, value_cols: list[str]) -> Column:
    """Typed columns → JSON string value column expression."""
    return F.to_json(F.struct(*value_cols))


def avro_available(spark) -> bool:
    """True iff the spark-avro connector is loaded in this session."""
    try:
        spark.range(1).select(
            __import__(
                "pyspark.sql.avro.functions", fromlist=["to_avro"]
            ).to_avro(F.struct(F.lit(1).alias("x")))
        ).collect()
        return True
    except Exception:
        return False


def decode_avro(df: DataFrame, value_col: str, avro_schema_json: str) -> DataFrame:
    """Avro-encoded binary value column → typed columns. Raises a clear
    error if the spark-avro connector is not loaded."""
    from pyspark.sql.avro.functions import from_avro

    try:
        out = df.withColumn("__v", from_avro(F.col(value_col), avro_schema_json))
    except Exception as e:  # pragma: no cover - connector-present path
        raise RuntimeError(
            "Avro serde requires the spark-avro connector "
            "(--packages org.apache.spark:spark-avro_2.13:<version>); "
            f"not loaded in this session: {e}"
        ) from e
    return out.select(*[c for c in df.columns if c != value_col], "__v.*")
