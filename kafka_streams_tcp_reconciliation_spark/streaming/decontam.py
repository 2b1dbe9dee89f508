"""Streaming eval-set decontamination — the online twin of
``plans/pipeline.decontaminate_train_eval``.

A real ingest checks documents against the benchmark/eval gram set AS
THEY ARRIVE: the eval side is small and static (a benchmark suite), so
this is exactly the Kafka Streams ``KStream#join(GlobalKTable)`` shape —
a stateless stream-static broadcast join per micro-batch, run here on
the shared 64-bit two-level word-gram hashes. Append mode, no state, no
watermark: every emitted row is a (doc_id, shared-gram) contamination
hit, final the moment it is produced.

Plan note: the word-hash arrays are projected in their own select and
the gram fold references them as COLUMNS — building one textual
expression would evaluate the whole word-hash array once per gram
(O(words²) per doc; measured 15s vs 1.4s at sf0.1 on the batch twin).
Spark 4.1 keeps the two projections un-collapsed (verified: the
executed plan shows ``slice(wh1, …)``, not an inlined
``slice(transform(split(…)))``), so no exchange or cache barrier is
needed on the stream side.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from kafka_streams_tcp_reconciliation_spark.functions.hashing import spark_poly_hash
from kafka_streams_tcp_reconciliation_spark.operators.dedup import (
    gram_fold64_expr,
    word_polyhashes_expr,
)

DECON_N = 8

TEXT_FEED_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("text", T.StringType()),
    ]
)

_BUCKET = f"({spark_poly_hash('CAST(doc_id AS STRING)')}) % 100"


def chunked_text_stream(
    spark: SparkSession, sf_dir: str, chunk_dir: str, n_chunks: int = 4
) -> DataFrame:
    """Replay the documents table (doc_id, text) as a file-source stream,
    one chunk per micro-batch — the deterministic Kafka stand-in."""
    marker = os.path.join(chunk_dir, "_chunks_ready")
    if not os.path.exists(marker):
        from kafka_streams_tcp_reconciliation_spark.sources.tables import load_table

        docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
        chunked = docs.withColumn("__chunk", F.col("doc_id") % n_chunks)
        for i in range(n_chunks):
            part = chunked.filter(F.col("__chunk") == i).drop("__chunk")
            part.coalesce(1).write.mode("overwrite").parquet(
                os.path.join(chunk_dir, f"chunk_{i:02d}")
            )
        with open(marker, "w") as f:
            f.write("ok")
    return (
        spark.readStream.schema(TEXT_FEED_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(os.path.join(chunk_dir, "chunk_*"))
    )


def eval_gram_set(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Static side: distinct 64-bit gram hashes of the held-out test
    split (hash bucket >= 90) — the same construction, same constants,
    as the batch query's eval branch."""
    from kafka_streams_tcp_reconciliation_spark.sources.tables import load_table

    docs = load_table(spark, sf_dir, "documents")
    wh = docs.select(
        F.expr(_BUCKET).alias("b"),
        word_polyhashes_expr("text", 31).alias("wh1"),
        word_polyhashes_expr("text", 131).alias("wh2"),
    ).cache()
    return (
        wh.filter(F.col("b") >= 90)
        .select(F.explode(gram_fold64_expr("wh1", "wh2", DECON_N)).alias("g"))
        .distinct()
    )


def decontaminate_stream(feed: DataFrame, eval_grams: DataFrame) -> DataFrame:
    """Emit one (doc_id, g) row per contamination hit on arriving train
    docs. Stateless; the consumer aggregates (or drops the doc outright).
    """
    wh = feed.select(
        "doc_id",
        F.expr(_BUCKET).alias("b"),
        word_polyhashes_expr("text", 31).alias("wh1"),
        word_polyhashes_expr("text", 131).alias("wh2"),
    )  # separate projection: gram fold must reference wh1/wh2 as columns
    train = (
        wh.filter(F.col("b") < 80)
        .select(
            "doc_id",
            F.explode(gram_fold64_expr("wh1", "wh2", DECON_N)).alias("g"),
        )
    )
    return train.join(F.broadcast(eval_grams), "g").select("doc_id", "g")
