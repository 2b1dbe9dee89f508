"""Streaming DSIR LM maintenance — the online twin of
``plans/pipeline.dsir_importance_weights``.

DSIR's whole point is that both language models are O(1) state: 4096
hashed-unigram buckets, each carrying a corpus count and a conditional
target-language count. That is the textbook shape for an update-mode
stateful aggregate (the same pattern as ``streaming/sketch.cms_cells_stream``
— the state IS the aggregate), so the streaming twin is just the shared
``dsir_bucket_stats`` builder applied to a streaming tf relation: state is
bounded at 4096 rows forever, however many petabytes flow through.

Scoring is deliberately SEPARATE from LM maintenance: a production
pipeline keeps the LM warm on the ingest stream and (re)scores documents
against a broadcast snapshot of the ratio table — scoring inside the
stream would freeze each doc's weight at its arrival-time LM. The
convergence contract is therefore: after a FULL replay, the streamed LM
table equals the batch ``dsir_bucket_stats`` bit-for-bit, and scoring the
corpus against it reproduces the batch query's weights exactly (integer
micro-nats — no tolerance). Locked by
tests/test_streaming.py::test_dsir_lm_stream_converges.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from kafka_streams_tcp_reconciliation_spark.functions.hashing import spark_poly_hash
from kafka_streams_tcp_reconciliation_spark.plans.pipeline import (
    _DSIR_BUCKETS,
    _DSIR_TARGET_LANG,
    dsir_tf,
    dsir_weights,
)

LANG_TEXT_FEED_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("lang", T.StringType()),
        T.StructField("text", T.StringType()),
    ]
)


def chunked_lang_text_stream(
    spark: SparkSession, sf_dir: str, chunk_dir: str, n_chunks: int = 4
) -> DataFrame:
    """Replay the documents table (doc_id, lang, text) as a file-source
    stream, one chunk per micro-batch — the deterministic Kafka stand-in
    (same pattern as streaming/decontam.chunked_text_stream)."""
    marker = os.path.join(chunk_dir, "_chunks_ready")
    if not os.path.exists(marker):
        from kafka_streams_tcp_reconciliation_spark.sources.tables import load_table

        docs = load_table(spark, sf_dir, "documents").select(
            "doc_id", "lang", "text"
        )
        chunked = docs.withColumn("__chunk", F.col("doc_id") % n_chunks)
        for i in range(n_chunks):
            part = chunked.filter(F.col("__chunk") == i).drop("__chunk")
            part.coalesce(1).write.mode("overwrite").parquet(
                os.path.join(chunk_dir, f"chunk_{i:02d}")
            )
        with open(marker, "w") as f:
            f.write("ok")
    return (
        spark.readStream.schema(LANG_TEXT_FEED_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(os.path.join(chunk_dir, "chunk_*"))
    )


def dsir_lm_stream(docs: DataFrame) -> DataFrame:
    """Incrementally maintained DSIR LM table over a document stream.

    Input: streaming DataFrame with (doc_id, lang, text). Output
    (update/complete mode): one row per touched bucket with its running
    (cnt_c, cnt_t) — state bounded at 4096 rows.

    ONE stateful aggregate, straight from tokens: the batch pipeline's
    per-doc tf intermediate would make this a chained streaming
    aggregation (unsupported outside append+watermark), and the bucket
    rollup of pre-grouped tf counts is arithmetically identical to
    counting tokens directly — sum of per-doc counts = token count, and
    the conditional target sum likewise. The bucket hash and target-lang
    constant are the SAME module constants the batch query reads, so a
    full replay converges bit-exactly.
    """
    tokens = (
        docs.filter(F.col("text").isNotNull())
        .select("lang", F.explode(F.split("text", " ")).alias("term"))
        .filter(F.col("term") != "")
        .select(
            "lang",
            F.expr(f"{spark_poly_hash('term')} % {_DSIR_BUCKETS}").alias(
                "bucket"
            ),
        )
    )
    return tokens.groupBy("bucket").agg(
        F.count(F.lit(1)).cast("long").alias("cnt_c"),
        F.coalesce(
            F.sum(F.when(F.col("lang") == _DSIR_TARGET_LANG, F.lit(1))),
            F.lit(0),
        )
        .cast("long")
        .alias("cnt_t"),
    )


def dsir_score_against(docs: DataFrame, bucket_stats: DataFrame) -> DataFrame:
    """Score a (batch) document set against an LM snapshot — e.g. the
    streamed LM table read back from its sink. Same integer-micro-nat
    arithmetic as the batch query; with the fully-replayed LM the result
    is bit-identical to ``dsir_importance_weights``."""
    return dsir_weights(
        dsir_tf(docs.filter(F.col("text").isNotNull())), bucket_stats
    )


__all__ = [
    "chunked_lang_text_stream",
    "dsir_lm_stream",
    "dsir_score_against",
]
