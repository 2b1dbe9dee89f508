"""Streaming unigram-LM scoring — the online twin of
``plans/pipeline.unigram_logprob_score``.

The production shape: the language model (here a corpus unigram
distribution in integer micro-nats) is trained OFFLINE and shipped as a
small static table; arriving documents are scored per micro-batch with a
stateless stream-static broadcast join — the Kafka Streams
``KStream#join(GlobalKTable)`` pattern, same as streaming decontamination.

Statelessness is deliberate: the stream emits one (doc_id, logp_micro)
row per token occurrence and leaves the per-document mean to the
consumer (or a downstream batch agg). A per-doc streaming aggregation
would need watermark + append-mode timing for no benefit — every doc
arrives whole in one micro-batch, and integer micro-nat rows sum
exactly in any order, so the consumer-side mean is bit-identical to the
batch query (convergence-tested in tests/test_streaming.py).

At 100 TB the vocab table is top-K + OOV-bucketed and broadcast; the
stream side never shuffles.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def vocab_logprob_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Static side: (term, logp_micro) from the batch corpus — the same
    construction, same micro-nat rounding, as the batch query's vocab."""
    from kafka_streams_tcp_reconciliation_spark.sources.tables import load_table

    docs = load_table(spark, sf_dir, "documents")
    tf = (
        docs.select(F.explode(F.split("text", " ")).alias("term"))
        .filter(F.col("term") != "")
        .groupBy("term")
        .agg(F.count(F.lit(1)).cast("long").alias("cnt"))
    )
    tot = tf.agg(F.sum("cnt").cast("long").alias("tot"))
    return tf.join(F.broadcast(tot)).select(
        "term",
        F.expr(
            "CAST(round(ln(CAST(cnt AS DOUBLE) / tot) * 1000000) AS BIGINT)"
        ).alias("logp_micro"),
    )


def lm_score_stream(feed: DataFrame, vocab: DataFrame) -> DataFrame:
    """Emit one (doc_id, logp_micro) row per token occurrence of arriving
    documents. Stateless append mode; the consumer sums/normalizes.
    Unknown terms (not in the static vocab) are dropped by the inner
    join — at 100 TB, model them with an explicit OOV row instead.
    """
    tokens = feed.select(
        "doc_id", F.explode(F.split("text", " ")).alias("term")
    ).filter(F.col("term") != "")
    return tokens.join(F.broadcast(vocab), "term").select("doc_id", "logp_micro")
