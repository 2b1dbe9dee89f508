"""Streaming incremental fuzzy dedup — the online twin of
``plans/llm.dedup_minhash_incremental``.

A production ingest near-dedups documents AS THEY ARRIVE against the
accumulated corpus: the corpus's LSH bucket index and gram sets are
STATIC within a batch window (refreshed between windows), so each
micro-batch is two stateless stream-static equi-joins —

1. bucket probe: the arriving doc's band buckets against the corpus
   bucket index (key = (band, bkey)); candidates only, no pairs among
   arriving docs (the bootstrap self-dedup's job) and no corpus-corpus
   pairs (already resolved);
2. verify: exact Jaccard on the shared 64-bit gram sets, corpus side
   joined by doc id.

Append mode, no state, no watermark: each emitted (new_doc, dup_of,
jaccard) row is final on production. This is the Kafka Streams
``KStream#join(GlobalKTable)`` shape twice over, with the same hash
constants, banding knobs, and empty-set filter as the batch query — so
an ordered replay converges to the batch result exactly (locked by
tests/test_streaming.py).

Scale: per-batch cost is signature compute for the batch's docs plus a
bucket-keyed join into the standing index. On a real cluster, persist
the index bucketed on (band, bkey) so the corpus side never reshuffles;
the verify join is corpus-doc-id-keyed and touches only candidate ids.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from kafka_streams_tcp_reconciliation_spark.operators import dedup as dd
from kafka_streams_tcp_reconciliation_spark.plans.llm import (
    _INCR_MOD,
    _JACC_N,
    _JACC_THRESHOLD,
    _MH_BANDS,
    _MH_NUM,
    _MH_ROWS,
)


def _gram_sets(docs: DataFrame, cache: bool = False) -> DataFrame:
    """(doc_id, hs): the shared two-level word-gram hash sets, empty sets
    dropped (same contract as the batch pipeline).

    ``cache=True`` (the static corpus side) inserts the cache BARRIER
    below the size filter — without it Catalyst substitutes the gram fold
    into the pushed-down predicate and serializes the corpus shingle
    compute on the scan side (see dedup_minhash_lsh). A stream side can't
    cache; there the double-evaluation is bounded by the micro-batch."""
    wh = docs.filter(F.col("text").isNotNull()).select(
        "doc_id",
        dd.word_polyhashes_expr("text", 31).alias("wh1"),
        dd.word_polyhashes_expr("text", 131).alias("wh2"),
    )
    hs = wh.select(
        "doc_id", dd.gram_fold64_expr("wh1", "wh2", _JACC_N).alias("hs")
    )
    if cache:
        hs = hs.cache()
    return hs.filter(F.size("hs") > 0)


def corpus_index(spark: SparkSession, sf_dir: str) -> tuple[DataFrame, DataFrame]:
    """Static side: the standing corpus's (band, bkey, doc_id) LSH bucket
    index and its (doc_id, hs) gram sets — the two relations a production
    pipeline persists between batches. Corpus = doc_id % 17 != 0 (the
    batch-membership convention shared with the batch query's oracle)."""
    from kafka_streams_tcp_reconciliation_spark.sources.tables import load_table

    docs = load_table(spark, sf_dir, "documents").filter(
        F.col("doc_id") % _INCR_MOD != 0
    )
    hs = _gram_sets(docs, cache=True)
    sig = hs.select("doc_id", dd.minhash_sig_expr("hs", _MH_NUM).alias("sig"))
    index = (
        sig.select(
            "doc_id",
            F.explode(
                dd.band_structs_expr("sig", _MH_BANDS, _MH_ROWS)
            ).alias("bb"),
        )
        .select(F.col("doc_id").alias("dup_of"), "bb.band", "bb.bkey")
    )
    return index, hs.select(F.col("doc_id").alias("dup_of"), F.col("hs").alias("corpus_hs"))


def incremental_dedup_stream(
    feed: DataFrame,
    index: DataFrame,
    corpus_hs: DataFrame,
    broadcast_corpus: bool = False,
) -> DataFrame:
    """Emit (new_doc, dup_of, jaccard) for every arriving doc that
    near-duplicates (J >= threshold) a standing corpus doc.

    ``broadcast_corpus`` is an OPT-IN hint for small-corpus runs only.
    The default leaves the join strategy to the optimizer so the
    stream-static joins can use a persisted index bucketed on
    (band, bkey) — forcing a broadcast would collect the accumulated
    corpus to the driver every micro-batch, which is exactly wrong at
    the scale this module exists for."""
    hs = _gram_sets(feed)
    sig = hs.select(
        "doc_id", "hs", dd.minhash_sig_expr("hs", _MH_NUM).alias("sig")
    )
    if broadcast_corpus:
        index = F.broadcast(index)
        corpus_hs = F.broadcast(corpus_hs)
    probed = (
        sig.select(
            "doc_id",
            "hs",
            F.explode(
                dd.band_structs_expr("sig", _MH_BANDS, _MH_ROWS)
            ).alias("bb"),
        )
        .select("doc_id", "hs", "bb.band", "bb.bkey")
        .join(index, ["band", "bkey"])
        .select(F.col("doc_id").alias("new_doc"), "hs", "dup_of")
    )
    # NOTE: a pair colliding in k bands is emitted k times (identical
    # jaccard). Keeping the stream STATELESS is deliberate — a global
    # dropDuplicates would grow state with the corpus; production dedupes
    # per micro-batch inside foreachBatch (batch_df.dropDuplicates()),
    # where each new_doc appears exactly once. Consumers aggregating by
    # (new_doc, dup_of) are unaffected.
    n_inter = F.size(F.array_intersect(F.col("hs"), F.col("corpus_hs")))
    jacc = n_inter / (
        F.size(F.col("hs")) + F.size(F.col("corpus_hs")) - n_inter
    ).cast("double")
    return (
        probed.join(corpus_hs, "dup_of")
        .filter(jacc >= _JACC_THRESHOLD)
        .select("new_doc", "dup_of", F.round(jacc, 6).alias("jaccard"))
    )
