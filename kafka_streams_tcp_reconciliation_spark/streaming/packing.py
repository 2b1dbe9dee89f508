"""Incremental token-budget sequence packing — the streaming twin of
``plans/pipeline.pack_token_budget_bins``.

A real corpus ingest packs documents into fixed-token training sequences
AS THEY ARRIVE: each hash shard keeps one running token offset, a new
document lands at that offset, and its bin is ``offset DIV budget``. That
per-shard counter is exactly a Kafka-Streams ``KGroupedStream#aggregate``
(Initializer + Aggregator over keyed state), mapped here to
``applyInPandasWithState``: shard-keyed mutable state (the offset)
carried across micro-batches, per-batch Arrow-vectorized assignment.

Equivalence to the batch query: the batch plan packs each shard in
``(hash, doc_id)`` order; the stream packs in arrival order. Replaying
documents ordered by ``(hash, doc_id)`` (tests) makes the two identical —
the property the convergence test locks. Out-of-order arrival changes
WHICH bin a doc gets (as it would in any real ingest), never the
per-shard totals or the bin-capacity invariant.

State size: one BIGINT per shard — thousands of shards at 100 TB, a few
KB of state total, no growth with stream length.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from kafka_streams_tcp_reconciliation_spark.functions.hashing import spark_poly_hash

TOKEN_BUDGET = 512
N_SHARDS = 8

DOC_FEED_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("h", T.LongType()),
        T.StructField("shard", T.LongType()),
        T.StructField("n_tokens", T.LongType()),
    ]
)

PACKED_SCHEMA = T.StructType(
    [
        T.StructField("shard", T.LongType()),
        T.StructField("doc_id", T.LongType()),
        T.StructField("start_off", T.LongType()),
        T.StructField("bin", T.LongType()),
        T.StructField("n_tokens", T.LongType()),
    ]
)

_STATE_SCHEMA = T.StructType([T.StructField("offset", T.LongType())])


def doc_feed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The batch relation a packing feed carries: doc_id, shard hash,
    token count — the same expressions the batch query uses."""
    from kafka_streams_tcp_reconciliation_spark.sources.tables import load_table

    docs = load_table(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        F.expr(spark_poly_hash("CAST(doc_id AS STRING)")).alias("h"),
        F.size(F.split("text", " ")).cast("long").alias("n_tokens"),
    ).withColumn("shard", F.col("h") % N_SHARDS)


def chunked_doc_stream(
    spark: SparkSession, sf_dir: str, chunk_dir: str, n_chunks: int = 4
) -> DataFrame:
    """Replay the documents table as a file-source stream in (h, doc_id)
    order, one chunk per micro-batch — the deterministic Kafka stand-in
    (see streaming/source.py for the real-source swap)."""
    import os

    marker = os.path.join(chunk_dir, "_chunks_ready")
    if not os.path.exists(marker):
        from pyspark.sql import Window

        feed = doc_feed(spark, sf_dir)
        w = Window.orderBy("h", "doc_id")
        chunked = feed.withColumn("__chunk", F.ntile(n_chunks).over(w))
        for i in range(1, n_chunks + 1):
            part = chunked.filter(F.col("__chunk") == i).drop("__chunk")
            part.coalesce(1).write.mode("overwrite").parquet(
                os.path.join(chunk_dir, f"chunk_{i:02d}")
            )
        with open(marker, "w") as f:
            f.write("ok")
    return (
        spark.readStream.schema(DOC_FEED_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(os.path.join(chunk_dir, "chunk_*"))
    )


def packed_doc_stream(feed: DataFrame, budget: int = TOKEN_BUDGET) -> DataFrame:
    """Assign every incoming document a (shard, bin, start offset).

    The processor is a CLOSURE so cloudpickle ships it by value —
    executors of an external driver session don't have this package on
    sys.path.
    """

    def pack(
        key: Any, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        (shard,) = key
        (offset,) = state.get if state.exists else (0,)
        for pdf in pdfs:
            pdf = pdf.sort_values(["h", "doc_id"])
            sizes = pdf["n_tokens"].to_numpy()
            starts = offset + sizes.cumsum() - sizes
            offset = int(offset + sizes.sum())
            yield pd.DataFrame(
                {
                    "shard": shard,
                    "doc_id": pdf["doc_id"].to_numpy(),
                    "start_off": starts,
                    "bin": starts // budget,
                    "n_tokens": sizes,
                }
            )
        state.update((offset,))

    return (
        feed.groupBy("shard")
        .applyInPandasWithState(
            pack,
            outputStructType=PACKED_SCHEMA,
            stateStructType=_STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
