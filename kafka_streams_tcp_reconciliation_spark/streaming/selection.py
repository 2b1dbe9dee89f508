"""Streaming UniMax budget maintenance — the online twin of
``plans/selection.unimax_language_budgets``.

UniMax's input statistic is O(#languages) state: one token count per
language. Like the DSIR LMs (streaming/dsir.py) that is the textbook
update-mode stateful aggregate — the state IS the aggregate — so the
streaming twin is the shared ``lang_token_counts`` builder applied to a
streaming document relation: state bounded at #languages rows forever,
however many petabytes of documents flow through.

Allocation is deliberately SEPARATE from count maintenance: the
water-filling is a global decision over ALL languages (a cross-row
computation), so a production pipeline keeps the counts warm on the
ingest stream and recomputes the allocation from a snapshot whenever the
mixture is (re)planned — allocating inside the stream would emit budgets
computed against a partial corpus every micro-batch. The convergence
contract: after a FULL replay, the streamed count table equals the batch
``lang_token_counts`` bit-for-bit, and ``unimax_allocate`` on it
reproduces the batch query's budgets exactly (integer micro-tokens — no
tolerance). Locked by
tests/test_streaming.py::test_unimax_counts_stream_converges.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from kafka_streams_tcp_reconciliation_spark.plans.selection import (
    lang_token_counts,
    unimax_allocate,
)


def lang_token_stream(docs: DataFrame) -> DataFrame:
    """Incrementally maintained per-language token counts over a document
    stream (doc_id, lang, text). Output (update/complete mode): one row
    per language with its running c_tokens — the shared batch builder,
    which keeps the token-counting expression (higher-order filter/size,
    no explode) identical on both paths."""
    return lang_token_counts(docs.filter(F.col("text").isNotNull()))


def unimax_budgets_against(count_snapshot: DataFrame) -> DataFrame:
    """Water-fill a budget allocation from a counts snapshot — e.g. the
    streamed count table read back from its sink. With the fully-replayed
    counts the result is bit-identical to ``unimax_language_budgets``."""
    return unimax_allocate(count_snapshot)


_LATEST_POINTER = "_LATEST"


def counts_snapshot_sink(
    counts_stream: DataFrame, snapshot_dir: str, checkpoint_dir: str
):
    """Persist the streamed count table as a parquet snapshot replaced
    each micro-batch — the handoff surface between online count
    maintenance and offline mixture (re)planning: the planner reads the
    latest snapshot and water-fills it (``unimax_budgets_against``)
    whenever the mixture is revisited, never touching the stream.

    Atomicity (round 12): a direct ``mode("overwrite")`` on the snapshot
    path deletes the directory before rewriting, so a planner reading
    concurrently could observe a missing/partial snapshot. Instead each
    batch writes a fresh ``batch_<id>/`` subdirectory and then atomically
    repoints the ``_LATEST`` pointer file (temp file + ``os.replace``,
    atomic on POSIX): readers resolving through
    :func:`read_counts_snapshot` always see a COMPLETE snapshot — the
    pointer flips only after the parquet commit. The previous batch's
    directory is retained one generation (a reader may have just resolved
    it); older generations are pruned. complete-mode foreachBatch: each
    batch delivers the FULL count table (O(#languages) rows), and the
    checkpoint makes replay-on-restart idempotent (same counts → same
    snapshot). End-to-end lock:
    tests/test_streaming.py::test_unimax_streamed_snapshot_end_to_end
    replays the corpus through this sink and asserts the read-back
    budgets equal the batch query bit-for-bit."""

    def write_snapshot(batch_df: DataFrame, batch_id: int) -> None:
        import os

        gen_dir = os.path.join(snapshot_dir, f"batch_{batch_id}")
        batch_df.coalesce(1).write.mode("overwrite").parquet(gen_dir)
        tmp = os.path.join(snapshot_dir, f"._LATEST.tmp.{batch_id}")
        with open(tmp, "w") as f:
            f.write(f"batch_{batch_id}\n")
        os.replace(tmp, os.path.join(snapshot_dir, _LATEST_POINTER))
        # prune generations older than the previous one (kept as a grace
        # window for readers that resolved the pointer just pre-flip)
        import shutil

        for name in os.listdir(snapshot_dir):
            if not name.startswith("batch_"):
                continue
            try:
                gen = int(name.removeprefix("batch_"))
            except ValueError:
                continue
            if gen < batch_id - 1:
                shutil.rmtree(
                    os.path.join(snapshot_dir, name), ignore_errors=True
                )

    return (
        counts_stream.writeStream.outputMode("complete")
        .foreachBatch(write_snapshot)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


def read_counts_snapshot(spark, snapshot_dir: str) -> DataFrame:
    """Resolve the ``_LATEST`` pointer written by
    :func:`counts_snapshot_sink` and load that complete snapshot
    generation — the reader half of the atomic handoff."""
    import os

    with open(os.path.join(snapshot_dir, _LATEST_POINTER)) as f:
        gen = f.read().strip()
    return spark.read.parquet(os.path.join(snapshot_dir, gen))


__all__ = [
    "counts_snapshot_sink",
    "lang_token_stream",
    "read_counts_snapshot",
    "unimax_budgets_against",
]
