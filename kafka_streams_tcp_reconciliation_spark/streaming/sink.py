"""Streaming sinks (SURVEY.md §2.9 T4, §2.1 S7/S8): exactly-once
foreachBatch delivery + checkpointed state.

Kafka Streams gets exactly-once from broker transactions (EOS v2). In
Spark the equivalent contract is: checkpointed source offsets (each
micro-batch is replayable with the same batch_id) + an idempotent sink
(re-delivery of a batch_id is a no-op). ``IdempotentBatchSink`` encodes
that: a tiny commit log of applied batch ids next to the data; replays
skip. Works with any underlying writer (parquet dir here; JDBC upsert or
Kafka transactional producer in production).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame


class IdempotentBatchSink:
    """foreachBatch target with at-most-once apply per (checkpoint, batch).

    Usage::

        sink = IdempotentBatchSink(out_dir)
        stream.writeStream.foreachBatch(sink).option(
            "checkpointLocation", ckpt).start()
    """

    def __init__(self, out_dir: str) -> None:
        self.out_dir = out_dir
        self.commits_dir = os.path.join(out_dir, "_applied_batches")
        os.makedirs(self.commits_dir, exist_ok=True)

    def _marker(self, batch_id: int) -> str:
        return os.path.join(self.commits_dir, f"{batch_id}")

    def already_applied(self, batch_id: int) -> bool:
        return os.path.exists(self._marker(batch_id))

    def __call__(self, batch_df: DataFrame, batch_id: int) -> None:
        if self.already_applied(batch_id):
            return  # replay after restart: exactly-once effect
        (
            batch_df.write.mode("append").parquet(
                os.path.join(self.out_dir, "data")
            )
        )
        # marker written AFTER the data commit: a crash between the two
        # re-applies the batch, but parquet append of the same batch is
        # the failure window any sink has before its commit point — for a
        # transactional target (JDBC/Kafka txn) data+marker are one txn.
        with open(self._marker(batch_id), "w") as f:
            f.write("ok")
