"""Incremental windowed top-k (SURVEY.md §2.11 X3 companion; the
continuous top-k query shape of the incremental-view-maintenance papers).

Spark cannot rank inside a streaming aggregation (no windowed
row_number over updating state), so the standard decomposition is:

  1. incremental windowed aggregation (update mode — per-key running
     totals maintained in the state store), then
  2. per-micro-batch ranking of the UPDATED aggregate rows in
     foreachBatch against the sink's current top-k table.

The sink keeps one small table (k rows per window); each batch merges
updated totals and re-ranks — O(windows x k) state, independent of the
stream's cardinality.

Correctness domain: exact when per-key totals are MONOTONE non-decreasing
(sums of non-negative values — this workload), because a key outside the
kept top-k can only re-enter by being updated, which re-emits it. For
non-monotone aggregates keep a widened margin (store m >> k rows) or
rebuild from the full update-mode state — the classic top-k maintenance
trade-off.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame


class TopKSink:
    """foreachBatch target maintaining top-k rows per window.

    Merge rule: new aggregate rows REPLACE same-(window, key) rows (their
    totals are running updates), then rank and keep k per window.
    """

    def __init__(self, out_dir: str, k: int = 3) -> None:
        self.out_dir = out_dir
        self.k = k
        os.makedirs(out_dir, exist_ok=True)
        self._current: "DataFrame | None" = None

    def __call__(self, batch_df: DataFrame, batch_id: int) -> None:
        from pyspark.sql import Window
        from pyspark.sql import functions as F

        spark = batch_df.sparkSession
        path = os.path.join(self.out_dir, "topk")
        try:
            prev = spark.read.parquet(path)
        except Exception:
            prev = None
        merged = batch_df
        if prev is not None:
            # previous rows lose to updated rows for the same (window, key)
            merged = prev.drop("rank").join(
                batch_df.select("window_start", "user_id"),
                ["window_start", "user_id"],
                "left_anti",
            ).unionByName(batch_df)
        w = Window.partitionBy("window_start").orderBy(
            F.col("total_value").desc(), F.col("user_id").asc()
        )
        ranked = (
            merged.withColumn("rank", F.row_number().over(w).cast("long"))
            .filter(F.col("rank") <= self.k)
        )
        ranked.write.mode("overwrite").parquet(path + "_next")
        # atomic-ish swap: read side always sees a complete table
        swap = spark.read.parquet(path + "_next")
        swap.write.mode("overwrite").parquet(path)


def windowed_topk_stream(events: DataFrame) -> DataFrame:
    """Stage 1: the incremental windowed aggregation (update mode)."""
    from pyspark.sql import functions as F

    return (
        events.withWatermark("ts", "30 minutes")
        .groupBy(F.window("ts", "1 hour").alias("w"), "user_id")
        .agg(F.round(F.sum("value"), 2).alias("total_value"))
        .select(
            F.date_format("w.start", "yyyy-MM-dd HH:mm:ss").alias("window_start"),
            "user_id",
            "total_value",
        )
    )
