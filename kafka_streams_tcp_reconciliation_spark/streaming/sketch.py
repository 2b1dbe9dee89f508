"""Streaming sketch maintenance (SURVEY.md §2.11 + §2.9).

``cms_cells_stream`` keeps the count-min sketch of
``plans/advanced.count_min_word_frequencies`` incrementally: the d×w cell
table is just a streaming groupBy over (row, bucket) keys, so Spark's
update-mode state IS the sketch — bounded at d·w rows forever, the
constant-memory frequency telemetry a 100 TB ingest pipeline keeps warm.
Point queries then read min-over-d cells exactly as the batch op does.

The cell expressions come from the same shared hash family
(functions/hashing.py), so after a full replay the streaming cell table is
bit-identical to the batch sketch — the convergence test asserts set
equality, not approximation.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from kafka_streams_tcp_reconciliation_spark.functions import hashing as hsh
from kafka_streams_tcp_reconciliation_spark.plans.advanced import (
    _CMS_D,
    _CMS_W,
    _cms_bucket_exprs,
)


def cms_cells_stream(events_or_docs: DataFrame, text_col: str = "props") -> DataFrame:
    """Incrementally maintained CMS cell table over a token stream.

    Input: any streaming DataFrame with a string column; tokens are
    whitespace words of ``text_col``. Output (update mode): one row per
    touched (k, bucket) with its running count — state bounded by d·w.
    """
    words = events_or_docs.select(
        F.explode(F.split(F.col(text_col), " ")).alias("word")
    )
    wh = words.select(F.expr(hsh.spark_poly_hash("word")).alias("wx"))
    keyed = wh.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(k).alias("k"),
                        F.expr(b).cast("long").alias("bucket"),
                    )
                    for k, b in enumerate(_cms_bucket_exprs("wx"))
                ]
            )
        ).alias("kb")
    ).select("kb.k", "kb.bucket")
    return keyed.groupBy("k", "bucket").agg(F.count(F.lit(1)).alias("cell_n"))


__all__ = ["cms_cells_stream", "_CMS_D", "_CMS_W"]
