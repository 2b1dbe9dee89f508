"""Incremental (mini-batch) k-means over a streaming embedding corpus —
the streaming twin of the batch ``kmeans_embeddings`` Lloyd loop, and the
online form of IVF coarse-centroid maintenance: as a corpus grows, the
cell centroids drift with it instead of being retrained from scratch.

Model shape (Bottou-Bengio sequential k-means): the k×d centroid matrix
and per-cluster counts are DRIVER-resident; each micro-batch runs one
distributed job — assign rows to the nearest centroid (centroids inlined
as literals: narrow map, no shuffle for the argmin, exactly like the
batch plan) and partial-aggregate per-cluster (sum, count). The driver
then folds the k×d partials into the running weighted mean:

    n_c' = n_c + m_c;   c' = (c * n_c + sum_c) / n_c'

Nothing corpus-sized ever reaches the driver — per batch the collect is
k×d doubles, independent of batch row count.

Use with ``writeStream.foreachBatch(model.foreach_batch())`` — or call
``model.update(df)`` directly from any batch loop.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from kafka_streams_tcp_reconciliation_spark.operators import similarity as sim


class MiniBatchKMeans:
    """Driver-resident k-means model updated one micro-batch at a time.

    ``centroids`` is a list of k float lists (d-dim); ``counts`` the
    number of rows each centroid has absorbed.
    """

    def __init__(self, init_centroids: list[list[float]]):
        self.centroids = [list(map(float, c)) for c in init_centroids]
        self.counts = [0] * len(self.centroids)
        self.dim = len(self.centroids[0])

    def _assign(self, batch: DataFrame) -> DataFrame:
        """Nearest-centroid assignment as a narrow map: centroid literals
        inlined, per-row ordered-fold distances, array_min argmin —
        the same plan shape as the batch kmeans_embeddings assignment."""
        sqn = F.expr(sim.dot_expr("embedding", "embedding"))
        choices = []
        for cid, cvec in enumerate(self.centroids):
            lit = "array({})".format(
                ", ".join(f"CAST({v!r} AS DOUBLE)" for v in cvec)
            )
            cnorm = 0.0
            for v in cvec:
                cnorm = cnorm + v * v
            dist = F.round(
                sqn + F.lit(cnorm) - 2 * F.expr(sim.dot_expr("embedding", lit)),
                6,
            )
            choices.append(
                F.struct(dist.alias("dist"), F.lit(cid).alias("cluster"))
            )
        best = F.array_min(F.array(*choices))
        return batch.select(
            best["cluster"].alias("cluster"), "embedding"
        )

    def update(self, batch: DataFrame) -> None:
        """One mini-batch step: distributed assign + per-(cluster, pos)
        partial sums, then the driver-side weighted-mean fold."""
        partials = (
            self._assign(batch)
            .select("cluster", F.posexplode("embedding").alias("pos", "v"))
            .groupBy("cluster", "pos")
            .agg(
                F.sum(F.col("v").cast("double")).alias("s"),
                F.count(F.lit(1)).alias("m"),
            )
            .collect()
        )
        sums: dict[int, list[float]] = {}
        m_rows: dict[int, int] = {}
        for r in partials:
            sums.setdefault(r.cluster, [0.0] * self.dim)[r.pos] = r.s
            m_rows[r.cluster] = int(r.m)
        for cid, m in m_rows.items():
            n_new = self.counts[cid] + m
            self.centroids[cid] = [
                (c * self.counts[cid] + s) / n_new
                for c, s in zip(self.centroids[cid], sums[cid])
            ]
            self.counts[cid] = n_new

    def foreach_batch(self):
        def fn(batch_df: DataFrame, batch_id: int) -> None:
            self.update(batch_df)

        return fn
