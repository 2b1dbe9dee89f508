"""Streaming mini-batch k-means — the model maintained over a chunked
replay must equal an independent numpy re-derivation of the same
sequential algorithm over the same chunks in the same order."""

from __future__ import annotations

import numpy as np
import pyarrow.parquet as pq

from kafka_streams_tcp_reconciliation_spark.sources.tables import load_table
from kafka_streams_tcp_reconciliation_spark.streaming.kmeans import MiniBatchKMeans

K = 4


def _numpy_minibatch(chunks: list[np.ndarray], init: np.ndarray):
    cent = init.astype(np.float64).copy()
    counts = np.zeros(K, dtype=np.int64)
    for x in chunks:
        x = x.astype(np.float64)
        d = (
            (x * x).sum(axis=1)[:, None]
            + (cent * cent).sum(axis=1)[None, :]
            - 2.0 * x @ cent.T
        )
        a = np.round(d, 6).argmin(axis=1)  # ties -> lowest cluster id
        for c in range(K):
            m = int((a == c).sum())
            if m:
                s = x[a == c].sum(axis=0)
                cent[c] = (cent[c] * counts[c] + s) / (counts[c] + m)
                counts[c] += m
    return cent, counts


def test_streaming_kmeans_matches_numpy_rederivation(spark, sf_dir, tmp_path):
    emb = load_table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    n = emb.count()
    cut1, cut2 = n // 3, 2 * n // 3
    chunk_dir = tmp_path / "emb_chunks"
    chunk_dir.mkdir()
    bounds = [(0, cut1), (cut1, cut2), (cut2, n)]
    for i, (lo, hi) in enumerate(bounds):
        out = tmp_path / f"stage{i}"
        emb.filter(f"vec_id >= {lo} AND vec_id < {hi}").coalesce(1).write.parquet(
            str(out)
        )
        (part,) = out.glob("part-*.parquet")
        part.rename(chunk_dir / f"c{i:02d}.parquet")

    init = [
        list(r.embedding)
        for r in emb.filter(f"vec_id < {K}").orderBy("vec_id").collect()
    ]
    model = MiniBatchKMeans(init)
    stream = (
        spark.readStream.schema(emb.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(chunk_dir))
    )
    q = (
        stream.writeStream.foreachBatch(model.foreach_batch())
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(timeout=300)

    np_chunks = []
    for i in range(3):
        t = pq.read_table(str(chunk_dir / f"c{i:02d}.parquet")).to_pydict()
        order = np.argsort(t["vec_id"])
        np_chunks.append(np.array(t["embedding"], dtype=np.float32)[order])
    want_cent, want_counts = _numpy_minibatch(np_chunks, np.array(init))

    assert sum(model.counts) == n
    assert model.counts == want_counts.tolist()
    assert np.allclose(np.array(model.centroids), want_cent, atol=1e-9)
