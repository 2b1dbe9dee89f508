"""Semantic properties of the clustering layer (plans/clustering.py) —
independent re-derivations in plain Python, complementing the DuckDB
differential's value-hash check."""

from __future__ import annotations

from kafka_streams_tcp_reconciliation_spark.plans import all_queries
from kafka_streams_tcp_reconciliation_spark.plans.llm import simhash_pair_frame

QUERIES = all_queries()


def test_cluster_resolve_matches_union_find(spark, sf_dir):
    """The distributed min-label fixpoint must equal a driver-side
    union-find over the same pairs: same membership, same min-id
    canonical, same cluster sizes."""
    pairs = [
        (r.doc_a, r.doc_b)
        for r in simhash_pair_frame(spark, sf_dir).collect()
    ]
    assert pairs, "fixture corpus produced no near-dup pairs"

    parent: dict[int, int] = {}

    def find(x: int) -> int:
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in pairs:
        parent.setdefault(a, a)
        parent.setdefault(b, b)
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)

    expected_canon = {x: find(x) for x in parent}
    expected_sizes: dict[int, int] = {}
    for c in expected_canon.values():
        expected_sizes[c] = expected_sizes.get(c, 0) + 1

    got = QUERIES["dedup_cluster_resolve"](spark, sf_dir).collect()
    assert {r.doc_id for r in got} == set(expected_canon)
    for r in got:
        assert r.canonical_id == expected_canon[r.doc_id]
        assert r.cluster_size == expected_sizes[r.canonical_id]


def test_kmeans_partitions_all_vectors(spark, sf_dir):
    """Every vector gets exactly one cluster in [0, k); distances are
    non-negative; more than one cluster survives on the fixture corpus."""
    rows = QUERIES["kmeans_embeddings"](spark, sf_dir).collect()
    n_vec = QUERIES["kmeans_embeddings"](spark, sf_dir).select("vec_id").distinct().count()
    assert len(rows) == n_vec
    clusters = {r.cluster for r in rows}
    assert clusters <= set(range(4))
    assert len(clusters) > 1
    assert all(r.dist >= 0 for r in rows)


def test_kmeans_assignment_is_narrow(spark, sf_dir):
    """The final assignment pass must be a narrow map over the cached
    corpus: centroids are driver-resident literals, so there is no join,
    no window, and no exchange above the cached scan."""
    plan = (
        QUERIES["kmeans_embeddings"](spark, sf_dir)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Window" not in plan
    assert "Join" not in plan
    above_cache = plan.split("InMemoryTableScan")[0]
    assert "Exchange" not in above_cache


def test_multiprobe_never_worse_than_single_probe(spark, sf_dir):
    """Probing 2 cells draws candidates from a superset of 1-cell probing,
    so at every (query, rank) the multi-probe cosine is >= single-probe."""
    single = {
        (r.query_id, r.rank): r.cosine
        for r in QUERIES["similarity_ivf_topk"](spark, sf_dir).collect()
    }
    multi = {
        (r.query_id, r.rank): r.cosine
        for r in QUERIES["similarity_ivf_multiprobe"](spark, sf_dir).collect()
    }
    assert single and set(single) <= set(multi)
    for key, cos in single.items():
        assert multi[key] >= cos - 1e-9, f"recall regressed at {key}"


def test_pq_codes_frame_matches_hof(spark):
    """Round-13 bit-equality lock for the Arrow PQ-encode kernel
    (``operators/similarity.pq_codes_frame``), which replaced the
    crossJoin(cb) + ``_pq_codes_expr`` interpreted argmin in
    similarity_pq_adc / similarity_ivf_pq: same codes for every corpus
    vector (same per-dim fold order, same HALF_UP micro rounding, same
    lowest-j tie-break), on the organic fixture at both SFs plus a
    truncated codebook (fewer present codewords than _PQ_K)."""
    import os

    from pyspark.sql import functions as F

    from kafka_streams_tcp_reconciliation_spark.operators import (
        similarity as sim,
    )
    from kafka_streams_tcp_reconciliation_spark.plans.clustering import (
        _PQ_M,
        _PQ_SUBDIM,
        _pq_cb_frame,
        _pq_codes_expr,
        _pq_collect_codebook,
    )
    from kafka_streams_tcp_reconciliation_spark.sources.tables import (
        load_table,
    )

    sf = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")
    emb = load_table(spark, sf, "embeddings").filter(
        F.col("embedding").isNotNull()
    )
    for cap in (None, 5):  # full codebook, then a truncated one
        e = emb if cap is None else emb.filter(F.col("vec_id") < 500)
        codebook = _pq_collect_codebook(
            e if cap is None else e.filter(F.col("vec_id") < cap)
        )
        if cap is not None:
            # emulate a corpus with < _PQ_K vectors: only ids < cap exist
            codebook = {k: v for k, v in codebook.items() if k[1] < cap}
        cb = F.broadcast(_pq_cb_frame(spark, codebook))
        hof = {
            r.vec_id: list(r.codes)
            for r in e.crossJoin(cb)
            .select("vec_id", F.expr(_pq_codes_expr("embedding")).alias("codes"))
            .collect()
        }
        ker = {
            r.vec_id: list(r.codes)
            for r in sim.pq_codes_frame(
                e, "embedding", codebook, _PQ_M, _PQ_SUBDIM, "vec_id long"
            ).collect()
        }
        assert set(hof) == set(ker)
        assert len(hof) > 100
        for vid, codes in hof.items():
            assert ker[vid] == codes, f"codes diverged for vec {vid} cap={cap}"
