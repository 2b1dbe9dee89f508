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
