"""Independent rederivation tests for plans/curation.py — each op is
recomputed in pure Python from the same inputs and compared exactly
(integer ops) or to 1e-6 (rounded doubles), plus a plan-shape lock on
the shuffle-free projection.
"""

from __future__ import annotations

from kafka_streams_tcp_reconciliation_spark.plans.curation import (
    _JL_ROWS,
    _PR_BASE_PPM,
    _PR_INIT_PPM,
    _PR_ITERS,
    dedup_levenshtein,
    embedding_random_projection,
    pagerank_neardup_graph,
)
from kafka_streams_tcp_reconciliation_spark.plans.llm import simhash_pair_frame
from kafka_streams_tcp_reconciliation_spark.sources.tables import load_table


def test_pagerank_matches_python_rederivation(spark, sf_dir):
    pairs = simhash_pair_frame(spark, sf_dir).collect()
    edges = []
    for r in pairs:
        edges.append((r.doc_a, r.doc_b))
        edges.append((r.doc_b, r.doc_a))
    deg: dict[int, int] = {}
    for s, _ in edges:
        deg[s] = deg.get(s, 0) + 1
    rank = {n: _PR_INIT_PPM for n in deg}
    for _ in range(_PR_ITERS):
        acc = {n: 0 for n in deg}
        for s, d in edges:
            acc[d] += rank[s] // deg[s]
        rank = {n: _PR_BASE_PPM + (85 * acc[n]) // 100 for n in deg}

    got = {
        r.doc_id: (r.rank_ppm, r.deg)
        for r in pagerank_neardup_graph(spark, sf_dir).collect()
    }
    assert set(got) == set(deg)
    for n in deg:
        assert got[n] == (rank[n], deg[n]), f"node {n}"
    # damped base is a floor; symmetric graph conserves no mass exactly,
    # but every node must retain at least the teleport share
    assert all(v[0] >= _PR_BASE_PPM for v in got.values())


def _lev(a: str, b: str) -> int:
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(
                min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + (ca != cb))
            )
        prev = cur
    return prev[len(b)]


def test_levenshtein_pairs_match_python_dp(spark, sf_dir):
    out = dedup_levenshtein(spark, sf_dir).collect()
    texts = {
        r.doc_id: r.text
        for r in load_table(spark, sf_dir, "documents").select("doc_id", "text").collect()
    }
    assert out, "expected at least one verified near-dup pair at test SF"
    for r in out[:10]:
        ed = _lev(texts[r.doc_a], texts[r.doc_b])
        assert r.edit_dist == ed
        rel = ed / max(len(texts[r.doc_a]), len(texts[r.doc_b]))
        assert abs(r.rel_edit - round(rel, 6)) <= 1e-9
        assert r.rel_edit <= 0.3


def test_random_projection_matches_ordered_fold(spark, sf_dir):
    rows = embedding_random_projection(spark, sf_dir).limit(5).collect()
    emb = {
        r.vec_id: r.embedding
        for r in load_table(spark, sf_dir, "embeddings").select("vec_id", "embedding").collect()
    }
    for r in rows:
        x = emb[r.vec_id]
        for k, srow in enumerate(_JL_ROWS):
            acc = 0.0
            for xv, sv in zip(x, srow):
                acc += float(xv) * sv
            assert abs(getattr(r, f"y{k:02d}") - acc) <= 1e-6


def test_random_projection_plan_is_shuffle_free(spark, sf_dir):
    plan = (
        embedding_random_projection(spark, sf_dir)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Exchange" not in plan
