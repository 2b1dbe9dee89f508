"""Driver-contract invariants locked as tests.

These guard the round-3 artifact fixes: the bench stdout line must fit the
driver's ~2 KB tail buffer, every registered query must carry a DuckDB
oracle (a regression to rows-only silently weakens the correctness gate),
and the new sampling/vectorizer ops keep their defining invariants.
"""

from __future__ import annotations

import json

from pyspark.sql import functions as F

from kafka_streams_tcp_reconciliation_spark.plans import (
    ORACLES,
    QUERIES,
    all_queries,
    load_all,
)
from kafka_streams_tcp_reconciliation_spark.sources.tables import load_table


def test_every_query_has_an_oracle():
    """All 214 registered queries are oracle-backed as of round 3; a new
    query without one should be a deliberate, test-visible decision."""
    load_all()
    missing = sorted(set(QUERIES) - set(ORACLES))
    assert not missing, (
        "queries without a DuckDB oracle (add one, or consciously update "
        f"this test): {missing}"
    )


def test_bench_stdout_line_fits_driver_tail_buffer():
    """The driver keeps only ~2 KB of bench stdout; the compact payload
    (headline queries + totals + pointer) must stay well inside it even
    with worst-case float widths."""
    import bench

    headline_names = [
        "q1_pricing_summary",
        "reconcile_purchase_click",
        "reconcile_unmatched_purchases",
        "tumbling_window_hourly",
        "session_window_stats",
        "stream_table_enrich",
        "dedup_minhash_lsh",
        "dedup_exact_docs",
        "similarity_topk_bruteforce",
        "similarity_ivf_pq",
        "curate_corpus",
        "triangle_count_copurchase",
        "mmr_diversified_topk",
        "bloom_decontaminate_train_eval",
        "pack_token_budget_bins",
        "text_quality_score",
    ]
    payload = json.dumps(
        {
            "metric": "total_query_time",
            "value": 99999.999,
            "unit": "sec",
            "queries": {k: 99999.999 for k in headline_names},
            "n_queries": 9999,
            "n_failed": 9999,
            "queries_file": "BENCH.json",
            "sf": 0.1,
        }
    )
    assert len(payload) < 1500, f"compact bench line too long: {len(payload)}"
    assert bench  # imported without side effects


def test_reservoir_sample_exactly_k_per_user(spark, sf_dir):
    """Each user keeps exactly min(K, n_events) events, and a second run
    keeps the SAME events (deterministic reservoir)."""
    out = all_queries()["reservoir_sample_per_user"](spark, sf_dir)
    per_user = (
        out.groupBy("user_id").agg(F.count(F.lit(1)).alias("k")).toPandas()
    )
    ev_counts = (
        load_table(spark, sf_dir, "events")
        .groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n"))
        .toPandas()
        .set_index("user_id")["n"]
    )
    for r in per_user.itertuples(index=False):
        assert r.k == min(3, ev_counts[r.user_id]), r
    a = set(map(tuple, out.select("user_id", "event_id").toPandas().values))
    b = set(
        map(
            tuple,
            all_queries()["reservoir_sample_per_user"](spark, sf_dir)
            .select("user_id", "event_id")
            .toPandas()
            .values,
        )
    )
    assert a == b


def test_feature_hash_counts_conserve_tokens(spark, sf_dir):
    """Bucketing never loses tokens: sum of bucket counts per doc equals
    the doc's non-empty token count, and buckets stay inside [0, D)."""
    out = all_queries()["feature_hash_vectorizer"](spark, sf_dir).toPandas()
    assert out["bucket"].between(0, 63).all()
    got = out.groupby("doc_id")["n_tokens"].sum()
    docs = (
        load_table(spark, sf_dir, "documents")
        .filter(F.col("doc_id") % 10 == 0)
        .select(
            "doc_id",
            F.size(
                F.filter(F.split("text", " "), lambda t: t != "")
            ).alias("n"),
        )
        .toPandas()
        .set_index("doc_id")["n"]
    )
    assert got.to_dict() == docs.to_dict()


def test_pairwise_cosine_kernel_pickles_by_value(tmp_path):
    """The numpy pairwise-cosine kernel is captured inside pandas-kernel
    closures (kNN graph, SemDeDup). The external driver runs from a
    foreign cwd whose Python workers CANNOT import this package, so the
    function must cloudpickle BY VALUE (factory-produced, non-importable
    qualname) — a plain module-level def regresses to a by-reference
    pickle and a worker-side ModuleNotFoundError. Proven the honest way:
    unpickle and CALL it in a subprocess with the repo stripped from
    sys.path."""
    import subprocess
    import sys

    from pyspark import cloudpickle

    from kafka_streams_tcp_reconciliation_spark.operators import similarity as sim

    blob_path = tmp_path / "kern.pkl"
    blob_path.write_bytes(cloudpickle.dumps(sim.pairwise_cosine_matrix))
    code = f"""
import sys
sys.path = [p for p in sys.path if "repo" not in p]
from pyspark import cloudpickle
f = cloudpickle.loads(open({str(blob_path)!r}, "rb").read())
m = f([[1.0, 0.0], [0.0, 1.0], [1.0, 1.0]])
assert m.shape == (3, 3) and m[0][0] == 1.0
print("kernel-self-contained")
"""
    r = subprocess.run(
        [sys.executable, "-c", code],
        capture_output=True,
        text=True,
        cwd=str(tmp_path),
    )
    assert "kernel-self-contained" in r.stdout, r.stderr[-1000:]


def test_registry_invocation_clears_prior_cache(spark, sf_dir):
    """Invoking any registered query through the QUERIES registry must
    first release cached relations left by PREVIOUS queries: the external
    driver runs ~50 queries sequentially in one session with no cache
    hygiene, and accumulated storage memory starved the co-resident DuckDB
    oracle in round 7 (2 KB allocation failure on the window's last
    query). The raw functions (imported by composing modules) must stay
    unwrapped so intra-query composition never clears mid-plan."""
    from kafka_streams_tcp_reconciliation_spark.plans import QUERIES, load_all
    from kafka_streams_tcp_reconciliation_spark.sources.tables import load_table

    load_all()
    cm = spark._jsparkSession.sharedState().cacheManager()
    leftover = load_table(spark, sf_dir, "region").cache()
    leftover.count()
    assert not cm.isEmpty()
    # q1 caches nothing itself, so after invocation the manager is empty
    QUERIES["q1_pricing_summary"](spark, sf_dir).count()
    assert cm.isEmpty()
    # the registry stores a wrapper; the composable raw fn is __wrapped__
    assert hasattr(QUERIES["q1_pricing_summary"], "__wrapped__")


def test_bench_episode_detector():
    """Round-12 host-episode self-diagnosis: >=4 CONTIGUOUS execution-order
    queries all >2x their baseline medians flag an episode block in the
    bench artifact (sustained co-running host load inflates alphabetical
    blocks — round-11 re-baseline run 4); scattered or short runs do not,
    and queries with no baseline row are neutral (neither extend nor
    break a run)."""
    import bench

    base = {f"q{i:02d}": 1.0 for i in range(12)}

    # all nominal -> no episodes
    assert bench.detect_host_episodes(dict(base), base) == []

    # 5-long contiguous block >2x -> one episode with correct bounds
    t = dict(base)
    for i in range(3, 8):
        t[f"q{i:02d}"] = 3.0
    eps = bench.detect_host_episodes(t, base)
    assert eps == [
        {"start": "q03", "end": "q07", "n": 5, "median_ratio": 3.0}
    ]

    # 3-long run is below the minimum — a genuine regression pattern
    t2 = dict(base)
    for i in (3, 4, 5):
        t2[f"q{i:02d}"] = 3.0
    assert bench.detect_host_episodes(t2, base) == []

    # scattered breaches never form an episode
    t3 = dict(base)
    for i in (0, 3, 6, 9):
        t3[f"q{i:02d}"] = 3.0
    assert bench.detect_host_episodes(t3, base) == []

    # a query with no baseline row inside the block is neutral: the
    # run spans it rather than splitting
    t4 = dict(base)
    for i in range(3, 8):
        t4[f"q{i:02d}"] = 3.0
    b4 = dict(base)
    del b4["q05"]
    eps4 = bench.detect_host_episodes(t4, b4)
    assert eps4 == [
        {"start": "q03", "end": "q07", "n": 4, "median_ratio": 3.0}
    ]

    # failed timings (-1) are neutral too, never a ratio
    t5 = dict(base)
    t5["q00"] = -1.0
    assert bench.detect_host_episodes(t5, base) == []
