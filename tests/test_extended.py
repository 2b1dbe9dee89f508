"""Accuracy checks for operators whose values are engine-specific
(excluded from the DuckDB differential by design)."""

from __future__ import annotations

from kafka_streams_tcp_reconciliation_spark.plans import all_queries


def test_approx_distinct_within_tolerance(spark, sf_dir):
    """HLL++ estimate must sit within the configured rsd (2%, assert 5%
    for slack) of the exact distinct count for every key."""
    rows = all_queries()["approx_distinct_users"](spark, sf_dir).collect()
    assert rows, "no groups produced"
    for r in rows:
        assert r.exact_users > 0
        rel_err = abs(r.approx_users - r.exact_users) / r.exact_users
        assert rel_err < 0.05, (
            f"{r.event_type}: approx {r.approx_users} vs exact "
            f"{r.exact_users} (rel err {rel_err:.3f})"
        )


def test_approx_percentile_within_tolerance(spark, sf_dir):
    """GK-sketch percentiles must land within 5% relative error of exact
    interpolated percentiles (accuracy=1000 → rank error ~0.1%)."""
    rows = all_queries()["approx_percentile_value"](spark, sf_dir).collect()
    assert rows
    for r in rows:
        for approx, exact in zip(r.approx_p, r.exact_p):
            denom = max(abs(exact), 1e-9)
            assert abs(approx - exact) / denom < 0.05, (
                f"{r.event_type}: approx {approx} vs exact {exact}"
            )


def test_hll_sketch_rollup_merge_is_lossless(spark, sf_dir):
    """The 'ALL' row (union of per-type sketches) must equal a direct
    whole-table sketch estimate EXACTLY — HLL union is lossless — and
    every estimate must sit within 5% of the exact cardinality."""
    from pyspark.sql import functions as F

    from kafka_streams_tcp_reconciliation_spark.plans import all_queries
    from kafka_streams_tcp_reconciliation_spark.sources.tables import load_table

    out = {
        r["scope"]: r["approx_users"]
        for r in all_queries()["hll_user_sketch_rollup"](spark, sf_dir).collect()
    }
    ev = load_table(spark, sf_dir, "events")
    direct = ev.agg(
        F.hll_sketch_estimate(F.hll_sketch_agg("user_id")).alias("e")
    ).collect()[0]["e"]
    assert out["ALL"] == direct
    exact_all = ev.select("user_id").distinct().count()
    assert abs(out["ALL"] - exact_all) / exact_all < 0.05
    exact_by_type = {
        r["event_type"]: r["n"]
        for r in ev.groupBy("event_type")
        .agg(F.count_distinct("user_id").alias("n"))
        .collect()
    }
    for t, exact in exact_by_type.items():
        assert abs(out[t] - exact) / exact < 0.05, (t, out[t], exact)
