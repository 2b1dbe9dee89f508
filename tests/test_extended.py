"""Accuracy checks for operators whose values are engine-specific
(excluded from the DuckDB differential by design)."""

from __future__ import annotations

from kafka_streams_tcp_reconciliation_spark.plans import all_queries


def test_approx_distinct_within_tolerance(spark, sf_dir):
    """HLL++ estimate must sit within the configured rsd (2%, assert 5%
    for slack) of the exact distinct count for every key — computed
    directly here (tight bound); the registered query carries the
    slacked bound as its oracle-checked within_bound column."""
    from pyspark.sql import functions as F

    from kafka_streams_tcp_reconciliation_spark.sources.tables import load_table

    ev = load_table(spark, sf_dir, "events")
    rows = (
        ev.groupBy("event_type")
        .agg(
            F.approx_count_distinct("user_id", rsd=0.02).alias("approx_users"),
            F.countDistinct("user_id").alias("exact_users"),
        )
        .collect()
    )
    assert rows, "no groups produced"
    for r in rows:
        assert r.exact_users > 0
        rel_err = abs(r.approx_users - r.exact_users) / r.exact_users
        assert rel_err < 0.05, (
            f"{r.event_type}: approx {r.approx_users} vs exact "
            f"{r.exact_users} (rel err {rel_err:.3f})"
        )
    checked = all_queries()["approx_distinct_users"](spark, sf_dir).collect()
    assert checked and all(r.within_bound for r in checked)


def test_approx_percentile_within_tolerance(spark, sf_dir):
    """GK-sketch percentiles must land within 5% relative error of exact
    interpolated percentiles (accuracy=1000 → rank error ~0.1%) — the
    tight bound, computed directly; the registered query re-ranks the
    sketch output and carries the slacked rank bound as within_bound."""
    from pyspark.sql import functions as F

    from kafka_streams_tcp_reconciliation_spark.sources.tables import load_table

    ev = load_table(spark, sf_dir, "events")
    rows = (
        ev.groupBy("event_type")
        .agg(
            F.expr(
                "approx_percentile(value, array(0.5, 0.95), 1000)"
            ).alias("approx_p"),
            F.expr("percentile(value, array(0.5, 0.95))").alias("exact_p"),
        )
        .collect()
    )
    assert rows
    for r in rows:
        for approx, exact in zip(r.approx_p, r.exact_p):
            denom = max(abs(exact), 1e-9)
            assert abs(approx - exact) / denom < 0.05, (
                f"{r.event_type}: approx {approx} vs exact {exact}"
            )
    checked = all_queries()["approx_percentile_value"](spark, sf_dir).collect()
    assert checked and all(r.within_bound for r in checked)


def test_hll_sketch_rollup_merge_is_lossless(spark, sf_dir):
    """The 'ALL' row (union of per-type sketches) must equal a direct
    whole-table sketch estimate EXACTLY — HLL union is lossless — and
    every estimate must sit within 5% of the exact cardinality."""
    from pyspark.sql import functions as F

    from kafka_streams_tcp_reconciliation_spark.plans import all_queries
    from kafka_streams_tcp_reconciliation_spark.sources.tables import load_table

    ev = load_table(spark, sf_dir, "events")
    per_type = ev.groupBy("event_type").agg(
        F.hll_sketch_agg("user_id").alias("sk")
    )
    out = {
        r["scope"]: r["approx_users"]
        for r in per_type.select(
            F.col("event_type").alias("scope"),
            F.hll_sketch_estimate("sk").alias("approx_users"),
        )
        .unionByName(
            per_type.agg(
                F.hll_sketch_estimate(F.hll_union_agg("sk")).alias(
                    "approx_users"
                )
            ).select(F.lit("ALL").alias("scope"), "approx_users")
        )
        .collect()
    }
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
    checked = all_queries()["hll_user_sketch_rollup"](spark, sf_dir).collect()
    assert checked and all(r.within_bound for r in checked)
