"""Properties + plan shapes of the advanced operator block
(plans/advanced.py): keyless bucketed range join, interval concurrency,
skyline, snapshot diff, bigram mining, prefix-filtered set-similarity join.

Each check is an INDEPENDENT re-derivation (plain Python brute force) or a
physical-plan assertion — complementing the DuckDB differential, which for
the mirrored pipelines can't catch a filter that's wrong the same way on
both sides.
"""

from __future__ import annotations

import itertools

from pyspark.sql import functions as F

from kafka_streams_tcp_reconciliation_spark.operators.joins import bucketed_range_join
from kafka_streams_tcp_reconciliation_spark.plans import all_queries
from kafka_streams_tcp_reconciliation_spark.plans.advanced import _SETSIM_TAU
from kafka_streams_tcp_reconciliation_spark.sources.tables import load_table

QUERIES = all_queries()


def test_bucketed_range_join_no_nested_loop(spark, sf_dir):
    """The keyless range join must plan as an equi-join on the bucket id —
    never a BroadcastNestedLoopJoin / CartesianProduct (the O(|L|·|R|)
    plans Spark picks for a raw interval predicate)."""
    plan = QUERIES["range_join_coactivity"](spark, sf_dir)._jdf.queryExecution(
    ).executedPlan().toString()
    assert "BroadcastNestedLoopJoin" not in plan, plan
    assert "CartesianProduct" not in plan, plan


def test_bucketed_range_join_matches_naive(spark, sf_dir):
    """Inner bucketed range join == brute-force theta join, pair for pair
    (checks both no-miss — a pair whose buckets misalign — and no-dup —
    a pair matched in two buckets)."""
    ev = load_table(spark, sf_dir, "events")
    left = ev.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("l_id"), F.col("ts").alias("l_ts")
    )
    right = ev.filter(F.col("event_type") == "error").select(
        F.col("event_id").alias("r_id"), F.col("ts").alias("r_ts")
    )
    radius_s = 120
    got = sorted(
        (r["l_id"], r["r_id"])
        for r in bucketed_range_join(
            left, right, "l_ts", "r_ts", radius_s
        ).select("l.l_id", "r.r_id").collect()
    )
    lrows = [(r.l_id, r.l_ts) for r in left.collect()]
    rrows = [(r.r_id, r.r_ts) for r in right.collect()]
    want = sorted(
        (li, ri)
        for (li, lt), (ri, rt) in itertools.product(lrows, rrows)
        if abs((rt - lt).total_seconds()) <= radius_s
    )
    assert got == want


def test_setsim_prefix_filter_loses_no_pair(spark, sf_dir):
    """The PPJoin result must equal BRUTE-FORCE Jaccard over every
    same-(lang, source) pair — i.e. the prefix filter prunes only pairs
    that cannot reach τ. (The DuckDB oracle mirrors the filter, so only
    this test would catch a too-aggressive prefix length.)"""
    docs = [
        (r.doc_id, r.lang, r.source, frozenset(r.text.split(" ")))
        for r in load_table(spark, sf_dir, "documents").collect()
    ]
    by_block: dict[tuple, list] = {}
    for doc_id, lang, source, toks in docs:
        by_block.setdefault((lang, source), []).append((doc_id, toks))
    want = set()
    for block in by_block.values():
        block.sort()
        for (ida, ta), (idb, tb) in itertools.combinations(block, 2):
            ov = len(ta & tb)
            if ov and ov / (len(ta) + len(tb) - ov) >= _SETSIM_TAU:
                want.add((ida, idb))
    got = {
        (r.doc_a, r.doc_b)
        for r in QUERIES["setsim_prefix_jaccard_join"](spark, sf_dir).collect()
    }
    assert got == want


def test_skyline_is_pareto_frontier(spark, sf_dir):
    """Every returned point is undominated within its brand, and every
    undominated point is returned — brute-force dominance re-derivation."""
    parts = load_table(spark, sf_dir, "part").select(
        "p_brand", "p_retailprice", "p_size"
    ).collect()
    pts: dict[str, dict[tuple, int]] = {}
    for r in parts:
        pts.setdefault(r.p_brand, {})
        key = (r.p_retailprice, r.p_size)
        pts[r.p_brand][key] = pts[r.p_brand].get(key, 0) + 1
    want = set()
    for brand, m in pts.items():
        for (pr, sz) in m:
            dominated = any(
                (qp <= pr and qs >= sz and (qp < pr or qs > sz))
                for (qp, qs) in m
            )
            if not dominated:
                want.add((brand, pr, sz, m[(pr, sz)]))
    got = {
        (r.p_brand, r.price, r.size, r.n_parts)
        for r in QUERIES["skyline_parts_by_brand"](spark, sf_dir).collect()
    }
    assert got == want


def test_snapshot_diff_partitions_are_disjoint_and_complete(spark, sf_dir):
    """added/removed/changed key sets are disjoint; removed ⊆ %97 keys,
    added keys all carry the +100000000 clone offset, and every changed
    row names at least one changed column."""
    rows = QUERIES["snapshot_diff_orders"](spark, sf_dir).collect()
    by_type: dict[str, set] = {"added": set(), "removed": set(), "changed": set()}
    for r in rows:
        by_type[r.change_type].add(r.o_orderkey)
        if r.change_type == "changed":
            assert r.changed_cols, r
        else:
            assert r.changed_cols is None, r
    assert not (by_type["added"] & by_type["removed"])
    assert not (by_type["added"] & by_type["changed"])
    assert not (by_type["removed"] & by_type["changed"])
    assert all(k % 97 == 0 for k in by_type["removed"])
    assert all(k >= 100000000 and (k - 100000000) % 89 == 0 for k in by_type["added"])
    assert all(k % 13 == 0 for k in by_type["changed"])


def test_concurrent_sessions_cover_every_event_hour(spark, sf_dir):
    """Each event's hour must be covered by at least one counted session
    of its user (sessions span their events), and session totals per hour
    are positive."""
    out = {
        r.hour: (r.n_sessions, r.n_users)
        for r in QUERIES["concurrent_sessions_hourly"](spark, sf_dir).collect()
    }
    assert out
    ev_hours = {
        r.h
        for r in load_table(spark, sf_dir, "events")
        .select(F.date_format(F.date_trunc("hour", "ts"), "yyyy-MM-dd HH:mm:ss").alias("h"))
        .distinct()
        .collect()
    }
    assert ev_hours <= set(out)
    for n_sessions, n_users in out.values():
        assert n_sessions >= n_users >= 1


def test_triangle_count_matches_bruteforce(spark, sf_dir):
    """Degree-ordered triangle count == brute-force adjacency-set count
    (independent of BOTH the Spark orientation and the oracle's id-ordered
    3-way join)."""
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_partkey"
    ).distinct().collect()
    per_order: dict[int, set] = {}
    for r in li:
        per_order.setdefault(r.l_orderkey, set()).add(r.l_partkey)
    from collections import Counter

    co = Counter()
    for parts in per_order.values():
        ps = sorted(parts)
        for i, u in enumerate(ps):
            for v in ps[i + 1:]:
                co[(u, v)] += 1
    edges = {e for e, n in co.items() if n >= 2}
    adj: dict[int, set] = {}
    for u, v in edges:
        adj.setdefault(u, set()).add(v)
        adj.setdefault(v, set()).add(u)
    # each triangle {u<v<w} counted once: per edge (u,v), third nodes w>v
    n_tri = sum(1 for (u, v) in edges for w in (adj[u] & adj[v]) if w > v)
    row = QUERIES["triangle_count_copurchase"](spark, sf_dir).collect()[0]
    assert row.n_edges == len(edges)
    assert row.n_triangles == n_tri


def test_longest_streak_matches_bruteforce(spark, sf_dir):
    """Island detection == plain-Python consecutive-day scan per user."""
    ev = load_table(spark, sf_dir, "events").select(
        "user_id", F.col("ts").cast("date").alias("day")
    ).distinct().collect()
    days: dict[int, set] = {}
    for r in ev:
        days.setdefault(r.user_id, set()).add(r.day)
    import datetime

    want = {}
    for u, ds in days.items():
        sorted_days = sorted(ds)
        longest = cur = 1
        for a, b in zip(sorted_days, sorted_days[1:]):
            cur = cur + 1 if (b - a) == datetime.timedelta(days=1) else 1
            longest = max(longest, cur)
        want[u] = (longest, len(ds))
    got = {
        r.user_id: (r.longest_streak, r.n_active_days)
        for r in QUERIES["longest_daily_streak_per_user"](spark, sf_dir).collect()
    }
    assert got == want


def test_revenue_share_sums_to_one_per_region(spark, sf_dir):
    """Shares within each region sum to ~1 and ranks are a permutation."""
    rows = QUERIES["revenue_share_within_region"](spark, sf_dir).collect()
    by_region: dict[str, list] = {}
    for r in rows:
        by_region.setdefault(r.r_name, []).append(r)
    assert by_region
    for region, rs in by_region.items():
        assert abs(sum(x.region_share for x in rs) - 1.0) < 1e-9, region
        assert sorted(x.region_rank for x in rs) == list(range(1, len(rs) + 1))
        top = min(rs, key=lambda x: x.region_rank)
        assert top.revenue == max(x.revenue for x in rs)


def test_heavy_hitters_match_bruteforce(spark, sf_dir):
    """Two-pass MG output == plain-Python exact counts filtered at N/k —
    the no-missed-candidate guarantee, end to end."""
    from collections import Counter

    from kafka_streams_tcp_reconciliation_spark.plans.advanced import _HH_K

    texts = [
        r.text for r in load_table(spark, sf_dir, "documents").collect()
    ]
    counts = Counter(w for t in texts for w in t.split(" "))
    n = sum(counts.values())
    want = {w: c for w, c in counts.items() if c * _HH_K > n}
    got = {
        r.word: r.n_word
        for r in QUERIES["heavy_hitter_words"](spark, sf_dir).collect()
    }
    assert got == want


def test_misra_gries_kernel_guarantee():
    """The MG kernel never evicts an item whose true count exceeds
    len(stream)/k — adversarial interleaving of one heavy item with a
    churn of singletons."""
    import pandas as pd

    from kafka_streams_tcp_reconciliation_spark.plans.advanced import (
        _make_mg_kernel,
    )

    k = 5
    stream = []
    for i in range(400):
        stream.append("heavy" if i % 3 == 0 else f"noise_{i}")
    out = list(_make_mg_kernel(k)(iter([pd.DataFrame({"word": stream})])))
    survivors = set(out[0]["word"])
    assert "heavy" in survivors  # count ~134 > 400/5


def test_top_other_rollup_is_a_partition(spark, sf_dir):
    """Per brand: ≤3 named head rows + one OTHER row; n_parts totals the
    brand's distinct sold parts; OTHER revenue is never negative."""
    rows = QUERIES["top_parts_with_other_rollup"](spark, sf_dir).collect()
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    sold = (
        li.join(part, li.l_partkey == part.p_partkey)
        .select("p_brand", "p_partkey")
        .distinct()
        .groupBy("p_brand")
        .count()
        .collect()
    )
    want_n = {r.p_brand: r["count"] for r in sold}
    by_brand: dict[str, list] = {}
    for r in rows:
        by_brand.setdefault(r.p_brand, []).append(r)
    assert set(by_brand) == set(want_n)
    for brand, rs in by_brand.items():
        named = [r for r in rs if r.part_label != "OTHER"]
        other = [r for r in rs if r.part_label == "OTHER"]
        assert len(named) <= 3 and len(other) <= 1
        assert sum(r.n_parts for r in rs) == want_n[brand]
        assert all(r.revenue >= 0 for r in rs)


def test_temporal_holdout_covers_everything(spark, sf_dir):
    """Split counts partition the event log and the eval span is ≤ 3 days."""
    import datetime

    rows = QUERIES["temporal_holdout_split"](spark, sf_dir).collect()
    total = load_table(spark, sf_dir, "events").count()
    assert sum(r.n_events for r in rows) == total
    fmt = "%Y-%m-%d %H:%M:%S"
    eval_rows = [r for r in rows if r.split == "eval"]
    assert eval_rows
    first = min(datetime.datetime.strptime(r.first_ts, fmt) for r in eval_rows)
    last = max(datetime.datetime.strptime(r.last_ts, fmt) for r in eval_rows)
    assert last - first <= datetime.timedelta(days=3)


def test_cms_never_underestimates(spark, sf_dir):
    """Count-min property: estimate ≥ exact for every probed word, and the
    estimate of the top word equals its exact count when its cells are
    uncontended enough (sanity: est is finite and ≥ 1)."""
    rows = QUERIES["count_min_word_frequencies"](spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r.cms_est >= r.n_exact >= 1, r


def test_chunk_reassembly_all_intact(spark, sf_dir):
    """Every document reassembles to its source checksum with the expected
    chunk count."""
    rows = QUERIES["chunk_reassembly_integrity"](spark, sf_dir).collect()
    n_docs = load_table(spark, sf_dir, "documents").count()
    assert len(rows) == n_docs
    assert all(r.intact for r in rows)
    assert all(r.n_chunks == 3 for r in rows)


def test_bounce_rate_is_a_valid_share(spark, sf_dir):
    """0 ≤ bounce ≤ sessions and the rate is their exact quotient."""
    rows = QUERIES["daily_bounce_rate"](spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert 0 <= r.n_bounce <= r.n_sessions
        assert r.bounce_rate == r.n_bounce / r.n_sessions


def test_partitioning_invariance_of_sketch_ops(spark, sf_dir):
    """Results of the sketch/candidate-generation ops must not depend on
    the physical partitioning — rerunning under a different
    spark.sql.shuffle.partitions (and thus different partition boundaries
    for the MG pass, LSH buckets, and prefix join) yields identical rows.
    This is the 1000-executor invariant: a cluster re-layout must never
    change an answer."""
    names = [
        "heavy_hitter_words",
        "count_min_word_frequencies",
        "setsim_prefix_jaccard_join",
        "dedup_minhash_lsh",
        # the round-6 Arrow pairwise-cosine kernels: group membership is
        # data-derived (cell/cluster id), so a re-layout must not change
        # any score, rank, or tiebreak
        "knn_graph_within_cells",
        "dedup_semantic_clusters",
    ]
    orig = spark.conf.get("spark.sql.shuffle.partitions")
    results = {}
    try:
        for n_part in ("5", orig):
            spark.conf.set("spark.sql.shuffle.partitions", n_part)
            for name in names:
                rows = sorted(
                    map(tuple, QUERIES[name](spark, sf_dir).collect())
                )
                results.setdefault(name, []).append(rows)
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", orig)
    for name, (a, b) in results.items():
        assert a == b, f"{name}: result depends on partitioning"


def test_knn_graph_matches_bruteforce(spark, sf_dir):
    """Within-cell kNN graph == numpy brute force over each label cell
    (independent of both engines' fold expressions)."""
    import numpy as np

    rows = load_table(spark, sf_dir, "embeddings").collect()
    by_label: dict[int, list] = {}
    for r in rows:
        by_label.setdefault(r.label, []).append(
            (r.vec_id, np.array(r.embedding, dtype=np.float64))
        )
    want = {}
    for members in by_label.values():
        ids = [m[0] for m in members]
        mat = np.stack([m[1] for m in members])
        norms = np.sqrt((mat * mat).sum(axis=1))
        sims = (mat @ mat.T) / np.outer(norms, norms)
        for i, vid in enumerate(ids):
            scored = sorted(
                (
                    (round(sims[i, j], 6), -nid)
                    for j, nid in enumerate(ids)
                    if j != i
                ),
                key=lambda t: (-t[0], -t[1]),
            )
            want[vid] = [(-nid, s) for s, nid in scored[:3]]
    got: dict[int, list] = {}
    out = QUERIES["knn_graph_within_cells"](spark, sf_dir).collect()
    for r in sorted(out, key=lambda r: (r.vec_id, r.rank)):
        got.setdefault(r.vec_id, []).append((r.neighbor_id, r.score))
    assert set(got) == set(want)
    for vid in want:
        got_ids = [n for n, _ in got[vid]]
        want_ids = [n for n, _ in want[vid]]
        assert got_ids == want_ids, (vid, got[vid], want[vid])
        for (gn, gs), (wn, ws) in zip(got[vid], want[vid]):
            assert abs(gs - ws) <= 1e-6, (vid, gn, gs, ws)


def test_knn_planes_expr_is_minimal(spark):
    """The in-engine plane-count fold must pick the MINIMAL p with
    n_labels · 2^p · target >= n (pure integer arithmetic — re-derived
    here in plain Python over a grid including the exact power-of-two
    boundaries where a float log2+ceil would be off by one)."""
    from kafka_streams_tcp_reconciliation_spark.operators import similarity as sim

    grid = [
        (n, nl)
        for n in (0, 1, 255, 256, 257, 2560, 2561, 5120, 5121, 163840, 200000)
        for nl in (1, 7, 10)
    ]
    df = spark.createDataFrame(grid, "kn_n long, kn_nl long")
    got = df.withColumn(
        "np", F.expr(sim.knn_planes_expr("kn_n", "kn_nl", 256))
    ).collect()
    for r in got:
        n, nl = max(r.kn_n, 1), max(r.kn_nl, 1)
        p = 0
        while nl * (1 << p) * 256 < n:
            p += 1
        assert r.np == p, (r.kn_n, r.kn_nl, r.np, p)


def test_knn_cell_scaling_actually_refines(spark, sf_dir):
    """The calibration query's cells must be strictly finer than the label
    cells (n_planes >= 1 at fixture scale), and every within-cell edge it
    emits must connect vectors of the SAME label — refinement never
    crosses a coarse cell."""
    from kafka_streams_tcp_reconciliation_spark.operators import similarity as sim
    from kafka_streams_tcp_reconciliation_spark.plans.advanced import (
        _KNN_CALIB_CELL_ROWS,
    )

    emb = load_table(spark, sf_dir, "embeddings").filter(
        F.col("label").isNotNull()
    )
    stats = emb.agg(
        F.count(F.lit(1)).alias("kn_n"), F.countDistinct("label").alias("kn_nl")
    )
    cells = (
        emb.crossJoin(F.broadcast(stats))
        .withColumn(
            "np",
            F.expr(sim.knn_planes_expr("kn_n", "kn_nl", _KNN_CALIB_CELL_ROWS)),
        )
        .withColumn("subcell", F.expr(sim.subcell_expr("embedding", "np")))
        .select("vec_id", "label", "subcell", "np")
    ).collect()
    assert all(r.np >= 1 for r in cells)
    n_cells = len({(r.label, r.subcell) for r in cells})
    n_labels = len({r.label for r in cells})
    assert n_cells > n_labels, (n_cells, n_labels)
    label_of = {r.vec_id: r.label for r in cells}
    cell_of = {r.vec_id: (r.label, r.subcell) for r in cells}
    out = QUERIES["knn_graph_cell_scaling"](spark, sf_dir).collect()
    assert out
    for r in out:
        assert label_of[r.vec_id] == label_of[r.neighbor_id]
        assert cell_of[r.vec_id] == cell_of[r.neighbor_id]


def test_conversion_lags_are_ordered_percentiles(spark, sf_dir):
    """Lags are non-negative and p50 ≤ p90 ≤ p99 on every day."""
    rows = QUERIES["conversion_lag_percentiles"](spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert 0 <= r.p50_lag_s <= r.p90_lag_s <= r.p99_lag_s
        assert r.n_conversions >= 1


def test_two_hop_reach_matches_bruteforce(spark, sf_dir):
    """Bounded BFS == plain-Python adjacency-set expansion."""
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_partkey"
    ).distinct().collect()
    from collections import Counter

    per_order: dict[int, set] = {}
    for r in li:
        per_order.setdefault(r.l_orderkey, set()).add(r.l_partkey)
    co = Counter()
    for parts in per_order.values():
        ps = sorted(parts)
        for i, u in enumerate(ps):
            for v in ps[i + 1:]:
                co[(u, v)] += 1
    adj: dict[int, set] = {}
    for (u, v), n in co.items():
        if n >= 2:
            adj.setdefault(u, set()).add(v)
            adj.setdefault(v, set()).add(u)
    want = {}
    for node, nbrs in adj.items():
        reach = set(nbrs)
        for m in nbrs:
            reach |= adj[m]
        reach.discard(node)
        want[node] = (len(nbrs), len(reach))
    got = {
        r.part: (r.n_1hop, r.n_within_2hops)
        for r in QUERIES["two_hop_reach_counts"](spark, sf_dir).collect()
    }
    assert got == want


def test_twap_is_bounded_by_value_range(spark, sf_dir):
    """TWAP lies within [min, max] of the user's values and weights are
    positive — plus an exact spot-rederivation for a few users."""
    rows = QUERIES["time_weighted_avg_value"](spark, sf_dir).collect()
    ev = load_table(spark, sf_dir, "events").select(
        "user_id", "ts", "event_id", "value"
    ).collect()
    by_user: dict[int, list] = {}
    for r in ev:
        by_user.setdefault(r.user_id, []).append((r.ts, r.event_id, r.value))
    assert rows
    for r in rows:
        seq = sorted(by_user[r.user_id])
        vals = [v for _, _, v in seq[:-1]]  # last point carries no weight
        assert r.total_us > 0 and r.n_intervals == len(seq) - 1
        assert min(vals) - 1e-9 <= r.twap_value <= max(vals) + 1e-9
    for r in rows[:5]:
        seq = sorted(by_user[r.user_id])
        num = den = 0.0
        for (t0, _, v), (t1, _, _) in zip(seq, seq[1:]):
            dt = (t1 - t0).total_seconds() * 1e6
            num += v * dt
            den += dt
        assert abs(r.twap_value - num / den) < 1e-4


def test_cusum_statistic_is_exact(spark, sf_dir):
    """The scaled CUSUM statistic re-derives exactly in Python ints."""
    rows = sorted(
        QUERIES["cusum_changepoint_days"](spark, sf_dir).collect(),
        key=lambda r: r.day,
    )
    counts = [r.n_events for r in rows]
    n_days, total = len(counts), sum(counts)
    cum = 0
    for t, r in enumerate(rows, start=1):
        cum += r.n_events
        s = n_days * cum - t * total
        assert r.s_scaled == s
        assert r.shifted == (abs(s) * 10 > n_days * total)
    assert rows[-1].s_scaled == 0  # CUSUM closes at zero by construction


def test_locf_carries_last_observation(spark, sf_dir):
    """Scanning each type's hourly series in order, carried_value always
    equals the most recent non-gap value, and gaps never appear before the
    first observation (spine starts at the first observed hour)."""
    rows = QUERIES["hourly_locf_by_type"](spark, sf_dir).collect()
    by_type: dict[str, list] = {}
    for r in rows:
        by_type.setdefault(r.event_type, []).append(r)
    assert by_type
    for series in by_type.values():
        series.sort(key=lambda r: r.hour)
        assert not series[0].is_gap
        last = None
        for r in series:
            if not r.is_gap:
                last = r.carried_value
            assert r.carried_value == last


def test_benford_shares_sum_and_rederive(spark, sf_dir):
    """Digit shares re-derive exactly from raw totals in Python ints."""
    import math

    rows = QUERIES["benford_first_digit_audit"](spark, sf_dir).collect()
    totals = [
        r.o_totalprice
        for r in load_table(spark, sf_dir, "orders").collect()
        if r.o_totalprice >= 1
    ]
    from collections import Counter

    want = Counter(int(str(int(math.floor(t)))[0]) for t in totals)
    n = sum(want.values())
    got = {r.first_digit: r for r in rows}
    assert set(got) == set(want)
    for d, r in got.items():
        assert r.n_orders == want[d]
        assert r.share_ppm == want[d] * 1000000 // n
        assert r.dev_ppm == r.share_ppm - r.benford_ppm


def test_abc_classes_partition_revenue(spark, sf_dir):
    """A/B/C partition all sold parts; python rederivation of the
    cumulative-share boundaries matches exactly."""
    rows = {r.abc_class: r for r in
            QUERIES["abc_classification_parts"](spark, sf_dir).collect()}
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_extendedprice", "l_discount"
    ).collect()
    units: dict[int, int] = {}
    for r in li:
        u = round(r.l_extendedprice * 100) * round((1 - r.l_discount) * 100)
        units[r.l_partkey] = units.get(r.l_partkey, 0) + u
    total = sum(units.values())
    want: dict[str, list] = {"A": [], "B": [], "C": []}
    cum = 0
    for part, u in sorted(units.items(), key=lambda kv: (-kv[1], kv[0])):
        cum += u
        cls = "A" if cum * 100 <= total * 80 else ("B" if cum * 100 <= total * 95 else "C")
        want[cls].append(u)
    for cls, us in want.items():
        if not us:
            assert cls not in rows
            continue
        assert rows[cls].n_parts == len(us)
    assert sum(r.n_parts for r in rows.values()) == len(units)


def test_weighted_median_rederives_exactly(spark, sf_dir):
    """Lower weighted median re-derives in Python ints per flag."""
    rows = {r.l_returnflag: r for r in
            QUERIES["weighted_median_quantity"](spark, sf_dir).collect()}
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_returnflag", "l_quantity", "l_extendedprice"
    ).collect()
    acc: dict[str, dict[float, int]] = {}
    for r in li:
        acc.setdefault(r.l_returnflag, {})
        acc[r.l_returnflag][r.l_quantity] = (
            acc[r.l_returnflag].get(r.l_quantity, 0)
            + round(r.l_extendedprice * 100)
        )
    for flag, wmap in acc.items():
        total = sum(wmap.values())
        cum = 0
        for q in sorted(wmap):
            cum += wmap[q]
            if cum * 2 >= total:
                assert rows[flag].weighted_median_qty == q, flag
                assert rows[flag].total_weight_cents == total
                break


def test_minmax_scaling_is_within_unit_interval(spark, sf_dir):
    """Every scaled value is in [0, 1]; each type attains both 0 and 1."""
    rows = QUERIES["minmax_scale_values_by_type"](spark, sf_dir).collect()
    by_type: dict[str, list] = {}
    for r in rows:
        assert 0.0 <= r.scaled_value <= 1.0
        by_type.setdefault(r.event_type, []).append(r.scaled_value)
    for vals in by_type.values():
        assert min(vals) == 0.0 and max(vals) == 1.0


def test_kaplan_meier_curve_properties(spark, sf_dir):
    """S(t) is non-increasing from ≤1 to ≥0, ends at 0 under the
    everyone-churns-at-horizon convention, and risk-set bookkeeping
    re-derives exactly in Python ints."""
    rows = sorted(
        QUERIES["kaplan_meier_churn"](spark, sf_dir).collect(),
        key=lambda r: r.day,
    )
    ev = load_table(spark, sf_dir, "events").select(
        "user_id", F.col("ts").cast("date").alias("d")
    ).collect()
    last = {}
    for r in ev:
        last[r.user_id] = max(last.get(r.user_id, r.d), r.d)
    from collections import Counter

    churn = Counter(last.values())
    n_users = len(last)
    churned_before = 0
    prev_s = 1.0
    for r in rows:
        import datetime

        d = datetime.date.fromisoformat(r.day)
        assert r.n_churn == churn.get(d, 0)
        assert r.n_at_risk == n_users - churned_before
        churned_before += r.n_churn
        assert r.survival <= prev_s + 1e-12
        prev_s = r.survival
    assert rows[-1].survival == 0.0  # everyone churns by the horizon


def test_autocorr_is_a_valid_correlation(spark, sf_dir):
    """|r| ≤ 1 with the expected pair count (hours − 24)."""
    row = QUERIES["hourly_autocorr_24h"](spark, sf_dir).collect()[0]
    n_hours = (
        load_table(spark, sf_dir, "events")
        .select(F.date_trunc("hour", "ts"))
        .distinct()
        .count()
    )
    assert row.n_pairs == n_hours - 24
    assert -1.0 <= row.autocorr_24h <= 1.0
