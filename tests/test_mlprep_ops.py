"""Properties of the ML-prep block (plans/mlprep.py): independent plain-
Python re-derivations complementing the DuckDB differential (which cannot
catch a rule that is wrong the same way in both mirrored pipelines).
"""

from __future__ import annotations

import math

import pandas as pd

from kafka_streams_tcp_reconciliation_spark.plans import all_queries
from kafka_streams_tcp_reconciliation_spark.plans.mlprep import (
    _MMR_K,
    _MMR_LAMBDA,
    _MMR_POOL,
    _NEAREST_TOL_US,
)
from kafka_streams_tcp_reconciliation_spark.sources.tables import load_table

QUERIES = all_queries()


def test_nearest_event_join_matches_bruteforce(spark, sf_dir):
    """Every purchase's match equals the plain argmin-|gap| scan over that
    user's clicks (tie -> earlier click), independently re-derived row by
    row in Python."""
    ev = load_table(spark, sf_dir, "events").toPandas()
    got = {
        r.purchase_id: (r.click_id, r.gap_us)
        for r in QUERIES["nearest_event_join"](spark, sf_dir)
        .toPandas()
        .itertuples(index=False)
    }
    clicks_by_user: dict[int, list[tuple[int, int]]] = {}
    for r in ev[ev["event_type"] == "click"].itertuples(index=False):
        clicks_by_user.setdefault(int(r.user_id), []).append(
            (int(pd.Timestamp(r.ts).value // 1000), int(r.event_id))
        )
    purchases = ev[ev["event_type"] == "purchase"]
    assert len(got) == len(purchases)
    for r in purchases.itertuples(index=False):
        p_ts = int(pd.Timestamp(r.ts).value // 1000)
        best = None  # (abs_gap, prefer_backward_rank, click_id, signed_gap)
        for c_ts, c_id in clicks_by_user.get(int(r.user_id), []):
            gap = c_ts - p_ts
            if abs(gap) > _NEAREST_TOL_US:
                continue
            # backward (gap <= 0) wins ties against forward
            key = (abs(gap), 0 if gap <= 0 else 1)
            # among equal-ts clicks the batch carry keeps the LAST in
            # (ts, event_id) order for backward, FIRST for forward
            if best is None or key < best[0]:
                best = (key, c_id, gap)
            elif key == best[0]:
                if gap <= 0:  # backward: larger event_id wins (later carry)
                    if c_id > best[1]:
                        best = (key, c_id, gap)
                else:  # forward: smaller event_id wins (first in order)
                    if c_id < best[1]:
                        best = (key, c_id, gap)
        want = (best[1], best[2]) if best else (None, None)
        g = got[r.event_id]
        g = (
            None if pd.isna(g[0]) else int(g[0]),
            None if pd.isna(g[1]) else int(g[1]),
        )
        assert g == want, (r.event_id, g, want)


def test_drawdown_matches_bruteforce(spark, sf_dir):
    """Per-user max drawdown equals the direct peak-trough scan of the
    cumulative series in event order."""
    ev = load_table(spark, sf_dir, "events").toPandas()
    got = {
        int(r.user_id): r.max_drawdown
        for r in QUERIES["value_drawdown_per_user"](spark, sf_dir)
        .toPandas()
        .itertuples(index=False)
    }
    for uid, grp in ev.sort_values(["ts", "event_id"]).groupby("user_id"):
        cum = 0.0
        peak = -math.inf
        dd = 0.0
        for v in grp["value"]:
            cum += float(v)
            peak = max(peak, cum)
            dd = max(dd, peak - cum)
        assert abs(got[int(uid)] - round(dd, 6)) < 1e-9, (uid, got[int(uid)], dd)


def test_winsorize_invariants(spark, sf_dir):
    """Cut points and clamp counts respect their defining inequalities:
    p05 <= p95, each tail clamps < 6% of rows (ceil semantics), and the
    counts match a direct recount against the reported cuts."""
    ev = load_table(spark, sf_dir, "events").toPandas()
    out = QUERIES["winsorize_values_by_type"](spark, sf_dir).toPandas()
    for r in out.itertuples(index=False):
        vals = ev[ev["event_type"] == r.event_type]["value"]
        assert r.p05 <= r.p95
        assert r.n == len(vals)
        # reported cuts are rounded for display; recount with a tolerance
        # band and require the exact count to sit inside it
        lo_hi = (vals < r.p05 - 1e-6).sum(), (vals < r.p05 + 1e-6).sum()
        assert lo_hi[0] <= r.n_clamped_low <= lo_hi[1], (r, lo_hi)
        hi = (vals > r.p95 + 1e-6).sum(), (vals > r.p95 - 1e-6).sum()
        assert hi[0] <= r.n_clamped_high <= hi[1], (r, hi)
        assert r.n_clamped_low <= math.ceil(0.05 * r.n)
        assert r.n_clamped_high <= r.n - math.ceil(0.95 * r.n) + 1


def test_entropy_bounds_and_degenerate_case(spark, sf_dir):
    """0 <= H <= ln(#types); a user with a single event type scores
    exactly 0 micro-nats."""
    out = QUERIES["user_event_entropy"](spark, sf_dir).toPandas()
    ev = load_table(spark, sf_dir, "events").toPandas()
    n_types = ev["event_type"].nunique()
    assert (out["entropy_micro_nats"] >= 0).all()
    assert (out["entropy_micro_nats"] <= int(math.log(n_types) * 1e6) + 1).all()
    single = ev.groupby("user_id")["event_type"].nunique()
    for uid in single[single == 1].index:
        row = out[out["user_id"] == uid]
        if len(row):
            assert int(row["entropy_micro_nats"].iloc[0]) == 0


def test_mmr_picks_are_distinct_pool_members(spark, sf_dir):
    """MMR returns K distinct picks, the first is the raw-relevance argmax,
    and scores are monotonically achievable (first score >= lambda * any
    later pick's relevance contribution can't be asserted in general, but
    rank-1 must dominate rank-2's score)."""
    out = (
        QUERIES["mmr_diversified_topk"](spark, sf_dir)
        .toPandas()
        .sort_values("rank")
    )
    assert list(out["rank"]) == list(range(1, _MMR_K + 1))
    assert out["neighbor_id"].nunique() == _MMR_K
    assert out.iloc[0]["score"] >= out.iloc[1]["score"] - 1e-9
    assert 0 < _MMR_LAMBDA < 1 and _MMR_K <= _MMR_POOL


def test_mmr_pool_guard_rejects_oversized_pool():
    """The MMR pool bound is ASSERTED in code (ADVICE r09), not just
    documented: a pool size that would make the driver-side rerank collect
    a corpus-sized relation must raise at validation, as must a
    non-positive pool; the shipped default passes."""
    import pytest

    from kafka_streams_tcp_reconciliation_spark.plans.mlprep import (
        _MMR_POOL_MAX,
        _validate_mmr_pool,
    )

    with pytest.raises(ValueError, match="distributed"):
        _validate_mmr_pool(_MMR_POOL_MAX + 1)
    with pytest.raises(ValueError):
        _validate_mmr_pool(0)
    assert _validate_mmr_pool(_MMR_POOL) == _MMR_POOL


def test_knn_accuracy_output_invariants(spark, sf_dir):
    """Structural invariants of the vote: one row per query, predictions
    drawn from the label domain, is_correct consistent with the equality
    it claims. (The fixture's labels are INDEPENDENT of the vectors —
    measured mean pairwise cosine is ~0 both within and across labels —
    so accuracy itself is ~1/#labels by construction; the differential
    oracle already pins the exact votes.)"""
    out = QUERIES["knn_label_accuracy"](spark, sf_dir).toPandas()
    ev = load_table(spark, sf_dir, "embeddings").toPandas()
    n_queries = (ev["vec_id"] < 100).sum()
    assert len(out) == n_queries
    assert out["query_id"].is_unique
    labels = set(ev["label"])
    assert set(out["pred_label"]).issubset(labels)
    assert (
        out["is_correct"] == (out["pred_label"] == out["true_label"])
    ).all()


def test_attribution_credits_conserve_ppm(spark, sf_dir):
    """Total credited ppm equals exactly 1e6 × (purchases with ≥1 touch):
    the largest-remainder schedule loses nothing to rounding."""
    ev = load_table(spark, sf_dir, "events").toPandas()
    out = QUERIES["positional_attribution_daily"](spark, sf_dir).toPandas()
    purchases = ev[ev["event_type"] == "purchase"]
    clicks = ev[ev["event_type"] == "click"]
    n_with_touch = 0
    by_user = {u: g for u, g in clicks.groupby("user_id")}
    for r in purchases.itertuples(index=False):
        g = by_user.get(r.user_id)
        if g is None:
            continue
        lo = r.ts - pd.Timedelta(minutes=30)
        if ((g["ts"] <= r.ts) & (g["ts"] > lo)).any():
            n_with_touch += 1
    assert out["credit_ppm"].sum() == 1_000_000 * n_with_touch


def test_kfold_partitions_corpus(spark, sf_dir):
    """Folds partition the corpus: per-lang doc counts sum to the lang's
    total and every fold id is in [0, 5)."""
    docs = load_table(spark, sf_dir, "documents").toPandas()
    out = QUERIES["stratified_kfold_sizes"](spark, sf_dir).toPandas()
    assert set(out["fold"]).issubset(set(range(5)))
    got = out.groupby("lang")["n_docs"].sum().sort_index()
    want = docs.groupby("lang")["doc_id"].count().sort_index()
    assert (got.values == want.values).all()


def test_bitmap_distinct_is_exact(spark, sf_dir):
    """The bitmap popcount equals the plain COUNT(DISTINCT) per type."""
    ev = load_table(spark, sf_dir, "events").toPandas()
    out = QUERIES["bitmap_distinct_users_by_type"](spark, sf_dir).toPandas()
    want = ev.groupby("event_type")["user_id"].nunique()
    merged = out.set_index("event_type")["n_users"]
    assert (merged.sort_index().values == want.sort_index().values).all()


def test_cuped_arms_partition_users(spark, sf_dir):
    """CUPED reports exactly the two parity arms and covers every user."""
    ev = load_table(spark, sf_dir, "events").toPandas()
    out = QUERIES["cuped_ab_lift"](spark, sf_dir).toPandas()
    assert sorted(out["arm"]) == [0, 1]
    assert out["n_users"].sum() == ev["user_id"].nunique()


def test_bitext_margin_exact_bruteforce(spark, sf_dir):
    """The exact tier's per-source winner and integer margin must match a
    plain-Python rebuild from the parquet vectors (cos rounded once to
    micro, top-4 neighborhood sums, cross-multiplied margin)."""
    import numpy as np
    import pyarrow.parquet as pq
    import os

    got = {
        r["src_id"]: r
        for r in all_queries()["bitext_margin_mining"](spark, sf_dir).collect()
    }
    tb = pq.read_table(os.path.join(sf_dir, "embeddings.parquet")).to_pylist()
    src = {r["vec_id"]: np.array(r["embedding"], dtype="float64")
           for r in tb if r["label"] < 5}
    tgt = {r["vec_id"]: np.array(r["embedding"], dtype="float64")
           for r in tb if r["label"] >= 5}
    cos = {}
    for si, sv in src.items():
        for ti, tv in tgt.items():
            c = float(sv @ tv) / math.sqrt(float(sv @ sv) * float(tv @ tv))
            cos[(si, ti)] = int(np.round(c * 1_000_000))
    K = 4
    fwd = {
        si: sum(sorted((cos[(si, ti)] for ti in tgt), reverse=True)[:K])
        for si in src
    }
    bwd = {
        ti: sum(sorted((cos[(si, ti)] for si in src), reverse=True)[:K])
        for ti in tgt
    }
    assert set(got) == set(src)
    for si in src:
        best = None
        for ti in sorted(tgt):
            c = cos[(si, ti)]
            denom = fwd[si] + bwd[ti]
            m = (2 * K * c * 1_000_000) // denom if c > 0 and denom > 0 else 0
            if best is None or m > best[1]:
                best = (ti, m)
        r = got[si]
        assert (r["tgt_id"], r["margin_micro"]) == best, si
        assert r["mined"] == (best[1] > 1_050_000)


def test_bitext_lsh_consistent_with_exact(spark, sf_dir):
    """The LSH tier must agree with the exact tier wherever they overlap:
    identical cos_micro for any (src, tgt) pair both rank first, and an
    LSH margin never exceeds what the exact-product margin arithmetic
    allows for that pair (candidate-restricted neighborhood sums are
    <= the true top-K sums only when fewer than K candidates exist, so
    the check is on the shared pairs' cosine, the engine-exact part)."""
    ex = {
        (r["src_id"], r["tgt_id"]): r
        for r in all_queries()["bitext_margin_mining"](spark, sf_dir).collect()
    }
    ls = {
        (r["src_id"], r["tgt_id"]): r
        for r in all_queries()["bitext_margin_mining_lsh"](
            spark, sf_dir
        ).collect()
    }
    shared = set(ex) & set(ls)
    assert shared, "fixture produced no overlapping rank-1 pairs"
    for k in shared:
        assert ex[k]["cos_micro"] == ls[k]["cos_micro"], k
    # the LSH tier only emits sources that had >= 1 bucket collision
    assert set(s for s, _ in ls) <= set(s for s, _ in ex)


def test_bitext_planted_pair_recall(spark, tmp_path_factory, monkeypatch):
    """Round-12 planted-parallel-pair fixture: the LSH tier's documented
    recall dial (table count T -> 1-(1-p)^T) measured on TRUE parallel
    pairs instead of collision arithmetic on random vectors.

    The organic fixture has no parallel pairs (mined pairs sit at cos
    0.3-0.4 where sign-LSH recall is legitimately ~6%), so the round-11
    "8 tables -> ~78% at cos >= 0.8" claim was paper arithmetic. Here 40
    target-side twins are PLANTED at cos ~0.85-0.95 of source vectors
    (unit-orthogonal rotation, seeded); the exact tier mines them (they
    are rank-1 by construction), giving ground truth G, and the LSH
    tier's pair recall over G is measured at T=2 (default) and T=8.

    Measured on this fixture (seed 29, 40 planted pairs, all 40 exact-
    mined): recall 0.350 / 0.500 / 0.700 / 0.825 at T = 1 / 2 / 4 / 8 —
    matching the (1-θ/π)^planes-per-table, OR-over-tables model for θ in
    [18°, 32°] (per-table p 0.21-0.36). Assertions are loose bands so
    plane-constant changes surface as comprehensible failures, not
    flake."""
    import os

    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    import kafka_streams_tcp_reconciliation_spark.operators.similarity as sim
    from kafka_streams_tcp_reconciliation_spark.sources.tables import (
        TABLE_NAMES,
    )

    src_dir = os.environ.get(
        "SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001"
    )
    dst = tmp_path_factory.mktemp("sf_bitext_planted")
    rng = np.random.default_rng(29)
    planted: list[tuple[int, int]] = []
    for t in TABLE_NAMES:
        tb = pq.read_table(os.path.join(src_dir, f"{t}.parquet"))
        tb = tb.replace_schema_metadata(None)
        if t == "embeddings":
            ids = np.array(tb.column("vec_id"))
            labs = np.array(tb.column("label"))
            vecs = np.array(tb.column("embedding").to_pylist(), dtype=np.float64)
            src_rows = np.flatnonzero(labs < 5)[:40]
            new_ids, new_vecs, new_labs = [], [], []
            for i, row in enumerate(src_rows):
                s = vecs[row]
                s_hat = s / np.linalg.norm(s)
                n = rng.standard_normal(s.shape)
                n -= n.dot(s_hat) * s_hat
                n_hat = n / np.linalg.norm(n)
                cos = 0.85 + 0.10 * (i / max(1, len(src_rows) - 1))
                tvec = cos * s_hat + math.sqrt(1 - cos * cos) * n_hat
                nid = 20_000 + i
                new_ids.append(nid)
                new_vecs.append(tvec.astype(np.float32))
                new_labs.append(5 + (i % 5))
                planted.append((int(ids[row]), nid))
            tb = pa.table(
                {
                    "vec_id": pa.array(
                        list(ids) + new_ids, type=pa.int64()
                    ),
                    "embedding": pa.array(
                        [list(map(float, v)) for v in vecs.astype(np.float32)]
                        + [list(map(float, v)) for v in new_vecs],
                        type=pa.list_(pa.float32()),
                    ),
                    "label": pa.array(
                        list(labs) + new_labs, type=pa.int32()
                    ),
                }
            )
        pq.write_table(tb, str(dst / f"{t}.parquet"))

    exact = QUERIES["bitext_margin_mining"](spark, str(dst)).collect()
    exact_pairs = {(r["src_id"], r["tgt_id"]) for r in exact}
    mined = {
        (r["src_id"], r["tgt_id"]) for r in exact if r["mined"]
    }
    ground = [p for p in planted if p in exact_pairs]
    # planted twins dominate every random cross cosine -> rank-1, and
    # their margins clear the threshold: the exact tier finds ~all 40
    assert len(ground) >= 35, len(ground)
    assert sum(1 for p in planted if p in mined) >= 30

    def lsh_recall(tables: int) -> float:
        monkeypatch.setattr(sim, "LSH_TABLES", tables)
        got = {
            (r["src_id"], r["tgt_id"])
            for r in QUERIES["bitext_margin_mining_lsh"](
                spark, str(dst)
            ).collect()
        }
        return sum(1 for p in ground if p in got) / len(ground)

    r2 = lsh_recall(2)
    r8 = lsh_recall(8)
    # the dial: more OR-ed tables -> strictly better planted-pair recall,
    # and 8 tables recovers the large majority of true parallel pairs
    assert r8 > r2, (r2, r8)
    assert r8 >= 0.7, (r2, r8)
    assert 0.15 <= r2 <= 0.85, (r2, r8)


def test_bitext_pair_scores_matches_hof(spark):
    """Round-12 bit-equality lock for the Arrow cross-cosine kernel
    (``operators/similarity.bitext_pair_scores``), which replaced the
    exact bitext tier's crossJoin + three interpreted HOF folds per
    pair. Same pairs, same int64 micro-cosines — including NULL
    embeddings on either side (NULL cos_micro, like the SQL fold) —
    verified against the HOF expression it replaced, on the organic
    fixture plus injected NULL rows."""
    import os

    from pyspark.sql import functions as F

    from kafka_streams_tcp_reconciliation_spark.operators import (
        similarity as sim,
    )

    sf = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")
    emb = load_table(spark, sf, "embeddings")
    nulls = spark.createDataFrame(
        [(9_000_001, None, 1), (9_000_002, None, 7)],
        "vec_id long, embedding array<float>, label int",
    )
    emb = emb.unionByName(nulls)
    s = emb.filter(F.col("label") < 5).select(
        F.col("vec_id").alias("src_id"), F.col("embedding").alias("sv")
    )
    t = emb.filter(F.col("label") >= 5).select(
        F.col("vec_id").alias("tgt_id"), F.col("embedding").alias("tv")
    )
    hof = {
        (r.src_id, r.tgt_id): r.cos_micro
        for r in s.crossJoin(F.broadcast(t))
        .select(
            "src_id",
            "tgt_id",
            F.expr(
                f"CAST(round((({sim.dot_expr('sv', 'tv')})"
                f" / sqrt(({sim.dot_expr('sv', 'sv')})"
                f" * ({sim.dot_expr('tv', 'tv')})))"
                f" * 1000000) AS BIGINT)"
            ).alias("cos_micro"),
        )
        .collect()
    }
    ker = {
        (r.src_id, r.tgt_id): r.cos_micro
        for r in sim.bitext_pair_scores(s, t).collect()
    }
    assert set(hof) == set(ker)
    assert len(hof) > 10_000  # the full cross product actually formed
    n_null = sum(1 for v in ker.values() if v is None)
    assert n_null > 0  # the injected NULL rows flowed through
    for k, v in hof.items():
        assert ker[k] == v, f"cos_micro diverged for pair {k}"


def test_lsh_buckets_frame_matches_hof(spark):
    """Round-12 bit-equality lock for the Arrow sign-LSH bucket kernel
    (``operators/similarity.lsh_buckets_frame``) vs the HOF
    ``explode(lsh_bucket_structs_expr(...))`` it replaced — every
    (vec, tbl) bucket id identical, including NULL vectors' bucket-0
    rows (the SQL NULL projection folds to bit 0)."""
    import os

    from pyspark.sql import functions as F

    from kafka_streams_tcp_reconciliation_spark.operators import (
        similarity as sim,
    )

    sf = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")
    emb = load_table(spark, sf, "embeddings").unionByName(
        spark.createDataFrame(
            [(9_000_001, None, 1)],
            "vec_id long, embedding array<float>, label int",
        )
    )
    hof = {
        (r.vec_id, r.tbl): r.bucket
        for r in emb.select(
            "vec_id",
            F.explode_outer(
                sim.lsh_bucket_structs_expr("embedding")
            ).alias("bb"),
        )
        .filter(F.col("bb").isNotNull())
        .select("vec_id", "bb.tbl", "bb.bucket")
        .collect()
    }
    ker = {
        (r.vec_id, r.tbl): r.bucket
        for r in sim.lsh_buckets_frame(emb, "vec_id", "embedding").collect()
    }
    assert set(hof) == set(ker)
    assert len(hof) > 2 * 200  # organic corpus x tables actually present
    assert ker[(9_000_001, 0)] == 0  # NULL vector -> bucket 0
    for k, v in hof.items():
        assert ker[k] == v, f"bucket diverged for {k}"


def test_pair_cosine_frame_matches_hof(spark):
    """Round-12 equality lock for the Arrow pair-cosine kernel
    (``operators/similarity.pair_cosine_frame``) vs the HOF per-pair
    fold it replaced, in BOTH output modes (round-6 double and int64
    micro), on an all-pairs probe of the organic fixture plus injected
    NULL rows."""
    import os

    from pyspark.sql import functions as F

    from kafka_streams_tcp_reconciliation_spark.operators import (
        similarity as sim,
    )

    sf = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")
    emb = (
        load_table(spark, sf, "embeddings")
        .filter(F.col("vec_id") < 60)
        .unionByName(
            spark.createDataFrame(
                [(9_000_001, None, 1)],
                "vec_id long, embedding array<float>, label int",
            )
        )
        .select("vec_id", "embedding")
    )
    paired = (
        emb.alias("x")
        .crossJoin(emb.alias("y"))
        .filter(F.col("x.vec_id") < F.col("y.vec_id"))
        .select(
            F.col("x.vec_id").alias("vec_a"),
            F.col("y.vec_id").alias("vec_b"),
            F.col("x.embedding").alias("va"),
            F.col("y.embedding").alias("vb"),
        )
    )
    hof6 = {
        (r.vec_a, r.vec_b): r.cosine
        for r in paired.select(
            "vec_a",
            "vec_b",
            F.round(
                F.expr(sim.dot_expr("va", "vb"))
                / F.sqrt(
                    F.expr(sim.dot_expr("va", "va"))
                    * F.expr(sim.dot_expr("vb", "vb"))
                ),
                6,
            ).alias("cosine"),
        ).collect()
    }
    ker6 = {
        (r.vec_a, r.vec_b): r.cosine
        for r in sim.pair_cosine_frame(
            paired, "vec_a", "vec_b", "va", "vb", micro=False
        ).collect()
    }
    assert set(hof6) == set(ker6)
    assert sum(1 for v in ker6.values() if v is None) > 0
    for k, v in hof6.items():
        assert ker6[k] == v, f"cosine diverged for {k}: {ker6[k]} != {v}"

    hofm = {
        (r.vec_a, r.vec_b): r.cos_micro
        for r in paired.select(
            "vec_a",
            "vec_b",
            F.expr(
                f"CAST(round((({sim.dot_expr('va', 'vb')})"
                f" / sqrt(({sim.dot_expr('va', 'va')})"
                f" * ({sim.dot_expr('vb', 'vb')})))"
                f" * 1000000) AS BIGINT)"
            ).alias("cos_micro"),
        ).collect()
    }
    kerm = {
        (r.vec_a, r.vec_b): r.cos_micro
        for r in sim.pair_cosine_frame(
            paired, "vec_a", "vec_b", "va", "vb", micro=True
        ).collect()
    }
    assert set(hofm) == set(kerm)
    for k, v in hofm.items():
        assert kerm[k] == v, f"cos_micro diverged for {k}"


def test_bitext_fwd_sum_matches_window(spark):
    """Round-13 parity lock for the IN-KERNEL forward top-K sum
    (``bitext_pair_scores(..., fwd_k=K)``), which replaced
    bitext_margin_mining's per-src window pass (sum of the K highest
    cos_micro, NULLS-LAST desc, ties immaterial to a sum): the kernel
    value must equal the window twin on every source row — including
    all-NULL sources (NULL sum) and sources with fewer than K valid
    scores — and the cos_micro column must be unchanged."""
    import os

    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from kafka_streams_tcp_reconciliation_spark.operators import (
        similarity as sim,
    )

    sf = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")
    emb = load_table(spark, sf, "embeddings")
    nulls = spark.createDataFrame(
        [(9_000_001, None, 1), (9_000_002, None, 7)],
        "vec_id long, embedding array<float>, label int",
    )
    emb = emb.unionByName(nulls)
    s = emb.filter(F.col("label") < 5).select(
        F.col("vec_id").alias("src_id"), F.col("embedding").alias("sv")
    )
    t = emb.filter(F.col("label") >= 5).select(
        F.col("vec_id").alias("tgt_id"), F.col("embedding").alias("tv")
    )
    for k in (4, 100_000):  # the registered K and a K > n_targets clamp
        pairs = sim.bitext_pair_scores(s, t, fwd_k=k).cache()
        w_f = Window.partitionBy("src_id").orderBy(
            F.col("cos_micro").desc(), F.col("tgt_id").asc()
        )
        want = {
            r.src_id: r.sumk_fwd
            for r in pairs.withColumn("rn", F.row_number().over(w_f))
            .filter(F.col("rn") <= k)
            .groupBy("src_id")
            .agg(F.sum("cos_micro").cast("long").alias("sumk_fwd"))
            .collect()
        }
        got = {
            r.src_id: r.sumk_fwd
            for r in pairs.select("src_id", "sumk_fwd").distinct().collect()
        }
        assert got == want, f"fwd sum diverged at k={k}"
        assert None in set(got.values())  # all-NULL sources carry NULL
        pairs.unpersist()
    # cos_micro itself is unchanged by the fwd_k flag
    base = {
        (r.src_id, r.tgt_id): r.cos_micro
        for r in sim.bitext_pair_scores(s, t).collect()
    }
    flagged = {
        (r.src_id, r.tgt_id): r.cos_micro
        for r in sim.bitext_pair_scores(s, t, fwd_k=4).collect()
    }
    assert base == flagged
