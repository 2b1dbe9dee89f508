"""Scale-machinery tests: bucketed joins must be exchange-free; salted
aggregation must match plain aggregation; property-based join identities."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from kafka_streams_tcp_reconciliation_spark.operators.skew import salted_agg
from kafka_streams_tcp_reconciliation_spark.sources.bucketing import (
    read_bucketed,
    write_bucketed,
)
from kafka_streams_tcp_reconciliation_spark.sources.tables import load_table


def _physical_plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_bucketed_join_is_exchange_free(spark, sf_dir):
    """Two tables bucketed by the join key into equal bucket counts must
    SortMergeJoin with no Exchange on either side."""
    orders = load_table(spark, sf_dir, "orders")
    lineitem = load_table(spark, sf_dir, "lineitem")
    write_bucketed(orders, "b_orders", ["o_orderkey"], 8, ["o_orderkey"])
    write_bucketed(lineitem, "b_lineitem", ["l_orderkey"], 8, ["l_orderkey"])
    try:
        joined = read_bucketed(spark, "b_orders").join(
            read_bucketed(spark, "b_lineitem"),
            F.col("o_orderkey") == F.col("l_orderkey"),
        )
        # disable broadcast so the join strategy is the bucketed SMJ/SHJ
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        try:
            plan = _physical_plan(
                joined.select("o_orderkey", "l_extendedprice")
            )
        finally:
            spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
        assert "Exchange" not in plan, f"bucketed join still shuffles:\n{plan}"
        n = joined.count()
        assert n == lineitem.count()  # every lineitem has its order
    finally:
        spark.sql("DROP TABLE IF EXISTS b_orders")
        spark.sql("DROP TABLE IF EXISTS b_lineitem")


def test_salted_agg_matches_plain(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events")
    plain = {
        (r.user_id,): (r.n, round(r.total, 6), r.mx)
        for r in ev.groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("value").alias("total"),
            F.max("value").alias("mx"),
        )
        .collect()
    }
    salted = {
        (r.user_id,): (r.n, round(r.total, 6), r.mx)
        for r in salted_agg(
            ev,
            ["user_id"],
            {
                "n": (F.count(F.lit(1)), F.sum("n")),
                "total": (F.sum("value"), F.sum("total")),
                "mx": (F.max("value"), F.max("mx")),
            },
            n_salts=8,
        ).collect()
    }
    assert salted == plain


def test_join_containment_identities(spark, sf_dir):
    """inner ⊆ left ⊆ full row-count identities on the orders/customer
    key, plus left-count == inner + anti (SURVEY.md §5.3)."""
    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer").sample(0.5, seed=7)
    on = orders["o_custkey"] == customer["c_custkey"]
    inner = orders.join(customer, on, "inner").count()
    left = orders.join(customer, on, "left").count()
    full = orders.join(customer, on, "full").count()
    anti = orders.join(customer, on, "left_anti").count()
    assert inner <= left <= full
    assert left == inner + anti  # orders.o_custkey is unique-per-row match


def test_salted_agg_on_skewed_data(spark):
    """Power-law stress: one key owns half the rows; salted phase 1 must
    spread it (>1 distinct salt on the hot key) and still match plain."""
    from pyspark.sql import functions as F

    n = 20_000
    df = spark.range(n).select(
        F.when(F.col("id") % 2 == 0, F.lit(7))
        .otherwise(F.col("id") % 50)
        .alias("k"),
        (F.col("id") % 97).cast("double").alias("v"),
    )
    got = {
        r.k: (r.n, round(r.total, 6))
        for r in salted_agg(
            df,
            ["k"],
            {"n": (F.count(F.lit(1)), F.sum("n")), "total": (F.sum("v"), F.sum("total"))},
            n_salts=16,
        ).collect()
    }
    want = {
        r.k: (r.n, round(r.total, 6))
        for r in df.groupBy("k")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("v").alias("total"))
        .collect()
    }
    assert got == want
    # the hot key really fans out in phase 1
    hot_salts = (
        df.filter(F.col("k") == 7)
        .select((F.abs(F.hash(F.struct("k", "v"))) % 16).alias("s"))
        .distinct()
        .count()
    )
    assert hot_salts > 1


def test_zorder_layout_prunes_on_secondary_column(spark, sf_dir, tmp_path):
    """Files laid out in Morton order over (user_id, value-bucket) must
    let a selective filter on the SECOND dimension skip files that a
    plain user_id-sorted layout cannot (its value ranges span every
    file). This is the min/max pruning the parquet reader applies at
    scale, measured directly on the file footprints."""
    from kafka_streams_tcp_reconciliation_spark.sources.bucketing import write_zordered

    ev = (
        load_table(spark, sf_dir, "events")
        .select("user_id", (F.col("value").cast("int")).alias("v_int"))
    )
    linear, zordered = str(tmp_path / "linear"), str(tmp_path / "zorder")
    (
        ev.repartitionByRange(8, "user_id")
        .sortWithinPartitions("user_id")
        .write.parquet(linear)
    )
    write_zordered(ev, zordered, ["user_id", "v_int"], num_files=8, bits=10)

    def overlapping_files(path: str, lo: int, hi: int) -> tuple[int, int]:
        import glob

        files = glob.glob(f"{path}/part-*.parquet")
        hit = 0
        for f in files:
            r = (
                spark.read.parquet(f)
                .agg(F.min("v_int").alias("lo"), F.max("v_int").alias("hi"))
                .first()
            )
            if r.lo <= hi and r.hi >= lo:
                hit += 1
        return hit, len(files)

    # a band in the dense region of the (skewed) value distribution:
    # every linear file spans it, few z-ordered files do
    hit_lin, n_lin = overlapping_files(linear, 150, 200)
    hit_z, n_z = overlapping_files(zordered, 150, 200)
    assert n_lin == n_z == 8
    assert hit_lin >= 6, "linear layout unexpectedly clustered v_int"
    assert hit_z < hit_lin, (hit_z, hit_lin)


def test_salted_replicate_join_matches_plain(spark, sf_dir):
    """Big-big skew-join remedy: salted-replicate join is row-identical to
    the plain join on a key where one value owns half the rows."""
    from pyspark.sql import functions as F

    from kafka_streams_tcp_reconciliation_spark.operators.skew import (
        salted_replicate_join,
    )

    # synthesize skew: fold 60% of orders onto one customer key
    orders = load_table(spark, sf_dir, "orders").withColumn(
        "o_custkey",
        F.when(F.col("o_orderkey") % 5 < 3, F.lit(7)).otherwise(
            F.col("o_custkey")
        ),
    )
    customer = load_table(spark, sf_dir, "customer").withColumnRenamed(
        "c_custkey", "o_custkey"
    )
    plain = (
        orders.join(customer, "o_custkey")
        .groupBy("o_custkey")
        .count()
        .collect()
    )
    salted = (
        salted_replicate_join(orders, customer, ["o_custkey"], n_salts=8)
        .groupBy("o_custkey")
        .count()
        .collect()
    )
    assert sorted((r.o_custkey, r["count"]) for r in plain) == sorted(
        (r.o_custkey, r["count"]) for r in salted
    )


# ---------------------------------------------------------------------------
# import-time scale-knob parity (subprocess: the knobs are import-time by
# design — plan and oracle must read the SAME module constant)
# ---------------------------------------------------------------------------

_PARITY_CODE = """
import json, sys
from kafka_streams_tcp_reconciliation_spark.session import get_spark
from kafka_streams_tcp_reconciliation_spark.plans import QUERIES, ORACLES, load_all
load_all()
import duckdb
spark = get_spark(app_name="knob-parity", shuffle_partitions=8)
spark.sparkContext.setLogLevel("ERROR")
sf_dir, qname = sys.argv[1], sys.argv[2]
tables = sys.argv[3].split(",")
sdf = QUERIES[qname](spark, sf_dir).toPandas()
con = duckdb.connect()
con.execute("SET threads TO 4")
for t in tables:
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
odf = con.execute(ORACLES[qname]).df()
s = sdf[sorted(sdf.columns)].sort_values(sorted(sdf.columns)).reset_index(drop=True)
o = odf[sorted(odf.columns)].sort_values(sorted(odf.columns)).reset_index(drop=True)
ok = len(s) == len(o) and all(
    (abs(s[c].astype(float) - o[c].astype(float)) < 1e-9).all()
    if s[c].dtype.kind in "fi" else (s[c].astype(str) == o[c].astype(str)).all()
    for c in s.columns
)
print(json.dumps({"rows": len(s), "match": bool(ok)}))
spark.stop()
"""


def _knob_parity(sf_dir: str, query: str, tables: str, **env_overrides) -> dict:
    """Run one registered query + its oracle in a fresh interpreter with
    the given env knobs set; return {"rows": n, "match": bool}."""
    import json
    import os
    import subprocess
    import sys

    env = dict(os.environ, **env_overrides)
    r = subprocess.run(
        [sys.executable, "-c", _PARITY_CODE, sf_dir, query, tables],
        env=env,
        capture_output=True,
        text=True,
        timeout=600,
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    )
    assert r.returncode == 0, r.stderr[-3000:]
    return json.loads(r.stdout.strip().splitlines()[-1])


def test_semdedup_k_knob_keeps_oracle_parity(sf_dir):
    """SCALE.md's K∝n demonstration knob (SPARK_GRAFT_SEMDEDUP_K) must
    keep the Spark plan and the DuckDB oracle on the SAME K: both read
    the module constant at import, so a non-default K still hash-matches."""
    res = _knob_parity(
        sf_dir, "dedup_semantic_clusters", "embeddings", SPARK_GRAFT_SEMDEDUP_K="5"
    )
    assert res["rows"] == 5  # K=5 clusters, not the default 8
    assert res["match"], res


def test_lsh_planes_knob_keeps_oracle_parity(sf_dir):
    """SPARK_GRAFT_LSH_PLANES (the sign-LSH bucket-count scale knob, see
    operators/similarity.py) must keep the Spark plan and the DuckDB
    oracle on the SAME plane count."""
    res = _knob_parity(
        sf_dir, "dedup_embedding_neardup", "embeddings", SPARK_GRAFT_LSH_PLANES="10"
    )
    assert res["match"], res


def test_simhash_chunks_knob_keeps_oracle_parity(sf_dir):
    """SPARK_GRAFT_SIMHASH_CHUNKS (the SimHash blocking scale knob, see
    operators/dedup.py) must keep plan and oracle on the SAME chunking.
    chunks=3 widens blocks to 20 bits, a genuinely different candidate
    set than the default 4x15."""
    res = _knob_parity(
        sf_dir, "dedup_simhash", "documents", SPARK_GRAFT_SIMHASH_CHUNKS="3"
    )
    assert res["match"], res


@pytest.mark.parametrize(
    "query", ["dedup_ngram_jaccard", "dedup_shingle_containment", "curate_corpus"]
)
def test_stopshingle_knob_keeps_oracle_parity(sf_dir, query):
    """SPARK_GRAFT_STOPSHINGLE_DF (the inverted-index hot-key cap, shared
    helpers in operators/dedup.py) must keep plan and oracle on the SAME
    cutoff AND the same redefined sizes (Jaccard/containment over
    informative shingles — for containment, n_smaller must be post-cap)
    in EVERY consumer: the Jaccard query, the containment query, and the
    curate_corpus flagship. df=2 binds hard at sf0.001 (mean shingle
    df < 1), exercising the capped path end-to-end."""
    res = _knob_parity(sf_dir, query, "documents", SPARK_GRAFT_STOPSHINGLE_DF="2")
    assert res["match"], res


def test_knn_cell_rows_knob_keeps_oracle_parity(sf_dir):
    """SPARK_GRAFT_KNN_CELL_ROWS (the kNN graph's per-cell row target,
    round 10's data-proportional refinement) must keep the Spark plan and
    the DuckDB oracle on the SAME target. 32 forces n_planes >= 1 on the
    500-vector fixture (10 labels × 32 × 2^0 < 500), so the non-default
    run exercises a genuinely refined cell layout."""
    res = _knob_parity(
        sf_dir,
        "knn_graph_within_cells",
        "embeddings",
        SPARK_GRAFT_KNN_CELL_ROWS="32",
    )
    assert res["match"], res


def test_mh_bands_knob_keeps_oracle_parity(sf_dir):
    """SPARK_GRAFT_MH_BANDS (MinHash banding; rows = 32/bands) must keep
    plan and oracle on the SAME banding. bands=16 is the pre-round-7
    default (16x2, ~99.99% J>=0.8 recall, quadratic candidates on
    word-soup corpora) — the documented opt-out of the 8x4 default."""
    res = _knob_parity(
        sf_dir, "dedup_minhash_lsh", "documents", SPARK_GRAFT_MH_BANDS="16"
    )
    assert res["match"], res


@pytest.mark.parametrize(
    "var,val",
    [
        ("SPARK_GRAFT_SIMHASH_CHUNKS", "0"),
        ("SPARK_GRAFT_SIMHASH_CHUNKS", "7"),  # not a divisor of 60
        ("SPARK_GRAFT_SIMHASH_CHUNKS", "61"),
        ("SPARK_GRAFT_LSH_PLANES", "0"),
        ("SPARK_GRAFT_LSH_PLANES", "63"),  # BIGINT sign-bit overflow
        ("SPARK_GRAFT_STOPSHINGLE_DF", "-1"),
        ("SPARK_GRAFT_MH_BANDS", "0"),
        ("SPARK_GRAFT_MH_BANDS", "3"),  # not a divisor of 32
        ("SPARK_GRAFT_KNN_CELL_ROWS", "0"),
    ],
)
def test_invalid_knob_values_fail_loudly_at_import(var, val):
    """Out-of-range scale knobs must raise a clear ValueError at import —
    not crash with ZeroDivisionError, silently degenerate the blocking
    join to a cross product (chunks > 60 → every chunk value 0), or
    overflow the BIGINT sign bit (planes > 62)."""
    import os
    import subprocess
    import sys

    r = subprocess.run(
        [
            sys.executable,
            "-c",
            "from kafka_streams_tcp_reconciliation_spark.plans import load_all; load_all()",
        ],
        env=dict(os.environ, **{var: val}),
        capture_output=True,
        text=True,
        timeout=120,
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    )
    assert r.returncode != 0
    assert "ValueError" in r.stderr and var in r.stderr, r.stderr[-2000:]


def test_scale_out_bounds_parallelism_by_row_groups(spark, tmp_path):
    """Round-8 straggler finding: byte-range splits over-count a parquet
    scan's usable parallelism — a large file with ONE row group reports
    many splits but only one task carries data. scale_out must bound its
    split probe by the footer row-group count and widen such scans (the
    measured failure: 176 MB / 2 row groups → 32 reported splits, 2 busy
    cores, 23+ min of shingling vs ~1 min wide)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from kafka_streams_tcp_reconciliation_spark.sources.tables import scale_out

    n = 400_000
    p = str(tmp_path / "one.parquet")
    pq.write_table(pa.table({"x": list(range(n))}), p, row_group_size=n)
    spark.conf.set("spark.sql.files.maxPartitionBytes", "16384")
    try:
        df = spark.read.parquet(p)
        target = spark.sparkContext.defaultParallelism
        # precondition: byte splits alone claim >= target parallelism
        assert df.rdd.getNumPartitions() >= target
        out = scale_out(df)
        plan = out._jdf.queryExecution().executedPlan().toString()
        assert "RoundRobinPartitioning" in plan, (
            f"scale_out did not widen a 1-row-group scan:\n{plan}"
        )
        # a well-laid-out file (many row groups) must stay un-shuffled
        p2 = str(tmp_path / "many.parquet")
        pq.write_table(pa.table({"x": list(range(n))}), p2, row_group_size=2_000)
        out2 = scale_out(spark.read.parquet(p2))
        plan2 = out2._jdf.queryExecution().executedPlan().toString()
        assert "RoundRobinPartitioning" not in plan2, plan2
    finally:
        spark.conf.unset("spark.sql.files.maxPartitionBytes")


def test_lsh_tables_knob_keeps_oracle_parity(sf_dir):
    """SPARK_GRAFT_LSH_TABLES (the sign-LSH OR-ed table count — the
    RECALL dial, env-knobbed round 12) must keep the Spark plan and the
    DuckDB oracle on the SAME table count. 4 tables genuinely widens the
    candidate set vs the default 2 (more bucket collisions survive), so
    a drifted constant would hash-mismatch immediately."""
    res = _knob_parity(
        sf_dir,
        "bitext_margin_mining_lsh",
        "embeddings",
        SPARK_GRAFT_LSH_TABLES="4",
    )
    assert res["match"], res
