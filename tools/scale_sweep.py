"""Time-vs-SF sweep over the quadratic-risk queries (round-7 task 1).

Runs each target query at three scale factors from the SAME seeded
generator (tools/gen_scale_data.py, seed 101) in ONE Spark session,
smallest SF first, so whole-stage-codegen compile is paid once at the
tiny SF and the larger-SF timings are ~pure execution — exactly the
quantity whose growth rate the 100 TB claim is about. Each (query, sf)
is timed as a full materialization (collect-count via toPandas-free
count()).

Output: one JSON line {"sf_dirs": ..., "queries": {name: {sf: sec}}}.

Usage: python tools/scale_sweep.py [query ...]   (default: risk set)
"""

from __future__ import annotations

import json
import sys
import time

sys.path.insert(0, "/root/repo")

RISK_QUERIES = [
    "knn_graph_within_cells",
    "dedup_semantic_clusters",
    "dedup_minhash_lsh",
    "similarity_ivf_pq",
    "triangle_count_copurchase",
    "two_hop_reach_counts",
    "mmr_diversified_topk",
]

SF_DIRS = {
    "0.01": "/root/repo/testdata_sf1/sf0.01",
    "0.1": "/root/repo/testdata_sf1/sf0.1",
    "1.0": "/root/repo/testdata_sf1/sf1.0",
}

# override via e.g. SPARK_GRAFT_SWEEP_DIRS="1.0=/x/sf1.0,10.0=/x/sf10.0"
import os  # noqa: E402

if os.environ.get("SPARK_GRAFT_SWEEP_DIRS"):
    SF_DIRS = dict(
        kv.split("=", 1)
        for kv in os.environ["SPARK_GRAFT_SWEEP_DIRS"].split(",")
    )


def main() -> None:
    names = sys.argv[1:] or RISK_QUERIES
    from kafka_streams_tcp_reconciliation_spark.plans import QUERIES, load_all
    from kafka_streams_tcp_reconciliation_spark.session import get_spark

    load_all()
    spark = get_spark(app_name="scale-sweep", shuffle_partitions=32)
    spark.sparkContext.setLogLevel("ERROR")
    # pre-warm the Python worker pool (same as bench.py) so the first
    # pandas-kernel query doesn't absorb worker startup into its timing
    spark.range(0, 1000, 1, 32).toPandas()

    out: dict[str, dict[str, float]] = {}
    rows: dict[str, dict[str, int]] = {}
    for sf, sf_dir in SF_DIRS.items():  # smallest first: compile amortizes
        for name in names:
            t0 = time.monotonic()
            n = QUERIES[name](spark, sf_dir).count()
            dt = time.monotonic() - t0
            out.setdefault(name, {})[sf] = round(dt, 3)
            rows.setdefault(name, {})[sf] = n
            print(f"# {name} @ sf{sf}: {dt:.2f}s ({n} rows)", file=sys.stderr)
    print(json.dumps({"sf_dirs": SF_DIRS, "queries": out, "rows": rows}))
    spark.stop()


if __name__ == "__main__":
    main()
