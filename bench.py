"""Benchmark harness — runs every registered query at $SPARK_GRAFT_SF_DIR.

Prints ONE JSON line:
    {"metric": "total_query_time", "value": N, "unit": "sec",
     "queries": {name: sec, ...}, "sf": 0.1}

Each query is materialized with a count() of the full result (forces the
complete plan without driver-side collect of payload data).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from kafka_streams_tcp_reconciliation_spark.plans import all_queries  # noqa: E402
from kafka_streams_tcp_reconciliation_spark.session import get_spark  # noqa: E402


def main() -> None:
    # The JVM child process inherits fd 1 and writes startup noise there
    # ("WARNING: Using incubator modules…"), which corrupted the driver's
    # JSON parse in round 1. Route fd 1 → stderr for the whole run and keep
    # a private dup of the real stdout; the final JSON line is written to
    # that dup, making it the ONLY stdout content. Also mirrored to
    # BENCH.json on disk as a parse-proof artifact.
    real_stdout = os.dup(1)
    sys.stdout.flush()
    os.dup2(2, 1)

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = float(os.path.basename(sf_dir.rstrip("/")).removeprefix("sf") or "0.1")
    spark = get_spark(app_name="kafka-streams-tcp-reconciliation-bench")
    spark.sparkContext.setLogLevel("ERROR")

    queries = all_queries()
    timings: dict[str, float] = {}

    # warm the JVM + parquet footer caches once with the cheapest query,
    # and spin up the Python worker pool so the first pandas-stage query
    # doesn't absorb the one-time interpreter startup cost
    try:
        queries["q1_pricing_summary"](spark, sf_dir).count()
        spark.range(0, 64, 1, 64).mapInPandas(
            lambda batches: batches, schema="id long"
        ).count()
    except Exception:
        pass

    total = 0.0
    for name, fn in sorted(queries.items()):
        t0 = time.perf_counter()
        try:
            df = fn(spark, sf_dir)
            n = df.count()
            dt = time.perf_counter() - t0
            timings[name] = round(dt, 3)
            total += dt
            print(f"# {name}: {dt:.3f}s ({n} rows)", file=sys.stderr)
        except Exception as e:  # keep benching even if one query breaks
            timings[name] = -1.0
            print(f"# {name}: FAILED {e}", file=sys.stderr)
        finally:
            # per-query caches never help a later query (each builds fresh
            # lineage); dropping them keeps timings independent and avoids
            # slow GC buildup over the run
            spark.catalog.clearCache()

    full = json.dumps(
        {
            "metric": "total_query_time",
            "value": round(total, 3),
            "unit": "sec",
            "queries": timings,
            "sf": sf,
        }
    )
    with open(os.path.join(os.path.dirname(os.path.abspath(__file__)), "BENCH.json"), "w") as f:
        f.write(full + "\n")
    # The driver keeps only a ~2 KB tail of stdout; at 212 queries the full
    # per-query map is ~7 KB and was truncated to `parsed: null` two rounds
    # running. The stdout line therefore carries the headline subset (the
    # flagship / most expensive queries) plus a pointer to the on-disk
    # BENCH.json holding the complete map.
    headline = [
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
    compact = json.dumps(
        {
            "metric": "total_query_time",
            "value": round(total, 3),
            "unit": "sec",
            "queries": {k: timings[k] for k in headline if k in timings},
            "n_queries": len(timings),
            "n_failed": sum(1 for v in timings.values() if v < 0),
            "queries_file": "BENCH.json",
            "sf": sf,
        }
    )
    os.write(real_stdout, (compact + "\n").encode())
    spark.stop()


if __name__ == "__main__":
    main()
