"""Probe: does Janino class-cache eviction explain the hash-heavy
"session inflation" (isolated 1.2 s vs in-suite 3.8 s on
dedup_minhash_lsh — round-10 VERDICT "What's wrong" #3)?

Protocol: in ONE JVM, compile every registered plan once at sf0.001
(exactly what bench.py's warmup and any long-lived production session
does), then time a probe set at sf0.1. With the default
spark.sql.codegen.cache.maxEntries=100 and 240+ distinct plans, every
probe query's compiled classes were evicted by the time it re-runs, so
it re-pays whole-stage-codegen compile; with the cache sized above the
plan count, it should not.

Run twice:
    SPARK_GRAFT_CODEGEN_CACHE=100  python tools/codegen_cache_probe.py
    SPARK_GRAFT_CODEGEN_CACHE=4096 python tools/codegen_cache_probe.py
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession

from kafka_streams_tcp_reconciliation_spark.plans import all_queries

PROBES = [
    "dedup_minhash_lsh",
    "text_fingerprint",
    "text_lang_id",
    "text_quality_score",
    "bigram_logprob_score",
    "q1_pricing_summary",
]


def main() -> None:
    cache = os.environ.get("SPARK_GRAFT_CODEGEN_CACHE", "100")
    spark = (
        SparkSession.builder.appName(f"codegen-probe-{cache}")
        .master("local[32]")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.python.worker.reuse", "true")
        .config("spark.driver.memory", "8g")
        .config("spark.ui.enabled", "false")
        .config("spark.sql.codegen.cache.maxEntries", cache)
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    queries = all_queries()
    warm, timed = "/root/testdata/sf0.001", "/root/testdata/sf0.1"

    # pre-warm the probes themselves at the timed SF so parquet footers /
    # Python workers are hot in BOTH configurations
    for p in PROBES:
        queries[p](spark, timed).count()
        spark.catalog.clearCache()

    t0 = time.perf_counter()
    for name, fn in sorted(queries.items()):
        try:
            fn(spark, warm).count()
        except Exception:
            pass
        finally:
            spark.catalog.clearCache()
    print(f"cache={cache}: full-set compile pass {time.perf_counter() - t0:.1f}s", flush=True)

    for p in PROBES:
        t0 = time.perf_counter()
        queries[p](spark, timed).count()
        dt = time.perf_counter() - t0
        spark.catalog.clearCache()
        print(f"cache={cache}: {p} = {dt:.3f}s", flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
