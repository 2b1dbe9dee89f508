"""SparkSession factory with scale-oriented defaults.

Used by tests and bench.py. The external driver supplies its own session to
``__spark_entry__.entry``/``queries()``; every query in this package must be
correct under *any* session config — the settings here are performance
defaults, not correctness requirements.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

DEFAULT_SHUFFLE_PARTITIONS = 32


def get_spark(
    app_name: str = "kafka-streams-tcp-reconciliation-spark",
    shuffle_partitions: int | None = None,
) -> SparkSession:
    """Build (or reuse) a local SparkSession tuned for the test harness.

    - AQE on (runtime partition coalescing + skew-join splitting) so plans
      self-correct at larger scale factors.
    - UTC session timezone: all test timestamps are wall-clock values; UTC
      keeps LTZ rendering aligned with the DuckDB oracle.
    - Arrow enabled for fast toPandas()/pandas_udf exchange.
    """
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    parts = shuffle_partitions or int(
        os.environ.get("SPARK_GRAFT_SHUFFLE_PARTITIONS", DEFAULT_SHUFFLE_PARTITIONS)
    )
    return (
        SparkSession.builder.appName(app_name)
        .master(os.environ.get("SPARK_MASTER", f"local[{cpus}]"))
        .config("spark.sql.shuffle.partitions", str(parts))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.python.worker.reuse", "true")
        .config("spark.sql.parquet.filterPushdown", "true")
        # The Janino class cache (static conf) defaults to 100 entries; this
        # suite compiles 240+ distinct plans per pass, so with the default a
        # warmup pass evicts every compiled class before the timed pass (or a
        # long-lived production session) re-reaches it, and each query re-pays
        # 0.5-3 s of whole-stage-codegen compile. Measured round 11: raising
        # the cap recovers the ~3x "session inflation" on the hash-heavy
        # family (SCALE.md). Sized for ~10 suites' worth of plans; each entry
        # is a compiled class, not data, so memory cost is a few hundred MB
        # at worst on the driver.
        .config("spark.sql.codegen.cache.maxEntries", "4096")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
