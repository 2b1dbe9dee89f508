from __future__ import annotations

import os
import sys

import duckdb
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from kafka_streams_tcp_reconciliation_spark.session import get_spark  # noqa: E402
from kafka_streams_tcp_reconciliation_spark.sources.tables import TABLE_NAMES  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")


@pytest.fixture(scope="session")
def spark():
    s = get_spark(app_name="kafka-streams-tcp-reconciliation-tests", shuffle_partitions=8)
    yield s
    s.stop()


@pytest.fixture(scope="session")
def sf_dir() -> str:
    return SF_DIR


def make_duck_connection(sf_dir: str, spill_dir: str):
    """Fresh DuckDB connection with the driver's pre-registered views.

    8 GB cap + disk spill: the cap keeps one oracle from competing with the
    concurrently-running Spark JVM for host RAM under full-suite load (the
    round-5 full run saw one transient OutOfMemoryException from DuckDB
    while the host was busy); the spill dir lets DuckDB trade the rest to
    disk instead of failing.
    """
    con = duckdb.connect()
    con.execute("SET memory_limit = '8GB'")
    # 4 worker threads, not the default all-32: the oracles run on
    # sf0.001-0.01 data inside a long-lived process that already hosts a
    # 32-thread Spark JVM — DuckDB 1.0.0's full-width thread pool there
    # is pure native allocation churn (the round-6 full-suite segfaults
    # and the round-5 transient OOM both struck inside DuckDB's native
    # allocator under that pressure, never in isolation)
    con.execute("SET threads TO 4")
    con.execute(f"SET temp_directory = '{spill_dir}'")
    for name in TABLE_NAMES:
        path = os.path.join(sf_dir, f"{name}.parquet")
        con.execute(
            f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{path}')"
        )
    return con


@pytest.fixture(scope="function")
def duck(sf_dir, tmp_path_factory):
    """DuckDB connection with the same views the driver pre-registers.

    FUNCTION-scoped: a session-scoped connection accumulates buffer-pool
    memory across the ~200 oracles (by ~query 94 of an sf0.1 full run it
    had eaten everything up to its limit, killing the run with
    MemoryError). A fresh connection per test releases everything; view
    registration is microseconds.
    """
    con = make_duck_connection(sf_dir, str(tmp_path_factory.mktemp("duck_spill")))
    yield con
    con.close()
