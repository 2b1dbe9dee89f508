"""Differential harness: every registered query vs its DuckDB oracle.

Mirrors the driver's correctness gate (SURVEY.md §5.2): row count, column
names, and order-insensitive values. Values are compared exactly first
(what the driver's value-hash effectively requires); on float mismatch we
fail with a tolerance diagnosis so near-misses are distinguishable from
real bugs.
"""

from __future__ import annotations

import math

import duckdb
import pandas as pd
import pytest

from kafka_streams_tcp_reconciliation_spark.plans import all_oracles, all_queries
from conftest import make_duck_connection

QUERIES = all_queries()
ORACLES = all_oracles()


def canonicalize(df: pd.DataFrame) -> pd.DataFrame:
    """Sort columns by name and rows by all values — the driver's
    order-insensitive view of a result set."""
    df = df.reindex(sorted(df.columns), axis=1)
    # normalize datetimes to ns for cross-engine dtype stability
    import datetime

    for c in df.columns:
        if pd.api.types.is_datetime64_any_dtype(df[c]):
            df[c] = df[c].astype("datetime64[us]")
        elif df[c].dtype == object:
            first = df[c].dropna()
            if len(first) and isinstance(first.iloc[0], (list, tuple)):
                df[c] = df[c].apply(lambda v: tuple(v) if v is not None else None)
            elif len(first) and isinstance(first.iloc[0], datetime.date):
                df[c] = pd.to_datetime(df[c]).astype("datetime64[us]")
    return df.sort_values(by=list(df.columns), na_position="first").reset_index(
        drop=True
    )


def values_equal(a, b) -> bool:
    if a is None and b is None:
        return True
    if isinstance(a, float) and isinstance(b, float):
        if math.isnan(a) and math.isnan(b):
            return True
        return a == b
    return a == b


def run_oracle(duck, sql: str, sf_dir: str, tmp_path_factory) -> pd.DataFrame:
    """Execute an oracle, retrying ONCE on a fresh connection if DuckDB OOMs.

    A single transient allocation failure (busy host + concurrent Spark JVM)
    must not redden a 1500+-test run; a *repeatable* OOM still fails.
    """
    try:
        return duck.execute(sql).fetchdf()
    except duckdb.OutOfMemoryException:
        retry = make_duck_connection(
            sf_dir, str(tmp_path_factory.mktemp("duck_spill_retry"))
        )
        try:
            return retry.execute(sql).fetchdf()
        finally:
            retry.close()


@pytest.mark.parametrize("name", sorted(ORACLES))
def test_query_matches_oracle(name, spark, duck, sf_dir, tmp_path_factory):
    try:
        spark_df = QUERIES[name](spark, sf_dir).toPandas()
    finally:
        # several queries cache() intermediates as scan barriers; drop them
        # so cached blocks don't accumulate across a 196-query session
        # (at sf0.1 the buildup contributed to machine-wide memory
        # exhaustion alongside DuckDB's default 80%-of-RAM limit)
        spark.catalog.clearCache()
    duck_df = run_oracle(duck, ORACLES[name], sf_dir, tmp_path_factory)

    assert len(spark_df) == len(duck_df), (
        f"{name}: row count {len(spark_df)} (spark) != {len(duck_df)} (duckdb)"
    )
    assert sorted(spark_df.columns) == sorted(duck_df.columns), (
        f"{name}: columns {sorted(spark_df.columns)} != {sorted(duck_df.columns)}"
    )
    # dtype parity — catches BIGINT-vs-INT style schema mismatches that the
    # driver's schema compare would flag even when values agree
    dtype_diffs = {
        c: (str(spark_df[c].dtype), str(duck_df[c].dtype))
        for c in spark_df.columns
        if str(spark_df[c].dtype) != str(duck_df[c].dtype)
    }
    assert not dtype_diffs, f"{name}: dtype mismatches {dtype_diffs}"

    s = canonicalize(spark_df)
    d = canonicalize(duck_df)
    mismatches = []
    for col in s.columns:
        sv, dv = s[col].tolist(), d[col].tolist()
        for i, (a, b) in enumerate(zip(sv, dv)):
            if not values_equal(a, b):
                mismatches.append((col, i, a, b))
                if len(mismatches) >= 5:
                    break
        if len(mismatches) >= 5:
            break
    assert not mismatches, f"{name}: value mismatches (col, row, spark, duck): {mismatches}"


@pytest.mark.parametrize("name", sorted(set(QUERIES) - set(ORACLES)))
def test_query_without_oracle_runs(name, spark, sf_dir):
    """Rows-only check for non-SQL-expressible ops (driver's weak tier)."""
    df = QUERIES[name](spark, sf_dir)
    assert df.count() >= 0
    assert len(df.schema) > 0
