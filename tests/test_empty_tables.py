"""Degenerate-input sweep: every registered query against ZERO-ROW tables.

The 100 TB failure class this guards: a filter, stratum, partition, or
upstream stage legitimately produces no rows, and an operator that
assumed data (seedless k-means, an empty PQ codebook, an unguarded 0/0)
kills the whole job. Round 3 found and fixed three such crashes
(kmeans_embeddings, similarity_pq_adc, similarity_ivf_pq) plus NULL-vs-0
divergences in dq_audit_contracts / bitmap_audience_combination /
stats_regression_lineitem — this test keeps the property locked.

Where an oracle exists the result must also MATCH DuckDB on the same
empty views (row count + values; engine NULL representations are
normalized), except for the documented grand-total divergence below.
"""

from __future__ import annotations

import os

import duckdb
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from kafka_streams_tcp_reconciliation_spark.plans import (
    ORACLES,
    QUERIES,
    load_all,
)
from kafka_streams_tcp_reconciliation_spark.sources.tables import TABLE_NAMES

load_all()

# Spark emits NO rows for the grand-total grouping set over an empty
# input; DuckDB (per the SQL standard's global-aggregate reading) emits
# the single all-NULL/0 total row. An engine-level divergence on
# zero-row input only — both agree the moment one row exists (the
# sf0.001+ differentials prove it) — so these four compare row-count
# against the engine-specific expectation instead.
GRAND_TOTAL_DIVERGENT = {
    "rollup_orders",
    "cube_orders",
    "grouping_sets_orders",
    "time_rollup_events",
}


@pytest.fixture(scope="module")
def empty_sf_dir(tmp_path_factory) -> str:
    src = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")
    dst = tmp_path_factory.mktemp("sf_empty")
    for t in TABLE_NAMES:
        sch = pq.read_schema(os.path.join(src, f"{t}.parquet"))
        sch = pa.schema([sch.field(i) for i in range(len(sch.names))])
        pq.write_table(sch.empty_table(), str(dst / f"{t}.parquet"))
    return str(dst)


@pytest.fixture(scope="module")
def empty_duck(empty_sf_dir):
    con = duckdb.connect()
    for t in TABLE_NAMES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{empty_sf_dir}/{t}.parquet')"
        )
    yield con
    con.close()


def _canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    for c in df.columns:
        if df[c].dtype == object:
            # normalize engine NULL representations (None vs NaN)
            df[c] = df[c].map(lambda v: None if pd.isna(v) else str(v))
    return df.sort_values(
        list(df.columns), na_position="first"
    ).reset_index(drop=True)


@pytest.mark.parametrize("name", sorted(QUERIES))
def test_query_survives_empty_tables(name, spark, empty_sf_dir, empty_duck):
    sdf = QUERIES[name](spark, empty_sf_dir).toPandas()  # must not raise
    if name not in ORACLES:
        return
    odf = empty_duck.execute(ORACLES[name]).df()
    if name in GRAND_TOTAL_DIVERGENT:
        assert len(sdf) == 0 and len(odf) == 1
        return
    assert len(sdf) == len(odf), f"rows {len(sdf)} vs {len(odf)}"
    if len(sdf):
        a, b = _canon(sdf), _canon(odf)
        assert list(a.columns) == list(b.columns)
        for c in a.columns:
            av, bv = a[c], b[c]
            if av.dtype.kind == "f" or bv.dtype.kind == "f":
                assert (av.isna() == bv.isna()).all(), c
                both = ~av.isna()
                assert ((av[both] - bv[both].astype(float)).abs() < 1e-9).all(), c
            else:
                assert av.astype(str).equals(bv.astype(str)), c


@pytest.fixture(scope="module")
def one_row_sf_dir(tmp_path_factory) -> str:
    """Single-row tables: the var=0 / sd=0 / MAD=0 / single-hour class of
    degenerate groups (an ANSI-mode divide-by-zero in any z-score, OLS,
    or ratio expression fails the whole job). Round 3 found and guarded
    six such divisions."""
    src = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")
    dst = tmp_path_factory.mktemp("sf_one")
    for t in TABLE_NAMES:
        tb = pq.read_table(os.path.join(src, f"{t}.parquet"))
        tb = tb.replace_schema_metadata(None)
        pq.write_table(tb.slice(0, 1), str(dst / f"{t}.parquet"))
    return str(dst)


@pytest.fixture(scope="module")
def one_row_duck(one_row_sf_dir):
    con = duckdb.connect()
    for t in TABLE_NAMES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{one_row_sf_dir}/{t}.parquet')"
        )
    yield con
    con.close()


@pytest.mark.parametrize("name", sorted(QUERIES))
def test_query_survives_single_row_tables(name, spark, one_row_sf_dir, one_row_duck):
    sdf = QUERIES[name](spark, one_row_sf_dir).toPandas()  # must not raise
    if name not in ORACLES:
        return
    odf = one_row_duck.execute(ORACLES[name]).df()
    assert len(sdf) == len(odf), f"rows {len(sdf)} vs {len(odf)}"
    if len(sdf):
        a, b = _canon(sdf), _canon(odf)
        assert list(a.columns) == list(b.columns)
        for c in a.columns:
            av, bv = a[c], b[c]
            if av.dtype.kind == "f" or bv.dtype.kind == "f":
                assert (av.isna() == bv.isna()).all(), c
                both = ~av.isna()
                assert ((av[both] - bv[both].astype(float)).abs() < 1e-9).all(), c
            else:
                assert av.astype(str).equals(bv.astype(str)), c
