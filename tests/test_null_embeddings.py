"""NULL-embedding differential sweep (round-7 ADVICE follow-up).

The generic null-injection sweep in test_empty_tables.py nullifies
`embeddings.label` but never the `embedding` vector itself — which is
exactly how a NULL vector reaching the SemDeDup pair kernel's np.stack
went unnoticed (ADVICE r06, governance.py cluster_top_pair). Real 100 TB
corpora have rows whose embedding failed to compute; a NULL vector must
degrade to NULL scores (both engines rank NULL last under DESC), never
crash a job.

This sweep re-runs EVERY query whose oracle touches the embeddings table
against a fixture with 10% NULL `embedding` vectors and requires full
value parity with the DuckDB oracle on the same data.

Zero-NORM vectors are deliberately not injected: DuckDB 1.x maps double
0/0 to NULL while Spark produces NaN (sorted greatest), so they diverge
at the ENGINE level — documented as a differential precondition in
operators/similarity.pairwise_cosine_matrix.
"""

from __future__ import annotations

import os

import numpy as np
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
from tests.test_empty_tables import ResilientDuck, _canon

load_all()

EMBEDDING_QUERIES = sorted(
    n for n, sql in ORACLES.items() if "embeddings" in sql
)


@pytest.fixture(scope="module")
def null_emb_sf_dir(tmp_path_factory) -> str:
    src = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")
    dst = tmp_path_factory.mktemp("sf_null_emb")
    rng = np.random.default_rng(13)
    for t in TABLE_NAMES:
        tb = pq.read_table(os.path.join(src, f"{t}.parquet"))
        tb = tb.replace_schema_metadata(None)
        if t == "embeddings":
            n = len(tb)
            mask = rng.random(n) < 0.1
            emb = tb.column("embedding").to_pylist()
            vals = [None if mask[i] else emb[i] for i in range(n)]
            tb = pa.table(
                {
                    name: (
                        pa.array(vals, type=tb.schema.field(name).type)
                        if name == "embedding"
                        else tb.column(name)
                    )
                    for name in tb.schema.names
                }
            )
        pq.write_table(tb, str(dst / f"{t}.parquet"))
    return str(dst)


@pytest.fixture(scope="function")
def null_emb_duck(null_emb_sf_dir, tmp_path_factory):
    d = ResilientDuck(null_emb_sf_dir, tmp_path_factory)
    yield d
    d.close()


@pytest.mark.parametrize("name", EMBEDDING_QUERIES)
def test_query_survives_null_embeddings(
    name, spark, null_emb_sf_dir, null_emb_duck
):
    sdf = QUERIES[name](spark, null_emb_sf_dir).toPandas()  # must not raise
    odf = null_emb_duck.execute(ORACLES[name]).df()
    assert len(sdf) == len(odf), f"rows {len(sdf)} vs {len(odf)}"
    if len(sdf):
        a, b = _canon(sdf), _canon(odf)
        assert list(a.columns) == list(b.columns)
        for c in a.columns:
            av, bv = a[c], b[c]
            if av.dtype.kind == "f" or bv.dtype.kind == "f":
                av = av.astype(float)
                bv = bv.astype(float)
                assert (av.isna() == bv.isna()).all(), c
                both = ~av.isna()
                assert ((av[both] - bv[both]).abs() < 1e-9).all(), c
            else:
                assert av.astype(str).equals(bv.astype(str)), c


def test_null_embedding_cluster_gets_null_top_cosine(
    spark, null_emb_sf_dir, null_emb_duck
):
    """The specific ADVICE r06 crash path: dedup_semantic_clusters must
    not np.stack a None, and a <2-valid cluster's top pair must surface
    a true SQL NULL cosine (not NaN) like the oracle's."""
    sdf = QUERIES["dedup_semantic_clusters"](spark, null_emb_sf_dir)
    pdf = sdf.toPandas()
    assert len(pdf) > 0
    # the fixture leaves every cluster ≥2 valid members, so just lock
    # the type contract: column is float64-compatible with no NaN that
    # the oracle renders as NULL
    odf = null_emb_duck.execute(ORACLES["dedup_semantic_clusters"]).df()
    assert (
        _canon(pdf)["top_cosine"].isna()
        == _canon(odf)["top_cosine"].isna()
    ).all()


def test_knn_graph_null_neighbors_are_sql_null_not_nan(
    spark, null_emb_sf_dir
):
    """ADVICE r07: knn_graph_within_cells emitted float NaN for
    NULL-embedding neighbors where the oracle yields SQL NULL — invisible
    to this module's isna()-based sweep (float conversion folds both),
    but a strict value-hash differential diverges ('nan' vs 'None' after
    the driver's stringify). Lock the fix at the SQL layer, where
    isnan() and IS NULL are distinguishable: every missing score must be
    a true NULL, and the 10% NULL fixture must actually produce some."""
    df = QUERIES["knn_graph_within_cells"](spark, null_emb_sf_dir)
    assert df.filter("isnan(score)").count() == 0
    assert df.filter("score IS NULL").count() > 0
