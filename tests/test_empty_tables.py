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


class ResilientDuck:
    """DuckDB connection with the fixture views that survives ONE
    transient OutOfMemoryException per execute by rebuilding itself on a
    fresh connection (same contract as the differential harness's
    run_oracle): under full-suite + concurrent-bench host pressure a
    single tiny allocation can fail inside the 8 GB cap, and that must
    not redden a 1600-test run. A repeatable OOM still fails."""

    def __init__(self, sf_dir: str, tmp_path_factory):
        self._sf_dir = sf_dir
        self._tpf = tmp_path_factory
        self._con = self._fresh()

    def _fresh(self):
        con = duckdb.connect()
        con.execute("SET memory_limit = '8GB'")
        # 4 threads, not all 32 — same rationale as conftest.duck: tiny
        # fixture data, shared process with a 32-thread JVM, and DuckDB
        # 1.0.0 native-allocator fragility under full-width thread churn
        con.execute("SET threads TO 4")
        con.execute(
            f"SET temp_directory = '{self._tpf.mktemp('duck_spill')}'"
        )
        for t in TABLE_NAMES:
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM "
                f"read_parquet('{self._sf_dir}/{t}.parquet')"
            )
        return con

    def execute(self, sql: str):
        try:
            return self._con.execute(sql)
        except duckdb.OutOfMemoryException:
            self._con.close()
            self._con = self._fresh()
            return self._con.execute(sql)

    def close(self) -> None:
        self._con.close()


@pytest.fixture(scope="module")
def empty_sf_dir(tmp_path_factory) -> str:
    src = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")
    dst = tmp_path_factory.mktemp("sf_empty")
    for t in TABLE_NAMES:
        sch = pq.read_schema(os.path.join(src, f"{t}.parquet"))
        sch = pa.schema([sch.field(i) for i in range(len(sch.names))])
        pq.write_table(sch.empty_table(), str(dst / f"{t}.parquet"))
    return str(dst)


@pytest.fixture(scope="function")
def empty_duck(empty_sf_dir, tmp_path_factory):
    d = ResilientDuck(empty_sf_dir, tmp_path_factory)
    yield d
    d.close()


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


@pytest.fixture(scope="function")
def one_row_duck(one_row_sf_dir, tmp_path_factory):
    d = ResilientDuck(one_row_sf_dir, tmp_path_factory)
    yield d
    d.close()


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


NULLABLE_COLUMNS = {
    "events": ["value", "props"],
    "documents": ["text", "lang", "source"],
    "orders": ["o_comment"],
    "lineitem": ["l_comment"],
    "customer": ["c_comment"],
    "embeddings": ["label"],
}


@pytest.fixture(scope="module")
def nulls_sf_dir(tmp_path_factory) -> str:
    """10% NULLs in every non-key column: real 100 TB data has them, the
    driver fixtures don't. Round 3 found three Python-kernel crashes and
    a dozen cross-engine NULL-semantics divergences (NULL-text docs
    pairing with everything in DuckDB's dedup CTEs, per-column
    last(ignorenulls) splicing different rows in the as-of carry, NULL
    sort-position differences) — all fixed with mirrored guards."""
    import numpy as np
    import pyarrow.compute as pc

    src = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")
    dst = tmp_path_factory.mktemp("sf_nulls")
    rng = np.random.default_rng(7)
    for t in TABLE_NAMES:
        tb = pq.read_table(os.path.join(src, f"{t}.parquet"))
        tb = tb.replace_schema_metadata(None)
        cols = {}
        for name in tb.schema.names:
            col = tb.column(name)
            if name in NULLABLE_COLUMNS.get(t, []):
                mask = pa.array(rng.random(len(tb)) < 0.1)
                arr = col.combine_chunks()
                cols[name] = pc.if_else(mask, pa.nulls(len(tb), type=arr.type), arr)
            else:
                cols[name] = col
        pq.write_table(
            pa.table({n: cols[n] for n in tb.schema.names}),
            str(dst / f"{t}.parquet"),
        )
    return str(dst)


@pytest.fixture(scope="function")
def nulls_duck(nulls_sf_dir, tmp_path_factory):
    d = ResilientDuck(nulls_sf_dir, tmp_path_factory)
    yield d
    d.close()


@pytest.mark.parametrize("name", sorted(QUERIES))
def test_query_survives_null_injection(name, spark, nulls_sf_dir, nulls_duck):
    sdf = QUERIES[name](spark, nulls_sf_dir).toPandas()  # must not raise
    if name not in ORACLES:
        return
    odf = nulls_duck.execute(ORACLES[name]).df()
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


UNICODE_SNIPPETS = [
    " café naïve über ",
    " 日本語テスト ",
    " \U0001F600\U0001F680 emoji ",
    " русский ",
    " a+b (c) [d] {e} .* |pipe| $5 ^caret\\ ",
    " tab\tnewline\nquote\"'end ",
]


@pytest.fixture(scope="module")
def unicode_sf_dir(tmp_path_factory) -> str:
    """Multibyte/metacharacter text injected into 30% of documents: the
    fixture corpus is pure ASCII, real corpora are not. Round 3 findings
    this locks: DuckDB's levenshtein counts bytes while Spark's counts
    codepoints (both sides now fold to a shared ASCII projection), and
    the multimodal byte-kernels diverged from their char-based oracles
    on non-ASCII payloads (kernels now decode and work in codepoints)."""
    import numpy as np

    src = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")
    dst = tmp_path_factory.mktemp("sf_unicode")
    rng = np.random.default_rng(11)
    for t in TABLE_NAMES:
        tb = pq.read_table(os.path.join(src, f"{t}.parquet"))
        tb = tb.replace_schema_metadata(None)
        if t == "documents":
            texts = tb.column("text").to_pylist()
            out = []
            for i, s in enumerate(texts):
                if rng.random() < 0.3:
                    sn = UNICODE_SNIPPETS[i % len(UNICODE_SNIPPETS)]
                    mid = len(s) // 2
                    s = s[:mid] + sn + s[mid:]
                out.append(s)
            tb = pa.table(
                {
                    n: (pa.array(out) if n == "text" else tb.column(n))
                    for n in tb.schema.names
                }
            )
        pq.write_table(tb, str(dst / f"{t}.parquet"))
    return str(dst)


@pytest.fixture(scope="function")
def unicode_duck(unicode_sf_dir, tmp_path_factory):
    d = ResilientDuck(unicode_sf_dir, tmp_path_factory)
    yield d
    d.close()


@pytest.mark.parametrize("name", sorted(QUERIES))
def test_query_survives_unicode_text(name, spark, unicode_sf_dir, unicode_duck):
    sdf = QUERIES[name](spark, unicode_sf_dir).toPandas()  # must not raise
    if name not in ORACLES:
        return
    odf = unicode_duck.execute(ORACLES[name]).df()
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


# Per-RECORD operators under duplicate delivery: each physical row gets an
# output row in Spark (union-and-carry, runlength fragments, per-purchase
# loss counts), but an ANSI oracle cannot partition by physical row — a
# row_number over the key collapses verbatim duplicates. The divergence is
# an oracle-expressibility limit, not an engine bug, and the production
# answer is composition: at-least-once sources run exact dedup first
# (dedup_exact_docs / dedup_first_event_per_user_type /
# dropDuplicatesWithinWatermark), after which the baseline differentials
# prove agreement. These five BASE registrations are crash-checked only on
# the dup fixture; their `*_deduped` compositions (plans/atleastonce.py)
# are NOT in this set, so the sweep below proves the composed contract
# bit-for-bit against the dedup-rebound oracle.
PER_RECORD_UNDER_DUPLICATES = {
    "asof_last_click_before_purchase",
    "pit_click_purchase_context",
    "event_type_runlengths",
    "conversion_lag_percentiles",
    "reconcile_loss_rate_hourly",
}


@pytest.fixture(scope="module")
def dups_sf_dir(tmp_path_factory) -> str:
    """10% of events re-appended verbatim: at-least-once delivery, the
    reference domain's default failure mode."""
    import numpy as np

    src = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")
    dst = tmp_path_factory.mktemp("sf_dups")
    rng = np.random.default_rng(13)
    for t in TABLE_NAMES:
        tb = pq.read_table(os.path.join(src, f"{t}.parquet"))
        tb = tb.replace_schema_metadata(None)
        if t == "events":
            n = len(tb)
            idx = rng.choice(n, size=n // 10, replace=False)
            tb = pa.concat_tables([tb, tb.take(pa.array(sorted(idx)))])
        pq.write_table(tb, str(dst / f"{t}.parquet"))
    return str(dst)


@pytest.fixture(scope="function")
def dups_duck(dups_sf_dir, tmp_path_factory):
    d = ResilientDuck(dups_sf_dir, tmp_path_factory)
    yield d
    d.close()


@pytest.mark.parametrize("name", sorted(QUERIES))
def test_query_survives_duplicate_delivery(name, spark, dups_sf_dir, dups_duck):
    sdf = QUERIES[name](spark, dups_sf_dir).toPandas()  # must not raise
    if name not in ORACLES or name in PER_RECORD_UNDER_DUPLICATES:
        return
    odf = dups_duck.execute(ORACLES[name]).df()
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


def test_approx_percentile_all_null_group(spark, tmp_path_factory):
    """A group whose value column is entirely NULL must be excluded by the
    mirrored count(value) > 0 contract on BOTH engines (Spark's percentile
    returns a NULL array → posexplode drops the group; DuckDB's
    quantile_cont emits NULL scalars — without the guard the row sets
    diverge). The 10%-null sweep never produces an all-NULL group, so this
    locks the case directly."""
    import numpy as np

    src = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")
    dst = tmp_path_factory.mktemp("sf_allnull")
    for t in TABLE_NAMES:
        tb = pq.read_table(os.path.join(src, f"{t}.parquet"))
        tb = tb.replace_schema_metadata(None)
        if t == "events":
            etype = tb.column("event_type").to_pylist()
            val = tb.column("value").to_pylist()
            val = [None if e == "view" else v for e, v in zip(etype, val)]
            assert any(e == "view" for e in etype)
            idx = tb.schema.get_field_index("value")
            tb = tb.set_column(
                idx, "value", pa.array(val, type=pa.float64())
            )
        pq.write_table(tb, str(dst / f"{t}.parquet"))
    sdf = QUERIES["approx_percentile_value"](spark, str(dst)).toPandas()
    assert "view" not in set(sdf["event_type"])
    con = duckdb.connect()
    try:
        for t in TABLE_NAMES:
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM "
                f"read_parquet('{dst}/{t}.parquet')"
            )
        odf = con.execute(ORACLES["approx_percentile_value"]).df()
    finally:
        con.close()
    assert len(sdf) == len(odf)
    a, b = _canon(sdf), _canon(odf)
    assert list(a.columns) == list(b.columns)
    assert (a["event_type"].values == b["event_type"].values).all()
    assert np.allclose(
        a["exact_v"].astype(float), b["exact_v"].astype(float), atol=1e-9
    )
    assert sdf["within_bound"].all()
