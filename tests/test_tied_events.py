"""Tied-timestamp differential sweep (round 9).

Event streams at 100 TB have massive timestamp collisions: second-granular
producers, batched ingest stamping one arrival time on thousands of rows,
users acting in several sessions at once. The synthetic fixtures'
microsecond timestamps are nearly collision-free, so any query whose
window ORDER BY / as-of pick / top-k silently relies on timestamp (or
value) uniqueness passes the standard differential while being
NONDETERMINISTIC in production — Spark and DuckDB are each free to pick a
different row among ties, and so are two runs of the same engine after a
shuffle-order change.

The fixture forces heavy collisions — ~25% of events inherit the
timestamp of another event of the SAME user, and ~15% inherit a value
seen elsewhere in their event_type — then demands full value parity with
the DuckDB oracle for every events-consuming query. A query that needs a
deterministic tiebreaker and lacks one fails here first.
"""

from __future__ import annotations

import os

import numpy as np
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

EVENT_QUERIES = sorted(n for n, sql in ORACLES.items() if "events" in sql)


@pytest.fixture(scope="module")
def tied_sf_dir(tmp_path_factory) -> str:
    src = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")
    dst = tmp_path_factory.mktemp("sf_tied_events")
    rng = np.random.default_rng(23)
    for t in TABLE_NAMES:
        tb = pq.read_table(os.path.join(src, f"{t}.parquet"))
        tb = tb.replace_schema_metadata(None)
        if t == "events":
            df = tb.to_pandas()
            n = len(df)
            # ~25% of rows copy the ts of a random other event of the SAME
            # user -> duplicate (user_id, ts) keys, including within-type
            by_user = df.groupby("user_id").indices
            take = rng.random(n) < 0.25
            ts = df["ts"].to_numpy().copy()
            for uid, idx in by_user.items():
                if len(idx) < 2:
                    continue
                sel = idx[take[idx]]
                src_idx = rng.choice(idx, size=len(sel))
                ts[sel] = ts[src_idx]
            df["ts"] = ts
            # ~15% of rows copy a value from elsewhere in their event_type
            by_type = df.groupby("event_type").indices
            vtake = rng.random(n) < 0.15
            vals = df["value"].to_numpy().copy()
            for et, idx in by_type.items():
                if len(idx) < 2:
                    continue
                sel = idx[vtake[idx]]
                vals[sel] = vals[rng.choice(idx, size=len(sel))]
            df["value"] = vals
            tb = pa.Table.from_pandas(df, preserve_index=False).cast(
                tb.schema
            )
        pq.write_table(tb, str(dst / f"{t}.parquet"))
    return str(dst)


@pytest.fixture(scope="function")
def tied_duck(tied_sf_dir, tmp_path_factory):
    d = ResilientDuck(tied_sf_dir, tmp_path_factory)
    yield d
    d.close()


@pytest.mark.parametrize("name", EVENT_QUERIES)
def test_query_deterministic_under_ties(name, spark, tied_sf_dir, tied_duck):
    sdf = QUERIES[name](spark, tied_sf_dir).toPandas()
    odf = tied_duck.execute(ORACLES[name]).df()
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
