"""Degenerate-text differential sweep (round 9).

The round-7 NULL-embedding sweep found 9 real engine divergences; this is
its text-side sequel. Real 100 TB corpora contain documents the synthetic
fixtures never produce: empty strings, docs shorter than the shingle/gram
width, runs of consecutive spaces, leading/trailing whitespace, one giant
unbroken token, pathological repetition, non-ASCII text.

Round-9 motivation (found by probing BEFORE this sweep existed): Spark's
``sequence(1, m)`` DESCENDS for m <= 0, so every shingle/char-gram builder
crashed the whole job on any doc shorter than the gram width
(``slice`` start 0 → SparkRuntimeException) — and the char-8-gram
fingerprint silently hashed the doc's TAIL (``substring(text, -1, 8)``)
instead of returning the oracle's NULL. Both fixed via
``functions/hashing.safe_seq1``; this sweep locks the fix across EVERY
query whose oracle touches the documents table and catches the next
divergence of this class.

The fixture swaps ~8% of ``documents.text`` for degenerate strings (and
recomputes ``n_chars`` so intra-row invariants hold) and requires full
value parity with the DuckDB oracle on the same data.
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

DOCUMENT_QUERIES = sorted(
    n for n, sql in ORACLES.items() if "documents" in sql
)

# every shape the generators never emit; chosen to hit the gram-width
# boundaries of each text operator in the package (shingle n=3, char-8-gram
# fingerprint, bigrams, word hashes)
DEGENERATE_TEXTS = [
    "",  # empty
    "one",  # below every gram width
    "one two",  # below shingle width (n=3)
    "one two three",  # exactly shingle width
    "a  b",  # consecutive spaces -> empty-string token
    " leading",  # leading space
    "trailing ",  # trailing space
    "sevench",  # 7 chars: one below the char-8-gram width
    "eightcha",  # exactly the char-8-gram width
    "x" * 500,  # one giant unbroken token
    ("dup " * 60).strip(),  # pathological repetition (one hot shingle)
    "répétition naïve über schön",  # non-ASCII
    "☃ ☃ ☃ ☃ ☃",  # non-BMP-adjacent symbols, repeated
]


@pytest.fixture(scope="module")
def degen_sf_dir(tmp_path_factory) -> str:
    src = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")
    dst = tmp_path_factory.mktemp("sf_degen_text")
    rng = np.random.default_rng(17)
    for t in TABLE_NAMES:
        tb = pq.read_table(os.path.join(src, f"{t}.parquet"))
        tb = tb.replace_schema_metadata(None)
        if t == "documents":
            n = len(tb)
            idx = rng.random(n) < 0.08
            text = tb.column("text").to_pylist()
            k = 0
            for i in range(n):
                if idx[i]:
                    text[i] = DEGENERATE_TEXTS[k % len(DEGENERATE_TEXTS)]
                    k += 1
            assert k >= len(DEGENERATE_TEXTS), "fixture too small"
            cols = {}
            for name in tb.schema.names:
                if name == "text":
                    cols[name] = pa.array(text, type=pa.string())
                elif name == "n_chars":
                    cols[name] = pa.array(
                        [len(s) if s is not None else None for s in text],
                        type=tb.schema.field(name).type,
                    )
                else:
                    cols[name] = tb.column(name)
            tb = pa.table(cols)
        pq.write_table(tb, str(dst / f"{t}.parquet"))
    return str(dst)


@pytest.fixture(scope="function")
def degen_duck(degen_sf_dir, tmp_path_factory):
    d = ResilientDuck(degen_sf_dir, tmp_path_factory)
    yield d
    d.close()


@pytest.mark.parametrize("name", DOCUMENT_QUERIES)
def test_query_survives_degenerate_text(name, spark, degen_sf_dir, degen_duck):
    sdf = QUERIES[name](spark, degen_sf_dir).toPandas()  # must not raise
    odf = degen_duck.execute(ORACLES[name]).df()
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


def test_short_doc_shingles_empty_not_crash(spark):
    """The specific round-9 crash path: a sub-width doc must produce an
    EMPTY shingle set / gram list (like DuckDB's empty range), never feed
    slice a non-positive index."""
    from pyspark.sql import functions as F

    from kafka_streams_tcp_reconciliation_spark.operators.dedup import (
        shingle_expr,
    )

    df = spark.createDataFrame(
        [(0, ""), (1, "one"), (2, "one two")], "doc_id int, text string"
    )
    out = {
        r.doc_id: r.sh
        for r in df.select(
            "doc_id", shingle_expr("text", 3).alias("sh")
        ).collect()
    }
    assert out == {0: [], 1: [], 2: []}

    # NULL text still propagates NULL (not empty) through the guard
    df2 = spark.createDataFrame([(3,)], "doc_id int").withColumn(
        "text", F.lit(None).cast("string")
    )
    assert df2.select(shingle_expr("text", 3).alias("sh")).collect()[0].sh is None


# ---------------------------------------------------------------------------
# top-bigram threshold boundary (round 12)
# ---------------------------------------------------------------------------
#
# Round-11 verdict finding #1: `top_bigram_char_fraction.flagged` computed
# the 20% threshold with FLOAT division on the Spark side but truncating
# BIGINT division in the oracle. The two diverge exactly when a document's
# covered-fraction lands strictly inside (0.200000, 0.200001): the floor is
# exactly 200000 (not flagged) while the float quotient exceeds 200000
# (flagged). The fix derives `flagged` from the truncated `frac_micro`;
# these planted documents EXERCISE the one-micro-unit window (the old float
# form provably flips on the boundary doc) instead of merely closing it.
#
# Construction: top bigram "ab ab" (5 chars) occurring exactly 10 000 times
# ("ab" repeated 10 001 times), so covered_micro = 10000*5*1e6 = 5e10, and
# unique-word filler pads the doc to a chosen total length N:
#   N = 249 999 -> 5e10/N = 200000.80  in the window: floor 200000, float >
#   N = 250 000 -> exactly 200000: not flagged on either arithmetic
#   N = 249 990 -> 200008: flagged on both


def _top_bigram_boundary_doc(n_total: int) -> str:
    prefix = ("ab " * 10_001).strip()  # 30 002 chars, "ab ab" x 10 000
    need = n_total - len(prefix)  # filler chars, each " w%06d" = 8
    n_full, rem = divmod(need, 8)
    assert rem == 0 or rem >= 2, "final word would be empty"
    s = prefix + "".join(f" w{i:06d}" for i in range(n_full))
    if rem:
        s += " " + "z" * (rem - 1)
    assert len(s) == n_total
    return s


@pytest.fixture(scope="module")
def top_bigram_boundary_dir(tmp_path_factory) -> str:
    src = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")
    dst = tmp_path_factory.mktemp("sf_topbg_boundary")
    planted = [
        (9_000_001, _top_bigram_boundary_doc(249_999)),  # inside window
        (9_000_002, _top_bigram_boundary_doc(250_000)),  # exact boundary
        (9_000_003, _top_bigram_boundary_doc(249_990)),  # clearly over
    ]
    for t in TABLE_NAMES:
        tb = pq.read_table(os.path.join(src, f"{t}.parquet"))
        tb = tb.replace_schema_metadata(None)
        if t == "documents":
            tb = pa.table(
                {
                    "doc_id": pa.array(
                        [d for d, _ in planted], type=pa.int64()
                    ),
                    "text": pa.array([s for _, s in planted]),
                    "lang": pa.array(["en"] * len(planted)),
                    "source": pa.array(["boundary"] * len(planted)),
                    "n_chars": pa.array(
                        [len(s) for _, s in planted], type=pa.int64()
                    ),
                }
            )
        pq.write_table(tb, str(dst / f"{t}.parquet"))
    return str(dst)


def test_top_bigram_flag_boundary(spark, top_bigram_boundary_dir, tmp_path_factory):
    name = "top_bigram_char_fraction"
    sdf = (
        QUERIES[name](spark, top_bigram_boundary_dir)
        .toPandas()
        .set_index("doc_id")
        .sort_index()
    )
    d = ResilientDuck(top_bigram_boundary_dir, tmp_path_factory)
    try:
        odf = d.execute(ORACLES[name]).df().set_index("doc_id").sort_index()
    finally:
        d.close()

    # full parity on the planted boundary docs — the old float `flagged`
    # fails this compare on doc 9000001
    for c in ("top_bigram", "bg_count", "frac_micro", "flagged"):
        assert list(sdf[c]) == list(odf[c]), c

    # the window is real: on the in-window doc the float quotient exceeds
    # the threshold while the truncated micro-fraction does not
    row = sdf.loc[9_000_001]
    assert row["top_bigram"] == "ab ab" and row["bg_count"] == 10_000
    covered_micro = 10_000 * 5 * 1_000_000
    assert covered_micro / 249_999 > 200_000  # old float form: flips
    assert row["frac_micro"] == 200_000 and not row["flagged"]

    # exact-boundary: 200000 is NOT > 200000 on either arithmetic
    assert sdf.loc[9_000_002]["frac_micro"] == 200_000
    assert not sdf.loc[9_000_002]["flagged"]
    # clearly over: flagged on both
    assert sdf.loc[9_000_003]["frac_micro"] == 200_008
    assert bool(sdf.loc[9_000_003]["flagged"])
