"""Property-based checks (SURVEY.md §5.3) for the custom operators:
random inputs, brute-force pandas references.

Hypothesis example counts are small — each example runs Spark jobs — but
the generators hit the semantic corners deterministic fixtures miss:
equal timestamps, duplicate keys, one-sided keys, empty sides.
"""

from __future__ import annotations

import pandas as pd
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from kafka_streams_tcp_reconciliation_spark.operators.joins import asof_join, windowed_join
from kafka_streams_tcp_reconciliation_spark.operators.ktable import latest_by_key

KEYS = st.integers(min_value=0, max_value=3)
TS = st.integers(min_value=0, max_value=20)  # coarse: forces ts collisions

rows = st.lists(st.tuples(KEYS, TS), min_size=0, max_size=25)

_SETTINGS = dict(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)


@given(left=rows, right=rows)
@settings(**_SETTINGS)
def test_asof_join_matches_bruteforce(spark, left, right):
    """asof_join == per-left-row argmax over right rows with
    r.ts <= l.ts (ties broken by the tiebreak column, largest wins)."""
    ldf = spark.createDataFrame(
        [(k, t, i) for i, (k, t) in enumerate(left)], "k long, ts long, lid long"
    ).withColumn("ts", F.timestamp_seconds("ts"))
    rdf = spark.createDataFrame(
        [(k, t, i) for i, (k, t) in enumerate(right)], "k long, ts long, rid long"
    ).withColumn("ts", F.timestamp_seconds("ts"))

    got = {
        (r.lid): r.asof_rid
        for r in asof_join(
            ldf, rdf, ["k"], "ts", "ts", ["rid"], tiebreak="rid"
        ).collect()
    }

    want = {}
    for i, (lk, lt) in enumerate(left):
        cands = [
            (rt, j) for j, (rk, rt) in enumerate(right) if rk == lk and rt <= lt
        ]
        if cands:
            # latest ts; among equal ts the largest tiebreak (rid) —
            # mirrors ORDER BY ts, rid with last-wins carry
            want[i] = max(cands)[1]
    assert got == want


@given(left=rows, right=rows)
@settings(**_SETTINGS)
def test_windowed_join_matches_bruteforce(spark, left, right):
    """windowed_join(inner, ±2s) == brute-force pair filter."""
    ldf = spark.createDataFrame(
        [(k, t, i) for i, (k, t) in enumerate(left)], "k long, ts long, lid long"
    ).withColumn("ts", F.timestamp_seconds("ts"))
    rdf = spark.createDataFrame(
        [(k, t, i) for i, (k, t) in enumerate(right)], "k long, ts long, rid long"
    ).withColumn("ts", F.timestamp_seconds("ts"))

    out = windowed_join(ldf, rdf, ["k"], "ts", "ts", "2 seconds", "2 seconds")
    got = {(r["l.lid"], r["r.rid"]) for r in out.select(
        F.col("l.lid").alias("l.lid"), F.col("r.rid").alias("r.rid")).collect()}

    want = {
        (i, j)
        for i, (lk, lt) in enumerate(left)
        for j, (rk, rt) in enumerate(right)
        if lk == rk and lt - 2 <= rt <= lt + 2
    }
    assert got == want


@given(data=rows)
@settings(**_SETTINGS)
def test_latest_by_key_is_argmin(spark, data):
    """latest_by_key(asc ts, asc id) picks exactly the first row per key
    in that order — pandas idxmin reference."""
    if not data:
        return
    df = spark.createDataFrame(
        [(k, t, i) for i, (k, t) in enumerate(data)], "k long, ts long, rid long"
    )
    got = {
        r.k: r.rid
        for r in latest_by_key(
            df, ["k"], [F.col("ts").asc(), F.col("rid").asc()]
        ).collect()
    }
    pdf = pd.DataFrame(data, columns=["k", "ts"]).assign(rid=range(len(data)))
    want = (
        pdf.sort_values(["ts", "rid"]).groupby("k").first()["rid"].to_dict()
    )
    assert got == want


@given(left=rows, right=rows, nullmask=st.lists(st.booleans(), min_size=25, max_size=25))
@settings(**_SETTINGS)
def test_asof_join_carries_null_value_columns_atomically(
    spark, left, right, nullmask
):
    """The round-3 splice bug class, generatively: when a right row's value
    column is NULL, the carry must still pick THAT row (atomic struct),
    never reach back to an older right row's non-NULL value — and the
    matched row's id must stay consistent with its (possibly NULL) value."""
    ldf = spark.createDataFrame(
        [(k, t, i) for i, (k, t) in enumerate(left)], "k long, ts long, lid long"
    ).withColumn("ts", F.timestamp_seconds("ts"))
    rrows = [
        (k, t, i, None if nullmask[i] else float(i * 10))
        for i, (k, t) in enumerate(right)
    ]
    rdf = spark.createDataFrame(
        rrows, "k long, ts long, rid long, val double"
    ).withColumn("ts", F.timestamp_seconds("ts"))

    got = {
        r.lid: (r.asof_rid, r.asof_val)
        for r in asof_join(
            ldf, rdf, ["k"], "ts", "ts", ["rid", "val"], tiebreak="rid"
        ).collect()
    }

    want = {}
    for i, (lk, lt) in enumerate(left):
        cands = [
            (rt, j) for j, (rk, rt) in enumerate(right) if rk == lk and rt <= lt
        ]
        if cands:
            j = max(cands)[1]
            want[i] = (j, None if nullmask[j] else float(j * 10))
    assert got == want
