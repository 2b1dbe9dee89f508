"""At-least-once delivery hardening: ``*_deduped`` compositions.

Five per-RECORD operators (as-of, PIT, runlengths, conversion-lag,
loss-rate) emit one output row per physical input row, so verbatim
duplicate delivery — the default failure mode of an at-least-once source —
changes their answers, and an ANSI oracle cannot tell two verbatim rows
apart to mirror that. The production contract is composition: exact dedup
first, then the operator. These registrations make that contract a GREEN
DIFFERENTIAL ROW instead of a documentation caveat — each ``*_deduped``
query is the base operator fed an exact-deduped event stream, and its
oracle is the base oracle with ``events`` rebound to
``SELECT DISTINCT * FROM main.events``.

Scale: ``dropDuplicates()`` over the full row is one hash-partitioned
exchange on the row hash with map-side partial dedup — the standard
at-least-once ingestion scrub (the streaming twin is
``dropDuplicatesWithinWatermark``, tested in tests/test_streaming_semantics).
On a clean (exactly-once) input the wrapper is bit-identical to its base
query, which is what the driver's sf0.01 differential proves; the
duplicate-delivery fixture in tests/test_empty_tables.py proves the
at-least-once story at 10% verbatim redelivery.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from kafka_streams_tcp_reconciliation_spark.plans import ORACLES, QueryFn, register
from kafka_streams_tcp_reconciliation_spark.plans.advanced import conversion_lag_percentiles
from kafka_streams_tcp_reconciliation_spark.plans.events import (
    asof_last_click_before_purchase,
    reconcile_loss_rate_hourly,
)
from kafka_streams_tcp_reconciliation_spark.plans.mlprep import event_type_runlengths
from kafka_streams_tcp_reconciliation_spark.plans.sequences import pit_click_purchase_context
from kafka_streams_tcp_reconciliation_spark.sources.tables import load_table

_PER_RECORD_BASES: dict[str, QueryFn] = {
    "asof_last_click_before_purchase": asof_last_click_before_purchase,
    "pit_click_purchase_context": pit_click_purchase_context,
    "event_type_runlengths": event_type_runlengths,
    "conversion_lag_percentiles": conversion_lag_percentiles,
    "reconcile_loss_rate_hourly": reconcile_loss_rate_hourly,
}


def _distinct_events_oracle(base_oracle: str) -> str:
    """Rebind ``events`` to its exact-deduped form inside a DuckDB oracle.

    A CTE named ``events`` shadows the driver-registered view for the rest
    of the statement; the CTE body must schema-qualify ``main.events`` (a
    bare ``events`` inside the CTE is a circular self-reference in DuckDB).
    If the base oracle already opens with WITH, splice into its CTE list.
    """
    prefix = "WITH events AS (SELECT DISTINCT * FROM main.events)"
    s = base_oracle.lstrip()
    if s[:4].upper() == "WITH":
        return f"{prefix},{s[4:]}"
    return f"{prefix} {s}"


def _make_deduped(base: QueryFn) -> QueryFn:
    def deduped(spark: SparkSession, sf_dir: str) -> DataFrame:
        ev = load_table(spark, sf_dir, "events").dropDuplicates()
        return base(spark, sf_dir, events=ev)

    return deduped


for _name, _base in _PER_RECORD_BASES.items():
    _fn = _make_deduped(_base)
    _fn.__name__ = f"{_name}_deduped"
    _fn.__doc__ = (
        f"Exact dedup -> {_name}: the at-least-once composition. "
        "See module docstring."
    )
    register(f"{_name}_deduped", oracle=_distinct_events_oracle(ORACLES[_name]))(_fn)
