"""Query registry — the single source of truth for the driver contract.

Every implemented operator from SURVEY.md §2 registers here as a named query
(a callable ``(spark, sf_dir) -> DataFrame``) plus, where ANSI-SQL
expressible, a DuckDB oracle SQL string. ``__spark_entry__.queries()`` /
``oracle_sql()`` simply re-export these dicts.

Registration is declarative::

    @register("q1_pricing_summary", oracle="SELECT ...")
    def q1(spark, sf_dir): ...

Rules enforced by convention (SURVEY.md §5.2):
- every computed column is aliased identically in Spark and SQL;
- floating-point outputs are rounded (same ndigits both sides) so the
  driver's value-hash is stable across summation orders;
- timestamps surface as TIMESTAMP_NTZ / naive TIMESTAMP on both sides.
"""

from __future__ import annotations

import importlib
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]

QUERIES: dict[str, QueryFn] = {}
ORACLES: dict[str, str] = {}

_PLAN_MODULES = (
    "relational",
    "analytics",
    "events",
    "llm",
    "extended",
    "tpch_deep",
    "pipeline",
    "clustering",
    "curation",
)


def register(name: str, oracle: str | None = None) -> Callable[[QueryFn], QueryFn]:
    """Register a named query and (optionally) its DuckDB oracle SQL."""

    def deco(fn: QueryFn) -> QueryFn:
        if name in QUERIES:
            raise ValueError(f"duplicate query name: {name}")
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = oracle
        return fn

    return deco


_loaded = False


def load_all() -> None:
    """Import every plan module so all @register decorators run."""
    global _loaded
    if _loaded:
        return
    for mod in _PLAN_MODULES:
        importlib.import_module(f"{__package__}.{mod}")
    _loaded = True


def all_queries() -> dict[str, QueryFn]:
    load_all()
    return dict(QUERIES)


def all_oracles() -> dict[str, str]:
    load_all()
    return dict(ORACLES)
