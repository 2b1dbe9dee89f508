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

import glob
import importlib
import json
import os
import re
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]

QUERIES: dict[str, QueryFn] = {}
ORACLES: dict[str, str] = {}

# Registration order doubles as the driver's correctness-check order (the
# verify pass caps at the first N registered queries). Front-load the modules
# whose queries have never had a driver CORRECTNESS row — llm + tpch_deep +
# extended + clustering + curation is exactly 50 queries — so every query
# accumulates a driver-scale proof across rounds; the back modules stay
# covered by the local differential suite (tests/test_oracle_differential.py),
# which runs the identical comparison at sf0.001 and sf0.01.
_PLAN_MODULES = (
    "llm",
    "tpch_deep",
    "extended",
    "clustering",
    "curation",
    "mlprep",
    "advanced",
    "pipeline",
    "selection",
    "governance",
    "sequences",
    "relational",
    "analytics",
    "events",
    # last: wraps per-record operators registered above with exact-dedup
    # compositions for at-least-once sources (imports their base fns)
    "atleastonce",
)


def register(name: str, oracle: str | None = None) -> Callable[[QueryFn], QueryFn]:
    """Register a named query and (optionally) its DuckDB oracle SQL.

    The registry stores a thin wrapper that clears the session's SQL cache
    before building the plan; the raw function is returned (and imported by
    composing modules, e.g. plans/atleastonce) so intra-query composition
    never clears mid-plan. Rationale: several queries ``.cache()``
    intermediates that materialize when the caller collects the result, and
    the external driver runs ~50 queries sequentially in ONE session with
    no cache hygiene of its own — by the end of a verify window the
    accumulated storage memory starves the co-resident DuckDB oracle (the
    round-7 ``negative_sampling_pairs`` red row was DuckDB failing a 2 KB
    allocation on the WINDOW'S LAST QUERY). Clearing at invocation bounds
    resident storage to one query's working set; bench.py's own per-query
    ``clearCache`` stays (idempotent), and a query's internal caches are
    created after the clear, so self-use is unaffected.

    CAVEAT for interactive / embedding callers: ``clearCache`` is
    session-wide — invoking ANY registered query drops every cached
    relation in the session, including caches you created yourself.
    Results stay correct (Spark recomputes), but cached work is lost.
    Call the undecorated plan builder (``QUERIES[name].__wrapped__``) to
    opt out of the hygiene when you manage the session cache yourself.
    """

    def deco(fn: QueryFn) -> QueryFn:
        if name in QUERIES:
            raise ValueError(f"duplicate query name: {name}")

        def invoke(spark: SparkSession, sf_dir: str, **kwargs) -> DataFrame:
            try:
                spark.catalog.clearCache()
            except Exception:
                pass  # never let hygiene break a query (e.g. stopped session)
            return fn(spark, sf_dir, **kwargs)

        invoke.__name__ = fn.__name__
        invoke.__qualname__ = fn.__qualname__
        invoke.__doc__ = fn.__doc__
        invoke.__wrapped__ = fn
        QUERIES[name] = invoke
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


def _driver_status() -> dict[str, tuple[str, int]]:
    """Latest driver verdict per query: (state, round) where state is
    'green' | 'failed' | 'no_oracle' and round is the round number of the
    latest row (for staleness-aware re-check ordering).

    The driver checks queries in dict order with a per-round cap (r01/r02:
    first 50), so ordering IS coverage. Reading its own CORRECTNESS_r*.json
    artifacts back makes the registry self-rotating. Later rounds override
    earlier ones per query.
    """
    root = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    status: dict[str, tuple[str, int]] = {}
    for path in sorted(glob.glob(os.path.join(root, "CORRECTNESS_r*.json"))):
        m = re.search(r"CORRECTNESS_r(\d+)\.json$", path)
        rnd = int(m.group(1)) if m else 0
        try:
            with open(path) as f:
                data = json.load(f)
        except Exception:
            continue
        if not isinstance(data, dict):
            continue
        for name, res in data.items():
            if not isinstance(res, dict):
                continue
            green = (
                bool(res.get("rows_match"))
                and bool(res.get("schema_match"))
                and res.get("hash_match") is not False
                and res.get("err") in (None, "")
            )
            if green:
                status[name] = ("green", rnd)
            elif res.get("err") == "no_oracle":
                status[name] = ("no_oracle", rnd)
            else:
                status[name] = ("failed", rnd)
    return status


def _ordered(names: list[str]) -> list[str]:
    """Driver-check order: previously-FAILED first, then never-checked, then
    permanently-oracle-less sketch queries, then proven-green — and within
    the green tier, OLDEST proof first.

    Failed-first guarantees any query whose latest driver row is red lands
    inside the next round's check window immediately (a red row is the
    highest-information re-check). Queries with no DuckDB oracle can only
    ever earn a weak rows-only row, so they must not burn front-of-window
    slots that could prove a real differential — they sort behind every
    oracle-backed candidate. Within the green tier, queries sort by the
    round of their latest green row (stalest proof first) so that once all
    queries are green, the driver's 50-query window continuously refreshes
    the oldest evidence instead of re-checking the same 50 every round.
    Within every other tier, registration order is kept so coverage drains
    deterministically module by module.
    """
    status = _driver_status()
    tier = {"failed": 0, None: 1, "no_oracle": 2, "green": 3}

    def key(item: tuple[int, str]) -> tuple[int, int, int]:
        idx, name = item
        st, rnd = status.get(name, (None, 0))
        t = tier[st]
        # Oracle-less queries can never upgrade past a rows-only row;
        # park them behind all oracle-backed non-green work even before
        # their first driver row exists.
        if t < 2 and name not in ORACLES:
            t = 2
        # ...but a query whose weak rows-only row predates it GAINING an
        # oracle can now earn a full differential — re-check it with the
        # failed tier.
        elif t == 2 and name in ORACLES:
            t = 0
        # Stale-green-first applies only inside the green tier; elsewhere
        # the round is irrelevant (failed/never-checked always lead).
        age = rnd if t == 3 else 0
        return (t, age, idx)

    return [n for _, n in sorted(enumerate(names), key=key)]


def all_queries() -> dict[str, QueryFn]:
    load_all()
    return {n: QUERIES[n] for n in _ordered(list(QUERIES))}


def all_oracles() -> dict[str, str]:
    load_all()
    return {n: ORACLES[n] for n in _ordered(list(QUERIES)) if n in ORACLES}
