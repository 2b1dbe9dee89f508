"""Driver-window rotation invariants.

The driver checks the first N queries of ``all_queries()`` per round, so the
ordering function IS the coverage strategy. These tests lock the contract:

1. every previously-FAILED, oracle-backed query sorts ahead of every
   never-checked one (a red row is the highest-information re-check);
2. oracle-less queries never occupy front-of-window slots (they can only
   earn a weak rows-only row);
3. proven-green queries yield their slot entirely — and within the green
   tier, the STALEST green row sorts first, so an all-green registry keeps
   refreshing its oldest evidence instead of re-checking the same window;
4. ties break by registration order, so coverage drains deterministically.

A future ordering change that re-buries failures goes red here instead of
silently deferring driver re-proof by a round.
"""

from __future__ import annotations

from kafka_streams_tcp_reconciliation_spark import plans
from kafka_streams_tcp_reconciliation_spark.plans import (
    ORACLES,
    QUERIES,
    _ordered,
    load_all,
)


def _fake_status(monkeypatch, status: dict[str, tuple[str, int]]) -> None:
    monkeypatch.setattr(plans, "_driver_status", lambda: status)


def test_failed_before_never_checked_before_no_oracle_before_green(monkeypatch):
    load_all()
    names = list(QUERIES)
    oracle_backed = [n for n in names if n in ORACLES]
    assert len(oracle_backed) >= 4
    failed, green = oracle_backed[5], oracle_backed[0]
    no_oracle = next((n for n in names if n not in ORACLES), None)
    _fake_status(monkeypatch, {failed: ("failed", 3), green: ("green", 3)})

    out = _ordered(names)
    pos = {n: i for i, n in enumerate(out)}
    # failed first overall
    assert pos[failed] == 0
    # green last block
    never_checked = [n for n in names if n not in (failed, green)]
    assert pos[green] > max(pos[n] for n in never_checked)
    # oracle-less behind every oracle-backed non-green query
    if no_oracle is not None:
        assert pos[no_oracle] > max(
            pos[n] for n in oracle_backed if n not in (failed, green)
        )


def test_all_current_failed_rows_land_in_round_window(monkeypatch=None):
    """With the REAL on-disk CORRECTNESS artifacts: every query whose latest
    driver row failed and that has an oracle must sit inside the first 50
    slots (the driver's per-round cap)."""
    load_all()
    status = plans._driver_status()
    failed = [
        n
        for n in QUERIES
        if status.get(n, (None, 0))[0] == "failed" and n in ORACLES
    ]
    window = list(plans.all_queries())[:50]
    missing = [n for n in failed if n not in window]
    assert not missing, f"failed queries outside round window: {missing}"


def test_ties_break_by_registration_order(monkeypatch):
    load_all()
    _fake_status(monkeypatch, {})
    names = [n for n in QUERIES if n in ORACLES][:10]
    assert _ordered(names) == names


def test_stale_green_rows_refresh_first(monkeypatch):
    """All-green registry: the query whose latest green row is OLDEST must
    sort ahead of one proven green more recently, regardless of
    registration order — so the driver's 50-query window continuously
    refreshes the stalest proof."""
    load_all()
    names = [n for n in QUERIES if n in ORACLES][:6]
    # everyone green; the LAST-registered query has the OLDEST green row
    status = {n: ("green", 5) for n in names}
    status[names[-1]] = ("green", 1)
    status[names[2]] = ("green", 3)
    _fake_status(monkeypatch, status)
    out = _ordered(names)
    assert out[0] == names[-1]  # round-1 proof refreshes first
    assert out[1] == names[2]  # then round-3
    # remaining round-5 greens keep registration order
    assert out[2:] == [n for n in names[:-1] if n != names[2]]


def test_all_green_window_contains_stalest_proofs():
    """With the REAL on-disk artifacts and an all-green registry, the first
    50 slots must be exactly the 50 queries with the oldest latest-green
    round (no fresher-green query displaces a staler one)."""
    load_all()
    status = plans._driver_status()
    greens = {
        n: status[n][1]
        for n in QUERIES
        if n in status and status[n][0] == "green"
    }
    if len(greens) < len(QUERIES):
        return  # not all-green: failed/never-checked correctly lead instead
    window = list(plans.all_queries())[:50]
    worst_in_window = max(greens[n] for n in window)
    best_outside = min(greens[n] for n in QUERIES if n not in window)
    assert worst_in_window <= best_outside


def test_oracle_less_queries_not_in_front_even_when_failed(monkeypatch):
    """An oracle-less query whose driver row errored must still not displace
    oracle-backed work: it can never upgrade past rows-only."""
    load_all()
    no_oracle = [n for n in QUERIES if n not in ORACLES]
    if not no_oracle:
        return
    target = no_oracle[0]
    _fake_status(monkeypatch, {target: ("no_oracle", 3)})
    out = _ordered(list(QUERIES))
    oracle_backed = [n for n in QUERIES if n in ORACLES]
    pos = {n: i for i, n in enumerate(out)}
    assert pos[target] > max(pos[n] for n in oracle_backed)
