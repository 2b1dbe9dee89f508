"""Smoke tests for the examples/ demo scripts (round-7 VERDICT task 4).

Before this file the four demos were the only code in the repo no test
imported or ran. Each test executes a script exactly the way a user
would (`python examples/<name>.py <sf_dir>`, its own Spark session in a
subprocess — the scripts call spark.stop()) at sf0.001 and asserts the
run exits cleanly and prints the non-empty, well-formed results it
promises. These are smoke tests by design: every underlying operator
already has its own DuckDB-differential correctness test.
"""

from __future__ import annotations

import os
import re
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")


def _run(script: str) -> str:
    proc = subprocess.run(
        [sys.executable, os.path.join(REPO, "examples", script), SF_DIR],
        capture_output=True,
        text=True,
        timeout=900,
        cwd=REPO,
    )
    assert proc.returncode == 0, (
        f"{script} exited {proc.returncode}\n"
        f"stdout:\n{proc.stdout[-4000:]}\nstderr:\n{proc.stderr[-4000:]}"
    )
    return proc.stdout


def _int_after(pattern: str, out: str) -> int:
    m = re.search(pattern, out)
    assert m, f"marker {pattern!r} missing from output"
    return int(m.group(1))


def test_corpus_pipeline_example():
    out = _run("corpus_pipeline.py")
    assert _int_after(r"curated corpus: (\d+) docs kept", out) > 0
    assert _int_after(r"packed into (\d+) training-sequence bins", out) > 0
    # the near-dup stage keeps at most as many canonicals as members
    members = _int_after(r"near-dup clusters: (\d+) docs in clusters", out)
    keepers = _int_after(r"(\d+) canonical keepers", out)
    assert 0 < keepers <= members
    # split table renders with its three named splits
    for split in ("train", "valid", "test"):
        assert split in out


def test_governance_report_example():
    out = _run("governance_report.py")
    assert "== contract audit ==" in out
    assert "checks with violations:" in out
    # the orders column profile prints all four profiled columns
    for col in ("o_orderkey", "o_custkey", "o_orderstatus", "o_orderpriority"):
        assert col in out
    assert _int_after(r"flagged events: (\d+)", out) >= 0
    assert "== top session journeys ==" in out


def test_retrieval_stack_example():
    out = _run("retrieval_stack.py")
    assert "== exact top-k (baseline) vs IVF (serving path), query 0 ==" in out
    # brute-force and IVF tables both render ranked neighbor rows
    assert out.count("query_id") >= 2
    assert "== MMR diversified top-5 for query 0 ==" in out
    assert "is_correct" in out


def test_streaming_reconciliation_example():
    out = _run("streaming_reconciliation.py")
    assert _int_after(r"matched pairs:\s+(\d+)", out) > 0
    assert _int_after(r"unmatched \(emitted\):\s+(\d+)", out) >= 0
