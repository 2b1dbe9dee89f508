"""Regenerate BASELINE.md's measured section from 5 bench runs.

Protocol (round 7, tightened round 11): 5 back-to-back `bench.py` runs
at sf0.1 on the SAME committed code, per-query MEDIAN over the runs —
and since round 11 each run's per-query value is itself the median of 3
back-to-back executions (bench.py), so a baseline row is the median of
5 medians-of-3. bench.py times STEADY-STATE execution (an untimed
warmup pass of every query at sf0.001 precedes the timed pass); the
driver's per-round BENCH run uses the identical protocol, keeping the
2x acceptance gate coherent.

Usage:
    for i in 1..5: SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 \
        SPARK_GRAFT_CPUS=32 python bench.py && cp BENCH.json \
        /tmp/bench_runs/BENCH_$i.json
    python tools/gen_baseline.py
"""

import json
import statistics

runs = []
for i in range(1, 6):
    with open(f"/tmp/bench_runs/BENCH_{i}.json") as f:
        runs.append(json.load(f))

names = sorted(set().union(*[r["queries"] for r in runs]))
medians = {}
for n in names:
    vals = [
        r["queries"][n]
        for r in runs
        if n in r["queries"] and r["queries"][n] >= 0
    ]
    assert len(vals) == 5, (n, len(vals))
    medians[n] = round(statistics.median(vals), 3)

# Round 12 RETIRED the round-11 BIMODAL_SLOW_MEDIANS override (slow-mode
# floors 3.856/5.926 s for the two MinHash-LSH rows): the bimodality's
# mechanism — per-session JIT profile pollution of the interpreted HOF
# signature kernels — was eliminated structurally by moving the per-doc
# compute to the Arrow/numpy kernel (operators/dedup.minhash_gram_sig_frame,
# bit-equality-locked). Eight fresh-session medians-of-3 on the kernel
# code: uncapped 1.65-2.56 s (1.55x spread), capped 2.49-5.33 s where the
# single 5.33 outlier had a WIDE within-session triplet (4.0-8.3 s, the
# host-noise signature, unlike the old tight slow-mode triplets); without
# it 1.61x spread. Unimodal -> these rows are honest 5-run medians again,
# and the 2x gate regains full sensitivity on them.
totals = [r["value"] for r in runs]
agg = round(sum(medians.values()), 1)

HEADER = """# BASELINE — performance baseline (SURVEY.md §6)

## Status of reference numbers

The reference checkout `/root/reference/` is **empty** (verified 2026-08-13:
`find /root/reference -type f | wc -l` → 0; network unavailable — see
SURVEY.md §0). **No published benchmark numbers for
`gcjenkinson/kafka-streams-tcp-reconciliation` are available**, and none of
the papers listed in `PAPERS.md` benchmark that application. Rows below that
would normally cite reference file:line therefore say so explicitly instead
of carrying fabricated citations.

## Baseline table

| metric | value | config | source |
|---|---|---|---|
| Reference: query set | none published | — | empty checkout (SURVEY.md §0) |
| Reference: scale factor | none published | — | empty checkout |
| Reference: hardware | none published | — | empty checkout |
| Reference: q/s or sec/query | none published | — | empty checkout |
| Acceptance: correctness | every declared query hash-matches DuckDB oracle | t2, sf0.01 (~60k lineitem rows) | `BASELINE.json:2`, `TESTDATA.md:10,17-18` |
| Acceptance: performance | BENCH within 2× of BASELINE at same scale factor | sf0.1 (~600k lineitem rows) | `BASELINE.json:2`, `TESTDATA.md:11,18` |
| Smoke | `entry(spark)` rows > 0 | t1, sf0.001 (~6k lineitem rows) | `__spark_entry__.py:17-19`, `TESTDATA.md:9,17` |
| Workload tables | region(5) nation(25) supplier(10) customer(150) part(200) orders(1.5k) lineitem(6k) events(1k) documents(500) embeddings(500) rows at sf0.001 | parquet, seed=42 | measured with pyarrow round 3; `TESTDATA.md:3-5` |
| Environment | PySpark 4.1.2, DuckDB 1.0.0, PyArrow 16.1.0, OpenJDK 17.0.20, Linux 6.18, Spark local mode | measured round 3 | — |

## Measured baseline (round 11, 2026-08-16 — ONE protocol, all {n} queries,
## STEADY-STATE per-query MEDIANS-OF-3)

Re-baselined in full this round for two structural reasons (round-10
VERDICT item 1): (a) bench.py's per-query timing protocol changed from
a single execution to the MEDIAN OF 3 back-to-back executions — the
single-run artifact was noise-gated for the ~200 sub-0.5 s queries and
produced a phantom >2× breach two rounds running (r9
reconcile_loss_rate_hourly_deduped 2.40×, r10 text_fingerprint 2.17×,
both judge-adjudicated as host noise); a baseline row is now the median
over 5 runs of medians-of-3, and the driver's artifact carries the same
per-query noise immunity as the baseline. (b) Round 11 registered 4 new
queries (dedup_minhash_lsh_capped, quality_tercile_buckets_approx,
bitext_margin_mining, top_bigram_char_fraction) that need rows. The
protocol change also retires the round-10 carried artifacts the old
single-run table had absorbed (dedup_minhash_lsh 3.938 s where the
isolated median is 1.23 s — tools/isolated_medians.py, SCALE.md round
11). Per-query wall-clock at sf0.1, `local[32]`, **median over 5
back-to-back bench.py runs on final round-11 code**, whole-run timed
totals {totals} s.
Since round 7 bench.py measures steady-state execution: every query
first runs once UNTIMED at sf0.001, so whole-stage-codegen compile — a
one-time cost that amortizes at any production scale but injected
2-3 s/query of variance locally (SCALE.md round-6/7 floor
decompositions) — is excluded from the timings on BOTH sides of the 2×
gate; since round 11 session.py also sizes the Janino codegen cache
(4096) above the plan count so the warmup's compiled classes survive to
the timed pass (SCALE.md round 11).

Two rows (dedup_minhash_lsh, dedup_minhash_lsh_capped) record their
SLOW-mode medians instead of the all-run median: the family is
session-bimodal (fast ~1 s / slow ~4-6 s, set per session by JIT state
— SCALE.md round 11), so a fast-mode-batch row would read a slow-mode
driver run as a 4-5x phantom breach. With the slow-mode row, a fast
driver run reads ~0.25x and a slow one ~1.3x; only a genuine
regression can trip the gate. Rationale + mode data in
tools/gen_baseline.py and SCALE.md.

Host-contention caveat (unchanged): identical runs vary 2-3x whole-run;
judge a regression by median-of-3+, never one run. Config: PySpark
4.1.2 local[32], shuffle.partitions=32, AQE on, Python-worker pool
pre-warmed, warmup pass at sf0.001, cache cleared between queries
(bench.py).

Aggregate: sum of per-query medians **{agg} s** over {n} queries.

| query | median sec |
|---|---|
"""

rows = "".join(f"| {n} | {medians[n]} |\n" for n in names)
with open("BASELINE.md", "w") as f:
    f.write(
        HEADER.replace("{n}", str(len(names)))
        .replace("{totals}", ", ".join(f"{t:.1f}" for t in totals))
        .replace("{agg}", str(agg))
        + rows
    )
print("wrote BASELINE.md:", len(names), "queries, aggregate", agg, "s")
print("totals:", totals)
