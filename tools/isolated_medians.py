"""Isolated per-query medians: ONE fresh session per query (subprocess),
codegen-warmed at sf0.001 for that query only, then N timed reps at the
target SF. The comparison partner for the in-suite medians in BENCH.json —
the round-10 VERDICT's "session inflation" question is exactly the gap
between these two numbers measured with matched protocols.

Usage: python tools/isolated_medians.py q1 q2 ...   (or default suspect set)
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

SUSPECTS = [
    "dedup_minhash_lsh",
    "bigram_logprob_score",
    "bloom_decontaminate_train_eval",
    "bitmap_audience_combination",
    "bitmap_distinct_users_by_type",
    "bm25_query_scores",
    "asof_last_click_before_purchase",
    "text_fingerprint",
]

CHILD = r"""
import json, sys, time
sys.path.insert(0, "/root/repo")
from kafka_streams_tcp_reconciliation_spark.plans import all_queries
from kafka_streams_tcp_reconciliation_spark.session import get_spark
name, sf_dir, reps = sys.argv[1], sys.argv[2], int(sys.argv[3])
spark = get_spark(app_name=f"iso-{name}")
spark.sparkContext.setLogLevel("ERROR")
fn = all_queries()[name]
spark.range(0, 64, 1, 64).mapInPandas(lambda b: b, schema="id long").count()
fn(spark, "/root/testdata/sf0.001").count()  # codegen warm
spark.catalog.clearCache()
runs = []
for _ in range(reps):
    t0 = time.perf_counter()
    fn(spark, sf_dir).count()
    runs.append(round(time.perf_counter() - t0, 3))
    spark.catalog.clearCache()
print(json.dumps({"name": name, "runs": sorted(runs)}))
spark.stop()
"""


def main() -> None:
    names = sys.argv[1:] or SUSPECTS
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    reps = int(os.environ.get("SPARK_GRAFT_ISO_REPS", "5"))
    out = {}
    for name in names:
        r = subprocess.run(
            [sys.executable, "-c", CHILD, name, sf_dir, str(reps)],
            capture_output=True, text=True,
        )
        line = [ln for ln in r.stdout.splitlines() if ln.startswith("{")]
        if not line:
            print(f"# {name}: FAILED\n{r.stderr[-500:]}", file=sys.stderr)
            continue
        d = json.loads(line[-1])
        med = d["runs"][len(d["runs"]) // 2]
        out[name] = {"median": med, "runs": d["runs"]}
        print(f"# {name}: median {med}s  runs {d['runs']}", file=sys.stderr)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
