"""Runnable data-governance report demo.

The trust layer a pipeline runs before (and after) the heavy operators:
contract audit, column profile, distribution shape, robust outliers, and
the sequence views — each stage a registered operator, so each is
independently DuckDB-checked:

    contract audit            (dq_audit_contracts — 3 scans, 13 checks)
      → column profile        (profile_orders_columns — 1 scan, 4 columns)
      → distribution shape    (histogram_order_totals / decile_binning_prices)
      → robust outliers       (events_mad_outliers — median/MAD)
      → engagement + journeys (rolling_active_users_24h, session_event_paths)

    python examples/governance_report.py [sf_dir]

Every stage is pure DataFrame algebra — the same code runs on a 1000-
executor cluster; only partition counts change.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from kafka_streams_tcp_reconciliation_spark.plans import all_queries
from kafka_streams_tcp_reconciliation_spark.session import get_spark


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    spark = get_spark(app_name="governance-report-demo")
    spark.sparkContext.setLogLevel("ERROR")
    q = all_queries()

    print("== contract audit ==")
    audit = q["dq_audit_contracts"](spark, sf_dir)
    audit.orderBy("check_name").show(20, truncate=False)
    violations = {
        r.check_name: r.n
        for r in audit.collect()
        if not r.check_name.endswith("_rows") and r.n > 0
    }
    print(f"checks with violations: {violations or 'none'}")

    print("== column profile (orders) ==")
    q["profile_orders_columns"](spark, sf_dir).show(truncate=False)

    print("== price distribution: equi-width vs equi-depth ==")
    q["histogram_order_totals"](spark, sf_dir).orderBy("bucket_lo").show(20)
    q["decile_binning_prices"](spark, sf_dir).orderBy("decile").show()

    print("== robust (median/MAD) outliers ==")
    mad = q["events_mad_outliers"](spark, sf_dir)
    print(f"flagged events: {mad.count()}")
    mad.orderBy("robust_z").show(5)

    print("== trailing-24h active users (tail) ==")
    q["rolling_active_users_24h"](spark, sf_dir).orderBy(
        "window_start", ascending=False
    ).show(5)

    print("== top session journeys ==")
    q["session_event_paths"](spark, sf_dir).orderBy(
        "n_sessions", ascending=False
    ).show(10, truncate=False)

    spark.stop()


if __name__ == "__main__":
    main()
