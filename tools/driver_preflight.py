"""Driver-style pre-flight: vanilla session, driver-like canonicalization.

Run from ANY cwd (it inserts the repo root itself):

    PF_N=50 python tools/driver_preflight.py      # this round's window
    PF_N=215 python tools/driver_preflight.py     # the full registry

Unlike tests/test_oracle_differential.py (which uses the repo's tuned
session and its own canonicalizer), this mimics the DRIVER harness: a
vanilla SparkSession with default configs, object columns stringified
before sorting, and the same row-count / schema / value comparison order.
Use it before each round to catch vanilla-session or canonicalizer
surprises the pytest differential can't see.

Mimics the driver's correctness gate: for each of the first N queries of
queries(), run the Spark DataFrame and the DuckDB oracle at sf0.01,
canonicalize (sort columns by name, sort rows, round-trip through pandas)
and compare row count, schema width, and values.
"""
import sys

sys.path.insert(0, "/root/repo")

import duckdb
import os
import pandas as pd

import __spark_entry__ as e
from pyspark.sql import SparkSession

N = int(os.environ.get("PF_N", "50"))
SF = os.environ.get("PF_SF", "/root/testdata/sf0.01")

spark = (
    SparkSession.builder.master("local[8]")
    .config("spark.sql.shuffle.partitions", "8")
    .getOrCreate()
)
spark.sparkContext.setLogLevel("ERROR")

def fresh_con():
    """A connection per query: a long-lived one accumulates buffer-pool
    memory across ~200 oracles until tiny allocations fail (the same
    lesson as tests/conftest.duck); registration is microseconds."""
    c = duckdb.connect()
    c.execute("SET memory_limit = '8GB'")
    for t in "region nation customer supplier part orders lineitem events documents embeddings".split():
        pq = os.path.join(SF, t + ".parquet")
        if os.path.exists(pq):
            c.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{pq}')")
    return c

qs = e.queries()
oracles = e.oracle_sql()


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
    return df.sort_values(list(df.columns)).reset_index(drop=True)


bad = []
names = list(qs)[:N]
for i, name in enumerate(names):
    try:
        sdf = qs[name](spark, SF).toPandas()
        if name not in oracles:
            print(f"{i:3d} {name}: NO-ORACLE rows={len(sdf)}")
            continue
        con = fresh_con()
        odf = con.execute(oracles[name]).df()
        con.close()
        a, b = canon(sdf), canon(odf)
        ok_rows = len(a) == len(b)
        ok_schema = list(a.columns) == list(b.columns)
        ok_vals = False
        if ok_rows and ok_schema:
            try:
                bb = b.copy()
                for c in a.columns:
                    bb[c] = bb[c].astype(a[c].dtype)
                ok_vals = a.equals(bb)
                if not ok_vals:
                    # float-tolerant retry
                    ok_vals = True
                    for c in a.columns:
                        if a[c].dtype.kind == "f":
                            if not ((a[c] - bb[c]).abs().fillna(0) < 1e-9).all() or not (a[c].isna() == bb[c].isna()).all():
                                ok_vals = False
                        elif not a[c].equals(bb[c]):
                            ok_vals = False
            except Exception as ex:
                ok_vals = False
        status = "OK" if (ok_rows and ok_schema and ok_vals) else "FAIL"
        if status == "FAIL":
            bad.append(name)
        print(f"{i:3d} {name}: {status} rows={len(a)}/{len(b)} schema={ok_schema}")
    except Exception as ex:
        bad.append(name)
        print(f"{i:3d} {name}: ERROR {type(ex).__name__}: {str(ex)[:200]}")

print("\nFAILED:", bad if bad else "none")
spark.stop()
