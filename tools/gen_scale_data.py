"""Seeded synthetic data generator for scale validation (round-7 task 1).

Produces tables with the SAME physical schemas and value domains as the
driver's read-only fixtures at /root/testdata/sf* (profiled with pyarrow
this session — see SCALE.md's round-7 section for the measured domains),
one decade LARGER, so the repo's near-flat time-vs-SF claims can be
tested empirically at sf1.0 before a real cluster tests them at 100 TB.

NOT a byte-replica of the driver's seed-42 generator (that code is not
available); it clones the structural knobs that drive join/aggregate/
candidate cardinalities instead:

- fact-table fan-outs (lines per order ~ Poisson(4), FK domains scale
  with SF like the fixtures' do: 10x customers/suppliers/parts/users per
  decade, fixed region/nation),
- the documents word-soup: the fixtures' exact 31-word vocabulary,
  uniform 10-100 words/doc (the vocab size sets the shingle space and
  therefore MinHash/n-gram candidate collision rates — the quantity the
  scaling study must not distort), ~0.16% injected exact duplicates
  (sf0.1 has 8/5000),
- embeddings: iid unit-normalized 64-dim gaussians with an independent
  uniform 10-class label (the fixtures' per-label centroid norms match
  the random-baseline 1/sqrt(n), i.e. labels carry no signal),
- events: uniform types over 5, value ~ Exponential(50), 30-day span,
  users = events/66.7.

Usage: python tools/gen_scale_data.py <out_dir> [sf] [seed]
"""

from __future__ import annotations

import os
import sys

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

VOCAB = [
    "a", "agg", "batch", "big", "column", "customer", "data", "dup",
    "fast", "filter", "group", "hash", "join", "key", "line", "merge",
    "order", "part", "query", "row", "scan", "slow", "small", "sort",
    "spark", "stream", "table", "the", "value", "vector", "window",
]
LANGS = ["en", "zh", "es", "fr", "de"]
LANG_P = [0.40, 0.15, 0.15, 0.15, 0.15]
SEGMENTS = ["AUTOMOBILE", "BUILDING", "FURNITURE", "HOUSEHOLD", "MACHINERY"]
PRIORITIES = ["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"]
PTYPES = ["ECONOMY", "LARGE", "MEDIUM", "PROMO", "SMALL", "STANDARD"]
ADJ = ["blue", "cold", "hot", "large", "new", "old", "red", "small"]
NOUN = ["anvil", "bolt", "gear", "gizmo", "plate", "ring", "rod", "widget"]
REGIONS = ["AFRICA", "AMERICA", "ASIA", "EUROPE", "MIDDLE EAST"]

DAY_US = 24 * 3600 * 1_000_000
ORDER_EPOCH_US = np.datetime64("1995-01-01", "us").astype(np.int64)
ORDER_SPAN_DAYS = 2404  # 1995-01-01 .. 2001-08-01 inclusive-ish
EVENT_EPOCH_US = np.datetime64("2024-01-01", "us").astype(np.int64)
EVENT_SPAN_US = 30 * DAY_US


def sizes(sf: float) -> dict[str, int]:
    """Row counts per table, extrapolating the fixtures' per-decade
    scaling (customer 150/1.5k/15k, lineitem 6k/60k/600k, events
    1k/10k/100k, documents 500/500/5000, embeddings 500/500/2000)."""
    k = sf / 0.1  # relative to the largest driver fixture
    return {
        "region": 5,
        "nation": 25,
        "supplier": int(1000 * k),
        "customer": int(15_000 * k),
        "part": int(20_000 * k),
        "orders": int(150_000 * k),
        "events": int(100_000 * k),
        "documents": int(5_000 * k),
        "embeddings": int(2_000 * k),
    }


def _ts_us(col: np.ndarray) -> pa.Array:
    return pa.array(col, type=pa.timestamp("us"))


def generate(
    out_dir: str,
    sf: float = 1.0,
    seed: int = 101,
    only: set[str] | None = None,
) -> None:
    """Write the tables (all by default; ``only`` restricts to a subset —
    note the single RNG stream means a subset run draws DIFFERENT values
    than the same table inside a full run, so never mix subset- and
    full-generated files inside one fixture directory)."""
    rng = np.random.default_rng(seed)
    n = sizes(sf)
    os.makedirs(out_dir, exist_ok=True)

    def want(name: str) -> bool:
        return only is None or name in only

    def write(name: str, table: pa.Table) -> None:
        # Bounded row groups: pyarrow's 1Mi-row default makes a large
        # single file effectively 1-2-way parallel in Spark (a scan task
        # only processes row groups whose midpoint lands in its byte
        # range) — the round-8 sf30 straggler finding. 100k rows/group
        # keeps groups in the real-world 5-15 MB band for these tables.
        pq.write_table(
            table, os.path.join(out_dir, f"{name}.parquet"),
            row_group_size=100_000,
        )
        print(f"  {name}: {table.num_rows} rows", file=sys.stderr)

    if want("region"):
        write("region", pa.table({
            "r_regionkey": pa.array(range(5), type=pa.int32()),
            "r_name": REGIONS,
        }))
    if want("nation"):
        write("nation", pa.table({
            "n_nationkey": pa.array(range(25), type=pa.int32()),
            "n_name": [f"NATION_{i}" for i in range(25)],
            "n_regionkey": pa.array([i % 5 for i in range(25)], type=pa.int32()),
        }))

    ns = n["supplier"]
    if want("supplier"):
        write("supplier", pa.table({
            "s_suppkey": pa.array(range(ns), type=pa.int64()),
            "s_name": [f"Supplier#{i:09d}" for i in range(ns)],
            "s_nationkey": pa.array(rng.integers(0, 25, ns), type=pa.int32()),
            "s_acctbal": np.round(rng.uniform(-1000, 10000, ns), 2),
        }))

    nc = n["customer"]
    if want("customer"):
        write("customer", pa.table({
            "c_custkey": pa.array(range(nc), type=pa.int64()),
            "c_name": [f"Customer#{i:09d}" for i in range(nc)],
            "c_nationkey": pa.array(rng.integers(0, 25, nc), type=pa.int32()),
            "c_acctbal": np.round(rng.uniform(-1000, 10000, nc), 2),
            "c_mktsegment": np.array(SEGMENTS)[rng.integers(0, 5, nc)],
        }))

    npart = n["part"]
    if want("part"):
        adj = np.array(ADJ)[rng.integers(0, len(ADJ), npart)]
        noun = np.array(NOUN)[rng.integers(0, len(NOUN), npart)]
        write("part", pa.table({
            "p_partkey": pa.array(range(npart), type=pa.int64()),
            "p_name": [f"{a} {b}" for a, b in zip(adj, noun)],
            "p_brand": [f"Brand#{i}" for i in rng.integers(1, 26, npart)],
            "p_type": np.array(PTYPES)[rng.integers(0, len(PTYPES), npart)],
            "p_size": pa.array(rng.integers(1, 51, npart), type=pa.int32()),
            "p_retailprice": np.round(900.0 + rng.integers(0, 1000, npart) / 10.0, 1),
        }))

    no = n["orders"]
    if want("orders") or want("lineitem"):
        odate_us = ORDER_EPOCH_US + rng.integers(0, ORDER_SPAN_DAYS, no) * DAY_US
    if want("orders"):
        write("orders", pa.table({
            "o_orderkey": pa.array(range(no), type=pa.int64()),
            "o_custkey": pa.array(rng.integers(0, nc, no), type=pa.int64()),
            "o_orderstatus": np.array(["F", "O", "P"])[rng.integers(0, 3, no)],
            "o_totalprice": np.round(rng.uniform(1000, 500_000, no), 2),
            "o_orderdate": _ts_us(odate_us),
            "o_orderpriority": np.array(PRIORITIES)[rng.integers(0, 5, no)],
        }))

    if want("lineitem"):
        lines_per_order = rng.poisson(4.0, no)
        okeys = np.repeat(np.arange(no, dtype=np.int64), lines_per_order)
        nl = len(okeys)
        ship_us = (
            np.repeat(odate_us, lines_per_order)
            + rng.integers(1, 96, nl) * DAY_US
        )
        write("lineitem", pa.table({
            "l_orderkey": pa.array(okeys, type=pa.int64()),
            "l_partkey": pa.array(rng.integers(0, npart, nl), type=pa.int64()),
            "l_suppkey": pa.array(rng.integers(0, ns, nl), type=pa.int64()),
            "l_linenumber": pa.array(rng.integers(1, 8, nl), type=pa.int32()),
            "l_quantity": rng.integers(1, 51, nl).astype(np.float64),
            "l_extendedprice": np.round(rng.uniform(900, 105_000, nl), 2),
            "l_discount": rng.integers(0, 11, nl) / 100.0,
            "l_tax": rng.integers(0, 9, nl) / 100.0,
            "l_returnflag": np.array(["A", "N", "R"])[rng.integers(0, 3, nl)],
            "l_linestatus": np.array(["F", "O"])[rng.integers(0, 2, nl)],
            "l_shipdate": _ts_us(ship_us),
        }))

    if want("events"):
        ne = n["events"]
        nusers = max(15, ne // 67)
        ets = np.sort(EVENT_EPOCH_US + rng.integers(0, EVENT_SPAN_US, ne))
        types = np.array(["click", "error", "purchase", "signup", "view"])
        kvals = rng.integers(0, 100, ne)
        write("events", pa.table({
            "event_id": pa.array(range(ne), type=pa.int64()),
            "ts": _ts_us(ets),
            "user_id": pa.array(rng.integers(0, nusers, ne), type=pa.int64()),
            "event_type": types[rng.integers(0, 5, ne)],
            "value": np.round(rng.exponential(50.0, ne), 6),
            "props": [f'{{"k": {k}}}' for k in kvals],
        }))

    if want("documents"):
        nd = n["documents"]
        vocab = np.array(VOCAB)
        lens = rng.integers(10, 101, nd)
        texts = [
            " ".join(vocab[rng.integers(0, len(vocab), ln)]) for ln in lens
        ]
        # ~0.16% exact duplicates (sf0.1 shows 8/5000): copy an earlier doc
        for i in rng.choice(np.arange(1, nd), size=max(1, nd * 16 // 10_000),
                            replace=False):
            texts[i] = texts[int(rng.integers(0, i))]
        write("documents", pa.table({
            "doc_id": pa.array(range(nd), type=pa.int64()),
            "text": texts,
            "lang": np.array(LANGS)[rng.choice(5, nd, p=LANG_P)],
            "source": [f"src{i}" for i in rng.integers(0, 20, nd)],
            "n_chars": pa.array([len(t) for t in texts], type=pa.int64()),
        }))

    if want("embeddings"):
        nv = n["embeddings"]
        V = rng.standard_normal((nv, 64))
        V /= np.linalg.norm(V, axis=1, keepdims=True)
        write("embeddings", pa.table({
            "vec_id": pa.array(range(nv), type=pa.int64()),
            "embedding": pa.array(
                [row.astype(np.float32) for row in V],
                type=pa.list_(pa.float32()),
            ),
            "label": pa.array(rng.integers(0, 10, nv), type=pa.int32()),
        }))


if __name__ == "__main__":
    out = sys.argv[1] if len(sys.argv) > 1 else "/root/repo/testdata_sf1/sf1.0"
    sf = float(sys.argv[2]) if len(sys.argv) > 2 else 1.0
    seed = int(sys.argv[3]) if len(sys.argv) > 3 else 101
    only = set(sys.argv[4].split(",")) if len(sys.argv) > 4 else None
    print(f"generating sf={sf} seed={seed} only={only} -> {out}", file=sys.stderr)
    generate(out, sf, seed, only)
