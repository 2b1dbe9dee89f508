"""Parquet table catalog for the driver's test data (TESTDATA.md).

Explicit schemas serve two purposes:

1. **Timestamp semantics.** All timestamps in the test data are wall-clock
   values with no timezone. Reading them as ``TIMESTAMP_NTZ`` makes every
   downstream date function (``date_trunc``, ``year`` …) timezone-independent
   — identical results regardless of the driver session's timezone, and
   identical to the DuckDB oracle, which treats parquet timestamps as naive
   TIMESTAMP. (``events.ts`` is µs-precision (``timestamp[us]``) in the
   current testdata at every scale factor — verified with pyarrow — and is
   read directly as ``TIMESTAMP_NTZ``. ``load_table`` probes the physical
   type per-file so ns-typed data, should it ever appear, is still handled
   via the legacy nanos→µs truncation path rather than silently misread.)
2. **Column pruning is still fully effective** — schemas list the physical
   columns; Catalyst prunes to whatever each query selects (check
   ``ReadSchema`` in ``.explain``).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

TABLE_NAMES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

# Dimension tables small enough that joins against them should always be
# broadcast hash joins, at any scale factor (they grow sub-linearly or not
# at all in TPC-H-style scaling).
BROADCAST_TABLES = frozenset({"region", "nation", "supplier", "part", "customer"})

_SCHEMAS: dict[str, T.StructType] = {
    "region": T.StructType(
        [
            T.StructField("r_regionkey", T.IntegerType()),
            T.StructField("r_name", T.StringType()),
        ]
    ),
    "nation": T.StructType(
        [
            T.StructField("n_nationkey", T.IntegerType()),
            T.StructField("n_name", T.StringType()),
            T.StructField("n_regionkey", T.IntegerType()),
        ]
    ),
    "customer": T.StructType(
        [
            T.StructField("c_custkey", T.LongType()),
            T.StructField("c_name", T.StringType()),
            T.StructField("c_nationkey", T.IntegerType()),
            T.StructField("c_acctbal", T.DoubleType()),
            T.StructField("c_mktsegment", T.StringType()),
        ]
    ),
    "supplier": T.StructType(
        [
            T.StructField("s_suppkey", T.LongType()),
            T.StructField("s_name", T.StringType()),
            T.StructField("s_nationkey", T.IntegerType()),
            T.StructField("s_acctbal", T.DoubleType()),
        ]
    ),
    "part": T.StructType(
        [
            T.StructField("p_partkey", T.LongType()),
            T.StructField("p_name", T.StringType()),
            T.StructField("p_brand", T.StringType()),
            T.StructField("p_type", T.StringType()),
            T.StructField("p_size", T.IntegerType()),
            T.StructField("p_retailprice", T.DoubleType()),
        ]
    ),
    "orders": T.StructType(
        [
            T.StructField("o_orderkey", T.LongType()),
            T.StructField("o_custkey", T.LongType()),
            T.StructField("o_orderstatus", T.StringType()),
            T.StructField("o_totalprice", T.DoubleType()),
            T.StructField("o_orderdate", T.TimestampNTZType()),
            T.StructField("o_orderpriority", T.StringType()),
        ]
    ),
    "lineitem": T.StructType(
        [
            T.StructField("l_orderkey", T.LongType()),
            T.StructField("l_partkey", T.LongType()),
            T.StructField("l_suppkey", T.LongType()),
            T.StructField("l_linenumber", T.IntegerType()),
            T.StructField("l_quantity", T.DoubleType()),
            T.StructField("l_extendedprice", T.DoubleType()),
            T.StructField("l_discount", T.DoubleType()),
            T.StructField("l_tax", T.DoubleType()),
            T.StructField("l_returnflag", T.StringType()),
            T.StructField("l_linestatus", T.StringType()),
            T.StructField("l_shipdate", T.TimestampNTZType()),
        ]
    ),
    "events": T.StructType(
        [
            T.StructField("event_id", T.LongType()),
            T.StructField("ts", T.TimestampNTZType()),
            T.StructField("user_id", T.LongType()),
            T.StructField("event_type", T.StringType()),
            T.StructField("value", T.DoubleType()),
            T.StructField("props", T.StringType()),
        ]
    ),
    "documents": T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("text", T.StringType()),
            T.StructField("lang", T.StringType()),
            T.StructField("source", T.StringType()),
            T.StructField("n_chars", T.LongType()),
        ]
    ),
    "embeddings": T.StructType(
        [
            T.StructField("vec_id", T.LongType()),
            T.StructField("embedding", T.ArrayType(T.FloatType())),
            T.StructField("label", T.IntegerType()),
        ]
    ),
}


def schema_for(name: str) -> T.StructType:
    return _SCHEMAS[name]


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load one test table as a DataFrame with its canonical schema.

    All timestamp columns surface as ``TIMESTAMP_NTZ`` (wall-clock, timezone
    independent) so every query result is identical under any session
    timezone and matches the DuckDB oracle's naive TIMESTAMP semantics.
    """
    if name not in _SCHEMAS:
        raise KeyError(f"unknown table {name!r}; known: {TABLE_NAMES}")
    path = os.path.join(sf_dir, f"{name}.parquet")
    if name == "events" and _events_ts_is_nanos(path):
        # Legacy path: ns-typed files need nanosAsLong (Spark's parquet reader
        # rejects TIMESTAMP(NANOS) otherwise); truncate ns→µs like DuckDB does
        # when it reads the same file as TIMESTAMP. The current testdata is
        # timestamp[us] at every SF, so this branch is normally dead — kept so
        # a testdata regeneration back to ns cannot silently misread (the
        # class of bug that broke round 1, in both directions).
        ns_schema = T.StructType(
            [
                f if f.name != "ts" else T.StructField("ts", T.LongType())
                for f in _SCHEMAS[name].fields
            ]
        )
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        raw = spark.read.schema(ns_schema).parquet(path)
        return raw.select(
            "event_id",
            F.expr(
                "timestampadd(MICROSECOND, ts div 1000,"
                " TIMESTAMP_NTZ '1970-01-01 00:00:00')"
            ).alias("ts"),
            "user_id",
            "event_type",
            "value",
            "props",
        )
    return spark.read.schema(_SCHEMAS[name]).parquet(path)


_TS_PROBE_CACHE: dict[str, bool] = {}


def _events_ts_is_nanos(path: str) -> bool:
    """Probe the physical parquet type of ``events.ts`` (footer-only read).

    Never assume the timestamp unit — derive it from the file. A wrong
    assumption here compresses/stretches every event time 1000× and corrupts
    every absolute-time query downstream. Memoized per path: the probe is
    a per-query fixed cost otherwise (hundreds of queries × a pyarrow
    footer read), and a testdata file's physical type never changes within
    a process lifetime.
    """
    if path in _TS_PROBE_CACHE:
        return _TS_PROBE_CACHE[path]
    probed = _probe_ts_is_nanos(path)
    if probed is None:
        # Probe failed (file not generated yet, transient pyarrow hiccup):
        # treat as µs for THIS load only — do NOT memoize, or a transient
        # failure would poison the process and read a later ns-typed file
        # as µs (the 1000× corruption the docstring above warns about).
        return False
    _TS_PROBE_CACHE[path] = probed
    return probed


def _probe_ts_is_nanos(path: str) -> "bool | None":
    """True/False when the footer was actually read; None when unknown."""
    try:
        import pyarrow.parquet as pq

        target = path
        if os.path.isdir(path):
            parts = [
                os.path.join(path, f)
                for f in sorted(os.listdir(path))
                if f.endswith(".parquet")
            ]
            if not parts:
                return None
            target = parts[0]
        field = pq.read_schema(target).field("ts")
        return str(field.type) == "timestamp[ns]"
    except Exception:
        return None


def load_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    """Load all test tables. DataFrames are lazy — no I/O happens here."""
    return {name: load_table(spark, sf_dir, name) for name in TABLE_NAMES}


def scale_out(df: DataFrame) -> DataFrame:
    """Spread a scan across the session's full parallelism when the file
    layout under-partitions it.

    Small local parquet files arrive as one input split, which serializes
    every CPU-heavy per-row operator (signature folds, pandas kernels) on
    a single core. On a real cluster a 100 TB table has thousands of
    splits and this is a no-op; locally the round-robin repartition costs
    one tiny shuffle and buys full-width compute. Only widens — never
    collapses existing parallelism.
    """
    target = df.sparkSession.sparkContext.defaultParallelism
    # File listing is a cheap catalog call; the old df.rdd.getNumPartitions()
    # probe forced a full plan→RDD conversion through Py4J per call — a
    # measurable per-query fixed cost across a 200+-query bench run. But the
    # file COUNT is only a trustworthy *upper bound on splits* for
    # SMALL-FILE layouts below target: Spark bin-packs small files into
    # splits (openCostInBytes/maxPartitionBytes), yet a single file LARGER
    # than maxPartitionBytes scans as ceil(size/maxPartitionBytes) splits,
    # so a 1-file table can already be at full parallelism. Local file://
    # paths are free to stat, so the shortcut only applies when every file
    # is provably sub-split-size; multi-split-sized files, non-local URIs,
    # and a [] listing (non-file-backed plan — "unknown", not "zero") all
    # fall back to the accurate (rare, so amortized) RDD probe.
    try:
        files = df.inputFiles()
    except Exception:
        files = []
    n_splits = None
    if 0 < len(files) < target:
        try:
            max_bytes = _conf_bytes(
                df.sparkSession.conf.get(
                    "spark.sql.files.maxPartitionBytes", "134217728b"
                )
            )
            if all(
                os.path.getsize(_local_path(f)) < max_bytes for f in files
            ):
                n_splits = len(files)
        except (OSError, ValueError):
            pass  # non-local URI or unparsable conf -> RDD probe
    if n_splits is None:
        n_splits = df.rdd.getNumPartitions()
    # Byte-range splits OVER-count the usable parallelism of a parquet
    # scan: a split only processes row groups whose midpoint lands in its
    # byte range, so a large file with few row groups (pyarrow's default
    # is 1Mi rows per group) yields mostly-empty tasks plus stragglers.
    # Measured round 8 on a 176 MB single-file, 2-row-group documents
    # table: the RDD probe reported 32 splits (≥ target, so no widening)
    # while only 2 tasks carried data — 2-core shingling for 23+ min vs
    # ~1 min at full width. For small LOCAL parquet listings the footer
    # row-group count is the true upper bound (same cheap footer read as
    # load_table's timestamp-unit probe); non-parquet or non-local
    # listings skip the bound unchanged.
    if n_splits >= target and 0 < len(files) <= 64 and all(
        f.endswith(".parquet") for f in files
    ):
        try:
            n_splits = min(n_splits, sum(_num_row_groups(f) for f in files))
        except (OSError, ValueError, ImportError):
            pass  # non-local URI etc. — keep the probe's answer
    if n_splits < target:
        return df.repartition(target)
    return df


# Memoized footer row-group counts, keyed on (path, mtime, size) so an
# in-place regeneration of a fixture file within one session invalidates
# naturally — a stale count would silently mis-size the scan-widening
# repartition. Mirrors _TS_PROBE_CACHE: a 200+-query bench run pays each
# footer read once, not per query; the stat() per call is noise.
_RG_PROBE_CACHE: dict[tuple[str, float, int], int] = {}


def _num_row_groups(uri: str) -> int:
    """Memoized parquet footer row-group count for a local file URI."""
    import os

    path = _local_path(uri)
    st = os.stat(path)
    key = (path, st.st_mtime, st.st_size)
    if key not in _RG_PROBE_CACHE:
        import pyarrow.parquet as _pq

        _RG_PROBE_CACHE[key] = _pq.ParquetFile(path).metadata.num_row_groups
    return _RG_PROBE_CACHE[key]


def _local_path(uri: str) -> str:
    """file:// URI -> local path; raises ValueError for non-local URIs."""
    from urllib.parse import unquote, urlparse

    parsed = urlparse(uri)
    if parsed.scheme not in ("file", ""):
        raise ValueError(f"non-local input file: {uri}")
    return unquote(parsed.path)


def _conf_bytes(v: str) -> int:
    """Parse a Spark byte-size conf value ('128m', '134217728b', ...)."""
    s = v.strip().lower()
    for suf, mult in (
        ("tb", 1024**4),
        ("gb", 1024**3),
        ("mb", 1024**2),
        ("kb", 1024),
        ("t", 1024**4),
        ("g", 1024**3),
        ("m", 1024**2),
        ("k", 1024),
        ("b", 1),
    ):
        if s.endswith(suf):
            return int(s[: -len(suf)]) * mult
    return int(s)
