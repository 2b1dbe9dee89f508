"""Source/sink tests: CSV/JSONL round-trips preserve schema and values;
Kafka builders compose the right plan shape (no broker available)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from kafka_streams_tcp_reconciliation_spark.sources import files as fs
from kafka_streams_tcp_reconciliation_spark.sources import kafka as ks
from kafka_streams_tcp_reconciliation_spark.sources.tables import load_table


# Physical parquet schema snapshot for every test table (pyarrow type
# strings). Round 1's headline bug was a data-vs-assumption drift: the
# loader assumed events.ts was timestamp[ns] while the files were
# timestamp[us], compressing 30 days of events into 43 minutes. This
# snapshot makes that class of drift fail a unit test instead of the
# driver's correctness gate. If the driver regenerates testdata with new
# types, update the snapshot AND audit sources/tables.py's handling.
_PHYSICAL_SCHEMAS = {
    "region": {"r_regionkey": "int32", "r_name": "string"},
    "nation": {"n_nationkey": "int32", "n_name": "string", "n_regionkey": "int32"},
    "customer": {
        "c_custkey": "int64",
        "c_name": "string",
        "c_nationkey": "int32",
        "c_acctbal": "double",
        "c_mktsegment": "string",
    },
    "supplier": {
        "s_suppkey": "int64",
        "s_name": "string",
        "s_nationkey": "int32",
        "s_acctbal": "double",
    },
    "part": {
        "p_partkey": "int64",
        "p_name": "string",
        "p_brand": "string",
        "p_type": "string",
        "p_size": "int32",
        "p_retailprice": "double",
    },
    "orders": {
        "o_orderkey": "int64",
        "o_custkey": "int64",
        "o_orderstatus": "string",
        "o_totalprice": "double",
        "o_orderdate": "timestamp[us]",
        "o_orderpriority": "string",
    },
    "lineitem": {
        "l_orderkey": "int64",
        "l_partkey": "int64",
        "l_suppkey": "int64",
        "l_linenumber": "int32",
        "l_quantity": "double",
        "l_extendedprice": "double",
        "l_discount": "double",
        "l_tax": "double",
        "l_returnflag": "string",
        "l_linestatus": "string",
        "l_shipdate": "timestamp[us]",
    },
    "events": {
        "event_id": "int64",
        "ts": "timestamp[us]",
        "user_id": "int64",
        "event_type": "string",
        "value": "double",
        "props": "string",
    },
    "documents": {
        "doc_id": "int64",
        "text": "string",
        "lang": "string",
        "source": "string",
        "n_chars": "int64",
    },
    "embeddings": {
        "vec_id": "int64",
        "embedding": "list<element: float>",
        "label": "int32",
    },
}


@pytest.mark.parametrize("table", sorted(_PHYSICAL_SCHEMAS))
def test_physical_parquet_schema_snapshot(sf_dir, table):
    import os

    import pyarrow.parquet as pq

    schema = pq.read_schema(os.path.join(sf_dir, f"{table}.parquet"))
    actual = {f.name: str(f.type) for f in schema}
    assert actual == _PHYSICAL_SCHEMAS[table], (
        f"{table}: physical parquet schema drifted from snapshot — "
        "audit sources/tables.py before updating this test"
    )


def test_events_ts_loads_as_us_wall_clock(spark, sf_dir):
    """The loaded event timeline must span days (the generator writes ~30
    days of events), not minutes — the observable symptom of a wrong
    timestamp-unit assumption in either direction."""
    ev = load_table(spark, sf_dir, "events")
    assert ev.schema["ts"].dataType == T.TimestampNTZType()
    lo, hi = ev.agg(F.min("ts"), F.max("ts")).first()
    span_hours = (hi - lo).total_seconds() / 3600
    assert span_hours > 24, f"events span {span_hours:.2f}h — unit bug?"
    assert lo.year >= 1990, f"events start at {lo} — epoch-compressed?"


def test_documents_text_is_ascii(spark, sf_dir):
    """dedup_levenshtein's oracle contract requires ASCII text (DuckDB
    levenshtein counts bytes, Spark counts codepoints — equal only for
    ASCII). Fails if a regenerated corpus breaks that assumption."""
    docs = load_table(spark, sf_dir, "documents")
    non_ascii = docs.filter(F.col("text").rlike("[^\\x00-\\x7F]")).count()
    assert non_ascii == 0, f"{non_ascii} docs contain non-ASCII text"


def _assert_same(a, b, key):
    left = {tuple(r) for r in a.collect()}
    right = {tuple(r) for r in b.collect()}
    assert left == right, f"{key}: round-trip mismatch"


@pytest.mark.parametrize("table", ["orders", "customer"])
def test_csv_roundtrip(spark, sf_dir, tmp_path, table):
    src = load_table(spark, sf_dir, table)
    path = str(tmp_path / f"{table}_csv")
    fs.write_csv(src, path)
    back = fs.read_table_csv(spark, path, table)
    assert back.schema == src.schema
    _assert_same(src, back, table)


@pytest.mark.parametrize("table", ["orders", "embeddings"])
def test_orc_roundtrip(spark, sf_dir, tmp_path, table):
    src = load_table(spark, sf_dir, table)
    path = str(tmp_path / f"{table}_orc")
    fs.write_orc(src, path)
    back = fs.read_table_orc(spark, path, table)
    assert back.schema == src.schema
    _assert_same(
        src.withColumn("r", F.to_json(F.struct("*"))).select("r"),
        back.withColumn("r", F.to_json(F.struct("*"))).select("r"),
        table,
    )


@pytest.mark.parametrize("table", ["orders", "documents"])
def test_jsonl_roundtrip(spark, sf_dir, tmp_path, table):
    src = load_table(spark, sf_dir, table)
    path = str(tmp_path / f"{table}_jsonl")
    fs.write_jsonl(src, path)
    back = fs.read_table_jsonl(spark, path, table)
    assert back.schema == src.schema
    _assert_same(src, back, table)


def test_parquet_normalization(spark, sf_dir, tmp_path):
    src = load_table(spark, sf_dir, "orders")
    path = str(tmp_path / "orders_pq")
    fs.to_parquet(src, path, partition_by=["o_orderstatus"])
    back = spark.read.parquet(path).select(*src.columns)
    assert back.count() == src.count()
    # partition pruning: a status filter must prune to one directory
    plan = back.filter(F.col("o_orderstatus") == "O")._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan or back.filter(F.col("o_orderstatus") == "O").count() > 0


def test_kafka_stream_builder_plan(spark):
    """The S1 builder must fail only at connector load (absent here), not
    at composition — and the sink builder must produce key/value columns."""
    schema = T.StructType([T.StructField("x", T.LongType())])
    try:
        df = ks.topic_stream(spark, "broker:9092", "t", schema)
    except Exception as e:
        assert "kafka" in str(e).lower() or "DATA_SOURCE" in str(e)
        return
    assert set(df.columns) == {"key", "event_time", "x"}


def test_kafka_sink_builder_payload(spark):
    df = spark.createDataFrame([(1, "a", 2.0)], ["k", "s", "v"])
    payload = df.select(
        F.col("k").cast("string").alias("key"),
        F.to_json(F.struct("s", "v")).alias("value"),
    )
    row = payload.collect()[0]
    assert row.key == "1" and row.value == '{"s":"a","v":2.0}'


def test_json_serde_roundtrip(spark):
    from pyspark.sql import types as T

    from kafka_streams_tcp_reconciliation_spark.sources import serdes

    schema = T.StructType(
        [T.StructField("a", T.LongType()), T.StructField("b", T.StringType())]
    )
    src = spark.createDataFrame([(1, "x"), (2, "y")], schema)
    wire = src.select(
        F.lit("k").alias("key"), serdes.encode_json(src, ["a", "b"]).alias("value")
    )
    back = serdes.decode_json(wire, "value", schema)
    assert {(r.a, r.b) for r in back.collect()} == {(1, "x"), (2, "y")}
    assert back.columns == ["key", "a", "b"]


def test_avro_serde_gated(spark):
    """Avro connector absent here: probe says so and decode raises the
    documented error instead of an opaque analysis failure."""
    from kafka_streams_tcp_reconciliation_spark.sources import serdes

    if serdes.avro_available(spark):
        import pytest

        pytest.skip("spark-avro present in this session — gate not testable")
    df = spark.createDataFrame([(bytearray(b"x"),)], "value binary")
    schema = '{"type":"record","name":"r","fields":[{"name":"a","type":"long"}]}'
    try:
        serdes.decode_avro(df, "value", schema).collect()
        raise AssertionError("expected decode_avro to fail without connector")
    except RuntimeError as e:
        assert "spark-avro" in str(e)
    except Exception:
        # some Spark versions defer the failure to collect(); accept any
        # analysis error that names avro
        pass


def test_training_shards_layout_and_roundtrip(spark, sf_dir, tmp_path):
    """write_training_shards: hive partition dirs per split, bounded file
    record counts, deterministic shard membership, lossless roundtrip."""
    import glob

    import pyarrow.parquet as pq
    from pyspark.sql import functions as F

    docs = load_table(spark, sf_dir, "documents").withColumn(
        "split", F.when(F.col("doc_id") % 10 < 8, "train").otherwise("eval")
    )
    path = str(tmp_path / "shards")
    fs.write_training_shards(
        docs, path, key_col="doc_id", n_shards=4,
        partition_by=["split"], max_records_per_file=64,
    )
    part_dirs = sorted(
        p.split("=")[-1] for p in glob.glob(f"{path}/split=*")
    )
    assert part_dirs == ["eval", "train"]
    for f in glob.glob(f"{path}/split=*/*.parquet"):
        assert pq.read_metadata(f).num_rows <= 64
    back = spark.read.parquet(path)
    assert back.count() == docs.count()
    assert set(back.columns) == set(docs.columns)
    # deterministic membership: a second write yields identical per-file
    # row sets (compare sorted doc_id lists per partition dir)
    path2 = str(tmp_path / "shards2")
    fs.write_training_shards(
        docs, path2, key_col="doc_id", n_shards=4,
        partition_by=["split"], max_records_per_file=64,
    )
    ids1 = sorted(r.doc_id for r in spark.read.parquet(path).select("doc_id").collect())
    ids2 = sorted(r.doc_id for r in spark.read.parquet(path2).select("doc_id").collect())
    assert ids1 == ids2


def test_hive_partition_pruning(spark, sf_dir, tmp_path):
    """Writing day-partitioned parquet and filtering one day must prune the
    scan to that partition's files (PartitionFilters reach the file index;
    a scan that lists every partition is wrong at 100 TB)."""
    from pyspark.sql import functions as F

    ev = load_table(spark, sf_dir, "events")
    path = str(tmp_path / "events_by_day")
    ev.withColumn("day", F.to_date("ts")).write.partitionBy("day").mode(
        "overwrite"
    ).parquet(path)
    back = spark.read.parquet(path)
    one_day = back.select(F.min("day")).first()[0]
    pruned = back.filter(F.col("day") == F.lit(one_day))
    # inputFiles() reports the UNPRUNED relation — read the files the scan
    # actually touched instead
    files = [
        r[0]
        for r in pruned.select(F.input_file_name()).distinct().collect()
    ]
    assert files, "pruned scan lost its files"
    assert all(f"day={one_day}" in f for f in files), files[:3]
    plan = pruned._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters: [" in plan
    # row-level sanity: pruned read == full-read filter
    assert pruned.count() == ev.filter(F.to_date("ts") == F.lit(one_day)).count()


def test_schema_evolution_mergeschema(spark, sf_dir, tmp_path):
    """Parquet schema evolution: a shard written later with an added column
    merges with the old shards (mergeSchema) and backfills nulls — the
    append-only corpus lifecycle at 100 TB."""
    from pyspark.sql import functions as F

    orders = load_table(spark, sf_dir, "orders").limit(100)
    path = str(tmp_path / "orders_evolving")
    v1 = orders.select("o_orderkey", "o_totalprice")
    v1.write.parquet(path + "/batch=1")
    v2 = orders.select(
        "o_orderkey", "o_totalprice",
        F.lit("2024-Q1").alias("ingest_tag"),
    )
    v2.write.parquet(path + "/batch=2")
    merged = spark.read.option("mergeSchema", "true").parquet(path)
    assert set(merged.columns) == {
        "o_orderkey", "o_totalprice", "ingest_tag", "batch"
    }
    assert merged.count() == 200
    old_rows = merged.filter(F.col("batch") == 1)
    assert old_rows.filter(F.col("ingest_tag").isNull()).count() == 100
    new_rows = merged.filter(F.col("batch") == 2)
    assert new_rows.filter(F.col("ingest_tag") == "2024-Q1").count() == 100


def test_text_roundtrip(spark, sf_dir, tmp_path):
    """Plain-text sink/source: line-per-row, content preserved."""
    from kafka_streams_tcp_reconciliation_spark.sources.files import read_text, write_text

    docs = load_table(spark, sf_dir, "documents")
    path = str(tmp_path / "docs_txt")
    write_text(docs, path)
    back = read_text(spark, path)
    assert back.columns == ["value"]
    a = sorted(r.text for r in docs.select("text").collect())
    b = sorted(r.value for r in back.collect())
    assert a == b


def test_binaryfile_source_roundtrip(spark, sf_dir, tmp_path):
    """binaryFile source: opaque blobs come back byte-identical with the
    file metadata columns, and pathGlobFilter prunes the listing."""
    import os

    blob_dir = tmp_path / "blobs"
    os.makedirs(blob_dir)
    payloads = {
        "a.img": b"\x89FAKEPNG\x00\x01" * 40,
        "b.img": b"RIFFfakewav" * 25,
        "c.txt": b"not a blob",
    }
    for name, data in payloads.items():
        with open(blob_dir / name, "wb") as f:
            f.write(data)
    from kafka_streams_tcp_reconciliation_spark.sources.files import read_binary_dir

    rows = read_binary_dir(spark, str(blob_dir), glob="*.img").collect()
    assert len(rows) == 2
    got = {r.path.rsplit("/", 1)[-1]: bytes(r.content) for r in rows}
    assert got == {k: v for k, v in payloads.items() if k.endswith(".img")}
    for r in rows:
        assert r.length == len(got[r.path.rsplit("/", 1)[-1]])


def test_scale_out_many_tiny_files_still_widens(spark, tmp_path):
    """scale_out's cheap inputFiles() count is only trusted when it is
    BELOW target: Spark bin-packs tiny files into few splits, so a table
    written as (target+) small part-files can still scan as 1-2 splits.
    The fallback RDD probe must catch that and widen (the regression
    would silently serialize CPU-heavy per-row operators)."""
    from kafka_streams_tcp_reconciliation_spark.sources.tables import scale_out

    target = spark.sparkContext.defaultParallelism
    n_files = target + 3
    spark.range(0, n_files, 1, n_files).write.mode("overwrite").parquet(
        str(tmp_path / "tiny")
    )
    df = spark.read.parquet(str(tmp_path / "tiny"))
    assert len(df.inputFiles()) >= target  # the untrustworthy-count regime
    assert df.rdd.getNumPartitions() < target  # bin-packed: few real splits
    widened = scale_out(df)
    assert widened.rdd.getNumPartitions() >= target
    assert widened.count() == n_files


def test_scale_out_non_file_frame_probes_instead_of_blind_shuffle(spark):
    """A non-file-backed DataFrame returns [] from inputFiles() — that
    means UNKNOWN, not zero splits. scale_out must fall through to the
    RDD probe: widen when narrow, and NOT add a shuffle when the frame
    is already at target parallelism."""
    from kafka_streams_tcp_reconciliation_spark.sources.tables import scale_out

    target = spark.sparkContext.defaultParallelism
    narrow = spark.range(0, 1000, 1, 2)
    assert narrow.inputFiles() == []
    assert scale_out(narrow).rdd.getNumPartitions() >= target
    wide = spark.range(0, 1000, 1, target)
    assert wide.inputFiles() == []
    # already-parallel frame: no repartition node added
    assert "Repartition" not in scale_out(wide)._jdf.queryExecution().logical().toString()


def test_ts_probe_failure_is_not_memoized(tmp_path):
    """A FAILED footer probe must not poison the cache: if events.parquet
    is missing (or pyarrow hiccups) the loader assumes µs for that load
    only; once an ns-typed file appears at the same path, the next probe
    must see it — memoizing the failure would read ns event-times as µs,
    the 1000× corruption the loader exists to prevent."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from kafka_streams_tcp_reconciliation_spark.sources import tables as T

    path = str(tmp_path / "sfdir")
    probe_target = f"{path}/events.parquet"
    T._TS_PROBE_CACHE.pop(probe_target, None)
    assert T._events_ts_is_nanos(probe_target) is False  # nothing there yet
    assert probe_target not in T._TS_PROBE_CACHE  # failure NOT cached
    (tmp_path / "sfdir").mkdir()
    pq.write_table(
        pa.table({"ts": pa.array([0], type=pa.timestamp("ns"))}),
        probe_target,
    )
    assert T._events_ts_is_nanos(probe_target) is True  # sees the ns file
    assert T._TS_PROBE_CACHE[probe_target] is True  # success IS cached


def test_pairwise_cosine_kernel_bitwise_equals_jvm_fold(spark):
    """The numpy pairwise-cosine kernel claims BIT-IDENTICAL results to
    the JVM sequential fold (same per-dimension add order). Prove it on
    adversarial float32 vectors (mixed magnitudes, negatives, exact
    halves near the 6-dp rounding boundary): every rounded cosine from
    the kernel must equal the Spark SQL fold EXACTLY, not approximately."""
    import numpy as np
    from pyspark.sql import functions as F

    from kafka_streams_tcp_reconciliation_spark.operators import similarity as sim

    rng = np.random.default_rng(20260815)
    n, dim = 24, 64
    vecs = (
        rng.uniform(-1e3, 1e3, size=(n, dim)).astype(np.float32)
        * (10.0 ** rng.integers(-3, 3, size=(n, 1))).astype(np.float32)
    )
    kernel = sim.pairwise_cosine_matrix(list(vecs))
    rows = [(i, [float(x) for x in vecs[i]]) for i in range(n)]
    df = spark.createDataFrame(rows, "id int, v array<float>")
    a = df.select(F.col("id").alias("ia"), F.col("v").alias("va"))
    b = df.select(F.col("id").alias("ib"), F.col("v").alias("vb"))
    got = (
        a.crossJoin(b)
        .select(
            "ia",
            "ib",
            F.round(
                F.expr(sim.dot_expr("va", "vb"))
                / F.sqrt(
                    F.expr(sim.dot_expr("va", "va"))
                    * F.expr(sim.dot_expr("vb", "vb"))
                ),
                6,
            ).alias("c"),
        )
        .collect()
    )
    for r in got:
        assert float(kernel[r.ia, r.ib]) == r.c, (r.ia, r.ib)


def test_scale_out_single_big_file_skips_redundant_repartition(spark, tmp_path):
    """A single file LARGER than maxPartitionBytes already scans as many
    splits, so a below-target file COUNT is not a split upper bound there
    (round-7 ADVICE): scale_out must stat local files and fall through to
    the accurate probe instead of stacking a redundant repartition
    shuffle on an already-parallel scan. Since round 8 "already parallel"
    additionally requires enough ROW GROUPS to feed the splits (a
    1-row-group big file has many splits but one busy task — widening it
    is correct, covered by test_scale_ops), so this file is written with
    ~1k-row groups to make its parallelism genuine."""
    import random

    import pyarrow as pa
    import pyarrow.parquet as pq

    from kafka_streams_tcp_reconciliation_spark.sources.tables import scale_out

    target = spark.sparkContext.defaultParallelism
    old = spark.conf.get("spark.sql.files.maxPartitionBytes")
    try:
        spark.conf.set("spark.sql.files.maxPartitionBytes", "16384b")
        rng = random.Random(7)
        txt = [
            "".join(chr(rng.randrange(33, 127)) for _ in range(64))
            for _ in range(40_000)
        ]
        p = str(tmp_path / "big.parquet")
        pq.write_table(
            pa.table({"id": list(range(40_000)), "txt": txt}),
            p,
            row_group_size=1_000,  # 40 groups >= any local target
        )
        df = spark.read.parquet(p)
        assert len(df.inputFiles()) == 1  # the regime the ADVICE flagged
        assert df.rdd.getNumPartitions() >= target  # already parallel
        plan = scale_out(df)._jdf.queryExecution().logical().toString()
        assert "Repartition" not in plan
    finally:
        spark.conf.set("spark.sql.files.maxPartitionBytes", old)


def test_scale_out_conf_and_uri_helpers():
    from kafka_streams_tcp_reconciliation_spark.sources.tables import (
        _conf_bytes,
        _local_path,
    )

    assert _conf_bytes("134217728b") == 128 * 1024 * 1024
    assert _conf_bytes("128m") == 128 * 1024 * 1024
    assert _conf_bytes("128MB") == 128 * 1024 * 1024
    assert _conf_bytes("1g") == 1024**3
    assert _conf_bytes("4096") == 4096
    assert _local_path("file:///tmp/a%20b/x.parquet") == "/tmp/a b/x.parquet"
    assert _local_path("/tmp/x.parquet") == "/tmp/x.parquet"
    import pytest as _pytest

    with _pytest.raises(ValueError):
        _local_path("s3a://bucket/key.parquet")


def test_blocked_pairwise_kernel_bitwise_equals_full_matrix():
    """pairwise_cosine_blocked claims bitwise equality with
    pairwise_cosine_matrix row-slices at ANY block size (per-task memory
    cap must not move a single ulp). Prove it on adversarial float32
    vectors with block sizes that split rows unevenly."""
    import numpy as np

    from kafka_streams_tcp_reconciliation_spark.operators import similarity as sim

    rng = np.random.default_rng(20260816)
    n, dim = 37, 64
    vecs = (
        rng.uniform(-1e3, 1e3, size=(n, dim)).astype(np.float32)
        * (10.0 ** rng.integers(-3, 3, size=(n, 1))).astype(np.float32)
    )
    full = sim.pairwise_cosine_matrix(list(vecs))
    for block in (1, 5, 16, 37, 1024):
        got = np.empty_like(full)
        for s, M in sim.pairwise_cosine_blocked(list(vecs), block=block):
            got[s : s + M.shape[0]] = M
        # bitwise, not approx: identical IEEE operations in same order
        assert (got == full).all() or (
            np.isnan(got) == np.isnan(full)
        ).all() and (got[~np.isnan(got)] == full[~np.isnan(full)]).all(), block


def test_blocked_pairwise_kernel_pickles_by_value(tmp_path):
    """Same by-value cloudpickle contract as pairwise_cosine_matrix: the
    blocked kernel is captured inside pandas-kernel closures and must be
    callable in a worker that cannot import this package."""
    import subprocess
    import sys

    from pyspark import cloudpickle

    from kafka_streams_tcp_reconciliation_spark.operators import similarity as sim

    blob_path = tmp_path / "kern_blocked.pkl"
    blob_path.write_bytes(cloudpickle.dumps(sim.pairwise_cosine_blocked))
    code = f"""
import sys
sys.path = [p for p in sys.path if "repo" not in p]
from pyspark import cloudpickle
f = cloudpickle.loads(open({str(blob_path)!r}, "rb").read())
chunks = list(f([[1.0, 0.0], [0.0, 1.0], [1.0, 1.0]], block=2))
assert [s for s, _ in chunks] == [0, 2]
assert chunks[0][1].shape == (2, 3) and chunks[0][1][0][0] == 1.0
print("blocked-kernel-self-contained")
"""
    r = subprocess.run(
        [sys.executable, "-c", code], capture_output=True, text=True, timeout=120
    )
    assert r.returncode == 0, r.stderr[-2000:]
    assert "blocked-kernel-self-contained" in r.stdout


def test_zero_norm_engine_semantics(spark, duck):
    """pairwise_cosine_matrix's docstring documents the PRECISE three-way
    zero-norm contract: under the repo session's ANSI mode the Spark JVM
    double 0/0 THROWS (queries fail loud, never silently diverge), the
    numpy kernels yield NaN (which Spark's sort order ranks greatest —
    callers map it to an explicit key), and DuckDB 1.x yields NULL
    (sorted last under DESC). Pin all three so an engine upgrade that
    changes any of them invalidates the documented contract loudly."""
    import numpy as np
    import pytest as _pytest
    from pyspark.sql import functions as F

    from kafka_streams_tcp_reconciliation_spark.operators import similarity as sim

    assert spark.conf.get("spark.sql.ansi.enabled") == "true"
    df = spark.createDataFrame([(0.0, 0.0)], "a double, b double")
    with _pytest.raises(Exception, match="DIVIDE_BY_ZERO"):
        df.select((F.col("a") / F.col("b")).alias("q")).collect()

    # Spark sorts NaN greatest (first under DESC)
    order = [
        r.x
        for r in spark.sql(
            "SELECT x FROM VALUES (1.0D), (CAST('NaN' AS DOUBLE)), (2.0D)"
            " t(x) ORDER BY x DESC"
        ).collect()
    ]
    assert order[0] != order[0], "Spark must sort NaN first under DESC"

    # the numpy kernel yields NaN for a zero-norm vector
    m = sim.pairwise_cosine_matrix([[0.0, 0.0], [1.0, 0.0]])
    assert np.isnan(m[0, 1]) and m[1, 1] == 1.0

    # DuckDB: double 0/0 is NULL; NULL sorts last under DESC
    assert duck.execute(
        "SELECT CAST(0.0 AS DOUBLE) / CAST(0.0 AS DOUBLE)"
    ).fetchone()[0] is None
    dorder = duck.execute(
        "SELECT x FROM (VALUES (1.0), (NULL), (2.0)) t(x) ORDER BY x DESC"
    ).fetchall()
    assert dorder[-1][0] is None
