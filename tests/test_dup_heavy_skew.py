"""Duplicate-heavy + language-skew differential sweeps (round 10).

The round-9 sweeps attacked text SHAPES (degenerate strings) and event
TIME (ties); this round's selection layer makes two corpus-level
DISTRIBUTIONS load-bearing that the synthetic fixtures barely exercise:

- **Duplication**: the fixtures carry ~0.16% exact duplicates, but the
  canonical/cluster policy stage exists precisely for corpora where
  duplication is heavy. At 50% verbatim duplication (each dup re-homed
  to a different source), the md5 clusters span sources, ntile ranks
  carry massive score ties, and every dedup family's candidate volume
  explodes — any cross-engine tie-break or NULL-fold divergence that the
  thin-duplication fixtures mask becomes a hash mismatch here.
- **Language skew**: a 99%-one-language corpus drives the UniMax
  water-filling to its saturation cliff (four near-empty languages all
  saturate, the head takes the entire water level), the CCNet terciles
  down to 1-2-row strata, and the per-language fertility/sample-plan
  denominators toward zero.

Both fixtures re-run EVERY documents-consuming oracle query with full
value parity against DuckDB on the same data — same harness contract as
tests/test_degenerate_text.py.
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from kafka_streams_tcp_reconciliation_spark.plans import (
    ORACLES,
    QUERIES,
    load_all,
)
from kafka_streams_tcp_reconciliation_spark.sources.tables import TABLE_NAMES
from tests.test_empty_tables import ResilientDuck, _canon

load_all()

DOCUMENT_QUERIES = sorted(
    n for n, sql in ORACLES.items() if "documents" in sql
)


def _rewrite_documents(src: str, dst, mutate) -> str:
    for t in TABLE_NAMES:
        tb = pq.read_table(os.path.join(src, f"{t}.parquet"))
        tb = tb.replace_schema_metadata(None)
        if t == "documents":
            rows = tb.to_pylist()
            rows = mutate(rows)
            tb = pa.Table.from_pylist(rows, schema=tb.schema)
        pq.write_table(tb, str(dst / f"{t}.parquet"))
    return str(dst)


@pytest.fixture(scope="module")
def dup_heavy_sf_dir(tmp_path_factory) -> str:
    """50% of documents become verbatim copies of another document,
    re-homed to a rotated source (so exact-dup clusters SPAN sources —
    the canonical-priority policy's real input shape)."""
    src = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")
    dst = tmp_path_factory.mktemp("sf_dup_heavy")
    rng = np.random.default_rng(23)

    def mutate(rows):
        n = len(rows)
        sources = sorted({r["source"] for r in rows})
        victims = rng.choice(n, size=n // 2, replace=False)
        for i in victims:
            donor = rows[int(rng.integers(0, n))]
            rows[i]["text"] = donor["text"]
            rows[i]["n_chars"] = donor["n_chars"]
            rows[i]["lang"] = donor["lang"]
            src_i = sources.index(rows[i]["source"])
            rows[i]["source"] = sources[(src_i + 1) % len(sources)]
        return rows

    return _rewrite_documents(src, dst, mutate)


@pytest.fixture(scope="module")
def lang_skew_sf_dir(tmp_path_factory) -> str:
    """99% of documents re-labeled to one language: near-empty tail
    languages (1-2 docs each) against one gigantic head."""
    src = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")
    dst = tmp_path_factory.mktemp("sf_lang_skew")
    rng = np.random.default_rng(29)

    def mutate(rows):
        for r in rows:
            if rng.random() < 0.99:
                r["lang"] = "en"
        return rows

    return _rewrite_documents(src, dst, mutate)


@pytest.fixture(scope="function")
def dup_duck(dup_heavy_sf_dir, tmp_path_factory):
    d = ResilientDuck(dup_heavy_sf_dir, tmp_path_factory)
    yield d
    d.close()


@pytest.fixture(scope="function")
def skew_duck(lang_skew_sf_dir, tmp_path_factory):
    d = ResilientDuck(lang_skew_sf_dir, tmp_path_factory)
    yield d
    d.close()


def _assert_parity(sdf, odf):
    assert len(sdf) == len(odf), f"rows {len(sdf)} vs {len(odf)}"
    if len(sdf):
        a, b = _canon(sdf), _canon(odf)
        assert list(a.columns) == list(b.columns)
        for c in a.columns:
            av, bv = a[c], b[c]
            if av.dtype.kind == "f" or bv.dtype.kind == "f":
                av = av.astype(float)
                bv = bv.astype(float)
                assert (av.isna() == bv.isna()).all(), c
                both = ~av.isna()
                assert ((av[both] - bv[both]).abs() < 1e-9).all(), c
            else:
                assert av.astype(str).equals(bv.astype(str)), c


@pytest.mark.parametrize("name", DOCUMENT_QUERIES)
def test_query_survives_heavy_duplication(name, spark, dup_heavy_sf_dir,
                                          dup_duck):
    sdf = QUERIES[name](spark, dup_heavy_sf_dir).toPandas()
    _assert_parity(sdf, dup_duck.execute(ORACLES[name]).df())


@pytest.mark.parametrize("name", DOCUMENT_QUERIES)
def test_query_survives_language_skew(name, spark, lang_skew_sf_dir,
                                      skew_duck):
    sdf = QUERIES[name](spark, lang_skew_sf_dir).toPandas()
    _assert_parity(sdf, skew_duck.execute(ORACLES[name]).df())


@pytest.fixture(scope="module")
def boilerplate_sf_dir(tmp_path_factory) -> str:
    """150 documents share ONE verbatim boilerplate text — the corpus
    shape (license headers, templated pages) that drives LSH bucket
    occupancy past the round-11 cap (150 > 64) and, uncapped, costs
    O(n²) candidate pairs per bucket."""
    src = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")
    dst = tmp_path_factory.mktemp("sf_boilerplate")
    rng = np.random.default_rng(31)
    boiler = (
        "all rights reserved this page is provided as is without warranty "
        "of any kind either express or implied including but not limited "
        "to the implied warranties of merchantability and fitness"
    )

    def mutate(rows):
        victims = rng.choice(len(rows), size=150, replace=False)
        for i in victims:
            rows[i]["text"] = boiler
            rows[i]["n_chars"] = len(boiler)
        return rows

    return _rewrite_documents(src, dst, mutate)


def test_lsh_cap_active(spark, boilerplate_sf_dir, tmp_path_factory):
    """The occupancy cap must actually FIRE on a boilerplate-heavy corpus:
    the 150-doc identical-text cluster emits an id-ordered chain (149
    pairs, connectivity preserved) instead of the 11 175-pair clique,
    and the capped output still matches the mirrored DuckDB oracle
    bit-for-bit."""
    from kafka_streams_tcp_reconciliation_spark.plans.llm import _LSH_MAX_BUCKET

    assert _LSH_MAX_BUCKET < 150  # the fixture must exceed the cap
    capped = QUERIES["dedup_minhash_lsh_capped"](
        spark, boilerplate_sf_dir
    ).toPandas()
    uncapped = QUERIES["dedup_minhash_lsh"](
        spark, boilerplate_sf_dir
    ).toPandas()
    # cap active: strictly fewer candidate pairs survive
    assert len(capped) < len(uncapped)

    tb = pq.read_table(
        os.path.join(boilerplate_sf_dir, "documents.parquet")
    ).to_pylist()
    texts = {}
    for r in tb:
        texts.setdefault(r["text"], []).append(r["doc_id"])
    cluster = sorted(next(ids for t, ids in texts.items() if len(ids) >= 150))
    cset = set(cluster)
    in_cluster = capped[
        capped["doc_a"].isin(cset) & capped["doc_b"].isin(cset)
    ]
    # chain, not clique: exactly n-1 consecutive pairs in id order
    assert len(in_cluster) == len(cluster) - 1
    got_pairs = set(map(tuple, in_cluster[["doc_a", "doc_b"]].values.tolist()))
    assert got_pairs == set(zip(cluster, cluster[1:]))
    # uncapped emits the full clique on the same cluster
    un_in = uncapped[
        uncapped["doc_a"].isin(cset) & uncapped["doc_b"].isin(cset)
    ]
    assert len(un_in) == len(cluster) * (len(cluster) - 1) // 2
    # connectivity preserved: union-find over capped pairs unites the lot
    parent = {d: d for d in cluster}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in got_pairs:
        parent[find(a)] = find(b)
    assert len({find(d) for d in cluster}) == 1
    # oracle parity on the cap-active fixture (strong tier)
    duck = ResilientDuck(boilerplate_sf_dir, tmp_path_factory)
    try:
        odf = duck.execute(ORACLES["dedup_minhash_lsh_capped"]).df()
    finally:
        duck.close()
    _assert_parity(capped, odf)


def test_dup_heavy_fixture_actually_heavy(dup_heavy_sf_dir):
    tb = pq.read_table(os.path.join(dup_heavy_sf_dir, "documents.parquet"))
    texts = tb.column("text").to_pylist()
    assert len(texts) - len(set(texts)) > len(texts) // 4


def test_lang_skew_fixture_actually_skewed(lang_skew_sf_dir):
    tb = pq.read_table(os.path.join(lang_skew_sf_dir, "documents.parquet"))
    langs = tb.column("lang").to_pylist()
    assert langs.count("en") > 0.95 * len(langs)
    assert len(set(langs)) >= 2  # some tail languages survive


def test_minhash_kernel_matches_hof(spark):
    """Round-12 bit-equality lock for the Arrow/numpy minhash kernel.

    ``operators/dedup.minhash_gram_sig_frame`` replaced the interpreted
    higher-order-function pipeline (word_polyhashes -> gram_fold64 ->
    minhash_sig) inside the two LSH dedup queries because the HOF form's
    lambda frames picked up per-session JIT profile pollution (the
    round-10/11 ~5x session bimodality). The DuckDB oracles still mirror
    the SQL twins, so the kernel must produce the SAME integers: same
    surviving docs (>= gram-width words), same gram-hash SETS (the
    kernel emits sorted-distinct; every consumer is set-semantics), and
    the same 32-entry signature element-for-element — across organic
    docs, every degenerate text shape, and non-BMP codepoints."""
    from pyspark.sql import functions as F

    import kafka_streams_tcp_reconciliation_spark.operators.dedup as dd
    from kafka_streams_tcp_reconciliation_spark.plans.llm import (
        _JACC_N,
        _MH_NUM,
    )
    from kafka_streams_tcp_reconciliation_spark.sources.tables import (
        load_table,
    )
    from tests.test_degenerate_text import DEGENERATE_TEXTS

    sf = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")
    docs = (
        load_table(spark, sf, "documents")
        .filter(F.col("text").isNotNull())
        .select("doc_id", "text")
    )
    extra = spark.createDataFrame(
        [(10_000_000 + i, t) for i, t in enumerate(DEGENERATE_TEXTS)]
        + [(10_000_900, "\U0001f600 emoji codepoints fold identically ok")],
        "doc_id long, text string",
    )
    docs = docs.unionByName(extra)

    wh = docs.select(
        "doc_id",
        dd.word_polyhashes_expr("text", 31).alias("wh1"),
        dd.word_polyhashes_expr("text", 131).alias("wh2"),
    )
    hs_hof = wh.select(
        "doc_id", dd.gram_fold64_expr("wh1", "wh2", _JACC_N).alias("hs")
    ).filter(F.size("hs") > 0)
    sig_hof = hs_hof.select(
        "doc_id", dd.minhash_sig_expr("hs", _MH_NUM).alias("sig")
    )
    hof: dict = {r.doc_id: [sorted(r.hs), None] for r in hs_hof.collect()}
    for r in sig_hof.collect():
        hof[r.doc_id][1] = list(r.sig)

    ker = {
        r.doc_id: (list(r.hs), list(r.sig))
        for r in dd.minhash_gram_sig_frame(docs, _JACC_N, _MH_NUM).collect()
    }

    assert set(hof) == set(ker)
    assert len(hof) > 400  # the organic corpus actually participated
    for d, (hs, sig) in hof.items():
        assert ker[d][0] == hs, f"gram set diverged for doc {d}"
        assert ker[d][1] == sig, f"signature diverged for doc {d}"


def test_simhash_kernel_matches_hof(spark):
    """Round-12 bit-equality lock for the Arrow/numpy SimHash kernel.

    ``operators/dedup.gram_sim_frame`` replaced the interpreted HOF
    pipeline (word_polyhashes -> gram_fold64 -> simhash_expr) inside
    ``simhash_pair_frame`` — the heaviest interpreted-lambda expression
    in the package (60 zip_with adds per gram per doc). The DuckDB
    oracles still mirror the SQL twins, so the kernel must produce the
    SAME 60-bit signatures for EVERY doc — including docs shorter than
    the gram width, whose empty-fold signature is 0 (they block together
    in chunk-bucket 0; dropping them would change the candidate set) —
    across organic docs, degenerate shapes, and non-BMP codepoints."""
    from pyspark.sql import functions as F

    import kafka_streams_tcp_reconciliation_spark.operators.dedup as dd
    from kafka_streams_tcp_reconciliation_spark.plans.llm import _JACC_N
    from kafka_streams_tcp_reconciliation_spark.sources.tables import (
        load_table,
    )
    from tests.test_degenerate_text import DEGENERATE_TEXTS

    sf = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")
    docs = (
        load_table(spark, sf, "documents")
        .filter(F.col("text").isNotNull())
        .select("doc_id", "text")
    )
    extra = spark.createDataFrame(
        [(10_000_000 + i, t) for i, t in enumerate(DEGENERATE_TEXTS)]
        + [(10_000_900, "\U0001f600 emoji codepoints fold identically ok")],
        "doc_id long, text string",
    )
    docs = docs.unionByName(extra)

    wh = docs.select(
        "doc_id",
        dd.word_polyhashes_expr("text", 31).alias("wh1"),
        dd.word_polyhashes_expr("text", 131).alias("wh2"),
    )
    gs = wh.select(
        "doc_id", dd.gram_fold64_expr("wh1", "wh2", _JACC_N).alias("gs")
    )
    hof = {
        r.doc_id: r.sim
        for r in gs.select(
            "doc_id", dd.simhash_expr("gs").alias("sim")
        ).collect()
    }
    ker = {
        r.doc_id: r.sim
        for r in dd.gram_sim_frame(docs, _JACC_N).collect()
    }

    assert set(hof) == set(ker)  # keep_empty: EVERY doc surfaces
    assert len(hof) > 400  # the organic corpus actually participated
    # short docs exist in the degenerate set and must carry sim = 0
    assert any(v == 0 for v in ker.values())
    for d, sim in hof.items():
        assert ker[d] == sim, f"simhash diverged for doc {d}"


def test_gram_set_frame_matches_hof(spark):
    """Round-12 set-equality lock for the bare gram-set kernel frame
    (``operators/dedup.gram_set_frame``), which replaced the HOF
    two-level fold inside the inverted-index consumers (ngram Jaccard,
    containment, curate_corpus, boilerplate spans, decontamination).
    Consumers treat the arrays as SETS (explode to postings /
    array_intersect), so the lock is: same surviving docs (>= n words),
    same sorted-distinct members — at both consumer gram widths (3 for
    the shingle family, 8 for decontamination)."""
    from pyspark.sql import functions as F

    import kafka_streams_tcp_reconciliation_spark.operators.dedup as dd
    from kafka_streams_tcp_reconciliation_spark.sources.tables import (
        load_table,
    )
    from tests.test_degenerate_text import DEGENERATE_TEXTS

    sf = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")
    docs = (
        load_table(spark, sf, "documents")
        .filter(F.col("text").isNotNull())
        .select("doc_id", "text")
    )
    extra = spark.createDataFrame(
        [(10_000_000 + i, t) for i, t in enumerate(DEGENERATE_TEXTS)]
        + [(10_000_900, "\U0001f600 emoji codepoints fold identically ok")],
        "doc_id long, text string",
    )
    docs = docs.unionByName(extra)

    for n in (3, 8):
        wh = docs.select(
            "doc_id",
            dd.word_polyhashes_expr("text", 31).alias("wh1"),
            dd.word_polyhashes_expr("text", 131).alias("wh2"),
        )
        hs_hof = wh.select(
            "doc_id", dd.gram_fold64_expr("wh1", "wh2", n).alias("hs")
        ).filter(F.size("hs") > 0)
        hof = {r.doc_id: sorted(r.hs) for r in hs_hof.collect()}
        ker = {
            r.doc_id: list(r.hs)
            for r in dd.gram_set_frame(docs, n).collect()
        }
        assert set(hof) == set(ker), f"surviving docs diverged at n={n}"
        assert len(hof) > 400
        for d, hs in hof.items():
            assert ker[d] == hs, f"gram set diverged for doc {d} at n={n}"


def test_ppjoin_jaccard_loses_no_pair(spark):
    """Round-13 lossless-prune lock: ``dedup_ngram_jaccard`` (PPJoin
    prefix/length/positional candidate pruning + exact array_intersect
    verify) must equal BRUTE-FORCE Jaccard over every doc pair's gram
    sets. The DuckDB oracle keeps the unpruned inverted-index form, so
    the differential already cross-checks this end-to-end; this test
    pins the blame to the prune if it ever over-filters, and also
    exercises degenerate/non-BMP texts the fixtures lack."""
    import itertools

    from pyspark.sql import functions as F

    import kafka_streams_tcp_reconciliation_spark.operators.dedup as dd
    from kafka_streams_tcp_reconciliation_spark.plans import all_queries
    from kafka_streams_tcp_reconciliation_spark.plans.llm import (
        _JACC_N,
        _JACC_THRESHOLD,
    )
    from kafka_streams_tcp_reconciliation_spark.sources.tables import load_table
    from tests.test_degenerate_text import DEGENERATE_TEXTS

    sf = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")
    docs = (
        load_table(spark, sf, "documents")
        .filter(F.col("text").isNotNull())
        .select("doc_id", "text")
    )
    sets = {
        r.doc_id: frozenset(r.hs)
        for r in dd.gram_set_frame(docs, _JACC_N).collect()
    }
    want = set()
    for (ida, sa), (idb, sb) in itertools.combinations(sorted(sets.items()), 2):
        ov = len(sa & sb)
        if ov and ov / (len(sa) + len(sb) - ov) >= _JACC_THRESHOLD:
            want.add((ida, idb))
    got = {
        (r.doc_a, r.doc_b)
        for r in all_queries()["dedup_ngram_jaccard"](spark, sf).collect()
    }
    assert got == want
    assert want, "fixture must contain at least one true near-dup pair"

    # degenerate/non-BMP battery through the raw helper (tiny sets where
    # prefix lengths hit their clamps)
    extra = spark.createDataFrame(
        [(10_000_000 + i, t) for i, t in enumerate(DEGENERATE_TEXTS)]
        + [(10_000_900, "\U0001f600 emoji codepoints fold identically ok")]
        + [(10_000_901, "\U0001f600 emoji codepoints fold identically ok")],
        "doc_id long, text string",
    ).filter(F.col("text").isNotNull())
    sh = dd.gram_set_frame(extra, _JACC_N).select(
        "doc_id", F.col("hs").alias("shingles")
    )
    esets = {r.doc_id: frozenset(r.shingles) for r in sh.collect()}
    ewant = set()
    for (ida, sa), (idb, sb) in itertools.combinations(sorted(esets.items()), 2):
        ov = len(sa & sb)
        if ov and ov / (len(sa) + len(sb) - ov) >= _JACC_THRESHOLD:
            ewant.add((ida, idb))
    pairs = dd.ppjoin_jaccard_pairs(sh, _JACC_THRESHOLD)
    jacc = F.col("n_inter") / (
        F.col("na") + F.col("nb") - F.col("n_inter")
    ).cast("double")
    egot = {
        (r.doc_a, r.doc_b)
        for r in pairs.filter(jacc >= _JACC_THRESHOLD).collect()
    }
    assert egot == ewant
    assert ewant, "the duplicated emoji doc must pair with its twin"


def test_ppjoin_containment_loses_no_pair(spark):
    """Round-13 lossless-prune lock for the ASYMMETRIC containment prune:
    ``dedup_shingle_containment`` must equal brute-force containment
    (|A∩B| / min >= tau) over every doc pair — including subset pairs
    with wildly different sizes, the case the Jaccard-style length
    filter would wrongly drop (containment has none)."""
    import itertools

    from pyspark.sql import functions as F

    import kafka_streams_tcp_reconciliation_spark.operators.dedup as dd
    from kafka_streams_tcp_reconciliation_spark.plans import all_queries
    from kafka_streams_tcp_reconciliation_spark.plans.llm import (
        _CONT_TAU,
        _JACC_N,
    )
    from kafka_streams_tcp_reconciliation_spark.sources.tables import load_table

    sf = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")
    docs = (
        load_table(spark, sf, "documents")
        .filter(F.col("text").isNotNull())
        .select("doc_id", "text")
    )
    sets = {
        r.doc_id: frozenset(r.hs)
        for r in dd.gram_set_frame(docs, _JACC_N).collect()
    }
    want = {}
    for (ida, sa), (idb, sb) in itertools.combinations(sorted(sets.items()), 2):
        ov = len(sa & sb)
        if ov and ov / min(len(sa), len(sb)) >= _CONT_TAU:
            want[(ida, idb)] = ov
    got = {
        (r.doc_a, r.doc_b): r.n_inter
        for r in all_queries()["dedup_shingle_containment"](spark, sf).collect()
    }
    assert got == want
    assert want, "fixture must contain at least one containment pair"

    # explicit subset pair: a short doc quoted whole inside a long one
    # (tiny Jaccard, containment 1.0 — the pair a length filter would lose)
    short = "alpha beta gamma delta epsilon"
    longd = short + " " + " ".join(f"w{i} x{i} y{i}" for i in range(40))
    extra = spark.createDataFrame(
        [(1, short), (2, longd)], "doc_id long, text string"
    )
    sh = dd.gram_set_frame(extra, _JACC_N).select(
        "doc_id", F.col("hs").alias("shingles")
    )
    pairs = dd.ppjoin_containment_pairs(sh, _CONT_TAU).collect()
    assert [(r.doc_a, r.doc_b) for r in pairs] == [(1, 2)]
    r = pairs[0]
    assert r.n_inter == r.na == min(r.na, r.nb)  # full containment
