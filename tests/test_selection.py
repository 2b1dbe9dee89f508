"""Tests for plans/selection.py — data-selection operators (round 10).

Each query gets an independent plain-Python brute force on the real
sf0.001 fixture (the DuckDB differential runs separately in
tests/test_oracle_differential.py and the degenerate-text sweep picks the
new queries up automatically), plus plan locks for the scale claims made
in the docstrings (the classifier is shuffle-free; canonical dedup is a
single hash shuffle) and a hypothesis property test of the closed-form
water-filling against an iterative water-filler.
"""

from __future__ import annotations

import math
import os
from collections import Counter

import pyarrow.parquet as pq
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from kafka_streams_tcp_reconciliation_spark.plans import QUERIES, load_all

load_all()

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")

MOD = 1_000_000_007
BASE = 31


def _poly_hash(s: str) -> int:
    acc = 0
    for ch in s:
        acc = (acc * BASE + ord(ch)) % MOD
    return acc


def _words(text: str) -> list[str]:
    return [w for w in text.split(" ") if w != ""]


def _docs() -> list[dict]:
    tb = pq.read_table(os.path.join(SF_DIR, "documents.parquet"))
    return tb.to_pylist()


def _water_fill_iterative(caps: list[int], budget: int) -> list[int]:
    """Reference UniMax allocator in micro-tokens: repeatedly hand every
    unsaturated language the equal share, saturating any language whose
    cap falls below it, until fixed point. Truncating integer division,
    like the SQL."""
    n = len(caps)
    saturated = [False] * n
    while True:
        rem = budget - sum(c for c, s in zip(caps, saturated) if s)
        free = [i for i in range(n) if not saturated[i]]
        if not free:
            return [c * 1_000_000 for c in caps]
        share = rem / len(free)
        newly = [i for i in free if caps[i] <= share]
        if not newly:
            level = (rem * 1_000_000) // len(free)
            return [
                caps[i] * 1_000_000 if saturated[i] else level
                for i in range(n)
            ]
        for i in newly:
            saturated[i] = True


@settings(max_examples=200, deadline=None)
@given(
    caps=st.lists(st.integers(min_value=0, max_value=10**9), min_size=1,
                  max_size=8),
)
def test_waterfill_closed_form_matches_iterative(caps):
    """The SQL's closed form (sort caps ascending; saturation is the
    prefix where cap_i * remaining_langs <= remaining budget; everyone
    else gets the common level) equals the iterative fixed point — in
    every budget regime (starved, the query's half-caps point, and
    over-provisioned where all languages saturate)."""
    n = len(caps)
    for budget in (0, sum(caps) // 7, sum(caps) // 2, sum(caps),
                   sum(caps) * 2 + 1):
        order = sorted(range(n), key=lambda i: (caps[i], i))
        prefix = 0
        flags = []
        for rank, i in enumerate(order, start=1):
            flags.append(caps[i] * (n - rank + 1) <= budget - prefix)
            prefix += caps[i]
        # the SQL allocates by per-row flag; that only equals "first k
        # ranks" if saturation is a PREFIX of the sorted order
        assert flags == sorted(flags, reverse=True), (caps, budget, flags)
        k = sum(flags)
        p_k = sum(caps[i] for rank, i in enumerate(order) if flags[rank])
        closed = [0] * n
        for rank, i in enumerate(order, start=1):
            if flags[rank - 1]:
                closed[i] = caps[i] * 1_000_000
            else:
                closed[i] = ((budget - p_k) * 1_000_000) // (n - k)
        assert closed == _water_fill_iterative(caps, budget), budget


def test_unimax_budgets_vs_bruteforce(spark):
    rows = {
        r["lang"]: r
        for r in QUERIES["unimax_language_budgets"](spark, SF_DIR).collect()
    }
    counts: Counter[str] = Counter()
    for d in _docs():
        if d["text"] is not None:
            counts[d["lang"]] += len(_words(d["text"]))
    langs = sorted(counts)
    caps = [counts[lang] for lang in langs]  # E = 1
    budget = 3 * sum(counts.values()) // 4
    # iterative reference (order by (cap, lang) matches: caps are distinct
    # per lang in this fixture, asserted below)
    assert len(set(caps)) == len(caps), "fixture caps tie: extend tie-break"
    alloc = _water_fill_iterative(caps, budget)
    assert set(rows) == set(langs)
    for lang, cap, a in zip(langs, caps, alloc):
        r = rows[lang]
        assert r["c_tokens"] == counts[lang]
        assert r["cap_tokens"] == cap
        assert r["alloc_micro_tokens"] == a
        assert r["saturated"] == (a == cap * 1_000_000)
    # budget is (approximately, up to truncation) exhausted unless the
    # caps couldn't absorb it
    total = sum(r["alloc_micro_tokens"] for r in rows.values())
    assert total <= budget * 1_000_000
    assert budget * 1_000_000 - total < 1_000_000 * len(langs) or all(
        r["saturated"] for r in rows.values()
    )
    # the fixture's language mix must exercise BOTH branches, or the
    # differential is trivially one-sided
    sats = [r["saturated"] for r in rows.values()]
    assert any(sats) and not all(sats)


def test_quality_classifier_vs_bruteforce(spark):
    got = {
        r["doc_id"]: r
        for r in QUERIES["quality_classifier_linear"](spark, SF_DIR)
        .collect()
    }
    docs = [d for d in _docs() if d["text"] is not None]
    assert len(got) == len(docs)
    for d in docs[:200]:
        ws = _words(d["text"])
        score = sum((_poly_hash(w) % 2001) - 1000 for w in ws)
        r = got[d["doc_id"]]
        assert r["n_words"] == len(ws)
        assert r["score_sum"] == score
        if ws:
            expect = (score * 1_000_000) // len(ws)
            # SQL DIV truncates toward zero; Python // floors
            if (score * 1_000_000) % len(ws) != 0 and score < 0:
                expect += 1
            assert r["score_micro"] == expect
            assert r["keep"] == (expect >= 0)
        else:
            assert r["score_micro"] is None and r["keep"] is None


def test_tercile_approx_bound_and_population(spark):
    """The approx-tercile escape hatch (round 11): exactly two rows per
    language, per-language populations matching brute force exactly, and
    every sketch cutpoint satisfying its rank guarantee (within_bound
    TRUE) on the fixture."""
    rows = QUERIES["quality_tercile_buckets_approx"](spark, SF_DIR).collect()
    docs = [
        d for d in _docs()
        if d["text"] is not None and len(_words(d["text"])) > 0
    ]
    by_lang: dict[str, int] = Counter(d["lang"] for d in docs)
    assert {(r["lang"], r["q_permille"]) for r in rows} == {
        (lang, q) for lang in by_lang for q in (333, 667)
    }
    for r in rows:
        assert r["n_docs"] == by_lang[r["lang"]]
        assert r["within_bound"] is True


def test_char_entropy_vs_bruteforce(spark):
    got = {
        r["doc_id"]: r
        for r in QUERIES["char_entropy_filter"](spark, SF_DIR).collect()
    }
    docs = [d for d in _docs() if d["text"]]
    assert len(got) == len(docs)
    for d in docs[:200]:
        cnt = Counter(d["text"])
        n = sum(cnt.values())
        t = sum(round(c * math.log(c) * 1_000_000) for c in cnt.values())
        ent = round(math.log(n) * 1_000_000) - t // n  # t >= 0: // == DIV
        r = got[d["doc_id"]]
        assert r["n_chars"] == n
        assert r["n_distinct_chars"] == len(cnt)
        assert r["entropy_micro"] == ent
        assert r["is_low_entropy"] == (ent < 2_000_000)


def test_char_entropy_flags_degenerate_doc(spark, tmp_path):
    """A single repeated character has zero entropy — the flag's purpose."""
    import pyarrow as pa

    src = pq.read_table(os.path.join(SF_DIR, "documents.parquet"))
    rows = src.to_pylist()[:10]
    rows[0]["text"] = "x" * 300
    rows[0]["n_chars"] = 300
    pq.write_table(
        pa.Table.from_pylist(rows, schema=src.schema.remove_metadata()),
        str(tmp_path / "documents.parquet"),
    )
    out = {
        r["doc_id"]: r
        for r in QUERIES["char_entropy_filter"](spark, str(tmp_path))
        .collect()
    }
    flagged = out[rows[0]["doc_id"]]
    assert flagged["entropy_micro"] == 0
    assert flagged["is_low_entropy"]
    healthy = [r for i, r in out.items() if i != rows[0]["doc_id"]]
    assert all(not r["is_low_entropy"] for r in healthy)


def test_tercile_buckets_shape(spark):
    out = QUERIES["quality_tercile_buckets"](spark, SF_DIR).collect()
    docs = [d for d in _docs() if d["text"] and _words(d["text"])]
    per_lang: Counter[str] = Counter(d["lang"] for d in docs)
    by_lang: dict[str, dict[int, object]] = {}
    for r in out:
        by_lang.setdefault(r["lang"], {})[r["tercile"]] = r
    for lang, n in per_lang.items():
        rows = by_lang[lang]
        sizes = [rows[t]["n_docs"] for t in sorted(rows)]
        assert sum(sizes) == n
        assert max(sizes) - min(sizes) <= 1  # ntile balance
        assert sizes == sorted(sizes, reverse=True)  # early buckets larger
        # monotone score ranges across buckets
        ts = sorted(rows)
        for a, b in zip(ts, ts[1:]):
            assert rows[a]["max_score_micro"] <= rows[b]["min_score_micro"]
            assert rows[a]["min_score_micro"] <= rows[a]["mean_score_micro"]
            assert rows[a]["mean_score_micro"] <= rows[a]["max_score_micro"]


def test_canonical_dedup_vs_bruteforce(spark):
    got = {
        r["canonical_doc_id"]: r
        for r in QUERIES["dedup_canonical_by_priority"](spark, SF_DIR)
        .collect()
    }
    clusters: dict[str, list[dict]] = {}
    for d in _docs():
        if d["text"] is not None:
            clusters.setdefault(d["text"], []).append(d)
    assert len(got) == len(clusters)  # keep-list: one row per distinct text
    for t, ds in clusters.items():
        best = min(ds, key=lambda d: (_poly_hash(d["source"]) % 100,
                                      d["doc_id"]))
        r = got[best["doc_id"]]
        assert r["n_copies"] == len(ds)
        assert r["canonical_source"] == best["source"]
        assert r["n_distinct_sources"] == len({d["source"] for d in ds})


def test_canonical_dedup_priority_pick(spark, tmp_path):
    """Injected cross-source duplicates: the survivor must be the copy
    from the lowest hash-priority source, NOT the lowest doc_id."""
    import pyarrow as pa

    src = pq.read_table(os.path.join(SF_DIR, "documents.parquet"))
    rows = src.to_pylist()[:20]
    sources = sorted({r["source"] for r in rows[:10]})
    assert len(sources) >= 3
    dup_text = "the injected duplicate text payload"
    for i, s in zip((3, 7, 11), sources[:3]):
        rows[i]["text"] = dup_text
        rows[i]["n_chars"] = len(dup_text)
        rows[i]["source"] = s
    pq.write_table(
        pa.Table.from_pylist(rows, schema=src.schema.remove_metadata()),
        str(tmp_path / "documents.parquet"),
    )
    out = QUERIES["dedup_canonical_by_priority"](spark, str(tmp_path))
    clus = [r for r in out.collect() if r["n_copies"] == 3]
    assert len(clus) == 1
    expect = min(
        (rows[i] for i in (3, 7, 11)),
        key=lambda d: (_poly_hash(d["source"]) % 100, d["doc_id"]),
    )
    assert clus[0]["canonical_doc_id"] == expect["doc_id"]
    assert clus[0]["canonical_source"] == expect["source"]
    assert clus[0]["n_distinct_sources"] == 3


def test_fertility_vs_bruteforce(spark):
    import re

    syl = re.compile(r"[^aeiou ]*[aeiou]+|[^aeiou ]+")
    got = {
        r["lang"]: r
        for r in QUERIES["tokenizer_fertility_by_lang"](spark, SF_DIR)
        .collect()
    }
    agg: dict[str, list[int]] = {}
    for d in _docs():
        if d["text"] is None:
            continue
        a = agg.setdefault(d["lang"], [0, 0, 0, 0])
        a[0] += 1
        a[1] += len(_words(d["text"]))
        a[2] += len(syl.findall(d["text"]))
        a[3] += len(d["text"].replace(" ", ""))
    assert set(got) == set(agg)
    for lang, (nd, nw, nt, nc) in agg.items():
        r = got[lang]
        assert (r["n_docs"], r["n_words"], r["n_subtokens"], r["n_chars"]) \
            == (nd, nw, nt, nc)
        assert r["fertility_micro"] == (nt * 1_000_000) // nw
        assert r["chars_per_subtok_micro"] == (nc * 1_000_000) // nt
        assert r["fertility_micro"] >= 1_000_000  # >= 1 token per word


def test_classifier_is_shuffle_free(spark):
    """The docstring's scale claim: the scorer is per-row higher-order
    expressions — no Exchange anywhere in the executed plan."""
    df = QUERIES["quality_classifier_linear"](spark, SF_DIR)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


def test_canonical_dedup_shuffles_metadata_only(spark):
    """Every shuffle is keyed on the md5 (± source for the distinct
    phase) — the raw text column must never be a shuffle key, and the
    distinct-agg shape is exactly the documented two exchanges."""
    import re

    df = QUERIES["dedup_canonical_by_priority"](spark, SF_DIR)
    plan = df._jdf.queryExecution().executedPlan().toString()
    keys = re.findall(r"Exchange hashpartitioning\(([^)]*)\)", plan)
    assert 1 <= len(keys) <= 2, plan
    for k in keys:
        assert "text_hash" in k, k
        assert not re.search(r"\btext#", k), k


def test_unimax_single_corpus_pass(spark):
    """The corpus contributes exactly one aggregate (lang groupBy); the
    water-filling windows run on the 5-row language frame."""
    df = QUERIES["unimax_language_budgets"](spark, SF_DIR)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert plan.count("FileScan parquet") == 1, plan


def test_unimax_sample_plan_vs_bruteforce(spark):
    got = {
        r["doc_id"]: r
        for r in QUERIES["unimax_sample_plan"](spark, SF_DIR).collect()
    }
    # NULL-lang docs are outside the sampleable population AND the budget
    # (round-11 semantics: previously they inflated B unspendably)
    docs = [
        d for d in _docs()
        if d["text"] is not None and d["lang"] is not None
    ]
    counts: Counter[str] = Counter()
    for d in docs:
        counts[d["lang"]] += len(_words(d["text"]))
    langs = sorted(counts)
    caps = [counts[lang] for lang in langs]
    budget = 3 * sum(counts.values()) // 4
    alloc = dict(zip(langs, _water_fill_iterative(caps, budget)))

    def scramble(doc_id: int) -> int:
        return ((doc_id % 1_000_000_007) * 2_654_435_761
                + 1_013_904_223) % 1_000_000_007

    expect = {}
    for lang in langs:
        cum = 0
        for d in sorted(
            (d for d in docs if d["lang"] == lang),
            key=lambda d: (scramble(d["doc_id"]), d["doc_id"]),
        ):
            nw = len(_words(d["text"]))
            cum += nw * 1_000_000
            if cum <= alloc[lang]:
                expect[d["doc_id"]] = (lang, nw, cum)
    assert set(got) == set(expect)
    for doc_id, (lang, nw, cum) in expect.items():
        r = got[doc_id]
        assert (r["lang"], r["n_words"], r["cum_micro_tokens"]) \
            == (lang, nw, cum)
    # the plan is a real subset: something kept, something dropped
    assert 0 < len(expect) < len(docs)


def test_canonical_neardup_consistent_with_cluster_resolve(spark):
    """The composition's clusters must be exactly dedup_cluster_resolve's
    components, and its canonical the (priority, doc_id) argmin within
    each — one survivor per cluster."""
    comp = QUERIES["dedup_canonical_neardup_clusters"](spark, SF_DIR).collect()
    resolve = {
        r["doc_id"]: (r["canonical_id"], r["cluster_size"])
        for r in QUERIES["dedup_cluster_resolve"](spark, SF_DIR).collect()
    }
    docs = {d["doc_id"]: d for d in _docs()}
    assert {r["doc_id"] for r in comp} == set(resolve)
    clusters: dict[int, list] = {}
    for r in comp:
        assert (r["cluster_id"], r["cluster_size"]) == resolve[r["doc_id"]]
        clusters.setdefault(r["cluster_id"], []).append(r)
    assert len(clusters) > 0
    for rows in clusters.values():
        kept = [r for r in rows if r["is_kept"]]
        assert len(kept) == 1
        best = min(
            rows,
            key=lambda r: (
                100 if docs[r["doc_id"]]["source"] is None
                else _poly_hash(docs[r["doc_id"]]["source"]) % 100,
                r["doc_id"],
            ),
        )
        assert kept[0]["doc_id"] == best["doc_id"]
        assert all(
            r["canonical_doc_id"] == best["doc_id"] for r in rows
        )


def test_bigram_logprob_vs_bruteforce(spark):
    got = {
        r["doc_id"]: r
        for r in QUERIES["bigram_logprob_score"](spark, SF_DIR).collect()
    }
    docs = [d for d in _docs() if d["text"] is not None]
    B = 4096

    def bucket(w: str) -> int:
        return _poly_hash(w) % B

    lm: Counter[tuple[int, int]] = Counter()
    per_doc: dict[int, Counter] = {}
    for d in docs:
        ws = _words(d["text"])
        tf = Counter(
            (bucket(a), bucket(b)) for a, b in zip(ws, ws[1:])
        )
        if tf:
            per_doc[d["doc_id"]] = tf
            lm.update(tf)
    ctx: Counter[int] = Counter()
    for (b1, _), c in lm.items():
        ctx[b1] += c
    assert set(got) == set(per_doc)
    for doc_id, tf in list(per_doc.items())[:200]:
        n = sum(tf.values())
        s = sum(
            c * round(
                (math.log(lm[k] + 1.0) - math.log(ctx[k[0]] + B)) * 1_000_000
            )
            for k, c in tf.items()
        )
        mean = s // n
        if s % n != 0 and s < 0:  # SQL DIV truncates toward zero
            mean += 1
        r = got[doc_id]
        assert r["n_bigrams"] == n
        assert r["mean_logprob_micro"] == mean
    # ULP-boundary audit (round-11 ADVICE): the cross-engine hash parity
    # assumes JVM Math.log and DuckDB libm log agree to the last bit
    # BEFORE the single round(). Assert no observed log prob lands within
    # 1e-7 micro-nats of an exact .5 rounding boundary on this fixture,
    # so a hypothetical 1-ulp disagreement could not flip a value.
    for k, c12 in lm.items():
        x = (math.log(c12 + 1.0) - math.log(ctx[k[0]] + B)) * 1_000_000
        frac = abs(x - math.floor(x) - 0.5)
        assert frac > 1e-7, f"logp {x} within 1e-7 of a .5 boundary at {k}"


def test_sample_plan_broadcasts_budgets(spark):
    """The O(#languages) budget frame must broadcast — a shuffle join
    against a 5-row frame would repartition the corpus for nothing."""
    df = QUERIES["unimax_sample_plan"](spark, SF_DIR)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan, plan


def test_word_level_kernel_matches_hof(spark):
    """Round-12 bit-equality lock for the Arrow word-level kernel
    (``operators/dedup.word_level_batch``) in all three modes vs the HOF
    twins it replaced: DSIR's unigram bucket tf, the bigram LM's
    adjacent-pair tf, and the linear quality scorer — organic corpus plus
    degenerate texts (empty, whitespace-only, single-word, non-BMP)."""
    import os

    from pyspark.sql import functions as F

    from kafka_streams_tcp_reconciliation_spark.functions.hashing import (
        safe_seq1,
        spark_poly_hash,
    )
    from kafka_streams_tcp_reconciliation_spark.operators.dedup import (
        bigram_bucket_tf_frame,
        quality_score_frame,
        word_bucket_tf_frame,
    )
    from kafka_streams_tcp_reconciliation_spark.plans.pipeline import (
        _DSIR_BUCKETS,
        dsir_tf,
    )
    from kafka_streams_tcp_reconciliation_spark.plans.selection import (
        _BIGRAM_BUCKETS,
        _SPARK_WORDS,
        _W_MOD,
        _W_OFF,
        _spark_score_sum,
    )
    from kafka_streams_tcp_reconciliation_spark.sources.tables import (
        load_table,
    )
    from tests.test_degenerate_text import DEGENERATE_TEXTS

    sf = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")
    docs = (
        load_table(spark, sf, "documents")
        .filter(F.col("text").isNotNull())
        .select("doc_id", "lang", "text")
    )
    extra = spark.createDataFrame(
        [(10_000_000 + i, "xx", t) for i, t in enumerate(DEGENERATE_TEXTS)]
        + [(10_000_900, None, "\U0001f600 emoji words fold identically ok")],
        "doc_id long, lang string, text string",
    )
    docs = docs.unionByName(extra)

    # unigram bucket tf vs dsir_tf (the HOF explode->hash->groupBy)
    hof_tf = {
        (r.doc_id, r.lang, r.bucket): r.tf for r in dsir_tf(docs).collect()
    }
    ker_tf = {
        (r.doc_id, r.lang, r.bucket): r.tf
        for r in word_bucket_tf_frame(
            docs, _DSIR_BUCKETS, keep=("lang",)
        ).collect()
    }
    assert hof_tf == ker_tf
    assert len(hof_tf) > 5_000  # the organic corpus actually participated

    # bigram pair tf vs the HOF bucketed-hash + adjacent-pair explode
    bucketed = (
        f"transform({_SPARK_WORDS},"
        f" bg_w -> ({spark_poly_hash('bg_w')}) % {_BIGRAM_BUCKETS})"
    )
    pair_struct = (
        f"transform({safe_seq1('size(hs) - 1')},"
        f" bg_i -> struct(element_at(hs, bg_i) AS b1,"
        f" element_at(hs, bg_i + 1) AS b2))"
    )
    hof_bg = {
        (r.doc_id, r.b1, r.b2): r.tf
        for r in docs.select("doc_id", F.expr(bucketed).alias("hs"))
        .select("doc_id", F.explode(F.expr(pair_struct)).alias("p"))
        .select("doc_id", F.col("p.b1").alias("b1"), F.col("p.b2").alias("b2"))
        .groupBy("doc_id", "b1", "b2")
        .agg(F.count(F.lit(1)).cast("long").alias("tf"))
        .collect()
    }
    ker_bg = {
        (r.doc_id, r.b1, r.b2): r.tf
        for r in bigram_bucket_tf_frame(docs, _BIGRAM_BUCKETS).collect()
    }
    assert hof_bg == ker_bg
    assert len(hof_bg) > 5_000

    # linear quality score vs the HOF aggregate (zero-word docs -> (0, 0))
    hof_q = {
        r.doc_id: (r.n_words, r.score_sum)
        for r in docs.select(
            "doc_id",
            F.expr(f"CAST(size({_SPARK_WORDS}) AS BIGINT)").alias("n_words"),
            F.expr(f"CAST({_spark_score_sum()} AS BIGINT)").alias(
                "score_sum"
            ),
        ).collect()
    }
    ker_q = {
        r.doc_id: (r.n_words, r.score_sum)
        for r in quality_score_frame(docs, _W_MOD, _W_OFF).collect()
    }
    assert hof_q == ker_q
    assert any(v == (0, 0) for v in ker_q.values())  # degenerate empties
