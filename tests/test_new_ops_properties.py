"""Semantic properties of the newest ops (PII redaction, int8
quantization, z-score outliers) — independent re-derivations in plain
Python, complementing the DuckDB differential's value-hash check."""

from __future__ import annotations

import math
import re

from kafka_streams_tcp_reconciliation_spark.plans import all_queries
from kafka_streams_tcp_reconciliation_spark.plans.llm import (
    _PII_EMAIL_RE,
    _PII_IP_RE,
    _PII_PHONE_RE,
)
from kafka_streams_tcp_reconciliation_spark.sources.tables import load_table

QUERIES = all_queries()


def test_pii_redaction_is_complete(spark, sf_dir):
    """No PII pattern survives in clean_text, every synthesized row had
    at least one of each kind, and the placeholders actually landed."""
    rows = QUERIES["text_pii_redact"](spark, sf_dir).collect()
    assert rows
    pats = [re.compile(p) for p in (_PII_EMAIL_RE, _PII_IP_RE, _PII_PHONE_RE)]
    for r in rows:
        assert r.n_email >= 1 and r.n_ip >= 1 and r.n_phone >= 1
        for pat in pats:
            assert not pat.search(r.clean_text), (r.doc_id, pat.pattern)
        assert "<EMAIL>" in r.clean_text and "<IP>" in r.clean_text
        assert "<PHONE>" in r.clean_text


def test_quantization_reconstruction_bound(spark, sf_dir):
    """Codes stay in int8 range and reconstruction error per coordinate
    is at most scale/2 (+ rounding slack), so mse <= (scale/2)^2."""
    emb = {
        r.vec_id: r.embedding
        for r in load_table(spark, sf_dir, "embeddings").collect()
    }
    rows = QUERIES["embedding_quantize_int8"](spark, sf_dir).collect()
    assert len(rows) == len(emb)
    for r in rows:
        codes = [int(c) for c in r.q8_csv.split(",")]
        assert len(codes) == len(emb[r.vec_id])
        assert all(-127 <= c <= 127 for c in codes)
        half = r.qscale / 2 * (1 + 1e-6)
        for x, c in zip(emb[r.vec_id], codes):
            assert abs(float(x) - c * r.qscale) <= half
        assert 0.0 <= r.mse <= (r.qscale / 2) ** 2 * (1 + 1e-6)


def test_zscore_outliers_match_python_rederivation(spark, sf_dir):
    """The flagged set equals a plain-Python z-score computation."""
    ev = load_table(spark, sf_dir, "events").select(
        "event_id", "event_type", "value"
    ).collect()
    by_type: dict[str, list[float]] = {}
    for r in ev:
        by_type.setdefault(r.event_type, []).append(r.value)
    stats = {}
    for t, vals in by_type.items():
        mu = sum(vals) / len(vals)
        sigma = math.sqrt(sum((v - mu) ** 2 for v in vals) / len(vals))
        stats[t] = (mu, sigma)
    want = {
        r.event_id
        for r in ev
        if abs((r.value - stats[r.event_type][0]) / stats[r.event_type][1]) > 2
    }
    got = {r.event_id for r in QUERIES["value_zscore_outliers"](spark, sf_dir).collect()}
    assert got == want


def test_boilerplate_spans_match_python_rederivation(spark, sf_dir):
    """Every reported span hash really occurs in >= the threshold number
    of distinct documents, and no qualifying span is missed — re-derived
    with a plain-Python implementation of the same two-level gram hash."""
    from kafka_streams_tcp_reconciliation_spark.functions.hashing import BASE_A, BASE_B, MOD
    from kafka_streams_tcp_reconciliation_spark.plans.pipeline import _BP_MIN_DOCS, _BP_N

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text").collect()

    def word_hash(w: str, base: int) -> int:
        h = 0
        for ch in w:
            h = (h * base + ord(ch)) % MOD
        return h

    expected: dict[int, set[int]] = {}
    for r in docs:
        words = r.text.split(" ")
        if len(words) < _BP_N:
            continue
        wh1 = [word_hash(w, BASE_A) for w in words]
        wh2 = [word_hash(w, BASE_B) for w in words]
        grams = set()
        for i in range(len(words) - _BP_N + 1):
            g1 = g2 = 0
            for j in range(_BP_N):
                g1 = (g1 * BASE_B + wh1[i + j]) % MOD
                g2 = (g2 * BASE_A + wh2[i + j]) % MOD
            grams.add(g1 + g2 * (1 << 30))
        for g in grams:
            expected.setdefault(g, set()).add(r.doc_id)

    want = {
        g: docs_ for g, docs_ in expected.items() if len(docs_) >= _BP_MIN_DOCS
    }
    got = {
        r.gram_hash: (r.n_docs, r.first_doc)
        for r in QUERIES["boilerplate_ngram_spans"](spark, sf_dir).collect()
    }
    assert set(got) == set(want)
    for g, (n, first) in got.items():
        assert n == len(want[g])
        assert first == min(want[g])


def test_domain_quota_cap_and_determinism(spark, sf_dir):
    """At most N docs per source, the kept set is identical across two
    runs (no RNG), and every source with >= N docs is filled exactly."""
    from collections import Counter

    from kafka_streams_tcp_reconciliation_spark.plans.pipeline import _QUOTA_PER_SOURCE

    rows1 = QUERIES["domain_quota_sample"](spark, sf_dir).collect()
    rows2 = QUERIES["domain_quota_sample"](spark, sf_dir).collect()
    assert {(r.doc_id, r.source) for r in rows1} == {
        (r.doc_id, r.source) for r in rows2
    }
    per_source = Counter(r.source for r in rows1)
    assert all(n <= _QUOTA_PER_SOURCE for n in per_source.values())
    totals = Counter(
        r.source
        for r in load_table(spark, sf_dir, "documents").select("source").collect()
    )
    for src, total in totals.items():
        assert per_source[src] == min(total, _QUOTA_PER_SOURCE)


def test_unigram_logprob_matches_python_rederivation(spark, sf_dir):
    """Mean NLL per doc equals a plain-Python recomputation of the same
    integer micro-nat pipeline (corpus-trained unigram LM)."""
    import math as _math
    from collections import Counter

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text").collect()
    vocab: Counter = Counter()
    per_doc: dict[int, Counter] = {}
    for r in docs:
        terms = [t for t in r.text.split(" ") if t]
        per_doc[r.doc_id] = Counter(terms)
        vocab.update(terms)
    tot = sum(vocab.values())
    logp_micro = {
        t: int(round(_math.log(c / tot) * 1_000_000)) for t, c in vocab.items()
    }
    got = {
        r.doc_id: (r.n_tokens, r.mean_nll_micro)
        for r in QUERIES["unigram_logprob_score"](spark, sf_dir).collect()
    }
    assert set(got) == set(per_doc)
    for doc_id, tf in per_doc.items():
        n_tokens = sum(tf.values())
        total_micro = sum(c * logp_micro[t] for t, c in tf.items())
        mean_nll = (-total_micro) // n_tokens
        assert got[doc_id] == (n_tokens, mean_nll), doc_id


def test_pq_adc_matches_numpy_rederivation(spark, sf_dir):
    """PQ encode + ADC top-k equals an independent numpy implementation:
    same init-only codebooks, micro-unit rounding, argmin tie-breaks, and
    (adc, neighbor_id) ranking."""
    import numpy as np

    from kafka_streams_tcp_reconciliation_spark.plans.clustering import (
        _PQ_K,
        _PQ_M,
        _PQ_QUERIES,
        _PQ_SUBDIM,
        _PQ_TOPK,
    )

    emb = {
        int(r.vec_id): np.asarray([float(v) for v in r.embedding])
        for r in load_table(spark, sf_dir, "embeddings").collect()
    }
    # codebook[m][j] = subvector m of vector j
    cb = {
        (m, j): emb[j][m * _PQ_SUBDIM : (m + 1) * _PQ_SUBDIM]
        for j in range(_PQ_K)
        for m in range(_PQ_M)
    }

    def dmicro(sv, cv) -> int:
        # left-fold sum in position order, like both engines
        acc = 0.0
        for d in ((sv - cv) * (sv - cv)):
            acc += d
        return int(round(1_000_000 * acc))

    def codes(v):
        out = []
        for m in range(_PQ_M):
            sv = v[m * _PQ_SUBDIM : (m + 1) * _PQ_SUBDIM]
            out.append(
                min(range(_PQ_K), key=lambda j: (dmicro(sv, cb[(m, j)]), j))
            )
        return out

    enc = {vid: codes(v) for vid, v in emb.items()}
    want = {}
    for qid in range(_PQ_QUERIES):
        lut = {
            (m, j): dmicro(
                emb[qid][m * _PQ_SUBDIM : (m + 1) * _PQ_SUBDIM], cb[(m, j)]
            )
            for m in range(_PQ_M)
            for j in range(_PQ_K)
        }
        scored = sorted(
            (sum(lut[(m, c[m])] for m in range(_PQ_M)), vid)
            for vid, c in enc.items()
            if vid != qid
        )
        for rank, (adc, vid) in enumerate(scored[:_PQ_TOPK], start=1):
            want[(qid, vid)] = (adc, rank)

    got = {
        (int(r.query_id), int(r.neighbor_id)): (int(r.adc_micro), int(r.rank))
        for r in QUERIES["similarity_pq_adc"](spark, sf_dir).collect()
    }
    assert got == want


def test_rolling_dau_matches_python_rederivation(spark, sf_dir):
    """Trailing-24h distinct users equals a brute-force Python scan:
    for each observed hour H, |{user : activity in (H-23 .. H)}|."""
    ev = load_table(spark, sf_dir, "events").select("ts", "user_id").collect()
    from collections import defaultdict

    epoch = __import__("datetime").datetime(2024, 1, 1)
    by_hour: dict[int, set[int]] = defaultdict(set)
    for r in ev:
        hb = int((r.ts - epoch).total_seconds() // 3600)
        by_hour[hb].add(r.user_id)
    want = {
        h: len(set().union(*(by_hour.get(h - k, set()) for k in range(24))))
        for h in by_hour
    }
    rows = QUERIES["rolling_active_users_24h"](spark, sf_dir).collect()
    got = {}
    for r in rows:
        ts = __import__("datetime").datetime.strptime(
            r.window_start, "%Y-%m-%d %H:%M:%S"
        )
        got[int((ts - epoch).total_seconds() // 3600)] = r.active_users
    assert got == want


def test_transition_matrix_rows_sum_to_one(spark, sf_dir):
    """Each from_type's probabilities sum to ~1 and counts match a plain
    Python pass over per-user (ts, event_id)-ordered sequences."""
    ev = load_table(spark, sf_dir, "events").select(
        "user_id", "ts", "event_id", "event_type"
    ).collect()
    from collections import Counter, defaultdict

    seqs: dict[int, list] = defaultdict(list)
    for r in ev:
        seqs[r.user_id].append((r.ts, r.event_id, r.event_type))
    want: Counter = Counter()
    for s in seqs.values():
        s.sort()
        for (_, _, a), (_, _, b) in zip(s, s[1:]):
            want[(a, b)] += 1
    rows = QUERIES["event_transition_matrix"](spark, sf_dir).collect()
    got = {(r.from_type, r.to_type): r.n for r in rows}
    assert got == dict(want)
    by_from: dict[str, float] = defaultdict(float)
    for r in rows:
        by_from[r.from_type] += r.p
    for f, total in by_from.items():
        assert abs(total - 1.0) < 1e-4, (f, total)


def test_session_paths_conserve_events_and_sessions(spark, sf_dir):
    """Invariants: total path tokens == total events; total sessions ==
    the session-window query's session count (same 30-min gap)."""
    rows = QUERIES["session_event_paths"](spark, sf_dir).collect()
    n_events = load_table(spark, sf_dir, "events").count()
    total_tokens = sum(
        (r.path.count(">") + 1) * r.n_sessions for r in rows
    )
    assert total_tokens == n_events
    n_sessions = sum(r.n_sessions for r in rows)
    assert n_sessions == QUERIES["session_window_stats"](spark, sf_dir).count()


def test_mad_outliers_match_python_rederivation(spark, sf_dir):
    """Flagged set equals a plain-Python median/MAD computation (linear
    interpolation percentiles, matching Spark's percentile())."""
    import statistics

    ev = load_table(spark, sf_dir, "events").select(
        "event_id", "event_type", "value"
    ).collect()
    from collections import defaultdict

    vals: dict[str, list[float]] = defaultdict(list)
    for r in ev:
        vals[r.event_type].append(r.value)

    def q50(xs: list[float]) -> float:
        xs = sorted(xs)
        n = len(xs)
        # linear interpolation at rank 0.5*(n-1), Spark/DuckDB semantics
        pos = 0.5 * (n - 1)
        lo = int(pos)
        frac = pos - lo
        return xs[lo] if frac == 0 else xs[lo] + frac * (xs[lo + 1] - xs[lo])

    flagged_want = set()
    for t, xs in vals.items():
        med = q50(xs)
        mad = q50([abs(x - med) for x in xs])
        for r in ev:
            if r.event_type == t and abs((r.value - med) / (1.4826 * mad)) > 3.0:
                flagged_want.add(r.event_id)
    got = {r.event_id for r in QUERIES["events_mad_outliers"](spark, sf_dir).collect()}
    assert got == flagged_want


def test_scd2_intervals_partition_the_timeline(spark, sf_dir):
    """Per user: exactly one open interval, intervals are contiguous
    (valid_to == next valid_from) and strictly ordered."""
    from collections import defaultdict

    rows = QUERIES["scd2_purchase_value_history"](spark, sf_dir).collect()
    by_user = defaultdict(list)
    for r in rows:
        by_user[r.user_id].append(r)
    for u, ivs in by_user.items():
        ivs.sort(key=lambda r: r.valid_from)
        opens = [r for r in ivs if r.valid_to is None]
        assert len(opens) == 1 and ivs[-1].valid_to is None, u
        assert all(r.is_current == (r.valid_to is None) for r in ivs)
        for a, b in zip(ivs, ivs[1:]):
            assert a.valid_to == b.valid_from, (u, a, b)


def test_semantic_clusters_partition_the_corpus(spark, sf_dir):
    """Cluster sizes sum to the corpus size, every seed lands in its own
    cluster (cos(seed, seed) = 1 beats any tie), and the top pair's ids
    belong to the cluster (a < b)."""
    rows = QUERIES["dedup_semantic_clusters"](spark, sf_dir).collect()
    n_corpus = load_table(spark, sf_dir, "embeddings").count()
    assert sum(r.n_members for r in rows) == n_corpus
    for r in rows:
        assert r.a_id < r.b_id
        assert -1.0 <= r.top_cosine <= 1.0


def test_proration_preserves_order_totals(spark, sf_dir):
    """Allocations per order sum EXACTLY to the order total in cents, and
    each allocation differs from the unrounded proportional share by less
    than one cent (the largest-remainder guarantee)."""
    rows = QUERIES["prorate_order_total"](spark, sf_dir).collect()
    assert rows
    orders = {
        r.o_orderkey: round(r.o_totalprice * 100)
        for r in load_table(spark, sf_dir, "orders").collect()
    }
    li = {}
    for r in load_table(spark, sf_dir, "lineitem").collect():
        li.setdefault(r.l_orderkey, []).append(
            (
                r.l_linenumber,
                round(r.l_extendedprice * 100),
                r.l_partkey,
                r.l_suppkey,
                r.l_quantity,
            )
        )
    # line_uid = 1-based rank in the same total order the query uses
    weights = {
        ok: {i + 1: t[1] for i, t in enumerate(sorted(lines))}
        for ok, lines in li.items()
    }
    by_order = {}
    for r in rows:
        by_order.setdefault(r.l_orderkey, {})[r.line_uid] = r.alloc_cents
    assert set(by_order) == set(weights)
    for ok, allocs in by_order.items():
        t = orders[ok]
        assert set(allocs) == set(weights[ok]), ok
        assert sum(allocs.values()) == t, ok
        big_w = sum(weights[ok].values())
        for uid, a in allocs.items():
            exact = t * weights[ok][uid] / big_w
            assert abs(a - exact) < 1.0, (ok, uid)


def test_interp_matches_python_rederivation(spark, sf_dir):
    """Gap rows lie on the straight line between their surrounding
    observations; observed rows pass the raw value through."""
    from collections import defaultdict
    from datetime import datetime

    obs = defaultdict(dict)  # type -> hour -> (ts, event_id, value)
    for r in load_table(spark, sf_dir, "events").collect():
        h = r.ts.replace(minute=0, second=0, microsecond=0)
        cur = obs[r.event_type].get(h)
        if cur is None or (r.ts, r.event_id) > (cur[0], cur[1]):
            obs[r.event_type][h] = (r.ts, r.event_id, r.value)
    rows = QUERIES["hourly_interp_by_type"](spark, sf_dir).collect()
    assert rows
    for r in rows:
        h = datetime.strptime(r.hour, "%Y-%m-%d %H:%M:%S")
        hours = sorted(obs[r.event_type])
        if h in obs[r.event_type]:
            assert not r.is_gap
            assert r.interp_value == obs[r.event_type][h][2]
        else:
            assert r.is_gap
            prev = max(x for x in hours if x < h)
            nxt = min(x for x in hours if x > h)
            pv = obs[r.event_type][prev][2]
            nv = obs[r.event_type][nxt][2]
            frac = (h - prev).total_seconds() / (nxt - prev).total_seconds()
            expect = pv + (nv - pv) * frac
            assert math.isclose(r.interp_value, expect, rel_tol=1e-9), (
                r.event_type,
                r.hour,
            )


def test_vocab_oov_rate_bounds_and_rederivation(spark, sf_dir):
    """OOV rates in [0,1]; token counts match a plain-Python recount and
    the vocabulary really is the top-K by (count desc, word)."""
    from collections import Counter

    texts = {
        r.doc_id: r.text.split(" ")
        for r in load_table(spark, sf_dir, "documents").collect()
    }
    counts = Counter()
    for ws in texts.values():
        counts.update(ws)
    k = 1000
    vocab = set(
        w for w, _ in sorted(counts.items(), key=lambda kv: (-kv[1], kv[0]))[:k]
    )
    rows = QUERIES["vocab_oov_rate"](spark, sf_dir).collect()
    assert len(rows) == len(texts)
    for r in rows:
        ws = texts[r.doc_id]
        assert r.n_tokens == len(ws)
        assert r.n_oov == sum(1 for w in ws if w not in vocab)
        assert 0.0 <= r.oov_rate <= 1.0


def test_growth_accounting_identity(spark, sf_dir):
    """new + retained + resurrected == active every day, and lifetime new
    equals the distinct-user count."""
    rows = QUERIES["growth_accounting_daily"](spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r.n_new + r.n_retained + r.n_resurrected == r.n_active, r.day
    n_users = (
        load_table(spark, sf_dir, "events").select("user_id").distinct().count()
    )
    assert sum(r.n_new for r in rows) == n_users


def test_equidepth_deciles_match_python_rederivation(spark, sf_dir):
    """Each boundary is the smallest cents value with cum·10 ≥ k·n."""
    cents = sorted(
        round(r.o_totalprice * 100)
        for r in load_table(spark, sf_dir, "orders").collect()
    )
    n = len(cents)
    rows = {r.k: r.boundary_cents for r in
            QUERIES["equidepth_deciles_order_total"](spark, sf_dir).collect()}
    assert set(rows) == set(range(1, 10))
    for k, b in rows.items():
        # cum at b reaches the cut, cum just below b does not
        cum_b = sum(1 for c in cents if c <= b)
        cum_lt = sum(1 for c in cents if c < b)
        assert cum_b * 10 >= k * n and cum_lt * 10 < k * n, k
