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
