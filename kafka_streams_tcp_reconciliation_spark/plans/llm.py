"""LLM-data-pipeline operators (SURVEY.md §2.11 X1–X5) over the
``documents`` and ``embeddings`` tables.

These are the training-data-curation operators a 100 TB corpus pipeline
needs — text analysis, deduplication (exact → fuzzy), similarity search —
each expressed as pure DataFrame compositions (no driver-side loops, no
Python UDFs in hash/score paths) so they scale with partition tuning only.

Cross-engine determinism: every hash-based operator uses the polynomial
hash family in ``functions/hashing.py``, which evaluates to identical
int64s in Spark SQL and DuckDB SQL — so even MinHash/SimHash get the
strong value-hash oracle check rather than the weak rows-only tier.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from kafka_streams_tcp_reconciliation_spark.functions.hashing import (
    duck_hash64,
    duck_poly_hash,
    spark_hash64,
    spark_poly_hash,
)
from kafka_streams_tcp_reconciliation_spark.plans import register
from kafka_streams_tcp_reconciliation_spark.sources.tables import load_table

# ---------------------------------------------------------------------------
# X4 — text analysis
# ---------------------------------------------------------------------------

# Tokenizer used consistently in all text ops: documents.text is
# single-space separated lowercase words (synthetic corpus), so
# split-on-space is exact; the regex token count is the BPE-ish alternative
# (runs of letters / digits / single other chars).
_TOKEN_RE = "[a-z]+|[0-9]+|[^a-z0-9 ]"

_STOPWORDS = ("the", "a", "of", "and", "is", "to", "in")
_SW_LIST = ", ".join(f"'{w}'" for w in _STOPWORDS)


@register(
    "text_token_stats",
    oracle=f"""
    SELECT doc_id,
           len(string_split(text, ' '))                  AS n_tokens,
           len(list_distinct(string_split(text, ' ')))   AS n_distinct,
           len(regexp_extract_all(text, '{_TOKEN_RE}'))  AS n_regex_tokens,
           round((length(text) - len(string_split(text, ' ')) + 1)
                 / CAST(len(string_split(text, ' ')) AS DOUBLE), 4)
                                                         AS avg_token_len
    FROM documents
    """,
)
def text_token_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token counting (X4): whitespace tokens, distinct tokens, a BPE-ish
    regex token count, and mean token length — all JVM-side built-ins."""
    docs = load_table(spark, sf_dir, "documents")
    words = F.split("text", " ")
    n_tokens = F.size(words).cast("long")
    return docs.select(
        "doc_id",
        n_tokens.alias("n_tokens"),
        F.size(F.array_distinct(words)).cast("long").alias("n_distinct"),
        F.size(F.expr(f"regexp_extract_all(text, '{_TOKEN_RE}', 0)"))
        .cast("long")
        .alias("n_regex_tokens"),
        F.round(
            (F.length("text") - n_tokens + F.lit(1)) / n_tokens.cast("double"), 4
        ).alias("avg_token_len"),
    )


@register(
    "text_quality_score",
    oracle=f"""
    WITH feat AS (
        SELECT doc_id,
               string_split(text, ' ') AS words,
               len(string_split(text, ' ')) AS n_tokens
        FROM documents
    )
    SELECT doc_id,
           n_tokens,
           round(len(list_distinct(words)) / CAST(n_tokens AS DOUBLE), 6)
               AS distinct_ratio,
           round(len(list_filter(words, w -> w IN ({_SW_LIST})))
                 / CAST(n_tokens AS DOUBLE), 6) AS stopword_ratio,
           round(0.4 * (len(list_distinct(words)) / CAST(n_tokens AS DOUBLE))
                 + 0.3 * least(n_tokens / 100.0, 1.0)
                 + 0.3 * (1.0 - len(list_filter(words, w -> w IN ({_SW_LIST})))
                          / CAST(n_tokens AS DOUBLE)), 6) AS quality
    FROM feat
    """,
)
def text_quality_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heuristic document quality (X4): lexical diversity, length,
    stopword density folded into one [0,1] score. Per-row double
    arithmetic — bitwise identical across engines, rounded anyway."""
    docs = load_table(spark, sf_dir, "documents")
    d = docs.select(
        "doc_id",
        F.split("text", " ").alias("words"),
        F.size(F.split("text", " ")).cast("long").alias("n_tokens"),
    )
    nt = F.col("n_tokens").cast("double")
    distinct_ratio = F.size(F.array_distinct("words")) / nt
    sw = F.expr(f"size(filter(words, w -> w IN ({_SW_LIST})))")
    stopword_ratio = sw / nt
    return d.select(
        "doc_id",
        "n_tokens",
        F.round(distinct_ratio, 6).alias("distinct_ratio"),
        F.round(stopword_ratio, 6).alias("stopword_ratio"),
        F.round(
            0.4 * distinct_ratio
            + 0.3 * F.least(F.col("n_tokens") / 100.0, F.lit(1.0))
            + 0.3 * (1.0 - stopword_ratio),
            6,
        ).alias("quality"),
    )


# Marker function-words per language for the n-gram-free lang-ID heuristic.
# Deterministic argmax with fixed priority en > de > fr > es.
_LANG_MARKERS = {
    "en": ("the", "of", "and", "is"),
    "de": ("der", "die", "das", "und"),
    "fr": ("le", "les", "et", "est"),
    "es": ("el", "los", "las", "y"),
}


def _marker_filter_spark(lang: str) -> str:
    lst = ", ".join(f"'{w}'" for w in _LANG_MARKERS[lang])
    return f"size(filter(split(text, ' '), w -> w IN ({lst})))"


def _marker_filter_duck(lang: str) -> str:
    lst = ", ".join(f"'{w}'" for w in _LANG_MARKERS[lang])
    return f"len(list_filter(string_split(text, ' '), w -> w IN ({lst})))"


@register(
    "text_lang_id",
    oracle=f"""
    WITH hits AS (
        SELECT doc_id, lang,
               {_marker_filter_duck("en")} AS h_en,
               {_marker_filter_duck("de")} AS h_de,
               {_marker_filter_duck("fr")} AS h_fr,
               {_marker_filter_duck("es")} AS h_es
        FROM documents
    )
    SELECT doc_id, lang,
           CASE WHEN greatest(h_en, h_de, h_fr, h_es) = 0 THEN 'unknown'
                WHEN h_en = greatest(h_en, h_de, h_fr, h_es) THEN 'en'
                WHEN h_de = greatest(h_en, h_de, h_fr, h_es) THEN 'de'
                WHEN h_fr = greatest(h_en, h_de, h_fr, h_es) THEN 'fr'
                ELSE 'es' END AS pred_lang,
           CASE WHEN greatest(h_en, h_de, h_fr, h_es) = 0 THEN 'unknown'
                WHEN h_en = greatest(h_en, h_de, h_fr, h_es) THEN 'en'
                WHEN h_de = greatest(h_en, h_de, h_fr, h_es) THEN 'de'
                WHEN h_fr = greatest(h_en, h_de, h_fr, h_es) THEN 'fr'
                ELSE 'es' END = lang AS correct
    FROM hits
    """,
)
def text_lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Language-ID heuristic (X4): function-word hit counts per language,
    deterministic argmax. (On the synthetic corpus the text is the same
    vocabulary for every `lang` value — the operator's value is the
    scalable shape: per-row marker scan, no shuffle.)"""
    docs = load_table(spark, sf_dir, "documents")
    hits = docs.select(
        "doc_id",
        "lang",
        *[
            F.expr(_marker_filter_spark(lang)).cast("long").alias(f"h_{lang}")
            for lang in _LANG_MARKERS
        ],
    )
    top = F.greatest(*[F.col(f"h_{lang}") for lang in _LANG_MARKERS])
    pred = (
        F.when(top == 0, "unknown")
        .when(F.col("h_en") == top, "en")
        .when(F.col("h_de") == top, "de")
        .when(F.col("h_fr") == top, "fr")
        .otherwise("es")
    )
    return hits.select(
        "doc_id", "lang", pred.alias("pred_lang"), (pred == F.col("lang")).alias("correct")
    )


@register(
    "text_fingerprint",
    oracle=f"""
    SELECT doc_id,
           {duck_hash64("text")} AS fp64,
           list_min(list_transform(range(1, length(text) - 6),
                    i -> {duck_poly_hash("substring(text, i, 8)")})) AS fp_min8
    FROM documents
    """,
)
def text_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Document fingerprinting (X4): whole-document rolling hash plus the
    minimum char-8-gram hash (winnowing-style representative). Pure int64
    arithmetic — identical in both engines, strong oracle check."""
    docs = load_table(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        F.expr(spark_hash64("text")).alias("fp64"),
        F.expr(
            f"array_min(transform(sequence(1, length(text) - 7),"
            f" i -> {spark_poly_hash('substring(text, i, 8)')}))"
        ).alias("fp_min8"),
    )
