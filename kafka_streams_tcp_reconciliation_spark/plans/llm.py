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

import os as _os

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from kafka_streams_tcp_reconciliation_spark.functions.hashing import (
    duck_hash64,
    duck_poly_hash,
    safe_seq1,
    spark_hash64,
    spark_poly_hash,
)
from kafka_streams_tcp_reconciliation_spark.operators import dedup as dd
from kafka_streams_tcp_reconciliation_spark.operators import similarity as sim
from kafka_streams_tcp_reconciliation_spark.plans import register
from kafka_streams_tcp_reconciliation_spark.sources.tables import load_table, scale_out

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
    FROM documents WHERE text IS NOT NULL
    """,
)
def text_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Document fingerprinting (X4): whole-document rolling hash plus the
    minimum char-8-gram hash (winnowing-style representative). Pure int64
    arithmetic — identical in both engines, strong oracle check."""
    # a missing document has no fingerprint (and the engines' hash folds
    # disagree on NULL: Spark NULL vs DuckDB 0) — drop NULL text mirrored
    docs = scale_out(load_table(spark, sf_dir, "documents")).filter(
        F.col("text").isNotNull()
    )
    return docs.select(
        "doc_id",
        F.expr(spark_hash64("text")).alias("fp64"),
        # safe_seq1 guard: sub-8-char docs get a NULL fp_min8 (empty gram
        # range) exactly like the oracle's range(1, len-6); the bare
        # sequence DESCENDED through 0 and substring(text, -1, 8) then
        # silently hashed the doc's TAIL — a wrong fingerprint, not a crash
        F.expr(
            f"array_min(transform({safe_seq1('length(text) - 7')},"
            f" i -> {spark_poly_hash('substring(text, i, 8)')}))"
        ).alias("fp_min8"),
    )


# PII patterns: RE2 (DuckDB) and java.util.regex (Spark) agree on this
# subset — character classes, bounded/unbounded counted repeats, \b — so
# the redaction is bit-identical cross-engine. No lookaround, no backrefs.
_PII_EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
_PII_IP_RE = r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b"
_PII_PHONE_RE = r"\+\d[\d-]{6,}\d"


@register(
    "text_pii_redact",
    oracle=f"""
    WITH synth AS (
        SELECT doc_id,
               text || ' Contact user' || CAST(doc_id AS VARCHAR)
                    || '@example.com or 10.0.'
                    || CAST(doc_id % 256 AS VARCHAR) || '.7 tel +1-555-'
                    || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0') AS raw
        FROM documents
    )
    SELECT doc_id,
           regexp_replace(
               regexp_replace(
                   regexp_replace(raw, '{_PII_EMAIL_RE}', '<EMAIL>', 'g'),
                   '{_PII_IP_RE}', '<IP>', 'g'),
               '{_PII_PHONE_RE}', '<PHONE>', 'g') AS clean_text,
           len(regexp_extract_all(raw, '{_PII_EMAIL_RE}')) AS n_email,
           len(regexp_extract_all(raw, '{_PII_IP_RE}'))    AS n_ip,
           len(regexp_extract_all(raw, '{_PII_PHONE_RE}')) AS n_phone
    FROM synth
    """,
)
def text_pii_redact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII redaction (X4): replace emails, IPv4 addresses, and phone
    numbers with placeholder tokens and count each kind — the scrub pass a
    training corpus gets before packing. Narrow per-row regexp work, no
    shuffle, scales linearly.

    The fixture corpus carries no PII, so the query first synthesizes a
    deterministic contact line from doc_id (identically in both engines)
    and then redacts it — the oracle checks real substitutions, not a
    no-op. Redaction order (email → ip → phone) matches on both sides so
    intermediate placeholders can't shadow later patterns.
    """
    docs = scale_out(load_table(spark, sf_dir, "documents"))
    raw = F.concat(
        F.col("text"),
        F.lit(" Contact user"),
        F.col("doc_id").cast("string"),
        F.lit("@example.com or 10.0."),
        (F.col("doc_id") % 256).cast("string"),
        F.lit(".7 tel +1-555-"),
        F.lpad((F.col("doc_id") % 10000).cast("string"), 4, "0"),
    )
    synth = docs.select("doc_id", raw.alias("raw"))
    clean = F.regexp_replace(
        F.regexp_replace(
            F.regexp_replace("raw", _PII_EMAIL_RE, "<EMAIL>"),
            _PII_IP_RE,
            "<IP>",
        ),
        _PII_PHONE_RE,
        "<PHONE>",
    )
    return synth.select(
        "doc_id",
        clean.alias("clean_text"),
        F.size(F.regexp_extract_all("raw", F.lit(_PII_EMAIL_RE), 0))
        .cast("long")
        .alias("n_email"),
        F.size(F.regexp_extract_all("raw", F.lit(_PII_IP_RE), 0))
        .cast("long")
        .alias("n_ip"),
        F.size(F.regexp_extract_all("raw", F.lit(_PII_PHONE_RE), 0))
        .cast("long")
        .alias("n_phone"),
    )


# ---------------------------------------------------------------------------
# X1/X2 — deduplication: exact → n-gram Jaccard → MinHash-LSH → SimHash
# ---------------------------------------------------------------------------


@register(
    "dedup_exact_docs",
    oracle="""
    SELECT md5(text)     AS text_hash,
           min(doc_id)   AS keeper_doc_id,
           count(*)      AS n_copies
    FROM documents
    GROUP BY md5(text)
    """,
)
def dedup_exact_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup (X1): hash-groupBy on document content. The keeper is
    the minimum doc_id per content hash. One shuffle on the hash — the
    canonical 100 TB exact-dedup plan (partial agg combines map-side)."""
    docs = load_table(spark, sf_dir, "documents")
    return docs.groupBy(F.md5("text").alias("text_hash")).agg(
        F.min("doc_id").alias("keeper_doc_id"),
        F.count(F.lit(1)).alias("n_copies"),
    )


_JACC_N = 3  # word n-gram size for fuzzy dedup
_JACC_THRESHOLD = 0.8

# Stop-shingle document-frequency cap — hoisted round 8 into the shared
# helpers in operators/dedup.py (stop_shingle_filter / capped_sizes /
# duck_stop_shingle_ctes) so EVERY inverted-index consumer in this module
# (dedup_ngram_jaccard, curate_corpus, dedup_shingle_containment) carries
# the same guard; see the rationale + round-7 measurements at the knob's
# definition. 0 = off (the exact default).
_STOP_DF = dd.STOP_SHINGLE_DF


@register(
    "dedup_ngram_jaccard",
    oracle=f"""
    WITH wh AS (
        SELECT doc_id,
               {dd.duck_word_polyhashes_expr("text", 31)} AS wh1,
               {dd.duck_word_polyhashes_expr("text", 131)} AS wh2
        FROM documents WHERE text IS NOT NULL
    ),
    sh AS (
        SELECT doc_id,
               {dd.duck_gram_fold64_expr("wh1", "wh2", _JACC_N)} AS shingles
        FROM wh
    ),
    {dd.duck_stop_shingle_ctes(_STOP_DF)}
    {dd.DUCK_SIZES_CTE}
    inter AS (
        SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS n_inter
        FROM ex a JOIN ex b ON a.s = b.s AND a.doc_id < b.doc_id
        GROUP BY 1, 2
    )
    SELECT doc_a, doc_b,
           round(n_inter / CAST(x.n_sh + y.n_sh - n_inter
                                AS DOUBLE), 6) AS jaccard
    FROM inter
    JOIN sz x ON x.doc_id = doc_a
    JOIN sz y ON y.doc_id = doc_b
    WHERE n_inter / CAST(x.n_sh + y.n_sh - n_inter AS DOUBLE)
          >= {_JACC_THRESHOLD}
    """,
)
def dedup_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """n-gram Jaccard near-dup (X2, exact variant): candidate pairs from an
    inverted-index self-join on shared shingles, then exact Jaccard >= 0.8.
    Cost is O(collisions), not O(n²). Shingles are the 64-bit two-level
    word-gram hashes (mirrored in the oracle): the self-join shuffle
    carries 8-byte keys instead of n-gram strings, per-doc hashing is
    O(words) instead of O(gram chars), and at 2^60 width cross-doc
    collisions are negligible — at corpus scale the exchange is the whole
    cost of this op.

    Scale knob (round 7; hoisted to operators/dedup.py round 8): set
    SPARK_GRAFT_STOPSHINGLE_DF to drop shingles with document frequency
    above the cap from the whole pipeline (index, intersections, sizes),
    bounding the join's per-key fanout; off by default so test-scale
    semantics stay exact. Plan and oracle share the cap; parity is
    locked at a binding cutoff (tests/test_scale_ops.py).
    """
    # NULL text carries no shingles; the engines' NULL-list semantics
    # diverge (Spark drops such docs through NULL joins, DuckDB folds
    # them to a zero signature pairing with everything) — filter mirrored
    docs = scale_out(load_table(spark, sf_dir, "documents")).filter(
        F.col("text").isNotNull()
    )
    # Arrow gram kernel (round 12): per-doc DISTINCT shingle-hash sets in
    # one mapInPandas pass — same integers as the HOF two-level fold the
    # oracle mirrors (parity lock in tests/test_dup_heavy_skew.py); the
    # cache feeds both the candidate index and the exact-verify rejoin
    sh = dd.gram_set_frame(docs, _JACC_N).select(
        "doc_id", F.col("hs").alias("shingles")
    ).cache()
    if not _STOP_DF:
        # PPJoin prune (round 13, guide §2.3/§3): candidates from the
        # prefix index only, with the lossless length + positional
        # filters in the join condition, then exact array_intersect
        # verification — bit-identical rows to the unpruned index join
        # (the DuckDB oracle keeps that form as the independent path;
        # lose-no-pair property locked in tests/test_dup_heavy_skew.py).
        # The round-12 sf1.0 sweep measured the unpruned candidate join
        # saturating on this small-vocabulary corpus (44 s, flat at 10×
        # data); the prefix index bounds enumerated pairs by
        # prefix-postings² per key.
        pairs = dd.ppjoin_jaccard_pairs(sh, _JACC_THRESHOLD)
        jacc = F.col("n_inter") / (
            F.col("na") + F.col("nb") - F.col("n_inter")
        ).cast("double")
        return pairs.filter(jacc >= _JACC_THRESHOLD).select(
            "doc_a", "doc_b", F.round(jacc, 6).alias("jaccard")
        )
    # Stop-shingle cap ON: post-cap sets are not the stored arrays, so the
    # exact exploded-index machinery (with the cap's bounded fanout as the
    # scale insurance) stays the one true path.
    ex = dd.stop_shingle_filter(
        sh.select("doc_id", F.explode("shingles").alias("s")), _STOP_DF
    ).cache()
    sizes = dd.capped_sizes(sh, ex)
    inter = (
        ex.alias("a")
        .join(
            ex.alias("b"),
            (F.col("a.s") == F.col("b.s")) & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .groupBy(
            F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b")
        )
        .agg(F.count(F.lit(1)).alias("n_inter"))
    )
    jacc = F.col("n_inter") / (
        F.col("x.n_sh") + F.col("y.n_sh") - F.col("n_inter")
    ).cast("double")
    return (
        inter.join(sizes.alias("x"), F.col("x.doc_id") == F.col("doc_a"))
        .join(sizes.alias("y"), F.col("y.doc_id") == F.col("doc_b"))
        .filter(jacc >= _JACC_THRESHOLD)
        .select("doc_a", "doc_b", F.round(jacc, 6).alias("jaccard"))
    )


_MH_NUM = 32  # MinHash signature length
# Banding default: 8 bands x 4 rows (bands x rows == signature length).
# Round 7 steepened the S-curve from 16x2: the sf1->sf10 sweep measured
# r=2 banding admitting a CONSTANT ~1.4e-6 fraction of all pairs on this
# corpus (candidates 1.8k -> 172k -> 16.6M, exactly quadratic, while true
# dups stayed linear 8 -> 80 -> 801) because moderately-similar word-soup
# pairs (s~0.3-0.5) pass two-row bands 78-99% of the time. r=4 drops
# s=0.3 admission to 6.3% and s=0.5 to 40%, while J>=0.8 recall stays
# 1-(1-0.8^4)^8 = 98.6% and EXACT duplicates (s=1, the fixtures' dup
# class) are admitted with probability 1 under any banding. Both
# engines share these constants, so recall misses stay mirrored.
#
# ACCEPTED DEFAULT SHIFT (round 7, documented round 8): vs the original
# 16x2 banding, J>=0.8 recall drops ~99.99% -> 98.6% — a deliberate
# trade for candidate volume that is bounded at scale (19-20x fewer
# candidates at sf10). Users who want the old eager-recall curve set
# SPARK_GRAFT_MH_BANDS=16 (rows = 32/bands follows): import-time env
# knob like the other scale levers, read by plan AND oracle, parity
# locked by tests/test_scale_ops.py.
_MH_BANDS = int(_os.environ.get("SPARK_GRAFT_MH_BANDS", "8"))
if not (1 <= _MH_BANDS <= _MH_NUM) or _MH_NUM % _MH_BANDS:
    raise ValueError(
        f"SPARK_GRAFT_MH_BANDS must be a divisor of {_MH_NUM} in "
        f"[1, {_MH_NUM}] (rows = {_MH_NUM}/bands), got {_MH_BANDS}"
    )
_MH_ROWS = _MH_NUM // _MH_BANDS


@register(
    "dedup_minhash_lsh",
    oracle=f"""
    WITH wh AS (
        SELECT doc_id,
               {dd.duck_word_polyhashes_expr("text", 31)} AS wh1,
               {dd.duck_word_polyhashes_expr("text", 131)} AS wh2
        FROM documents WHERE text IS NOT NULL
    ),
    hs AS (
        -- len > 0 mirrors the Spark-side filter: a doc shorter than the
        -- gram width has an EMPTY hash set; MinHash/Jaccard are undefined
        -- on empty sets, and LSH bands would bucket ALL such docs together
        -- (a hot key at scale, then 0/0 in the exact-Jaccard verify)
        SELECT * FROM (
            SELECT doc_id,
                   {dd.duck_gram_fold64_expr("wh1", "wh2", _JACC_N)} AS hs
            FROM wh
        ) WHERE len(hs) > 0
    ),
    sig AS (
        SELECT doc_id, {dd.duck_minhash_sig_expr("hs", _MH_NUM)} AS sig FROM hs
    ),
    bands AS (
        SELECT doc_id, unnest({dd.duck_band_select("sig", _MH_BANDS, _MH_ROWS)},
                              recursive := true)
        FROM sig
    ),
    cand AS (
        SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
        FROM bands a
        JOIN bands b ON a.band = b.band AND a.bkey = b.bkey
                    AND a.doc_id < b.doc_id
    )
    SELECT doc_a, doc_b,
           round(len(list_intersect(x.hs, y.hs))
                 / CAST(len(x.hs) + len(y.hs) - len(list_intersect(x.hs, y.hs))
                        AS DOUBLE), 6) AS jaccard
    FROM cand
    JOIN hs x ON x.doc_id = doc_a
    JOIN hs y ON y.doc_id = doc_b
    WHERE len(list_intersect(x.hs, y.hs))
          / CAST(len(x.hs) + len(y.hs) - len(list_intersect(x.hs, y.hs))
                 AS DOUBLE) >= {_JACC_THRESHOLD}
    """,
)
def dedup_minhash_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash+LSH near-dup (X2, scale path): shingle → 32-hash MinHash
    signature → 8 bands x 4 rows → bucket self-join for candidates →
    exact Jaccard (on hash sets) >= 0.8 to verify. (Banding rationale
    and the measured sf1→sf10 candidate curves: see _MH_BANDS above.)

    This is the 100 TB fuzzy-dedup plan: per-doc signature compute is
    embarrassingly parallel; the only shuffles are the bucket join
    (key = band bucket) and the two verify joins (key = doc_id). The DuckDB
    oracle mirrors the full pipeline with identical hash constants, so the
    check is the strong value-hash tier despite LSH's approximate recall
    (a pair missed by banding is missed identically on both sides).

    Shingle features are the two-level 64-bit word-gram hashes: per-doc
    cost O(words·n) integer ops instead of char-folding every gram string,
    and the verify sets are 2^60-wide (a single mod-1e9+7 hash shows
    false-positive overlap already at sf0.1).

    Since round 12 the per-doc compute (word polyhashes → gram fold →
    signature) runs in ONE Arrow/numpy ``mapInPandas`` pass
    (``operators/dedup.minhash_gram_sig_frame``), bit-identical to the
    SQL twins the DuckDB oracle still mirrors (locked by
    tests/test_dup_heavy_skew.py::test_minhash_kernel_matches_hof). The
    HOF form computed the same integers but lived OUTSIDE whole-stage
    codegen, and its interpreted lambda frames picked up per-session JIT
    profile pollution — a reproducible ~5× session-level bimodality
    (round-11 characterization) that baselines had to floor around. The
    numpy kernel's loops are compiled C: immune to interpreter profile
    state, and the slow mode is gone structurally. Docs with fewer than
    {gram-width} words are dropped INSIDE the kernel — the mirrored
    ``len(hs) > 0`` filter (empty sets are undefined under
    MinHash/Jaccard and would share one hot LSH bucket). The single
    ``.cache()`` feeds the signature banding and both verify-join sides
    from one kernel pass.
    """
    # NULL text carries no shingles; the engines' NULL-list semantics
    # diverge (Spark drops such docs through NULL joins, DuckDB folds
    # them to a zero signature pairing with everything) — filter mirrored
    docs = scale_out(load_table(spark, sf_dir, "documents")).filter(
        F.col("text").isNotNull()
    )
    gs = dd.minhash_gram_sig_frame(docs, _JACC_N, _MH_NUM).cache()
    hs = gs.select("doc_id", "hs")
    sig = gs.select("doc_id", "sig")
    cand = dd.lsh_candidate_pairs(sig, "doc_id", "sig", _MH_BANDS, _MH_ROWS)
    return _jaccard_verify(cand, hs)


def _jaccard_verify(cand: DataFrame, hs: DataFrame) -> DataFrame:
    """Exact-Jaccard verification of LSH candidate pairs against the
    cached gram-set frame — shared by the uncapped and occupancy-capped
    MinHash queries so the verify semantics stay identical."""
    n_inter = F.size(F.array_intersect(F.col("x.hs"), F.col("y.hs")))
    jacc = n_inter / (
        F.size(F.col("x.hs")) + F.size(F.col("y.hs")) - n_inter
    ).cast("double")
    return (
        cand.withColumnRenamed("id_a", "doc_a")
        .withColumnRenamed("id_b", "doc_b")
        .join(hs.alias("x"), F.col("x.doc_id") == F.col("doc_a"))
        .join(hs.alias("y"), F.col("y.doc_id") == F.col("doc_b"))
        .filter(jacc >= _JACC_THRESHOLD)
        .select("doc_a", "doc_b", F.round(jacc, 6).alias("jaccard"))
    )


# LSH bucket-occupancy cap (round 11): above this width a bucket's
# candidate clique degrades to an id-ordered chain. 64 is inactive on the
# organic fixtures (measured max occupancy: 3 at sf0.01, 14 at sf0.1) and
# fires exactly where the measured superlinearity lives — the sf100
# saturated-vocabulary fixture's hot buckets and real boilerplate-heavy
# corpora (SCALE.md round 10: uncapped 604 s at sf100).
_LSH_MAX_BUCKET = int(_os.environ.get("SPARK_GRAFT_LSH_MAX_BUCKET", "64"))


@register(
    "dedup_minhash_lsh_capped",
    oracle=f"""
    WITH wh AS (
        SELECT doc_id,
               {dd.duck_word_polyhashes_expr("text", 31)} AS wh1,
               {dd.duck_word_polyhashes_expr("text", 131)} AS wh2
        FROM documents WHERE text IS NOT NULL
    ),
    hs AS (
        SELECT * FROM (
            SELECT doc_id,
                   {dd.duck_gram_fold64_expr("wh1", "wh2", _JACC_N)} AS hs
            FROM wh
        ) WHERE len(hs) > 0
    ),
    sig AS (
        SELECT doc_id, {dd.duck_minhash_sig_expr("hs", _MH_NUM)} AS sig FROM hs
    ),
    bands AS (
        SELECT doc_id, unnest({dd.duck_band_select("sig", _MH_BANDS, _MH_ROWS)},
                              recursive := true)
        FROM sig
    ),
    {dd.duck_capped_cand_ctes("doc_id", _LSH_MAX_BUCKET)}
    SELECT doc_a, doc_b,
           round(len(list_intersect(x.hs, y.hs))
                 / CAST(len(x.hs) + len(y.hs) - len(list_intersect(x.hs, y.hs))
                        AS DOUBLE), 6) AS jaccard
    FROM cand
    JOIN hs x ON x.doc_id = doc_a
    JOIN hs y ON y.doc_id = doc_b
    WHERE len(list_intersect(x.hs, y.hs))
          / CAST(len(x.hs) + len(y.hs) - len(list_intersect(x.hs, y.hs))
                 AS DOUBLE) >= {_JACC_THRESHOLD}
    """,
)
def dedup_minhash_lsh_capped(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash+LSH near-dup with a bucket-occupancy cap — the
    duplicate-heavy-corpus production variant of ``dedup_minhash_lsh``.

    Round 10 measured the uncapped bucket self-join going superlinear on
    the sf100 fixture (86.8 s @ sf30 → 604 s @ sf100: the synthetic
    31-word vocabulary saturates the shingle space, so bucket occupancy —
    and the self-join's Σ n² — grows with corpus size). Real corpora hit
    the same cliff through boilerplate and verbatim duplication. The cap
    bounds every bucket's contribution: buckets wider than
    {_LSH_MAX_BUCKET} (env ``SPARK_GRAFT_LSH_MAX_BUCKET``) emit an
    id-ordered CHAIN of consecutive pairs instead of the full clique —
    O(n) pairs, connectivity preserved for downstream cluster resolution
    (hot buckets are near-identical docs; every emitted pair still passes
    the exact-Jaccard >= {_JACC_THRESHOLD} verify). Pair-level recall
    inside hot buckets is the documented trade; cluster membership is
    not, because the chain spans the bucket.

    On the organic fixtures the cap never fires (max occupancy 14 at
    sf0.1), so this query's output is identical to the uncapped one there
    — the dup-heavy pytest fixture and the sf100 sweep exercise the
    capped branch (tests/test_dup_heavy_skew.py::test_lsh_cap_active).
    The DuckDB oracle mirrors the cap bit-for-bit
    (``duck_capped_cand_ctes``), so post-cap semantics get the strong
    value-hash tier exactly like the stop-shingle df cap did.
    """
    docs = scale_out(load_table(spark, sf_dir, "documents")).filter(
        F.col("text").isNotNull()
    )
    # one Arrow/numpy kernel pass for grams + signature — same rationale
    # and bit-equality lock as dedup_minhash_lsh (round 12)
    gs = dd.minhash_gram_sig_frame(docs, _JACC_N, _MH_NUM).cache()
    hs = gs.select("doc_id", "hs")
    sig = gs.select("doc_id", "sig")
    cand = dd.lsh_candidate_pairs(
        sig, "doc_id", "sig", _MH_BANDS, _MH_ROWS, max_bucket=_LSH_MAX_BUCKET
    )
    return _jaccard_verify(cand, hs)


# Shared DuckDB CTE prefix for the MinHash family: text -> word hashes ->
# gram sets (len > 0) -> signatures -> exploded band buckets. Factored in
# round 12 for the occupancy-profile and best-match queries; the original
# dedup_minhash_lsh / _capped / calibration oracles predate it and carry
# the same chain inline (bit-identical by construction — same builders,
# same constants).
_MINHASH_BANDS_CTES = f"""
    wh AS (
        SELECT doc_id,
               {dd.duck_word_polyhashes_expr("text", 31)} AS wh1,
               {dd.duck_word_polyhashes_expr("text", 131)} AS wh2
        FROM documents WHERE text IS NOT NULL
    ),
    hs AS (
        SELECT * FROM (
            SELECT doc_id,
                   {dd.duck_gram_fold64_expr("wh1", "wh2", _JACC_N)} AS hs
            FROM wh
        ) WHERE len(hs) > 0
    ),
    sig AS (
        SELECT doc_id, {dd.duck_minhash_sig_expr("hs", _MH_NUM)} AS sig FROM hs
    ),
    bands AS (
        SELECT doc_id, unnest({dd.duck_band_select("sig", _MH_BANDS, _MH_ROWS)},
                              recursive := true)
        FROM sig
    )"""


@register(
    "lsh_band_occupancy_profile",
    oracle=f"""
    WITH {_MINHASH_BANDS_CTES}
    SELECT band, occupancy, CAST(count(*) AS BIGINT) AS n_buckets
    FROM (
        SELECT band, bkey, CAST(count(*) AS BIGINT) AS occupancy
        FROM bands GROUP BY band, bkey
    )
    GROUP BY band, occupancy
    """,
)
def lsh_band_occupancy_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Operational pre-flight for the LSH dedup family: the bucket-
    occupancy histogram per band — (band, occupancy, n_buckets). The
    self-join's pair volume is Σ occupancy² per band, so this single
    cheap aggregation tells you BEFORE running candidate generation
    whether the corpus saturates buckets (the round-10 sf100 cliff:
    vocabulary-saturated buckets drove the uncapped join superlinear)
    and whether the occupancy cap (``dedup_minhash_lsh_capped``,
    max_bucket=64) will fire. Run it on a new corpus; if max occupancy
    ≪ cap, the uncapped exact tier is safe.

    Same Arrow-kernel signatures and banding as the dedup queries, then
    two map-side-combinable counts — (band, bkey) then (band,
    occupancy); output is O(bands × distinct occupancies), a few dozen
    rows at any corpus size.
    """
    docs = scale_out(load_table(spark, sf_dir, "documents")).filter(
        F.col("text").isNotNull()
    )
    sig = dd.minhash_gram_sig_frame(docs, _JACC_N, _MH_NUM).select(
        "doc_id", "sig"
    )
    bucketed = (
        sig.select(
            F.explode_outer(
                dd.band_structs_expr("sig", _MH_BANDS, _MH_ROWS)
            ).alias("bb")
        )
        .filter(F.col("bb").isNotNull())
        # band is INT on the Spark side (sequence literal) but BIGINT in
        # the oracle's unnest — cast where it becomes an OUTPUT column
        .select(F.col("bb.band").cast("long").alias("band"), "bb.bkey")
    )
    return (
        bucketed.groupBy("band", "bkey")
        .agg(F.count(F.lit(1)).cast("long").alias("occupancy"))
        .groupBy("band", "occupancy")
        .agg(F.count(F.lit(1)).cast("long").alias("n_buckets"))
    )


@register(
    "neardup_best_match_per_doc",
    oracle=f"""
    WITH {_MINHASH_BANDS_CTES},
    cand AS (
        SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
        FROM bands a
        JOIN bands b ON a.band = b.band AND a.bkey = b.bkey
                    AND a.doc_id < b.doc_id
    ),
    scored AS (
        SELECT doc_a, doc_b,
               round(len(list_intersect(x.hs, y.hs))
                     / CAST(len(x.hs) + len(y.hs)
                            - len(list_intersect(x.hs, y.hs)) AS DOUBLE),
                     6) AS jaccard
        FROM cand
        JOIN hs x ON x.doc_id = doc_a
        JOIN hs y ON y.doc_id = doc_b
    ),
    sym AS (
        SELECT doc_a AS doc_id, doc_b AS partner, jaccard FROM scored
        UNION ALL
        SELECT doc_b AS doc_id, doc_a AS partner, jaccard FROM scored
    )
    SELECT doc_id, partner AS best_match, jaccard
    FROM (
        SELECT *, row_number() OVER (PARTITION BY doc_id
                                     ORDER BY jaccard DESC, partner)
                      AS rn
        FROM sym
    )
    WHERE rn = 1
    """,
)
def neardup_best_match_per_doc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nearest-duplicate report: for every document with at least one LSH
    candidate, its single highest-Jaccard partner — (doc_id, best_match,
    jaccard), tie broken to the smaller partner id. The triage view a
    curation run reads after dedup flags fire: not just "is there a
    near-dup" (the pair queries) but "what is THE closest document", with
    no threshold so borderline pairs surface too.

    Candidates, signatures, and exact-Jaccard arithmetic are the shared
    MinHash machinery (Arrow kernel + band bucket join); the additions
    are a symmetrize-union (each pair serves both endpoints) and one
    per-doc argmax window keyed doc_id — corpus-wide parallelism, cost
    bounded by the candidate volume like every LSH consumer.
    """
    docs = scale_out(load_table(spark, sf_dir, "documents")).filter(
        F.col("text").isNotNull()
    )
    gs = dd.minhash_gram_sig_frame(docs, _JACC_N, _MH_NUM).cache()
    hs = gs.select("doc_id", "hs")
    sig = gs.select("doc_id", "sig")
    cand = dd.lsh_candidate_pairs(sig, "doc_id", "sig", _MH_BANDS, _MH_ROWS)
    n_inter = F.size(F.array_intersect(F.col("x.hs"), F.col("y.hs")))
    jacc = n_inter / (
        F.size(F.col("x.hs")) + F.size(F.col("y.hs")) - n_inter
    ).cast("double")
    scored = (
        cand.withColumnRenamed("id_a", "doc_a")
        .withColumnRenamed("id_b", "doc_b")
        .join(hs.alias("x"), F.col("x.doc_id") == F.col("doc_a"))
        .join(hs.alias("y"), F.col("y.doc_id") == F.col("doc_b"))
        .select("doc_a", "doc_b", F.round(jacc, 6).alias("jaccard"))
    )
    sym = scored.select(
        F.col("doc_a").alias("doc_id"),
        F.col("doc_b").alias("partner"),
        "jaccard",
    ).unionByName(
        scored.select(
            F.col("doc_b").alias("doc_id"),
            F.col("doc_a").alias("partner"),
            "jaccard",
        )
    )
    w = Window.partitionBy("doc_id").orderBy(
        F.col("jaccard").desc(), F.col("partner").asc()
    )
    return (
        sym.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("doc_id", F.col("partner").alias("best_match"), "jaccard")
    )


_SIMHASH_MAX_HAMMING = 8

# SimHash candidate-pair CTE chain, shared between the dedup_simhash oracle
# and the cluster-resolution oracle (plans/clustering.py) so the two stay
# bit-identical by construction.
SIMHASH_CAND_CTES = f"""
    wh AS (
        SELECT doc_id,
               {dd.duck_word_polyhashes_expr("text", 31)} AS wh1,
               {dd.duck_word_polyhashes_expr("text", 131)} AS wh2
        FROM documents WHERE text IS NOT NULL
    ),
    gs AS (
        SELECT doc_id, {dd.duck_gram_fold64_expr("wh1", "wh2", _JACC_N)} AS gs
        FROM wh
    ),
    sim AS (
        SELECT doc_id, {dd.duck_simhash_expr("gs")} AS sim FROM gs
    ),
    chunks AS (
        SELECT doc_id, sim, unnest({dd.duck_simhash_chunks("sim")},
                                   recursive := true)
        FROM sim
    ),
    cand AS (
        SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b,
               a.sim AS sim_a, b.sim AS sim_b
        FROM chunks a
        JOIN chunks b ON a.chunk = b.chunk AND a.cval = b.cval
                     AND a.doc_id < b.doc_id
    ),
    simhash_pairs AS (
        SELECT doc_a, doc_b,
               CAST(bit_count(xor(sim_a, sim_b)) AS BIGINT) AS hamming
        FROM cand
        WHERE bit_count(xor(sim_a, sim_b)) <= {_SIMHASH_MAX_HAMMING}
    )"""


def simhash_pair_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup pairs (doc_a < doc_b, hamming) by SimHash chunk blocking —
    the Spark twin of the ``simhash_pairs`` CTE above. Shared by
    ``dedup_simhash`` and the cluster resolution in plans/clustering.py.

    Since round 12 the per-doc sketch (word polyhashes → gram fold →
    60-bit SimHash) runs in the Arrow/numpy gram kernel
    (``operators/dedup.gram_sim_frame``) — bit-identical to the SQL twins
    the DuckDB oracle still mirrors (locked by
    tests/test_dup_heavy_skew.py::test_simhash_kernel_matches_hof). The
    HOF SimHash fold was the heaviest interpreted-lambda expression in
    the package (60 zip_with adds per gram per doc, outside whole-stage
    codegen — the same JIT-profile-pollution class the minhash kernel
    move fixed); the kernel computes the same integers in compiled C.
    Docs with fewer than {gram-width} words keep the empty-fold sketch
    sim = 0 (they block together in bucket 0), exactly like the HOF and
    the oracle."""
    # NULL text carries no shingles; the engines' NULL-list semantics
    # diverge (Spark drops such docs through NULL joins, DuckDB folds
    # them to a zero signature pairing with everything) — filter mirrored
    docs = scale_out(load_table(spark, sf_dir, "documents")).filter(
        F.col("text").isNotNull()
    )
    # Cache the one-int64-per-doc sketch: both sides of the blocking
    # self-join read it, and caching stops Catalyst from recomputing the
    # kernel pass per side. (At scale: sketch table is 8 bytes/doc.)
    sim = dd.gram_sim_frame(docs, _JACC_N).cache()
    chunks = sim.select(
        "doc_id", "sim", F.explode(dd.simhash_chunks_expr("sim")).alias("cc")
    ).select("doc_id", "sim", "cc.chunk", "cc.cval")
    cand = (
        chunks.alias("a")
        .join(
            chunks.alias("b"),
            (F.col("a.chunk") == F.col("b.chunk"))
            & (F.col("a.cval") == F.col("b.cval"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            F.col("a.sim").alias("sim_a"),
            F.col("b.sim").alias("sim_b"),
        )
        .distinct()
    )
    hamming = F.expr("bit_count(sim_a ^ sim_b)").cast("long")
    return cand.filter(hamming <= _SIMHASH_MAX_HAMMING).select(
        "doc_a", "doc_b", hamming.alias("hamming")
    )


@register(
    "dedup_simhash",
    oracle=f"""
    WITH {SIMHASH_CAND_CTES}
    SELECT doc_a, doc_b, hamming FROM simhash_pairs
    """,
)
def dedup_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash near-dup (X2, bit-sketch path): 60-bit SimHash over the
    document's 3-gram shingle hashes; candidates from 4x15-bit chunk
    blocking (pigeonhole: any pair with hamming < 4 is guaranteed caught;
    farther pairs probabilistically); keep pairs with hamming <= 8.

    Shingles, not unigrams: on a small-vocabulary corpus every document
    has nearly the same word distribution, so unigram SimHash collapses
    (measured: 1.6M "near-dup" pairs at sf0.1); the 3-gram feature space
    separates random docs from true near-dups.

    One int64 per doc makes this the cheapest fuzzy sketch at 100 TB: the
    blocking join shuffles 4 rows per doc. Oracle mirrors the pipeline
    bit-for-bit (pure integer arithmetic both sides).

    Features are the two-level 64-bit word-gram hashes — exactly 60 bits
    wide (g1 + g2·2^30, g1,g2 < 2^30), which is SIMHASH_BITS, so the bit
    sampler consumes them directly. wh1/wh2 and gs stay separate projected
    columns (inlining the word-hash arrays into the gram lambda is
    O(words²)/doc; inlining gs into the 60-bit fold re-grams per bit).
    """
    return simhash_pair_frame(spark, sf_dir)


# ---------------------------------------------------------------------------
# X3 — similarity search over embeddings
# ---------------------------------------------------------------------------

_TOPK = 5
_NUM_QUERIES = 10  # query set: vec_id < 10
_NEARDUP_COS = 0.3


@register(
    "similarity_topk_bruteforce",
    oracle=f"""
    WITH q AS (
        SELECT vec_id AS query_id, embedding AS qv
        FROM embeddings WHERE vec_id < {_NUM_QUERIES}
    ),
    c AS (SELECT vec_id AS neighbor_id, embedding AS cv FROM embeddings),
    scored AS (
        SELECT query_id, neighbor_id,
               round({sim.duck_cosine_expr("qv", "cv")}, 6) AS cosine
        FROM q, c
        WHERE neighbor_id != query_id
    )
    SELECT query_id, neighbor_id, cosine, rank
    FROM (
        SELECT *, row_number() OVER (
            PARTITION BY query_id ORDER BY cosine DESC, neighbor_id
        ) AS rank
        FROM scored
    )
    WHERE rank <= {_TOPK}
    """,
)
def similarity_topk_bruteforce(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact ANN baseline (X3): broadcast the query set, scan the corpus
    once, rank per query. The plan is BroadcastNestedLoopJoin + one shuffle
    on query_id for the windowed top-k (WindowGroupLimit keeps only k rows
    per query per partition before the shuffle). Cosine is a deterministic
    ordered fold — identical doubles in both engines, rounded before
    ranking so tiebreaks agree too."""
    emb = scale_out(load_table(spark, sf_dir, "embeddings"))
    q = emb.filter(F.col("vec_id") < _NUM_QUERIES).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("qv")
    )
    c = emb.select(
        F.col("vec_id").alias("neighbor_id"), F.col("embedding").alias("cv")
    )
    scored = (
        c.crossJoin(F.broadcast(q))
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .select(
            "query_id",
            "neighbor_id",
            F.round(sim.cosine_expr("qv", "cv"), 6).alias("cosine"),
        )
    )
    from pyspark.sql import Window

    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= _TOPK)
    )


def ivf_oracle(n_probe: int) -> str:
    """DuckDB oracle for the IVF plan with ``n_probe`` probed cells —
    shared by single-probe and multi-probe registrations."""
    return f"""
    WITH cent AS (
        SELECT label, array_agg(cval ORDER BY pos) AS centroid
        FROM (
            SELECT label, pos,
                   round(avg(CAST(embedding[pos] AS DOUBLE)), 6) AS cval
            FROM embeddings, (SELECT unnest(range(1, 65)) AS pos)
            GROUP BY label, pos
        )
        GROUP BY label
    ),
    q AS (
        SELECT vec_id AS query_id, embedding AS qv
        FROM embeddings WHERE vec_id < {_NUM_QUERIES}
    ),
    assign AS (
        SELECT query_id, qv, label FROM (
            SELECT q.query_id, q.qv, cent.label,
                   row_number() OVER (
                       PARTITION BY q.query_id
                       ORDER BY round({sim.duck_cosine_expr("q.qv", "cent.centroid")}, 6) DESC,
                                cent.label
                   ) AS rn
            FROM q, cent
        ) WHERE rn <= {n_probe}
    ),
    scored AS (
        SELECT a.query_id, e.vec_id AS neighbor_id, e.label,
               round({sim.duck_cosine_expr("a.qv", "e.embedding")}, 6) AS cosine
        FROM assign a
        JOIN embeddings e ON e.label = a.label AND e.vec_id != a.query_id
    )
    SELECT query_id, neighbor_id, label, cosine, rank
    FROM (
        SELECT *, row_number() OVER (
            PARTITION BY query_id ORDER BY cosine DESC, neighbor_id
        ) AS rank
        FROM scored
    )
    WHERE rank <= {_TOPK}
    """


def ivf_topk_frame(spark: SparkSession, sf_dir: str, n_probe: int) -> DataFrame:
    """IVF top-k plan, parameterized by the number of probed cells."""
    emb = scale_out(load_table(spark, sf_dir, "embeddings"))
    cent = (
        emb.select("label", F.posexplode("embedding").alias("pos", "v"))
        .groupBy("label", "pos")
        .agg(F.round(F.avg(F.col("v").cast("double")), 6).alias("cval"))
        .groupBy("label")
        .agg(
            F.expr(
                "transform(array_sort(collect_list(struct(pos, cval))),"
                " cs_s -> cs_s.cval)"
            ).alias("centroid")
        )
    )
    q = emb.filter(F.col("vec_id") < _NUM_QUERIES).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("qv")
    )
    from pyspark.sql import Window

    w_assign = Window.partitionBy("query_id").orderBy(
        F.round(sim.cosine_expr("qv", "centroid"), 6).desc(), F.col("label").asc()
    )
    assign = (
        q.crossJoin(F.broadcast(cent))
        .withColumn("rn", F.row_number().over(w_assign))
        .filter(F.col("rn") <= n_probe)
        .select("query_id", "qv", "label")
    )
    scored = (
        F.broadcast(assign)
        .join(
            emb.alias("e"),
            (F.col("e.label") == assign["label"])
            & (F.col("e.vec_id") != F.col("query_id")),
        )
        .select(
            "query_id",
            F.col("e.vec_id").alias("neighbor_id"),
            F.col("e.label").alias("label"),
            F.round(sim.cosine_expr("qv", "e.embedding"), 6).alias("cosine"),
        )
    )
    w_rank = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w_rank).cast("long"))
        .filter(F.col("rank") <= _TOPK)
    )


@register("similarity_ivf_topk", oracle=ivf_oracle(1))
def similarity_ivf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-pruned ANN (X3 scale path): coarse cells = `label`, centroids =
    per-cell means (rounded so both engines agree bit-for-bit); each query
    probes only its best cell, so the corpus scan drops to ~1/n_cells.

    100 TB shape: centroid table is tiny -> broadcast to assign queries;
    the corpus join is an equi-join on the cell id (bucket/partition the
    corpus by cell to make it shuffle-free); per-query top-k via
    WindowGroupLimit. No UDFs, everything codegen. Multi-probe recall
    variant: ``similarity_ivf_multiprobe`` (plans/clustering.py).
    """
    return ivf_topk_frame(spark, sf_dir, 1)


@register(
    "embedding_quantize_int8",
    oracle="""
    WITH s AS (
        SELECT vec_id,
               embedding,
               round(greatest(
                   list_reduce(
                       list_prepend(CAST(0 AS DOUBLE),
                           list_transform(embedding,
                               cs_x -> abs(CAST(cs_x AS DOUBLE)))),
                       (cs_a, cs_x) -> greatest(cs_a, cs_x)),
                   CAST(1e-12 AS DOUBLE)) / 127.0, 9) AS qscale
        FROM embeddings
    )
    SELECT vec_id,
           qscale,
           array_to_string(list_transform(embedding,
               cs_x -> CAST(CAST(round(CAST(cs_x AS DOUBLE) / qscale) AS INT)
                            AS VARCHAR)), ',') AS q8_csv,
           round(list_reduce(
               list_prepend(CAST(0 AS DOUBLE),
                   list_transform(embedding, cs_x ->
                       (CAST(cs_x AS DOUBLE)
                        - round(CAST(cs_x AS DOUBLE) / qscale) * qscale)
                       * (CAST(cs_x AS DOUBLE)
                          - round(CAST(cs_x AS DOUBLE) / qscale) * qscale))),
               (cs_a, cs_v) -> cs_a + cs_v) / len(embedding), 9) AS mse
    FROM s
    """,
)
def embedding_quantize_int8(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Symmetric int8 vector quantization (X3 storage path): per-vector
    scale = max|x|/127, quantized codes, and the reconstruction MSE —
    the compression pass that shrinks an embedding corpus 4x before
    ANN serving. Narrow per-row HOF arithmetic, no shuffle, no UDF.

    Determinism: scale is round(9)ed before use; round() is
    half-away-from-zero in both engines; MSE is an ordered fold over the
    identical reconstruction expression, round(9)ed. The codes come back
    as int32 on both sides (DuckDB's round-to-nearest double->INT cast
    vs Spark's truncation is moot — the input is already integral).
    """
    emb = scale_out(load_table(spark, sf_dir, "embeddings"))
    scaled = emb.select(
        "vec_id",
        "embedding",
        F.expr(
            "round(greatest("
            " aggregate(transform(embedding, cs_x -> abs(CAST(cs_x AS DOUBLE))),"
            "  CAST(0 AS DOUBLE), (cs_a, cs_x) -> greatest(cs_a, cs_x)),"
            " CAST(1e-12 AS DOUBLE)) / 127.0, 9)"
        ).alias("qscale"),
    )
    return scaled.select(
        "vec_id",
        "qscale",
        F.expr(
            "array_join(transform(embedding,"
            " cs_x -> CAST(CAST(round(CAST(cs_x AS DOUBLE) / qscale) AS INT)"
            " AS STRING)), ',')"
        ).alias("q8_csv"),
        F.expr(
            "round(aggregate(transform(embedding, cs_x ->"
            " (CAST(cs_x AS DOUBLE) - round(CAST(cs_x AS DOUBLE) / qscale) * qscale)"
            " * (CAST(cs_x AS DOUBLE) - round(CAST(cs_x AS DOUBLE) / qscale) * qscale)),"
            " CAST(0 AS DOUBLE), (cs_a, cs_v) -> cs_a + cs_v)"
            " / size(embedding), 9)"
        ).alias("mse"),
    )


# Shared LSH-candidate CTE prefix for the cosine near-dup family: exact
# same bucket construction in both engines (see dedup_embedding_neardup).
_NEARDUP_CTES = f"""
    WITH e AS (
        SELECT vec_id, embedding,
               {sim.duck_dot_expr("embedding", "embedding")} AS sqn
        FROM embeddings
    ),
    b AS (
        SELECT vec_id, unnest({sim.duck_lsh_bucket_select("embedding")},
                              recursive := true)
        FROM embeddings
    ),
    cand AS (
        SELECT DISTINCT a.vec_id AS vec_a, b2.vec_id AS vec_b
        FROM b a
        JOIN b b2 ON a.tbl = b2.tbl AND a.bucket = b2.bucket
                 AND a.vec_id < b2.vec_id
    )"""


def _neardup_oracle(tau: float) -> str:
    return f"""
    {_NEARDUP_CTES}
    SELECT vec_a, vec_b,
           round(({sim.duck_dot_expr("x.embedding", "y.embedding")})
                 / sqrt(x.sqn * y.sqn), 6) AS cosine
    FROM cand
    JOIN e x ON x.vec_id = vec_a
    JOIN e y ON y.vec_id = vec_b
    WHERE round(({sim.duck_dot_expr("x.embedding", "y.embedding")})
                / sqrt(x.sqn * y.sqn), 6) >= {tau}
    """


def _neardup_scored(spark: SparkSession, sf_dir: str):
    """Scored sign-LSH candidate pairs (vec_a, vec_b, cosine column expr)
    — the shared stage of the near-dup family; see
    ``dedup_embedding_neardup`` for the scale notes.

    Since round 12 both per-vector stages run in Arrow/numpy kernels
    (``operators/similarity``): ``lsh_buckets_frame`` for the
    2-table × 8-plane sign buckets (bit-identical doubles via the shared
    per-dimension fold order; NULL vectors keep their bucket-0 rows) and
    ``pair_cosine_frame`` for the candidate cosines (same fold, HALF_UP
    rounding at 6 dp; NULL sides stay NULL) — the HOF forms paid
    tables × planes + 1 interpreted 64-dim folds per vector/pair. Parity
    locks: tests/test_mlprep_ops.py::test_lsh_buckets_frame_matches_hof,
    ::test_pair_cosine_frame_matches_hof."""
    emb = (
        scale_out(load_table(spark, sf_dir, "embeddings"))
        .select("vec_id", "embedding")
        .cache()
    )
    # .cache() the bucket frame (round 13): the self-join's two sides are
    # the SAME mapInPandas subtree, which Spark plans as two separate
    # kernel executions (no exchange to reuse under the broadcast join) —
    # caching the (vec_id, tbl, bucket) rows (3 longs/row) halves the LSH
    # kernel work and the Python-worker traffic of every family member
    b = sim.lsh_buckets_frame(emb, "vec_id", "embedding").cache()
    cand = (
        b.alias("a")
        .join(
            b.alias("b2"),
            (F.col("a.tbl") == F.col("b2.tbl"))
            & (F.col("a.bucket") == F.col("b2.bucket"))
            & (F.col("a.vec_id") < F.col("b2.vec_id")),
        )
        .select(
            F.col("a.vec_id").alias("vec_a"), F.col("b2.vec_id").alias("vec_b")
        )
        .distinct()
    )
    paired = (
        cand.join(emb.alias("x"), F.col("x.vec_id") == F.col("vec_a"))
        .join(emb.alias("y"), F.col("y.vec_id") == F.col("vec_b"))
        .select(
            "vec_a",
            "vec_b",
            F.col("x.embedding").alias("va"),
            F.col("y.embedding").alias("vb"),
        )
    )
    scored = sim.pair_cosine_frame(paired, "vec_a", "vec_b", "va", "vb",
                                   micro=False)
    return scored, F.col("cosine")


@register("dedup_embedding_neardup", oracle=_neardup_oracle(_NEARDUP_COS))
def dedup_embedding_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-cosine near-dup (X2/X3): random-hyperplane sign-LSH with
    2 OR-ed tables of 8 planes (256 buckets each); only within-bucket
    pairs are scored; keep cosine >= 0.3.

    The hyperplanes are deterministic rationals from integer arithmetic,
    so the DuckDB oracle rebuilds the exact same buckets — the approximate
    pipeline gets the strong check (pairs missed by LSH are missed
    identically on both sides). 100 TB shape: 2 rows per vector shuffle
    on (table, bucket); candidate volume ~n²/buckets per table, tuned by
    LSH_PLANES; squared norms are precomputed per vector so each
    candidate pair costs one dot product; scoring rejoins by vec_id.

    Threshold posture: τ=0.3 is the DENSE demonstration regime — on this
    isotropic corpus the true-pair set itself is quadratic (2.46M pairs
    at sf10, SCALE.md round 7), so runtime is output-bound by design.
    The production near-dup posture is ``dedup_embedding_neardup_sparse``
    (τ=0.9), where output collapses to the genuine-duplicate set.
    """
    scored, cos = _neardup_scored(spark, sf_dir)
    return scored.filter(cos >= _NEARDUP_COS).select(
        "vec_a", "vec_b", cos.alias("cosine")
    )


_NEARDUP_SPARSE_COS = 0.9


@register(
    "dedup_embedding_neardup_sparse",
    oracle=_neardup_oracle(_NEARDUP_SPARSE_COS),
)
def dedup_embedding_neardup_sparse(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding near-dup at the PRODUCTION threshold (τ=0.9): identical
    sign-LSH machinery to ``dedup_embedding_neardup``, but the keep
    predicate selects genuine near-duplicates only — the posture a
    100 TB dedup pass actually runs with.

    Why it exists (round-8 verdict task): at τ=0.3 the registered query
    demonstrates candidate-generation correctness but its OUTPUT is
    quadratic on isotropic vectors (2.46M true pairs at sf10) — correct,
    and measured, but the wrong default to imitate at scale. At τ=0.9 the
    output is bounded by the real duplicate population (0 rows on this
    isotropic synthetic corpus at every SF — see SCALE.md round 8 for the
    measured collapse, and ``neardup_threshold_sweep`` for the per-τ
    counts that keep the differential non-trivial). Cost is unchanged:
    the candidate join dominates; the filter is map-side.
    """
    scored, cos = _neardup_scored(spark, sf_dir)
    return scored.filter(cos >= _NEARDUP_SPARSE_COS).select(
        "vec_a", "vec_b", cos.alias("cosine")
    )


_SWEEP_TAUS = (0.3, 0.5, 0.7, 0.9)


@register(
    "neardup_threshold_sweep",
    oracle=f"""
    {_NEARDUP_CTES},
    scored AS (
        SELECT round(({sim.duck_dot_expr("x.embedding", "y.embedding")})
                     / sqrt(x.sqn * y.sqn), 6) AS cosine
        FROM cand
        JOIN e x ON x.vec_id = vec_a
        JOIN e y ON y.vec_id = vec_b
    )
    SELECT t.tau, CAST(count(s.cosine) AS BIGINT) AS n_pairs
    FROM (VALUES {", ".join(f"({t})" for t in _SWEEP_TAUS)}) t(tau)
    LEFT JOIN scored s ON s.cosine >= t.tau
    GROUP BY t.tau
    """,
)
def neardup_threshold_sweep(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup threshold calibration report: pair counts of the scored
    sign-LSH candidate set at each τ in (0.3, 0.5, 0.7, 0.9) — the table
    you read before picking a production threshold, and the differential
    that keeps the sparse regime honestly checked (a 0-row τ=0.9 listing
    hash-matches trivially; these counts do not).

    Plan: ONE pass over the scored candidates with four conditional
    partial aggregates (map-side combine, no second shuffle), unpivoted
    to (tau, n_pairs) via stack on the single aggregate row. The oracle
    mirrors with a VALUES left join; both engines see the identical
    rounded cosines, so counts match exactly.
    """
    scored, cos = _neardup_scored(spark, sf_dir)
    aggs = [
        # coalesce: SUM over zero rows is NULL, the oracle's count() is 0
        F.coalesce(F.sum(F.when(cos >= t, 1).otherwise(0)), F.lit(0))
        .cast("long")
        .alias(f"n_{i}")
        for i, t in enumerate(_SWEEP_TAUS)
    ]
    row = scored.agg(*aggs)
    stack_args = ", ".join(
        f"CAST({t} AS DOUBLE), n_{i}" for i, t in enumerate(_SWEEP_TAUS)
    )
    return row.select(
        F.expr(f"stack({len(_SWEEP_TAUS)}, {stack_args}) AS (tau, n_pairs)")
    )


# ---------------------------------------------------------------------------
# X5 — multimodal columns (binary payload + mapInPandas kernels)
# ---------------------------------------------------------------------------


@register(
    "multimodal_decode_features",
    oracle="""
    SELECT doc_id,
           CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
           -- least(16, length): a sub-16-char doc checksums only the chars
           -- it has (the kernel's text[:16]); a bare range(1, 17) feeds
           -- unicode('') = -1 for every position past the end. coalesce:
           -- list_sum([]) is NULL, the kernel's empty sum() is 0.
           CAST(coalesce(list_sum(list_transform(
                    range(1, least(16, length(text)) + 1),
                    mm_i -> unicode(substring(text, mm_i, 1)))), 0) AS BIGINT)
               AS checksum16,
           CAST(64 + coalesce(list_sum(list_transform(
                    range(1, least(16, length(text)) + 1),
                    mm_i -> unicode(substring(text, mm_i, 1)))), 0) % 960
               AS BIGINT) AS fake_width,
           CAST(64 + octet_length(encode(text)) % 960 AS BIGINT) AS fake_height
    FROM documents WHERE text IS NOT NULL
    """,
)
def multimodal_decode_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multimodal decode plumbing (X5): binary payload column + metadata
    struct, features extracted by an Arrow-batched mapInPandas kernel
    (the deterministic stand-in for an image decoder — see
    functions/multimodal.py). The oracle recomputes the byte features in
    SQL (payload is the UTF-8 text, pure ASCII, so char ops == byte ops)
    — proving the pandas path end-to-end, not just running it."""
    from kafka_streams_tcp_reconciliation_spark.functions import multimodal as mm

    docs = scale_out(load_table(spark, sf_dir, "documents"))
    return mm.extract_features(mm.attach_payload(docs))


@register(
    "multimodal_frame_sample",
    oracle=f"""
    SELECT doc_id,
           j AS frame_idx,
           CAST(list_sum(list_transform(range(1, 17),
                mm_i -> unicode(substring(text, j * 64 + mm_i, 1)))) AS BIGINT)
               AS frame_checksum
    FROM documents, (SELECT unnest(range(0, 100)) AS j)
    WHERE j < length(text) // 64
    """,
)
def multimodal_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frame sampling (X5): 1→N row fan-out per payload inside
    mapInPandas — the video-frame shape (sample every 64 bytes, checksum
    the 16-byte head of each frame)."""
    from kafka_streams_tcp_reconciliation_spark.functions import multimodal as mm

    docs = scale_out(load_table(spark, sf_dir, "documents"))
    return mm.sample_frames(mm.attach_payload(docs))


# ---------------------------------------------------------------------------
# end-to-end corpus curation (X1–X4 composed)
# ---------------------------------------------------------------------------

_CURATE_MIN_QUALITY = 0.55


@register(
    "curate_corpus",
    oracle=f"""
    WITH feat AS (
        SELECT doc_id, lang,
               string_split(text, ' ') AS words,
               len(string_split(text, ' ')) AS n_tokens
        FROM documents
    ),
    scored AS (
        SELECT doc_id, lang, n_tokens,
               round(0.4 * (len(list_distinct(words)) / CAST(n_tokens AS DOUBLE))
                     + 0.3 * least(n_tokens / 100.0, 1.0)
                     + 0.3 * (1.0 - len(list_filter(words, w -> w IN ({_SW_LIST})))
                              / CAST(n_tokens AS DOUBLE)), 6) AS quality
        FROM feat
    ),
    whc AS (
        SELECT doc_id,
               {dd.duck_word_polyhashes_expr("text", 31)} AS wh1,
               {dd.duck_word_polyhashes_expr("text", 131)} AS wh2
        FROM documents
    ),
    sh AS (
        SELECT doc_id,
               {dd.duck_gram_fold64_expr("wh1", "wh2", _JACC_N)} AS shingles
        FROM whc
    ),
    {dd.duck_stop_shingle_ctes(_STOP_DF)}
    {dd.DUCK_SIZES_CTE}
    inter AS (
        SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS n_inter
        FROM ex a JOIN ex b ON a.s = b.s AND a.doc_id < b.doc_id
        GROUP BY 1, 2
    ),
    dup_losers AS (
        SELECT DISTINCT doc_b
        FROM inter
        JOIN sz x ON x.doc_id = doc_a
        JOIN sz y ON y.doc_id = doc_b
        WHERE n_inter / CAST(x.n_sh + y.n_sh - n_inter
                             AS DOUBLE) >= {_JACC_THRESHOLD}
    )
    SELECT doc_id, lang, n_tokens, quality
    FROM scored
    WHERE quality >= {_CURATE_MIN_QUALITY}
      AND doc_id NOT IN (SELECT doc_b FROM dup_losers)
    """,
)
def curate_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end corpus curation (the LLM-pipeline flagship): quality-gate
    every document, then drop near-duplicates keeping the lower doc_id of
    each pair — quality scoring (X4) composed with fuzzy dedup (X2) in one
    declarative plan.

    The dedup stage here is the exact inverted-index Jaccard (auditable
    oracle); at 100 TB swap in the MinHash-LSH candidate generator
    (dedup_minhash_lsh) — same keep-lowest-id anti-join shape. The
    in-place insurance is the shared stop-shingle df cap
    (SPARK_GRAFT_STOPSHINGLE_DF, operators/dedup.py): wired round 8 into
    index, intersections, AND set sizes on both engines, bounding the
    self-join's per-key fanout the round-7 sweep measured as quadratic on
    hot shingles (20+ min uncapped vs 24.3 s capped at sf10, SCALE.md).
    Plan shape: shingling runs over ALL documents — mirroring the oracle
    — because a pair's LOSER must be dropped even when its winner later
    fails the quality gate; the quality filter and the dedup anti-join
    meet only at the final step, where the (tiny) loser set broadcasts.
    """
    docs = scale_out(load_table(spark, sf_dir, "documents"))
    words = F.split("text", " ")
    nt = F.size(words).cast("long")
    ntd = nt.cast("double")
    sw = F.expr(f"size(filter(split(text, ' '), w -> w IN ({_SW_LIST})))")
    scored = docs.select(
        "doc_id",
        "lang",
        nt.alias("n_tokens"),
        F.round(
            0.4 * (F.size(F.array_distinct(words)) / ntd)
            + 0.3 * F.least(nt / 100.0, F.lit(1.0))
            + 0.3 * (1.0 - sw / ntd),
            6,
        ).alias("quality"),
    )
    # Arrow gram kernel (round 12): per-doc DISTINCT shingle-hash sets in
    # one mapInPandas pass — same integers as the HOF two-level fold the
    # oracle mirrors (parity lock in tests/test_dup_heavy_skew.py); the
    # cache still feeds both self-join sides and the size lookup.
    # NULL-text docs are filtered before the kernel (their empty shingle
    # arrays vanished through the explode anyway; the scored branch above
    # keeps every doc, mirroring the oracle).
    sh = dd.gram_set_frame(
        docs.filter(F.col("text").isNotNull()), _JACC_N
    ).select("doc_id", F.col("hs").alias("shingles")).cache()
    if not _STOP_DF:
        # PPJoin prune (round 13): same lossless prefix/length/positional
        # candidate pruning + exact verify as dedup_ngram_jaccard — the
        # dup_losers set is identical because the final exact threshold
        # is re-applied on exact intersection counts (guide §2.3/§3).
        pairs = dd.ppjoin_jaccard_pairs(sh, _JACC_THRESHOLD)
        jacc_p = F.col("n_inter") / (
            F.col("na") + F.col("nb") - F.col("n_inter")
        ).cast("double")
        dup_losers = (
            pairs.filter(jacc_p >= _JACC_THRESHOLD)
            .select(F.col("doc_b").alias("loser_id"))
            .distinct()
        )
    else:
        # Stop-shingle cap ON: exact exploded-index machinery (see
        # dedup_ngram_jaccard's cap branch for the rationale).
        ex = dd.stop_shingle_filter(
            sh.select("doc_id", F.explode("shingles").alias("s")), _STOP_DF
        ).cache()
        inter = (
            ex.alias("a")
            .join(
                ex.alias("b"),
                (F.col("a.s") == F.col("b.s"))
                & (F.col("a.doc_id") < F.col("b.doc_id")),
            )
            .groupBy(
                F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b")
            )
            .agg(F.count(F.lit(1)).alias("n_inter"))
        )
        sizes = dd.capped_sizes(sh, ex)
        jacc = F.col("n_inter") / (
            F.col("x.n_sh") + F.col("y.n_sh") - F.col("n_inter")
        ).cast("double")
        dup_losers = (
            inter.join(sizes.alias("x"), F.col("x.doc_id") == F.col("doc_a"))
            .join(sizes.alias("y"), F.col("y.doc_id") == F.col("doc_b"))
            .filter(jacc >= _JACC_THRESHOLD)
            .select(F.col("doc_b").alias("loser_id"))
            .distinct()
        )
    return (
        scored.filter(F.col("quality") >= _CURATE_MIN_QUALITY)
        .join(
            F.broadcast(dup_losers),
            scored["doc_id"] == dup_losers["loser_id"],
            "left_anti",
        )
        .select("doc_id", "lang", "n_tokens", "quality")
    )


# --- asymmetric shingle containment (subset/quote detection) ------------------------

_CONT_TAU = 0.7  # containment threshold — catches subsets Jaccard misses


@register(
    "dedup_shingle_containment",
    oracle=f"""
    WITH wh AS (
        SELECT doc_id,
               {dd.duck_word_polyhashes_expr("text", 31)} AS wh1,
               {dd.duck_word_polyhashes_expr("text", 131)} AS wh2
        FROM documents WHERE text IS NOT NULL
    ),
    sh AS (
        SELECT doc_id,
               {dd.duck_gram_fold64_expr("wh1", "wh2", _JACC_N)} AS shingles
        FROM wh
    ),
    {dd.duck_stop_shingle_ctes(_STOP_DF)}
    {dd.DUCK_SIZES_CTE}
    inter AS (
        SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
               CAST(count(*) AS BIGINT) AS n_inter
        FROM ex a JOIN ex b ON a.s = b.s AND a.doc_id < b.doc_id
        GROUP BY 1, 2
    )
    SELECT doc_a, doc_b, n_inter,
           CAST(least(x.n_sh, y.n_sh) AS BIGINT) AS n_smaller,
           round(CAST(n_inter AS DOUBLE)
                 / CAST(least(x.n_sh, y.n_sh) AS DOUBLE), 6)
               AS containment
    FROM inter
    JOIN sz x ON x.doc_id = doc_a
    JOIN sz y ON y.doc_id = doc_b
    WHERE CAST(n_inter AS DOUBLE)
          / CAST(least(x.n_sh, y.n_sh) AS DOUBLE)
          >= {_CONT_TAU}
    """,
)
def dedup_shingle_containment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Asymmetric near-dup (X2): shingle CONTAINMENT — |A∩B| / min(|A|,|B|)
    — the subset detector Jaccard structurally misses. A short document
    quoted whole inside a long one has tiny Jaccard (union is dominated by
    the long doc) but containment ≈ 1; for training corpora this is the
    quote/excerpt/boilerplate-inclusion case (Broder's resemblance vs
    containment distinction), and the right dedup keep-rule differs too
    (keep the superset, not lowest-id).

    Same sub-quadratic machinery as ``dedup_ngram_jaccard`` — one
    inverted-index self-join on 64-bit two-level word-gram hashes, cost
    O(shared-shingle collisions); only the final score changes. The
    stop-shingle df cap (SPARK_GRAFT_STOPSHINGLE_DF, shared helpers in
    operators/dedup.py) is WIRED here since round 8 — index,
    intersections, and crucially ``n_smaller`` all use post-cap sets on
    both engines, so containment stays a true ratio over informative
    shingles. Exactness: integer intersection counts and set sizes; ONE
    double division mirrored in the oracle.
    """
    # NULL text carries no shingles; the engines' NULL-list semantics
    # diverge (Spark drops such docs through NULL joins, DuckDB folds
    # them to a zero signature pairing with everything) — filter mirrored
    docs = scale_out(load_table(spark, sf_dir, "documents")).filter(
        F.col("text").isNotNull()
    )
    # Arrow gram kernel (round 12): per-doc DISTINCT shingle-hash sets in
    # one mapInPandas pass — same integers as the HOF two-level fold the
    # oracle mirrors (parity lock in tests/test_dup_heavy_skew.py); the
    # cache feeds both the candidate index and the exact-verify rejoin
    sh = dd.gram_set_frame(docs, _JACC_N).select(
        "doc_id", F.col("hs").alias("shingles")
    ).cache()
    if not _STOP_DF:
        # PPJoin prune, containment flavor (round 13, guide §2.3/§3):
        # containment admits no length filter, so the candidate join is
        # ASYMMETRIC — full postings probe only the smaller side's prefix
        # index, with the positional filter in the join condition; exact
        # array_intersect verification downstream keeps rows bit-identical
        # to the unpruned index join the oracle still runs (lose-no-pair
        # property locked in tests/test_dup_heavy_skew.py).
        pairs = dd.ppjoin_containment_pairs(sh, _CONT_TAU)
        n_smaller = F.least(F.col("na"), F.col("nb")).cast("long")
        cont = F.col("n_inter").cast("double") / n_smaller.cast("double")
        return (
            pairs.filter(cont >= _CONT_TAU)
            .select(
                "doc_a",
                "doc_b",
                "n_inter",
                n_smaller.alias("n_smaller"),
                F.round(cont, 6).alias("containment"),
            )
        )
    # Stop-shingle cap ON: post-cap sets are not the stored arrays, so the
    # exact exploded-index machinery (with the cap's bounded fanout as the
    # scale insurance) stays the one true path.
    ex = dd.stop_shingle_filter(
        sh.select("doc_id", F.explode("shingles").alias("s")), _STOP_DF
    ).cache()
    inter = (
        ex.alias("a")
        .join(
            ex.alias("b"),
            (F.col("a.s") == F.col("b.s")) & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .groupBy(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .agg(F.count(F.lit(1)).cast("long").alias("n_inter"))
    )
    sizes = dd.capped_sizes(sh, ex)
    n_smaller = F.least(F.col("x.n_sh"), F.col("y.n_sh")).cast("long")
    cont = F.col("n_inter").cast("double") / n_smaller.cast("double")
    return (
        inter.join(sizes.alias("x"), F.col("x.doc_id") == F.col("doc_a"))
        .join(sizes.alias("y"), F.col("y.doc_id") == F.col("doc_b"))
        .filter(cont >= _CONT_TAU)
        .select(
            "doc_a",
            "doc_b",
            "n_inter",
            n_smaller.alias("n_smaller"),
            F.round(cont, 6).alias("containment"),
        )
    )


# --- MinHash estimator calibration report -------------------------------------------


@register(
    "minhash_calibration_report",
    oracle=f"""
    WITH wh AS (
        SELECT doc_id,
               {dd.duck_word_polyhashes_expr("text", 31)} AS wh1,
               {dd.duck_word_polyhashes_expr("text", 131)} AS wh2
        FROM documents WHERE text IS NOT NULL
    ),
    hs AS (
        -- len > 0 mirrors the Spark-side filter: a doc shorter than the
        -- gram width has an EMPTY hash set; MinHash/Jaccard are undefined
        -- on empty sets, and LSH bands would bucket ALL such docs together
        -- (a hot key at scale, then 0/0 in the exact-Jaccard verify)
        SELECT * FROM (
            SELECT doc_id,
                   {dd.duck_gram_fold64_expr("wh1", "wh2", _JACC_N)} AS hs
            FROM wh
        ) WHERE len(hs) > 0
    ),
    sig AS (
        SELECT doc_id, {dd.duck_minhash_sig_expr("hs", _MH_NUM)} AS sig FROM hs
    ),
    bands AS (
        SELECT doc_id, unnest({dd.duck_band_select("sig", _MH_BANDS, _MH_ROWS)},
                              recursive := true)
        FROM sig
    ),
    cand AS (
        SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
        FROM bands a
        JOIN bands b ON a.band = b.band AND a.bkey = b.bkey
                    AND a.doc_id < b.doc_id
    )
    SELECT doc_a, doc_b,
           CAST(len([i FOR i IN range(1, {_MH_NUM} + 1)
                     IF sx.sig[i] = sy.sig[i]]) AS BIGINT) AS n_sig_match,
           round(CAST(len([i FOR i IN range(1, {_MH_NUM} + 1)
                           IF sx.sig[i] = sy.sig[i]]) AS DOUBLE)
                 / {_MH_NUM}.0, 6) AS jaccard_est,
           round(len(list_intersect(x.hs, y.hs))
                 / CAST(len(x.hs) + len(y.hs)
                        - len(list_intersect(x.hs, y.hs)) AS DOUBLE), 6)
               AS jaccard_exact,
           round(abs(CAST(len([i FOR i IN range(1, {_MH_NUM} + 1)
                               IF sx.sig[i] = sy.sig[i]]) AS DOUBLE)
                     / {_MH_NUM}.0
                     - len(list_intersect(x.hs, y.hs))
                       / CAST(len(x.hs) + len(y.hs)
                              - len(list_intersect(x.hs, y.hs))
                              AS DOUBLE)), 6) AS abs_err
    FROM cand
    JOIN hs x  ON x.doc_id = doc_a
    JOIN hs y  ON y.doc_id = doc_b
    JOIN sig sx ON sx.doc_id = doc_a
    JOIN sig sy ON sy.doc_id = doc_b
    """,
)
def minhash_calibration_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Estimator-calibration diagnostics for the MinHash pipeline: on
    every LSH candidate pair, the signature-agreement estimate
    (matches/32) next to the EXACT Jaccard and their absolute error — the
    report you run before trusting a banding config at corpus scale
    (E[matches]/k = J; the spread here is the k=32 estimator variance).

    Everything is reused machinery: same signatures, same banding, same
    verify sets as ``dedup_minhash_lsh`` — the only additions are an
    integer position-match count and mirrored single-division estimates.
    No threshold filter: calibration wants the misses too. Scale: cost is
    the LSH bucket join (the candidate set), plus doc_id-keyed joins of
    signature (32 ints) and hash-set arrays.
    """
    # NULL text carries no shingles; the engines' NULL-list semantics
    # diverge (Spark drops such docs through NULL joins, DuckDB folds
    # them to a zero signature pairing with everything) — filter mirrored
    docs = scale_out(load_table(spark, sf_dir, "documents")).filter(
        F.col("text").isNotNull()
    )
    # one Arrow/numpy kernel pass for grams + signature — same rationale
    # and bit-equality lock as dedup_minhash_lsh (round 12); the single
    # cache feeds banding plus all four verify-join sides
    gs = dd.minhash_gram_sig_frame(docs, _JACC_N, _MH_NUM).cache()
    hs = gs.select("doc_id", "hs")
    sig = gs.select("doc_id", "sig")
    cand = dd.lsh_candidate_pairs(sig, "doc_id", "sig", _MH_BANDS, _MH_ROWS)
    n_match = F.expr(
        "CAST(size(filter(zip_with(sx.sig, sy.sig, (mc_a, mc_b) -> mc_a = mc_b),"
        " mc_v -> mc_v)) AS BIGINT)"
    )
    est = n_match.cast("double") / F.lit(float(_MH_NUM))
    n_inter = F.size(F.array_intersect(F.col("x.hs"), F.col("y.hs")))
    exact = n_inter / (
        F.size(F.col("x.hs")) + F.size(F.col("y.hs")) - n_inter
    ).cast("double")
    return (
        cand.withColumnRenamed("id_a", "doc_a")
        .withColumnRenamed("id_b", "doc_b")
        .join(hs.alias("x"), F.col("x.doc_id") == F.col("doc_a"))
        .join(hs.alias("y"), F.col("y.doc_id") == F.col("doc_b"))
        .join(sig.alias("sx"), F.col("sx.doc_id") == F.col("doc_a"))
        .join(sig.alias("sy"), F.col("sy.doc_id") == F.col("doc_b"))
        .select(
            "doc_a",
            "doc_b",
            n_match.alias("n_sig_match"),
            F.round(est, 6).alias("jaccard_est"),
            F.round(exact, 6).alias("jaccard_exact"),
            F.round(F.abs(est - exact), 6).alias("abs_err"),
        )
    )


# ---------------------------------------------------------------------------
# X2 — incremental fuzzy dedup (new batch vs existing corpus)
# ---------------------------------------------------------------------------

_INCR_MOD = 17  # doc_id % 17 == 0 plays today's ~6% ingest batch


@register(
    "dedup_minhash_incremental",
    oracle=f"""
    WITH wh AS (
        SELECT doc_id,
               {dd.duck_word_polyhashes_expr("text", 31)} AS wh1,
               {dd.duck_word_polyhashes_expr("text", 131)} AS wh2
        FROM documents WHERE text IS NOT NULL
    ),
    hs AS (
        SELECT * FROM (
            SELECT doc_id,
                   {dd.duck_gram_fold64_expr("wh1", "wh2", _JACC_N)} AS hs
            FROM wh
        ) WHERE len(hs) > 0
    ),
    sig AS (
        SELECT doc_id, {dd.duck_minhash_sig_expr("hs", _MH_NUM)} AS sig FROM hs
    ),
    bands AS (
        SELECT doc_id, unnest({dd.duck_band_select("sig", _MH_BANDS, _MH_ROWS)},
                              recursive := true)
        FROM sig
    ),
    cand AS (
        SELECT DISTINCT n.doc_id AS new_doc, o.doc_id AS dup_of
        FROM (SELECT * FROM bands WHERE doc_id % {_INCR_MOD} = 0) n
        JOIN (SELECT * FROM bands WHERE doc_id % {_INCR_MOD} <> 0) o
          ON n.band = o.band AND n.bkey = o.bkey
    )
    SELECT new_doc, dup_of,
           round(len(list_intersect(x.hs, y.hs))
                 / CAST(len(x.hs) + len(y.hs) - len(list_intersect(x.hs, y.hs))
                        AS DOUBLE), 6) AS jaccard
    FROM cand
    JOIN hs x ON x.doc_id = new_doc
    JOIN hs y ON y.doc_id = dup_of
    WHERE len(list_intersect(x.hs, y.hs))
          / CAST(len(x.hs) + len(y.hs) - len(list_intersect(x.hs, y.hs))
                 AS DOUBLE) >= {_JACC_THRESHOLD}
    """,
)
def dedup_minhash_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental MinHash dedup (X2, the production ingest shape): dedup
    TODAY'S BATCH against the EXISTING corpus without ever comparing
    existing-vs-existing — (new_doc, dup_of, jaccard) for every batch doc
    that near-duplicates (J >= 0.8) a standing document.

    This is the operator a daily 100 TB pipeline actually runs: the full
    self-dedup (``dedup_minhash_lsh``) happens once at bootstrap; every
    batch after that pays signature compute for ITS OWN documents plus a
    bucket equi-join into the corpus's persisted LSH index (write the
    index bucketed on (band, bkey) and the join is shuffle-free on the
    corpus side). Candidates are cross-set only
    (``operators/dedup.lsh_candidate_pairs_vs``) — batch-internal dups are
    the bootstrap operator's job, corpus-internal dups are already
    resolved, so candidate volume scales with the batch, not the corpus.

    The batch membership here is the deterministic doc_id % 17 == 0 slice
    (~6%) so the oracle can mirror it; same hashes, banding, and empty-set
    filter as the self-dedup pipeline.
    """
    docs = scale_out(load_table(spark, sf_dir, "documents")).filter(
        F.col("text").isNotNull()
    )
    # one Arrow/numpy kernel pass for grams + signature — same rationale
    # and bit-equality lock as dedup_minhash_lsh (round 12)
    gs = dd.minhash_gram_sig_frame(docs, _JACC_N, _MH_NUM).cache()
    hs = gs.select("doc_id", "hs")
    sig = gs.select("doc_id", "sig")
    is_new = F.col("doc_id") % _INCR_MOD == 0
    cand = dd.lsh_candidate_pairs_vs(
        sig.filter(is_new), sig.filter(~is_new), "doc_id", "sig",
        _MH_BANDS, _MH_ROWS,
    )
    n_inter = F.size(F.array_intersect(F.col("x.hs"), F.col("y.hs")))
    jacc = n_inter / (
        F.size(F.col("x.hs")) + F.size(F.col("y.hs")) - n_inter
    ).cast("double")
    return (
        cand.withColumnRenamed("probe_id", "new_doc")
        .withColumnRenamed("base_id", "dup_of")
        .join(hs.alias("x"), F.col("x.doc_id") == F.col("new_doc"))
        .join(hs.alias("y"), F.col("y.doc_id") == F.col("dup_of"))
        .filter(jacc >= _JACC_THRESHOLD)
        .select("new_doc", "dup_of", F.round(jacc, 6).alias("jaccard"))
    )
