"""Data-selection operators — deciding WHAT of a 100 TB corpus to train on.

The dedup/similarity layer (plans/llm.py) removes redundancy; this module
covers the next stage of a pretraining-data pipeline: scoring every
document, allocating the token budget across languages, and picking the
canonical copy when duplicates span sources. All nine additions are
standard public-literature passes:

- ``unimax_language_budgets`` — UniMax (Chung et al. 2023): water-filling
  allocation of a global token budget across languages under a per-
  language epoch cap, so head languages don't swamp the mixture and tail
  languages aren't repeated past the cap.
- ``tokenizer_fertility_by_lang`` — tokens-per-word / chars-per-token by
  language for a fixed subword segmentation (the metric used to compare
  tokenizers across languages, e.g. in the XLM-R and NLLB reports).
- ``quality_classifier_linear`` — fastText-style linear text classifier
  (Joulin et al. 2016): hashed bag-of-words weights summed per document,
  the standard cheap quality gate (GPT-3/LLaMA-style "looks like good
  text" filters).
- ``quality_tercile_buckets`` — CCNet-style head/middle/tail bucketing
  (Wenzek et al. 2020): per-language terciles of the quality score, the
  shape used to keep/downsample/drop corpus strata.
- ``char_entropy_filter`` — per-document character-level Shannon entropy
  in integer micro-nats; low-entropy documents are the classic
  repeated-character / boilerplate spam signature.
- ``dedup_canonical_by_priority`` — when exact duplicates span sources,
  keep the copy from the most-trusted source (deterministic source
  priority, doc_id tie-break): the "which copy survives" policy stage
  that follows pair/cluster detection.
- ``dedup_canonical_neardup_clusters`` — the same policy applied to
  TRANSITIVE near-dup clusters: SimHash pairs → connected components →
  source-priority canonical → per-document keep/drop verdict (the full
  production fuzzy-dedup decision, end to end).
- ``unimax_sample_plan`` — materialize the UniMax budgets as per-document
  keep decisions: deterministic scrambled-id order, cumulative token
  cutoff per language — the sampled-corpus manifest.
- ``bigram_logprob_score`` — CCNet-style perplexity signal one order up
  from the unigram scorer: per-document mean bigram log-probability under
  the corpus's own hashed-bigram LM (O(1) LM state).

Determinism contract (driver hash-compares against DuckDB):

- All scores are integer micro-units produced by rounding ONCE per
  additive term (the unigram_logprob_score / DSIR trick), so every
  downstream sum is exact BIGINT arithmetic in any association order.
- Integer division is Spark ``DIV`` / DuckDB ``//`` — both truncate
  toward zero (measured, incl. negative operands).
- The classifier's "model" is the shared polynomial hash family
  (functions/hashing.py) mapped to signed weights, identical by
  construction in both engines — no RNG, no trained artifact.
- ntile() splits N rows into buckets of floor/ceil(N/k) with earlier
  buckets larger in BOTH engines (probed); ordering always carries a
  doc_id tie-break, and NULL-score rows are filtered before ranking
  (Spark sorts NULLS FIRST asc, DuckDB NULLS LAST — excluding them is
  what keeps the two rankings identical).

Scale posture (the 100 TB question), per query, in the docstrings below.
The common theme: per-document scores are computed with JVM higher-order
functions on the text column (zero shuffle, whole-stage codegen), and
everything after the per-document pass aggregates to O(languages) or
O(duplicate clusters) rows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from kafka_streams_tcp_reconciliation_spark.functions.hashing import (
    duck_poly_hash,
    safe_seq1,
    spark_poly_hash,
)
from kafka_streams_tcp_reconciliation_spark.operators.dedup import (
    bigram_bucket_tf_frame,
)
from kafka_streams_tcp_reconciliation_spark.operators.graph import (
    connected_components_propagate,
)
from kafka_streams_tcp_reconciliation_spark.plans import register
from kafka_streams_tcp_reconciliation_spark.plans.llm import (
    SIMHASH_CAND_CTES,
    simhash_pair_frame,
)
from kafka_streams_tcp_reconciliation_spark.sources.tables import load_table

# ---------------------------------------------------------------------------
# shared per-document expressions (Spark + DuckDB dialect pairs)
# ---------------------------------------------------------------------------

# whitespace words, empties dropped (multi-space / empty-text safe)
_SPARK_WORDS = "filter(split(text, ' '), sw_w -> sw_w <> '')"
_DUCK_WORDS = "list_filter(string_split(text, ' '), sw_w -> sw_w <> '')"

# Subword segmentation for fertility: consonant-run + vowel-run syllable
# chunks. Only char classes / + / * / | — identical semantics in Java
# regex (Spark) and RE2 (DuckDB); a space is in neither class so tokens
# never cross word boundaries.
_SYL_RE = "[^aeiou ]*[aeiou]+|[^aeiou ]+"

# fastText-style hashed linear weights: w(term) = (h(term) mod 2001) - 1000,
# i.e. integer micro-units in [-1000, 1000]. The "trained model" is the
# deterministic shared hash family — cross-engine identical by construction.
_W_MOD = 2001
_W_OFF = 1000


def _spark_score_sum() -> str:
    """Spark SQL: BIGINT sum of hashed weights over a document's words —
    a single higher-order ``aggregate`` per row: no explode, no shuffle,
    whole-stage codegen."""
    return (
        f"aggregate({_SPARK_WORDS}, CAST(0 AS BIGINT),"
        f" (qc_a, qc_t) -> qc_a + (({spark_poly_hash('qc_t')}) % {_W_MOD})"
        f" - {_W_OFF})"
    )


def _duck_score_sum() -> str:
    """DuckDB SQL twin of :func:`_spark_score_sum` (list_sum of an empty
    list is NULL in DuckDB, hence the coalesce to Spark's 0 seed)."""
    return (
        f"coalesce(list_sum(list_transform({_DUCK_WORDS},"
        f" qc_t -> (({duck_poly_hash('qc_t')}) % {_W_MOD}) - {_W_OFF})),"
        f" CAST(0 AS BIGINT))"
    )


# ---------------------------------------------------------------------------
# UniMax language budgets
# ---------------------------------------------------------------------------

# Each language may be repeated at most E = 1 epoch (no repetition) and
# the global budget is 3/4 of one corpus epoch: the "downsample fairly"
# regime, where tail languages saturate (keep ALL their data) and head
# languages split the rest evenly. Chosen over E = 2 / B = 1 epoch
# because on the fixtures' language mix THAT regime never saturates
# anyone — the differential would only ever exercise one branch of the
# water-filling.
_UNIMAX_EPOCH_CAP = 1
_UNIMAX_BUDGET_NUM, _UNIMAX_BUDGET_DEN = 3, 4


@register(
    "unimax_language_budgets",
    oracle=f"""
    WITH lang_tokens AS (
        SELECT lang,
               CAST(sum(len({_DUCK_WORDS})) AS BIGINT) AS c_tokens
        FROM documents WHERE text IS NOT NULL
        GROUP BY lang
    ),
    framed AS (
        SELECT lang, c_tokens,
               CAST({_UNIMAX_EPOCH_CAP} * c_tokens AS BIGINT) AS cap_tokens,
               count(*) OVER ()                        AS n_langs,
               CAST(sum(c_tokens) OVER () * {_UNIMAX_BUDGET_NUM} AS BIGINT)
                   // {_UNIMAX_BUDGET_DEN}              AS budget,
               -- coalesce: a NULL language group (injected-null fixtures)
               -- must sort identically in both engines (Spark NULLS
               -- FIRST asc vs DuckDB NULLS LAST would split cap ties
               -- differently)
               row_number() OVER (ORDER BY {_UNIMAX_EPOCH_CAP} * c_tokens,
                                  coalesce(lang, ''))  AS i,
               -- explicit ROWS frame: DuckDB's default RANGE frame would
               -- sum BOTH rows of a (cap_tokens, coalesce(lang,'')) tie
               -- into each row's prefix (possible when a NULL-lang and an
               -- ''-lang group have equal caps), diverging from the Spark
               -- side's rowsBetween(unboundedPreceding, 0)
               CAST(sum({_UNIMAX_EPOCH_CAP} * c_tokens)
                    OVER (ORDER BY {_UNIMAX_EPOCH_CAP} * c_tokens,
                          coalesce(lang, '')
                          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                    AS BIGINT)                         AS prefix_cap
        FROM lang_tokens
    ),
    flagged AS (
        SELECT *,
               (cap_tokens * (n_langs - i + 1)
                    <= budget - (prefix_cap - cap_tokens)) AS saturated
        FROM framed
    ),
    leveled AS (
        SELECT *,
               CAST(sum(CASE WHEN saturated THEN 1 ELSE 0 END)
                    OVER () AS BIGINT) AS k,
               CAST(sum(CASE WHEN saturated THEN cap_tokens ELSE 0 END)
                    OVER () AS BIGINT) AS p_k
        FROM flagged
    )
    SELECT lang, c_tokens, cap_tokens, saturated,
           CASE WHEN saturated THEN cap_tokens * 1000000
                ELSE ((budget - p_k) * 1000000) // (n_langs - k)
           END AS alloc_micro_tokens
    FROM leveled
    """,
)
def unimax_language_budgets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UniMax budget allocation (Chung et al. 2023, "UniMax: Fairer and
    More Effective Language Sampling for Large-Scale Multilingual
    Pretraining"): distribute a global token budget B across languages as
    evenly as possible, capping each language at E epochs of its own
    token count. Here B = 3/4 of one corpus epoch and E = 1 (the
    "downsample fairly, no repetition" regime — tail languages keep all
    their data, head languages split the remainder evenly).

    Water-filling in closed form: with per-language caps sorted
    ascending, a language is *saturated* (gets its full cap) iff handing
    every not-yet-allocated language the current cap would still fit the
    remaining budget — saturation is therefore a prefix of the sorted
    order, and every unsaturated language gets the common water level
    (B - Σ saturated caps) / (#unsaturated). A plain-Python iterative
    water-filler property-tests this closed form (tests/test_selection.py).

    Determinism: token counts are exact BIGINTs; the water level is
    computed in micro-tokens with truncating integer division, so both
    engines agree bit-for-bit. If every language saturates (B ≥ Σ caps)
    the ELSE branch is never evaluated — no division by zero.

    Scale: the corpus pass is one map-side-combinable groupBy(lang) whose
    per-row token count is a higher-order filter/size on the text column
    (no explode, no token shuffle). Everything after runs on an
    O(#languages) frame — the unpartitioned windows touch ~5 rows, never
    the corpus.
    """
    docs = load_table(spark, sf_dir, "documents").filter(
        F.col("text").isNotNull()
    )
    return unimax_allocate(lang_token_counts(docs))


def lang_token_counts(docs: DataFrame) -> DataFrame:
    """(lang, c_tokens): per-language whitespace-token totals. On a
    STREAMING docs relation this groupBy IS the O(#languages) LM state
    (update mode) — see streaming/selection.py."""
    return docs.groupBy("lang").agg(
        F.sum(F.expr(f"size({_SPARK_WORDS})")).cast("long").alias("c_tokens")
    )


def unimax_allocate(lang_tokens: DataFrame) -> DataFrame:
    """Closed-form water-filling over a (lang, c_tokens) frame — pure
    DataFrame algebra on O(#languages) rows, shared by the batch query
    and the streaming twin so a full replay converges bit-exactly."""
    cap = (F.lit(_UNIMAX_EPOCH_CAP) * F.col("c_tokens")).cast("long")
    w_all = Window.partitionBy()
    # coalesce(lang, ''): cross-engine NULL sort position (see oracle)
    w_ord = Window.partitionBy().orderBy(
        "cap_tokens", F.expr("coalesce(lang, '')")
    )
    framed = lang_tokens.select(
        "lang",
        "c_tokens",
        cap.alias("cap_tokens"),
    ).select(
        "*",
        F.count(F.lit(1)).over(w_all).alias("n_langs"),
        F.expr(
            f"CAST(sum(c_tokens) OVER () * {_UNIMAX_BUDGET_NUM} AS BIGINT)"
            f" DIV {_UNIMAX_BUDGET_DEN}"
        ).alias("budget"),
        F.row_number().over(w_ord).alias("i"),
        F.sum("cap_tokens")
        .over(w_ord.rowsBetween(Window.unboundedPreceding, 0))
        .cast("long")
        .alias("prefix_cap"),
    )
    flagged = framed.withColumn(
        "saturated",
        F.col("cap_tokens") * (F.col("n_langs") - F.col("i") + 1)
        <= F.col("budget") - (F.col("prefix_cap") - F.col("cap_tokens")),
    )
    leveled = flagged.select(
        "*",
        F.sum(F.when(F.col("saturated"), 1).otherwise(0))
        .over(w_all)
        .cast("long")
        .alias("k"),
        F.sum(F.when(F.col("saturated"), F.col("cap_tokens")).otherwise(0))
        .over(w_all)
        .cast("long")
        .alias("p_k"),
    )
    return leveled.select(
        "lang",
        "c_tokens",
        "cap_tokens",
        "saturated",
        F.when(F.col("saturated"), F.col("cap_tokens") * F.lit(1_000_000))
        .otherwise(
            F.expr(
                "((budget - p_k) * CAST(1000000 AS BIGINT))"
                " DIV (n_langs - k)"
            )
        )
        .cast("long")
        .alias("alloc_micro_tokens"),
    )


# ---------------------------------------------------------------------------
# Tokenizer fertility by language
# ---------------------------------------------------------------------------


@register(
    "tokenizer_fertility_by_lang",
    oracle=f"""
    WITH per_doc AS (
        SELECT lang,
               CAST(len({_DUCK_WORDS}) AS BIGINT)      AS n_words,
               CAST(len(regexp_extract_all(text, '{_SYL_RE}'))
                    AS BIGINT)                         AS n_subtok,
               CAST(length(replace(text, ' ', '')) AS BIGINT) AS n_chars
        FROM documents WHERE text IS NOT NULL
    )
    SELECT lang,
           CAST(count(*) AS BIGINT)     AS n_docs,
           CAST(sum(n_words) AS BIGINT) AS n_words,
           CAST(sum(n_subtok) AS BIGINT) AS n_subtokens,
           CAST(sum(n_chars) AS BIGINT) AS n_chars,
           CAST(sum(n_subtok) * 1000000 AS BIGINT)
               // nullif(CAST(sum(n_words) AS BIGINT), 0)
               AS fertility_micro,
           CAST(sum(n_chars) * 1000000 AS BIGINT)
               // nullif(CAST(sum(n_subtok) AS BIGINT), 0)
               AS chars_per_subtok_micro
    FROM per_doc
    GROUP BY lang
    """,
)
def tokenizer_fertility_by_lang(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tokenizer fertility (subword tokens per whitespace word) and
    compression (chars per subword token) by language — the standard
    cross-language tokenizer-fairness report (XLM-R, NLLB): a language
    whose fertility is 2× pays 2× the sequence length for the same text.

    The segmentation is a fixed public rule (consonant-run + vowel-run
    chunks via one regex) rather than a learned vocab — the Spark surface
    (regexp_extract_all + higher-order counting, per-row, shuffle-free)
    is identical for any regex-describable pre-tokenizer, which is how
    GPT-2/tiktoken-style pre-tokenization is expressed.

    Determinism: all counts are exact BIGINTs; ratios are micro-unit
    truncating integer division, NULL for empty denominators (a language
    with only empty documents).

    Scale: one corpus scan; per-row token counts stay inside whole-stage
    codegen (no explode — size() over the extracted arrays), then a
    map-side-combinable groupBy(lang) to an O(#languages) result.
    """
    docs = load_table(spark, sf_dir, "documents").filter(
        F.col("text").isNotNull()
    )
    per_doc = docs.select(
        "lang",
        F.expr(f"CAST(size({_SPARK_WORDS}) AS BIGINT)").alias("n_words"),
        F.expr(
            f"CAST(size(regexp_extract_all(text, '{_SYL_RE}', 0)) AS BIGINT)"
        ).alias("n_subtok"),
        F.length(F.regexp_replace("text", " ", ""))
        .cast("long")
        .alias("n_chars"),
    )
    return per_doc.groupBy("lang").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum("n_words").cast("long").alias("n_words"),
        F.sum("n_subtok").cast("long").alias("n_subtokens"),
        F.sum("n_chars").cast("long").alias("n_chars"),
        F.expr(
            "CAST(sum(n_subtok) * 1000000 AS BIGINT)"
            " DIV nullif(CAST(sum(n_words) AS BIGINT), 0)"
        ).alias("fertility_micro"),
        F.expr(
            "CAST(sum(n_chars) * 1000000 AS BIGINT)"
            " DIV nullif(CAST(sum(n_subtok) AS BIGINT), 0)"
        ).alias("chars_per_subtok_micro"),
    )


# ---------------------------------------------------------------------------
# fastText-style linear quality classifier
# ---------------------------------------------------------------------------


@register(
    "quality_classifier_linear",
    oracle=f"""
    SELECT doc_id,
           CAST(len({_DUCK_WORDS}) AS BIGINT) AS n_words,
           CAST({_duck_score_sum()} AS BIGINT) AS score_sum,
           CAST({_duck_score_sum()} * 1000000 AS BIGINT)
               // nullif(CAST(len({_DUCK_WORDS}) AS BIGINT), 0)
               AS score_micro,
           (CAST({_duck_score_sum()} * 1000000 AS BIGINT)
               // nullif(CAST(len({_DUCK_WORDS}) AS BIGINT), 0)) >= 0
               AS keep
    FROM documents WHERE text IS NOT NULL
    """,
)
def quality_classifier_linear(spark: SparkSession, sf_dir: str) -> DataFrame:
    """fastText-style linear quality score (Joulin et al. 2016): each word
    hashes to a signed integer weight in [-1000, 1000] micro-units; the
    document score is the mean weight, and ``keep`` is the sign gate —
    structurally the GPT-3/LLaMA "quality classifier" filter pass with
    the learned weight table replaced by the repo's deterministic hash
    family (a real model would broadcast its weight table and join, or
    inline it the same way; the Spark plan is unchanged).

    Determinism: the weight sum is exact BIGINT (one hash → one integer
    weight per word, summed by a higher-order aggregate); the mean is
    micro-unit truncating division, NULL (and NULL keep) for empty
    documents.

    Scale: zero shuffles — the entire scorer is per-row JVM higher-order
    expressions inside whole-stage codegen; output is one row per
    document with no aggregation barrier, so it pipelines straight into
    a downstream filter/write at any corpus size.
    """
    docs = load_table(spark, sf_dir, "documents").filter(
        F.col("text").isNotNull()
    )
    # Round-12 keep/revert audit: the Arrow quality_score_frame kernel
    # was tried here and REVERTED — this query is a sub-0.3 s zero-
    # shuffle per-row map whose HOF scorer beats the kernel's Python-
    # stage floor at bench scale (isolated medians 0.293 s HOF vs
    # 0.838 s kernel; OPTIMIZATION_r12.md). The kernel (bit-equal,
    # parity-locked) remains available for corpora where per-doc word
    # volume amortizes the boundary.
    scored = docs.select(
        "doc_id",
        F.expr(f"CAST(size({_SPARK_WORDS}) AS BIGINT)").alias("n_words"),
        F.expr(f"CAST({_spark_score_sum()} AS BIGINT)").alias("score_sum"),
    ).select(
        "*",
        F.expr(
            "(score_sum * CAST(1000000 AS BIGINT))"
            " DIV nullif(n_words, CAST(0 AS BIGINT))"
        ).alias("score_micro"),
    )
    return scored.select(
        "*", (F.col("score_micro") >= 0).alias("keep")
    )


# ---------------------------------------------------------------------------
# CCNet-style per-language quality terciles
# ---------------------------------------------------------------------------


@register(
    "quality_tercile_buckets",
    oracle=f"""
    WITH scored AS (
        SELECT doc_id, lang,
               CAST({_duck_score_sum()} * 1000000 AS BIGINT)
                   // CAST(len({_DUCK_WORDS}) AS BIGINT) AS score_micro
        FROM documents
        WHERE text IS NOT NULL AND len({_DUCK_WORDS}) > 0
    ),
    ranked AS (
        SELECT lang, score_micro,
               ntile(3) OVER (PARTITION BY lang
                              ORDER BY score_micro, doc_id) AS tercile
        FROM scored
    )
    SELECT lang, CAST(tercile AS INT) AS tercile,
           CAST(count(*) AS BIGINT)   AS n_docs,
           CAST(min(score_micro) AS BIGINT) AS min_score_micro,
           CAST(max(score_micro) AS BIGINT) AS max_score_micro,
           CAST(sum(score_micro) AS BIGINT) // CAST(count(*) AS BIGINT)
               AS mean_score_micro
    FROM ranked
    GROUP BY lang, tercile
    """,
)
def quality_tercile_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CCNet-style head/middle/tail strata (Wenzek et al. 2020): per
    language, rank documents by the linear quality score and cut into
    terciles; report each stratum's size and score range. CCNet keeps
    "head", downsamples "middle", drops "tail" — this query is the
    stratification that policy reads.

    Determinism: ntile(3) splits N rows with earlier buckets larger in
    both engines (probed); the ordering carries a doc_id tie-break, and
    zero-word documents (NULL score) are filtered BEFORE ranking because
    the engines disagree on NULL sort position (Spark NULLS FIRST asc,
    DuckDB NULLS LAST). Stratum means are truncating integer division.

    Scale: the scorer is shuffle-free (see quality_classifier_linear);
    ntile is one sort per language partition — Spark's distributed
    range-partitioned sort, the same cost class as any global ranking
    operator (and exactly what CCNet does corpus-wide). The final rollup
    is O(#languages × 3) rows. For a sort-free approximation at extreme
    scale, cut at approx_percentile(score, [1/3, 2/3]) instead — same
    downstream shape; this query keeps the exact semantics so the oracle
    can hash-match.
    """
    docs = load_table(spark, sf_dir, "documents").filter(
        F.col("text").isNotNull()
    )
    # Round-12 keep/revert audit: kernel scorer tried and REVERTED here
    # (isolated medians 0.941 s HOF vs 1.545 s kernel at sf0.1) — see
    # quality_classifier_linear / OPTIMIZATION_r12.md.
    scored = docs.select(
        "doc_id",
        "lang",
        F.expr(f"CAST(size({_SPARK_WORDS}) AS BIGINT)").alias("n_words"),
        F.expr(f"CAST({_spark_score_sum()} AS BIGINT)").alias("score_sum"),
    ).filter(F.col("n_words") > 0).select(
        "doc_id",
        "lang",
        F.expr("(score_sum * CAST(1000000 AS BIGINT)) DIV n_words").alias(
            "score_micro"
        ),
    )
    ranked = scored.select(
        "lang",
        "score_micro",
        F.ntile(3)
        .over(
            Window.partitionBy("lang").orderBy("score_micro", "doc_id")
        )
        .alias("tercile"),
    )
    return ranked.groupBy("lang", "tercile").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.min("score_micro").cast("long").alias("min_score_micro"),
        F.max("score_micro").cast("long").alias("max_score_micro"),
        F.expr(
            "CAST(sum(score_micro) AS BIGINT) DIV CAST(count(*) AS BIGINT)"
        ).alias("mean_score_micro"),
    )


_TERCILE_APPROX_ACC = 1000  # GK sketch accuracy: eps = 1/acc of rank


@register(
    "quality_tercile_buckets_approx",
    oracle=f"""
    WITH scored AS (
        SELECT lang,
               CAST({_duck_score_sum()} * 1000000 AS BIGINT)
                   // CAST(len({_DUCK_WORDS}) AS BIGINT) AS score_micro
        FROM documents
        WHERE text IS NOT NULL AND len({_DUCK_WORDS}) > 0
    ),
    per_lang AS (
        SELECT lang, CAST(count(*) AS BIGINT) AS n_docs
        FROM scored GROUP BY lang
    )
    SELECT lang, CAST(t.q_permille AS INT) AS q_permille, n_docs,
           TRUE AS within_bound
    FROM per_lang CROSS JOIN (VALUES (333), (667)) AS t(q_permille)
    """,
)
def quality_tercile_buckets_approx(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sort-free tercile stratification — the documented extreme-scale
    escape hatch of ``quality_tercile_buckets``, promoted from prose to a
    tested query (round 11): per language, cut at
    approx_percentile(score, [1/3, 2/3]) GK-sketch cutpoints instead of
    ntile's full per-language sort, so parallelism is no longer bounded
    by #languages (the sketch merges map-side across ALL partitions; the
    per-language sort disappears entirely).

    Sketch cutpoints are engine-specific, so — exactly like
    ``approx_percentile_value`` / ``approx_distinct_users`` — the sketch
    half is validated through its deterministic rank guarantee rather
    than its raw value: with accuracy {_TERCILE_APPROX_ACC} (eps =
    1/{_TERCILE_APPROX_ACC}), the returned cutpoint's rank interval
    [count(score < v) + 1, count(score <= v)] must intersect
    q·n ± (5·eps·n + 2) — tie-robust on duplicate-heavy corpora, where
    count(score <= v) jumps discontinuously across a tie block. The
    exact half (per-language population) is value-checked directly;
    ``within_bound`` is a column both engines agree on iff the sketch
    honours its guarantee.

    Scale: one corpus pass builds (n, cutpoints) per language
    (map-side-combinable sketch agg); the rank re-check joins the
    O(#languages) cutpoint frame back broadcast — the same
    one-extra-pass shape as approx_percentile_value.
    """
    docs = load_table(spark, sf_dir, "documents").filter(
        F.col("text").isNotNull()
    )
    # Round-12 keep/revert audit: kernel scorer tried and REVERTED here
    # (shares the scorer with quality_tercile_buckets; same floor) — see
    # OPTIMIZATION_r12.md.
    scored = docs.select(
        "lang",
        F.expr(f"CAST(size({_SPARK_WORDS}) AS BIGINT)").alias("n_words"),
        F.expr(f"CAST({_spark_score_sum()} AS BIGINT)").alias("score_sum"),
    ).filter(F.col("n_words") > 0).select(
        "lang",
        F.expr("(score_sum * CAST(1000000 AS BIGINT)) DIV n_words").alias(
            "score_micro"
        ),
    ).cache()
    # cache: (lang, score_micro) feeds the sketch agg AND the rank
    # re-check probe — uncached, the interpreted HOF scoring pass runs
    # once per consumer (measured 27 s vs ~10 s at sf10). Two narrow
    # columns, so the cached footprint is tiny relative to the corpus.
    # Lifetime contract = bigram_logprob_score's tf cache: the caller
    # materializes, then clearCache()/unpersist (bench + differential
    # harnesses already do).
    cuts = scored.groupBy("lang").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.expr(
            "approx_percentile(score_micro,"
            f" array(CAST(1 AS DOUBLE)/3, CAST(2 AS DOUBLE)/3),"
            f" {_TERCILE_APPROX_ACC})"
        ).alias("cs"),
    )
    # NULL-SAFE join: a NULL-lang group must survive the rank re-check
    # exactly like the oracle's per_lang CTE keeps it (a plain equi-join
    # silently drops it — caught by the null-injection sweep round 11)
    ranks = (
        scored.join(
            F.broadcast(cuts.withColumnRenamed("lang", "ct_lang")),
            F.col("lang").eqNullSafe(F.col("ct_lang")),
        )
        .drop("ct_lang")
        .groupBy("lang", "n_docs")
        .agg(
            F.sum(F.when(F.col("score_micro") < F.expr("cs[0]"), 1).otherwise(0))
            .cast("long")
            .alias("r1_lt"),
            F.sum(F.when(F.col("score_micro") <= F.expr("cs[0]"), 1).otherwise(0))
            .cast("long")
            .alias("r1_le"),
            F.sum(F.when(F.col("score_micro") < F.expr("cs[1]"), 1).otherwise(0))
            .cast("long")
            .alias("r2_lt"),
            F.sum(F.when(F.col("score_micro") <= F.expr("cs[1]"), 1).otherwise(0))
            .cast("long")
            .alias("r2_le"),
        )
    )
    eps_slack = (
        F.col("n_docs").cast("double") * 5.0 / _TERCILE_APPROX_ACC + 2.0
    )

    def bound(q_num: int, lt: str, le: str):
        target = F.col("n_docs").cast("double") * q_num / 3.0
        # the cutpoint's rank interval [lt+1, le] must intersect
        # target ± eps_slack
        return (F.col(lt).cast("double") + 1 <= target + eps_slack) & (
            F.col(le).cast("double") >= target - eps_slack
        )

    return ranks.select(
        "lang",
        "n_docs",
        F.explode(
            F.array(
                F.struct(
                    F.lit(333).cast("int").alias("q_permille"),
                    bound(1, "r1_lt", "r1_le").alias("within_bound"),
                ),
                F.struct(
                    F.lit(667).cast("int").alias("q_permille"),
                    bound(2, "r2_lt", "r2_le").alias("within_bound"),
                ),
            )
        ).alias("qb"),
    ).select(
        "lang",
        F.col("qb.q_permille").alias("q_permille"),
        "n_docs",
        F.col("qb.within_bound").alias("within_bound"),
    )


# ---------------------------------------------------------------------------
# Character-entropy spam filter
# ---------------------------------------------------------------------------

_LOW_ENTROPY_MICRO = 2_000_000  # 2.0 nats; healthy word-text sits ~2.7-3.0


@register(
    "char_entropy_filter",
    oracle=f"""
    WITH chars AS (
        SELECT doc_id, unnest(string_split(text, '')) AS ch
        FROM documents
        WHERE text IS NOT NULL AND length(text) > 0
    ),
    counts AS (
        SELECT doc_id, ch, CAST(count(*) AS BIGINT) AS cnt
        FROM chars WHERE ch <> '' GROUP BY doc_id, ch
    )
    SELECT doc_id,
           CAST(sum(cnt) AS BIGINT)  AS n_chars,
           CAST(count(*) AS BIGINT)  AS n_distinct_chars,
           CAST(round(ln(sum(cnt)) * 1000000) AS BIGINT)
               - CAST(sum(CAST(round(cnt * ln(cnt) * 1000000) AS BIGINT))
                      AS BIGINT) // CAST(sum(cnt) AS BIGINT)
               AS entropy_micro,
           (CAST(round(ln(sum(cnt)) * 1000000) AS BIGINT)
               - CAST(sum(CAST(round(cnt * ln(cnt) * 1000000) AS BIGINT))
                      AS BIGINT) // CAST(sum(cnt) AS BIGINT))
               < {_LOW_ENTROPY_MICRO} AS is_low_entropy
    FROM counts
    GROUP BY doc_id
    """,
)
def char_entropy_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document character-level Shannon entropy in integer micro-nats,
    with a low-entropy flag — the classic repeated-character / template
    spam signature (a doc of one repeated char has entropy ~0; healthy
    lowercase word text sits near ln(27) ≈ 3.3 nats). Used as a cheap
    pre-filter before the expensive dedup/classifier passes.

    H = ln(n) − (Σ_c cnt_c·ln cnt_c)/n over character counts cnt_c.
    Determinism: each additive term cnt·ln(cnt) is rounded ONCE to
    integer micro-nats (the DSIR trick), so the per-document sum is
    exact BIGINT in any association order; the final division truncates
    identically (DIV vs //). Empty documents are excluded up front
    (length 0 has no entropy; also the engines disagree on splitting '').

    Scale: explode-to-characters is the one corpus-sized stage — a
    single shuffle keyed (doc_id, char) with full map-side combine (≤28
    distinct chars per doc partition-locally), then an O(docs) rollup.
    Linear, skew-free (keys are doc-scoped), no Python anywhere.
    """
    docs = load_table(spark, sf_dir, "documents").filter(
        F.col("text").isNotNull() & (F.length("text") > 0)
    )
    counts = (
        docs.select("doc_id", F.explode(F.split("text", "")).alias("ch"))
        .filter(F.col("ch") != "")
        .groupBy("doc_id", "ch")
        .agg(F.count(F.lit(1)).cast("long").alias("cnt"))
    )
    ent = F.expr(
        "CAST(round(ln(sum(cnt)) * 1000000) AS BIGINT)"
        " - CAST(sum(CAST(round(cnt * ln(cnt) * 1000000) AS BIGINT))"
        " AS BIGINT) DIV CAST(sum(cnt) AS BIGINT)"
    )
    return counts.groupBy("doc_id").agg(
        F.sum("cnt").cast("long").alias("n_chars"),
        F.count(F.lit(1)).cast("long").alias("n_distinct_chars"),
        ent.alias("entropy_micro"),
        (ent < F.lit(_LOW_ENTROPY_MICRO)).alias("is_low_entropy"),
    )


# ---------------------------------------------------------------------------
# Canonical-copy selection across sources
# ---------------------------------------------------------------------------


@register(
    "dedup_canonical_by_priority",
    oracle=f"""
    WITH ranked AS (
        SELECT md5(text) AS text_hash, doc_id, source,
               -- explicit NULL-source guard: a NULL source (injected-null
               -- fixtures) gets the WORST priority sentinel in both
               -- engines. Must be a CASE on source, not a coalesce around
               -- the hash: DuckDB's range(1, NULL) is an EMPTY list, so
               -- its poly hash of NULL folds to the seed 0, while Spark's
               -- NULL-propagates — the two coalesces would see different
               -- inputs (hashing.py "NULL input" note)
               CASE WHEN source IS NULL THEN 100
                    ELSE ({duck_poly_hash("source")}) % 100 END
                   AS src_priority,
               row_number() OVER (
                   PARTITION BY md5(text)
                   ORDER BY CASE WHEN source IS NULL THEN 100
                                 ELSE ({duck_poly_hash("source")}) % 100 END,
                            doc_id
               ) AS rn,
               count(*) OVER (PARTITION BY md5(text)) AS n_copies
        FROM documents WHERE text IS NOT NULL
    ),
    srcs AS (
        SELECT md5(text) AS text_hash,
               CAST(count(DISTINCT source) AS BIGINT) AS n_distinct_sources
        FROM documents WHERE text IS NOT NULL GROUP BY md5(text)
    )
    SELECT r.text_hash,
           r.doc_id     AS canonical_doc_id,
           r.source     AS canonical_source,
           CAST(r.src_priority AS BIGINT) AS src_priority,
           CAST(r.n_copies AS BIGINT)     AS n_copies,
           s.n_distinct_sources
    FROM ranked r JOIN srcs s ON r.text_hash = s.text_hash
    WHERE r.rn = 1
    """,
)
def dedup_canonical_by_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Canonical-copy selection: the deduped corpus KEEP-LIST — one row
    per distinct text, carrying which copy survives (the copy from the
    highest-priority source, lowest priority number, doc_id tie-break)
    plus the cluster's size and source spread. This is the policy stage
    after detection — real pipelines rank Wikipedia over Common Crawl
    over a scrape; here the priority table is a deterministic hash of the
    source name (a real deployment broadcasts a tiny source→priority dim
    instead; the plan is identical). Singleton clusters are kept in the
    output on purpose: the keep-list IS the deduped corpus mapping, and
    downstream consumers (``n_copies > 1`` for an audit, a semi-join on
    canonical_doc_id for the rewrite) filter it.

    Determinism: the cluster key is md5(text) (identical in both
    engines); the canonical pick is an argmin over (priority, doc_id) —
    a total order, so no min_by tie ambiguity.

    Scale: shuffles are keyed on the 32-char md5 (never the full text —
    at 100 TB the shuffle payload is doc metadata, not documents). The
    count-distinct makes Catalyst plan the standard two-phase distinct
    aggregate: a map-side-combined exchange on (text_hash, source)
    followed by an exchange on text_hash over already-cluster-sized rows
    — one corpus-metadata shuffle plus one shuffle of the (much smaller)
    per-(text, source) frame. The argmin is a lexicographic struct min,
    combinable in both phases. Output is O(distinct texts), the same
    cardinality class as the deduped corpus itself.
    """
    docs = load_table(spark, sf_dir, "documents").filter(
        F.col("text").isNotNull()
    )
    base = docs.select(
        F.md5("text").alias("text_hash"),
        "doc_id",
        "source",
        F.expr(
            f"CASE WHEN source IS NULL THEN 100"
            f" ELSE ({spark_poly_hash('source')}) % 100 END"
        ).alias("src_priority"),
    )
    agg = base.groupBy("text_hash").agg(
        F.min(F.struct("src_priority", "doc_id", "source")).alias("best"),
        F.count(F.lit(1)).cast("long").alias("n_copies"),
        F.countDistinct("source").cast("long").alias("n_distinct_sources"),
    )
    return agg.select(
        "text_hash",
        F.col("best.doc_id").alias("canonical_doc_id"),
        F.col("best.source").alias("canonical_source"),
        F.col("best.src_priority").cast("long").alias("src_priority"),
        "n_copies",
        "n_distinct_sources",
    )


# ---------------------------------------------------------------------------
# Canonical selection over TRANSITIVE near-dup clusters
# ---------------------------------------------------------------------------


@register(
    "dedup_canonical_neardup_clusters",
    oracle=f"""
    WITH RECURSIVE {SIMHASH_CAND_CTES},
    edges AS (
        SELECT doc_a AS src, doc_b AS dst FROM simhash_pairs
        UNION
        SELECT doc_b AS src, doc_a AS dst FROM simhash_pairs
    ),
    walk(src, dst) AS (
        SELECT src, dst FROM edges
        UNION
        SELECT w.src, e.dst FROM walk w JOIN edges e ON w.dst = e.src
    ),
    labeled AS (
        SELECT src AS doc_id, least(src, min(dst)) AS cluster_id
        FROM walk GROUP BY src
    ),
    pri AS (
        SELECT l.doc_id, l.cluster_id, d.source,
               CASE WHEN d.source IS NULL THEN 100
                    ELSE ({duck_poly_hash("d.source")}) % 100 END
                   AS src_priority
        FROM labeled l JOIN documents d ON d.doc_id = l.doc_id
    ),
    ranked AS (
        SELECT *,
               row_number() OVER (PARTITION BY cluster_id
                                  ORDER BY src_priority, doc_id) AS rn,
               count(*) OVER (PARTITION BY cluster_id) AS cluster_size
        FROM pri
    ),
    canon AS (
        SELECT cluster_id, doc_id AS canonical_doc_id,
               source AS canonical_source
        FROM ranked WHERE rn = 1
    )
    SELECT r.doc_id, r.cluster_id,
           CAST(r.cluster_size AS BIGINT) AS cluster_size,
           c.canonical_doc_id, c.canonical_source,
           r.doc_id = c.canonical_doc_id AS is_kept
    FROM ranked r JOIN canon c USING (cluster_id)
    """,
)
def dedup_canonical_neardup_clusters(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """The full production near-dup dedup decision, end to end: SimHash
    candidate pairs → transitive clusters (connected components) →
    per-cluster canonical chosen by SOURCE PRIORITY (doc_id tie-break) →
    a per-document keep/drop verdict. Composes the three layers the repo
    implements separately (``dedup_simhash`` pairs,
    ``dedup_cluster_resolve`` components, ``dedup_canonical_by_priority``
    policy): A~B~C collapses to one survivor even when A and C were never
    directly paired, and the survivor is the most-trusted source's copy —
    NOT simply the lowest doc_id (the policy real pipelines actually
    want: prefer the Wikipedia copy over the crawl copy wherever the
    cluster membership came from).

    Determinism: cluster labels are min-doc_id components
    (algorithm-independent); the canonical argmin runs over the total
    order (priority, doc_id); the NULL-source sentinel and the hash
    family are shared with dedup_canonical_by_priority.

    Scale: pair generation is the blocked SimHash index (never all
    pairs); label propagation is diameter-bounded rounds of an
    equi-shuffle; the policy stage adds ONE window over clusters — output
    is O(docs in near-dup clusters), a vanishing fraction of the corpus.
    The oracle mirrors the pipeline with a recursive transitive closure
    over the same pair CTEs.
    """
    docs = load_table(spark, sf_dir, "documents")
    pairs = simhash_pair_frame(spark, sf_dir).select("doc_a", "doc_b")
    labels = connected_components_propagate(pairs, "doc_a", "doc_b").select(
        F.col("node").alias("doc_id"), F.col("component").alias("cluster_id")
    )
    pri = labels.join(
        docs.select("doc_id", "source"), "doc_id"
    ).withColumn(
        "src_priority",
        F.expr(
            f"CASE WHEN source IS NULL THEN 100"
            f" ELSE ({spark_poly_hash('source')}) % 100 END"
        ),
    )
    w_clu = Window.partitionBy("cluster_id")
    ranked = pri.select(
        "*",
        F.row_number()
        .over(w_clu.orderBy("src_priority", "doc_id"))
        .alias("rn"),
        F.count(F.lit(1)).over(w_clu).cast("long").alias("cluster_size"),
    )
    canon = ranked.filter(F.col("rn") == 1).select(
        "cluster_id",
        F.col("doc_id").alias("canonical_doc_id"),
        F.col("source").alias("canonical_source"),
    )
    return ranked.join(canon, "cluster_id").select(
        "doc_id",
        "cluster_id",
        "cluster_size",
        "canonical_doc_id",
        "canonical_source",
        (F.col("doc_id") == F.col("canonical_doc_id")).alias("is_kept"),
    )


# ---------------------------------------------------------------------------
# UniMax sample plan — materialize the budget as per-document decisions
# ---------------------------------------------------------------------------

# affine scramble of doc_id (see plans/pipeline._SAMPLE_HASH rationale:
# the char-fold hash is near-monotone on sequential ids; the affine map
# decorrelates sampling order from ingestion order)
_DOC_SCRAMBLE = "((doc_id % 1000000007) * 2654435761 + 1013904223) % 1000000007"


@register(
    "unimax_sample_plan",
    oracle=f"""
    WITH lang_tokens AS (
        -- lang IS NOT NULL: a NULL-lang group would be counted toward the
        -- global budget B but could never be sampled (the final inner join
        -- on lang never matches NULL), silently under-spending B on
        -- null-lang corpora. Budgets here are computed over the sampleable
        -- population only.
        SELECT lang,
               CAST(sum(len({_DUCK_WORDS})) AS BIGINT) AS c_tokens
        FROM documents WHERE text IS NOT NULL AND lang IS NOT NULL
        GROUP BY lang
    ),
    framed AS (
        SELECT lang, c_tokens,
               CAST({_UNIMAX_EPOCH_CAP} * c_tokens AS BIGINT) AS cap_tokens,
               count(*) OVER ()                        AS n_langs,
               CAST(sum(c_tokens) OVER () * {_UNIMAX_BUDGET_NUM} AS BIGINT)
                   // {_UNIMAX_BUDGET_DEN}              AS budget,
               row_number() OVER (ORDER BY {_UNIMAX_EPOCH_CAP} * c_tokens,
                                  coalesce(lang, ''))  AS i,
               -- explicit ROWS frame: DuckDB's default RANGE frame would
               -- sum BOTH rows of a (cap_tokens, coalesce(lang,'')) tie
               -- into each row's prefix (possible when a NULL-lang and an
               -- ''-lang group have equal caps), diverging from the Spark
               -- side's rowsBetween(unboundedPreceding, 0)
               CAST(sum({_UNIMAX_EPOCH_CAP} * c_tokens)
                    OVER (ORDER BY {_UNIMAX_EPOCH_CAP} * c_tokens,
                          coalesce(lang, '')
                          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                    AS BIGINT)                         AS prefix_cap
        FROM lang_tokens
    ),
    flagged AS (
        SELECT *,
               (cap_tokens * (n_langs - i + 1)
                    <= budget - (prefix_cap - cap_tokens)) AS saturated
        FROM framed
    ),
    leveled AS (
        SELECT *,
               CAST(sum(CASE WHEN saturated THEN 1 ELSE 0 END)
                    OVER () AS BIGINT) AS k,
               CAST(sum(CASE WHEN saturated THEN cap_tokens ELSE 0 END)
                    OVER () AS BIGINT) AS p_k
        FROM flagged
    ),
    budgets AS (
        SELECT lang,
               CASE WHEN saturated THEN cap_tokens * 1000000
                    ELSE ((budget - p_k) * 1000000) // (n_langs - k)
               END AS alloc_micro_tokens
        FROM leveled
    ),
    ordered AS (
        SELECT doc_id, lang,
               CAST(len({_DUCK_WORDS}) AS BIGINT) AS n_words,
               CAST(sum(CAST(len({_DUCK_WORDS}) AS BIGINT) * 1000000)
                    OVER (PARTITION BY lang
                          ORDER BY {_DOC_SCRAMBLE}, doc_id
                          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                    AS BIGINT) AS cum_micro_tokens
        FROM documents WHERE text IS NOT NULL AND lang IS NOT NULL
    )
    SELECT o.doc_id, o.lang, o.n_words, o.cum_micro_tokens
    FROM ordered o JOIN budgets b ON o.lang = b.lang
    WHERE o.cum_micro_tokens <= b.alloc_micro_tokens
    """,
)
def unimax_sample_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Materialize the UniMax budgets as per-document KEEP decisions: per
    language, walk documents in deterministic scrambled-id order,
    accumulate token cost, and keep the prefix that fits the language's
    water-filled allocation. This is the step that turns a mixture plan
    into an actual training set — the output is the sampled corpus
    manifest (doc_id + its cumulative position), reproducible run-to-run
    with no RNG (the affine id scramble decorrelates sampling order from
    ingestion order; a char-fold hash would not — see
    plans/pipeline._SAMPLE_HASH).

    Boundary semantics: greedy prefix — a document that would straddle
    the budget line is dropped entirely (its successors too: the cut is
    a cumulative threshold, identical in both engines' exact BIGINT
    arithmetic). NULL-language documents are excluded from BOTH the
    budget computation and the sample (round-11 ADVICE fix: previously
    their tokens inflated the global budget B while the inner join on
    lang made their allocation unspendable, so the realized sample
    silently under-spent B on null-lang corpora).

    Scale: the budget frame is O(#languages) (see
    unimax_language_budgets) and broadcasts onto the corpus; the cumsum
    is one window sort per language — the same distributed-sort cost
    class as the CCNet tercile ranking, paid once to emit a manifest.
    """
    docs = load_table(spark, sf_dir, "documents").filter(
        F.col("text").isNotNull() & F.col("lang").isNotNull()
    )
    budgets = unimax_allocate(lang_token_counts(docs)).select(
        "lang", "alloc_micro_tokens"
    )
    w = (
        Window.partitionBy("lang")
        .orderBy(F.expr(_DOC_SCRAMBLE), "doc_id")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    ordered = docs.select(
        "doc_id",
        "lang",
        F.expr(f"CAST(size({_SPARK_WORDS}) AS BIGINT)").alias("n_words"),
    ).select(
        "*",
        F.sum(F.col("n_words") * F.lit(1_000_000))
        .over(w)
        .cast("long")
        .alias("cum_micro_tokens"),
    )
    return ordered.join(F.broadcast(budgets), "lang").filter(
        F.col("cum_micro_tokens") <= F.col("alloc_micro_tokens")
    ).select("doc_id", "lang", "n_words", "cum_micro_tokens")


# ---------------------------------------------------------------------------
# Bigram LM perplexity scoring (hashed contexts, O(1) LM state)
# ---------------------------------------------------------------------------

_BIGRAM_BUCKETS = 4096


@register(
    "bigram_logprob_score",
    oracle=f"""
    WITH pairs AS (
        SELECT doc_id, p.b1, p.b2
        FROM (
            SELECT doc_id,
                   unnest(list_transform(range(1, len(hs)),
                          bg_i -> struct_pack(b1 := hs[bg_i],
                                              b2 := hs[bg_i + 1]))) AS p
            FROM (
                -- hash each word once, then pair adjacent buckets
                -- (mirrors the Spark layout)
                SELECT doc_id,
                       list_transform({_DUCK_WORDS},
                           bg_w -> ({duck_poly_hash("bg_w")})
                                   % {_BIGRAM_BUCKETS}) AS hs
                FROM documents WHERE text IS NOT NULL
            )
        )
    ),
    tf AS (
        SELECT doc_id, b1, b2, CAST(count(*) AS BIGINT) AS tf
        FROM pairs GROUP BY 1, 2, 3
    ),
    lm AS (
        SELECT b1, b2, CAST(sum(tf) AS BIGINT) AS c12 FROM tf GROUP BY 1, 2
    ),
    ctx AS (
        SELECT b1, CAST(sum(c12) AS BIGINT) AS c1 FROM lm GROUP BY b1
    ),
    ratio AS (
        SELECT lm.b1, lm.b2,
               CAST(round((ln(lm.c12 + 1.0)
                           - ln(ctx.c1 + {_BIGRAM_BUCKETS}))
                          * 1000000) AS BIGINT) AS logp_micro
        FROM lm JOIN ctx ON lm.b1 = ctx.b1
    )
    SELECT tf.doc_id,
           CAST(sum(tf.tf) AS BIGINT) AS n_bigrams,
           CAST(CAST(sum(tf.tf * r.logp_micro) AS BIGINT)
                // CAST(sum(tf.tf) AS BIGINT) AS BIGINT)
               AS mean_logprob_micro
    FROM tf JOIN ratio r ON tf.b1 = r.b1 AND tf.b2 = r.b2
    GROUP BY tf.doc_id
    """,
)
def bigram_logprob_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document mean bigram log-probability under the corpus's own
    hashed-bigram language model (add-1 smoothing over {_BIGRAM_BUCKETS}
    successor buckets) in integer micro-nats — the CCNet-style
    "perplexity against an in-domain LM" quality signal
    (Wenzek et al. 2020), one order up from ``unigram_logprob_score``:
    improbable word SEQUENCES score low even when every word is common.

    Determinism: per-(context, successor) log prob is rounded ONCE to
    integer micro-nats (the DSIR trick), so per-document sums are exact
    BIGINT in any association order; the mean is truncating integer
    division. Documents with fewer than two words have no bigrams and are
    absent from the output in both engines.

    ULP assumption (shared with unigram_logprob_score / DSIR): the single
    round() assumes JVM Math.log and DuckDB's libm log agree to the last
    bit on ln(c12+1) - ln(c1+4096) — a 1-ulp difference at an exact .5
    micro-nat boundary would flip one value. Both are correctly-rounded
    on the arguments this family produces (integer-valued doubles well
    inside [1, 2^53]); tests/test_selection.py additionally asserts no
    observed logp lands within 1e-7 of a .5 boundary on the fixtures.

    Scale: the LM state is bounded at {_BIGRAM_BUCKETS}² buckets
    regardless of corpus size (hash collisions are part of the
    estimator, identical in both engines) and in practice at the number
    of DISTINCT observed bucket pairs; the context rollup derives from
    the LM frame (never a second corpus scan). Per-document scoring is
    one equi-join on (b1, b2) — shuffle-bounded by the doc-bigram tf
    frame, which is strictly smaller than the token stream.
    """
    docs = load_table(spark, sf_dir, "documents").filter(
        F.col("text").isNotNull()
    )
    # Arrow bigram-tf kernel (round 12): per-doc (b1, b2, tf) computed in
    # one compiled pass — the same integers as the bucketed-hash +
    # adjacent-pair explode + (doc, b1, b2) groupBy it replaces (parity
    # lock: tests/test_selection.py::test_word_level_kernel_matches_hof),
    # with the per-token explode AND its aggregation shuffle eliminated
    # (a doc's words sit in one batch row, so tf is exact in-kernel).
    # cache: tf feeds BOTH the LM rollup and the scoring join — without
    # it the kernel pass reruns per consumer. LIFETIME: the cache is
    # deliberately not unpersisted here (the result DataFrame is lazy —
    # tf must stay cached until the CALLER materializes it); the bench
    # and differential harnesses drop it via spark.catalog.clearCache()
    # after each query, and a library caller embedding this in a
    # long-lived session should do the same (or unpersist) once the
    # result is materialized.
    tf = bigram_bucket_tf_frame(docs, _BIGRAM_BUCKETS).cache()
    lm = tf.groupBy("b1", "b2").agg(F.sum("tf").cast("long").alias("c12"))
    ctx = lm.groupBy("b1").agg(F.sum("c12").cast("long").alias("c1"))
    ratio = lm.join(ctx, "b1").select(
        "b1",
        "b2",
        F.expr(
            f"CAST(round((ln(c12 + 1.0) - ln(c1 + {_BIGRAM_BUCKETS}))"
            f" * 1000000) AS BIGINT)"
        ).alias("logp_micro"),
    )
    return (
        tf.join(ratio, ["b1", "b2"])
        .groupBy("doc_id")
        .agg(
            F.sum("tf").cast("long").alias("n_bigrams"),
            F.expr(
                "CAST(CAST(sum(tf * logp_micro) AS BIGINT)"
                " DIV CAST(sum(tf) AS BIGINT) AS BIGINT)"
            ).alias("mean_logprob_micro"),
        )
    )


# ---------------------------------------------------------------------------
# Gopher top-bigram character fraction (round 11)
# ---------------------------------------------------------------------------

_TOP_BG_FLAG_MICRO = 200_000  # flag docs whose top bigram covers > 20%


@register(
    "top_bigram_char_fraction",
    oracle=f"""
    WITH words AS (
        SELECT doc_id, CAST(length(text) AS BIGINT) AS n_chars_text,
               {_DUCK_WORDS} AS ws
        FROM documents
        WHERE text IS NOT NULL AND len({_DUCK_WORDS}) >= 2
    ),
    bg AS (
        SELECT doc_id, n_chars_text,
               unnest(list_transform(range(1, len(ws)),
                      tb_i -> ws[tb_i] || ' ' || ws[tb_i + 1])) AS bigram
        FROM words
    ),
    counted AS (
        SELECT doc_id, n_chars_text, bigram,
               CAST(count(*) AS BIGINT) AS bg_count
        FROM bg GROUP BY 1, 2, 3
    )
    SELECT doc_id, bigram AS top_bigram, bg_count,
           CAST(bg_count * CAST(length(bigram) AS BIGINT) * 1000000
                AS BIGINT) // n_chars_text AS frac_micro,
           (bg_count * CAST(length(bigram) AS BIGINT) * 1000000)
               // n_chars_text > {_TOP_BG_FLAG_MICRO} AS flagged
    FROM (
        SELECT *, row_number() OVER (PARTITION BY doc_id
                                     ORDER BY bg_count DESC, bigram)
                      AS rn
        FROM counted
    )
    WHERE rn = 1
    """,
)
def top_bigram_char_fraction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher repetition rule #2 (Rae et al. 2021, "Scaling Language
    Models: ... Gopher", Table A1): the fraction of a document's
    characters covered by occurrences of its MOST FREQUENT word bigram —
    the complement of ``doc_repetition_score``'s duplicate-n-gram
    fraction (that one asks "how much is repeated at all"; this one asks
    "is there one dominant boilerplate phrase"). Flagged above 20%.

    Determinism: the top bigram breaks count ties lexicographically
    (binary collation in both engines); the fraction is exact BIGINT
    arithmetic over codepoint lengths, truncating division on
    non-negative operands. Documents with fewer than two words have no
    bigram and are absent in both engines.

    Scale: one explode of adjacent-word pairs (the token stream, same
    cost class as ``bigram_logprob_score``'s pair stream), one
    map-side-combinable count keyed (doc_id, bigram), one per-doc argmax
    window — the window's partition key is doc_id, so parallelism is
    corpus-wide, never vocabulary- or language-bounded.
    """
    docs = load_table(spark, sf_dir, "documents").filter(
        F.col("text").isNotNull()
        & (F.expr(f"size({_SPARK_WORDS})") >= 2)
    )
    words = docs.select(
        "doc_id",
        F.length("text").cast("long").alias("n_chars_text"),
        F.expr(_SPARK_WORDS).alias("ws"),
    )
    bg = words.select(
        "doc_id",
        "n_chars_text",
        F.explode(
            F.expr(
                "transform(sequence(1, size(ws) - 1),"
                " tb_i -> concat(element_at(ws, tb_i), ' ',"
                " element_at(ws, tb_i + 1)))"
            )
        ).alias("bigram"),
    )
    counted = bg.groupBy("doc_id", "n_chars_text", "bigram").agg(
        F.count(F.lit(1)).cast("long").alias("bg_count")
    )
    w = Window.partitionBy("doc_id").orderBy(
        F.col("bg_count").desc(), F.col("bigram").asc()
    )
    return (
        counted.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            "doc_id",
            F.col("bigram").alias("top_bigram"),
            "bg_count",
            F.expr(
                "CAST(bg_count * CAST(length(bigram) AS BIGINT) * 1000000"
                " AS BIGINT) DIV n_chars_text"
            ).alias("frac_micro"),
        )
        # flagged derives from the SAME truncated BIGINT fraction the
        # oracle tests — never a parallel float division, whose result
        # diverges from the floor inside a 1-micro-unit window above the
        # threshold (exact fraction in (0.200000, 0.200001)).
        .withColumn("flagged", F.col("frac_micro") > _TOP_BG_FLAG_MICRO)
    )


# ---------------------------------------------------------------------------
# Gopher top-n-gram trio completion + quality flag battery (round 12)
# ---------------------------------------------------------------------------

# Gopher Table A1 thresholds for the top-n-gram character fraction:
# n=2 -> 0.20 (top_bigram_char_fraction), n=3 -> 0.18, n=4 -> 0.16.
_TOP_NG_FLAG_MICRO = {3: 180_000, 4: 160_000}


@register(
    "top_ngram_char_fractions",
    oracle=f"""
    WITH words AS (
        SELECT doc_id, CAST(length(text) AS BIGINT) AS n_chars_text,
               {_DUCK_WORDS} AS ws
        FROM documents
        WHERE text IS NOT NULL AND len({_DUCK_WORDS}) >= 3
    ),
    ng AS (
        SELECT doc_id, n_chars_text, 3 AS n,
               unnest([array_to_string(ws[tn_i:tn_i+2], ' ')
                       FOR tn_i IN range(1, len(ws) - 1)]) AS ngram
        FROM words
        UNION ALL
        SELECT doc_id, n_chars_text, 4 AS n,
               unnest([array_to_string(ws[tn_i:tn_i+3], ' ')
                       FOR tn_i IN range(1, len(ws) - 2)]) AS ngram
        FROM words
    ),
    counted AS (
        SELECT doc_id, n_chars_text, n, ngram,
               CAST(count(*) AS BIGINT) AS ng_count
        FROM ng GROUP BY 1, 2, 3, 4
    )
    SELECT doc_id, n, ngram AS top_ngram, ng_count,
           CAST(ng_count * CAST(length(ngram) AS BIGINT) * 1000000
                AS BIGINT) // n_chars_text AS frac_micro,
           (ng_count * CAST(length(ngram) AS BIGINT) * 1000000)
               // n_chars_text
               > CASE n WHEN 3 THEN {_TOP_NG_FLAG_MICRO[3]}
                        ELSE {_TOP_NG_FLAG_MICRO[4]} END AS flagged
    FROM (
        SELECT *, row_number() OVER (PARTITION BY doc_id, n
                                     ORDER BY ng_count DESC, ngram)
                      AS rn
        FROM counted
    )
    WHERE rn = 1
    """,
)
def top_ngram_char_fractions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher repetition rules #3-#4 (Rae et al. 2021, Table A1):
    character coverage of the single most frequent word 3-gram and
    4-gram per document — completing the top-n-gram trio with
    ``top_bigram_char_fraction`` (n=2 at 20%); thresholds 18% (n=3) and
    16% (n=4). One row per (doc, n) for docs with at least 3 words (a
    doc with exactly 3 words has no 4-gram and emits only its n=3 row —
    empty gram streams vanish identically on both engines).

    Determinism: count ties break lexicographically on the gram string
    (binary collation both engines); ``frac_micro`` is truncating BIGINT
    arithmetic over codepoint lengths, and ``flagged`` derives from the
    SAME integer (the round-11 float-parity lesson, locked by the
    planted boundary docs in tests/test_degenerate_text.py).

    Scale: the two adjacent-word explode streams append (same cost class
    as the bigram stream, ~2x rows), one map-side-combinable count keyed
    (doc_id, n, gram), one per-(doc, n) argmax window — partition key is
    (doc_id, n), so parallelism is corpus-wide.
    """
    docs = load_table(spark, sf_dir, "documents").filter(
        F.col("text").isNotNull()
        & (F.expr(f"size({_SPARK_WORDS})") >= 3)
    )
    words = docs.select(
        "doc_id",
        F.length("text").cast("long").alias("n_chars_text"),
        F.expr(_SPARK_WORDS).alias("ws"),
    )

    def gram_rows(n: int) -> DataFrame:
        idx = safe_seq1(f"size(ws) - {n - 1}")
        return words.select(
            "doc_id",
            "n_chars_text",
            F.lit(n).alias("n"),
            F.explode(
                F.expr(
                    f"transform({idx},"
                    f" tn_i -> concat_ws(' ', slice(ws, tn_i, {n})))"
                )
            ).alias("ngram"),
        )

    ng = gram_rows(3).unionByName(gram_rows(4))
    counted = ng.groupBy("doc_id", "n_chars_text", "n", "ngram").agg(
        F.count(F.lit(1)).cast("long").alias("ng_count")
    )
    w = Window.partitionBy("doc_id", "n").orderBy(
        F.col("ng_count").desc(), F.col("ngram").asc()
    )
    thr = F.when(F.col("n") == 3, F.lit(_TOP_NG_FLAG_MICRO[3])).otherwise(
        F.lit(_TOP_NG_FLAG_MICRO[4])
    )
    return (
        counted.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            "doc_id",
            "n",
            F.col("ngram").alias("top_ngram"),
            "ng_count",
            F.expr(
                "CAST(ng_count * CAST(length(ngram) AS BIGINT) * 1000000"
                " AS BIGINT) DIV n_chars_text"
            ).alias("frac_micro"),
        )
        .withColumn("flagged", F.col("frac_micro") > thr)
    )


# Stopword presence list for the Gopher "stop word" rule: the synthetic
# corpus vocabulary includes natural function words; the rule binds on
# organic fixtures AND on real corpora (Gopher's own list: the, be, to,
# of, and, that, have, with).
_GOPHER_STOPWORDS = ("the", "be", "to", "of", "and", "that", "have", "with")
_GOPHER_MIN_WORDS = 50
_GOPHER_MAX_WORDS = 100_000
_GOPHER_MIN_MEANLEN_MICRO = 3_000_000
_GOPHER_MAX_MEANLEN_MICRO = 10_000_000
_GOPHER_MIN_STOPWORDS = 2


@register(
    "gopher_quality_flags",
    oracle=f"""
    WITH w AS (
        SELECT doc_id, {_DUCK_WORDS} AS ws
        FROM documents
        WHERE text IS NOT NULL AND len({_DUCK_WORDS}) >= 1
    ),
    m AS (
        SELECT doc_id,
               CAST(len(ws) AS BIGINT) AS n_words,
               CAST(list_sum(list_transform(ws, gq_w -> length(gq_w)))
                    AS BIGINT) AS n_word_chars,
               CAST(len(list_distinct(ws)) AS BIGINT) AS n_unique,
               CAST(len(list_intersect(list_distinct(ws),
                    {list(_GOPHER_STOPWORDS)})) AS BIGINT) AS n_stop
        FROM w
    )
    SELECT doc_id, n_words,
           (n_word_chars * 1000000) // n_words AS mean_word_len_micro,
           (n_unique * 1000000) // n_words AS frac_unique_micro,
           n_stop,
           n_words < {_GOPHER_MIN_WORDS}
               OR n_words > {_GOPHER_MAX_WORDS} AS flag_word_count,
           (n_word_chars * 1000000) // n_words < {_GOPHER_MIN_MEANLEN_MICRO}
               OR (n_word_chars * 1000000) // n_words
                  > {_GOPHER_MAX_MEANLEN_MICRO} AS flag_mean_word_len,
           n_stop < {_GOPHER_MIN_STOPWORDS} AS flag_stopwords,
           NOT (n_words < {_GOPHER_MIN_WORDS}
                OR n_words > {_GOPHER_MAX_WORDS}
                OR (n_word_chars * 1000000) // n_words
                   < {_GOPHER_MIN_MEANLEN_MICRO}
                OR (n_word_chars * 1000000) // n_words
                   > {_GOPHER_MAX_MEANLEN_MICRO}
                OR n_stop < {_GOPHER_MIN_STOPWORDS}) AS pass_quality
    FROM m
    """,
)
def gopher_quality_flags(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher quality-filter battery (Rae et al. 2021, Table A1 "quality
    filtering"): per-document word count bounds [50, 100k], mean word
    length bounds [3, 10] characters, and stop-word presence (>= 2
    distinct hits from Gopher's 8-word function-word list) — the
    document-shape rules that complement the repetition rules
    (``doc_repetition_score``, ``top_bigram_char_fraction``,
    ``top_ngram_char_fractions``). Emits the measured statistics, the
    individual flags, and the conjunctive ``pass_quality`` verdict.

    Determinism: all statistics are exact BIGINT micro-unit arithmetic
    (truncating division; docs with zero words are excluded on BOTH
    engines — the mirrored ``len(ws) >= 1`` guard keeps the division
    total). Scale: a narrow per-doc map over higher-order functions, no
    explode, no shuffle — the same no-exchange class as
    ``doc_repetition_score``.
    """
    docs = load_table(spark, sf_dir, "documents").filter(
        F.col("text").isNotNull()
        & (F.expr(f"size({_SPARK_WORDS})") >= 1)
    )
    stop_arr = "array(" + ", ".join(f"'{s}'" for s in _GOPHER_STOPWORDS) + ")"
    m = docs.select(
        "doc_id",
        F.expr(f"CAST(size({_SPARK_WORDS}) AS BIGINT)").alias("n_words"),
        F.expr(
            f"CAST(aggregate(transform({_SPARK_WORDS},"
            f" gq_w -> length(gq_w)), 0, (gq_a, gq_x) -> gq_a + gq_x)"
            f" AS BIGINT)"
        ).alias("n_word_chars"),
        F.expr(
            f"CAST(size(array_distinct({_SPARK_WORDS})) AS BIGINT)"
        ).alias("n_unique"),
        F.expr(
            f"CAST(size(array_intersect(array_distinct({_SPARK_WORDS}),"
            f" {stop_arr})) AS BIGINT)"
        ).alias("n_stop"),
    )
    mean_len = F.expr("(n_word_chars * 1000000) DIV n_words")
    flag_wc = (F.col("n_words") < _GOPHER_MIN_WORDS) | (
        F.col("n_words") > _GOPHER_MAX_WORDS
    )
    flag_ml = (mean_len < _GOPHER_MIN_MEANLEN_MICRO) | (
        mean_len > _GOPHER_MAX_MEANLEN_MICRO
    )
    flag_sw = F.col("n_stop") < _GOPHER_MIN_STOPWORDS
    return m.select(
        "doc_id",
        "n_words",
        mean_len.alias("mean_word_len_micro"),
        F.expr("(n_unique * 1000000) DIV n_words").alias("frac_unique_micro"),
        "n_stop",
        flag_wc.alias("flag_word_count"),
        flag_ml.alias("flag_mean_word_len"),
        flag_sw.alias("flag_stopwords"),
        (~(flag_wc | flag_ml | flag_sw)).alias("pass_quality"),
    )
