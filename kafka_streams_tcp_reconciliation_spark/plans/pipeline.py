"""Training-data pipeline operators — corpus splitting, sampling, term
weighting, retrieval scoring, and sequence packing over ``documents``.

These extend the LLM-pipeline surface (SURVEY.md §2.11) with the ops a
100 TB pretraining-corpus build actually runs between dedup and training:

- deterministic hash split into train/valid/test (reproducible across
  runs and engines — no RNG, the split IS a pure function of doc_id);
- stratified sampling (exact per-stratum fraction, pseudorandom but
  deterministic hash order);
- TF-IDF term weighting + per-document top-k keyword extraction;
- BM25 relevance scoring for a fixed query (retrieval-based curation);
- token-budget sequence packing (the "concat docs then cut fixed-length
  training sequences" step), expressed as a windowed running sum —
  embarrassingly parallel across hash shards.

All of it is pure DataFrame/window algebra (no Python UDFs, no driver
loops); every query has a strong DuckDB oracle via the shared
cross-engine polynomial hash (functions/hashing.py). Counts surface as
BIGINT on both engines (DuckDB ``sum`` returns HUGEINT — always
``CAST(... AS BIGINT)`` in the oracles).
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
    duck_gram_fold64_expr,
    duck_word_polyhashes_expr,
    gram_fold64_expr,
    gram_set_frame,
    word_bucket_tf_frame,
    word_polyhashes_expr,
)
from kafka_streams_tcp_reconciliation_spark.plans import register
from kafka_streams_tcp_reconciliation_spark.sources.tables import load_table

_SPARK_DOC_HASH = spark_poly_hash("CAST(doc_id AS STRING)")
_DUCK_DOC_HASH = duck_poly_hash("CAST(doc_id AS VARCHAR)")


@register(
    "split_train_valid_test",
    oracle=f"""
    WITH hashed AS (
      SELECT CASE WHEN {_DUCK_DOC_HASH} % 100 < 80 THEN 'train'
                  WHEN {_DUCK_DOC_HASH} % 100 < 90 THEN 'valid'
                  ELSE 'test' END AS split,
             n_chars
      FROM documents
    )
    SELECT split,
           count(*) AS n_docs,
           CAST(sum(n_chars) AS BIGINT) AS total_chars
    FROM hashed
    GROUP BY split
    """,
)
def split_train_valid_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic 80/10/10 train/valid/test split by document hash.

    The assignment is a pure function of ``doc_id`` — stable under
    re-runs, engine changes, and data re-partitioning (the property that
    makes a corpus split auditable). Emits per-split doc and char counts;
    the per-doc assignment is the same expression minus the GROUP BY.
    """
    docs = load_table(spark, sf_dir, "documents")
    bucket = F.expr(_SPARK_DOC_HASH) % 100
    split = (
        F.when(bucket < 80, "train").when(bucket < 90, "valid").otherwise("test")
    )
    return (
        docs.groupBy(split.alias("split"))
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_chars").alias("total_chars"),
        )
    )


@register(
    "sample_stratified_by_lang",
    oracle=f"""
    SELECT doc_id, lang
    FROM (
      SELECT doc_id, lang,
             row_number() OVER (PARTITION BY lang
                                ORDER BY {_DUCK_DOC_HASH} % 1000, doc_id) AS rn,
             count(*)     OVER (PARTITION BY lang) AS cnt
      FROM documents
    ) ranked
    WHERE rn * 10 <= cnt
    """,
)
def sample_stratified_by_lang(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stratified 10% sample with an exact per-stratum fraction.

    Rows are ordered inside each language stratum by a hash of the doc id
    (pseudorandom but deterministic — no RNG, so the sample is
    reproducible and the oracle can replay it), and the first
    ``floor(cnt/10)`` survive. ``rn * 10 <= cnt`` keeps the arithmetic
    integral — no ceil/floor type drift between engines. One shuffle on
    ``lang``; for skewed strata at scale, pre-salt the partition column.
    """
    docs = load_table(spark, sf_dir, "documents")
    order = (F.expr(_SPARK_DOC_HASH) % 1000).alias("h")
    w = Window.partitionBy("lang").orderBy(order, "doc_id")
    cw = Window.partitionBy("lang")
    return (
        docs.select(
            "doc_id",
            "lang",
            F.row_number().over(w).alias("rn"),
            F.count(F.lit(1)).over(cw).alias("cnt"),
        )
        .filter(F.col("rn") * 10 <= F.col("cnt"))
        .select("doc_id", "lang")
    )


@register(
    "tfidf_top_terms",
    oracle="""
    WITH terms AS (
      SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents
    ),
    tf AS (
      SELECT doc_id, term, count(*) AS tf
      FROM terms WHERE term <> '' GROUP BY 1, 2
    ),
    df AS (SELECT term, count(*) AS df FROM tf GROUP BY 1),
    n AS (SELECT count(*) AS n_docs FROM documents)
    SELECT doc_id, term, tfidf
    FROM (
      SELECT doc_id, tf.term,
             round(tf * (ln((n_docs + 1) / (df + 1.0)) + 1.0), 6) AS tfidf,
             row_number() OVER (
               PARTITION BY doc_id
               ORDER BY round(tf * (ln((n_docs + 1) / (df + 1.0)) + 1.0), 6) DESC,
                        tf.term) AS rn
      FROM tf JOIN df ON tf.term = df.term CROSS JOIN n
    ) scored
    WHERE rn <= 3
    """,
)
def tfidf_top_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TF-IDF keyword extraction: top-3 terms per document.

    Shape chosen for corpus scale: document frequency is an AGGREGATE per
    term (map-side partial counts — skew-proof for zipfian vocabularies,
    where a window ``count(*) OVER (PARTITION BY term)`` would pile every
    occurrence of a stopword onto one reducer) and the resulting
    vocabulary-sized df table is BROADCAST back onto tf — vocab size is
    independent of corpus size, so the tf relation never shuffles for the
    join; its only exchanges are the tf aggregation and the final top-k
    window by doc_id. Cost: Spark re-expands the corpus for the df branch
    (no cross-branch subplan reuse); a multi-op pipeline would persist tf
    once instead. Scores are rounded BEFORE ranking so ties resolve
    identically on both engines (then by term for a total order).
    """
    docs = load_table(spark, sf_dir, "documents")
    tf = (
        docs.select("doc_id", F.explode(F.split("text", " ")).alias("term"))
        .filter(F.col("term") != "")
        .groupBy("doc_id", "term")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    df_ = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    n = docs.agg(F.count(F.lit(1)).alias("n_docs"))
    tfidf = F.round(
        F.col("tf")
        * (F.log((F.col("n_docs") + 1) / (F.col("df") + 1.0)) + 1.0),
        6,
    )
    w = Window.partitionBy("doc_id").orderBy(F.desc("tfidf"), "term")
    return (
        tf.join(F.broadcast(df_), "term")
        .join(F.broadcast(n))
        .select("doc_id", "term", tfidf.alias("tfidf"))
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
        .select("doc_id", "term", "tfidf")
    )


_BM25_TERMS = ("join", "stream", "vector")
_K1 = 1.2
_B = 0.75


@register(
    "bm25_query_scores",
    oracle=f"""
    WITH doclens AS (
      SELECT doc_id, len(string_split(text, ' ')) AS doclen FROM documents
    ),
    terms AS (
      SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents
    ),
    tf AS (
      SELECT doc_id, term, count(*) AS tf
      FROM terms WHERE term IN {_BM25_TERMS!r} GROUP BY 1, 2
    ),
    df AS (SELECT term, count(*) AS df FROM tf GROUP BY 1),
    stats AS (
      SELECT count(*) AS n_docs, round(avg(doclen), 6) AS avg_len FROM doclens
    ),
    scored AS (
      SELECT tf.doc_id, tf.term,
             round(ln(1.0 + (n_docs - df + 0.5) / (df + 0.5))
                   * (tf * {_K1 + 1})
                   / (tf + {_K1} * ({1 - _B} + {_B} * doclen / avg_len)),
                   6) AS s
      FROM tf
      JOIN df      ON tf.term = df.term
      JOIN doclens ON tf.doc_id = doclens.doc_id
      CROSS JOIN stats
    )
    SELECT doc_id,
           round(coalesce(max(CASE WHEN term = 'join'   THEN s END), 0)
               + coalesce(max(CASE WHEN term = 'stream' THEN s END), 0)
               + coalesce(max(CASE WHEN term = 'vector' THEN s END), 0),
                 6) AS bm25
    FROM scored
    GROUP BY doc_id
    """,
)
def bm25_query_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BM25 relevance of every document to a fixed query (k1=1.2, b=0.75).

    Retrieval-based curation building block: score = Σ_t idf(t) ·
    tf·(k1+1) / (tf + k1·(1−b+b·len/avglen)). The per-term scores are
    rounded, then summed in a FIXED textual order via conditional
    aggregation (one column per query term) — a plain SUM over the term
    group would re-associate float addition differently per engine.
    Corpus stats (N, average length) are a broadcast 1-row aggregate.
    The tf pass carries the document length along through the explode
    (instead of a third scan joined back by doc_id); document frequency
    is a skew-proof aggregate whose ≤|query| rows broadcast back, so the
    tf relation never shuffles after its own aggregation. The stats
    scalar needs its own scan because it averages over ALL documents,
    matched or not.
    """
    docs = load_table(spark, sf_dir, "documents")
    doclen = F.size(F.split("text", " ")).cast("long")
    tf = (
        docs.select(
            "doc_id",
            doclen.alias("doclen"),
            F.explode(F.split("text", " ")).alias("term"),
        )
        .filter(F.col("term").isin(*_BM25_TERMS))
        .groupBy("doc_id", "term")
        .agg(F.count(F.lit(1)).alias("tf"), F.max("doclen").alias("doclen"))
    )
    stats = docs.select(doclen.alias("doclen")).agg(
        F.count(F.lit(1)).alias("n_docs"), F.round(F.avg("doclen"), 6).alias("avg_len")
    )
    s = F.round(
        F.log(1.0 + (F.col("n_docs") - F.col("df") + 0.5) / (F.col("df") + 0.5))
        * (F.col("tf") * (_K1 + 1))
        / (F.col("tf") + _K1 * ((1 - _B) + _B * F.col("doclen") / F.col("avg_len"))),
        6,
    )
    df_ = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    scored = (
        tf.join(F.broadcast(df_), "term")
        .join(F.broadcast(stats))
        .select("doc_id", "term", s.alias("s"))
    )
    def term_score(t: str):
        return F.coalesce(F.max(F.when(F.col("term") == t, F.col("s"))), F.lit(0.0))

    return scored.groupBy("doc_id").agg(
        F.round(
            term_score("join") + term_score("stream") + term_score("vector"), 6
        ).alias("bm25")
    )


@register(
    "pack_token_budget_bins",
    oracle=f"""
    WITH toks AS (
      SELECT doc_id,
             {_DUCK_DOC_HASH} AS h,
             len(string_split(text, ' ')) AS n_tokens
      FROM documents
    ),
    placed AS (
      SELECT h % 8 AS shard, n_tokens,
             COALESCE(CAST(sum(n_tokens) OVER (
               PARTITION BY h % 8 ORDER BY h, doc_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS BIGINT),
               0) AS start_off
      FROM toks
    )
    SELECT shard,
           start_off // 512 AS bin,
           count(*) AS n_docs,
           CAST(sum(n_tokens) AS BIGINT) AS bin_tokens
    FROM placed
    GROUP BY 1, 2
    """,
)
def pack_token_budget_bins(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token-budget sequence packing: concat docs in hash order, cut every
    512 tokens — the training-sequence assembly step, distributed.

    Docs are sharded by hash (8 shards here; thousands at 100 TB — each
    shard packs independently, so the only coordination is one window
    cumsum per shard), ordered deterministically within the shard, and a
    document's bin is its running start offset DIV the budget. All-integer
    arithmetic — no float drift anywhere. Emits per-(shard, bin) doc and
    token totals; the per-doc assignment is the same plan minus the final
    GROUP BY.
    """
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id",
        F.expr(_SPARK_DOC_HASH).alias("h"),
        F.size(F.split("text", " ")).cast("long").alias("n_tokens"),
    ).withColumn("shard", F.col("h") % 8)
    w = (
        Window.partitionBy("shard")
        .orderBy("h", "doc_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    placed = toks.withColumn(
        "start_off", F.coalesce(F.sum("n_tokens").over(w), F.lit(0))
    )
    return (
        placed.groupBy("shard", F.expr("start_off DIV 512").alias("bin"))
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tokens").alias("bin_tokens"),
        )
    )


_DECON_N = 8


def _decon_hashed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, b, ghs) for the two decontamination queries: corpus-split
    bucket + DISTINCT 8-gram hash sets, via the round-12 Arrow gram
    kernel (``operators/dedup.gram_set_frame`` — same integers as the
    HOF two-level fold the DuckDB oracles still mirror; bit-equality
    locked by tests/test_dup_heavy_skew.py::test_gram_set_frame_matches_hof).

    Two cheap semantic-preserving prunings vs the HOF form (guide §2.3,
    "don't compute things you throw away"):

    - NULL-text docs are filtered before the kernel — their empty gram
      arrays vanished through every downstream explode/unnest anyway;
    - the 80 <= b < 90 split (10% of the corpus) is dropped BEFORE gram
      hashing — neither the train (b < 80) nor the eval (b >= 90) branch
      ever reads it, but the HOF form hashed it.

    The bucket b is recomputed on the kernel's narrow output (a ~6-char
    poly hash per doc — noise next to the text hashing); docs shorter
    than the gram width are dropped inside the kernel, mirroring the
    oracle's empty-``gs`` unnest."""
    docs = load_table(spark, sf_dir, "documents").filter(
        F.col("text").isNotNull()
    )
    bucket = F.expr(_SPARK_DOC_HASH) % 100
    pre = docs.filter((bucket < 80) | (bucket >= 90))
    return gram_set_frame(pre, _DECON_N).select(
        "doc_id", (F.expr(_SPARK_DOC_HASH) % 100).alias("b"),
        F.col("hs").alias("ghs"),
    )


@register(
    "decontaminate_train_eval",
    oracle=f"""
    WITH wh AS (
      SELECT doc_id,
             {_DUCK_DOC_HASH} % 100 AS b,
             {duck_word_polyhashes_expr('text', 31)} AS wh1,
             {duck_word_polyhashes_expr('text', 131)} AS wh2
      FROM documents
    ),
    hashed AS (
      SELECT doc_id, b, {duck_gram_fold64_expr('wh1', 'wh2', _DECON_N)} AS gs
      FROM wh
    ),
    train AS (
      SELECT doc_id, unnest(gs) AS g FROM hashed WHERE b < 80
    ),
    ev AS (
      SELECT DISTINCT unnest(gs) AS g FROM hashed WHERE b >= 90
    )
    SELECT train.doc_id, count(*) AS n_shared_grams
    FROM train JOIN ev ON train.g = ev.g
    GROUP BY train.doc_id
    """,
)
def decontaminate_train_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Eval-set decontamination: train docs sharing any 8-gram with the
    held-out test split (benchmark-leakage detection).

    The eval side is the deterministic hash split's own test bucket, so
    the whole check is reproducible with no side input. Both sides shingle
    to DISTINCT ~60-bit hashed 8-grams (two-level word-hash construction:
    each word char-folds once, each gram is two crossed n-element integer
    folds — per-doc cost O(words), not O(gram chars), and wide enough
    that hash-collision false positives are negligible; the shuffle
    carries 8-byte keys, never gram strings). The overlap is an
    inverted-index equi-join on the gram hash, O(shared grams), not
    O(doc pairs). The word-hash arrays are projected in their own select
    and the gram fold references them as COLUMNS — a single textual
    expression would re-evaluate the whole array per gram (O(words²)/doc;
    measured 15s vs 1.4s at sf0.1) — and both relations are cached
    because the train and eval branches each consume them. At 100 TB the
    eval side (a real benchmark
    suite) is tiny — broadcast it; here it is 10% of the corpus, so it
    shuffles. Each side is distinct per doc, so count(*) after the join
    IS the per-doc count of shared distinct grams.
    """
    # one Arrow-kernel pass for the gram sets (see _decon_hashed); the
    # single cache feeds both the train and eval branches
    hashed = _decon_hashed(spark, sf_dir).cache()
    train = hashed.filter(F.col("b") < 80).select(
        "doc_id", F.explode("ghs").alias("g")
    )
    ev = hashed.filter(F.col("b") >= 90).select(F.explode("ghs").alias("g")).distinct()
    return (
        train.join(ev, "g")
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("n_shared_grams"))
    )


_REP_N = 5


@register(
    "doc_repetition_score",
    oracle=f"""
    WITH wh AS (
      SELECT doc_id, lang,
             {duck_word_polyhashes_expr('text', 31)} AS wh1,
             {duck_word_polyhashes_expr('text', 131)} AS wh2
      FROM documents
    ),
    grams AS (
      SELECT doc_id, lang,
             {duck_gram_fold64_expr('wh1', 'wh2', _REP_N, distinct=False)} AS gs
      FROM wh
      WHERE len(wh1) >= {_REP_N}
    )
    SELECT doc_id, lang,
           round(1.0 - CAST(len(list_distinct(gs)) AS DOUBLE) / len(gs), 6)
             AS dup_gram_frac
    FROM grams
    """,
)
def doc_repetition_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Intra-document repetition: fraction of duplicated word 5-grams
    (the Gopher-rules "duplicate n-gram fraction" quality signal).

    Grams are the 64-bit two-level word-hash folds (no per-gram string
    building; duplicate detection compares int64s, and at 2^60 width a
    collision-induced undercount is negligible — the oracle mirrors the
    same folds exactly either way). The gram array never explodes to
    rows, so the op is a narrow map over documents: no shuffle at any
    scale. 1 − |distinct grams| / |grams|, rounded identically on both
    engines.

    The short-doc guard is ``size(split(text)) >= n`` — NOT
    ``size(gs) > 0``: a predicate on the computed gram array gets
    pushed below the projections with the whole two-level expression
    inlined, re-evaluating the word-hash array per gram inside the
    filter (measured 28s vs 1s at sf0.1). The word-count form is cheap
    and pushes to the scan harmlessly.
    """
    docs = load_table(spark, sf_dir, "documents")
    wh = docs.filter(
        F.size(F.split("text", " ")) >= _REP_N
    ).select(
        "doc_id",
        "lang",
        word_polyhashes_expr("text", 31).alias("wh1"),
        word_polyhashes_expr("text", 131).alias("wh2"),
    )
    frac = F.round(
        1.0 - F.size(F.array_distinct(F.col("gs"))).cast("double") / F.size("gs"), 6
    )
    return (
        wh.select(
            "doc_id",
            "lang",
            gram_fold64_expr("wh1", "wh2", _REP_N, distinct=False).alias("gs"),
        )
        .select("doc_id", "lang", frac.alias("dup_gram_frac"))
    )


@register(
    "mixture_upsample_sources",
    oracle="""
    WITH weighted AS (
      SELECT doc_id, source,
             CASE WHEN source IN ('src0', 'src1') THEN 3
                  WHEN source IN ('src2', 'src3', 'src4') THEN 2
                  ELSE 1 END AS w
      FROM documents
    )
    SELECT doc_id, source, unnest(range(1, w + 1)) AS epoch
    FROM weighted
    """,
)
def mixture_upsample_sources(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Domain-mixture upsampling: emit each document ``weight`` times
    (high-quality domains get extra epochs — the standard pretraining
    mixture knob).

    The weight is a pure function of the domain, the copies come from
    exploding a generated sequence — a narrow 1→w flatMap with no
    shuffle, deterministic across runs and engines. The ``epoch`` column
    lets a downstream packer treat copies as distinct rows.
    """
    docs = load_table(spark, sf_dir, "documents")
    w = (
        F.when(F.col("source").isin("src0", "src1"), 3)
        .when(F.col("source").isin("src2", "src3", "src4"), 2)
        .otherwise(1)
        .cast("long")
    )
    return docs.select("doc_id", "source", w.alias("w")).select(
        "doc_id",
        "source",
        F.explode(F.sequence(F.lit(1).cast("long"), F.col("w"))).alias("epoch"),
    )


@register(
    "filter_length_outliers",
    oracle="""
    WITH bounds AS (
      SELECT round(quantile_cont(n_chars, 0.05), 6) AS lo,
             round(quantile_cont(n_chars, 0.95), 6) AS hi
      FROM documents
    )
    SELECT lang,
           count(*) AS n_docs,
           min(n_chars) AS min_chars,
           max(n_chars) AS max_chars
    FROM documents CROSS JOIN bounds
    WHERE n_chars >= lo AND n_chars <= hi
    GROUP BY lang
    """,
)
def filter_length_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Length-outlier filter: drop documents outside the exact p5–p95
    char-length band, then summarize survivors per language.

    The bounds are one scalar aggregate broadcast back onto the scan
    (no sort, no window — percentile via the exact interpolated
    ``percentile``/``quantile_cont``, identical linear-interpolation
    semantics on both engines, rounded before the comparison so an
    ulp of interpolation drift cannot flip a boundary doc).
    """
    docs = load_table(spark, sf_dir, "documents")
    bounds = docs.agg(
        F.round(F.expr("percentile(n_chars, 0.05)"), 6).alias("lo"),
        F.round(F.expr("percentile(n_chars, 0.95)"), 6).alias("hi"),
    )
    return (
        docs.join(F.broadcast(bounds))
        .filter((F.col("n_chars") >= F.col("lo")) & (F.col("n_chars") <= F.col("hi")))
        .groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.min("n_chars").alias("min_chars"),
            F.max("n_chars").alias("max_chars"),
        )
    )


# ---------------------------------------------------------------------------
# Round-2 additions: boilerplate span mining, per-domain quotas, LM filter
# ---------------------------------------------------------------------------

_BP_N = 3  # span length in words
_BP_MIN_DOCS = 5  # spans seen in >= this many distinct docs are boilerplate


@register(
    "boilerplate_ngram_spans",
    oracle=f"""
    WITH wh AS (
      SELECT doc_id,
             {duck_word_polyhashes_expr('text', 31)} AS wh1,
             {duck_word_polyhashes_expr('text', 131)} AS wh2
      FROM documents
    ),
    grams AS (
      SELECT doc_id,
             unnest({duck_gram_fold64_expr('wh1', 'wh2', _BP_N)}) AS g
      FROM wh WHERE len(wh1) >= {_BP_N}
    )
    SELECT g AS gram_hash,
           count(*) AS n_docs,
           min(doc_id) AS first_doc
    FROM grams
    GROUP BY g
    HAVING count(*) >= {_BP_MIN_DOCS}
    """,
)
def boilerplate_ngram_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-document repeated-span mining (the C4/RefinedWeb boilerplate
    step): word {n}-gram spans occurring in ≥{k} DISTINCT documents, with
    how many docs carry each span. Downstream, these spans are stripped
    from member documents or used to flag template/boilerplate pages —
    the line-dedup analog for corpora without line structure.

    Same two-level word-gram hash family as decontamination: per-doc
    DISTINCT span hashes (so count(*) counts documents, not occurrences),
    then an inverted-index aggregation on the 8-byte hash. Scale shape:
    one explode + one map-side-combinable groupBy — no pairwise joins;
    a viral span is a hot key only for its partial-agg column. The
    word-hash arrays are projected as real columns before the gram fold
    (textual nesting re-evaluates the array per gram, O(words²)/doc),
    and the short-doc guard is on ``size(split(text))`` BEFORE the
    projection — a predicate on the computed wh arrays gets pushed below
    them with the whole fold inlined (the doc_repetition_score pitfall).

    The explode is ``explode_outer`` + ``g IS NOT NULL``, deliberately:
    plain ``explode`` triggers Catalyst's InferFiltersFromGenerate,
    which synthesizes ``size(ghs) > 0`` and pushes it below the
    projection with the ENTIRE two-level fold inlined into the Filter —
    every row then evaluates the word-hash + gram pipeline twice
    (measured 40s vs ~1s at sf0.1). The rule skips outer generates, and
    the null-filter on the generated attribute cannot be pushed below
    the generate. Empty gram arrays cannot occur anyway (the word-count
    guard guarantees ≥ 1 gram), so the two forms are semantically
    identical here.
    """
    docs = load_table(spark, sf_dir, "documents").filter(
        F.col("text").isNotNull()
    )
    # Arrow gram kernel (round 12): per-doc DISTINCT span-hash sets in one
    # mapInPandas pass — same integers as the HOF two-level fold the
    # oracle mirrors (kernel parity lock in tests/test_dup_heavy_skew.py).
    # Short docs (< n words) are dropped inside the kernel (= the old
    # word-count guard), and the explode_outer/InferFiltersFromGenerate
    # dance above becomes moot: the generate's child is the opaque kernel
    # frame, so no filter with an inlined fold can be pushed below it.
    grams = gram_set_frame(docs, _BP_N).select(
        "doc_id", F.explode("hs").alias("g")
    )
    return (
        grams.groupBy(F.col("g").alias("gram_hash"))
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.min("doc_id").alias("first_doc"),
        )
        .filter(F.col("n_docs") >= _BP_MIN_DOCS)
    )


_QUOTA_PER_SOURCE = 15


@register(
    "domain_quota_sample",
    oracle=f"""
    SELECT doc_id, source
    FROM (
      SELECT doc_id, source,
             row_number() OVER (PARTITION BY source
                                ORDER BY {_DUCK_DOC_HASH} % 1000, doc_id) AS rn
      FROM documents
    ) ranked
    WHERE rn <= {_QUOTA_PER_SOURCE}
    """,
)
def domain_quota_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-domain document quota (the Common-Crawl "cap pages per host"
    rule): keep at most N documents per source, chosen in deterministic
    pseudorandom hash order so the sample is reproducible and
    engine-independent (no RNG — the kept set is a pure function of
    doc_id, like the corpus split).

    Scale shape: one shuffle on ``source`` + a per-partition top-N.
    Catalyst turns the rank-filter into WindowGroupLimit, so each
    partition keeps a bounded N-row heap instead of sorting the whole
    domain — a hot domain with 100M pages costs a streaming pass, not an
    O(n log n) sort. For truly pathological hosts, pre-aggregate with the
    salted two-phase top-N in operators/skew.
    """
    docs = load_table(spark, sf_dir, "documents")
    order = (F.expr(_SPARK_DOC_HASH) % 1000).alias("h")
    w = Window.partitionBy("source").orderBy(order, "doc_id")
    return (
        docs.select("doc_id", "source", F.row_number().over(w).alias("rn"))
        .filter(F.col("rn") <= _QUOTA_PER_SOURCE)
        .select("doc_id", "source")
    )


@register(
    "unigram_logprob_score",
    oracle="""
    WITH terms AS (
      SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents
    ),
    tf AS (
      SELECT doc_id, term, count(*) AS tf
      FROM terms WHERE term <> '' GROUP BY 1, 2
    ),
    vocab AS (
      SELECT term, CAST(sum(tf) AS BIGINT) AS cnt FROM tf GROUP BY term
    ),
    tot AS (SELECT CAST(sum(cnt) AS BIGINT) AS tot FROM vocab),
    lp AS (
      SELECT term,
             CAST(round(ln(CAST(cnt AS DOUBLE) / tot) * 1000000)
                  AS BIGINT) AS logp_micro
      FROM vocab CROSS JOIN tot
    )
    SELECT tf.doc_id,
           CAST(sum(tf.tf) AS BIGINT) AS n_tokens,
           CAST((-CAST(sum(tf.tf * lp.logp_micro) AS BIGINT))
                // CAST(sum(tf.tf) AS BIGINT) AS BIGINT) AS mean_nll_micro
    FROM tf JOIN lp ON tf.term = lp.term
    GROUP BY tf.doc_id
    """,
)
def unigram_logprob_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-trained unigram language-model score per document (the
    CCNet/Wikipedia-LM quality-filter analog): mean negative log-prob of
    the document's tokens under the corpus's own unigram distribution,
    in integer micro-nats. Gibberish and rare-token soup score high;
    repetitive boilerplate scores low — both tails are curation targets.

    Determinism: each term's log-prob is rounded ONCE to integer
    micro-nats (safe like every round(…,6) in this file), after which
    all arithmetic — tf-weighted sum, token count, mean via integer
    division — is exact BIGINT in any association order on any engine.
    This is how a float LM score gets a strong cross-engine oracle
    (same trick as PageRank's ppm ranks).

    Scale shape: the vocab is a map-side-combinable term aggregate; the
    score join is term-keyed with stopword-grade hot keys — AQE skew
    handling splits those, and the final per-doc sum combines map-side.
    At 100 TB, cut the tail of the vocab to top-K + an OOV bucket and
    broadcast it instead of shuffling the tf relation.
    """
    docs = load_table(spark, sf_dir, "documents")
    tf = (
        docs.select("doc_id", F.explode(F.split("text", " ")).alias("term"))
        .filter(F.col("term") != "")
        .groupBy("doc_id", "term")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    vocab = tf.groupBy("term").agg(F.sum("tf").cast("long").alias("cnt"))
    tot = vocab.agg(F.sum("cnt").cast("long").alias("tot"))
    lp = vocab.join(F.broadcast(tot)).select(
        "term",
        F.expr(
            "CAST(round(ln(CAST(cnt AS DOUBLE) / tot) * 1000000) AS BIGINT)"
        ).alias("logp_micro"),
    )
    return (
        tf.join(lp, "term")
        .groupBy("doc_id")
        .agg(
            F.sum("tf").cast("long").alias("n_tokens"),
            F.expr(
                "CAST((-CAST(sum(tf * logp_micro) AS BIGINT))"
                " DIV CAST(sum(tf) AS BIGINT) AS BIGINT)"
            ).alias("mean_nll_micro"),
        )
    )


@register(
    "sample_weighted_by_size",
    oracle=f"""
    WITH mx AS (SELECT max(n_chars) AS max_chars FROM documents)
    SELECT doc_id, lang, n_chars
    FROM documents, mx
    WHERE ({_DUCK_DOC_HASH} % 10000) * max_chars < n_chars * 10000
    """,
)
def sample_weighted_by_size(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Probability-proportional-to-size (PPS) sampling: each document is
    kept with probability n_chars / max(n_chars) — the upsample-the-long-
    tail primitive behind mixture reweighting, with NO RNG: the coin is
    the deterministic doc-id hash, so the sample is reproducible,
    auditable, and identical in the oracle.

    The inclusion test is pure integer arithmetic
    (hash%10k · max < n_chars · 10k) — no float probability, no
    floor/rounding drift between engines. Scale: the global max is a
    1-row broadcast onto a narrow per-row filter; one scan, no shuffle
    of the corpus.
    """
    docs = load_table(spark, sf_dir, "documents")
    mx = docs.agg(F.max("n_chars").alias("max_chars"))
    return (
        docs.crossJoin(F.broadcast(mx))
        .filter(
            (F.expr(_SPARK_DOC_HASH) % 10000) * F.col("max_chars")
            < F.col("n_chars") * 10000
        )
        .select("doc_id", "lang", "n_chars")
    )


# --- tokenizer vocabulary coverage / OOV rate ---------------------------------------

_VOCAB_K = 1000  # top-K corpus words kept in the vocabulary


@register(
    "vocab_oov_rate",
    oracle=f"""
    WITH words AS (
        SELECT doc_id, unnest(string_split(text, ' ')) AS w FROM documents
    ),
    vocab AS (
        SELECT w FROM (
            SELECT w, count(*) AS cnt FROM words GROUP BY w
        ) ORDER BY cnt DESC, w LIMIT {_VOCAB_K}
    )
    SELECT d.doc_id,
           CAST(count(*) AS BIGINT) AS n_tokens,
           CAST(count(*) FILTER (WHERE v.w IS NULL) AS BIGINT) AS n_oov,
           CAST(count(*) FILTER (WHERE v.w IS NULL) AS DOUBLE)
               / CAST(count(*) AS DOUBLE) AS oov_rate
    FROM words d LEFT JOIN vocab v ON v.w = d.w
    GROUP BY d.doc_id
    """,
)
def vocab_oov_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tokenizer-vocabulary coverage: build the top-K corpus vocabulary
    (the word-level stand-in for a BPE vocab) and score every document's
    out-of-vocabulary token rate — the coverage check run before freezing
    a tokenizer, and a quality signal (high OOV ⇒ noise/lang mismatch).

    Determinism: vocabulary membership is a TOTAL order (count DESC, word)
    with a hard K cutoff — boundary ties resolve identically in both
    engines; OOV is an exact count and the rate ONE int/int division.
    Scale: word counts are map-side combinable; top-K is
    TakeOrderedAndProject (never a global single-partition window); the
    K-row vocabulary broadcasts into the per-doc probe, so the only
    corpus-sized exchange is the explode→per-doc regroup.
    """
    docs = load_table(spark, sf_dir, "documents")
    words = docs.select(
        "doc_id", F.explode(F.split("text", " ")).alias("w")
    )
    vocab = (
        words.groupBy("w")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .orderBy(F.col("cnt").desc(), "w")
        .limit(_VOCAB_K)
        .select("w")
    )
    probe = words.join(
        F.broadcast(vocab.withColumnRenamed("w", "vw")),
        words.w == F.col("vw"),
        "left",
    )
    return probe.groupBy("doc_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_tokens"),
        F.count_if(F.col("vw").isNull()).cast("long").alias("n_oov"),
        (
            F.count_if(F.col("vw").isNull()).cast("double")
            / F.count(F.lit(1)).cast("double")
        ).alias("oov_rate"),
    )


# --- Bloom-prefiltered decontamination ---------------------------------------

_BLOOM_BITS = 1 << 20  # m = 1,048,576 bits = 16,384 int64 words


def _bloom_positions(g: str) -> tuple[str, str]:
    """Two deterministic probe positions in [0, m) for a 64-bit gram hash.

    Probe 1 is the low bits, probe 2 an xxhash64 remix (JVM built-in —
    overflow-free under ANSI mode, unlike a Knuth multiply on int64).
    """
    p1 = f"(({g}) & {_BLOOM_BITS - 1})"
    p2 = f"(xxhash64({g}) & {_BLOOM_BITS - 1})"
    return p1, p2


@register(
    "bloom_decontaminate_train_eval",
    oracle=f"""
    WITH wh AS (
      SELECT doc_id,
             {_DUCK_DOC_HASH} % 100 AS b,
             {duck_word_polyhashes_expr('text', 31)} AS wh1,
             {duck_word_polyhashes_expr('text', 131)} AS wh2
      FROM documents
    ),
    hashed AS (
      SELECT doc_id, b, {duck_gram_fold64_expr('wh1', 'wh2', _DECON_N)} AS gs
      FROM wh
    ),
    train AS (
      SELECT doc_id, unnest(gs) AS g FROM hashed WHERE b < 80
    ),
    ev AS (
      SELECT DISTINCT unnest(gs) AS g FROM hashed WHERE b >= 90
    )
    SELECT train.doc_id, count(*) AS n_shared_grams
    FROM train JOIN ev ON train.g = ev.g
    GROUP BY train.doc_id
    """,
)
def bloom_decontaminate_train_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Decontamination with a BLOOM-FILTER prefilter: same semantics (and
    the same exact oracle) as ``decontaminate_train_eval``, different
    physical strategy — the one that wins when the train side is 100 TB
    and the eval side is a benchmark suite.

    The eval split's distinct gram hashes are folded into a 2-probe,
    2^20-bit Bloom filter built from PUBLIC primitives: each gram sets
    bit ``pos & 63`` of int64 word ``pos >> 6``; ``bit_or`` per word
    aggregates the word table, which is collected to the driver as a
    DENSE 16,384-long bitset (128 KiB — CONSTANT in corpus size: sized
    by m, not by the data) and shipped back as a one-row broadcast
    frame. Train grams are then filtered by pure map-side
    ``element_at`` + bitmask tests — no probe joins, no shuffle of the
    train relation; only Bloom survivors (true matches + the controlled
    false-positive trickle) reach the exact gram equi-join that restores
    bit-exact results (a Bloom filter has NO false negatives, so
    survivors ⊇ true matches and the verify join drops the rest; the
    oracle is the plain exact-overlap query).

    At 100 TB: the bitset stays 128 KiB regardless of corpus size (size
    m to the eval-set cardinality), the train scan streams through two
    in-memory bit probes per gram, and shuffle volume is O(true
    overlap), not O(train grams).
    """
    # one Arrow-kernel pass for the gram sets (see _decon_hashed); the
    # single cache feeds the train branch, the eval branch, and (via ev)
    # the Bloom word table and the verify join
    hashed = _decon_hashed(spark, sf_dir).cache()
    p1, p2 = _bloom_positions("g")
    train = hashed.filter(F.col("b") < 80).select(
        "doc_id", F.explode("ghs").alias("g")
    )
    ev = (
        hashed.filter(F.col("b") >= 90)
        .select(F.explode("ghs").alias("g"))
        .distinct()
        .cache()  # consumed by both the filter build and the verify join
    )
    # Build the sparse Bloom word table: (word index -> OR of probe masks).
    probes = ev.select(F.expr(p1).alias("pos")).unionAll(
        ev.select(F.expr(p2).alias("pos"))
    )
    bloom = (
        probes.select(
            (F.col("pos") / 64).cast("long").alias("w"),
            F.expr("shiftleft(CAST(1 AS BIGINT), CAST(pos % 64 AS INT))").alias(
                "m"
            ),
        )
        .groupBy("w")
        .agg(F.expr("bit_or(m)").alias("bits"))
    )
    # Densify on the driver: ≤16,384 (w, bits) rows -> one 128 KiB long
    # array, CONSTANT in corpus size (bounded by the filter's m, never by
    # the data). A one-row broadcast frame makes both probes map-side
    # bitmask tests instead of two broadcast-join builds.
    dense = [0] * (_BLOOM_BITS // 64)
    for r in bloom.collect():
        dense[int(r.w)] = int(r.bits)
    bits_frame = spark.createDataFrame([(dense,)], "bloom_bits array<bigint>")
    probe_ok = (
        "(element_at(bloom_bits, CAST({p} DIV 64 AS INT) + 1)"
        " & shiftleft(CAST(1 AS BIGINT), CAST({p} % 64 AS INT))) != 0"
    )
    cand = (
        train.crossJoin(F.broadcast(bits_frame))
        .filter(F.expr(probe_ok.format(p=p1)))
        .filter(F.expr(probe_ok.format(p=p2)))
        .select("doc_id", "g")
    )
    return (
        # exact verify: drops Bloom false positives; the eval gram set is
        # small by the same assumption that sized the filter, so broadcast
        cand.join(F.broadcast(ev), "g")
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("n_shared_grams"))
    )


# --- deterministic per-key reservoir sample ---------------------------------

_RESERVOIR_K = 3  # kept events per user


# Affine scrambling hash for sequential integer ids. A char-fold poly hash
# is length-dominant and near-monotone on sequential ids (h("99") < h("100")
# < h("101")…), which silently degrades hash-rank sampling toward "first K
# by id". The affine map a·x + b mod P (P prime, a the Knuth multiplier)
# sends consecutive ids ~a apart mod P — uniform over the id range. The id
# reduces mod P BEFORE the multiply so the product stays < P·a < 2^62 for
# ANY int64 id (no overflow at 100 TB id ranges), pure int64 arithmetic
# identical in Spark and DuckDB.
_SAMPLE_HASH = "((event_id % 1000000007) * 2654435761 + 1013904223) % 1000000007"


@register(
    "reservoir_sample_per_user",
    oracle=f"""
    SELECT user_id, event_id, CAST(rn AS BIGINT) AS sample_rank
    FROM (
        SELECT user_id, event_id,
               row_number() OVER (
                   PARTITION BY user_id
                   ORDER BY {_SAMPLE_HASH}, event_id
               ) AS rn
        FROM events
    )
    WHERE rn <= {_RESERVOIR_K}
    """,
)
def reservoir_sample_per_user(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic per-key reservoir sample: keep exactly K events per
    user, chosen uniformly BUT reproducibly — rank by a deterministic
    affine hash of the event id and keep the K smallest. The hash-rank
    trick is the distributed, rerun-stable replacement for random.sample:
    the same input always yields the same sample (training-data
    reproducibility), and the affine scramble decorrelates the ranking
    from id/time order (a char-fold hash would NOT — see _SAMPLE_HASH).

    Scale: one shuffle on user_id; the rn <= K filter compiles to
    WindowGroupLimit, so each partition keeps a K-heap per key instead of
    fully sorting its users' events (same plan class as top-k per group
    F4). At 100 TB this is the canonical "cap any key's contribution"
    primitive — the skew guard for per-user training caps.
    """
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy(F.expr(_SAMPLE_HASH), "event_id")
    return (
        ev.select(
            "user_id",
            "event_id",
            F.row_number().over(w).alias("sample_rank"),
        )
        .filter(F.col("sample_rank") <= _RESERVOIR_K)
        .select("user_id", "event_id", F.col("sample_rank").cast("long"))
    )


# --- hashing-trick feature vectorizer ---------------------------------------

_FEATURE_DIM = 64  # hashed feature buckets
_FEATURE_DOC_MOD = 10  # keep doc_id % 10 == 0 → bounded driver output


@register(
    "feature_hash_vectorizer",
    oracle=f"""
    SELECT doc_id,
           CAST({duck_poly_hash("tok")} % {_FEATURE_DIM} AS BIGINT) AS bucket,
           count(*) AS n_tokens
    FROM (
        SELECT doc_id, unnest(string_split(text, ' ')) AS tok
        FROM documents WHERE doc_id % {_FEATURE_DOC_MOD} = 0
    )
    WHERE tok <> ''
    GROUP BY doc_id, bucket
    """,
)
def feature_hash_vectorizer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hashing-trick bag-of-words (Weinberger et al., ICML'09 — public
    method): each token maps to one of D buckets by deterministic hash;
    per-document bucket counts ARE the sparse feature vector — no vocab
    build, no dictionary shuffle, memory O(D) per doc. The long
    (doc_id, bucket, n) shape is the sparse-matrix interchange format
    feature stores and trainers ingest.

    Scale: explode + hash stay inside whole-stage codegen (JVM higher-
    order functions, no Python); the rollup is map-side combinable with
    output bounded by docs x D, independent of corpus token count. No
    vocabulary state means no second pass and no driver-side dictionary —
    the property that makes the hashing trick THE 100 TB vectorizer.
    The doc_id filter only bounds the checked output's size; remove it
    and the plan is unchanged.
    """
    docs = load_table(spark, sf_dir, "documents")
    toks = (
        docs.filter(F.col("doc_id") % _FEATURE_DOC_MOD == 0)
        .select(
            "doc_id", F.explode(F.split("text", " ")).alias("tok")
        )
        .filter(F.col("tok") != "")
    )
    return (
        toks.select(
            "doc_id",
            (F.expr(spark_poly_hash("tok")) % _FEATURE_DIM).alias("bucket"),
        )
        .groupBy("doc_id", "bucket")
        .agg(F.count(F.lit(1)).alias("n_tokens"))
    )


# --- effective sample size under weighting -----------------------------------


@register(
    "ess_by_source",
    oracle="""
    SELECT source,
           CAST(count(*) AS BIGINT) AS n_docs,
           round(CAST(CAST(sum(n_chars) AS HUGEINT)
                      * CAST(sum(n_chars) AS HUGEINT) AS DOUBLE)
                 / CAST(sum(CAST(n_chars AS HUGEINT) * n_chars) AS DOUBLE),
                 6) AS ess,
           round(CAST(CAST(sum(n_chars) AS HUGEINT)
                      * CAST(sum(n_chars) AS HUGEINT) AS DOUBLE)
                 / CAST(sum(CAST(n_chars AS HUGEINT) * n_chars) AS DOUBLE)
                 / count(*), 6) AS ess_frac
    FROM documents
    WHERE source IS NOT NULL AND n_chars > 0
    GROUP BY source
    """,
)
def ess_by_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kish effective sample size of each source's documents under
    length-proportional weighting — ESS = (Σw)²/Σw² with w = n_chars: the
    diagnostic that tells a mixture designer how much a source's token
    count is really worth in independent-document units (a source whose
    mass sits in a few giant docs has ESS ≪ n_docs, so upweighting it
    buys less diversity than the raw token share suggests).

    Determinism: (Σw)² and Σw² are exact integers (DECIMAL/HUGEINT cross
    products); ONE float division each, rounded at output. n_chars > 0
    filters weightless docs identically on both engines (a zero-weight
    doc contributes to neither sum but would inflate n_docs).

    Scale: one map-side-combinable aggregate over the corpus — the
    moment pattern of `profile_orders_columns`, per source.
    """
    docs = load_table(spark, sf_dir, "documents").filter(
        F.col("source").isNotNull() & (F.col("n_chars") > 0)
    )
    agg = docs.groupBy("source").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum("n_chars").cast("decimal(38,0)").alias("s1"),
        F.sum(F.col("n_chars").cast("decimal(38,0)") * F.col("n_chars"))
        .cast("decimal(38,0)")
        .alias("s2"),
    )
    ess = (F.col("s1") * F.col("s1")).cast("double") / F.col("s2").cast(
        "double"
    )
    return agg.select(
        "source",
        "n_docs",
        F.round(ess, 6).alias("ess"),
        F.round(ess / F.col("n_docs"), 6).alias("ess_frac"),
    )


# --- tokenizer sizing: coverage-at-k curve -----------------------------------

_COVERAGE_KS = (10, 100, 1000)


@register(
    "vocab_coverage_at_k",
    oracle=f"""
    WITH tf AS (
        SELECT term, CAST(count(*) AS BIGINT) AS cnt
        FROM (
            SELECT unnest(string_split(text, ' ')) AS term FROM documents
        ) WHERE term <> '' GROUP BY term
    ),
    ranked AS (
        SELECT cnt, row_number() OVER (ORDER BY cnt DESC, term) AS rnk
        FROM tf
    ),
    total AS (SELECT CAST(sum(cnt) AS BIGINT) AS n_tokens FROM tf)
    SELECT k,
           CAST(coalesce(sum(CASE WHEN rnk <= k THEN cnt END), 0) AS BIGINT)
               AS covered_tokens,
           max(n_tokens) AS n_tokens,
           round(coalesce(sum(CASE WHEN rnk <= k THEN cnt END), 0)
                 / CAST(max(n_tokens) AS DOUBLE), 6) AS coverage
    FROM ranked CROSS JOIN total
    CROSS JOIN (SELECT CAST(unnest([{", ".join(str(k) for k in _COVERAGE_KS)}])
                         AS BIGINT) AS k)
    GROUP BY k
    """,
)
def vocab_coverage_at_k(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token coverage of a top-k vocabulary — the tokenizer-sizing curve:
    what fraction of all token OCCURRENCES the k most frequent terms
    cover (the complement of ``vocab_oov_rate``'s fixed-vocab view, swept
    over candidate sizes). The elbow of this curve is where vocabulary
    growth stops buying coverage — the standard first read before fixing
    a tokenizer budget.

    Determinism: counts are exact integers; ranking ties break (cnt DESC,
    term); one rounded division per k.

    Scale: term frequency is a map-side-combinable aggregate (never a
    window over occurrences); the rank runs over the VOCABULARY relation
    — bounded by distinct terms, not corpus tokens — and the k-sweep is
    a constant 3-row broadcast. A zipfian corpus makes the vocab rollup
    skew-safe by construction (counts, not rows, reach the rank).
    """
    docs = load_table(spark, sf_dir, "documents")
    tf = (
        docs.select(F.explode(F.split("text", " ")).alias("term"))
        .filter(F.col("term") != "")
        .groupBy("term")
        .agg(F.count(F.lit(1)).cast("long").alias("cnt"))
    )
    w = Window.orderBy(F.col("cnt").desc(), F.col("term").asc())
    ranked = tf.select("cnt", F.row_number().over(w).alias("rnk"))
    total = tf.agg(F.sum("cnt").cast("long").alias("n_tokens"))
    ks = spark.range(0).sparkSession.createDataFrame(
        [(k,) for k in _COVERAGE_KS], "k long"
    )
    return (
        ranked.crossJoin(F.broadcast(total))
        .crossJoin(F.broadcast(ks))
        .groupBy("k")
        .agg(
            F.coalesce(
                F.sum(F.when(F.col("rnk") <= F.col("k"), F.col("cnt"))),
                F.lit(0),
            )
            .cast("long")
            .alias("covered_tokens"),
            F.max("n_tokens").alias("n_tokens"),
            F.round(
                F.coalesce(
                    F.sum(F.when(F.col("rnk") <= F.col("k"), F.col("cnt"))),
                    F.lit(0),
                )
                / F.max("n_tokens").cast("double"),
                6,
            ).alias("coverage"),
        )
    )


# ---------------------------------------------------------------------------
# tokenizer training: BPE merge candidates (first merge round)
# ---------------------------------------------------------------------------


@register(
    "bpe_merge_candidates",
    oracle="""
    WITH words AS (
        SELECT w, count(*) AS freq FROM (
            SELECT unnest(string_split(text, ' ')) AS w FROM documents
            WHERE text IS NOT NULL
        ) WHERE w <> '' GROUP BY w
    ),
    pairs AS (
        SELECT unnest(list_transform(range(1, length(w)),
                                     bp_i -> substring(w, bp_i, 2))) AS pair,
               freq
        FROM words
    )
    SELECT pair, CAST(sum(freq) AS BIGINT) AS n_merges
    FROM pairs GROUP BY pair
    ORDER BY n_merges DESC, pair ASC LIMIT 20
    """,
)
def bpe_merge_candidates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First BPE merge round over the corpus (tokenizer-training prep):
    the top-20 adjacent character pairs by frequency, weighted by word
    frequency — the pair a byte-pair-encoding trainer would merge first
    (Sennrich et al. 2016's counting step as a distributed aggregate).

    Scale shape: the word-frequency table is a map-side-combinable
    aggregate over the token explode (vocab-sized, tiny vs corpus); pair
    extraction then runs over DISTINCT WORDS ONLY — a 100 TB corpus has
    billions of tokens but a near-constant vocabulary, so the per-word
    char scan costs O(vocab), not O(corpus). Ties at the top-20 boundary
    break on the pair string, so the listing is deterministic on both
    engines. Sub-2-char words contribute no pairs (safe_seq1 empty range,
    mirroring DuckDB's empty list comprehension).

    Iterating this operator (re-count after applying the best merge)
    is the full BPE trainer; each round is this same aggregate over a
    re-segmented vocab — the Spark plan is unchanged.
    """
    docs = load_table(spark, sf_dir, "documents").filter(
        F.col("text").isNotNull()
    )
    words = (
        docs.select(F.explode(F.split("text", " ")).alias("w"))
        .filter(F.col("w") != "")
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("freq"))
    )
    pairs = words.select(
        F.explode(
            F.expr(
                f"transform({safe_seq1('length(w) - 1')},"
                f" bp_i -> substring(w, bp_i, 2))"
            )
        ).alias("pair"),
        "freq",
    )
    return (
        pairs.groupBy("pair")
        .agg(F.sum("freq").cast("long").alias("n_merges"))
        .orderBy(F.col("n_merges").desc(), F.col("pair").asc())
        .limit(20)
    )


# ---------------------------------------------------------------------------
# tokenizer training: iterated BPE (3 unrolled merge rounds)
# ---------------------------------------------------------------------------

_BPE_ROUNDS = 3


def _bpe_iter_oracle(rounds: int) -> str:
    """DuckDB oracle for :func:`bpe_train_iterated`: the same wrapped-token
    representation and greedy left-to-right ``replace`` merge, unrolled as
    one CTE chain per round (the k-means/PageRank unrolling precedent)."""
    ctes = [
        """words AS (
        SELECT w, count(*) AS freq FROM (
            SELECT unnest(string_split(text, ' ')) AS w FROM documents
            WHERE text IS NOT NULL
        ) WHERE w <> '' GROUP BY w
    ),
    v0 AS (
        SELECT freq,
               array_to_string(list_transform(range(1, length(w) + 1),
                   bt_i -> chr(1) || substring(w, bt_i, 1) || chr(2)), '')
               AS st
        FROM words
    )"""
    ]
    for k in range(1, rounds + 1):
        ctes.append(f"""t{k} AS (
        SELECT freq,
               string_split(substring(st, 2, length(st) - 2),
                            chr(2) || chr(1)) AS toks
        FROM v{k - 1}
    ),
    c{k} AS (
        SELECT freq, toks, unnest(range(1, len(toks))) AS i FROM t{k}
    ),
    p{k} AS (
        SELECT toks[i] AS x, toks[i + 1] AS y,
               CAST(sum(freq) AS BIGINT) AS n_merges
        FROM c{k} GROUP BY 1, 2
    ),
    b{k} AS (
        SELECT x, y, n_merges FROM p{k}
        ORDER BY n_merges DESC, x ASC, y ASC LIMIT 1
    ),
    v{k} AS (
        SELECT v.freq,
               replace(v.st,
                       chr(1) || b.x || chr(2) || chr(1) || b.y || chr(2),
                       chr(1) || b.x || b.y || chr(2)) AS st
        FROM v{k - 1} v, b{k} b
    )""")
    selects = " UNION ALL ".join(
        f"SELECT CAST({k} AS INT) AS round, x AS lhs, y AS rhs,"
        f" x || y AS merged, n_merges FROM b{k}"
        for k in range(1, rounds + 1)
    )
    return "WITH " + ",\n    ".join(ctes) + "\n    " + selects


@register("bpe_train_iterated", oracle=_bpe_iter_oracle(_BPE_ROUNDS))
def bpe_train_iterated(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Iterated BPE training, 3 merge rounds (Sennrich et al. 2016): each
    round counts adjacent TOKEN pairs over the distinct-word vocabulary
    (freq-weighted), merges the most frequent pair everywhere (greedy
    left-to-right, non-overlapping), and re-counts on the re-segmented
    vocab — proving ``bpe_merge_candidates``' claim that every round is
    the same O(vocab) aggregate with the plan shape unchanged.

    Representation: a word's token sequence is ONE string of
    sentinel-wrapped tokens (``\\x01tok\\x02…``), so the merge step is a
    single ``replace`` of ``\\x01x\\x02\\x01y\\x02`` with ``\\x01xy\\x02``
    — both engines' ``replace`` scans left-to-right without rescanning
    replaced output, and since the merged token ``xy`` can never equal
    the pattern's left token ``x`` (``y`` is non-empty), the two engines'
    merges agree exactly; the full-wrap sentinels make cross-token
    pattern matches impossible. Pair extraction strips the outer
    sentinels and splits on ``\\x02\\x01`` — clean raw tokens, no indexed
    lambda (DuckDB 1.0 has none). Sub-2-token words contribute no pairs
    (safe_seq1 empty range / DuckDB's empty ``range``).

    Scale: per round, the pair scan + aggregate runs over DISTINCT WORDS
    (vocab-sized, near-constant at 100 TB); the chosen merge is a 1-ROW
    broadcast joined back for the re-segmentation; rounds are unrolled
    like the k-means/PageRank precedent, so k rounds = k narrow
    vocab-sized stages, never a corpus rescan. Tie-breaks are exact
    string comparisons; counts are exact integers — no floats anywhere.
    """
    docs = load_table(spark, sf_dir, "documents").filter(
        F.col("text").isNotNull()
    )
    vocab = (
        docs.select(F.explode(F.split("text", " ")).alias("w"))
        .filter(F.col("w") != "")
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("freq"))
        .select(
            "freq",
            F.expr(
                f"array_join(transform({safe_seq1('length(w)')},"
                f" bt_i -> concat(char(1), substring(w, bt_i, 1), char(2))),"
                f" '')"
            ).alias("st"),
        )
    )
    rounds: list[DataFrame] = []
    for k in range(1, _BPE_ROUNDS + 1):
        toks = vocab.withColumn(
            "toks",
            F.expr(
                "split(substring(st, 2, length(st) - 2),"
                " concat(char(2), char(1)))"
            ),
        )
        pairs = toks.select(
            "freq",
            F.explode(
                F.expr(
                    f"transform({safe_seq1('size(toks) - 1')},"
                    f" bt_i -> struct(element_at(toks, bt_i) AS x,"
                    f" element_at(toks, bt_i + 1) AS y))"
                )
            ).alias("p"),
        ).select("freq", "p.x", "p.y")
        best = (
            pairs.groupBy("x", "y")
            .agg(F.sum("freq").cast("long").alias("n_merges"))
            .orderBy(F.col("n_merges").desc(), F.col("x").asc(), F.col("y").asc())
            .limit(1)
        )
        rounds.append(
            best.select(
                F.lit(k).cast("int").alias("round"),
                F.col("x").alias("lhs"),
                F.col("y").alias("rhs"),
                F.concat("x", "y").alias("merged"),
                "n_merges",
            )
        )
        if k < _BPE_ROUNDS:
            vocab = vocab.crossJoin(
                F.broadcast(best.select("x", "y"))
            ).select(
                "freq",
                F.expr(
                    "replace(st,"
                    " concat(char(1), x, char(2), char(1), y, char(2)),"
                    " concat(char(1), x, y, char(2)))"
                ).alias("st"),
            )
    out = rounds[0]
    for r in rounds[1:]:
        out = out.unionByName(r)
    return out


# ---------------------------------------------------------------------------
# DSIR: data selection via importance resampling weights
# ---------------------------------------------------------------------------

_DSIR_BUCKETS = 4096  # hashed-unigram feature space (fixed, broadcastable)
_DSIR_TARGET_LANG = "en"


@register(
    "dsir_importance_weights",
    oracle=f"""
    WITH terms AS (
        SELECT doc_id, lang, unnest(string_split(text, ' ')) AS term
        FROM documents WHERE text IS NOT NULL
    ),
    tf AS (
        SELECT doc_id, lang,
               {duck_poly_hash("term")} % {_DSIR_BUCKETS} AS bucket,
               count(*) AS tf
        FROM terms WHERE term <> '' GROUP BY 1, 2, 3
    ),
    target AS (
        SELECT bucket, CAST(sum(tf) AS BIGINT) AS cnt FROM tf
        WHERE lang = '{_DSIR_TARGET_LANG}' GROUP BY bucket
    ),
    corpus AS (
        SELECT bucket, CAST(sum(tf) AS BIGINT) AS cnt FROM tf GROUP BY bucket
    ),
    tots AS (
        -- coalesce: an EMPTY target (no docs in the target lang) must be
        -- a 0 total (the uniform add-1 LM), matching the Spark side's
        -- per-bucket coalesce-to-0 sums - a bare sum over the empty CTE
        -- is NULL and NULLs the whole ratio
        SELECT coalesce((SELECT sum(cnt) FROM target), 0) AS tot_t,
               (SELECT sum(cnt) FROM corpus) AS tot_c
    ),
    ratio AS (
        SELECT c.bucket,
               CAST(round((ln((coalesce(t.cnt, 0) + 1.0)
                              / (tots.tot_t + {_DSIR_BUCKETS}))
                           - ln((c.cnt + 1.0)
                                / (tots.tot_c + {_DSIR_BUCKETS})))
                          * 1000000) AS BIGINT) AS logratio_micro
        FROM corpus c LEFT JOIN target t ON c.bucket = t.bucket
        CROSS JOIN tots
    )
    SELECT tf.doc_id,
           CAST(sum(tf.tf) AS BIGINT) AS n_tokens,
           CAST(CAST(sum(tf.tf * r.logratio_micro) AS BIGINT)
                // CAST(sum(tf.tf) AS BIGINT) AS BIGINT)
               AS mean_logratio_micro
    FROM tf JOIN ratio r ON tf.bucket = r.bucket
    GROUP BY tf.doc_id
    """,
)
def dsir_importance_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Data Selection via Importance Resampling (Xie et al. 2023): per-doc
    mean log importance ratio between a TARGET domain's hashed-unigram LM
    (here lang='en' plays the target) and the whole corpus's, in integer
    micro-nats. Resampling by these weights tilts a general corpus toward
    the target domain — the standard pretraining-data targeting pass.

    Determinism: per-bucket log-ratio is rounded ONCE to integer
    micro-nats (the unigram_logprob_score trick); every downstream sum is
    exact BIGINT in any association order, and the per-doc mean is integer
    division TRUNCATING toward zero on both engines (Spark ``DIV`` and
    DuckDB ``//`` both truncate — measured on the negative ratios this
    query actually produces).

    Scale shape: the feature space is FIXED at 4096 hashed buckets, so
    both LMs are 4096-row aggregates — broadcast the ratio table and the
    per-doc pass is one map-side-combinable groupBy; the LM state is O(1)
    in corpus size, which is DSIR's entire point. Hash collisions are part
    of the estimator (identical hash on both engines).
    """
    docs = load_table(spark, sf_dir, "documents").filter(
        F.col("text").isNotNull()
    )
    # Arrow word-tf kernel (round 12): same (doc_id, lang, bucket, tf)
    # integers as dsir_tf's explode->hash->groupBy, but the per-doc tf
    # aggregation happens in the kernel, so the token explode AND the
    # (doc, bucket) shuffle disappear (parity lock:
    # tests/test_selection.py::test_word_level_kernel_matches_hof).
    # dsir_tf itself is kept as the streaming twin's builder — the
    # convergence test still asserts bit-exact batch==streamed weights.
    tf = word_bucket_tf_frame(docs, _DSIR_BUCKETS, keep=("lang",))
    # ONE aggregate pass produces both LMs (target = conditional sum), so
    # the corpus is scanned twice total: once into this 4096-row stats
    # frame, once for the per-doc tf join below. tots derives from the
    # stats frame (4096 rows), never from a third corpus scan.
    return dsir_weights(tf, dsir_bucket_stats(tf))


# Shared DSIR builders — pure DataFrame algebra over batch OR streaming
# inputs, so streaming/dsir.py maintains the identical LM state and the
# convergence test can assert bit-exact weight equality after replay.


def dsir_tf(docs: DataFrame) -> DataFrame:
    """(doc_id, lang, bucket, tf): hashed-unigram term frequencies."""
    return (
        docs.select(
            "doc_id", "lang", F.explode(F.split("text", " ")).alias("term")
        )
        .filter(F.col("term") != "")
        .select(
            "doc_id",
            "lang",
            F.expr(f"{spark_poly_hash('term')} % {_DSIR_BUCKETS}").alias(
                "bucket"
            ),
        )
        .groupBy("doc_id", "lang", "bucket")
        .agg(F.count(F.lit(1)).alias("tf"))
    )


def dsir_bucket_stats(tf: DataFrame) -> DataFrame:
    """Both LMs in one ≤4096-row aggregate: per-bucket corpus count and
    conditional target-language count. On a STREAMING tf this groupBy IS
    the O(1) LM state (update mode) — see streaming/dsir.py."""
    return tf.groupBy("bucket").agg(
        F.sum("tf").cast("long").alias("cnt_c"),
        F.coalesce(
            F.sum(F.when(F.col("lang") == _DSIR_TARGET_LANG, F.col("tf"))),
            F.lit(0),
        )
        .cast("long")
        .alias("cnt_t"),
    )


def dsir_weights(tf: DataFrame, bucket_stats: DataFrame) -> DataFrame:
    """Per-doc importance weights from a tf relation and an LM stats table
    (add-1 smoothing, integer micro-nats; see dsir_importance_weights)."""
    tots = bucket_stats.agg(
        F.sum("cnt_t").cast("long").alias("tot_t"),
        F.sum("cnt_c").cast("long").alias("tot_c"),
    )
    ratio = bucket_stats.join(F.broadcast(tots)).select(
        "bucket",
        F.expr(
            f"CAST(round((ln((cnt_t + 1.0)"
            f"              / (tot_t + {_DSIR_BUCKETS}))"
            f"          - ln((cnt_c + 1.0) / (tot_c + {_DSIR_BUCKETS})))"
            f"         * 1000000) AS BIGINT)"
        ).alias("logratio_micro"),
    )
    return (
        tf.join(F.broadcast(ratio), "bucket")
        .groupBy("doc_id")
        .agg(
            F.sum("tf").cast("long").alias("n_tokens"),
            F.expr(
                "CAST(CAST(sum(tf * logratio_micro) AS BIGINT)"
                " DIV CAST(sum(tf) AS BIGINT) AS BIGINT)"
            ).alias("mean_logratio_micro"),
        )
    )
