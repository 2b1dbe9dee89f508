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
    spark_poly_hash,
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
