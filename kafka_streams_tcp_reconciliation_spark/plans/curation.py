"""Second-stage curation operators — what runs AFTER the pairwise
dedup/similarity layer has produced its candidate structures.

Three additions a 100 TB training-data pipeline needs on top of the
X1–X5 inventory (COVERAGE.md §2.11):

- ``pagerank_neardup_graph`` — link-analysis centrality over the
  near-dup pair graph: which documents sit at the center of large
  duplication neighborhoods (template pages, boilerplate hubs). The
  canonical "choose the best representative per cluster" signal —
  cluster resolution (``dedup_cluster_resolve``) says WHICH docs group,
  PageRank says which member to keep.
- ``dedup_levenshtein`` — the verify stage of two-stage fuzzy dedup:
  sketch blocking (SimHash) proposes candidates cheaply, exact edit
  distance confirms them. Sketches alone admit false positives; running
  the O(len²) verifier only inside blocked pairs keeps it sub-quadratic.
- ``embedding_random_projection`` — Johnson-Lindenstrauss sign
  projection 64→16 dims: the standard pre-step that makes downstream
  clustering/ANN 4× cheaper while approximately preserving distances.

Determinism notes (the driver hash-compares against DuckDB):

- PageRank runs in scaled INTEGER arithmetic (rank in parts-per-million,
  integer division for both the degree split and the damping multiply),
  so per-iteration results are bit-exact in any summation order on any
  engine — no float rounding anywhere in the loop.
- The JL sign matrix is computed once in Python from a multiplicative
  hash (top bit of (idx·KNUTH) mod 2³²) and inlined as literal arrays
  into BOTH engines' SQL, so the "random" matrix is identical by
  construction; the projection itself is the shared ordered-fold dot
  product (operators/similarity.dot_expr).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from kafka_streams_tcp_reconciliation_spark.operators.similarity import (
    dot_expr,
    duck_dot_expr,
)
from kafka_streams_tcp_reconciliation_spark.plans import register
from kafka_streams_tcp_reconciliation_spark.plans.llm import (
    SIMHASH_CAND_CTES,
    simhash_pair_frame,
)
from kafka_streams_tcp_reconciliation_spark.sources.tables import load_table

# ---------------------------------------------------------------------------
# PageRank over the near-dup graph
# ---------------------------------------------------------------------------

_PR_ITERS = 3
_PR_INIT_PPM = 1_000_000  # rank carried as integer parts-per-million
_PR_BASE_PPM = 150_000  # (1 - d) · 1e6 with damping d = 0.85


def _pr_iter_cte(prev: str, cur: str) -> str:
    return f"""
    {cur} AS (
        SELECT e.dst AS doc_id,
               CAST({_PR_BASE_PPM} + (85 * sum(r.r // d.deg)) // 100
                    AS BIGINT) AS r
        FROM edges e
        JOIN {prev} r ON e.src = r.doc_id
        JOIN deg d ON e.src = d.src
        GROUP BY e.dst
    )"""


_PR_ORACLE = f"""
    WITH {SIMHASH_CAND_CTES},
    edges AS (
        SELECT doc_a AS src, doc_b AS dst FROM simhash_pairs
        UNION ALL
        SELECT doc_b AS src, doc_a AS dst FROM simhash_pairs
    ),
    deg AS (
        SELECT src, CAST(count(*) AS BIGINT) AS deg FROM edges GROUP BY src
    ),
    r0 AS (
        SELECT src AS doc_id, CAST({_PR_INIT_PPM} AS BIGINT) AS r FROM deg
    ),
    {",".join(_pr_iter_cte(f"r{i}", f"r{i + 1}") for i in range(_PR_ITERS))}
    SELECT r.doc_id, r.r AS rank_ppm, d.deg
    FROM r{_PR_ITERS} r JOIN deg d ON r.doc_id = d.src
    """


@register("pagerank_neardup_graph", oracle=_PR_ORACLE)
def pagerank_neardup_graph(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PageRank (damping 0.85, 3 unrolled iterations) over the symmetric
    SimHash near-dup pair graph: (doc_id, rank_ppm, deg) for every doc in
    at least one near-dup pair. High-rank nodes are duplication hubs —
    boilerplate/template documents worth inspecting or preferring as the
    cluster representative.

    All arithmetic is integer: rank lives in parts-per-million (BIGINT),
    each neighbor receives ``rank DIV degree``, and the damped update is
    ``150000 + (85 · Σ contrib) DIV 100``. Integer sums commute, so the
    result is bit-identical regardless of aggregation order — this is how
    an iterative float algorithm gets a strong cross-engine oracle.

    Scale shape: one shuffle per iteration (join ranks→edges on src, then
    re-aggregate on dst) — the standard Pregel pattern. The edge list is
    PRE-JOINED with its source degree once and cached, so each iteration
    is exactly one join + one aggregation (re-joining the degree table
    inside every iteration tripled the join count for no information).
    Since every node of a symmetric graph has out-degree ≥ 1 there are no
    dangling-mass corrections. A skewed hub node concentrates its IN-side
    aggregation; AQE skew-join handles the join side and the sum is
    map-side combinable, so hot hubs cost one tall partial-agg column,
    not a single-reducer stall.
    """
    pairs = simhash_pair_frame(spark, sf_dir)
    edges = (
        pairs.select(F.col("doc_a").alias("src"), F.col("doc_b").alias("dst"))
        .unionByName(
            pairs.select(F.col("doc_b").alias("src"), F.col("doc_a").alias("dst"))
        )
        .cache()
    )
    deg = edges.groupBy("src").agg(F.count("*").cast("long").alias("deg"))
    # (src, dst, deg) — degree rides with the edge so the Pregel loop
    # never re-joins the degree table; cached once, consumed per iteration
    edges_deg = edges.join(deg, "src").cache()
    ranks = deg.select(
        F.col("src").alias("doc_id"),
        F.lit(_PR_INIT_PPM).cast("long").alias("r"),
    )
    for _ in range(_PR_ITERS):
        contrib = edges_deg.join(
            ranks, edges_deg["src"] == ranks["doc_id"]
        ).select(F.col("dst"), F.expr("r DIV deg").alias("contrib"))
        ranks = contrib.groupBy("dst").agg(
            F.expr(f"CAST({_PR_BASE_PPM} + (85 * sum(contrib)) DIV 100 AS BIGINT)").alias(
                "r"
            )
        ).select(F.col("dst").alias("doc_id"), "r")
    return ranks.join(deg, ranks["doc_id"] == deg["src"]).select(
        "doc_id", F.col("r").alias("rank_ppm"), "deg"
    )


# ---------------------------------------------------------------------------
# Verified fuzzy dedup: SimHash blocking → exact edit distance
# ---------------------------------------------------------------------------

_LEV_MAX_REL = 0.3


@register(
    "dedup_levenshtein",
    oracle=f"""
    WITH {SIMHASH_CAND_CTES},
    proj AS (
        SELECT doc_id,
               regexp_replace(text, '[^\\x00-\\x7f]', '?', 'g') AS ptext
        FROM documents WHERE text IS NOT NULL
    )
    SELECT p.doc_a, p.doc_b,
           CAST(levenshtein(a.ptext, b.ptext) AS BIGINT) AS edit_dist,
           round(CAST(levenshtein(a.ptext, b.ptext) AS DOUBLE)
                 / greatest(length(a.ptext), length(b.ptext), 1), 6) AS rel_edit
    FROM simhash_pairs p
    JOIN proj a ON p.doc_a = a.doc_id
    JOIN proj b ON p.doc_b = b.doc_id
    WHERE round(CAST(levenshtein(a.ptext, b.ptext) AS DOUBLE)
                / greatest(length(a.ptext), length(b.ptext), 1), 6) <= {_LEV_MAX_REL}
    """,
)
def dedup_levenshtein(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-stage verified fuzzy dedup (X2, verify tier): SimHash chunk
    blocking proposes candidate pairs, exact Levenshtein distance confirms
    them (relative edit distance ≤ 0.3 of the longer doc). Output:
    (doc_a, doc_b, edit_dist, rel_edit).

    This is the shape every production near-dup pipeline uses: the O(len²)
    edit-distance kernel is unaffordable across all pairs, but inside
    sketch-blocked candidates it runs on a vanishing fraction of the
    corpus. Both engines' built-in ``levenshtein`` is the standard
    unit-cost DP — integer-exact cross-engine; the relative score is
    rounded before the threshold so the predicate agrees bit-for-bit.

    Oracle contract caveats (both engine-verified):

    - DuckDB's ``levenshtein`` counts BYTES while Spark's counts
      CODEPOINTS, so raw cross-engine equivalence holds only for ASCII
      text. Both sides therefore fold the text to a common ASCII
      projection first (non-ASCII chars -> '?'), which is the identity
      on the ASCII fixture corpus and keeps the distance engine-exact on
      any corpus (at the cost of treating all non-ASCII chars as equal
      — acceptable for a VERIFY stage whose candidates already share
      shingle structure).
    - The denominator is ``greatest(len_a, len_b, 1)``: without the
      floor, a pair of empty documents — true duplicates with
      edit_dist = 0 — yields 0/0 (NULL in Spark, NaN in DuckDB) and is
      silently dropped by the threshold filter in both engines.

    Scale shape: the candidate join is doc_id-keyed (shuffle proportional
    to candidate count, not corpus size); the edit-distance evaluation is
    embarrassingly parallel per pair and JVM-side (no Python).
    """
    pairs = simhash_pair_frame(spark, sf_dir)
    docs = (
        load_table(spark, sf_dir, "documents")
        .filter(F.col("text").isNotNull())
        .select(
            "doc_id",
            F.regexp_replace("text", r"[^\x00-\x7f]", "?").alias("text"),
        )
    )
    j = pairs.join(
        docs.select(F.col("doc_id").alias("doc_a"), F.col("text").alias("text_a")),
        "doc_a",
    ).join(
        docs.select(F.col("doc_id").alias("doc_b"), F.col("text").alias("text_b")),
        "doc_b",
    )
    edit = F.levenshtein("text_a", "text_b").cast("long")
    rel = F.round(
        edit.cast("double")
        / F.greatest(F.length("text_a"), F.length("text_b"), F.lit(1)).cast("double"),
        6,
    )
    return (
        j.select(
            "doc_a",
            "doc_b",
            edit.alias("edit_dist"),
            rel.alias("rel_edit"),
        )
        .filter(F.col("rel_edit") <= _LEV_MAX_REL)
    )


# ---------------------------------------------------------------------------
# Johnson-Lindenstrauss random sign projection 64 -> 16
# ---------------------------------------------------------------------------

_JL_OUT_DIM = 16
_JL_IN_DIM = 64
_KNUTH = 2_654_435_761
_JL_SCALE = 0.25  # 1 / sqrt(out_dim)


def _jl_sign_rows() -> list[list[float]]:
    """The deterministic ±1/√m projection matrix, one row per output dim.

    Sign = top bit of the 32-bit multiplicative hash of the flat index —
    computed HERE, once, and inlined as literals into both engines' SQL,
    so there is no cross-engine arithmetic to keep in sync.
    """
    rows = []
    for k in range(_JL_OUT_DIM):
        row = []
        for j in range(_JL_IN_DIM):
            h = ((k * _JL_IN_DIM + j + 1) * _KNUTH) % (1 << 32)
            row.append(_JL_SCALE if h >= (1 << 31) else -_JL_SCALE)
        rows.append(row)
    return rows


def _jl_spark_lit(row: list[float]) -> str:
    return "array(" + ", ".join(f"CAST({v} AS DOUBLE)" for v in row) + ")"


def _jl_duck_lit(row: list[float]) -> str:
    return "[" + ", ".join(f"CAST({v} AS DOUBLE)" for v in row) + "]"


_JL_ROWS = _jl_sign_rows()

_JL_ORACLE = "SELECT vec_id, " + ", ".join(
    f"round({duck_dot_expr('embedding', _jl_duck_lit(row))}, 6) AS y{k:02d}"
    for k, row in enumerate(_JL_ROWS)
) + " FROM embeddings"


@register("embedding_random_projection", oracle=_JL_ORACLE)
def embedding_random_projection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Johnson-Lindenstrauss sign projection of the embedding corpus,
    64 → 16 dims: y_k = Σ_j x_j · s_kj / √16 with s ∈ {±1} drawn from a
    deterministic multiplicative hash (Achlioptas 2003: ±1 entries
    satisfy the JL lemma — no Gaussians needed).

    The workhorse pre-step before clustering / ANN at 100 TB: 4× less
    vector I/O and arithmetic downstream at a distance distortion bound
    of O(√(log n / m)). Shuffle-free and embarrassingly parallel: a
    narrow projection per row; the matrix rides inline in the plan
    (16×64 literals), never a join. Each y_k is the shared ordered-fold
    dot product, so Spark and DuckDB agree on every IEEE double before
    the final round(6).
    """
    emb = load_table(spark, sf_dir, "embeddings")
    cols = [F.col("vec_id")] + [
        F.expr(f"round({dot_expr('embedding', _jl_spark_lit(row))}, 6)").alias(
            f"y{k:02d}"
        )
        for k, row in enumerate(_JL_ROWS)
    ]
    return emb.select(*cols)
