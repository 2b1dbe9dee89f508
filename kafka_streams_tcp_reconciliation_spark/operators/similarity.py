"""Similarity search over embedding columns (SURVEY.md §2.11 X3).

Three tiers, mirroring how a 100 TB vector corpus is actually served:

- **Brute-force top-k** — broadcast the (small) query set against the
  corpus scan; exact, the correctness baseline.
- **IVF** — partition the corpus into coarse cells (here: the `label`
  column as the cell id, centroids = per-cell means); a query probes only
  its nearest cell. Scan cost drops by ~n_cells; centroids broadcast.
- **Sign-LSH near-dup** — random-hyperplane sign buckets with 2 OR-ed
  tables; candidate pairs only within a bucket. The hyperplanes are
  deterministic rationals computed from integer arithmetic, so Spark and
  DuckDB build byte-identical buckets and the oracle mirrors the full
  approximate pipeline.

Numeric determinism: every dot product is a sequential left fold over
explicitly double-cast elements (Spark ``aggregate(zip_with(...))`` /
DuckDB ordered ``list_reduce``) — identical IEEE results in both engines;
scores are additionally rounded before ranking so rank tiebreaks agree.
Per-pair scoring uses JVM HOF folds; the QUADRATIC-within-group stages
(kNN graph, SemDeDup pairs) instead ship each group ONCE through Arrow to
``pairwise_cosine_matrix``, whose numpy accumulation replays the exact
same per-dimension fold order (see its docstring) — bit-identical doubles
at matrix speed instead of millions of interpreted per-pair folds.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from kafka_streams_tcp_reconciliation_spark.functions.hashing import MOD

_KNUTH = 2_654_435_761


# ---------------------------------------------------------------------------
# cosine similarity (deterministic fold)
# ---------------------------------------------------------------------------


def dot_expr(a: str, b: str) -> str:
    """Spark SQL: ordered-fold dot product of two float-array columns."""
    return (
        f"aggregate(zip_with({a}, {b},"
        f" (cs_x, cs_y) -> CAST(cs_x AS DOUBLE) * CAST(cs_y AS DOUBLE)),"
        f" CAST(0 AS DOUBLE), (cs_a, cs_v) -> cs_a + cs_v)"
    )


def duck_dot_expr(a: str, b: str) -> str:
    """DuckDB SQL: same ordered fold (1-based element indexing).

    NULL-propagating like Spark's ``aggregate(zip_with(...))``: without
    the guard, ``list_prepend(0, NULL)`` is ``[0.0]`` and DuckDB folds a
    NULL list to 0.0 while Spark returns NULL — a silent divergence for
    every bare-dot oracle the moment a corpus has NULL embeddings
    (round-7 NULL-embedding sweep finding).
    """
    fold = (
        f"list_reduce(list_prepend(CAST(0 AS DOUBLE),"
        f" list_transform(range(1, len({a}) + 1),"
        f" cs_i -> CAST({a}[cs_i] AS DOUBLE) * CAST({b}[cs_i] AS DOUBLE))),"
        f" (cs_a, cs_v) -> cs_a + cs_v)"
    )
    return (
        f"(CASE WHEN {a} IS NULL OR {b} IS NULL THEN NULL"
        f" ELSE {fold} END)"
    )


def cosine_expr(a: str, b: str) -> Column:
    return F.expr(
        f"({dot_expr(a, b)}) / sqrt(({dot_expr(a, a)}) * ({dot_expr(b, b)}))"
    )


def duck_cosine_expr(a: str, b: str) -> str:
    return (
        f"({duck_dot_expr(a, b)})"
        f" / sqrt(({duck_dot_expr(a, a)}) * ({duck_dot_expr(b, b)}))"
    )


# ---------------------------------------------------------------------------
# sign-plane LSH buckets
# ---------------------------------------------------------------------------
#
# Hyperplane component (k, d) is the deterministic rational
#   ((k*DIM + d) * KNUTH mod P) / P - 0.5
# — reproducible in any engine with int64 + double arithmetic.

# OR-ed hash tables: each table is an independent 2^planes bucketing,
# and a pair is a candidate if it collides in ANY table — so the table
# count is the RECALL dial (P_hit = 1 - (1-p)^T for per-table collision
# probability p = (1-θ/π)^planes) at a linear cost in bucket projections
# and index size. Env knob since round 12 (the planted-parallel-pair
# bitext fixture measures the dial: see
# tests/test_mlprep_ops.py::test_bitext_planted_pair_recall); import-time
# like SPARK_GRAFT_LSH_PLANES below, so the Spark plan and the DuckDB
# oracle always read the same constant (parity at a non-default count
# locked by tests/test_scale_ops.py::test_lsh_tables_knob_keeps_oracle_parity).
import os as _os

LSH_TABLES = int(_os.environ.get("SPARK_GRAFT_LSH_TABLES", "2"))
if not (1 <= LSH_TABLES <= 16):
    raise ValueError(
        f"SPARK_GRAFT_LSH_TABLES must be in [1, 16], got {LSH_TABLES}"
    )
# Sign bits per table: 2^planes buckets/table. With a FIXED plane count
# the within-bucket pair volume is ~n²/2^planes per table — the round-7
# sf0.1→sf1→sf10 sweep measured exactly that (49k → 4.7M → 473M bucket
# pairs at 8 planes, 95× per 10× vectors), so the plane count is the
# knob that must GROW with the corpus (buckets ≈ n/50 keeps ~50-vector
# buckets; each extra plane halves bucket population at a recall cost of
# (1−θ/π) per table, recovered by OR-ing tables). Import-time env knob,
# mirroring SPARK_GRAFT_SEMDEDUP_K: the Spark plan and the DuckDB oracle
# both read this constant when their expressions are built, so a
# non-default setting keeps the differential exact (locked by
# tests/test_scale_ops.py::test_lsh_planes_knob_keeps_oracle_parity);
# the driver-visible default is unchanged.
LSH_PLANES = int(_os.environ.get("SPARK_GRAFT_LSH_PLANES", "8"))
# Validated at import (fail loudly, not at plan-build): the bucket id is
# Σ bit_j · 2^j carried as a signed BIGINT in both engines, so planes > 62
# overflows the sign bit (DuckDB errors, Spark wraps — either way the
# differential dies); 0 planes would put every vector in one bucket — the
# full cross product the LSH exists to avoid.
if not (1 <= LSH_PLANES <= 62):
    raise ValueError(
        f"SPARK_GRAFT_LSH_PLANES must be in [1, 62], got {LSH_PLANES}"
    )
DIM = 64


def _plane_component(k: str, d: str) -> str:
    return f"((({k} * {DIM} + {d}) * {_KNUTH}) % {MOD}) / {MOD}.0 - 0.5"


def _sign_bit_spark(vec: str, k: str) -> str:
    proj = (
        f"aggregate(zip_with({vec}, sequence(0, {DIM - 1}),"
        f" (sp_x, sp_d) -> CAST(sp_x AS DOUBLE)"
        f" * ({_plane_component(k, 'sp_d')})),"
        f" CAST(0 AS DOUBLE), (sp_a, sp_v) -> sp_a + sp_v)"
    )
    return f"IF(({proj}) > 0, 1, 0)"


def lsh_bucket_structs_expr(vec_col: str) -> Column:
    """Explodable array of (tbl, bucket): one sign-bucket per LSH table."""
    bits = " + ".join(
        f"({_sign_bit_spark(vec_col, f'(lt_t * {LSH_PLANES} + {j})')}) * {1 << j}"
        for j in range(LSH_PLANES)
    )
    return F.expr(
        f"transform(sequence(0, {LSH_TABLES - 1}),"
        f" lt_t -> struct(lt_t AS tbl, {bits} AS bucket))"
    )


def _sign_bit_duck(vec: str, k: str) -> str:
    proj = (
        f"list_reduce(list_prepend(CAST(0 AS DOUBLE),"
        f" list_transform(range(1, {DIM} + 1),"
        f" sp_i -> CAST({vec}[sp_i] AS DOUBLE)"
        f" * ({_plane_component(k, '(sp_i - 1)')}))),"
        f" (sp_a, sp_v) -> sp_a + sp_v)"
    )
    return f"CASE WHEN ({proj}) > 0 THEN 1 ELSE 0 END"


def duck_lsh_bucket_select(vec_col: str) -> str:
    """DuckDB fragment: list of {tbl, bucket} structs to unnest."""
    bits = " + ".join(
        f"({_sign_bit_duck(vec_col, f'(lt_t * {LSH_PLANES} + {j})')}) * {1 << j}"
        for j in range(LSH_PLANES)
    )
    return (
        f"[{{'tbl': lt_t, 'bucket': {bits}}}"
        f" FOR lt_t IN range(0, {LSH_TABLES})]"
    )


# ---------------------------------------------------------------------------
# data-proportional cell refinement (kNN graph / IVF scale knob)
# ---------------------------------------------------------------------------
#
# Exact-within-cell operators (kNN graph, SemDeDup) are O(|cell|²), so a
# FIXED cell count is a scale cliff: 10 label cells at sf10 means ~20k-row
# cells → 400M scored pairs each (measured: 613 s, SCALE.md). The fix is
# the textbook IVF posture — cell count ∝ corpus — wired here as a DEFAULT,
# not a footnote: each label cell is refined by `n_planes` sign-LSH bits,
# where n_planes is the smallest p with n_labels · 2^p · KNN_CELL_ROWS ≥ n,
# i.e. total cells ≈ ceil(n / KNN_CELL_ROWS), expected cell size ≈
# KNN_CELL_ROWS regardless of corpus size. Everything — the row count, the
# plane count, the bucket bits — is integer/ordered-double arithmetic
# computed IN-ENGINE (a 1-row aggregate cross-joined in, no driver
# collect), so the DuckDB oracle replays the identical refinement and the
# differential stays exact at every sf.

# Target rows per refined cell. 256 keeps fixture scales (≤2560 vectors =
# 10 label cells × 256) at n_planes = 0 — the historical label-cell
# behavior — while sf10's ~200k vectors get 2^7 subcells/label (~150-row
# cells). Env knob so a cluster can trade cell size (recall within cell is
# exact; smaller cells = faster + fewer in-cell candidates).
KNN_CELL_ROWS = int(_os.environ.get("SPARK_GRAFT_KNN_CELL_ROWS", "256"))
if KNN_CELL_ROWS < 1:
    raise ValueError(
        f"SPARK_GRAFT_KNN_CELL_ROWS must be >= 1, got {KNN_CELL_ROWS}"
    )
# Hard cap on refinement planes: 2^20 subcells per label is far beyond any
# corpus this engine will meet (at 256-row cells that is a 2.7-trillion-row
# table per label) and keeps the bucket id comfortably inside BIGINT.
KNN_MAX_PLANES = 20


def knn_planes_expr(n: str, n_labels: str, target_rows: int) -> str:
    """Spark SQL: smallest p in [0, KNN_MAX_PLANES] with
    ``n_labels * 2^p * target_rows >= n`` — pure integer arithmetic (no
    float log2, whose ulp error flips ceil() at exact powers of two).

    ``n``/``n_labels`` are 1-row aggregate columns (count(*) /
    count(distinct label)); ``greatest(.., 1)`` guards the empty corpus.
    """
    g = f"greatest(({n_labels}), 1)"
    q = f"(greatest(({n}), 1) + {g} * {target_rows} - 1) DIV ({g} * {target_rows})"
    return (
        f"aggregate(sequence(0, {KNN_MAX_PLANES}), -1,"
        f" (kp_a, kp_p) -> if(kp_a >= 0, kp_a,"
        f" if(shiftleft(CAST(1 AS BIGINT), kp_p) >= ({q}), kp_p, kp_a)))"
    )


def duck_knn_planes_expr(n: str, n_labels: str, target_rows: int) -> str:
    """DuckDB twin of :func:`knn_planes_expr` (same find-first fold)."""
    g = f"greatest(({n_labels}), 1)"
    q = f"(greatest(({n}), 1) + {g} * {target_rows} - 1) // ({g} * {target_rows})"
    return (
        f"list_reduce(list_prepend(CAST(-1 AS BIGINT),"
        f" list_transform(range(0, {KNN_MAX_PLANES} + 1), kp_p -> kp_p)),"
        f" (kp_a, kp_p) -> CASE WHEN kp_a >= 0 THEN kp_a"
        f" WHEN (CAST(1 AS BIGINT) << kp_p) >= ({q}) THEN kp_p"
        f" ELSE kp_a END)"
    )


def subcell_expr(vec: str, n_planes: str) -> str:
    """Spark SQL: sign-LSH refinement bucket Σ bit_p·2^p over a RUNTIME
    plane count (``n_planes`` is a column, so the fold iterates a
    sequence instead of unrolling like ``lsh_bucket_structs_expr``).

    Same deterministic hyperplanes (`_plane_component`) and the same
    ascending-dimension double fold as the static LSH — bit-identical in
    DuckDB. NULL embeddings project to NULL, whose sign test folds to bit
    0 in both engines, so they land in subcell 0 (they are scored as
    NULL-cosine neighbors inside a cell, same as the label-only era).
    n_planes <= 0 yields the empty plane set → subcell 0 for every row
    (exactly the historical one-cell-per-label behavior).
    """
    proj = (
        f"aggregate(zip_with({vec}, sequence(0, {DIM - 1}),"
        f" (sc_x, sc_d) -> CAST(sc_x AS DOUBLE)"
        f" * ({_plane_component('kc_p', 'sc_d')})),"
        f" CAST(0 AS DOUBLE), (sc_a, sc_v) -> sc_a + sc_v)"
    )
    bit = f"IF(({proj}) > 0, shiftleft(CAST(1 AS BIGINT), kc_p), CAST(0 AS BIGINT))"
    seq = (
        f"slice(sequence(0, greatest(CAST(({n_planes}) AS INT) - 1, 0)),"
        f" 1, greatest(CAST(({n_planes}) AS INT), 0))"
    )
    return (
        f"aggregate({seq}, CAST(0 AS BIGINT), (kc_a, kc_p) -> kc_a + {bit})"
    )


def duck_subcell_expr(vec: str, n_planes: str) -> str:
    """DuckDB twin of :func:`subcell_expr` (range(0, p) is natively empty
    for p <= 0; NULL-list projection folds through CASE to bit 0)."""
    proj = (
        f"list_reduce(list_prepend(CAST(0 AS DOUBLE),"
        f" list_transform(range(1, {DIM} + 1),"
        f" sc_i -> CAST({vec}[sc_i] AS DOUBLE)"
        f" * ({_plane_component('kc_p', '(sc_i - 1)')}))),"
        f" (sc_a, sc_v) -> sc_a + sc_v)"
    )
    bit = (
        f"CASE WHEN ({proj}) > 0 THEN (CAST(1 AS BIGINT) << kc_p)"
        f" ELSE CAST(0 AS BIGINT) END"
    )
    return (
        f"list_reduce(list_prepend(CAST(0 AS BIGINT),"
        f" list_transform(range(0, CAST(({n_planes}) AS BIGINT)),"
        f" kc_p -> {bit})), (kc_a, kc_v) -> kc_a + kc_v)"
    )


# ---------------------------------------------------------------------------
# vectorized within-group pairwise cosine (Arrow / numpy kernel)
# ---------------------------------------------------------------------------


def _make_pairwise_cosine():
    # Factory indirection ON PURPOSE: the returned function's qualname is
    # not importable, so cloudpickle serializes it BY VALUE into any
    # pandas-kernel closure that captures it. A plain module-level def
    # would pickle by reference (module path), and the Python workers of
    # a foreign-cwd driver (the external harness) cannot import this
    # package — the exact failure mode the verify recipe checks for.
    def pairwise_cosine_matrix(vectors):
        """All-pairs rounded cosine matrix for one group's vectors, with
        the EXACT fold order of ``dot_expr``/``duck_dot_expr``.

        ``dot_expr`` computes ``((0 + x1·y1) + x2·y2) + …`` — a
        sequential left fold over dimensions, each element cast to double
        first. This kernel accumulates one outer product per DIMENSION in
        the same order (``acc += V[:, d] ⊗ V[:, d]``), so every pair's
        sum performs the identical sequence of IEEE double additions and
        the resulting cosines (and their 6-dp roundings, and therefore
        every rank tiebreak) are bit-identical to the JVM fold and the
        DuckDB oracle.

        Scale contract: callers group by a bounded-population
        cell/cluster id (IVF cell, SemDeDup cluster), so the n×n matrix
        is per-task memory of a BOUNDED group, never corpus-sized; the
        corpus is shipped through Arrow exactly once per stage.

        Takes an iterable of n dim-length float vectors; returns the
        (n, n) matrix of round(cosine, 6) with self-cosines on the
        diagonal (callers mask them).

        Preconditions / boundary caveats:

        - **Vectors must be non-None** — callers valid-mask NULL
          embeddings out first (NULL pairs get NULL cosine, ranked last,
          like the oracle's fold over a NULL list).
        - **Zero-norm vectors violate a three-way engine contract**
          (probed round 7, locked by
          tests/test_sources.py::test_zero_norm_engine_semantics):
          under the repo session's ANSI mode (Spark 4's default) the
          JVM double division 0/0 THROWS DIVIDE_BY_ZERO — a zero-norm
          vector reaching any SQL-side cosine fails the query LOUDLY,
          never silently; this numpy kernel yields IEEE NaN (which
          Spark's sort order ranks GREATEST, so callers map NaN to an
          explicit ±inf key for deterministic Python-side ordering);
          DuckDB 1.x maps double 0/0 to NULL (sorted LAST under DESC).
          Non-zero norms are therefore a hard precondition of the
          oracle differential; violations surface as an ANSI error on
          the Spark path, not as wrong answers.
        - **Rounding is float, not decimal**: ``np.round`` scales by 1e6
          and rounds half-to-even in binary, whereas Spark's ``round()``
          goes through ``BigDecimal`` HALF_UP. For a cosine within ~1 ulp
          of an exact 6-dp half boundary the two can differ in the last
          digit (~1e-10 per value empirically; never observed in the
          differential suite). "Bit-identical" below therefore holds for
          the fold and division; the final rounding is identical except
          on exact half boundaries.
        """
        import numpy as np

        V = np.stack(vectors).astype(np.float64)
        n, dim = V.shape
        dots = np.zeros((n, n))
        for d in range(dim):
            col = V[:, d]
            dots += np.multiply.outer(col, col)
        sd = np.diag(dots).copy()
        denom = np.sqrt(np.multiply.outer(sd, sd))
        return np.round(dots / denom, 6)

    return pairwise_cosine_matrix


pairwise_cosine_matrix = _make_pairwise_cosine()


def _make_pairwise_cosine_blocked():
    # same by-value-pickling factory rationale as _make_pairwise_cosine
    def pairwise_cosine_blocked(vectors, block=1024):
        """Row-blocked twin of ``pairwise_cosine_matrix``: yields
        ``(start, M)`` where ``M`` is rows [start, start+block) of the
        full rounded cosine matrix — **bitwise identical** to the
        corresponding slice of the unblocked kernel, because every
        per-pair dot still accumulates one product per DIMENSION in the
        same order (``acc += A[:, d] ⊗ V[:, d]``) and the self-dot
        denominators are built by the same per-dimension adds the full
        matrix's diagonal performs.

        Why it exists: the unblocked kernel materializes n² doubles of
        per-task memory. Callers group by a bounded-population cell id,
        but "bounded" is a data contract, not a guarantee — one skewed
        or misconfigured cell (the round-7 sf1.0 sweep's fixed-K regime
        makes cells grow linearly with the corpus) would OOM an executor
        at 100 TB. Blocking caps per-task memory at block·n doubles
        (plus the n-vector self-dot line) regardless of cell size, while
        total work and every emitted double stay identical.

        Same preconditions as ``pairwise_cosine_matrix`` (non-None
        vectors; zero-norm caveat in its docstring).
        """
        import numpy as np

        V = np.stack(vectors).astype(np.float64)
        n, dim = V.shape
        sd = np.zeros(n)
        for d in range(dim):
            col = V[:, d]
            sd += col * col
        for s in range(0, n, block):
            e = min(s + block, n)
            dots = np.zeros((e - s, n))
            for d in range(dim):
                col = V[:, d]
                dots += np.multiply.outer(col[s:e], col)
            denom = np.sqrt(np.multiply.outer(sd[s:e], sd))
            yield s, np.round(dots / denom, 6)

    return pairwise_cosine_blocked


pairwise_cosine_blocked = _make_pairwise_cosine_blocked()
