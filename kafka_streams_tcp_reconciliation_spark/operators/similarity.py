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


# ---------------------------------------------------------------------------
# sign-LSH bucket kernel (Arrow / numpy, round 12)
# ---------------------------------------------------------------------------


def _plane_matrix(n_tables: int, n_planes: int, dim: int):
    """(dim, n_tables*n_planes) float64 hyperplane components, the exact
    doubles of ``_plane_component`` (int64 products < 2^53 are exact, the
    mod and the division are the same ops both engines run)."""
    import numpy as np

    k = np.arange(n_tables * n_planes, dtype=np.int64)
    d = np.arange(dim, dtype=np.int64)
    idx = k[None, :] * dim + d[:, None]
    return (idx * _KNUTH) % MOD / float(MOD) - 0.5


def _make_lsh_bucket_kernel():
    # same by-value-pickling factory rationale as _make_pairwise_cosine
    def lsh_bucket_batch(vecs, planes_mat, n_tables, n_planes):
        """Sign-LSH buckets for one Arrow batch of vectors — bit-identical
        to ``explode(lsh_bucket_structs_expr(vec))``:

        - each projection accumulates one product per DIMENSION in
          ascending order (``acc += v_d * plane_d`` — the shared
          fold-order contract), so the sign tests see the identical IEEE
          doubles the JVM fold produces;
        - a NULL vector projects to NULL in SQL, whose sign test folds to
          bit 0 in both engines — here: bucket 0 in every table.

        Returns an int64 (n_vecs, n_tables) bucket matrix.
        """
        import numpy as np

        nv = len(vecs)
        valid = np.array([v is not None for v in vecs], dtype=bool)
        buckets = np.zeros((nv, n_tables), dtype=np.int64)
        if valid.any():
            V = np.stack(
                [np.asarray(v, dtype=np.float64) for v, ok in
                 zip(vecs, valid) if ok]
            )
            proj = np.zeros((V.shape[0], n_tables * n_planes))
            for d in range(V.shape[1]):
                proj += np.multiply.outer(V[:, d], planes_mat[d])
            bits = (proj > 0).astype(np.int64)
            shifted = bits.reshape(V.shape[0], n_tables, n_planes) << (
                np.arange(n_planes, dtype=np.int64)
            )
            buckets[valid] = shifted.sum(axis=2)
        return buckets

    return lsh_bucket_batch


lsh_bucket_batch = _make_lsh_bucket_kernel()


def lsh_buckets_frame(df, id_col: str, vec_col: str):
    """(id, tbl, bucket) — one row per (vector, LSH table), the Arrow
    twin of ``explode(lsh_bucket_structs_expr(vec))`` (bit-identical;
    locked by tests/test_mlprep_ops.py::test_lsh_buckets_frame_matches_hof).
    The HOF form pays tables × planes interpreted 64-dim folds per
    vector; the kernel runs one compiled matrix accumulation."""
    import numpy as np  # noqa: F401  (kernel imports its own)

    kernel = lsh_bucket_batch
    planes_mat = _plane_matrix(LSH_TABLES, LSH_PLANES, DIM)
    n_tables, n_planes = LSH_TABLES, LSH_PLANES

    def run(batches):
        import numpy as np
        import pandas as pd

        for pdf in batches:
            ids = pdf[id_col].to_numpy()
            buckets = kernel(
                list(pdf[vec_col]), planes_mat, n_tables, n_planes
            )
            yield pd.DataFrame(
                {
                    id_col: pd.Series(
                        np.repeat(ids, n_tables), dtype="int64"
                    ),
                    "tbl": pd.Series(
                        np.tile(
                            np.arange(n_tables, dtype=np.int64), len(ids)
                        ),
                        dtype="int64",
                    ),
                    "bucket": pd.Series(buckets.reshape(-1), dtype="int64"),
                }
            )

    return df.select(id_col, vec_col).mapInPandas(
        run, schema=f"{id_col} long, tbl long, bucket long"
    )


# ---------------------------------------------------------------------------
# per-pair cosine kernels (Arrow / numpy, round 12)
# ---------------------------------------------------------------------------


def _make_pair_cosine_kernel():
    # same by-value-pickling factory rationale as _make_pairwise_cosine
    def pair_cosine_batch(va_rows, vb_rows, micro):
        """Cosines for one Arrow batch of candidate PAIRS, replaying the
        exact arithmetic of the HOF form they replace
        (``dot(a,b) / sqrt(dot(a,a)*dot(b,b))``, self-dots per pair):

        - every dot accumulates one product per DIMENSION in ascending
          order (the shared fold-order contract) — bit-identical doubles;
        - ``micro=True`` returns ``round(cos * 1e6)`` as int64 with EXACT
          decimal HALF_UP (see ``cross_cosine_micro``); ``micro=False``
          returns ``round(cos, 6)`` as float — HALF_UP at the 6th decimal
          of the double-scaled value (y·1e6 carries ≤0.5 ulp ≈ 1e-10 of
          scaling error vs BigDecimal's exact decimal fraction — the
          same accepted boundary class as ``pairwise_cosine_matrix``'s
          rounding note, locked by the parity tests on every fixture);
        - NULL on either side -> missing (the SQL fold NULL-propagates);
        - zero-norm raises (the ANSI SQL path throws DIVIDE_BY_ZERO).

        Returns (values, missing) aligned with the input rows — int64
        micros or float64 cosines.
        """
        import numpy as np

        n = len(va_rows)
        valid = np.array(
            [a is not None and b is not None for a, b in
             zip(va_rows, vb_rows)],
            dtype=bool,
        )
        miss = ~valid
        if micro:
            out = np.zeros(n, dtype=np.int64)
        else:
            out = np.zeros(n, dtype=np.float64)
        if valid.any():
            A = np.stack(
                [np.asarray(v, dtype=np.float64) for v, ok in
                 zip(va_rows, valid) if ok]
            )
            B = np.stack(
                [np.asarray(v, dtype=np.float64) for v, ok in
                 zip(vb_rows, valid) if ok]
            )
            dots = np.zeros(A.shape[0])
            sa = np.zeros(A.shape[0])
            sb = np.zeros(A.shape[0])
            for d in range(A.shape[1]):
                ca, cb = A[:, d], B[:, d]
                dots += ca * cb
                sa += ca * ca
                sb += cb * cb
            if (sa == 0).any() or (sb == 0).any():
                raise ValueError(
                    "zero-norm embedding reached pair_cosine_batch — the "
                    "SQL twin fails with ANSI DIVIDE_BY_ZERO on this input"
                )
            y = (dots / np.sqrt(sa * sb)) * 1000000.0
            ay = np.abs(y)
            fl = np.floor(ay)
            r = (fl + (ay - fl >= 0.5)).astype(np.int64)
            r = np.where(y < 0, -r, r)
            out[valid] = r if micro else r / 1000000.0
        return out, miss

    return pair_cosine_batch


pair_cosine_batch = _make_pair_cosine_kernel()


def pair_cosine_frame(paired, id_a: str, id_b: str, va: str, vb: str,
                      micro: bool):
    """Score candidate pairs with the Arrow pair-cosine kernel: input
    frame carries (id_a, id_b, va, vb); output (id_a, id_b, cos_micro
    bigint) when ``micro`` else (id_a, id_b, cosine double). See
    ``pair_cosine_batch`` for the exactness contract."""
    kernel = pair_cosine_batch
    out_col = "cos_micro" if micro else "cosine"
    out_type = "long" if micro else "double"

    def run(batches):
        import pandas as pd

        for pdf in batches:
            vals, miss = kernel(list(pdf[va]), list(pdf[vb]), micro)
            if micro:
                col = pd.arrays.IntegerArray(vals, miss)
            else:
                col = pd.Series(vals, dtype="float64").mask(miss)
            yield pd.DataFrame(
                {
                    id_a: pdf[id_a].reset_index(drop=True),
                    id_b: pdf[id_b].reset_index(drop=True),
                    out_col: col,
                }
            )

    return paired.select(id_a, id_b, va, vb).mapInPandas(
        run, schema=f"{id_a} long, {id_b} long, {out_col} {out_type}"
    )


# ---------------------------------------------------------------------------
# cross-set cosine micro-scores (Arrow / numpy kernel, round 12)
# ---------------------------------------------------------------------------


def _make_cross_cosine_micro():
    # same by-value-pickling factory rationale as _make_pairwise_cosine
    def cross_cosine_micro(S_rows, T, tsqn, t_valid):
        """One s-side batch against the whole target matrix:
        round(cos·1e6) as int64 with a missing-mask, replaying the EXACT
        arithmetic of the SQL tier it replaces
        (``round((dot(sv,tv) / sqrt(dot(sv,sv)*dot(tv,tv))) * 1e6)``):

        - dots and self-dots accumulate one outer product per DIMENSION
          in ascending order (the ``pairwise_cosine_matrix`` fold-order
          contract) — bit-identical IEEE sums to the JVM/DuckDB left
          folds;
        - the rounding is EXACT decimal HALF_UP on the double
          ``cos * 1e6`` (away from zero on .5), matching Spark's
          BigDecimal ``round()`` — not ``np.round``'s half-even and not
          the ``floor(x+0.5)`` approximation: the fractional part
          ``y - floor(y)`` of a double below 2^52 is exact (Sterbenz),
          so comparing it to 0.5 reproduces BigDecimal's exact-fraction
          comparison;
        - a NULL embedding on either side yields a missing score (the
          SQL fold NULL-propagates);
        - a ZERO-NORM vector raises (the ANSI SQL path throws
          DIVIDE_BY_ZERO — the error stays loud, never silent garbage).

        Returns (dots_micro int64 (m, n), missing bool (m, n)).
        """
        import numpy as np

        m = len(S_rows)
        n = T.shape[0] if T is not None else 0
        s_valid = np.array([v is not None for v in S_rows], dtype=bool)
        miss = np.ones((m, max(n, 0)), dtype=bool)
        out = np.zeros((m, max(n, 0)), dtype=np.int64)
        if n and s_valid.any() and t_valid.any():
            S = np.stack(
                [np.asarray(v, dtype=np.float64) for v, ok in
                 zip(S_rows, s_valid) if ok]
            )
            dim = S.shape[1]
            ssqn = np.zeros(S.shape[0])
            dots = np.zeros((S.shape[0], int(t_valid.sum())))
            Tv = T[t_valid]
            for d in range(dim):
                sc = S[:, d]
                ssqn += sc * sc
                dots += np.multiply.outer(sc, Tv[:, d])
            if (ssqn == 0).any() or (tsqn[t_valid] == 0).any():
                raise ValueError(
                    "zero-norm embedding reached cross_cosine_micro — the "
                    "SQL twin fails with ANSI DIVIDE_BY_ZERO on this input"
                )
            y = dots / np.sqrt(np.multiply.outer(ssqn, tsqn[t_valid]))
            y = y * 1000000.0
            ay = np.abs(y)
            fl = np.floor(ay)
            r = (fl + (ay - fl >= 0.5)).astype(np.int64)
            r = np.where(y < 0, -r, r)
            block = np.zeros((int(s_valid.sum()), n), dtype=np.int64)
            block[:, t_valid] = r
            out[s_valid] = block
            bm = np.ones((int(s_valid.sum()), n), dtype=bool)
            bm[:, t_valid] = False
            miss[s_valid] = bm
        return out, miss

    return cross_cosine_micro


cross_cosine_micro = _make_cross_cosine_micro()


def _make_pq_encode_kernel():
    # same by-value-pickling factory rationale as _make_pairwise_cosine
    def pq_encode_batch(vec_rows, CB, js, M, subdim):
        """PQ codes for one Arrow batch of (non-NULL) vectors — the
        bit-identical twin of ``_pq_codes_expr``'s interpreted argmin:

        - each subspace distance accumulates one (x−c)² term per
          DIMENSION in ascending order (the shared fold-order contract)
          — the same IEEE doubles as the HOF left fold;
        - rounding to integer micro-units is EXACT decimal HALF_UP on
          the non-negative double (y − floor(y) is exact below 2^52);
        - the argmin over the PRESENT codewords (``js`` ascending)
          resolves ties to the LOWEST codeword id, exactly like
          ``array_min(named_struct('d', d, 'j', j))``.

        ``CB``: (M, len(js), subdim) float64 codeword tensor; returns an
        int32 (n, M) code matrix.
        """
        import numpy as np

        V = np.stack([np.asarray(v, dtype=np.float64) for v in vec_rows])
        n = V.shape[0]
        codes = np.empty((n, M), dtype=np.int32)
        for m in range(M):
            acc = np.zeros((n, CB.shape[1]))
            for d in range(subdim):
                diff = V[:, m * subdim + d][:, None] - CB[m, :, d][None, :]
                acc += diff * diff
            y = acc * 1000000.0
            fl = np.floor(y)
            r = (fl + (y - fl >= 0.5)).astype(np.int64)
            codes[:, m] = js[np.argmin(r, axis=1)]
        return codes

    return pq_encode_batch


pq_encode_batch = _make_pq_encode_kernel()


def pq_codes_frame(df, vec_col: str, codebook: dict, m_sub: int,
                   subdim: int, id_schema: str):
    """(passthrough ids..., codes array<int>) — the Arrow twin of
    ``crossJoin(broadcast(cb))`` + ``_pq_codes_expr`` corpus encoding
    (bit-identical; locked by
    tests/test_clustering.py::test_pq_codes_frame_matches_hof). The HOF
    form paid M×K interpreted ``subdim``-dim folds per vector — the
    dominant cost of the PQ queries' encode stage; the kernel runs M
    compiled (n × K × subdim) accumulations per batch. The codebook
    (M·K·subdim doubles, a few KB) ships in the task closure exactly
    like the HOF's one-row broadcast frame shipped it as data.

    ``df`` must carry the ``id_schema`` columns plus non-NULL
    ``vec_col``; ``id_schema`` is the passthrough part of the output
    schema (e.g. ``"vec_id long, label int"``).
    """
    import numpy as np

    kernel = pq_encode_batch
    js = np.array(sorted({j for (_, j) in codebook}), dtype=np.int32)
    CB = np.zeros((m_sub, len(js), subdim))
    for mi in range(m_sub):
        for ji, j in enumerate(js):
            CB[mi, ji] = codebook[(mi, int(j))]
    id_cols = [f.split()[0] for f in id_schema.split(",")]
    mm, sd = m_sub, subdim

    def run(batches):
        import pandas as pd

        for pdf in batches:
            if len(pdf) == 0:
                out = {c: pdf[c] for c in id_cols}
                out["codes"] = pd.Series([], dtype="object")
                yield pd.DataFrame(out)
                continue
            codes = kernel(list(pdf[vec_col]), CB, js, mm, sd)
            out = {c: pdf[c].reset_index(drop=True) for c in id_cols}
            out["codes"] = pd.Series(list(codes), dtype="object")
            yield pd.DataFrame(out)

    return df.select(*id_cols, vec_col).mapInPandas(
        run, schema=f"{id_schema}, codes array<int>"
    )


def bitext_pair_scores(s, t, fwd_k: int | None = None):
    """(src_id, tgt_id, cos_micro[, sumk_fwd]) for the FULL s×t product —
    the Arrow twin of the exact bitext tier's ``crossJoin(broadcast(t))``
    + HOF cosine (bit-identical: the kernel replays the same
    per-dimension fold order and exact HALF_UP rounding; locked by
    tests/test_mlprep_ops.py::test_bitext_pair_scores_matches_hof).

    Scale contract UNCHANGED from the tier it accelerates: the target
    side is collected once (this is the documented exact-N×N baseline
    tier — the broadcast of ``t`` was already its contract; the
    corpus-scale twin is ``bitext_margin_mining_lsh``) and shipped as a
    REAL Spark broadcast (round 13): a TorrentBroadcast moves the matrix
    to each executor once, instead of re-serializing it inside every
    task's pickled closure — at a real target-side size the closure form
    multiplies driver egress by the task count (guide §5). The s side
    streams through ``mapInPandas`` at full scan parallelism; per-pair
    compute drops from three interpreted 64-dim HOF folds to compiled-C
    outer products.

    ``fwd_k`` (round 13): when set, each output row additionally carries
    ``sumk_fwd`` — the sum of the source row's ``fwd_k`` highest
    cos_micro values (ties immaterial to a sum; NULL scores sort last
    and are skipped; all-NULL rows get NULL) — exactly the value of the
    window twin ``sum(cos_micro) over (partition by src_id order by
    cos_micro desc, tgt_id) rows rn <= k``, because each source row sees
    ALL targets inside one kernel block. Folding it here removes the
    full-pair-list exchange + sort the window pass paid (guide §2.4);
    parity locked by tests/test_mlprep_ops.py::test_bitext_fwd_sum_matches_window.

    ``s`` must carry (src_id, sv), ``t`` (tgt_id, tv); NULL vectors on
    either side surface as NULL cos_micro, exactly like the SQL fold.
    """
    import numpy as np

    t_pdf = t.toPandas()
    tgt_ids = t_pdf["tgt_id"].to_numpy()
    t_rows = list(t_pdf["tv"])
    t_valid = np.array([v is not None for v in t_rows], dtype=bool)
    if t_valid.any():
        T = np.stack(
            [np.asarray(v, dtype=np.float64) for v, ok in
             zip(t_rows, t_valid) if ok]
        )
        tsqn_v = np.zeros(T.shape[0])
        for d in range(T.shape[1]):
            col = T[:, d]
            tsqn_v += col * col
        Tfull = np.zeros((len(t_rows), T.shape[1]))
        Tfull[t_valid] = T
        tsqn = np.zeros(len(t_rows))
        tsqn[t_valid] = tsqn_v
    else:
        Tfull = np.zeros((len(t_rows), 0))
        tsqn = np.zeros(len(t_rows))
    kernel = cross_cosine_micro
    n = len(t_rows)
    k = fwd_k
    # one executor-side copy via TorrentBroadcast; the task closure holds
    # only the broadcast handle
    tb = s.sparkSession.sparkContext.broadcast((tgt_ids, Tfull, tsqn, t_valid))

    def run(batches):
        import numpy as np
        import pandas as pd

        b_tgt_ids, b_T, b_tsqn, b_tvalid = tb.value
        # row-chunk each Arrow batch so the kernel's (chunk × n_targets)
        # score block stays bounded (~256·n doubles) however large the
        # batch — at 10× scale an unchunked 10k-row batch against a
        # 10k-target side was a ~800 MB allocation per worker
        chunk = max(1, 2_000_000 // max(n, 1))
        empty = {
            "src_id": pd.Series([], dtype="int64"),
            "tgt_id": pd.Series([], dtype="int64"),
            "cos_micro": pd.array([], dtype="Int64"),
        }
        if k is not None:
            empty["sumk_fwd"] = pd.array([], dtype="Int64")
        for pdf in batches:
            src_ids = pdf["src_id"].to_numpy()
            m = len(src_ids)
            if m == 0 or n == 0:
                yield pd.DataFrame(empty)
                continue
            sv = list(pdf["sv"])
            for s0 in range(0, m, chunk):
                s1 = min(s0 + chunk, m)
                out, miss = kernel(sv[s0:s1], b_T, b_tsqn, b_tvalid)
                cols = {
                    "src_id": pd.Series(
                        np.repeat(src_ids[s0:s1], n), dtype="int64"
                    ),
                    "tgt_id": pd.Series(
                        np.tile(b_tgt_ids, s1 - s0), dtype="int64"
                    ),
                    "cos_micro": pd.arrays.IntegerArray(
                        out.reshape(-1), miss.reshape(-1)
                    ),
                }
                if k is not None:
                    # top-k sum per source row: invalid scores pinned to
                    # INT64_MIN so they sort last (the window twin's
                    # NULLS-LAST desc order), then masked out of the sum
                    # (sort ascending then reverse — negate-and-sort would
                    # wrap INT64_MIN and float the sentinels to the top)
                    masked = np.where(miss, np.iinfo(np.int64).min, out)
                    topk = np.sort(masked, axis=1)[:, ::-1][:, : k]
                    n_valid = (~miss).sum(axis=1)
                    take = np.minimum(n_valid, k)
                    keep = np.arange(topk.shape[1])[None, :] < take[:, None]
                    sums = np.where(keep, topk, 0).sum(axis=1)
                    cols["sumk_fwd"] = pd.arrays.IntegerArray(
                        np.repeat(sums, n),
                        np.repeat(n_valid == 0, n),
                    )
                yield pd.DataFrame(cols)

    schema = "src_id long, tgt_id long, cos_micro long"
    if k is not None:
        schema += ", sumk_fwd long"
    return s.select("src_id", "sv").mapInPandas(run, schema=schema)
