"""Deduplication operators (SURVEY.md §2.11 X1/X2): exact, n-gram
Jaccard, MinHash+LSH, SimHash.

Scale design (the 100 TB contract):

- Nothing here materializes O(n²): fuzzy dedup candidates come from an
  inverted-index join (shared shingle), LSH band buckets, or SimHash chunk
  blocks — all shuffle-on-key joins whose cost is O(candidates), not
  O(pairs). Exact verification runs only on candidates.
- All per-document compute (shingling, hashing, signatures) is expressed
  with Spark higher-order functions — JVM whole-stage codegen, no Python
  UDFs, no explode of per-token rows in the signature path.
- Every builder has a ``duck_*`` twin producing the equivalent DuckDB SQL
  from the SAME constants, so the driver's oracle check mirrors the full
  pipeline (including banding) and matches exactly — approximate dedup
  still gets the strong value-hash tier.

Each Spark/DuckDB pair computes identical int64s (see functions/hashing).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from kafka_streams_tcp_reconciliation_spark.functions.hashing import (
    BASE_A,
    BASE_B,
    MOD,
    duck_hash64,
    duck_poly_hash,
    hash_params,
    safe_seq1,
    spark_hash64,
    spark_poly_hash,
)

# ---------------------------------------------------------------------------
# shingling
# ---------------------------------------------------------------------------


def shingle_expr(text_col: str, n: int) -> Column:
    """Distinct word-``n``-gram shingle strings of a text column (Spark).

    Index range guarded by :func:`safe_seq1`: a doc with fewer than ``n``
    words yields an EMPTY shingle set (DuckDB-parity), not a crashed job
    — the bare descending ``sequence`` fed ``slice`` a start of 0."""
    idx = safe_seq1(f"size(split({text_col}, ' ')) - {n - 1}")
    return F.expr(
        f"array_distinct(transform({idx},"
        f" sh_i -> concat_ws(' ', slice(split({text_col}, ' '), sh_i, {n}))))"
    )


def duck_shingle_expr(text_col: str, n: int) -> str:
    return (
        f"list_distinct([array_to_string(string_split({text_col}, ' ')[sh_i:sh_i+{n - 1}], ' ')"
        f" FOR sh_i IN range(1, len(string_split({text_col}, ' ')) - {n - 2})])"
    )


def word_polyhashes_expr(text_col: str, base: int = BASE_A) -> Column:
    """Per-word polynomial hashes of a text column (one char fold per
    word). Stage 1 of the two-level gram hash — project this to a COLUMN
    in its own select and have the gram fold reference it by name;
    embedding it textually inside the gram lambda re-evaluates the whole
    array per gram (O(words²) per doc). Spark keeps the two projections
    un-collapsed; ``.cache()`` is only needed when several downstream
    branches consume the arrays."""
    return F.expr(
        f"transform(split({text_col}, ' '),"
        f" wg_w -> {spark_poly_hash('wg_w', base)})"
    )


def gram_fold64_expr(
    wh1_col: str, wh2_col: str, n: int, distinct: bool = True
) -> Column:
    """Stage 2: distinct ~60-bit word-``n``-gram hashes from two word-hash
    ARRAY COLUMNS (bases 31 and 131): per gram, two ``n``-element integer
    folds (crossed bases) combined as g1 + g2·2^30. O(words·n) per doc —
    far cheaper than char-folding each gram string, and wide enough that
    gram collisions are negligible at corpus scale (a single mod-1e9+7
    hash produces measurable false-positive overlap already at sf0.1).
    Values must be mirrored with ``duck_gram_fold64_expr`` on a DuckDB
    CTE carrying the same two word-hash lists."""
    f1 = (
        f"aggregate(slice({wh1_col}, wg_i, {n}), CAST(0 AS BIGINT),"
        f" (wg_a, wg_x) -> (wg_a * {BASE_B} + wg_x) % {MOD})"
    )
    f2 = (
        f"aggregate(slice({wh2_col}, wg_i, {n}), CAST(0 AS BIGINT),"
        f" (wg_b, wg_y) -> (wg_b * {BASE_A} + wg_y) % {MOD})"
    )
    idx = safe_seq1(f"size({wh1_col}) - {n - 1}")
    inner = (
        f"transform({idx},"
        f" wg_i -> {f1} + {f2} * CAST(1073741824 AS BIGINT))"
    )
    return F.expr(f"array_distinct({inner})" if distinct else inner)


def duck_word_polyhashes_expr(text_col: str, base: int = BASE_A) -> str:
    return (
        f"list_transform(string_split({text_col}, ' '),"
        f" wg_w -> {duck_poly_hash('wg_w', base)})"
    )


def duck_gram_fold64_expr(
    wh1_col: str, wh2_col: str, n: int, distinct: bool = True
) -> str:
    f1 = (
        f"list_reduce(list_prepend(CAST(0 AS BIGINT),"
        f" {wh1_col}[wg_i:wg_i+{n - 1}]),"
        f" (wg_a, wg_x) -> (wg_a * {BASE_B} + wg_x) % {MOD})"
    )
    f2 = (
        f"list_reduce(list_prepend(CAST(0 AS BIGINT),"
        f" {wh2_col}[wg_i:wg_i+{n - 1}]),"
        f" (wg_b, wg_y) -> (wg_b * {BASE_A} + wg_y) % {MOD})"
    )
    inner = (
        f"[{f1} + {f2} * CAST(1073741824 AS BIGINT)"
        f" FOR wg_i IN range(1, len({wh1_col}) - {n - 2})]"
    )
    return f"list_distinct({inner})" if distinct else inner


# ---------------------------------------------------------------------------
# stop-shingle (hot-key) cap for inverted-index joins
# ---------------------------------------------------------------------------
#
# The standard hot-key guardrail for EVERY inverted-index self-join in this
# package (dedup_ngram_jaccard, dedup_shingle_containment, curate_corpus):
# shingles with document frequency > cap (boilerplate, headers, a saturated
# shingle space) are removed from the WHOLE pipeline — index, intersection
# counts, and set sizes — so Jaccard/containment become "over informative
# shingles" and the join's per-key fanout is bounded by cap². Round-7
# measurement of why it exists: the synthetic corpus's 31-word vocabulary
# gives only 31³ possible shingles, so the raw index pair volume is
# quadratic (1.15M → 117M → 11.8G across sf0.1→sf1→sf10; 20+ min uncapped
# vs 24.3 s capped at sf10 — SCALE.md). On a natural 2^60-wide shingle
# space df is ~1 and the index is linear — the cap is the insurance, not
# the default. Import-time env knob (0 = off, the exact default); the
# Spark plan and the DuckDB oracle consume the SAME constant, so a
# non-default cap keeps the differential exact (parity locked at a binding
# cutoff per consumer by tests/test_scale_ops.py).

import os as _os

STOP_SHINGLE_DF = int(_os.environ.get("SPARK_GRAFT_STOPSHINGLE_DF", "0"))
if STOP_SHINGLE_DF < 0:
    raise ValueError(
        f"SPARK_GRAFT_STOPSHINGLE_DF must be >= 0 (0 disables the cap), "
        f"got {STOP_SHINGLE_DF}"
    )


def stop_shingle_filter(ex: DataFrame, cap: int, col: str = "s") -> DataFrame:
    """Drop hot shingles (document frequency > ``cap``) from an exploded
    ``(doc_id, shingle)`` inverted index; identity when ``cap`` is 0.

    The anti-join shuffles on the SAME key as the downstream candidate
    self-join (no new exchange class), and the hot set is at most
    ``total_postings / cap`` rows — never a blind broadcast. Callers that
    consume the capped index more than once (both self-join sides plus the
    size recount) should ``.cache()`` the result.
    """
    if not cap:
        return ex
    hot = (
        ex.groupBy(col)
        .agg(F.count(F.lit(1)).alias("df"))
        .filter(F.col("df") > cap)
        .select(col)
    )
    return ex.join(hot, col, "left_anti")


def capped_sizes(
    sh: DataFrame, ex: DataFrame, cap: int | None = None
) -> DataFrame:
    """Per-doc shingle-set sizes ``(doc_id, n_sh)`` consistent with the
    cap that produced ``ex``: post-cap recount from the (already capped)
    exploded index when the cap binds, else the free ``size(shingles)``
    projection (the shingle arrays are distinct, so both forms agree when
    cap = 0 — the recount shuffle is only paid when the cap is on).

    ``cap`` MUST be the same value that was passed to
    :func:`stop_shingle_filter` for ``ex`` (default: the module knob
    ``STOP_SHINGLE_DF``, matching the registered queries) — sizes counted
    under a different cap silently break Jaccard/containment parity."""
    if cap is None:
        cap = STOP_SHINGLE_DF
    if cap:
        return ex.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_sh"))
    return sh.select("doc_id", F.size("shingles").alias("n_sh"))


def duck_stop_shingle_ctes(cap: int) -> str:
    """DuckDB CTE fragment building the exploded index ``ex (doc_id, s)``
    from a prior CTE ``sh (doc_id, shingles)``, hot-capped when ``cap`` >
    0 — the oracle twin of :func:`stop_shingle_filter`. Splice directly
    into a WITH list (trailing comma included)."""
    if not cap:
        return "ex AS (SELECT doc_id, unnest(shingles) AS s FROM sh),"
    return f"""
    ex0 AS (SELECT doc_id, unnest(shingles) AS s FROM sh),
    hot AS (
        SELECT s FROM ex0 GROUP BY s
        HAVING count(*) > {cap}
    ),
    ex AS (SELECT * FROM ex0 WHERE s NOT IN (SELECT s FROM hot)),
    """


# Post-cap set sizes on the oracle side: counting from ex (rather than
# len(shingles)) is exact in BOTH modes because the shingle arrays are
# distinct — and it is the only correct form when the cap binds.
DUCK_SIZES_CTE = "sz AS (SELECT doc_id, count(*) AS n_sh FROM ex GROUP BY doc_id),"


# ---------------------------------------------------------------------------
# PPJoin candidate pruning (round 13): prefix + length + positional filters
# ---------------------------------------------------------------------------
#
# LOSSLESS candidate pruning for the inverted-index similarity joins
# (Xiao et al. WWW'08, the same filter family setsim_prefix_jaccard_join
# carries since round 7). The shingle arrays from gram_set_frame are
# sorted-DISTINCT int64 hashes, so ascending hash value IS a global total
# order — the prefix of a set is simply its first k array slots, no
# document-frequency ranking pass needed. All three filters only ever
# ADMIT extra candidates at float boundaries (the 1e-9 slack matches
# setsim's), never drop a qualifying pair; the exact verify downstream
# (array_intersect on the full sorted sets) makes results bit-identical
# to the full inverted-index join + filter they replace. The DuckDB
# oracles stay on the unpruned form — an INDEPENDENT path to the same
# rows, which the differential checks end-to-end.


def ppjoin_jaccard_pairs(sh: DataFrame, tau: float) -> DataFrame:
    """Exact-verified candidate pairs for a Jaccard >= ``tau`` self-join.

    Input ``sh``: (doc_id, shingles) with sorted-distinct int64 arrays
    (:func:`gram_set_frame` output; caller should ``.cache()`` it — both
    the prefix index and the verify stage read it).

    Output: (doc_a, doc_b, n_inter, na, nb) with doc_a < doc_b — a
    SUPERSET of the pairs with Jaccard >= tau (callers re-apply the exact
    threshold), with exact intersection counts and set sizes. Pairs the
    prefix filter proves sub-threshold are never generated, which is the
    point: the candidate join enumerates only prefix-postings² per key
    instead of postings² (guide §2.3/§3 — shuffle and join fewer rows).

    Filter soundness (α = the overlap any Jaccard >= tau pair must have):
    - prefix: |A∩B| >= α forces a common element among the first
      |X| − α + 1 of each side (take the α-th largest common element);
      with the weakest eligible partner α >= ceil(tau·|X|), so indexing
      the first |X| − ceil(tau·|X|) + 1 slots per doc is enough.
    - length: |A∩B| <= min forces tau·|a| <= |b| <= |a|/tau.
    - positional: a common prefix element at ranks (ra, rb) bounds the
      overlap by 1 + min(|a|−ra, |b|−rb), which must reach
      tau/(1+tau)·(|a|+|b|).
    """
    n_sh = F.size("shingles")
    # ceil over the float product with an ADMIT-ONLY slack: if tau*n lands
    # an ulp above an exact integer boundary, the unguarded ceil would
    # SHORTEN the prefix (a lossy direction); subtracting 1e-9 can only
    # lengthen it by one slot at exact boundaries (verified no-op for
    # the registered taus up to n=1e5, kept for any-tau safety)
    plen = (
        n_sh - F.ceil(F.lit(tau) * n_sh - 1e-9).cast("long") + 1
    ).cast("int")
    pref = sh.select(
        "doc_id",
        n_sh.alias("n_sh"),
        F.posexplode(F.slice("shingles", F.lit(1), plen)).alias("pos0", "s"),
    ).select("doc_id", "n_sh", (F.col("pos0") + 1).alias("rn"), "s")
    cand = (
        pref.alias("a")
        .join(
            pref.alias("b"),
            (F.col("a.s") == F.col("b.s"))
            & (F.col("a.doc_id") < F.col("b.doc_id"))
            & (F.col("b.n_sh") >= tau * F.col("a.n_sh") - 1e-9)
            & (F.col("b.n_sh") <= F.col("a.n_sh") / tau + 1e-9)
            & (
                1
                + F.least(
                    F.col("a.n_sh") - F.col("a.rn"),
                    F.col("b.n_sh") - F.col("b.rn"),
                )
                >= tau / (1 + tau) * (F.col("a.n_sh") + F.col("b.n_sh")) - 1e-9
            ),
        )
        .select(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .distinct()
    )
    return _exact_pair_verify(cand, sh)


def ppjoin_containment_pairs(sh: DataFrame, tau: float) -> DataFrame:
    """Exact-verified candidate pairs for a CONTAINMENT >= ``tau``
    self-join (|A∩B| / min(|A|,|B|) >= tau). Same contract as
    :func:`ppjoin_jaccard_pairs` (superset of qualifying pairs, exact
    n_inter/na/nb), different pruning: containment has NO length filter
    (a tiny doc fully inside a huge one qualifies), so the join is
    ASYMMETRIC — the full posting index probes only the prefix index of
    the pair's (weakly) smaller side.

    Soundness: for a qualifying pair the required overlap is
    α = ceil(tau·n_small); the α-th largest common element sits within
    the first n_small − α + 1 slots of the smaller side (the static
    prefix below) and within the first n_large − α + 1 slots of the
    larger (checked positionally in the join — it depends on the
    partner's size, so it cannot prune the index statically).
    """
    n_sh = F.size("shingles")
    # ceil over the float product with an ADMIT-ONLY slack: if tau*n lands
    # an ulp above an exact integer boundary, the unguarded ceil would
    # SHORTEN the prefix (a lossy direction); subtracting 1e-9 can only
    # lengthen it by one slot at exact boundaries (verified no-op for
    # the registered taus up to n=1e5, kept for any-tau safety)
    plen = (
        n_sh - F.ceil(F.lit(tau) * n_sh - 1e-9).cast("long") + 1
    ).cast("int")
    pref = sh.select(
        F.col("doc_id").alias("doc_s"),
        n_sh.alias("n_s"),
        F.posexplode(F.slice("shingles", F.lit(1), plen)).alias("pos0", "s"),
    ).select("doc_s", "n_s", (F.col("pos0") + 1).alias("rn_s"), "s")
    full = sh.select(
        F.col("doc_id").alias("doc_l"),
        n_sh.alias("n_l"),
        F.posexplode("shingles").alias("pos0", "s"),
    ).select("doc_l", "n_l", (F.col("pos0") + 1).alias("rn_l"), "s")
    cand = (
        full.alias("l")
        .join(
            pref.alias("p"),
            (F.col("l.s") == F.col("p.s"))
            & (F.col("l.doc_l") != F.col("p.doc_s"))
            & (F.col("l.n_l") >= F.col("p.n_s"))
            & (
                1
                + F.least(
                    F.col("p.n_s") - F.col("p.rn_s"),
                    F.col("l.n_l") - F.col("l.rn_l"),
                )
                >= tau * F.col("p.n_s") - 1e-9
            ),
        )
        .select(
            F.least("doc_l", "doc_s").alias("doc_a"),
            F.greatest("doc_l", "doc_s").alias("doc_b"),
        )
        .distinct()
    )
    return _exact_pair_verify(cand, sh)


def _exact_pair_verify(cand: DataFrame, sh: DataFrame) -> DataFrame:
    """Attach exact |A∩B| and set sizes to candidate pairs by rejoining
    the full sorted-distinct shingle arrays (the verify stage of every
    PPJoin-family plan). array_intersect over distinct arrays counts
    exactly what the unpruned index join's count(*) counted."""
    x = sh.select(F.col("doc_id").alias("doc_a"), F.col("shingles").alias("sh_a"))
    y = sh.select(F.col("doc_id").alias("doc_b"), F.col("shingles").alias("sh_b"))
    return (
        cand.join(x, "doc_a")
        .join(y, "doc_b")
        .select(
            "doc_a",
            "doc_b",
            F.size(F.array_intersect("sh_a", "sh_b")).cast("long").alias("n_inter"),
            F.size("sh_a").cast("long").alias("na"),
            F.size("sh_b").cast("long").alias("nb"),
        )
    )


def shingle_hashes_expr(shingles_col: str) -> Column:
    """Distinct polynomial hashes of a shingle-array column (Spark)."""
    return F.expr(
        f"array_distinct(transform({shingles_col}, sh_s -> {spark_poly_hash('sh_s')}))"
    )


def duck_shingle_hashes_expr(shingles_col: str) -> str:
    return (
        f"list_distinct(list_transform({shingles_col}, sh_s -> {duck_poly_hash('sh_s')}))"
    )


# ---------------------------------------------------------------------------
# MinHash signatures + LSH banding
# ---------------------------------------------------------------------------


def minhash_sig_expr(hashes_col: str, num_hashes: int) -> Column:
    """MinHash signature: sig[k] = min over shingle hashes of
    (a_k*(x mod P) + b_k) mod P. One array expression, one pass.

    The inner ``mod P`` admits ~60-bit inputs (the two-level gram hashes):
    a_k < P ~ 2^30, so a_k*x needs x < 2^33 to stay in int64 — DuckDB
    ERRORS on int64 overflow rather than wrapping, so the reduction is
    mandatory, and it must be mirrored in the oracle. Reduction collisions
    only perturb which element wins a min (identically on both engines);
    the verify step still compares full-width hash sets."""
    mins = ", ".join(
        f"array_min(transform({hashes_col}, mh_x -> ({a} * (mh_x % {MOD}) + {b}) % {MOD}))"
        for a, b in hash_params(num_hashes)
    )
    return F.expr(f"array({mins})")


def duck_minhash_sig_expr(hashes_col: str, num_hashes: int) -> str:
    mins = ", ".join(
        f"list_min(list_transform({hashes_col}, mh_x -> ({a} * (mh_x % {MOD}) + {b}) % {MOD}))"
        for a, b in hash_params(num_hashes)
    )
    return f"[{mins}]"


def band_structs_expr(sig_col: str, bands: int, rows: int) -> Column:
    """Explodable array of (band, band_key) — LSH bucketing of a signature."""
    return F.expr(
        f"transform(sequence(0, {bands - 1}),"
        f" lb_b -> struct(lb_b AS band,"
        f" concat_ws(',', slice({sig_col}, lb_b * {rows} + 1, {rows})) AS bkey))"
    )


def duck_band_select(sig_col: str, bands: int, rows: int) -> str:
    """DuckDB fragment: per-row list of {band, bkey} structs to unnest."""
    return (
        f"[{{'band': lb_b, 'bkey': array_to_string("
        f"{sig_col}[lb_b * {rows} + 1 : lb_b * {rows} + {rows}], ',')}}"
        f" FOR lb_b IN range(0, {bands})]"
    )


def duck_capped_cand_ctes(id_col: str, max_bucket: int) -> str:
    """DuckDB CTE fragment producing capped candidate pairs from a
    ``bands`` CTE with columns (id_col, band, bkey) — the bit-exact twin
    of ``lsh_candidate_pairs(..., max_bucket=...)``: clique pairs for
    buckets at or under the cap, id-ordered chain pairs above it. The
    a.bw predicate suffices — both sides of a bucket join share one bw."""
    return f"""
    sized AS (
        SELECT {id_col}, band, bkey,
               count(*) OVER (PARTITION BY band, bkey) AS bw,
               lead({id_col}) OVER (PARTITION BY band, bkey
                                    ORDER BY {id_col}) AS nxt
        FROM bands
    ),
    cand AS (
        SELECT DISTINCT doc_a, doc_b FROM (
            SELECT a.{id_col} AS doc_a, b.{id_col} AS doc_b
            FROM sized a
            JOIN sized b ON a.band = b.band AND a.bkey = b.bkey
                        AND a.{id_col} < b.{id_col}
            WHERE a.bw <= {max_bucket}
            UNION ALL
            SELECT {id_col} AS doc_a, nxt AS doc_b
            FROM sized
            WHERE bw > {max_bucket} AND nxt IS NOT NULL
        )
    )"""


def lsh_candidate_pairs(
    with_sig: DataFrame,
    id_col: str,
    sig_col: str,
    bands: int,
    rows: int,
    max_bucket: int | None = None,
) -> DataFrame:
    """Distinct candidate pairs (id_a < id_b) sharing any LSH band bucket.

    Shuffle key is (band, bkey): at scale this is an inverted-index
    self-join over buckets — cost proportional to bucket collisions, never
    all-pairs.

    ``max_bucket`` (round 11) is the occupancy cap for that residual cost:
    on duplicate-heavy / saturated-vocabulary corpora bucket occupancy
    grows with corpus size and the self-join's Σ n² goes superlinear
    (measured: the sf100 synthetic fixture's 31-word vocabulary drove the
    uncapped batch path to 604 s — SCALE.md round 10). With a cap, buckets
    wider than ``max_bucket`` switch from the O(n²) clique to an O(n)
    CHAIN — consecutive members in id order — which preserves candidate
    CONNECTIVITY (transitive cluster resolution still unites the bucket;
    hot buckets are near-identical docs, so chain neighbors verify like
    any other pair) while bounding per-bucket work. Pair-level recall
    inside a hot bucket is deliberately traded away: downstream consumers
    are cluster-level (resolve → canonical keep-list), and a verify stage
    keyed on exact similarity re-checks every emitted pair anyway. The
    precedent is the stop-shingle df cap (round 7); like there, the capped
    semantics are deterministic and mirrored bit-for-bit in the DuckDB
    oracle (``duck_capped_cand_ctes``).
    """
    # explode_outer + null-filter, not explode: InferFiltersFromGenerate
    # would synthesize size(bands)>0 below the projection and re-evaluate
    # the band-key construction per row in an interpreted Filter. The band
    # array has a constant `bands` entries, never empty/null.
    bucketed = (
        with_sig.select(
            F.col(id_col),
            F.explode_outer(band_structs_expr(sig_col, bands, rows)).alias("bb"),
        )
        .filter(F.col("bb").isNotNull())
        .select(id_col, "bb.band", "bb.bkey")
    )
    if max_bucket is None:
        a = bucketed.alias("a")
        b = bucketed.alias("b")
        return (
            a.join(
                b,
                (F.col("a.band") == F.col("b.band"))
                & (F.col("a.bkey") == F.col("b.bkey"))
                & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
            )
            .select(
                F.col(f"a.{id_col}").alias("id_a"),
                F.col(f"b.{id_col}").alias("id_b"),
            )
            .distinct()
        )
    from pyspark.sql import Window

    # one window pass adds occupancy + chain successor per bucket entry;
    # its (band, bkey) shuffle is the same exchange the self-join needs,
    # so the cap costs a per-partition sort, not an extra shuffle
    w = Window.partitionBy("band", "bkey")
    sized = bucketed.select(
        F.col(id_col),
        "band",
        "bkey",
        F.count(F.lit(1)).over(w).alias("bw"),
        F.lead(id_col).over(w.orderBy(id_col)).alias("nxt"),
    )
    a = sized.filter(F.col("bw") <= max_bucket).alias("a")
    b = sized.filter(F.col("bw") <= max_bucket).alias("b")
    clique = a.join(
        b,
        (F.col("a.band") == F.col("b.band"))
        & (F.col("a.bkey") == F.col("b.bkey"))
        & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
    ).select(
        F.col(f"a.{id_col}").alias("id_a"),
        F.col(f"b.{id_col}").alias("id_b"),
    )
    chain = (
        sized.filter((F.col("bw") > max_bucket) & F.col("nxt").isNotNull())
        .select(F.col(id_col).alias("id_a"), F.col("nxt").alias("id_b"))
    )
    return clique.unionByName(chain).distinct()


def lsh_candidate_pairs_vs(
    probe: DataFrame,
    base: DataFrame,
    id_col: str,
    sig_col: str,
    bands: int,
    rows: int,
) -> DataFrame:
    """Cross-set LSH candidates: (probe_id, base_id) pairs sharing any
    band bucket — the INCREMENTAL dedup shape (today's ingest batch vs the
    accumulated corpus).

    Never generates probe-probe or base-base pairs, so a small batch pays
    bucket-join cost proportional to ITS collisions, not the corpus's
    self-collisions — the property that makes daily dedup of a 100 TB
    corpus affordable. In production the base side's bucket index is
    computed once and PERSISTED (written bucketed on (band, bkey));
    each batch recomputes signatures only for its own documents and
    equi-joins into the standing index.
    """

    def bucketize(df: DataFrame, out: str) -> DataFrame:
        return (
            df.select(
                F.col(id_col),
                F.explode(
                    band_structs_expr(sig_col, bands, rows)
                ).alias("bb"),
            )
            .select(F.col(id_col).alias(out), "bb.band", "bb.bkey")
        )

    p = bucketize(probe, "probe_id")
    b = bucketize(base, "base_id")
    return p.join(b, ["band", "bkey"]).select("probe_id", "base_id").distinct()


# ---------------------------------------------------------------------------
# SimHash
# ---------------------------------------------------------------------------

SIMHASH_BITS = 60  # 2x30-bit polynomial hashes combined (functions/hashing)


def word_hashes_expr(text_col: str) -> Column:
    """Per-word 60-bit hashes (multiset — repeated words weight the
    SimHash). Materialize this once; the SimHash fold reuses it 60×."""
    return F.expr(f"transform(split({text_col}, ' '), sh_w -> {spark_hash64('sh_w')})")


def duck_word_hashes_expr(text_col: str) -> str:
    return f"list_transform(string_split({text_col}, ' '), sh_w -> {duck_hash64('sh_w')})"


def simhash_expr(hashes_col: str) -> Column:
    """60-bit SimHash from a word-hash array column: bit j set iff the sum
    over words of ±1 (sign of hash bit j) is positive.

    Single fold over the hash array carrying a 60-wide count vector — the
    hash array expression appears exactly ONCE, so Catalyst's project
    collapse cannot duplicate the (expensive) per-word hashing into a
    per-bit loop. Per-doc compute, no shuffle, no UDF.
    """
    counts = (
        f"aggregate({hashes_col},"
        f" array_repeat(CAST(0 AS BIGINT), {SIMHASH_BITS}),"
        f" (sb_acc, sb_h) -> zip_with(sb_acc, sequence(0, {SIMHASH_BITS - 1}),"
        f" (sb_c, sb_j) -> sb_c + 2 * (shiftright(sb_h, sb_j) & 1) - 1))"
    )
    return F.expr(
        f"aggregate(zip_with({counts}, sequence(0, {SIMHASH_BITS - 1}),"
        f" (sb_c, sb_j) -> IF(sb_c > 0, shiftleft(CAST(1 AS BIGINT), sb_j),"
        f" CAST(0 AS BIGINT))),"
        f" CAST(0 AS BIGINT), (sb_a, sb_x) -> sb_a + sb_x)"
    )


def duck_simhash_expr(hashes_col: str) -> str:
    """DuckDB mirror of :func:`simhash_expr`. Uses the simple per-bit
    recompute formulation (DuckDB's list_reduce lacks a typed initial
    accumulator for the count-vector fold) — identical bits, and the
    oracle only ever runs at correctness scale where cost is irrelevant."""
    return (
        f"list_reduce(list_prepend(CAST(0 AS BIGINT),"
        f" [CASE WHEN list_sum(list_transform({hashes_col},"
        f" sb_h -> 2 * ((sb_h >> sb_j) & 1) - 1)) > 0"
        f" THEN (CAST(1 AS BIGINT) << sb_j) ELSE CAST(0 AS BIGINT) END"
        f" FOR sb_j IN range(0, {SIMHASH_BITS})]),"
        f" (sb_a, sb_x) -> sb_a + sb_x)"
    )


# Chunk count: candidates are doc pairs sharing any (chunk_idx, value)
# block, so bucket space per chunk is 2^(SIMHASH_BITS/chunks) and the
# within-bucket pair volume at a FIXED chunk count is quadratic — the
# round-7 sf0.1→sf1→sf10 sweep measured 2.6k → 260k → 26M chunk pairs
# (102× per 10× docs) at the default 4×15-bit chunking. FEWER, WIDER
# chunks cool the buckets exponentially (3 chunks → 20-bit blocks →
# 32× more buckets) at a recall cost (a true pair needs one flip-free
# chunk); import-time env knob mirroring SPARK_GRAFT_SEMDEDUP_K /
# _LSH_PLANES — plan and oracle read the same constant, so a
# non-default setting keeps the differential exact (locked by
# tests/test_scale_ops.py::test_simhash_chunks_knob_keeps_oracle_parity).
SIMHASH_CHUNKS = int(_os.environ.get("SPARK_GRAFT_SIMHASH_CHUNKS", "4"))
# Validated at import (fail loudly, not at plan-build): 0 would divide by
# zero below; chunks > SIMHASH_BITS makes _CHUNK_BITS = 0 so every chunk
# value is 0 and the blocking join silently degenerates to a full
# within-chunk cross product; a non-divisor silently drops the high-order
# SIMHASH_BITS % chunks bits from blocking (weaker pruning than the
# setting implies).
if not (1 <= SIMHASH_CHUNKS <= SIMHASH_BITS) or SIMHASH_BITS % SIMHASH_CHUNKS:
    raise ValueError(
        f"SPARK_GRAFT_SIMHASH_CHUNKS must be a divisor of {SIMHASH_BITS} "
        f"in [1, {SIMHASH_BITS}], got {SIMHASH_CHUNKS}"
    )
_CHUNK_BITS = SIMHASH_BITS // SIMHASH_CHUNKS  # 15 at the default


def simhash_chunks_expr(sim_col: str) -> Column:
    """Explodable (chunk_idx, chunk_val) blocks: two signatures within
    hamming distance < SIMHASH_CHUNKS must share at least one chunk."""
    return F.expr(
        f"transform(sequence(0, {SIMHASH_CHUNKS - 1}),"
        f" sc_c -> struct(sc_c AS chunk,"
        f" shiftright({sim_col}, sc_c * {_CHUNK_BITS}) & {2**_CHUNK_BITS - 1} AS cval))"
    )


def duck_simhash_chunks(sim_col: str) -> str:
    return (
        f"[{{'chunk': sc_c, 'cval': ({sim_col} >> (sc_c * {_CHUNK_BITS}))"
        f" & {2**_CHUNK_BITS - 1}}} FOR sc_c IN range(0, {SIMHASH_CHUNKS})]"
    )


# ---------------------------------------------------------------------------
# Arrow-vectorized gram-hash + MinHash signature kernel (round 12)
# ---------------------------------------------------------------------------
#
# Round 10-11 characterized a session-level bimodality in the minhash
# family: identical code, identical plans, tight within-session timing
# triplets — but ~40-50% of fresh sessions ran the whole family ~5x
# slower (fast ~1.0 s vs slow ~3.9 s at sf0.1), surviving codegen-cache,
# storage, GC and JIT-code-cache rule-outs. The remaining mechanism is
# HotSpot profile pollution of the INTERPRETED higher-order-function
# kernels: the per-doc signature math (transform/aggregate/array_min
# lambdas over ~60-bit integers) sits outside whole-stage codegen, and
# which megamorphic call-site profile those shared lambda frames JIT
# into depends on unrelated earlier queries — per-session, not per-plan.
# The structural fix is the round-6 ``pairwise_cosine_matrix`` precedent:
# move the arithmetic to a blocked numpy kernel behind ``mapInPandas`` —
# same integers bit-for-bit, Arrow-batched, immune to interpreter profile
# state because numpy's loops are compiled C.


def _make_gram_doc_kernel():
    # Factory indirection ON PURPOSE (pairwise_cosine_matrix precedent):
    # the returned function pickles BY VALUE, so the Python workers of a
    # foreign-cwd driver that cannot import this package still run it.
    def gram_doc_batch(
        doc_ids, texts, n, params, base_a, base_b, mod,
        want_sim=False, keep_empty=False, sim_bits=60,
    ):
        """One Arrow batch: doc texts -> (ids, gram-hash arrays, MinHash
        signatures[, SimHash]), with the EXACT integer semantics of the
        SQL twins ``word_polyhashes_expr`` + ``gram_fold64_expr`` +
        ``minhash_sig_expr`` + ``simhash_expr`` (verified bit-identical
        by tests/test_dup_heavy_skew.py::test_minhash_kernel_matches_hof
        and ::test_simhash_kernel_matches_hof):

        - words = text.split(' ') keeping empty tokens (Spark split with
          a literal-space pattern keeps them; an empty token hashes to
          the fold seed 0, like ascii('') = 0);
        - per-word polynomial char-code fold (acc*base + codepoint) % mod
          for bases ``base_a``/``base_b`` — numpy fold over the padded
          UCS-4 codepoint matrix, masked by word length;
        - per-gram two-base fold over ``n`` consecutive word hashes,
          combined g1 + g2 * 2^30 (int64-safe: each fold < 2^30);
        - sig[k] = min over grams of (a_k*(g % mod) + b_k) % mod —
          duplicates don't move a min, so the distinct step the SQL twin
          applies before signing is skipped here (``params`` empty skips
          the signature entirely);
        - with ``want_sim``, a {sim_bits}-bit SimHash over the DISTINCT
          gram set (bit j set iff Σ ±1 over grams' bit j is > 0) —
          exactly ``simhash_expr`` over ``gram_fold64_expr``'s
          (distinct) output;
        - docs with fewer than ``n`` words have no grams and are DROPPED
          (the callers' mirrored ``len(hs) > 0`` filter) — unless
          ``keep_empty``, which emits them with hs = [], sig = [] and
          sim = 0, matching the HOF/oracle semantics where an aggregate
          over an empty gram array folds to an all-zero signature (the
          SimHash consumers keep such docs: they block in bucket 0).

        Returns (ids list, hs list of int64 arrays (sorted distinct),
        sigs list of int64 arrays, sims list of ints). The hs arrays are
        SORTED distinct grams, not the SQL twin's first-occurrence order
        — every consumer treats hs as a set (array_intersect sizes), so
        only membership is contractual. SimHash is order-independent
        (a ± count per bit over a set).
        """
        import numpy as np

        ids_out: list = []
        hs_out: list = []
        sig_out: list = []
        sim_out: list = []
        ids_np = np.asarray(doc_ids)
        empty_sig = [] if params is not None else None

        def emit_empties(live):
            # keep_empty: docs that produced no grams still surface,
            # with the empty-fold values of the SQL twins
            if not keep_empty:
                return
            for i in range(len(ids_np)):
                if i not in live:
                    ids_out.append(int(ids_np[i]))
                    hs_out.append([])
                    sig_out.append(empty_sig)
                    sim_out.append(0)

        # words per doc, flattened; split(' ') keeps empties end-to-end
        words_per_doc = [t.split(" ") for t in texts]
        counts = np.fromiter(
            (len(w) for w in words_per_doc), dtype=np.int64,
            count=len(words_per_doc),
        )
        flat_words = [w for ws in words_per_doc for w in ws]
        if not flat_words:
            emit_empties(set())
            return ids_out, hs_out, sig_out, sim_out
        arr = np.array(flat_words, dtype="U")
        width = arr.dtype.itemsize // 4
        if width == 0:  # every word empty -> every hash is the seed 0
            wh1 = np.zeros(len(flat_words), dtype=np.int64)
            wh2 = np.zeros(len(flat_words), dtype=np.int64)
        else:
            cp = arr.view(np.uint32).reshape(len(flat_words), width)
            cp = cp.astype(np.int64)
            # true lengths (not last-nonzero): an embedded U+0000 both
            # counts toward length and folds as code 0, exactly like the
            # SQL twin's length()/ascii()
            lengths = np.char.str_len(arr).astype(np.int64)
            wh1 = np.zeros(len(flat_words), dtype=np.int64)
            wh2 = np.zeros(len(flat_words), dtype=np.int64)
            for j in range(width):
                live = j < lengths
                c = cp[:, j]
                wh1 = np.where(live, (wh1 * base_a + c) % mod, wh1)
                wh2 = np.where(live, (wh2 * base_b + c) % mod, wh2)

        # gram fold over n consecutive word hashes, windows that stay
        # inside one doc (flat layout is doc-contiguous)
        total = len(flat_words)
        if total < n:
            emit_empties(set())
            return ids_out, hs_out, sig_out, sim_out
        doc_of = np.repeat(np.arange(len(counts)), counts)
        f1 = np.zeros(total - n + 1, dtype=np.int64)
        f2 = np.zeros(total - n + 1, dtype=np.int64)
        for j in range(n):
            f1 = (f1 * base_b + wh1[j : total - n + 1 + j]) % mod
            f2 = (f2 * base_a + wh2[j : total - n + 1 + j]) % mod
        valid = doc_of[: total - n + 1] == doc_of[n - 1 :]
        grams = f1[valid] + f2[valid] * np.int64(1 << 30)
        gdoc = doc_of[: total - n + 1][valid]
        if grams.size == 0:
            emit_empties(set())
            return ids_out, hs_out, sig_out, sim_out

        # per-doc signature mins via reduceat on the doc-contiguous gram
        # layout; per-doc sorted-distinct hs via one lexsort
        starts = np.flatnonzero(np.r_[True, gdoc[1:] != gdoc[:-1]])
        live_docs = gdoc[starts]
        if params:
            g_red = grams % mod
            sig_mat = np.empty((len(params), len(starts)), dtype=np.int64)
            for k, (a, b) in enumerate(params):
                hk = (a * g_red + b) % mod
                sig_mat[k] = np.minimum.reduceat(hk, starts)
        order = np.lexsort((grams, gdoc))
        gs, ds = grams[order], gdoc[order]
        keep = np.r_[True, (gs[1:] != gs[:-1]) | (ds[1:] != ds[:-1])]
        gs, ds = gs[keep], ds[keep]
        hstarts = np.flatnonzero(np.r_[True, ds[1:] != ds[:-1]])
        bounds = np.r_[hstarts, gs.size]
        if want_sim:
            # SimHash over the distinct gram set: per bit j, count the
            # ±1 votes per doc (reduceat over the doc-contiguous distinct
            # layout); bit set iff the count is positive. Integer-exact,
            # order-independent — identical to simhash_expr's fold.
            # Per-BIT loop on purpose: Σ(2b−1) = 2Σb − n_grams, so each
            # bit needs one G-length shift/mask + one reduceat — G int64s
            # of working memory instead of a (G × bits) votes matrix
            # (which at 10× scale was ~400 MB per Arrow batch per worker
            # and dominated the kernel's runtime with allocation).
            cnt = np.diff(np.r_[hstarts, ds.size])
            sims = np.zeros(len(hstarts), dtype=np.int64)
            for j in range(sim_bits):
                b = (gs >> j) & 1
                pos = 2 * np.add.reduceat(b, hstarts) - cnt > 0
                sims += pos.astype(np.int64) << j
        for i, d in enumerate(live_docs):
            ids_out.append(int(ids_np[d]))
            # Python-list boundary: Arrow's pandas converter rejects
            # ndarray-valued object columns (NumPyConverter list<int64>)
            hs_out.append(gs[bounds[i] : bounds[i + 1]].tolist())
            sig_out.append(sig_mat[:, i].tolist() if params else empty_sig)
            sim_out.append(int(sims[i]) if want_sim else 0)
        emit_empties(set(int(d) for d in live_docs))
        return ids_out, hs_out, sig_out, sim_out

    return gram_doc_batch


gram_doc_batch = _make_gram_doc_kernel()


def _make_minhash_doc_kernel():
    # Back-compat wrapper: the original 3-output minhash kernel shape,
    # now delegating to the generalized gram kernel (same factory
    # by-value-pickling rationale).
    general = gram_doc_batch

    def minhash_doc_batch(doc_ids, texts, n, params, base_a, base_b, mod):
        ids, hs, sigs, _ = general(
            doc_ids, texts, n, params, base_a, base_b, mod
        )
        return ids, hs, sigs

    return minhash_doc_batch


minhash_doc_batch = _make_minhash_doc_kernel()


def minhash_gram_sig_frame(
    docs: DataFrame, n: int, num_hashes: int
) -> DataFrame:
    """(doc_id, hs, sig) for every doc with at least ``n`` words — the
    Arrow/numpy twin of the HOF pipeline word_polyhashes -> gram_fold64
    -> minhash_sig, one ``mapInPandas`` pass, no shuffle (see the kernel
    docstring for the exact-semantics contract and the bimodality
    rationale above). ``docs`` must carry non-NULL ``doc_id``/``text``.
    """
    kernel = minhash_doc_batch
    params = hash_params(num_hashes)
    ba, bb, mod = BASE_A, BASE_B, MOD
    gram_n = n

    def run(batches):
        import pandas as pd

        for pdf in batches:
            ids, hs, sigs = kernel(
                pdf["doc_id"].values, pdf["text"].tolist(),
                gram_n, params, ba, bb, mod,
            )
            # explicit dtypes: an empty batch (every doc under n words)
            # otherwise infers float64 columns, which Arrow cannot cast
            # to list<int64>
            yield pd.DataFrame(
                {
                    "doc_id": pd.Series(ids, dtype="int64"),
                    "hs": pd.Series(hs, dtype="object"),
                    "sig": pd.Series(sigs, dtype="object"),
                }
            )

    return docs.select("doc_id", "text").mapInPandas(
        run, schema="doc_id long, hs array<long>, sig array<long>"
    )


def _make_word_level_kernel():
    # Factory indirection ON PURPOSE (same by-value pickling rationale as
    # the gram kernel): a foreign-cwd driver's Python workers cannot
    # import this package.
    def word_level_batch(texts, base, mod, buckets, mode, w_mod, w_off):
        """Word-level hashed features for one Arrow batch, over the
        NON-EMPTY word list (``filter(split(text,' '), w -> w <> '')`` /
        the post-explode ``term != ''`` filter — both SQL twins hash the
        same multiset), with the exact per-word polynomial char fold of
        ``spark_poly_hash``:

        - mode 'tf': per-doc unigram term frequencies of
          ``hash % buckets`` -> (doc_idx, bucket, tf) arrays;
        - mode 'bigram_tf': per-doc ADJACENT-pair frequencies of the
          bucketed hashes (pairs within the filtered word list, exactly
          ``transform(words, hash % buckets)`` zipped with its tail) ->
          (doc_idx, b1, b2, tf);
        - mode 'score': per-doc (n_words, Σ (hash % w_mod) - w_off) ->
          the fastText-style linear quality scorer; docs with zero
          non-empty words fold to (0, 0) like the SQL empty aggregate.

        All arithmetic is int64, bit-identical to the HOF twins (locked
        by tests/test_selection.py::test_word_level_kernel_matches_hof).
        """
        import numpy as np

        words_per_doc = [
            [w for w in t.split(" ") if w] for t in texts
        ]
        counts = np.fromiter(
            (len(w) for w in words_per_doc), dtype=np.int64,
            count=len(words_per_doc),
        )
        flat_words = [w for ws in words_per_doc for w in ws]
        n_docs = len(texts)
        if mode == "score":
            n_out = np.zeros(n_docs, dtype=np.int64)
            s_out = np.zeros(n_docs, dtype=np.int64)
        if not flat_words:
            if mode == "score":
                return n_out, s_out
            return (np.empty(0, np.int64),) * (4 if mode == "bigram_tf" else 3)
        arr = np.array(flat_words, dtype="U")
        width = arr.dtype.itemsize // 4
        cp = arr.view(np.uint32).reshape(len(flat_words), width).astype(np.int64)
        lengths = np.char.str_len(arr).astype(np.int64)
        wh = np.zeros(len(flat_words), dtype=np.int64)
        for j in range(width):
            live = j < lengths
            wh = np.where(live, (wh * base + cp[:, j]) % mod, wh)
        doc_of = np.repeat(np.arange(n_docs), counts)
        if mode == "score":
            w = (wh % w_mod) - w_off
            np.add.at(s_out, doc_of, w)
            n_out = counts
            return n_out, s_out
        hb = wh % buckets
        if mode == "tf":
            order = np.lexsort((hb, doc_of))
            d, b = doc_of[order], hb[order]
            new = np.r_[True, (d[1:] != d[:-1]) | (b[1:] != b[:-1])]
            starts = np.flatnonzero(new)
            tf = np.diff(np.r_[starts, len(d)])
            return d[starts], b[starts], tf
        # bigram_tf: adjacent pairs that stay inside one doc
        total = len(flat_words)
        if total < 2:
            return (np.empty(0, np.int64),) * 4
        same = doc_of[:-1] == doc_of[1:]
        b1 = hb[:-1][same]
        b2 = hb[1:][same]
        d = doc_of[:-1][same]
        if d.size == 0:
            return (np.empty(0, np.int64),) * 4
        order = np.lexsort((b2, b1, d))
        d, b1, b2 = d[order], b1[order], b2[order]
        new = np.r_[
            True,
            (d[1:] != d[:-1]) | (b1[1:] != b1[:-1]) | (b2[1:] != b2[:-1]),
        ]
        starts = np.flatnonzero(new)
        tf = np.diff(np.r_[starts, d.size])
        return d[starts], b1[starts], b2[starts], tf

    return word_level_batch


word_level_batch = _make_word_level_kernel()


def word_bucket_tf_frame(
    docs: DataFrame, buckets: int, keep: tuple[str, ...] = ()
) -> DataFrame:
    """(doc_id, *keep, bucket, tf) — hashed-unigram term frequencies over
    non-empty words, the Arrow twin of
    ``explode(split) -> filter('' ) -> poly_hash % buckets -> groupBy
    count`` (same integers; parity-locked). The per-doc tf aggregation
    happens IN the kernel (a doc's words sit in one batch row), so the
    explode and the (doc, bucket) shuffle disappear outright — the
    consumer's LM rollup is the first exchange. ``keep`` columns are
    doc-level passthroughs (e.g. lang)."""
    kernel = word_level_batch
    ba, mod = BASE_A, MOD
    cols = ("doc_id", *keep)

    def run(batches):
        import numpy as np
        import pandas as pd

        for pdf in batches:
            d, b, tf = kernel(
                pdf["text"].tolist(), ba, mod, buckets, "tf", 0, 0
            )
            out = {
                c: pdf[c].to_numpy()[d] if len(d) else
                pd.Series([], dtype=pdf[c].dtype)
                for c in cols
            }
            out["bucket"] = pd.Series(b, dtype="int64")
            out["tf"] = pd.Series(tf, dtype="int64")
            yield pd.DataFrame(out)

    keep_schema = "".join(f", {c} string" for c in keep)
    return docs.select(*cols, "text").mapInPandas(
        run, schema=f"doc_id long{keep_schema}, bucket long, tf long"
    )


def bigram_bucket_tf_frame(docs: DataFrame, buckets: int) -> DataFrame:
    """(doc_id, b1, b2, tf) — adjacent-pair frequencies of bucketed word
    hashes over non-empty words: the Arrow twin of the bigram LM's
    ``transform(words, hash % buckets)`` + adjacent-pair explode +
    (doc, b1, b2) groupBy, with the tf aggregation in-kernel (no explode,
    no per-token shuffle). Parity-locked with the HOF form."""
    kernel = word_level_batch
    ba, mod = BASE_A, MOD

    def run(batches):
        import numpy as np
        import pandas as pd

        for pdf in batches:
            d, b1, b2, tf = kernel(
                pdf["text"].tolist(), ba, mod, buckets, "bigram_tf", 0, 0
            )
            ids = pdf["doc_id"].to_numpy()
            yield pd.DataFrame(
                {
                    "doc_id": pd.Series(
                        ids[d] if len(d) else np.empty(0, np.int64),
                        dtype="int64",
                    ),
                    "b1": pd.Series(b1, dtype="int64"),
                    "b2": pd.Series(b2, dtype="int64"),
                    "tf": pd.Series(tf, dtype="int64"),
                }
            )

    return docs.select("doc_id", "text").mapInPandas(
        run, schema="doc_id long, b1 long, b2 long, tf long"
    )


def quality_score_frame(
    docs: DataFrame, w_mod: int, w_off: int, keep: tuple[str, ...] = ()
) -> DataFrame:
    """(doc_id, *keep, n_words, score_sum) — the fastText-style linear
    scorer (Σ (poly_hash(word) % w_mod) - w_off over non-empty words),
    Arrow twin of the ``aggregate(filter(split(...)))`` HOF; zero-word
    docs keep the SQL empty-fold (0, 0). Parity-locked."""
    kernel = word_level_batch
    ba, mod = BASE_A, MOD
    cols = ("doc_id", *keep)

    def run(batches):
        import pandas as pd

        for pdf in batches:
            n_out, s_out = kernel(
                pdf["text"].tolist(), ba, mod, 0, "score", w_mod, w_off
            )
            out = {c: pdf[c].reset_index(drop=True) for c in cols}
            out["n_words"] = pd.Series(n_out, dtype="int64")
            out["score_sum"] = pd.Series(s_out, dtype="int64")
            yield pd.DataFrame(out)

    keep_schema = "".join(f", {c} string" for c in keep)
    return docs.select(*cols, "text").mapInPandas(
        run, schema=f"doc_id long{keep_schema}, n_words long, score_sum long"
    )


def gram_sim_frame(docs: DataFrame, n: int) -> DataFrame:
    """(doc_id, sim) — {SIMHASH_BITS}-bit SimHash over the distinct
    word-``n``-gram hash set, the Arrow/numpy twin of
    ``simhash_expr(gram_fold64_expr(...))`` (bit-identical: locked by
    tests/test_dup_heavy_skew.py::test_simhash_kernel_matches_hof).
    Docs with fewer than ``n`` words keep the HOF's empty-fold value
    sim = 0 (they block in bucket 0, exactly like the SQL twin and the
    DuckDB oracle). ``docs`` must carry non-NULL ``doc_id``/``text``.

    Why a kernel and not the HOF: the SimHash fold is the heaviest
    interpreted-lambda expression in the package — 60 zip_with adds per
    GRAM per doc outside whole-stage codegen (the same JIT-profile-
    pollution class as the round-12 minhash kernel move, and measured
    ~4× slower than this kernel at sf0.1 for every simhash_pair_frame
    consumer)."""
    kernel = gram_doc_batch
    ba, bb, mod = BASE_A, BASE_B, MOD
    gram_n = n
    bits = SIMHASH_BITS

    def run(batches):
        import pandas as pd

        for pdf in batches:
            ids, _, _, sims = kernel(
                pdf["doc_id"].values, pdf["text"].tolist(),
                gram_n, None, ba, bb, mod,
                want_sim=True, keep_empty=True, sim_bits=bits,
            )
            yield pd.DataFrame(
                {
                    "doc_id": pd.Series(ids, dtype="int64"),
                    "sim": pd.Series(sims, dtype="int64"),
                }
            )

    return docs.select("doc_id", "text").mapInPandas(
        run, schema="doc_id long, sim long"
    )


def gram_set_frame(docs: DataFrame, n: int) -> DataFrame:
    """(doc_id, hs) — sorted-DISTINCT word-``n``-gram hash sets, the
    Arrow/numpy twin of ``gram_fold64_expr(wh1, wh2, n)`` (set-equal;
    bit-equality of members locked by the minhash kernel parity test —
    same fold, same kernel). Docs with fewer than ``n`` words are
    dropped (empty gram arrays vanish through every consumer's explode /
    unnest anyway). ``docs`` must carry non-NULL ``doc_id``/``text``.

    Consumers are the inverted-index familes (Jaccard, containment,
    boilerplate spans, decontamination): all treat hs as a SET — they
    explode it to postings or take array_intersect sizes — so the
    sorted order is not contractual."""
    kernel = gram_doc_batch
    ba, bb, mod = BASE_A, BASE_B, MOD
    gram_n = n

    def run(batches):
        import pandas as pd

        for pdf in batches:
            ids, hs, _, _ = kernel(
                pdf["doc_id"].values, pdf["text"].tolist(),
                gram_n, None, ba, bb, mod,
            )
            yield pd.DataFrame(
                {
                    "doc_id": pd.Series(ids, dtype="int64"),
                    "hs": pd.Series(hs, dtype="object"),
                }
            )

    return docs.select("doc_id", "text").mapInPandas(
        run, schema="doc_id long, hs array<long>"
    )
