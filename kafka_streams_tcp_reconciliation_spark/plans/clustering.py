"""Clustering & iterative operators over the dedup/similarity layer.

Three capabilities a training-data pipeline needs beyond pairwise ops:

- ``dedup_cluster_resolve`` — connected components over near-dup pairs:
  the step that turns "A~B, B~C" into one keeper per duplicate CLUSTER
  (pairwise dedup alone would keep B twice or drop both B and C).
- ``kmeans_embeddings`` — Lloyd iterations over the embedding corpus:
  the iterative-algorithm pattern (driver-resident k×d model, distributed
  assign/update jobs) that also re-trains IVF coarse centroids.
- ``similarity_ivf_multiprobe`` — the recall knob on the IVF scale path:
  probe the top-p cells instead of one.

All three are deterministic end-to-end and carry full-pipeline DuckDB
oracles (the iterative ones unroll/recurse in SQL), so they get the
strong value-hash check despite being "non-SQL-shaped" operators.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from kafka_streams_tcp_reconciliation_spark.operators import similarity as sim
from kafka_streams_tcp_reconciliation_spark.operators.graph import (
    connected_components_propagate,
)
from kafka_streams_tcp_reconciliation_spark.plans import register
from kafka_streams_tcp_reconciliation_spark.plans.llm import (
    SIMHASH_CAND_CTES,
    ivf_oracle,
    ivf_topk_frame,
    simhash_pair_frame,
)
from kafka_streams_tcp_reconciliation_spark.sources.tables import load_table, scale_out

# ---------------------------------------------------------------------------
# near-dup cluster resolution (connected components)
# ---------------------------------------------------------------------------


@register(
    "dedup_cluster_resolve",
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
    reach AS (
        SELECT src AS doc_id, least(src, min(dst)) AS canonical_id
        FROM walk GROUP BY src
    )
    SELECT r.doc_id, r.canonical_id, s.cluster_size
    FROM reach r
    JOIN (
        SELECT canonical_id, CAST(count(*) AS BIGINT) AS cluster_size
        FROM reach GROUP BY canonical_id
    ) s USING (canonical_id)
    """,
)
def dedup_cluster_resolve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Resolve SimHash near-dup PAIRS into duplicate CLUSTERS (connected
    components, min-doc_id canonical): (doc_id, canonical_id,
    cluster_size) for every doc in at least one pair. Downstream, keeping
    rows where doc_id == canonical_id dedups transitively — A~B~C keeps
    only A even when A,C were never directly paired.

    Components via min-label propagation (``operators/graph.py``):
    rounds = cluster diameter, ideal for shallow near-dup clusters. If a
    corpus ever produces a pathological chain, swap in the diameter-proof
    ``connected_components_star`` from the same module — identical
    (node, component) contract, O(log n) rounds (both are property-tested
    equal in tests/test_graph.py).

    The oracle mirrors the same components with a recursive transitive
    closure over the same pair CTEs — identical clusters by construction
    (the component labeling is algorithm-independent: min doc_id).
    """
    pairs = simhash_pair_frame(spark, sf_dir).select("doc_a", "doc_b")
    labels = connected_components_propagate(pairs, "doc_a", "doc_b")
    sizes = labels.groupBy("component").agg(
        F.count(F.lit(1)).alias("cluster_size")
    )
    return labels.join(sizes, "component").select(
        F.col("node").alias("doc_id"),
        F.col("component").alias("canonical_id"),
        "cluster_size",
    )


# ---------------------------------------------------------------------------
# k-means over embeddings (Lloyd iterations)
# ---------------------------------------------------------------------------

_KM_K = 4
_KM_ROUNDS = 3  # assignment rounds; centroids update between rounds
_KM_DIM = 64


def _km_assign_ctes(rnd: int) -> str:
    """One unrolled Lloyd round: assignment a{rnd} against centroids
    c{rnd-1}, then updated centroids c{rnd}."""
    dist = (
        f"round(q.sqn + {sim.duck_dot_expr('c.cvec', 'c.cvec')}"
        f" - 2 * ({sim.duck_dot_expr('q.embedding', 'c.cvec')}), 6)"
    )
    return f"""
    a{rnd} AS (
        SELECT vec_id, cluster, dist, row_number() OVER (
                   PARTITION BY vec_id ORDER BY dist, cluster
               ) AS rn
        FROM (
            SELECT q.vec_id, c.cluster, {dist} AS dist
            FROM q, c{rnd - 1} c
        )
    ),
    c{rnd} AS (
        SELECT cluster, array_agg(cval ORDER BY pos) AS cvec
        FROM (
            SELECT a.cluster, pos,
                   round(avg(CAST(q.embedding[pos] AS DOUBLE)), 6) AS cval
            FROM (SELECT vec_id, cluster FROM a{rnd} WHERE rn = 1) a
            JOIN q USING (vec_id),
                 (SELECT unnest(range(1, {_KM_DIM + 1})) AS pos)
            GROUP BY a.cluster, pos
        )
        GROUP BY cluster
    )"""


@register(
    "kmeans_embeddings",
    oracle=f"""
    WITH q AS (
        -- a missing vector cannot be clustered: NULL embeddings are
        -- excluded from corpus AND seeds (mirrored by the Spark filter)
        SELECT vec_id, embedding,
               {sim.duck_dot_expr("embedding", "embedding")} AS sqn
        FROM embeddings WHERE embedding IS NOT NULL
    ),
    c0 AS (
        SELECT vec_id AS cluster,
               list_transform(embedding, cs_x -> CAST(cs_x AS DOUBLE)) AS cvec
        FROM embeddings WHERE vec_id < {_KM_K} AND embedding IS NOT NULL
    ),
    {",".join(_km_assign_ctes(r) for r in range(1, _KM_ROUNDS + 1))}
    SELECT vec_id, cluster, dist FROM a{_KM_ROUNDS} WHERE rn = 1
    """,
)
def kmeans_embeddings(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-means over the embedding corpus (k={_KM_K}, {_KM_ROUNDS} Lloyd
    assignment rounds, deterministic init = vectors 0..k-1): the iterative
    pattern behind IVF coarse-centroid training. Output: final cluster and
    squared-L2 distance per vector.

    Scale shape (MLlib's): the k×d centroid model is DRIVER-resident —
    k·d doubles collected per round, independent of corpus size — and
    inlined into the assignment expression as literal arrays, so
    assignment is a SHUFFLE-FREE narrow map: per row, k ordered-fold
    dot products and an `array_min` over (dist, cluster) structs. No
    cross join, no window, no exchange; the corpus is scanned once per
    round. The centroid update is one partial-agg shuffle over k·d
    groups.

    Determinism: distances are ordered folds rounded(6) before the argmin
    (struct ordering ties → lowest cluster id); updated centroids
    round(6) per coordinate; the driver-side ||c||² fold runs in the same
    order as the engines' folds (IEEE doubles — bit-identical). The
    oracle unrolls the same rounds as CTEs — bit-identical path.
    """
    emb = scale_out(
        load_table(spark, sf_dir, "embeddings").filter(
            F.col("embedding").isNotNull()
        )
    ).select(
        "vec_id",
        "embedding",
        F.expr(sim.dot_expr("embedding", "embedding")).alias("sqn"),
    ).persist()

    def assign(cents: list[tuple[int, list[float]]]) -> DataFrame:
        choices = []
        for cid, cvec in sorted(cents):
            lit = "array({})".format(
                ", ".join(f"CAST({v!r} AS DOUBLE)" for v in cvec)
            )
            cnorm = 0.0
            for v in cvec:  # same left-fold order as dot_expr/duck_dot_expr
                cnorm = cnorm + v * v
            dist = F.round(
                F.col("sqn")
                + F.lit(cnorm)
                - 2 * F.expr(sim.dot_expr("embedding", lit)),
                6,
            )
            choices.append(
                F.struct(
                    dist.alias("dist"),
                    F.lit(cid).cast("long").alias("cluster"),
                )
            )
        best = F.array_min(F.array(*choices))
        return emb.select(
            "vec_id",
            "embedding",
            best["cluster"].alias("cluster"),
            best["dist"].alias("dist"),
        )

    cents = [
        (int(r.cluster), list(r.cvec))
        for r in emb.filter(F.col("vec_id") < _KM_K)
        .select(
            F.col("vec_id").alias("cluster"),
            F.expr("transform(embedding, cs_x -> CAST(cs_x AS DOUBLE))").alias(
                "cvec"
            ),
        )
        .collect()
    ]
    if not cents:  # empty corpus: no seed centroids, nothing to assign
        return emb.select(
            "vec_id",
            F.lit(None).cast("long").alias("cluster"),
            F.lit(None).cast("double").alias("dist"),
        ).where(F.lit(False))
    for rnd in range(1, _KM_ROUNDS + 1):
        assigned = assign(cents)
        if rnd == _KM_ROUNDS:
            break
        cents = [
            (int(r.cluster), list(r.cvec))
            for r in assigned.select(
                "cluster", F.posexplode("embedding").alias("pos", "v")
            )
            .groupBy("cluster", "pos")
            .agg(F.round(F.avg(F.col("v").cast("double")), 6).alias("cval"))
            .groupBy("cluster")
            .agg(
                F.expr(
                    "transform(array_sort(collect_list(struct(pos, cval))),"
                    " cs_s -> cs_s.cval)"
                ).alias("cvec")
            )
            .collect()
        ]
    return assigned.select("vec_id", "cluster", "dist")


# ---------------------------------------------------------------------------
# multi-probe IVF
# ---------------------------------------------------------------------------

_N_PROBE = 2


@register("similarity_ivf_multiprobe", oracle=ivf_oracle(_N_PROBE))
def similarity_ivf_multiprobe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-probe IVF (X3 recall knob): each query probes its top-{_N_PROBE}
    cells instead of one, recovering neighbors that fell just across a cell
    boundary at {_N_PROBE}× the scan cost — still ~n_probe/n_cells of the
    corpus. Same plan as ``similarity_ivf_topk`` (broadcast centroid
    assign, equi-join on cell id, WindowGroupLimit top-k) with the probe
    count widened."""
    return ivf_topk_frame(spark, sf_dir, _N_PROBE)


# ---------------------------------------------------------------------------
# Product quantization + asymmetric distance (the 100 TB ANN memory plan)
# ---------------------------------------------------------------------------

_PQ_M = 8  # subspaces
_PQ_SUBDIM = 8  # dims per subspace (8 x 8 = 64)
_PQ_K = 16  # codewords per subspace -> 4-bit codes
_PQ_QUERIES = 4
_PQ_TOPK = 10


def _pq_duck_sqd(sv: str, cv: str) -> str:
    """DuckDB: ordered-fold squared L2 between two 8-dim double lists."""
    return (
        f"list_reduce(list_prepend(CAST(0 AS DOUBLE),"
        f" list_transform(range(1, {_PQ_SUBDIM} + 1),"
        f" pq_i -> (CAST({sv}[pq_i] AS DOUBLE) - CAST({cv}[pq_i] AS DOUBLE))"
        f" * (CAST({sv}[pq_i] AS DOUBLE) - CAST({cv}[pq_i] AS DOUBLE)))),"
        f" (pq_a, pq_v) -> pq_a + pq_v)"
    )


def _pq_collect_codebook(emb: DataFrame) -> dict[tuple[int, int], list[float]]:
    """Driver-resident codebook: codeword (m, j) = subvector m of corpus
    vector j (deterministic init-only, the kmeans_embeddings convention).
    O(K·DIM) doubles collected — corpus-size independent."""
    rows = (
        emb.filter(F.col("vec_id") < _PQ_K)
        .select(
            "vec_id",
            F.expr("transform(embedding, pq_x -> CAST(pq_x AS DOUBLE))").alias("e"),
        )
        .collect()
    )
    return {
        (m, int(r.vec_id)): [
            float(v) for v in r.e[m * _PQ_SUBDIM : (m + 1) * _PQ_SUBDIM]
        ]
        for r in rows
        for m in range(_PQ_M)
    }


def _pq_codewords(codebook) -> list[int]:
    """Codeword ids actually present (corpus may hold < _PQ_K vectors —
    e.g. a heavily filtered corpus, or an empty partition's table)."""
    return sorted({j for (_, j) in codebook})


def _pq_cb_frame(spark: SparkSession, codebook) -> DataFrame:
    """One-row broadcastable codebook frame: ``pq_cb`` is the dense
    M·K-slot array of SUBDIM-double codewords (absent slots hold zeros
    and are never referenced) and ``pq_js`` the present codeword ids.

    The codebook used to be unrolled into 2×M×K literal
    aggregate/zip_with expression trees per query (~256 HOF subtrees);
    Catalyst analysis + whole-stage codegen of that tree dominated the
    query's wall time at every SF (flat from sf0.001 to sf0.1 — pure
    compile cost). Shipping the SAME doubles as a one-row broadcast
    datum and folding over them with generic lambdas keeps the
    arithmetic (and therefore every rounded micro-unit int) identical
    while the expression tree shrinks to ~10 HOF nodes."""
    js = _pq_codewords(codebook)
    dense = [
        codebook.get((m, j), [0.0] * _PQ_SUBDIM)
        for m in range(_PQ_M)
        for j in range(_PQ_K)
    ]
    return spark.createDataFrame(
        [(dense, js)], "pq_cb array<array<double>>, pq_js array<int>"
    )


def _pq_dmicro(sv: str, cv: str) -> str:
    """Spark SQL: micro-unit squared L2 between an 8-dim slice expression
    and a codeword-array expression — ordered fold, same order as
    ``_pq_duck_sqd``; rounded ONCE to integer micro-units."""
    return (
        f"CAST(round(1000000 * aggregate(zip_with({sv}, {cv},"
        f" (pq_x, pq_c) -> (CAST(pq_x AS DOUBLE) - pq_c)"
        f" * (CAST(pq_x AS DOUBLE) - pq_c)),"
        f" CAST(0 AS DOUBLE), (pq_a, pq_v) -> pq_a + pq_v)) AS BIGINT)"
    )


def _pq_codes_expr(vec_col: str) -> str:
    """codes[m] = argmin_j dmicro(m, j), ties to lowest j — a narrow map
    over the broadcast ``pq_cb``/``pq_js`` columns. Only codewords present
    in the codebook compete (matching the oracle, whose cb CTE is built
    from the same data)."""
    d = _pq_dmicro(
        f"slice({vec_col}, pq_m * {_PQ_SUBDIM} + 1, {_PQ_SUBDIM})",
        f"element_at(pq_cb, pq_m * {_PQ_K} + pq_j + 1)",
    )
    return (
        f"transform(sequence(0, {_PQ_M - 1}), pq_m -> array_min("
        f"transform(pq_js, pq_j -> named_struct('d', {d}, 'j', pq_j))).j)"
    )


def _pq_lut_expr(vec_col: str) -> str:
    """Flattened M x K integer LUT of subspace distances for a query row,
    from the broadcast ``pq_cb`` column. Slots for absent codewords hold
    a 0 placeholder — argmin never emits an absent code, so those slots
    are unreachable."""
    d = _pq_dmicro(
        f"slice({vec_col}, (pq_i div {_PQ_K}) * {_PQ_SUBDIM} + 1,"
        f" {_PQ_SUBDIM})",
        "element_at(pq_cb, pq_i + 1)",
    )
    return (
        f"transform(sequence(0, {_PQ_M * _PQ_K - 1}), pq_i ->"
        f" IF(array_contains(pq_js, CAST(pq_i % {_PQ_K} AS INT)), {d},"
        f" CAST(0 AS BIGINT)))"
    )


_PQ_ADC_EXPR = (
    f"aggregate(sequence(0, {_PQ_M - 1}), CAST(0 AS BIGINT),"
    f" (pa_a, pa_m) -> pa_a"
    f" + element_at(lut, pa_m * {_PQ_K} + element_at(codes, pa_m + 1) + 1))"
)


_PQ_ORACLE = f"""
    WITH ms AS (SELECT unnest(range({_PQ_M})) AS m),
    cb AS (
        SELECT m, vec_id AS j,
               embedding[m * {_PQ_SUBDIM} + 1 : (m + 1) * {_PQ_SUBDIM}] AS cv
        FROM embeddings, ms
        WHERE vec_id < {_PQ_K} AND embedding IS NOT NULL
    ),
    sub AS (
        SELECT vec_id, m,
               embedding[m * {_PQ_SUBDIM} + 1 : (m + 1) * {_PQ_SUBDIM}] AS sv
        FROM embeddings, ms WHERE embedding IS NOT NULL
    ),
    enc AS (
        SELECT vec_id, m, j AS code
        FROM (
            SELECT s.vec_id, s.m, c.j,
                   row_number() OVER (
                       PARTITION BY s.vec_id, s.m
                       ORDER BY CAST(round(1000000 * ({_pq_duck_sqd('s.sv', 'c.cv')}))
                                AS BIGINT), c.j
                   ) AS rn
            FROM sub s JOIN cb c ON s.m = c.m
        ) WHERE rn = 1
    ),
    lut AS (
        SELECT s.vec_id AS query_id, s.m, c.j,
               CAST(round(1000000 * ({_pq_duck_sqd('s.sv', 'c.cv')}))
                    AS BIGINT) AS dmicro
        FROM sub s JOIN cb c ON s.m = c.m
        WHERE s.vec_id < {_PQ_QUERIES}
    ),
    scored AS (
        SELECT l.query_id, e.vec_id AS neighbor_id,
               CAST(sum(l.dmicro) AS BIGINT) AS adc_micro
        FROM enc e JOIN lut l ON e.m = l.m AND e.code = l.j
        WHERE e.vec_id != l.query_id
        GROUP BY l.query_id, e.vec_id
    )
    SELECT query_id, neighbor_id, adc_micro, rank
    FROM (
        SELECT *, row_number() OVER (
            PARTITION BY query_id ORDER BY adc_micro, neighbor_id
        ) AS rank
        FROM scored
    ) WHERE rank <= {_PQ_TOPK}
    """


@register("similarity_pq_adc", oracle=_PQ_ORACLE)
def similarity_pq_adc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Product-quantization ANN with asymmetric distance computation
    (X3, the FAISS-IVFPQ memory plan): the corpus is compressed to
    {_PQ_M} 4-bit codes per vector ({_PQ_M}×log2({_PQ_K}) = 32 bits vs
    64×32 for raw floats — a 64× memory cut), queries score candidates
    through a per-query lookup table of subspace distances instead of
    touching raw vectors. THE technique that lets a 100 TB vector corpus
    live in cluster RAM.

    Codebooks here are deterministic init-only (codeword j of subspace m
    = subvector m of corpus vector j, the same "first-k vectors" init as
    ``kmeans_embeddings``); production training plugs the per-subspace
    Lloyd loop from that query into the same plan with no shape change.

    Scale shape: the codebook ({_PQ_M}×{_PQ_K}×{_PQ_SUBDIM} doubles) is
    driver-resident and shipped as a one-row broadcast frame (data, not
    literal expression trees — see ``_pq_cb_frame``), so ENCODING is a
    shuffle-free narrow map (128 eight-dim folds per row, JVM codegen);
    the encoded corpus carries 4 bytes/vector. Queries broadcast with
    their {_PQ_M}×{_PQ_K} integer LUTs; scoring a candidate is {_PQ_M}
    array lookups + integer adds — no floating arithmetic per pair. One
    shuffle total (the per-query top-k window).

    Determinism: subspace distances are ordered folds rounded ONCE to
    integer micro-units; ADC sums of {_PQ_M} BIGINTs commute exactly, so
    ranking ties break identically ((adc_micro, neighbor_id)) on both
    engines. The oracle re-derives encoding + LUT relationally from the
    same codebook construction — an independent path to the same ints.
    """
    # NULL embeddings are excluded: a PQ index never encodes a missing
    # vector (mirrored in the oracle's IS NOT NULL filters)
    emb = scale_out(
        load_table(spark, sf_dir, "embeddings").filter(
            F.col("embedding").isNotNull()
        )
    )
    codebook = _pq_collect_codebook(emb)
    if not codebook:  # empty corpus: no codewords, nothing to encode
        return emb.select(
            F.col("vec_id").alias("query_id"),
            F.col("vec_id").alias("neighbor_id"),
            F.lit(None).cast("long").alias("adc_micro"),
            F.lit(None).cast("long").alias("rank"),
        ).where(F.lit(False))
    cb = F.broadcast(_pq_cb_frame(spark, codebook))
    # Arrow encode kernel (round 13) — see similarity_ivf_pq's enc note
    enc = sim.pq_codes_frame(
        emb, "embedding", codebook, _PQ_M, _PQ_SUBDIM, "vec_id long"
    )
    # queries ride with their flattened M x K integer LUTs
    q = (
        emb.filter(F.col("vec_id") < _PQ_QUERIES)
        .crossJoin(cb)
        .select(
            F.col("vec_id").alias("query_id"),
            F.expr(_pq_lut_expr("embedding")).alias("lut"),
        )
    )
    adc = F.expr(_PQ_ADC_EXPR)
    scored = (
        enc.crossJoin(F.broadcast(q))
        .filter(F.col("vec_id") != F.col("query_id"))
        .select(
            "query_id",
            F.col("vec_id").alias("neighbor_id"),
            adc.alias("adc_micro"),
        )
    )
    w = Window.partitionBy("query_id").orderBy("adc_micro", "neighbor_id")
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= _PQ_TOPK)
    )


# ---------------------------------------------------------------------------
# IVF + PQ: cell-pruned candidate generation, code-compressed scoring
# ---------------------------------------------------------------------------

_IVFPQ_ORACLE = f"""
    WITH ms AS (SELECT unnest(range({_PQ_M})) AS m),
    cb AS (
        SELECT m, vec_id AS j,
               embedding[m * {_PQ_SUBDIM} + 1 : (m + 1) * {_PQ_SUBDIM}] AS cv
        FROM embeddings, ms
        WHERE vec_id < {_PQ_K} AND embedding IS NOT NULL
    ),
    sub AS (
        SELECT vec_id, label, m,
               embedding[m * {_PQ_SUBDIM} + 1 : (m + 1) * {_PQ_SUBDIM}] AS sv
        FROM embeddings, ms WHERE embedding IS NOT NULL
    ),
    enc AS (
        SELECT vec_id, label, m, j AS code
        FROM (
            SELECT s.vec_id, s.label, s.m, c.j,
                   row_number() OVER (
                       PARTITION BY s.vec_id, s.m
                       ORDER BY CAST(round(1000000 * ({_pq_duck_sqd('s.sv', 'c.cv')}))
                                AS BIGINT), c.j
                   ) AS rn
            FROM sub s JOIN cb c ON s.m = c.m
        ) WHERE rn = 1
    ),
    cent AS (
        SELECT label, array_agg(cval ORDER BY pos) AS centroid
        FROM (
            SELECT label, pos,
                   round(avg(CAST(embedding[pos] AS DOUBLE)), 6) AS cval
            FROM embeddings, (SELECT unnest(range(1, 65)) AS pos)
            WHERE embedding IS NOT NULL
            GROUP BY label, pos
        )
        GROUP BY label
    ),
    q AS (
        SELECT vec_id AS query_id, embedding AS qv
        FROM embeddings
        WHERE vec_id < {_PQ_QUERIES} AND embedding IS NOT NULL
    ),
    assign AS (
        SELECT query_id, label FROM (
            SELECT q.query_id, cent.label,
                   row_number() OVER (
                       PARTITION BY q.query_id
                       ORDER BY round({sim.duck_cosine_expr("q.qv", "cent.centroid")}, 6) DESC,
                                cent.label
                   ) AS rn
            FROM q, cent
        ) WHERE rn = 1
    ),
    lut AS (
        SELECT s.vec_id AS query_id, s.m, c.j,
               CAST(round(1000000 * ({_pq_duck_sqd('s.sv', 'c.cv')}))
                    AS BIGINT) AS dmicro
        FROM sub s JOIN cb c ON s.m = c.m
        WHERE s.vec_id < {_PQ_QUERIES}
    ),
    scored AS (
        SELECT l.query_id, e.vec_id AS neighbor_id, e.label,
               CAST(sum(l.dmicro) AS BIGINT) AS adc_micro
        FROM enc e
        JOIN assign a ON e.label = a.label
        JOIN lut l ON l.query_id = a.query_id
                  AND e.m = l.m AND e.code = l.j
        WHERE e.vec_id != l.query_id
        GROUP BY l.query_id, e.vec_id, e.label
    )
    SELECT query_id, neighbor_id, label, adc_micro, rank
    FROM (
        SELECT *, row_number() OVER (
            PARTITION BY query_id ORDER BY adc_micro, neighbor_id
        ) AS rank
        FROM scored
    ) WHERE rank <= {_PQ_TOPK}
    """


@register("similarity_ivf_pq", oracle=_IVFPQ_ORACLE)
def similarity_ivf_pq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-PQ (X3 capstone — the full FAISS serving plan): coarse cells
    prune the candidate set to ~1/n_cells of the corpus, and the
    survivors are scored from their 4-bit PQ codes through the query's
    integer LUT — no raw vector is touched after encoding. This is the
    composition that serves billion-vector corpora from RAM: IVF bounds
    the scan, PQ bounds the bytes.

    Scale shape: the encoded corpus (4 bytes + cell id per vector) is
    the ONLY corpus-sized relation; queries join it by cell id (equi-join
    — partition the corpus by cell to make it local) carrying their
    {_PQ_M}×{_PQ_K} LUTs broadcast; scoring is integer lookups + adds;
    one shuffle for the per-query top-k. Cell assignment reuses the IVF
    centroid convention (per-`label` means, rounded(6)); codebooks the
    deterministic init-only PQ convention. All distances round once to
    integer micro-units so ADC sums and rank ties are engine-exact.
    """
    # NULL embeddings are excluded: a PQ index never encodes a missing
    # vector (mirrored in the oracle's IS NOT NULL filters)
    emb = scale_out(
        load_table(spark, sf_dir, "embeddings").filter(
            F.col("embedding").isNotNull()
        )
    )
    codebook = _pq_collect_codebook(emb)
    if not codebook:  # empty corpus: no codewords, nothing to encode
        return emb.select(
            F.col("vec_id").alias("query_id"),
            F.col("vec_id").alias("neighbor_id"),
            "label",
            F.lit(None).cast("long").alias("adc_micro"),
            F.lit(None).cast("long").alias("rank"),
        ).where(F.lit(False))
    cb = F.broadcast(_pq_cb_frame(spark, codebook))
    # Arrow encode kernel (round 13): corpus codes in one mapInPandas
    # pass — same doubles (per-dim fold order), same HALF_UP micro
    # rounding, same lowest-j tie-break as the HOF argmin it replaces
    # (parity lock: tests/test_clustering.py::test_pq_codes_frame_matches_hof).
    # The HOF paid M×K interpreted 8-dim folds per corpus vector.
    enc = sim.pq_codes_frame(
        emb, "embedding", codebook, _PQ_M, _PQ_SUBDIM,
        "vec_id long, label int",
    )
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
    q = (
        emb.filter(F.col("vec_id") < _PQ_QUERIES)
        .crossJoin(cb)
        .select(
            F.col("vec_id").alias("query_id"),
            F.col("embedding").alias("qv"),
            F.expr(_pq_lut_expr("embedding")).alias("lut"),
        )
    )
    w_assign = Window.partitionBy("query_id").orderBy(
        F.round(sim.cosine_expr("qv", "centroid"), 6).desc(), F.col("label").asc()
    )
    assign = (
        q.crossJoin(F.broadcast(cent))
        .withColumn("rn", F.row_number().over(w_assign))
        .filter(F.col("rn") <= 1)
        .select("query_id", "lut", F.col("label").alias("probe_label"))
    )
    scored = (
        enc.join(
            F.broadcast(assign),
            (F.col("label") == F.col("probe_label"))
            & (F.col("vec_id") != F.col("query_id")),
        )
        .select(
            "query_id",
            F.col("vec_id").alias("neighbor_id"),
            "label",
            F.expr(_PQ_ADC_EXPR).alias("adc_micro"),
        )
    )
    w_rank = Window.partitionBy("query_id").orderBy("adc_micro", "neighbor_id")
    return (
        scored.withColumn("rank", F.row_number().over(w_rank).cast("long"))
        .filter(F.col("rank") <= _PQ_TOPK)
    )
