"""ML-prep / retrieval depth operators (SURVEY.md §2.11, round-2 late block).

Operations a training-data platform runs between raw ingest and model
consumption, each in its scale-correct Spark formulation with a bit-exact
DuckDB oracle:

- ``nearest_event_join`` — BIDIRECTIONAL tolerance as-of join (nearest
  click before OR after each purchase, ±10 min) — the J9 as-of operator
  generalized to nearest-neighbor-in-time, still one shuffle,
- ``star_flatten_wide`` — full star-schema denormalization into the wide
  training table (all dimensions broadcast; zero shuffles, one fact scan),
- ``event_type_runlengths`` — gaps-and-islands run-length encoding of
  consecutive same-type events (repetition structure mining),
- ``embedding_norm_outliers`` — vector-quality gate: L2-norm 3σ outliers
  via EXACT integer moments (micro-unit quantization, DECIMAL(38,0)
  cross-products — no float accumulation anywhere),
- ``user_event_entropy`` — Shannon entropy of each user's event-type mix
  in integer micro-nats (behavioral-diversity feature),
- ``winsorize_values_by_type`` — p05/p95 winsorization audit with
  SELECTED (not interpolated) exact percentiles chosen by pure-integer
  rank arithmetic,
- ``value_drawdown_per_user`` — maximum drawdown of the per-user
  cumulative value series (sequential-fold running sum, same order both
  engines),
- ``label_centroid_distances`` — pairwise cosine distance matrix between
  per-label embedding centroids (cluster-separation diagnostic),
- ``knn_label_accuracy`` — leave-one-out kNN majority-vote label
  validation (label-quality gate for a labeled corpus),
- ``mmr_diversified_topk`` — Maximal Marginal Relevance diversified
  retrieval (Carbonell & Goldstein, SIGIR'98), greedy loop unrolled as
  pool-sized broadcast joins — no driver-side collect,
- ``audience_overlap_matrix`` — pairwise audience Jaccard in integer ppm,
- ``bitmap_distinct_users_by_type`` / ``bitmap_audience_combination`` —
  exact roaring-style bitmap distinct + boolean audience algebra
  (streaming twin: ``streaming/bitmap.py``),
- ``embedding_dimension_stats`` — feature-wise normalization statistics
  from exact integer moments,
- ``session_pattern_match_daily`` — MATCH_RECOGNIZE-style row-pattern
  detection as a regex over compressed session paths,
- ``ltv_cohort_value_matrix`` — LTV cohort value triangle,
- ``stratified_kfold_sizes`` — RNG-free k-fold balance audit,
- ``similarity_hamming_topk`` — binary sign-signature Hamming ANN tier,
- ``cuped_ab_lift`` — CUPED variance-reduced A/B readout,
- ``negative_sampling_pairs`` / ``hard_negative_mining`` — contrastive
  pair generation (easy hash-jump negatives, hard same-similarity
  different-label negatives),
- ``zipf_slope_terms`` — corpus naturalness via the rank-frequency slope,
- ``rrf_hybrid_retrieval`` — reciprocal-rank fusion of the cosine and
  Hamming tiers (Cormack et al., SIGIR'09), integer-exact scores,
- ``embedding_standardize`` — feature-wise z-scores (the apply side of
  the dimension stats),
- ``positional_attribution_daily`` — U-shaped multi-touch attribution
  with largest-remainder ppm credits,
- ``source_lang_mix_entropy`` — per-source language-mix entropy audit.

House rules as everywhere (SURVEY.md §5.2): identical aliases both sides,
deterministic tiebreaks, float math either quantized-to-int64/DECIMAL
before accumulation or kept to sequential folds with identical order,
ONE final rounding before output.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from kafka_streams_tcp_reconciliation_spark.operators import similarity as sim
from kafka_streams_tcp_reconciliation_spark.plans import register
from kafka_streams_tcp_reconciliation_spark.sources.tables import load_table, scale_out

_TS_FMT = "yyyy-MM-dd HH:mm:ss"
_NEAREST_TOL_US = 600 * 1_000_000  # ±10 minutes, integer microseconds


# --- bidirectional tolerance as-of (nearest-in-time) join --------------------


@register(
    "nearest_event_join",
    oracle=f"""
    WITH uni AS (
        SELECT user_id, ts, event_id,
               CASE WHEN event_type = 'click' THEN 0 ELSE 1 END AS kind,
               CASE WHEN event_type = 'click' THEN ts END AS click_ts,
               CASE WHEN event_type = 'click' THEN event_id END AS click_id
        FROM events WHERE event_type IN ('click', 'purchase')
    ),
    marked AS (
        SELECT user_id, ts, event_id, kind,
               last_value(click_ts IGNORE NULLS) OVER wb AS prev_ts,
               last_value(click_id IGNORE NULLS) OVER wb AS prev_id,
               first_value(click_ts IGNORE NULLS) OVER wf AS next_ts,
               first_value(click_id IGNORE NULLS) OVER wf AS next_id
        FROM uni
        WINDOW wb AS (PARTITION BY user_id ORDER BY ts, kind, event_id
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
               wf AS (PARTITION BY user_id ORDER BY ts, kind, event_id
                      ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)
    ),
    gaps AS (
        SELECT event_id AS purchase_id, user_id,
               CASE WHEN prev_ts IS NOT NULL
                    THEN date_diff('microsecond', prev_ts, ts) END AS back_us,
               prev_id,
               CASE WHEN next_ts IS NOT NULL
                    THEN date_diff('microsecond', ts, next_ts) END AS fwd_us,
               next_id
        FROM marked WHERE kind = 1
    )
    SELECT purchase_id, user_id,
           CASE
             WHEN back_us IS NOT NULL AND back_us <= {_NEAREST_TOL_US}
                  AND (fwd_us IS NULL OR fwd_us > {_NEAREST_TOL_US}
                       OR back_us <= fwd_us)
               THEN prev_id
             WHEN fwd_us IS NOT NULL AND fwd_us <= {_NEAREST_TOL_US}
               THEN next_id
           END AS click_id,
           CASE
             WHEN back_us IS NOT NULL AND back_us <= {_NEAREST_TOL_US}
                  AND (fwd_us IS NULL OR fwd_us > {_NEAREST_TOL_US}
                       OR back_us <= fwd_us)
               THEN -back_us
             WHEN fwd_us IS NOT NULL AND fwd_us <= {_NEAREST_TOL_US}
               THEN fwd_us
           END AS gap_us
    FROM gaps
    """,
)
def nearest_event_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bidirectional tolerance as-of join: for every purchase, the NEAREST
    click by the same user within ±10 minutes — before or after, whichever
    is closer (tie → the earlier click). Purchases with no click in
    tolerance stay in the result with NULLs (left semantics).

    This generalizes the backward-only as-of operator (J9,
    ``asof_last_click_before_purchase``) to nearest-in-time matching —
    the join feature stores use for "closest sensor reading to each
    label event".

    Scale: the union-and-carry trick still needs only ONE shuffle on
    ``user_id``: interleave clicks and purchases in event-time order,
    carry the last click forward (backward candidate) and the first click
    backward (forward candidate) with two frames over the SAME sort —
    Catalyst reuses one exchange+sort for both windows. Gaps are exact
    int64 microseconds; the winner is picked by pure integer comparison,
    so the oracle agrees bit-for-bit. No range join, no fan-out.
    """
    ev = load_table(spark, sf_dir, "events")
    uni = ev.filter(F.col("event_type").isin("click", "purchase")).select(
        "user_id",
        "ts",
        "event_id",
        F.when(F.col("event_type") == "click", F.lit(0)).otherwise(1).alias("kind"),
        F.when(F.col("event_type") == "click", F.col("ts")).alias("click_ts"),
        F.when(F.col("event_type") == "click", F.col("event_id")).alias("click_id"),
    )
    order = [F.col("ts").asc(), F.col("kind").asc(), F.col("event_id").asc()]
    wb = (
        Window.partitionBy("user_id")
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    wf = (
        Window.partitionBy("user_id")
        .orderBy(*order)
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    )
    marked = uni.select(
        "user_id",
        "ts",
        "event_id",
        "kind",
        F.last("click_ts", ignorenulls=True).over(wb).alias("prev_ts"),
        F.last("click_id", ignorenulls=True).over(wb).alias("prev_id"),
        F.first("click_ts", ignorenulls=True).over(wf).alias("next_ts"),
        F.first("click_id", ignorenulls=True).over(wf).alias("next_id"),
    )
    gaps = marked.filter(F.col("kind") == 1).select(
        F.col("event_id").alias("purchase_id"),
        "user_id",
        F.expr("timestampdiff(MICROSECOND, prev_ts, ts)").alias("back_us"),
        "prev_id",
        F.expr("timestampdiff(MICROSECOND, ts, next_ts)").alias("fwd_us"),
        "next_id",
    )
    back_ok = F.col("back_us").isNotNull() & (F.col("back_us") <= _NEAREST_TOL_US)
    fwd_ok = F.col("fwd_us").isNotNull() & (F.col("fwd_us") <= _NEAREST_TOL_US)
    back_wins = back_ok & (~fwd_ok | (F.col("back_us") <= F.col("fwd_us")))
    return gaps.select(
        "purchase_id",
        "user_id",
        F.when(back_wins, F.col("prev_id"))
        .when(fwd_ok, F.col("next_id"))
        .alias("click_id"),
        F.when(back_wins, -F.col("back_us"))
        .when(fwd_ok, F.col("fwd_us"))
        .alias("gap_us"),
    )


# --- star-schema denormalization (the wide training table) -------------------


@register(
    "star_flatten_wide",
    oracle="""
    SELECT l.l_orderkey, l.l_linenumber,
           CAST(round(l.l_extendedprice * (1 - l.l_discount) * 100)
                AS BIGINT) AS net_cents,
           strftime(o.o_orderdate, '%Y-%m-%d') AS order_date,
           o.o_orderpriority,
           c.c_mktsegment,
           cn.n_name AS cust_nation, cr.r_name AS cust_region,
           p.p_brand, p.p_type,
           s.s_name AS supp_name, sn.n_name AS supp_nation
    FROM lineitem l
    JOIN orders o ON l.l_orderkey = o.o_orderkey
    JOIN customer c ON o.o_custkey = c.c_custkey
    JOIN nation cn ON c.c_nationkey = cn.n_nationkey
    JOIN region cr ON cn.n_regionkey = cr.r_regionkey
    JOIN part p ON l.l_partkey = p.p_partkey
    JOIN supplier s ON l.l_suppkey = s.s_suppkey
    JOIN nation sn ON s.s_nationkey = sn.n_nationkey
    """,
)
def star_flatten_wide(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full star-schema denormalization: the classic "build the wide
    training table" step — every lineitem flattened with its order,
    customer geography, part, and supplier geography attributes.

    Scale: at warehouse ratios every dimension here (orders:customer:
    part:supplier:nation:region) is orders of magnitude smaller than the
    fact table, and orders itself is the only one that can outgrow
    broadcast. The plan broadcasts ALL dimension sides, so the whole
    flatten is a single scan of ``lineitem`` with zero shuffles and one
    stage of chained BroadcastHashJoins inside one WholeStageCodegen
    span. At 100 TB, swap the orders join to a bucketed co-located SMJ
    (``sources/bucketing.py``) and keep the rest broadcast — nation and
    region are always tiny. Money lands as exact int64 cents.
    """
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region")
    p = load_table(spark, sf_dir, "part")
    s = load_table(spark, sf_dir, "supplier")
    cn = n.select(
        F.col("n_nationkey").alias("cn_key"), F.col("n_name").alias("cust_nation"),
        F.col("n_regionkey").alias("cn_rkey"),
    )
    sn = n.select(
        F.col("n_nationkey").alias("sn_key"), F.col("n_name").alias("supp_nation")
    )
    cr = r.select(
        F.col("r_regionkey").alias("cr_key"), F.col("r_name").alias("cust_region")
    )
    return (
        li.join(F.broadcast(o), li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(cn), F.col("c_nationkey") == F.col("cn_key"))
        .join(F.broadcast(cr), F.col("cn_rkey") == F.col("cr_key"))
        .join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(sn), F.col("s_nationkey") == F.col("sn_key"))
        .select(
            "l_orderkey",
            "l_linenumber",
            F.expr(
                "CAST(round(l_extendedprice * (1 - l_discount) * 100) AS BIGINT)"
            ).alias("net_cents"),
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("order_date"),
            "o_orderpriority",
            "c_mktsegment",
            "cust_nation",
            "cust_region",
            "p_brand",
            "p_type",
            F.col("s_name").alias("supp_name"),
            "supp_nation",
        )
    )


# --- gaps-and-islands run-length encoding ------------------------------------


@register(
    "event_type_runlengths",
    oracle="""
    WITH seq AS (
        SELECT user_id, event_type,
               row_number() OVER (PARTITION BY user_id
                                  ORDER BY ts, event_id) AS rn_all,
               row_number() OVER (PARTITION BY user_id, event_type
                                  ORDER BY ts, event_id) AS rn_type
        FROM events
    ),
    runs AS (
        SELECT user_id, event_type, rn_all - rn_type AS grp,
               CAST(count(*) AS BIGINT) AS run_len
        FROM seq GROUP BY user_id, event_type, grp
    )
    SELECT event_type, run_len, CAST(count(*) AS BIGINT) AS n_runs
    FROM runs GROUP BY event_type, run_len
    """,
)
def event_type_runlengths(
    spark: SparkSession, sf_dir: str, events: DataFrame | None = None
) -> DataFrame:
    """Run-length encoding of consecutive same-type events per user
    (gaps-and-islands), rolled up into the distribution of run lengths
    per event type — the repetition-structure diagnostic that feeds
    bot-detection and sequence-model curriculum decisions ("how often
    does a user fire 7 views in a row?").

    Scale: rather than the textbook two-row_number anchor (which needs a
    second exchange for the (user_id, event_type) window), run boundaries
    come from ``lag`` + a running sum of change flags — every window here
    partitions by ``user_id`` alone, so the whole query is ONE raw-data
    shuffle + one sort; the run aggregate keys on (user_id, run_id),
    which hash(user_id) already satisfies (no exchange), and only the
    tiny (type, run_len) rollup shuffles again. All arithmetic is int64.

    ``events`` overrides the table scan for the ``*_deduped`` composition.
    """
    ev = events if events is not None else load_table(spark, sf_dir, "events")
    w_seq = Window.partitionBy("user_id").orderBy("ts", "event_id")
    w_run = w_seq.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    flagged = ev.select(
        "user_id",
        "event_type",
        F.when(
            F.lag("event_type").over(w_seq).isNull()
            | (F.lag("event_type").over(w_seq) != F.col("event_type")),
            F.lit(1),
        )
        .otherwise(0)
        .alias("is_new_run"),
        "ts",
        "event_id",
    )
    runs = (
        flagged.select(
            "user_id",
            "event_type",
            F.sum("is_new_run").over(w_run).alias("run_id"),
        )
        .groupBy("user_id", "run_id", "event_type")
        .agg(F.count(F.lit(1)).cast("long").alias("run_len"))
    )
    return runs.groupBy("event_type", "run_len").agg(
        F.count(F.lit(1)).cast("long").alias("n_runs")
    )


# --- vector-quality gate: exact-integer 3σ norm outliers ---------------------


@register(
    "embedding_norm_outliers",
    oracle=f"""
    WITH norms AS (
        SELECT vec_id,
               CAST(round(({sim.duck_dot_expr("embedding", "embedding")})
                          * 1000000) AS BIGINT) AS n2_micro
        FROM embeddings
    ),
    stats AS (
        -- count(n2_micro), not count(*): NULL embeddings carry NULL
        -- norms and must not inflate the moment denominator (mirrored
        -- in the Spark plan's count("n2_micro"))
        SELECT CAST(count(n2_micro) AS BIGINT) AS n,
               CAST(sum(n2_micro) AS BIGINT) AS s1,
               CAST(sum(CAST(n2_micro AS HUGEINT) * n2_micro)
                    AS HUGEINT) AS s2
        FROM norms
    )
    SELECT vec_id, n2_micro,
           (CAST(n AS HUGEINT) * n2_micro - s1)
             * (CAST(n AS HUGEINT) * n2_micro - s1)
             > 9 * (CAST(n AS HUGEINT) * s2
                    - CAST(s1 AS HUGEINT) * s1) AS is_outlier
    FROM norms CROSS JOIN stats
    """,
)
def embedding_norm_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Vector-quality gate: flag embeddings whose squared L2 norm sits
    more than 3σ from the corpus mean — the standard screen for
    degenerate/overflowed vectors before they poison an ANN index.

    Determinism: the norm is the usual sequential double fold, quantized
    ONCE to integer micro-units. Mean/σ never materialize as floats —
    the 3σ test |x−μ|>3σ is evaluated as the equivalent pure-integer
    inequality (n·x−Σ)² > 9·(n·Σx²−Σ²) with DECIMAL(38,0) cross
    products (Spark DECIMAL ↔ DuckDB HUGEINT/DECIMAL), so both engines
    compare EXACTLY the same integers — no epsilon, no boundary flakes.

    Scale: one corpus scan for the 3-number moment aggregate (map-side
    combinable), broadcast back as a 1-row literal join; second scan
    streams the verdict per row. No shuffle of vector data at all.
    """
    emb = scale_out(load_table(spark, sf_dir, "embeddings"))
    norms = emb.select(
        "vec_id",
        F.expr(
            f"CAST(round(({sim.dot_expr('embedding', 'embedding')})"
            " * 1000000) AS BIGINT)"
        ).alias("n2_micro"),
    )
    stats = norms.agg(
        F.count("n2_micro").cast("long").alias("n"),
        F.sum("n2_micro").cast("long").alias("s1"),
        F.sum(
            F.col("n2_micro").cast("decimal(38,0)") * F.col("n2_micro")
        ).cast("decimal(38,0)").alias("s2"),
    )
    return norms.crossJoin(F.broadcast(stats)).select(
        "vec_id",
        "n2_micro",
        (
            (F.col("n").cast("decimal(38,0)") * F.col("n2_micro") - F.col("s1"))
            * (F.col("n").cast("decimal(38,0)") * F.col("n2_micro") - F.col("s1"))
            > F.lit(9)
            * (
                F.col("n").cast("decimal(38,0)") * F.col("s2")
                - F.col("s1").cast("decimal(38,0)") * F.col("s1")
            )
        ).alias("is_outlier"),
    )


# --- behavioral-diversity entropy --------------------------------------------


@register(
    "user_event_entropy",
    oracle="""
    WITH cnts AS (
        SELECT user_id, event_type, CAST(count(*) AS BIGINT) AS cnt
        FROM events GROUP BY user_id, event_type
    ),
    tot AS (
        SELECT user_id, event_type, cnt,
               CAST(sum(cnt) OVER (PARTITION BY user_id) AS BIGINT) AS n
        FROM cnts
    ),
    lp AS (
        SELECT user_id, cnt, n,
               CAST(round(ln(CAST(cnt AS DOUBLE) / n) * 1000000)
                    AS BIGINT) AS logp_micro
        FROM tot
    )
    SELECT user_id, CAST(max(n) AS BIGINT) AS n_events,
           CAST((-CAST(sum(cnt * logp_micro) AS BIGINT)) // max(n)
                AS BIGINT) AS entropy_micro_nats
    FROM lp GROUP BY user_id
    """,
)
def user_event_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shannon entropy of each user's event-type distribution, in integer
    micro-nats — the behavioral-diversity feature (a user who only ever
    `view`s scores 0; a uniform mix scores ln 5 ≈ 1.609e6 µnats).

    Determinism: same trick as ``unigram_logprob_score`` — each type's
    log-probability is rounded ONCE to integer micro-nats, after which
    the count-weighted sum and the mean (integer division) are exact
    BIGINT in any association order on any engine.

    Scale: the raw scan collapses to |users|·|types| rows in a map-side-
    combined (user,type) aggregate — the only full-data shuffle carries
    combined counts, not events. The per-user total and final rollup then
    re-key the TINY aggregate on ``user_id`` (one more exchange of
    |users|·|types| rows — deliberately kept instead of pre-partitioning
    by user_id, which would shuffle raw events and lose the combine).
    """
    ev = load_table(spark, sf_dir, "events")
    cnts = ev.groupBy("user_id", "event_type").agg(
        F.count(F.lit(1)).cast("long").alias("cnt")
    )
    w = Window.partitionBy("user_id")
    lp = cnts.select(
        "user_id",
        "cnt",
        F.sum("cnt").over(w).cast("long").alias("n"),
    ).select(
        "user_id",
        "cnt",
        "n",
        F.expr(
            "CAST(round(ln(CAST(cnt AS DOUBLE) / n) * 1000000) AS BIGINT)"
        ).alias("logp_micro"),
    )
    return lp.groupBy("user_id").agg(
        F.max("n").cast("long").alias("n_events"),
        F.expr(
            "CAST((-CAST(sum(cnt * logp_micro) AS BIGINT)) DIV max(n) AS BIGINT)"
        ).alias("entropy_micro_nats"),
    )


# --- winsorization audit with exact selected percentiles ---------------------


@register(
    "winsorize_values_by_type",
    oracle="""
    WITH ranked AS (
        SELECT event_type, value,
               row_number() OVER (PARTITION BY event_type
                                  ORDER BY value, event_id) AS rn,
               CAST(count(*) OVER (PARTITION BY event_type) AS BIGINT) AS n
        FROM events WHERE value IS NOT NULL
    ),
    cuts AS (
        SELECT event_type, CAST(max(n) AS BIGINT) AS n,
               max(CASE WHEN rn = (n * 5 + 99) // 100 THEN value END) AS p05,
               max(CASE WHEN rn = (n * 95 + 99) // 100 THEN value END) AS p95
        FROM ranked GROUP BY event_type
    )
    SELECT r.event_type, max(c.n) AS n,
           round(max(c.p05), 6) AS p05,
           round(max(c.p95), 6) AS p95,
           CAST(count(CASE WHEN r.value < c.p05 THEN 1 END) AS BIGINT)
               AS n_clamped_low,
           CAST(count(CASE WHEN r.value > c.p95 THEN 1 END) AS BIGINT)
               AS n_clamped_high
    FROM ranked r JOIN cuts c ON r.event_type = c.event_type
    GROUP BY r.event_type
    """,
)
def winsorize_values_by_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Winsorization audit: per event type, the exact p05/p95 cut points
    and how many rows each tail clamp would touch — the outlier-capping
    step run before a numeric feature enters training.

    Determinism: percentiles are SELECTED order statistics (not
    interpolated): the rank-k element where k = ⌈n·p⌉ is computed in
    pure integer arithmetic ((n·5+99) div 100), with (value, event_id)
    as the total-order sort key, so both engines select the identical
    stored double. Tail membership is a plain double comparison against
    that selected value — exact.

    Scale: one shuffle on ``event_type`` feeds the stacked
    rank+count windows; the |types|-row cut table broadcasts back for
    the clamp count. At 100 TB swap the in-type sort for the
    value-domain rollup used by ``equidepth_deciles_order_total``
    (group duplicate values first), which this fixture doesn't need.
    """
    # NULL values are un-winsorizable and the engines disagree on NULL
    # sort position (Spark NULLS FIRST, DuckDB NULLS LAST) — drop them
    # before ranking, identically on both sides
    ev = load_table(spark, sf_dir, "events").filter(
        F.col("value").isNotNull()
    )
    w_rank = Window.partitionBy("event_type").orderBy("value", "event_id")
    w_all = Window.partitionBy("event_type")
    ranked = ev.select(
        "event_type",
        "value",
        F.row_number().over(w_rank).alias("rn"),
        F.count(F.lit(1)).over(w_all).cast("long").alias("n"),
    )
    # integer div: Spark's `/` is float division — use expr DIV for exactness
    cuts = ranked.groupBy("event_type").agg(
        F.max("n").cast("long").alias("n"),
        F.max(
            F.when(F.expr("rn = (n * 5 + 99) DIV 100"), F.col("value"))
        ).alias("p05"),
        F.max(
            F.when(F.expr("rn = (n * 95 + 99) DIV 100"), F.col("value"))
        ).alias("p95"),
    )
    cuts = cuts.select(
        F.col("event_type").alias("ct_type"),
        F.col("n").alias("ct_n"),
        F.col("p05").alias("ct_p05"),
        F.col("p95").alias("ct_p95"),
    )
    return (
        ranked.join(
            F.broadcast(cuts), ranked.event_type == cuts.ct_type
        )
        .groupBy("event_type")
        .agg(
            F.max("ct_n").alias("n"),
            F.round(F.max("ct_p05"), 6).alias("p05"),
            F.round(F.max("ct_p95"), 6).alias("p95"),
            F.count(F.when(F.col("value") < F.col("ct_p05"), 1))
            .cast("long")
            .alias("n_clamped_low"),
            F.count(F.when(F.col("value") > F.col("ct_p95"), 1))
            .cast("long")
            .alias("n_clamped_high"),
        )
    )


# --- max drawdown of the cumulative value series -----------------------------


@register(
    "value_drawdown_per_user",
    oracle="""
    WITH series AS (
        SELECT user_id, ts, event_id,
               sum(CAST(round(value * 1000000) AS BIGINT))
                   OVER (PARTITION BY user_id ORDER BY ts, event_id
                         ROWS BETWEEN UNBOUNDED PRECEDING
                         AND CURRENT ROW) AS cum
        FROM events
    ),
    peaks AS (
        SELECT user_id, cum,
               max(cum) OVER (PARTITION BY user_id ORDER BY ts, event_id
                              ROWS BETWEEN UNBOUNDED PRECEDING
                              AND CURRENT ROW) AS peak
        FROM series
    )
    SELECT user_id, round(max(peak - cum) / 1000000.0, 6) AS max_drawdown
    FROM peaks GROUP BY user_id
    """,
)
def value_drawdown_per_user(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Maximum drawdown of each user's cumulative event-value series —
    the largest peak-to-trough drop, the classic risk/engagement-decay
    statistic over a running total.

    Determinism: ``value`` quantizes to integer micro-units BEFORE the
    running sum (as ltv/cuped do), so the cumulative series, running max
    and drawdown are exact int64 on both engines — no reliance on both
    engines folding doubles in the same order (DuckDB's windowed sum may
    combine via segment tree, which is only float-equal to the sequential
    fold by accident); one float division + round at output.

    Scale: one shuffle on ``user_id``; the three stacked windows share
    the same partitioning+sort, so Catalyst plans one exchange and one
    sort. State per row is O(1) — this is the textbook distributed
    drawdown plan.
    """
    ev = load_table(spark, sf_dir, "events")
    w_run = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    series = ev.select(
        "user_id",
        F.sum(
            F.expr("CAST(round(value * 1000000) AS BIGINT)")
        ).over(w_run).alias("cum"),
        "ts",
        "event_id",
    )
    w_peak = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    peaks = series.select(
        "user_id", "cum", F.max("cum").over(w_peak).alias("peak")
    )
    return peaks.groupBy("user_id").agg(
        F.round(
            F.max(F.col("peak") - F.col("cum")) / F.lit(1000000.0), 6
        ).alias("max_drawdown")
    )


# --- cluster-separation diagnostic: centroid distance matrix -----------------


@register(
    "label_centroid_distances",
    oracle=f"""
    WITH cent AS (
        SELECT label, array_agg(cval ORDER BY pos) AS centroid
        FROM (
            SELECT label, pos,
                   round(avg(CAST(embedding[pos] AS DOUBLE)), 6) AS cval
            FROM embeddings, (SELECT unnest(range(1, 65)) AS pos)
            GROUP BY label, pos
        )
        GROUP BY label
    )
    SELECT a.label AS label_a, b.label AS label_b,
           round({sim.duck_cosine_expr("a.centroid", "b.centroid")}, 6)
               AS cosine
    FROM cent a JOIN cent b ON a.label < b.label
    """,
)
def label_centroid_distances(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pairwise cosine similarity between per-label embedding centroids —
    the cluster-separation diagnostic ("are any two classes collapsing
    into each other?") run before trusting labels for stratified
    sampling or IVF cell assignment.

    Determinism: centroid components are the same round(avg,6)
    construction as the IVF centroids (rounded ONCE before any use);
    the pairwise cosine is the sequential fold, rounded at output.

    Scale: the per-(label,pos) mean is a map-side-combinable aggregate
    over the exploded corpus — the only corpus-sized stage. The K-row
    centroid table (K = #labels) then self-joins broadcast-vs-broadcast:
    K² pairs of 64-float arrays, trivially tiny no matter the corpus.
    """
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
        .cache()  # both self-join sides read this K-row table — scan the
        # exploded corpus once, not twice
    )
    a = cent.select(
        F.col("label").alias("label_a"), F.col("centroid").alias("ca")
    )
    b = cent.select(
        F.col("label").alias("label_b"), F.col("centroid").alias("cb")
    )
    return (
        a.join(F.broadcast(b), F.col("label_a") < F.col("label_b"))
        .select(
            "label_a",
            "label_b",
            F.round(sim.cosine_expr("ca", "cb"), 6).alias("cosine"),
        )
    )


# --- kNN majority-vote label accuracy ----------------------------------------

_KNN_QUERIES = 100
_KNN_K = 10


_KNN_ORACLE_CORE = f"""
    WITH q AS (
        SELECT vec_id AS query_id, embedding AS qv, label AS true_label
        FROM embeddings WHERE vec_id < {_KNN_QUERIES} AND label IS NOT NULL
    ),
    c AS (SELECT vec_id AS neighbor_id, embedding AS cv, label
          FROM embeddings WHERE label IS NOT NULL),
    scored AS (
        SELECT query_id, true_label, neighbor_id, label,
               round({sim.duck_cosine_expr("qv", "cv")}, 6) AS cosine
        FROM q, c WHERE neighbor_id != query_id
    ),
    top AS (
        SELECT query_id, true_label, label FROM (
            SELECT *, row_number() OVER (
                PARTITION BY query_id ORDER BY cosine DESC, neighbor_id
            ) AS rnk
            FROM scored
        ) WHERE rnk <= {_KNN_K}
    ),
    votes AS (
        SELECT query_id, true_label, label,
               CAST(count(*) AS BIGINT) AS votes
        FROM top GROUP BY query_id, true_label, label
    )
    SELECT query_id, true_label, label AS pred_label,
           label = true_label AS is_correct
    FROM (
        SELECT *, row_number() OVER (
            PARTITION BY query_id ORDER BY votes DESC, label
        ) AS vr
        FROM votes
    ) WHERE vr = 1
    """


@register(
    "knn_label_accuracy",
    oracle=_KNN_ORACLE_CORE,
)
def knn_label_accuracy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """kNN majority-vote label prediction (the label-quality / leave-one-out
    validation pass run before trusting a labeled corpus): each held-out
    query vector is classified by the majority label of its 10 nearest
    neighbors (cosine, self excluded); ties break to the smaller label.

    Scale: same physical shape as ``similarity_topk_bruteforce`` — the
    query set broadcasts against one corpus scan, WindowGroupLimit keeps
    k rows per query per partition before the single query_id shuffle;
    the vote rollup then touches only |queries|·k rows. For a full
    leave-one-out sweep at 100 TB, swap the broadcast side for the IVF
    cell join of ``knn_graph_within_cells`` — the vote stage is unchanged.
    """
    # unlabeled vectors can neither vote nor be validated — and the
    # engines disagree on NULL sort position in the vote tie-break
    emb = scale_out(load_table(spark, sf_dir, "embeddings")).filter(
        F.col("label").isNotNull()
    )
    q = emb.filter(F.col("vec_id") < _KNN_QUERIES).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("qv"),
        F.col("label").alias("true_label"),
    )
    c = emb.select(
        F.col("vec_id").alias("neighbor_id"),
        F.col("embedding").alias("cv"),
        "label",
    )
    scored = (
        c.crossJoin(F.broadcast(q))
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .select(
            "query_id",
            "true_label",
            "neighbor_id",
            "label",
            F.round(sim.cosine_expr("qv", "cv"), 6).alias("cosine"),
        )
    )
    w_rank = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id").asc()
    )
    top = (
        scored.withColumn("rnk", F.row_number().over(w_rank))
        .filter(F.col("rnk") <= _KNN_K)
        .select("query_id", "true_label", "label")
    )
    votes = top.groupBy("query_id", "true_label", "label").agg(
        F.count(F.lit(1)).cast("long").alias("votes")
    )
    w_vote = Window.partitionBy("query_id").orderBy(
        F.col("votes").desc(), F.col("label").asc()
    )
    return (
        votes.withColumn("vr", F.row_number().over(w_vote))
        .filter(F.col("vr") == 1)
        .select(
            "query_id",
            "true_label",
            F.col("label").alias("pred_label"),
            (F.col("label") == F.col("true_label")).alias("is_correct"),
        )
    )


# --- MMR diversified top-k retrieval -----------------------------------------

_MMR_POOL = 20  # relevance-ranked candidate pool size
_MMR_K = 5  # diversified picks
_MMR_LAMBDA = 0.7  # relevance weight; (1-λ) penalizes redundancy

# The driver-side greedy loop in mmr_diversified_topk is safe ONLY because
# the pool is a small constant: it collects the pool and its pool² sim
# matrix. Guard the bound in code so a future knob change can't silently
# turn the collect corpus-sized (ADVICE r09: assert, don't just document).
_MMR_POOL_MAX = 1024


def _validate_mmr_pool(pool: int) -> int:
    """Fail loudly if an MMR pool size would make the driver-side rerank
    collect more than a constant number of rows (pool + pool²)."""
    if not (1 <= pool <= _MMR_POOL_MAX):
        raise ValueError(
            f"MMR pool must be in [1, {_MMR_POOL_MAX}] — the greedy rerank "
            f"collects pool and pool^2 rows to the driver; got {pool}. "
            "For larger pools, rerank with a distributed formulation."
        )
    return pool


_validate_mmr_pool(_MMR_POOL)


def _mmr_oracle() -> str:
    """Chained-CTE DuckDB oracle: the greedy MMR loop unrolled to K picks.

    Each step picks argmax over the remaining pool of
    ``λ·rel − (1−λ)·max_{s∈selected} sim(c, s)`` with vec_id tiebreak;
    rel/sim are round(cosine, 6) so both engines score identical doubles.
    """
    pool = f"""
    q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = 0),
    pool AS (
        SELECT neighbor_id, rel FROM (
            SELECT e.vec_id AS neighbor_id,
                   round({sim.duck_cosine_expr("q.qv", "e.embedding")}, 6)
                       AS rel,
                   row_number() OVER (
                       ORDER BY round(
                           {sim.duck_cosine_expr("q.qv", "e.embedding")}, 6
                       ) DESC, e.vec_id
                   ) AS rn
            FROM embeddings e, q WHERE e.vec_id != 0
        ) WHERE rn <= {_MMR_POOL}
    ),
    sims AS (
        SELECT a.neighbor_id AS ia, b.neighbor_id AS ib,
               round({sim.duck_cosine_expr("pa.embedding", "pb.embedding")}, 6)
                   AS s
        FROM pool a JOIN embeddings pa ON a.neighbor_id = pa.vec_id
        JOIN pool b ON a.neighbor_id != b.neighbor_id
        JOIN embeddings pb ON b.neighbor_id = pb.vec_id
    )"""
    steps = [
        """
    s1 AS (
        SELECT neighbor_id, {lam} * rel AS score FROM pool
        ORDER BY {lam} * rel DESC, neighbor_id LIMIT 1
    )""".format(lam=_MMR_LAMBDA)
    ]
    for k in range(2, _MMR_K + 1):
        prev_union = " UNION ALL ".join(
            f"SELECT neighbor_id FROM s{j}" for j in range(1, k)
        )
        steps.append(f"""
    sel{k} AS ({prev_union}),
    s{k} AS (
        SELECT c.neighbor_id,
               {_MMR_LAMBDA} * c.rel
                 - {round(1 - _MMR_LAMBDA, 10)} * max(sims.s) AS score
        FROM pool c
        JOIN sims ON sims.ia = c.neighbor_id
                 AND sims.ib IN (SELECT neighbor_id FROM sel{k})
        WHERE c.neighbor_id NOT IN (SELECT neighbor_id FROM sel{k})
        GROUP BY c.neighbor_id, c.rel
        ORDER BY score DESC, c.neighbor_id LIMIT 1
    )""")
    finals = " UNION ALL ".join(
        f"SELECT {k} AS rank, neighbor_id, round(score, 6) AS score FROM s{k}"
        for k in range(1, _MMR_K + 1)
    )
    return "WITH " + pool + "," + ",".join(steps) + f" {finals}"


@register("mmr_diversified_topk", oracle=_mmr_oracle())
def mmr_diversified_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Maximal Marginal Relevance retrieval (Carbonell & Goldstein,
    SIGIR'98 — public algorithm): greedily pick K results balancing
    relevance to the query (vec 0) against redundancy with what's
    already picked — the diversified top-k every RAG stack runs after
    raw ANN.

    Scale: the candidate pool (top-|pool| by relevance) comes from the
    broadcast-query corpus scan with TakeOrdered pruning — the only
    corpus-sized stage — and the pool×pool similarity matrix is one
    broadcast self-join over ≤20 rows. Both are corpus-size-INDEPENDENT,
    so (like the K×64 centroid tables in clustering) they are collected
    and the greedy argmax runs driver-side over 20 candidates: a
    DataFrame-loop formulation compiles 5 distinct Catalyst plans whose
    analysis+codegen cost dwarfs the 20-row data by ~20× — reranking a
    fixed-size pool on the client is also exactly how production MMR
    serves. Every score is still computed by the Spark expressions the
    oracle mirrors (rel and pairwise sims are round(cosine,6) from the
    shared fold); the driver only combines those rounded doubles with
    the identical λ-arithmetic and orders them.

    Determinism: rel and pairwise sims are round(cosine,6); MMR scores
    combine those rounded doubles with identical float ops both engines,
    tie-break on vec_id.
    """
    emb = scale_out(load_table(spark, sf_dir, "embeddings"))
    q = emb.filter(F.col("vec_id") == 0).select(F.col("embedding").alias("qv"))
    scored = (
        emb.filter(F.col("vec_id") != 0)
        .crossJoin(F.broadcast(q))
        .select(
            F.col("vec_id").alias("neighbor_id"),
            "embedding",
            F.round(sim.cosine_expr("qv", "embedding"), 6).alias("rel"),
        )
    )
    pool = (
        # TakeOrderedAndProject: per-partition k-heaps + a k-row merge —
        # never a global sort (a global row_number window would funnel the
        # whole corpus through one partition)
        scored.orderBy(F.col("rel").desc(), F.col("neighbor_id").asc())
        .limit(_MMR_POOL)
        .select("neighbor_id", "embedding", "rel")
        .cache()
    )
    a = pool.select(
        F.col("neighbor_id").alias("ia"), F.col("embedding").alias("ea")
    )
    b = pool.select(
        F.col("neighbor_id").alias("ib"), F.col("embedding").alias("eb")
    )
    sims = a.join(F.broadcast(b), F.col("ia") != F.col("ib")).select(
        "ia", "ib", F.round(sim.cosine_expr("ea", "eb"), 6).alias("s")
    )
    # pool-sized collects (≤20 rel rows, ≤380 sim rows) — constant in
    # corpus size; the greedy loop is pure ordering over these doubles
    # guard NULL/NaN cosines (zero-norm or null embeddings): drop the
    # entry rather than let None/NaN poison the greedy max()/key compare —
    # matches Spark's behavior of such rows losing every DESC comparison
    rel = {
        r["neighbor_id"]: r["rel"]
        for r in pool.select("neighbor_id", "rel").collect()
        if r["rel"] is not None and not math.isnan(r["rel"])
    }
    s = {
        (r["ia"], r["ib"]): r["s"]
        for r in sims.collect()
        if r["s"] is not None and not math.isnan(r["s"])
    }
    lam, mu = _MMR_LAMBDA, round(1 - _MMR_LAMBDA, 10)
    picked: list[int] = []
    rows: list[tuple[int, int, float]] = []
    for k in range(1, _MMR_K + 1):
        best = None
        for nid, rl in rel.items():
            if nid in picked:
                continue
            if picked:
                score = lam * rl - mu * max(
                    (s[(nid, p)] for p in picked if (nid, p) in s),
                    default=0.0,
                )
            else:
                score = lam * rl
            key = (-score, nid)
            if best is None or key < best[0]:
                best = (key, nid, score)
        if best is None:  # pool exhausted (degenerate corpus)
            break
        picked.append(best[1])
        rows.append((k, best[1], best[2]))
    out = spark.createDataFrame(
        rows, "rank int, neighbor_id bigint, score double"
    )
    # round in Spark (not Python) so half-up semantics match the oracle
    return out.select(
        "rank", "neighbor_id", F.round("score", 6).alias("score")
    )


# --- audience overlap matrix -------------------------------------------------


@register(
    "audience_overlap_matrix",
    oracle="""
    WITH aud AS (
        SELECT DISTINCT event_type, user_id FROM events
    ),
    sizes AS (
        SELECT event_type, CAST(count(*) AS BIGINT) AS n FROM aud
        GROUP BY event_type
    ),
    inter AS (
        SELECT a.event_type AS type_a, b.event_type AS type_b,
               CAST(count(*) AS BIGINT) AS n_both
        FROM aud a JOIN aud b
          ON a.user_id = b.user_id AND a.event_type < b.event_type
        GROUP BY 1, 2
    )
    SELECT i.type_a, i.type_b, i.n_both,
           sa.n AS n_a, sb.n AS n_b,
           CAST(i.n_both * 1000000 // (sa.n + sb.n - i.n_both) AS BIGINT)
               AS jaccard_ppm
    FROM inter i
    JOIN sizes sa ON i.type_a = sa.event_type
    JOIN sizes sb ON i.type_b = sb.event_type
    """,
)
def audience_overlap_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pairwise audience overlap between event types: |users(A) ∩
    users(B)| and the Jaccard similarity of the two audiences, in exact
    integer ppm — the segment-overlap matrix an ads/growth stack
    computes before budget allocation.

    Scale: the raw stream first collapses to the DISTINCT (type, user)
    audience relation (map-side combinable — the only event-volume
    stage); the intersection self-join is keyed on ``user_id``, so cost
    is Σ_user deg(user)² with deg ≤ #types (bounded fan-out, never
    |A|·|B|); sizes is a |types|-row broadcast. Jaccard via
    inclusion-exclusion needs no union materialization. All integer.
    """
    ev = load_table(spark, sf_dir, "events")
    aud = ev.select("event_type", "user_id").distinct().cache()
    sizes = aud.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("long").alias("n")
    )
    a = aud.select(F.col("event_type").alias("type_a"), "user_id")
    b = aud.select(F.col("event_type").alias("type_b"), "user_id")
    inter = (
        a.join(b, "user_id")
        .filter(F.col("type_a") < F.col("type_b"))
        .groupBy("type_a", "type_b")
        .agg(F.count(F.lit(1)).cast("long").alias("n_both"))
    )
    sa = sizes.select(F.col("event_type").alias("type_a"), F.col("n").alias("n_a"))
    sb = sizes.select(F.col("event_type").alias("type_b"), F.col("n").alias("n_b"))
    return (
        inter.join(F.broadcast(sa), "type_a")
        .join(F.broadcast(sb), "type_b")
        .select(
            "type_a",
            "type_b",
            "n_both",
            "n_a",
            "n_b",
            F.expr(
                "CAST(n_both * 1000000 DIV (n_a + n_b - n_both) AS BIGINT)"
            ).alias("jaccard_ppm"),
        )
    )


# --- bitmap-index exact distinct ---------------------------------------------


@register(
    "bitmap_distinct_users_by_type",
    oracle="""
    WITH words AS (
        -- DuckDB raises on 1<<63 (sign-bit overflow) where Java wraps to
        -- INT64_MIN; spell the sign bit explicitly so both engines build
        -- the identical word
        SELECT event_type, user_id // 64 AS w,
               CAST(bit_or(CASE WHEN user_id % 64 = 63
                                THEN -9223372036854775808
                                ELSE CAST(1 AS BIGINT)
                                     << CAST(user_id % 64 AS INT) END)
                    AS BIGINT) AS bits
        FROM events GROUP BY event_type, w
    )
    SELECT event_type,
           CAST(sum(bit_count(bits)) AS BIGINT) AS n_users
    FROM words GROUP BY event_type
    """,
)
def bitmap_distinct_users_by_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT distinct-user counts per event type via a roaring-style user
    bitmap: user u sets bit ``u mod 64`` of int64 word ``u div 64``;
    words merge with ``bit_or`` and the count is Σ popcount(word).

    This is the third distinct-count tier next to ``count_distinct``
    (exact, shuffles user ids) and HLL (approximate, constant state):
    bitmaps are EXACT and MERGEABLE — segment stores keep one bitmap per
    (dimension value) and answer any boolean audience combination with
    bitwise ops, never rescanning the fact table.

    Scale: the (type, word) aggregate is map-side combinable — shuffle
    volume is bounded by |types| × |user-id-space|/64 WORDS (8 bytes
    each, independent of event count); the popcount rollup touches only
    word rows. Dense ids make the flat bitmap optimal; sparse id spaces
    switch to per-chunk containers (the roaring trick) with the same
    two-level plan. Everything is int64; the oracle mirrors the exact
    construction, and ``user_erasure_audit``-style cohort predicates can
    intersect these bitmaps without touching events again.
    """
    ev = load_table(spark, sf_dir, "events")
    words = (
        ev.select(
            "event_type",
            F.expr("user_id DIV 64").alias("w"),
            F.expr(
                "shiftleft(CAST(1 AS BIGINT), CAST(user_id % 64 AS INT))"
            ).alias("m"),
        )
        .groupBy("event_type", "w")
        .agg(F.expr("bit_or(m)").alias("bits"))
    )
    return words.groupBy("event_type").agg(
        F.expr("CAST(sum(bit_count(bits)) AS BIGINT)").alias("n_users")
    )


# --- boolean audience algebra over bitmaps -----------------------------------

_BM_SET = (
    "CASE WHEN user_id % 64 = 63 THEN -9223372036854775808 "
    "ELSE CAST(1 AS BIGINT) << CAST(user_id % 64 AS INT) END"
)


@register(
    "bitmap_audience_combination",
    oracle=f"""
    WITH words AS (
        SELECT user_id // 64 AS w,
               CAST(bit_or(CASE WHEN event_type = 'click'
                                THEN {_BM_SET} ELSE 0 END) AS BIGINT) AS c,
               CAST(bit_or(CASE WHEN event_type = 'purchase'
                                THEN {_BM_SET} ELSE 0 END) AS BIGINT) AS p,
               CAST(bit_or(CASE WHEN event_type = 'error'
                                THEN {_BM_SET} ELSE 0 END) AS BIGINT) AS e
        FROM events GROUP BY w
    )
    SELECT 'click_and_purchase' AS segment,
           CAST(coalesce(sum(bit_count(c & p)), 0) AS BIGINT) AS n_users
    FROM words
    UNION ALL
    SELECT 'click_not_purchase',
           CAST(coalesce(sum(bit_count(c & ~p)), 0) AS BIGINT) FROM words
    UNION ALL
    SELECT 'click_purchase_no_error',
           CAST(coalesce(sum(bit_count(c & p & ~e)), 0) AS BIGINT) FROM words
    """,
)
def bitmap_audience_combination(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Boolean audience algebra over user bitmaps — the reason segment
    stores keep bitmaps at all: (clicked ∧ purchased), (clicked ∧
    ¬purchased), (clicked ∧ purchased ∧ ¬errored) answered with bitwise
    AND/NOT + popcount, EXACTLY, without rescanning or re-shuffling the
    fact table per combination.

    Scale: ONE pass builds all three per-word bitmaps simultaneously
    (conditional bit_or in a single (w)-keyed map-side-combined
    aggregate — no join between the per-type tables at all); every
    boolean combination is then a row-local int64 expression over the
    ≤|id-space|/64-row word table. Adding a 4th segment or a new
    combination costs one more column/expression, not another scan.
    """
    ev = load_table(spark, sf_dir, "events")
    set_bit = F.expr(_BM_SET)
    words = (
        ev.select(
            F.expr("user_id DIV 64").alias("w"),
            F.when(F.col("event_type") == "click", set_bit)
            .otherwise(0)
            .alias("cm"),
            F.when(F.col("event_type") == "purchase", set_bit)
            .otherwise(0)
            .alias("pm"),
            F.when(F.col("event_type") == "error", set_bit)
            .otherwise(0)
            .alias("em"),
        )
        .groupBy("w")
        .agg(
            F.expr("bit_or(cm)").alias("c"),
            F.expr("bit_or(pm)").alias("p"),
            F.expr("bit_or(em)").alias("e"),
        )
        .cache()  # one fact scan + one word aggregate feed all three
        # combination branches (uncached, each union branch rescans)
    )
    combos = [
        ("click_and_purchase", "c & p"),
        ("click_not_purchase", "c & ~p"),
        ("click_purchase_no_error", "c & p & ~e"),
    ]
    # global agg per combo (not groupBy on the literal segment): a report
    # must carry every segment with n_users=0 even over an empty fact
    # table, where a groupBy would emit no rows at all
    parts = [
        words.agg(
            F.coalesce(
                F.sum(F.expr(f"CAST(bit_count({expr}) AS BIGINT)")),
                F.lit(0),
            )
            .cast("long")
            .alias("n_users")
        ).select(F.lit(name).alias("segment"), "n_users")
        for name, expr in combos
    ]
    out = parts[0]
    for pdf in parts[1:]:
        out = out.unionAll(pdf)
    return out


# --- feature-wise embedding statistics ---------------------------------------


@register(
    "embedding_dimension_stats",
    oracle="""
    WITH q AS (
        SELECT pos,
               CAST(round(CAST(embedding[pos] AS DOUBLE) * 1000000)
                    AS BIGINT) AS qv
        FROM embeddings, (SELECT unnest(range(1, 65)) AS pos)
    ),
    moments AS (
        -- count(qv), not count(*): the cross-join keeps NULL-embedding
        -- rows (qv NULL) that Spark's posexplode never emits
        SELECT pos, CAST(count(qv) AS BIGINT) AS n,
               CAST(sum(qv) AS BIGINT) AS s1,
               CAST(sum(CAST(qv AS HUGEINT) * qv) AS HUGEINT) AS s2
        FROM q GROUP BY pos
    )
    SELECT pos, n,
           CAST(s1 // n AS BIGINT) AS mean_micro,
           CAST((CAST(n AS HUGEINT) * s2 - CAST(s1 AS HUGEINT) * s1)
                // (CAST(n AS HUGEINT) * n) AS BIGINT) AS var_micro2
    FROM moments
    """,
)
def embedding_dimension_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Feature-wise (per-dimension) mean and variance of the embedding
    corpus — the normalization statistics computed before feature
    scaling, whitening, or PQ codebook training.

    Determinism: components quantize ONCE to integer micro-units; mean
    and variance come from the exact integer identities (floor division,
    var = (n·Σq²−(Σq)²) div n²) with HUGEINT/DECIMAL(38,0) cross
    products — no float accumulation, no cross-engine epsilon.

    Scale: posexplode then ONE map-side-combined aggregate keyed on the
    64 dimension ids — the shuffle carries 64×partitions partial-moment
    rows regardless of corpus size. (s1 can be negative: BOTH engines'
    integer division truncates toward zero — DuckDB's BIGINT `//` and
    Spark's `DIV` — verified by the differential, so no floor emulation
    is needed; the variance numerator is a square, always non-negative.)
    """
    emb = scale_out(load_table(spark, sf_dir, "embeddings"))
    q = emb.select(
        F.posexplode("embedding").alias("pos0", "v")
    ).select(
        (F.col("pos0") + 1).alias("pos"),
        F.expr("CAST(round(CAST(v AS DOUBLE) * 1000000) AS BIGINT)").alias("qv"),
    )
    moments = q.groupBy("pos").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("qv").cast("long").alias("s1"),
        F.sum(F.col("qv").cast("decimal(38,0)") * F.col("qv"))
        .cast("decimal(38,0)")
        .alias("s2"),
    )
    return moments.select(
        F.col("pos").cast("long").alias("pos"),
        "n",
        F.expr("CAST(s1 DIV n AS BIGINT)").alias("mean_micro"),
        F.expr(
            "CAST((CAST(n AS DECIMAL(38,0)) * s2"
            " - CAST(s1 AS DECIMAL(38,0)) * s1)"
            " DIV (CAST(n AS DECIMAL(38,0)) * n) AS BIGINT)"
        ).alias("var_micro2"),
    )


# --- row-pattern recognition over session paths ------------------------------

_SPM_GAP_MIN = 30  # same gap knob as session_event_paths / session windows
_SPM_PATTERN = "^v+c+p"  # views, then clicks, then a purchase — SQL:2016
# MATCH_RECOGNIZE "A+ B+ C" over per-session event sequences


@register(
    "session_pattern_match_daily",
    oracle=f"""
    WITH flagged AS (
        SELECT user_id, ts, event_id, event_type,
               CASE WHEN lag(ts) OVER w IS NULL
                         OR ts - lag(ts) OVER w
                            >= INTERVAL '{_SPM_GAP_MIN} minutes'
                    THEN 1 ELSE 0 END AS new_session
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ),
    sessions AS (
        SELECT *, sum(new_session) OVER (
            PARTITION BY user_id ORDER BY ts, event_id
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
        ) AS session_id
        FROM flagged
    ),
    paths AS (
        SELECT user_id, session_id,
               strftime(min(ts), '%Y-%m-%d') AS day,
               string_agg(substr(event_type, 1, 1), ''
                          ORDER BY ts, event_id) AS path
        FROM sessions GROUP BY user_id, session_id
    )
    SELECT day,
           CAST(count(*) AS BIGINT) AS n_sessions,
           CAST(count(*) FILTER (
               WHERE regexp_matches(path, '{_SPM_PATTERN}')
           ) AS BIGINT) AS n_matching,
           CAST(count(*) FILTER (
               WHERE regexp_matches(path, '{_SPM_PATTERN}')
           ) * 1000000 // count(*) AS BIGINT) AS match_ppm
    FROM paths GROUP BY day
    """,
)
def session_pattern_match_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Row-pattern recognition (the SQL:2016 MATCH_RECOGNIZE ``A+ B+ C``
    shape) over sessionized event sequences: how many sessions per day
    open with views, move to clicks, and reach a purchase — detected as
    a REGEX over the session's compressed event-letter path ("vvccp…").

    Spark has no MATCH_RECOGNIZE; compressing each bounded sequence to a
    string and matching patterns as regexes is the scalable equivalent:
    any concatenation/alternation/quantifier pattern compiles to a regex
    over the letter alphabet, and the sequential scan the pattern engine
    would do per session becomes one JVM regex per path row.

    Scale: identical single-shuffle sessionization as
    ``session_event_paths`` (stacked gap-flag + running-id windows, one
    exchange); the path aggregate carries one LETTER per event; the
    daily rollup is map-side combinable over |sessions| rows. Share is
    exact integer ppm.
    """
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gap_ok = (F.col("ts") - F.lag("ts").over(w)) >= F.expr(
        f"INTERVAL {_SPM_GAP_MIN} MINUTES"
    )
    flagged = ev.select(
        "user_id",
        "ts",
        "event_id",
        F.substring("event_type", 1, 1).alias("letter"),
        F.when(F.lag("ts").over(w).isNull() | gap_ok, F.lit(1))
        .otherwise(F.lit(0))
        .alias("new_session"),
    )
    sessions = flagged.withColumn(
        "session_id",
        F.sum("new_session").over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ),
    )
    paths = sessions.groupBy("user_id", "session_id").agg(
        F.date_format(F.min("ts"), "yyyy-MM-dd").alias("day"),
        F.array_join(
            F.transform(
                F.sort_array(
                    F.collect_list(F.struct("ts", "event_id", "letter"))
                ),
                lambda s: s["letter"],
            ),
            "",
        ).alias("path"),
    )
    matched = F.col("path").rlike(_SPM_PATTERN)
    return paths.groupBy("day").agg(
        F.count(F.lit(1)).cast("long").alias("n_sessions"),
        F.count(F.when(matched, 1)).cast("long").alias("n_matching"),
        F.expr(
            f"CAST(count(CASE WHEN path rlike '{_SPM_PATTERN}' THEN 1 END)"
            " * 1000000 DIV count(*) AS BIGINT)"
        ).alias("match_ppm"),
    )


# --- LTV cohort value triangle -----------------------------------------------


@register(
    "ltv_cohort_value_matrix",
    oracle="""
    WITH firsts AS (
        SELECT user_id, CAST(min(ts) AS DATE) AS cohort_day
        FROM events GROUP BY user_id
    ),
    purch AS (
        SELECT e.user_id, f.cohort_day,
               date_diff('day', f.cohort_day, CAST(e.ts AS DATE)) AS day_offset,
               CAST(round(e.value * 1000000) AS BIGINT) AS v_micro
        FROM events e JOIN firsts f ON e.user_id = f.user_id
        WHERE e.event_type = 'purchase'
    )
    SELECT strftime(cohort_day, '%Y-%m-%d') AS cohort_day,
           day_offset,
           CAST(count(DISTINCT user_id) AS BIGINT) AS n_users,
           CAST(sum(v_micro) AS BIGINT) AS sum_value_micro
    FROM purch GROUP BY cohort_day, day_offset
    """,
)
def ltv_cohort_value_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LTV cohort triangle: users grouped by first-seen day, purchase
    value accumulated per (cohort, days-since-acquisition) cell — the
    matrix every growth team integrates into lifetime-value curves.

    Determinism: purchase values quantize ONCE to integer micro-units,
    so the per-cell sums are exact int64 in any association order (a
    raw double sum across rows would be engine-order-dependent).

    Scale: first-seen is a map-side-combined min per user; the cohort
    tag joins back on ``user_id`` (co-partitioned with the purchase
    filter — one shuffle each side, and the firsts relation is
    |users|-sized, broadcastable when users ≪ events); the cell rollup
    is map-side combinable, |cohorts|·|offsets| output rows.
    """
    ev = load_table(spark, sf_dir, "events")
    firsts = ev.groupBy("user_id").agg(
        F.min("ts").cast("date").alias("cohort_day")
    )
    purch = (
        ev.filter(F.col("event_type") == "purchase")
        .join(firsts, "user_id")
        .select(
            "user_id",
            "cohort_day",
            F.datediff(F.col("ts").cast("date"), F.col("cohort_day"))
            .cast("long")
            .alias("day_offset"),
            F.expr("CAST(round(value * 1000000) AS BIGINT)").alias("v_micro"),
        )
    )
    return purch.groupBy(
        F.date_format("cohort_day", "yyyy-MM-dd").alias("cohort_day"),
        "day_offset",
    ).agg(
        F.count_distinct("user_id").cast("long").alias("n_users"),
        F.sum("v_micro").cast("long").alias("sum_value_micro"),
    )


# --- stratified k-fold assignment --------------------------------------------

_KFOLD = 5


@register(
    "stratified_kfold_sizes",
    oracle=f"""
    SELECT lang,
           CAST((doc_id * 2654435761) % 1000000007 % {_KFOLD} AS BIGINT)
               AS fold,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(n_chars) AS BIGINT) AS n_chars
    FROM documents
    GROUP BY lang, fold
    """,
)
def stratified_kfold_sizes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic stratified k-fold assignment audit: every document
    lands in one of {_KFOLD} folds via a pure hash of its id (RNG-free,
    reproducible on any engine/cluster — the same contract as
    ``split_train_valid_test``), and the audit reports per-(lang, fold)
    document and character counts so fold balance is verifiable before a
    cross-validation run.

    Scale: one map-side-combined aggregate over the corpus scan; the
    fold expression is a narrow per-row int64 computation, so adding the
    fold column to a training shard write is free. |langs|·k output rows.
    """
    docs = load_table(spark, sf_dir, "documents")
    return docs.groupBy(
        "lang",
        F.expr(
            f"CAST((doc_id * 2654435761) % 1000000007 % {_KFOLD} AS BIGINT)"
        ).alias("fold"),
    ).agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum("n_chars").cast("long").alias("n_chars"),
    )


# --- binary-signature (Hamming) similarity tier ------------------------------

_HAM_QUERIES = 100
_HAM_K = 10

# sign bit of component i -> bit i of an int64 signature; bit 63 spelled as
# INT64_MIN (DuckDB raises on 1<<63 where Java wraps)
_SIG_SPARK = (
    "aggregate(zip_with(embedding, sequence(0, 63), (cs_v, cs_i) ->"
    " CASE WHEN cs_v >= 0 THEN CASE WHEN cs_i = 63"
    " THEN -9223372036854775808"
    " ELSE shiftleft(CAST(1 AS BIGINT), CAST(cs_i AS INT)) END"
    " ELSE CAST(0 AS BIGINT) END),"
    " CAST(0 AS BIGINT), (cs_a, cs_x) -> cs_a | cs_x)"
)
_SIG_DUCK = (
    "list_reduce(list_prepend(CAST(0 AS BIGINT),"
    " list_transform(range(1, 65), cs_i ->"
    " CASE WHEN embedding[cs_i] >= 0 THEN CASE WHEN cs_i = 64"
    " THEN CAST(-9223372036854775808 AS BIGINT)"
    " ELSE CAST(1 AS BIGINT) << CAST(cs_i - 1 AS INT) END"
    " ELSE CAST(0 AS BIGINT) END)),"
    " (cs_a, cs_x) -> cs_a | cs_x)"
)


@register(
    "similarity_hamming_topk",
    oracle=f"""
    WITH sigs AS (
        -- an ANN index never indexes a missing vector: NULL embeddings
        -- are excluded (mirrored by the Spark plan's isNotNull filter)
        SELECT vec_id, {_SIG_DUCK} AS sig FROM embeddings
        WHERE embedding IS NOT NULL
    ),
    q AS (SELECT vec_id AS query_id, sig AS qs FROM sigs
          WHERE vec_id < {_HAM_QUERIES}),
    scored AS (
        SELECT query_id, s.vec_id AS neighbor_id,
               CAST(bit_count(xor(qs, s.sig)) AS BIGINT) AS hamming
        FROM q JOIN sigs s ON s.vec_id != q.query_id
    )
    SELECT query_id, neighbor_id, hamming, rank FROM (
        SELECT *, row_number() OVER (
            PARTITION BY query_id ORDER BY hamming, neighbor_id
        ) AS rank
        FROM scored
    ) WHERE rank <= {_HAM_K}
    """,
)
def similarity_hamming_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary-signature ANN serving tier: each embedding collapses to a
    64-bit SIGN signature (1 bit per dimension — 256× smaller than the
    float vector), and top-k neighbors rank by Hamming distance
    (popcount of XOR) — the cheapest large-scale pre-ranking filter,
    upstream of exact cosine re-scoring (compose with
    ``similarity_topk_bruteforce`` on the survivors).

    Scale: signatures are one int64 per vector, built in a narrow
    shuffle-free fold; the query set broadcasts and each comparison is
    two ALU ops, so the scan is memory-bandwidth-bound at ~8 bytes per
    corpus vector — the signature table for a billion vectors is 8 GB,
    cacheable where the float corpus (256 GB) is not. Integer distances
    make rank tiebreaks exact on both engines. WindowGroupLimit prunes
    per partition before the single query_id shuffle.
    """
    emb = scale_out(
        load_table(spark, sf_dir, "embeddings").filter(
            F.col("embedding").isNotNull()
        )
    )
    sigs = emb.select("vec_id", F.expr(_SIG_SPARK).alias("sig"))
    q = sigs.filter(F.col("vec_id") < _HAM_QUERIES).select(
        F.col("vec_id").alias("query_id"), F.col("sig").alias("qs")
    )
    scored = (
        sigs.crossJoin(F.broadcast(q))
        .filter(F.col("vec_id") != F.col("query_id"))
        .select(
            "query_id",
            F.col("vec_id").alias("neighbor_id"),
            F.expr("CAST(bit_count(qs ^ sig) AS BIGINT)").alias("hamming"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("hamming").asc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= _HAM_K)
    )


# --- CUPED-adjusted A/B lift -------------------------------------------------

# arms: deterministic user_id parity; periods: first/last half of the
# 30-day window, split at the data midpoint (broadcast scalar — replayable)


@register(
    "cuped_ab_lift",
    oracle="""
    WITH tsu AS (
        SELECT user_id, event_type, value,
               date_diff('microsecond', TIMESTAMP '1970-01-01', ts) AS t_us
        FROM events
    ),
    bounds AS (
        -- interval/2 truncates the DAYS component in DuckDB (loses 12 h
        -- on odd spans) — the midpoint must be pure integer microseconds
        SELECT (min(t_us) + max(t_us)) // 2 AS mid_us FROM tsu
    ),
    per_user AS (
        SELECT user_id, CAST(user_id % 2 AS BIGINT) AS arm,
               CAST(sum(CASE WHEN t_us < mid_us AND event_type = 'purchase'
                             THEN CAST(round(value * 1000000) AS BIGINT)
                             ELSE 0 END) AS BIGINT) AS x_micro,
               CAST(sum(CASE WHEN t_us >= mid_us AND event_type = 'purchase'
                             THEN CAST(round(value * 1000000) AS BIGINT)
                             ELSE 0 END) AS BIGINT) AS y_micro
        FROM tsu CROSS JOIN bounds
        GROUP BY user_id
    ),
    theta AS (
        SELECT CAST(round(
                 CASE WHEN count(*) * sum(CAST(x_micro AS HUGEINT) * x_micro)
                           - CAST(sum(x_micro) AS HUGEINT) * sum(x_micro) = 0
                      THEN 0.0
                      ELSE
                 CAST(count(*) * sum(CAST(x_micro AS HUGEINT) * y_micro)
                      - CAST(sum(x_micro) AS HUGEINT) * sum(y_micro)
                      AS DOUBLE)
                 / CAST(count(*) * sum(CAST(x_micro AS HUGEINT) * x_micro)
                        - CAST(sum(x_micro) AS HUGEINT) * sum(x_micro)
                        AS DOUBLE) * 1000000 END) AS BIGINT) AS theta_ppm,
               CAST(sum(x_micro) AS BIGINT) AS sx_all,
               CAST(count(*) AS BIGINT) AS n_all
        FROM per_user
    )
    SELECT arm, CAST(count(*) AS BIGINT) AS n_users,
           round(sum(y_micro) / count(*) / 1000000.0, 6) AS mean_y,
           round((sum(y_micro) / count(*)
                  - max(theta.theta_ppm) / 1000000.0
                    * (sum(x_micro) / count(*)
                       - max(theta.sx_all) * 1.0 / max(theta.n_all)))
                 / 1000000.0, 6) AS adjusted_mean_y
    FROM per_user CROSS JOIN theta
    GROUP BY arm
    """,
)
def cuped_ab_lift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUPED variance-reduced A/B readout (Deng et al., WSDM'13 — public
    method): per-arm post-period purchase value, adjusted by the
    pre-period covariate — ŷ_adj = ȳ_arm − θ·(x̄_arm − x̄) with
    θ = cov(x,y)/var(x) — the experimentation-platform standard for
    cutting metric variance without bias.

    Determinism: per-user sums quantize to integer micro-units; θ's
    co-moments are exact HUGEINT/DECIMAL cross products with ONE float
    division, rounded ONCE to integer ppm; the arm-level adjustment is a
    single mirrored float expression over exact integer aggregates,
    rounded at output.

    Scale: one map-side-combined pass builds per-user (x, y); θ and the
    global means are a 1-row broadcast; the arm rollup is 2 rows. The
    midpoint split is a broadcast scalar, never a collected literal.
    """
    ev = load_table(spark, sf_dir, "events")
    tsu = ev.select(
        "user_id",
        "event_type",
        "value",
        F.expr(
            "timestampdiff(MICROSECOND, TIMESTAMP_NTZ '1970-01-01', ts)"
        ).alias("t_us"),
    )
    bounds = tsu.agg(
        F.expr("(min(t_us) + max(t_us)) DIV 2").alias("mid_us")
    )
    per_user = (
        tsu.crossJoin(F.broadcast(bounds))
        .groupBy("user_id")
        .agg(
            F.expr(
                "CAST(sum(CASE WHEN t_us < mid_us AND event_type = 'purchase'"
                " THEN CAST(round(value * 1000000) AS BIGINT)"
                " ELSE 0 END) AS BIGINT)"
            ).alias("x_micro"),
            F.expr(
                "CAST(sum(CASE WHEN t_us >= mid_us AND event_type = 'purchase'"
                " THEN CAST(round(value * 1000000) AS BIGINT)"
                " ELSE 0 END) AS BIGINT)"
            ).alias("y_micro"),
        )
        .select(
            F.expr("CAST(user_id % 2 AS BIGINT)").alias("arm"),
            "x_micro",
            "y_micro",
        )
    )
    theta = per_user.agg(
        # var(x)=0 (degenerate fixtures with no pre-period purchases) must
        # yield theta=0 identically on both engines — an unguarded 0/0 is
        # NaN, and non-ANSI CAST(round(NaN) AS BIGINT) is 0 in Spark but
        # NULL in DuckDB.
        F.expr(
            "CAST(round("
            " CASE WHEN count(*) * sum(CAST(x_micro AS DECIMAL(38,0)) * x_micro)"
            "           - CAST(sum(x_micro) AS DECIMAL(38,0)) * sum(x_micro) = 0"
            "      THEN 0.0"
            "      ELSE"
            " CAST(count(*) * sum(CAST(x_micro AS DECIMAL(38,0)) * y_micro)"
            "      - CAST(sum(x_micro) AS DECIMAL(38,0)) * sum(y_micro)"
            "      AS DOUBLE)"
            " / CAST(count(*) * sum(CAST(x_micro AS DECIMAL(38,0)) * x_micro)"
            "        - CAST(sum(x_micro) AS DECIMAL(38,0)) * sum(x_micro)"
            "        AS DOUBLE) * 1000000 END) AS BIGINT)"
        ).alias("theta_ppm"),
        F.sum("x_micro").cast("long").alias("sx_all"),
        F.count(F.lit(1)).cast("long").alias("n_all"),
    )
    return (
        per_user.crossJoin(F.broadcast(theta))
        .groupBy("arm")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_users"),
            F.expr(
                "round(sum(y_micro) / count(*) / 1000000.0, 6)"
            ).alias("mean_y"),
            F.expr(
                "round((sum(y_micro) / count(*)"
                " - max(theta_ppm) / 1000000.0"
                "   * (sum(x_micro) / count(*)"
                "      - max(sx_all) * 1.0 / max(n_all)))"
                " / 1000000.0, 6)"
            ).alias("adjusted_mean_y"),
        )
    )


# --- contrastive-training pair generation ------------------------------------

_NEG_PER_DOC = 2
_NEG_STRIDE = 40503  # odd stride decorrelates the j-th negative streams


@register(
    "negative_sampling_pairs",
    oracle=f"""
    WITH n AS (SELECT CAST(count(*) AS BIGINT) AS n_docs FROM documents),
    cand AS (
        SELECT d.doc_id, j,
               (d.doc_id * 2654435761 + j * {_NEG_STRIDE}) % n.n_docs
                   AS neg_id,
               d.source AS src_a
        FROM documents d
        CROSS JOIN n
        CROSS JOIN (SELECT unnest(range(1, {_NEG_PER_DOC} + 1)) AS j)
    )
    SELECT c.doc_id, CAST(c.j AS BIGINT) AS j, c.neg_id,
           c.src_a = nd.source AS same_source
    FROM cand c JOIN documents nd ON c.neg_id = nd.doc_id
    WHERE c.neg_id != c.doc_id
    """,
)
def negative_sampling_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic negative sampling for contrastive training: each
    document gets k pseudo-random partners drawn by a hash jump over the
    contiguous id space — RNG-free, so the pair set is reproducible
    across engines, retries, and cluster sizes (the same contract as the
    corpus split). ``same_source`` is surfaced because in-domain
    negatives are harder (and sometimes false) negatives — the audit
    every contrastive pipeline runs on its pair generator.

    Scale: the generator is a narrow k-way fan-out (no shuffle); the
    attribute fetch is one equi-join on ``neg_id`` — co-partitionable
    with the corpus, and the uniform hash jump guarantees no hot
    ``neg_id`` keys. Self-pairs are dropped, never resampled, keeping
    the operator one-pass (the loss treats a missing negative as
    padding).
    """
    docs = load_table(spark, sf_dir, "documents")
    n = docs.agg(F.count(F.lit(1)).cast("long").alias("n_docs"))
    cand = (
        docs.select("doc_id", F.col("source").alias("src_a"))
        .crossJoin(F.broadcast(n))
        .select(
            "doc_id",
            "src_a",
            F.explode(
                F.sequence(F.lit(1), F.lit(_NEG_PER_DOC))
            ).alias("j"),
            "n_docs",
        )
        .select(
            "doc_id",
            F.col("j").cast("long").alias("j"),
            F.expr(
                f"(doc_id * 2654435761 + j * {_NEG_STRIDE}) % n_docs"
            ).alias("neg_id"),
            "src_a",
        )
        .filter(F.col("neg_id") != F.col("doc_id"))
    )
    nd = docs.select(
        F.col("doc_id").alias("neg_id"), F.col("source").alias("src_b")
    )
    return cand.join(nd, "neg_id").select(
        "doc_id",
        "j",
        "neg_id",
        (F.col("src_a") == F.col("src_b")).alias("same_source"),
    )


# --- hard-negative mining ----------------------------------------------------

_HARDNEG_K = 5


@register(
    "hard_negative_mining",
    oracle=f"""
    WITH q AS (
        SELECT vec_id AS query_id, embedding AS qv, label AS q_label
        FROM embeddings WHERE vec_id < {_KNN_QUERIES}
    ),
    scored AS (
        SELECT query_id, q_label, e.vec_id AS neg_id, e.label AS neg_label,
               round({sim.duck_cosine_expr("qv", "e.embedding")}, 6) AS cosine
        FROM q JOIN embeddings e
          ON e.vec_id != q.query_id AND e.label != q.q_label
    )
    SELECT query_id, neg_id, neg_label, cosine, rank FROM (
        SELECT *, row_number() OVER (
            PARTITION BY query_id ORDER BY cosine DESC, neg_id
        ) AS rank
        FROM scored
    ) WHERE rank <= {_HARDNEG_K}
    """,
)
def hard_negative_mining(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hard-negative mining: for each labeled query vector, the most
    SIMILAR vectors carrying a DIFFERENT label — the examples a
    contrastive/metric-learning loss learns the most from (random
    negatives like ``negative_sampling_pairs`` are mostly too easy).

    Scale: same broadcast-query + WindowGroupLimit shape as the ANN
    tiers, with the label-mismatch predicate pushed into the join so
    same-label candidates never materialize. At corpus scale, run it
    IVF-restricted (probe the query's top cells only) exactly like
    ``knn_graph_within_cells`` — hard negatives are by definition near
    the query, so cell pruning loses almost nothing.
    """
    # unlabeled vectors can neither vote nor be validated — and the
    # engines disagree on NULL sort position in the vote tie-break
    emb = scale_out(load_table(spark, sf_dir, "embeddings")).filter(
        F.col("label").isNotNull()
    )
    q = emb.filter(F.col("vec_id") < _KNN_QUERIES).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("qv"),
        F.col("label").alias("q_label"),
    )
    scored = (
        emb.crossJoin(F.broadcast(q))
        .filter(
            (F.col("vec_id") != F.col("query_id"))
            & (F.col("label") != F.col("q_label"))
        )
        .select(
            "query_id",
            F.col("vec_id").alias("neg_id"),
            F.col("label").alias("neg_label"),
            F.round(sim.cosine_expr("qv", "embedding"), 6).alias("cosine"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neg_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= _HARDNEG_K)
    )


# --- Zipf slope (corpus naturalness diagnostic) ------------------------------

_ZIPF_TOPK = 1000


@register(
    "zipf_slope_terms",
    oracle=f"""
    WITH vocab AS (
        SELECT term, CAST(count(*) AS BIGINT) AS cnt FROM (
            SELECT unnest(string_split(text, ' ')) AS term FROM documents
        ) WHERE term <> '' GROUP BY term
    ),
    top AS (
        SELECT term, cnt FROM vocab
        ORDER BY cnt DESC, term LIMIT {_ZIPF_TOPK}
    ),
    pts AS (
        SELECT CAST(round(ln(CAST(row_number() OVER (
                   ORDER BY cnt DESC, term) AS DOUBLE)) * 1000000)
                   AS BIGINT) AS x,
               CAST(round(ln(CAST(cnt AS DOUBLE)) * 1000000)
                   AS BIGINT) AS y
        FROM top
    )
    SELECT CAST(count(*) AS BIGINT) AS n_terms,
           round(CAST(count(*) * sum(CAST(x AS HUGEINT) * y)
                      - CAST(sum(x) AS HUGEINT) * sum(y) AS DOUBLE)
                 / CAST(count(*) * sum(CAST(x AS HUGEINT) * x)
                        - CAST(sum(x) AS HUGEINT) * sum(x) AS DOUBLE), 6)
               AS zipf_slope
    FROM pts
    """,
)
def zipf_slope_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Zipf slope of the corpus: OLS fit of log(frequency) against
    log(rank) over the top-K vocabulary — natural language sits near −1;
    strong deviation flags machine-generated or template-heavy corpora
    (a standard pretraining-data naturalness screen).

    Determinism: both logs round ONCE to integer micro-nats; the OLS
    co-moments are exact HUGEINT/DECIMAL cross products with ONE float
    division rounded at output (the ``hourly_trend_forecast`` recipe
    applied to rank-frequency space).

    Scale: the vocab is a map-side-combined term aggregate; the top-K
    cut is TakeOrderedAndProject (per-partition heaps — never a global
    sort); only K rows reach the rank window and the 5-number moment
    aggregate.
    """
    docs = load_table(spark, sf_dir, "documents")
    vocab = (
        docs.select(F.explode(F.split("text", " ")).alias("term"))
        .filter(F.col("term") != "")
        .groupBy("term")
        .agg(F.count(F.lit(1)).cast("long").alias("cnt"))
    )
    top = vocab.orderBy(F.col("cnt").desc(), F.col("term").asc()).limit(
        _ZIPF_TOPK
    )
    pts = top.select(
        F.expr(
            "CAST(round(ln(CAST(row_number() OVER (ORDER BY cnt DESC, term)"
            " AS DOUBLE)) * 1000000) AS BIGINT)"
        ).alias("x"),
        F.expr("CAST(round(ln(CAST(cnt AS DOUBLE)) * 1000000) AS BIGINT)").alias(
            "y"
        ),
    )
    return pts.agg(
        F.count(F.lit(1)).cast("long").alias("n_terms"),
        F.expr(
            "round(CAST(count(*) * sum(CAST(x AS DECIMAL(38,0)) * y)"
            "      - CAST(sum(x) AS DECIMAL(38,0)) * sum(y) AS DOUBLE)"
            " / CAST(count(*) * sum(CAST(x AS DECIMAL(38,0)) * x)"
            "        - CAST(sum(x) AS DECIMAL(38,0)) * sum(x) AS DOUBLE), 6)"
        ).alias("zipf_slope"),
    )


# --- reciprocal-rank fusion of retrieval tiers --------------------------------

_RRF_QUERIES = 50
_RRF_LIST_K = 20
_RRF_OUT_K = 10
_RRF_C = 60  # the standard RRF damping constant


def _rrf_duck() -> str:
    cos_list = f"""
        SELECT query_id, neighbor_id, rnk FROM (
            SELECT q.vec_id AS query_id, e.vec_id AS neighbor_id,
                   row_number() OVER (
                       PARTITION BY q.vec_id
                       ORDER BY round({sim.duck_cosine_expr("q.embedding", "e.embedding")}, 6) DESC,
                                e.vec_id
                   ) AS rnk
            FROM embeddings q JOIN embeddings e ON e.vec_id != q.vec_id
            WHERE q.vec_id < {_RRF_QUERIES}
              AND q.embedding IS NOT NULL AND e.embedding IS NOT NULL
        ) WHERE rnk <= {_RRF_LIST_K}
    """
    ham_list = f"""
        SELECT query_id, neighbor_id, rnk FROM (
            SELECT q.vec_id AS query_id, e.vec_id AS neighbor_id,
                   row_number() OVER (
                       PARTITION BY q.vec_id
                       ORDER BY bit_count(xor(q.sig, e.sig)), e.vec_id
                   ) AS rnk
            FROM sigs q JOIN sigs e ON e.vec_id != q.vec_id
            WHERE q.vec_id < {_RRF_QUERIES}
        ) WHERE rnk <= {_RRF_LIST_K}
    """
    return f"""
    WITH sigs AS (SELECT vec_id, {_SIG_DUCK} AS sig FROM embeddings
                  WHERE embedding IS NOT NULL),
    cosl AS ({cos_list}),
    haml AS ({ham_list}),
    fused AS (
        SELECT coalesce(c.query_id, h.query_id) AS query_id,
               coalesce(c.neighbor_id, h.neighbor_id) AS neighbor_id,
               CAST(coalesce(1000000000 // ({_RRF_C} + c.rnk), 0)
                    + coalesce(1000000000 // ({_RRF_C} + h.rnk), 0)
                    AS BIGINT) AS rrf_nano
        FROM cosl c FULL OUTER JOIN haml h
          ON c.query_id = h.query_id AND c.neighbor_id = h.neighbor_id
    )
    SELECT query_id, neighbor_id, rrf_nano, rank FROM (
        SELECT *, row_number() OVER (
            PARTITION BY query_id ORDER BY rrf_nano DESC, neighbor_id
        ) AS rank
        FROM fused
    ) WHERE rank <= {_RRF_OUT_K}
    """


@register("rrf_hybrid_retrieval", oracle=_rrf_duck())
def rrf_hybrid_retrieval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reciprocal-Rank Fusion (Cormack et al., SIGIR'09 — public method)
    of two retrieval tiers: the exact-cosine ranking and the cheap
    Hamming-signature ranking fuse per (query, candidate) as
    Σ 1/(60 + rank) — the standard hybrid-retrieval combiner (dense +
    sparse, or here float + binary) that needs no score calibration
    because it only consumes RANKS.

    Determinism: each reciprocal term is one integer division
    (1e9 div (60+rank)) — the fused score is an exact int64 sum, so
    cross-engine ties and ordering are exact.

    Scale: both input rankings are broadcast-query scans with
    WindowGroupLimit pruning; the fusion full-outer join touches only
    |queries|·k rows per list. Any number of additional tiers (BM25,
    IVF, re-ranker) joins the same way — cost grows per-list, never
    multiplicatively.
    """
    # NULL embeddings are excluded from BOTH retrieval tiers (an index
    # never holds a missing vector) — mirrored in the oracle's filters
    emb = scale_out(
        load_table(spark, sf_dir, "embeddings").filter(
            F.col("embedding").isNotNull()
        )
    )
    q = emb.filter(F.col("vec_id") < _RRF_QUERIES).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("qv")
    )
    # Arrow pair-cosine kernel (round 12): same fold order and HALF_UP
    # rounding as the HOF cosine_expr it replaces (which re-folded BOTH
    # self-dots per pair — 3 interpreted 64-dim folds per candidate);
    # parity lock: tests/test_mlprep_ops.py::test_pair_cosine_frame_matches_hof
    cosl = (
        sim.pair_cosine_frame(
            emb.crossJoin(F.broadcast(q))
            .filter(F.col("vec_id") != F.col("query_id"))
            .select(
                "query_id",
                F.col("vec_id").alias("neighbor_id"),
                F.col("qv").alias("va"),
                F.col("embedding").alias("vb"),
            ),
            "query_id", "neighbor_id", "va", "vb", micro=False,
        )
        .withColumn(
            "rnk",
            F.row_number().over(
                Window.partitionBy("query_id").orderBy(
                    F.col("cosine").desc(), F.col("neighbor_id").asc()
                )
            ),
        )
        .filter(F.col("rnk") <= _RRF_LIST_K)
        .select("query_id", "neighbor_id", F.col("rnk").alias("c_rnk"))
    )
    sigs = emb.select("vec_id", F.expr(_SIG_SPARK).alias("sig"))
    qs = sigs.filter(F.col("vec_id") < _RRF_QUERIES).select(
        F.col("vec_id").alias("query_id"), F.col("sig").alias("q_sig")
    )
    haml = (
        sigs.crossJoin(F.broadcast(qs))
        .filter(F.col("vec_id") != F.col("query_id"))
        .select(
            "query_id",
            F.col("vec_id").alias("neighbor_id"),
            F.expr("CAST(bit_count(q_sig ^ sig) AS BIGINT)").alias("hamming"),
        )
        .withColumn(
            "rnk",
            F.row_number().over(
                Window.partitionBy("query_id").orderBy(
                    F.col("hamming").asc(), F.col("neighbor_id").asc()
                )
            ),
        )
        .filter(F.col("rnk") <= _RRF_LIST_K)
        .select("query_id", "neighbor_id", F.col("rnk").alias("h_rnk"))
    )
    fused = (
        cosl.join(haml, ["query_id", "neighbor_id"], "full_outer")
        .select(
            "query_id",
            "neighbor_id",
            (
                F.coalesce(
                    F.expr(f"1000000000 DIV ({_RRF_C} + c_rnk)"), F.lit(0)
                )
                + F.coalesce(
                    F.expr(f"1000000000 DIV ({_RRF_C} + h_rnk)"), F.lit(0)
                )
            )
            .cast("long")
            .alias("rrf_nano"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("rrf_nano").desc(), F.col("neighbor_id").asc()
    )
    return (
        fused.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= _RRF_OUT_K)
    )


# --- feature-wise standardization (apply side of dimension stats) ------------


@register(
    "embedding_standardize",
    oracle="""
    WITH q AS (
        SELECT pos,
               CAST(round(CAST(embedding[pos] AS DOUBLE) * 1000000)
                    AS BIGINT) AS qv
        FROM embeddings, (SELECT unnest(range(1, 65)) AS pos)
    ),
    stats AS (
        -- count(qv), not count(*): NULL-embedding rows (qv NULL from
        -- the cross join) are invisible to Spark's posexplode moments
        SELECT pos, CAST(count(qv) AS BIGINT) AS n,
               CAST(sum(qv) AS BIGINT) AS s1,
               CAST(sum(CAST(qv AS HUGEINT) * qv) AS HUGEINT) AS s2
        FROM q GROUP BY pos
    ),
    z AS (
        SELECT e.vec_id, s.pos,
               round(CASE WHEN s.n * s.s2 - CAST(s.s1 AS HUGEINT) * s.s1 = 0
                          THEN 0.0 ELSE
               (CAST(round(CAST(e.embedding[s.pos] AS DOUBLE)
                                 * 1000000) AS BIGINT) * s.n - s.s1)
                     / (s.n * sqrt(CAST(s.n * s.s2
                                        - CAST(s.s1 AS HUGEINT) * s.s1
                                        AS DOUBLE)) / sqrt(CAST(s.n AS DOUBLE)))
                     END, 6) AS zval
        FROM embeddings e JOIN stats s ON true
        WHERE e.embedding IS NOT NULL
    )
    SELECT vec_id, pos, zval FROM z
    """,
)
def embedding_standardize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Feature-wise standardization (the APPLY side of
    ``embedding_dimension_stats``): every component re-expressed as a
    z-score against its dimension's corpus mean/std — the whitening-lite
    preprocessing run before PQ codebook training or linear probes.

    Determinism: the z-score is computed from EXACT integer moments in
    one mirrored float expression per component —
    (q·n − Σq) / (n·σ√n-form) — with sqrt the only transcendental
    (IEEE correctly-rounded), rounded once at output. No float statistic
    is ever accumulated across rows.

    Scale: the 64-row stats table broadcasts back over one corpus scan;
    the transform is a narrow per-row map (posexplode + rebuild here for
    oracle parity; a production writer uses ``transform()`` over the
    broadcast stats array — zero shuffle either way beyond the
    64-key moment rollup).
    """
    emb = scale_out(load_table(spark, sf_dir, "embeddings"))
    q = emb.select(F.posexplode("embedding").alias("pos0", "v")).select(
        (F.col("pos0") + 1).alias("pos"),
        F.expr("CAST(round(CAST(v AS DOUBLE) * 1000000) AS BIGINT)").alias("qv"),
    )
    stats = q.groupBy("pos").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("qv").cast("long").alias("s1"),
        F.sum(F.col("qv").cast("decimal(38,0)") * F.col("qv"))
        .cast("decimal(38,0)")
        .alias("s2"),
    )
    z = (
        emb.select("vec_id", F.posexplode("embedding").alias("pos0", "v"))
        .select(
            "vec_id",
            (F.col("pos0") + 1).alias("pos"),
            F.expr("CAST(round(CAST(v AS DOUBLE) * 1000000) AS BIGINT)").alias(
                "qv"
            ),
        )
        .join(F.broadcast(stats), "pos")
        .select(
            "vec_id",
            "pos",
            # zero-variance dimension (n=1, or a constant feature):
            # standardize to 0, mirrored in the oracle's CASE — the lazy
            # branch also guards the ANSI division
            F.expr(
                "round(CASE WHEN n * s2 - CAST(s1 AS DECIMAL(38,0)) * s1 = 0"
                " THEN 0.0 ELSE (qv * n - s1)"
                " / (n * sqrt(CAST(n * s2 - CAST(s1 AS DECIMAL(38,0)) * s1"
                " AS DOUBLE)) / sqrt(CAST(n AS DOUBLE))) END, 6)"
            ).alias("zval"),
        )
    )
    return z.select("vec_id", F.col("pos").cast("long").alias("pos"), "zval")


# --- positional multi-touch attribution --------------------------------------

_ATTR_WINDOW_MIN = 30
_ATTR_FIRST_PPM = 400_000
_ATTR_LAST_PPM = 400_000
_ATTR_MID_POOL_PPM = 200_000


@register(
    "positional_attribution_daily",
    oracle=f"""
    WITH touches AS (
        SELECT p.event_id AS purchase_id, c.event_id AS click_id,
               strftime(CAST(c.ts AS DATE), '%Y-%m-%d') AS day,
               row_number() OVER (
                   PARTITION BY p.event_id ORDER BY c.ts, c.event_id
               ) AS pos,
               count(*) OVER (PARTITION BY p.event_id) AS n
        FROM (SELECT * FROM events WHERE event_type = 'purchase') p
        JOIN (SELECT * FROM events WHERE event_type = 'click') c
          ON c.user_id = p.user_id
         AND c.ts <= p.ts
         AND c.ts > p.ts - INTERVAL '{_ATTR_WINDOW_MIN} minutes'
    ),
    credited AS (
        SELECT day,
               CASE WHEN n = 1 THEN 'only'
                    WHEN pos = 1 THEN 'first'
                    WHEN pos = n THEN 'last'
                    ELSE 'middle' END AS position_class,
               CAST(CASE
                 WHEN n = 1 THEN 1000000
                 WHEN n = 2 AND pos = 1 THEN 500000
                 WHEN n = 2 THEN 500000
                 WHEN pos = 1 THEN {_ATTR_FIRST_PPM}
                 WHEN pos = n THEN {_ATTR_LAST_PPM}
                 ELSE {_ATTR_MID_POOL_PPM} // (n - 2)
                      + CASE WHEN pos = 2
                             THEN {_ATTR_MID_POOL_PPM} % (n - 2)
                             ELSE 0 END
               END AS BIGINT) AS credit_ppm
        FROM touches
    )
    SELECT day, position_class,
           CAST(count(*) AS BIGINT) AS n_touches,
           CAST(sum(credit_ppm) AS BIGINT) AS credit_ppm
    FROM credited GROUP BY day, position_class
    """,
)
def positional_attribution_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Positional (U-shaped) multi-touch attribution: every click in the
    30 minutes before a purchase shares that conversion's credit —
    40% first touch, 40% last touch, 20% split across the middles
    (largest remainder to the earliest middle, so credit per purchase
    sums to exactly 1,000,000 ppm) — the standard upgrade from
    ``funnel_attribution_windowed``'s last-touch model.

    Determinism: credit is pure integer ppm arithmetic; the touch order
    is the total (ts, event_id) order.

    Scale: the touch join is the same user-keyed windowed join as the
    reconciliation flagship (state bounded by window × rate); the
    position windows ride the purchase_id partitioning created by the
    join's output aggregate, and the daily rollup combines map-side.
    """
    ev = load_table(spark, sf_dir, "events")
    p = ev.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"),
        F.col("user_id").alias("p_user"),
        F.col("ts").alias("p_ts"),
    )
    c = ev.filter(F.col("event_type") == "click").select(
        F.col("event_id").alias("click_id"),
        F.col("user_id").alias("c_user"),
        F.col("ts").alias("c_ts"),
    )
    touches = p.join(
        c,
        (F.col("c_user") == F.col("p_user"))
        & (F.col("c_ts") <= F.col("p_ts"))
        & (
            F.col("c_ts")
            > F.col("p_ts") - F.expr(f"INTERVAL {_ATTR_WINDOW_MIN} MINUTES")
        ),
    ).select(
        "purchase_id",
        "click_id",
        F.date_format(F.col("c_ts").cast("date"), "yyyy-MM-dd").alias("day"),
        F.row_number()
        .over(
            Window.partitionBy("purchase_id").orderBy(
                F.col("c_ts").asc(), F.col("click_id").asc()
            )
        )
        .alias("pos"),
        F.count(F.lit(1))
        .over(Window.partitionBy("purchase_id"))
        .alias("n"),
    )
    credit = F.expr(
        f"""CAST(CASE
            WHEN n = 1 THEN 1000000
            WHEN n = 2 THEN 500000
            WHEN pos = 1 THEN {_ATTR_FIRST_PPM}
            WHEN pos = n THEN {_ATTR_LAST_PPM}
            ELSE {_ATTR_MID_POOL_PPM} DIV (n - 2)
                 + CASE WHEN pos = 2
                        THEN {_ATTR_MID_POOL_PPM} % (n - 2)
                        ELSE 0 END
        END AS BIGINT)"""
    )
    pos_class = (
        F.when(F.col("n") == 1, "only")
        .when(F.col("pos") == 1, "first")
        .when(F.col("pos") == F.col("n"), "last")
        .otherwise("middle")
    )
    return (
        touches.select(
            "day", pos_class.alias("position_class"), credit.alias("credit_ppm")
        )
        .groupBy("day", "position_class")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_touches"),
            F.sum("credit_ppm").cast("long").alias("credit_ppm"),
        )
    )


# --- language-confusion + per-source mix audits -------------------------------


@register(
    "source_lang_mix_entropy",
    oracle="""
    WITH cnts AS (
        SELECT source, lang, CAST(count(*) AS BIGINT) AS cnt
        FROM documents GROUP BY source, lang
    ),
    tot AS (
        SELECT source, lang, cnt,
               CAST(sum(cnt) OVER (PARTITION BY source) AS BIGINT) AS n
        FROM cnts
    ),
    lp AS (
        SELECT source, cnt, n,
               CAST(round(ln(CAST(cnt AS DOUBLE) / n) * 1000000)
                    AS BIGINT) AS logp_micro
        FROM tot
    )
    SELECT source, CAST(max(n) AS BIGINT) AS n_docs,
           CAST(count(*) AS BIGINT) AS n_langs,
           CAST((-CAST(sum(cnt * logp_micro) AS BIGINT)) // max(n)
                AS BIGINT) AS entropy_micro_nats
    FROM lp GROUP BY source
    """,
)
def source_lang_mix_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source language-mix entropy: how linguistically diverse each
    ingestion source is (0 = monolingual source; ln(#langs) = uniform
    mix) — the dashboard number a multilingual-corpus curator watches
    when a crawler's language filter drifts.

    Same integer micro-nat entropy construction as
    ``user_event_entropy`` (log rounded once, exact count-weighted sum,
    integer mean); one map-side-combined (source, lang) rollup is the
    only corpus-sized stage.
    """
    docs = load_table(spark, sf_dir, "documents")
    cnts = docs.groupBy("source", "lang").agg(
        F.count(F.lit(1)).cast("long").alias("cnt")
    )
    w = Window.partitionBy("source")
    lp = cnts.select(
        "source",
        "cnt",
        F.sum("cnt").over(w).cast("long").alias("n"),
    ).select(
        "source",
        "cnt",
        "n",
        F.expr(
            "CAST(round(ln(CAST(cnt AS DOUBLE) / n) * 1000000) AS BIGINT)"
        ).alias("logp_micro"),
    )
    return lp.groupBy("source").agg(
        F.max("n").cast("long").alias("n_docs"),
        F.count(F.lit(1)).cast("long").alias("n_langs"),
        F.expr(
            "CAST((-CAST(sum(cnt * logp_micro) AS BIGINT)) DIV max(n) AS BIGINT)"
        ).alias("entropy_micro_nats"),
    )


# --- vocabulary drift between splits (Jensen–Shannon) -------------------------


@register(
    "split_vocab_js_divergence",
    oracle="""
    WITH terms AS (
        SELECT CASE WHEN (doc_id * 2654435761) % 100 < 80
                    THEN 'train' ELSE 'heldout' END AS split,
               unnest(string_split(text, ' ')) AS term
        FROM documents
    ),
    cnts AS (
        SELECT term,
               CAST(count(*) FILTER (WHERE split = 'train') AS BIGINT) AS cp,
               CAST(count(*) FILTER (WHERE split = 'heldout') AS BIGINT) AS cq
        FROM terms WHERE term <> '' GROUP BY term
    ),
    tots AS (
        SELECT CAST(sum(cp) AS BIGINT) AS np, CAST(sum(cq) AS BIGINT) AS nq
        FROM cnts
    ),
    contrib AS (
        SELECT
            CASE WHEN cp > 0 AND cp * nq + cq * np > 0
                 THEN cp * CAST(round(ln(
                2.0 * cp * nq / CAST(cp * nq + cq * np AS DOUBLE))
                * 1000000) AS BIGINT) ELSE 0 END AS wp,
            CASE WHEN cq > 0 AND cp * nq + cq * np > 0
                 THEN cq * CAST(round(ln(
                2.0 * cq * np / CAST(cp * nq + cq * np AS DOUBLE))
                * 1000000) AS BIGINT) ELSE 0 END AS wq,
            np, nq
        FROM cnts CROSS JOIN tots
    )
    SELECT CAST(max(np) AS BIGINT) AS n_train_tokens,
           CAST(max(nq) AS BIGINT) AS n_heldout_tokens,
           CAST(CASE WHEN max(np) = 0 OR max(nq) = 0 THEN 0 ELSE
                (CAST(sum(wp) AS BIGINT) * 1000000 // max(np)
                 + CAST(sum(wq) AS BIGINT) * 1000000 // max(nq)) // 2000000
                END AS BIGINT) AS js_micro_nats
    FROM contrib
    """,
)
def split_vocab_js_divergence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Vocabulary drift between the deterministic train and held-out
    splits, as Jensen–Shannon divergence of their unigram distributions
    in integer micro-nats — the distribution-shift alarm a pipeline
    fires when a re-crawl or filter change skews what the eval set
    measures (0 = identical mixes; ln 2 ≈ 693147 µnats = disjoint).

    Determinism: each term's log-ratio argument is an EXACT integer
    rational (2·c_P·N_Q / (c_P·N_Q + c_Q·N_P)); the log rounds ONCE to
    micro-nats, the count-weighted sums are exact int64, and the final
    normalization is integer division (the ``unigram_logprob_score``
    recipe applied to two distributions at once).

    Scale: one shuffle on the term for the dual-count aggregate
    (map-side combinable); totals are a 1-row broadcast; everything
    after is a narrow scan of the vocab relation.
    """
    docs = load_table(spark, sf_dir, "documents")
    terms = docs.select(
        F.expr(
            "CASE WHEN (doc_id * 2654435761) % 100 < 80"
            " THEN 'train' ELSE 'heldout' END"
        ).alias("split"),
        F.explode(F.split("text", " ")).alias("term"),
    ).filter(F.col("term") != "")
    cnts = terms.groupBy("term").agg(
        F.count(F.when(F.col("split") == "train", 1)).cast("long").alias("cp"),
        F.count(F.when(F.col("split") == "heldout", 1)).cast("long").alias("cq"),
    )
    tots = cnts.agg(
        F.sum("cp").cast("long").alias("np_"),
        F.sum("cq").cast("long").alias("nq_"),
    )
    # the extra "mixture weight > 0" / "either split empty" guards only
    # fire on degenerate corpora (one split holds every token): JS vs an
    # empty distribution is undefined — 0 by convention, both engines
    contrib = cnts.crossJoin(F.broadcast(tots)).select(
        F.expr(
            "CASE WHEN cp > 0 AND cp * nq_ + cq * np_ > 0"
            " THEN cp * CAST(round(ln("
            "2.0 * cp * nq_ / CAST(cp * nq_ + cq * np_ AS DOUBLE))"
            " * 1000000) AS BIGINT) ELSE 0 END"
        ).alias("wp"),
        F.expr(
            "CASE WHEN cq > 0 AND cp * nq_ + cq * np_ > 0"
            " THEN cq * CAST(round(ln("
            "2.0 * cq * np_ / CAST(cp * nq_ + cq * np_ AS DOUBLE))"
            " * 1000000) AS BIGINT) ELSE 0 END"
        ).alias("wq"),
        "np_",
        "nq_",
    )
    return contrib.agg(
        F.max("np_").cast("long").alias("n_train_tokens"),
        F.max("nq_").cast("long").alias("n_heldout_tokens"),
        F.expr(
            "CAST(CASE WHEN max(np_) = 0 OR max(nq_) = 0 THEN 0 ELSE"
            " (CAST(sum(wp) AS BIGINT) * 1000000 DIV max(np_)"
            " + CAST(sum(wq) AS BIGINT) * 1000000 DIV max(nq_)) DIV 2000000"
            " END AS BIGINT)"
        ).alias("js_micro_nats"),
    )


# --- label-quality readout: Cohen's kappa of the kNN rater -------------------


@register(
    "knn_label_kappa",
    oracle=f"""
    WITH knn AS ({_KNN_ORACLE_CORE}),
    counts AS (
        SELECT CAST(count(*) AS BIGINT) AS n,
               CAST(count(CASE WHEN is_correct THEN 1 END) AS BIGINT)
                   AS agree
        FROM knn
    ),
    marg AS (
        SELECT CAST(sum(nt * np) AS BIGINT) AS chance_cross
        FROM (
            SELECT COALESCE(t.label, p.label) AS label,
                   COALESCE(nt, 0) AS nt, COALESCE(np, 0) AS np
            FROM (SELECT true_label AS label, count(*) AS nt
                  FROM knn GROUP BY true_label) t
            FULL OUTER JOIN
                 (SELECT pred_label AS label, count(*) AS np
                  FROM knn GROUP BY pred_label) p
              ON t.label = p.label
        )
    )
    SELECT n, agree,
           round(CASE WHEN n * n - chance_cross = 0 THEN 0.0 ELSE
                 CAST(n * agree - chance_cross AS DOUBLE)
                 / CAST(n * n - chance_cross AS DOUBLE) END, 6) AS kappa
    FROM counts CROSS JOIN marg
    """,
)
def knn_label_kappa(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohen's kappa of the kNN rater against the stored labels — the
    agreement-BEYOND-CHANCE readout that labels-vs-predictions accuracy
    (``knn_label_accuracy``) alone overstates on imbalanced classes: with
    po the observed agreement and pe the chance agreement from the two
    raters' marginals, kappa = (po − pe)/(1 − pe).

    Determinism: everything reduces to integer counts — kappa's numerator
    n·agree − Σ n_true_k·n_pred_k and denominator n² − Σ n_true_k·n_pred_k
    are exact int64 (one rounded float division; a degenerate single-class
    corpus where pe = 1 yields kappa 0 by mirrored convention).

    Scale: rides the kNN query's plan (broadcast queries + WindowGroupLimit
    top-k); the kappa arithmetic touches |queries| rows, then two
    label-cardinality marginals joined by label — all broadcast-sized.
    """
    knn = knn_label_accuracy(spark, sf_dir)
    counts = knn.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.count(F.when(F.col("is_correct"), 1)).cast("long").alias("agree"),
    )
    nt = knn.groupBy(F.col("true_label").alias("label")).agg(
        F.count(F.lit(1)).alias("nt")
    )
    np_ = knn.groupBy(F.col("pred_label").alias("label")).agg(
        F.count(F.lit(1)).alias("np")
    )
    marg = (
        nt.join(np_, "label", "full_outer")
        .select(
            (
                F.coalesce("nt", F.lit(0)) * F.coalesce("np", F.lit(0))
            ).alias("cross")
        )
        .agg(F.sum("cross").cast("long").alias("chance_cross"))
    )
    return counts.crossJoin(F.broadcast(marg)).select(
        "n",
        "agree",
        F.round(
            F.when(
                F.col("n") * F.col("n") - F.col("chance_cross") == 0,
                F.lit(0.0),
            ).otherwise(
                (F.col("n") * F.col("agree") - F.col("chance_cross")).cast(
                    "double"
                )
                / (F.col("n") * F.col("n") - F.col("chance_cross")).cast(
                    "double"
                )
            ),
            6,
        ).alias("kappa"),
    )


# --- difference-in-differences readout ---------------------------------------


@register(
    "did_ab_readout",
    oracle="""
    WITH tsu AS (
        SELECT user_id, event_type, value,
               date_diff('microsecond', TIMESTAMP '1970-01-01', ts) AS t_us
        FROM events
    ),
    bounds AS (SELECT (min(t_us) + max(t_us)) // 2 AS mid_us FROM tsu),
    cells AS (
        SELECT CAST(user_id % 2 AS BIGINT) AS arm,
               CAST(t_us >= mid_us AS BIGINT) AS post,
               CAST(sum(CASE WHEN event_type = 'purchase'
                             THEN CAST(round(value * 1000000) AS BIGINT)
                             ELSE 0 END) AS BIGINT) AS v_micro,
               CAST(count(DISTINCT user_id) AS BIGINT) AS n_users
        FROM tsu CROSS JOIN bounds
        GROUP BY arm, post
    )
    SELECT arm, post, n_users,
           round(v_micro / n_users / 1000000.0, 6) AS mean_value,
           round((SELECT (t11.v_micro * 1.0 / t11.n_users
                          - t10.v_micro * 1.0 / t10.n_users)
                         - (t01.v_micro * 1.0 / t01.n_users
                            - t00.v_micro * 1.0 / t00.n_users)
                  FROM cells t00, cells t01, cells t10, cells t11
                  WHERE t00.arm = 0 AND t00.post = 0
                    AND t01.arm = 0 AND t01.post = 1
                    AND t10.arm = 1 AND t10.post = 0
                    AND t11.arm = 1 AND t11.post = 1
                 ) / 1000000.0, 6) AS did_estimate
    FROM cells
    """,
)
def did_ab_readout(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Difference-in-differences A/B readout (the identification cousin of
    ``cuped_ab_lift``): per (arm, period) purchase-value cell means plus
    the DiD estimate (Δ_treat − Δ_control) — the standard guard against a
    pre-existing level difference between arms masquerading as lift.

    Determinism: cell sums quantize to integer micro-units; per-cell user
    counts are exact; the four-cell combination is one mirrored float
    expression over exact integers, rounded at output. The same
    broadcast-midpoint split as CUPED (never a collected literal).

    Scale: one map-side-combined pass to 4 cells; the DiD scalar is a
    4-row self-combination — O(1). Every row carries the global estimate
    so the readout is self-contained.
    """
    ev = load_table(spark, sf_dir, "events")
    tsu = ev.select(
        "user_id",
        "event_type",
        "value",
        F.expr(
            "timestampdiff(MICROSECOND, TIMESTAMP_NTZ '1970-01-01', ts)"
        ).alias("t_us"),
    )
    bounds = tsu.agg(F.expr("(min(t_us) + max(t_us)) DIV 2").alias("mid_us"))
    cells = (
        tsu.crossJoin(F.broadcast(bounds))
        .groupBy(
            F.expr("CAST(user_id % 2 AS BIGINT)").alias("arm"),
            F.expr("CAST(t_us >= mid_us AS BIGINT)").alias("post"),
        )
        .agg(
            F.expr(
                "CAST(sum(CASE WHEN event_type = 'purchase'"
                " THEN CAST(round(value * 1000000) AS BIGINT)"
                " ELSE 0 END) AS BIGINT)"
            ).alias("v_micro"),
            F.count_distinct("user_id").cast("long").alias("n_users"),
        )
    )
    # four-cell combination by conditional aggregation: always exactly one
    # row, and a missing cell (degenerate fixtures with data in one arm or
    # one period only) surfaces as a NULL estimate — matching the oracle's
    # scalar subquery — instead of an empty cross join swallowing the
    # entire readout
    def cell_mean(a: int, p: int):
        return F.max(
            F.when(
                (F.col("arm") == a) & (F.col("post") == p),
                F.col("v_micro") * 1.0 / F.col("n_users"),
            )
        )

    did = cells.agg(
        (
            (cell_mean(1, 1) - cell_mean(1, 0))
            - (cell_mean(0, 1) - cell_mean(0, 0))
        ).alias("did_micro")
    )
    return (
        cells.crossJoin(F.broadcast(did))
        .select(
            "arm",
            "post",
            "n_users",
            F.round(
                F.col("v_micro") / F.col("n_users") / 1_000_000.0, 6
            ).alias("mean_value"),
            F.round(F.col("did_micro") / 1_000_000.0, 6).alias(
                "did_estimate"
            ),
        )
    )


# ---------------------------------------------------------------------------
# Margin-based bitext mining (round 11)
# ---------------------------------------------------------------------------

_BT_K = 4  # neighborhood size for the margin denominators
_BT_MARGIN_MICRO = 1_050_000  # ratio margin threshold (1.05) in micro units
_BT_SIDE_SPLIT = 5  # label < 5 = source side, label >= 5 = target side


@register(
    "bitext_margin_mining",
    oracle=f"""
    WITH s AS (
        SELECT vec_id AS src_id, embedding AS sv
        FROM embeddings WHERE label < {_BT_SIDE_SPLIT}
    ),
    t AS (
        SELECT vec_id AS tgt_id, embedding AS tv
        FROM embeddings WHERE label >= {_BT_SIDE_SPLIT}
    ),
    pairs AS (
        SELECT src_id, tgt_id,
               CAST(round({sim.duck_cosine_expr("sv", "tv")} * 1000000)
                    AS BIGINT) AS cos_micro
        FROM s, t
    ),
    fwd AS (
        SELECT src_id, CAST(sum(cos_micro) AS BIGINT) AS sumk_fwd
        FROM (
            SELECT src_id, cos_micro,
                   row_number() OVER (PARTITION BY src_id
                                      ORDER BY cos_micro DESC, tgt_id)
                       AS rn
            FROM pairs
        ) WHERE rn <= {_BT_K}
        GROUP BY src_id
    ),
    bwd AS (
        SELECT tgt_id, CAST(sum(cos_micro) AS BIGINT) AS sumk_bwd
        FROM (
            SELECT tgt_id, cos_micro,
                   row_number() OVER (PARTITION BY tgt_id
                                      ORDER BY cos_micro DESC, src_id)
                       AS rn
            FROM pairs
        ) WHERE rn <= {_BT_K}
        GROUP BY tgt_id
    ),
    margined AS (
        SELECT p.src_id, p.tgt_id, p.cos_micro,
               CASE WHEN p.cos_micro > 0
                         AND f.sumk_fwd + b.sumk_bwd > 0
                    THEN CAST(2 * {_BT_K} * p.cos_micro * 1000000 AS BIGINT)
                         // CAST(f.sumk_fwd + b.sumk_bwd AS BIGINT)
                    ELSE CAST(0 AS BIGINT)
               END AS margin_micro
        FROM pairs p
        JOIN fwd f ON f.src_id = p.src_id
        JOIN bwd b ON b.tgt_id = p.tgt_id
    )
    SELECT src_id, tgt_id, cos_micro, margin_micro,
           margin_micro > {_BT_MARGIN_MICRO} AS mined
    FROM (
        SELECT *, row_number() OVER (PARTITION BY src_id
                                     ORDER BY margin_micro DESC, tgt_id)
                      AS rn
        FROM margined
    )
    WHERE rn = 1
    """,
)
def bitext_margin_mining(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Margin-based parallel-pair mining (Artetxe & Schwenk 2019,
    "Margin-based Parallel Corpus Mining with Multilingual Sentence
    Embeddings"): for every source-side vector, score each target-side
    candidate by the RATIO margin — cosine divided by the average of the
    two directions' k-NN neighborhoods — and keep the best-margin
    candidate, mined iff the margin clears 1.05. The margin fixes plain
    cosine-threshold mining's hubness failure (a generic "hub" vector is
    close to everything, so its raw cosine is high against many sources;
    its neighborhood average is equally high, so its margin is ~1).

    Sides: the embeddings fixture has no language column, so the two
    "languages" are the label partition (label < {_BT_SIDE_SPLIT} =
    source side, rest = target) — the machinery is the point, the side
    predicate is one line for a real corpus.

    Determinism: cosine is the deterministic ordered fold rounded ONCE
    to integer micro units; margin is pure BIGINT cross-multiplication
    (2K·cos·1e6 DIV (Σk_fwd + Σk_bwd)) with non-positive numerators and
    denominators pinned to 0 — no float division anywhere, and Spark's
    truncating DIV never sees a negative operand where DuckDB's flooring
    // would diverge. Ordering ties break on ids.

    Scale: this is the exact NxN baseline tier (the same contract as
    ``similarity_topk_bruteforce``) — one broadcast of the target side,
    pairs cached once and consumed by fwd/bwd/final. The production path
    at corpus scale swaps the crossJoin for sign-LSH bucket candidates
    (``operators/similarity.lsh_bucket_expr``, the dedup_embedding
    pattern) and keeps everything downstream — the margin arithmetic is
    already candidate-set-shaped.
    """
    emb = scale_out(load_table(spark, sf_dir, "embeddings"))
    s = emb.filter(F.col("label") < _BT_SIDE_SPLIT).select(
        F.col("vec_id").alias("src_id"), F.col("embedding").alias("sv")
    )
    t = emb.filter(F.col("label") >= _BT_SIDE_SPLIT).select(
        F.col("vec_id").alias("tgt_id"), F.col("embedding").alias("tv")
    )
    # Arrow kernel (round 12): the full s×t micro-cosine product in one
    # mapInPandas pass — same broadcast-the-target contract as the
    # crossJoin it replaces, same doubles (per-dimension fold order) and
    # same exact HALF_UP rounding (operators/similarity.bitext_pair_scores,
    # parity-locked in tests/test_mlprep_ops.py). The HOF form paid three
    # interpreted 64-dim folds per pair — the dominant cost of this tier.
    # Round 13: the FORWARD top-K sum rides out of the kernel per row
    # (each source row scores ALL targets inside one kernel block, so the
    # per-src window is task-local) — the fwd window's full-pair-list
    # exchange + sort disappears; only the bwd direction still shuffles
    # (its top-K spans all s-batches). Parity: ::test_bitext_fwd_sum_matches_window.
    pairs = sim.bitext_pair_scores(s, t, fwd_k=_BT_K).cache()
    w_b = Window.partitionBy("tgt_id").orderBy(
        F.col("cos_micro").desc(), F.col("src_id").asc()
    )
    bwd = (
        pairs.withColumn("rn", F.row_number().over(w_b))
        .filter(F.col("rn") <= _BT_K)
        .groupBy("tgt_id")
        .agg(F.sum("cos_micro").cast("long").alias("sumk_bwd"))
    )
    margined = (
        pairs.join(F.broadcast(bwd), "tgt_id")
        .select(
            "src_id",
            "tgt_id",
            "cos_micro",
            F.when(
                (F.col("cos_micro") > 0)
                & (F.col("sumk_fwd") + F.col("sumk_bwd") > 0),
                F.expr(
                    f"CAST(2 * {_BT_K} * cos_micro * 1000000 AS BIGINT)"
                    " DIV CAST(sumk_fwd + sumk_bwd AS BIGINT)"
                ),
            )
            .otherwise(F.lit(0))
            .cast("long")
            .alias("margin_micro"),
        )
    )
    w_best = Window.partitionBy("src_id").orderBy(
        F.col("margin_micro").desc(), F.col("tgt_id").asc()
    )
    return (
        margined.withColumn("rn", F.row_number().over(w_best))
        .filter(F.col("rn") == 1)
        .select(
            "src_id",
            "tgt_id",
            "cos_micro",
            "margin_micro",
            (F.col("margin_micro") > _BT_MARGIN_MICRO).alias("mined"),
        )
    )


@register(
    "bitext_margin_mining_lsh",
    oracle=f"""
    WITH s AS (
        SELECT vec_id AS src_id, embedding AS sv
        FROM embeddings WHERE label < {_BT_SIDE_SPLIT}
    ),
    t AS (
        SELECT vec_id AS tgt_id, embedding AS tv
        FROM embeddings WHERE label >= {_BT_SIDE_SPLIT}
    ),
    sb AS (
        SELECT src_id, unnest({sim.duck_lsh_bucket_select("sv")},
                              recursive := true)
        FROM s
    ),
    tb AS (
        SELECT tgt_id, unnest({sim.duck_lsh_bucket_select("tv")},
                              recursive := true)
        FROM t
    ),
    cand AS (
        SELECT DISTINCT sb.src_id, tb.tgt_id
        FROM sb JOIN tb ON sb.tbl = tb.tbl AND sb.bucket = tb.bucket
    ),
    pairs AS (
        SELECT c.src_id, c.tgt_id,
               CAST(round({sim.duck_cosine_expr("s.sv", "t.tv")} * 1000000)
                    AS BIGINT) AS cos_micro
        FROM cand c
        JOIN s ON s.src_id = c.src_id
        JOIN t ON t.tgt_id = c.tgt_id
    ),
    fwd AS (
        SELECT src_id, CAST(sum(cos_micro) AS BIGINT) AS sumk_fwd
        FROM (
            SELECT src_id, cos_micro,
                   row_number() OVER (PARTITION BY src_id
                                      ORDER BY cos_micro DESC, tgt_id)
                       AS rn
            FROM pairs
        ) WHERE rn <= {_BT_K}
        GROUP BY src_id
    ),
    bwd AS (
        SELECT tgt_id, CAST(sum(cos_micro) AS BIGINT) AS sumk_bwd
        FROM (
            SELECT tgt_id, cos_micro,
                   row_number() OVER (PARTITION BY tgt_id
                                      ORDER BY cos_micro DESC, src_id)
                       AS rn
            FROM pairs
        ) WHERE rn <= {_BT_K}
        GROUP BY tgt_id
    ),
    margined AS (
        SELECT p.src_id, p.tgt_id, p.cos_micro,
               CASE WHEN p.cos_micro > 0
                         AND f.sumk_fwd + b.sumk_bwd > 0
                    THEN CAST(2 * {_BT_K} * p.cos_micro * 1000000 AS BIGINT)
                         // CAST(f.sumk_fwd + b.sumk_bwd AS BIGINT)
                    ELSE CAST(0 AS BIGINT)
               END AS margin_micro
        FROM pairs p
        JOIN fwd f ON f.src_id = p.src_id
        JOIN bwd b ON b.tgt_id = p.tgt_id
    )
    SELECT src_id, tgt_id, cos_micro, margin_micro,
           margin_micro > {_BT_MARGIN_MICRO} AS mined
    FROM (
        SELECT *, row_number() OVER (PARTITION BY src_id
                                     ORDER BY margin_micro DESC, tgt_id)
                      AS rn
        FROM margined
    )
    WHERE rn = 1
    """,
)
def bitext_margin_mining_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The corpus-scale tier of ``bitext_margin_mining``: candidates come
    from a CROSS-SET sign-LSH bucket join (a source-target pair is scored
    only if the two vectors share a bucket in any of the {sim.LSH_TABLES}
    hash tables) instead of the exact NxN product — the same
    inverted-index shape as ``dedup_minhash_incremental``, so candidate
    volume scales with bucket collisions, never |src| x |tgt|. The margin
    denominators are the forward/backward top-{_BT_K} neighborhood sums
    WITHIN the candidate set — the standard approximation in mined-bitext
    pipelines (the true k-NN needs the exact product; a hub's candidates
    still expose its inflated neighborhood, which is what the margin
    normalizes away). Only sources with at least one candidate appear —
    mirrored inner joins on both engines.

    Determinism: bucket bits are the shared deterministic rational
    hyperplanes (``operators/similarity``); everything downstream is the
    parent query's all-BIGINT margin arithmetic. Recall misses are
    bucket-exact on both engines, so the differential stays the strong
    value-hash tier (the ``dedup_minhash_lsh`` precedent).

    Recall honesty: sign-LSH collision probability is (1 - θ/π)^planes
    per table, OR-ed over tables. On the RANDOM-vector fixture the exact
    tier's "mined" pairs sit at θ ≈ 60-70° (cos 0.3-0.4 — random data
    has no true parallel pairs), so measured recall of those pairs is
    ~6% at 8 planes x 2 tables — correct behavior, not a defect: real
    parallel pairs (cos ≥ 0.8, θ ≤ 37°) collide per table at ~0.8^8 ≈
    17%, and the table count is the recall dial (1-(1-p)^T; 8 tables →
    ~78%). The fixture's job here is differential exactness; the recall
    arithmetic is the documented production knob
    (tests/test_mlprep_ops.py::test_bitext_lsh_consistent_with_exact).

    Scale: two narrow bucket projections ({sim.LSH_TABLES} rows per
    vector), one equi-join on (tbl, bucket), cosine only on candidates,
    two windowed top-K passes keyed by vector id. The plane count is the
    occupancy knob (``SPARK_GRAFT_LSH_PLANES``, validated 1..62): planes
    grow with log(corpus) to hold per-bucket population constant —
    measured for the shared machinery in SCALE.md round 7. The two
    enrichment joins that attach the vectors back to the candidate ids
    are plain keyed equi-joins with NO strategy hint: in the mined-bitext
    use case each side is a whole language's corpus, so the planner must
    stay free to pick SMJ/SHJ when the side is large and BHJ only when
    AQE measures it small (end-to-end sweep: SCALE.md round 12). The
    ``pairs`` cache lives until the caller's ``spark.catalog.clearCache()``
    — the same session-lifetime contract as the selection layer's
    tf cache; at corpus scale prefer a checkpoint/parquet round-trip.
    """
    emb = scale_out(load_table(spark, sf_dir, "embeddings"))
    s = emb.filter(F.col("label") < _BT_SIDE_SPLIT).select(
        F.col("vec_id").alias("src_id"), F.col("embedding").alias("sv")
    )
    t = emb.filter(F.col("label") >= _BT_SIDE_SPLIT).select(
        F.col("vec_id").alias("tgt_id"), F.col("embedding").alias("tv")
    )
    # Arrow kernels (round 12): sign buckets and candidate micro-cosines
    # both run in compiled numpy (operators/similarity.lsh_buckets_frame /
    # pair_cosine_frame, micro mode) — same doubles via the shared
    # per-dimension fold order, same exact HALF_UP rounding, NULL
    # propagation and bucket-0 NULL rows preserved; parity locks in
    # tests/test_mlprep_ops.py. The join shape (and the no-hint contract
    # on the enrichment joins) is unchanged.
    sb = sim.lsh_buckets_frame(s.withColumnRenamed("sv", "embedding"),
                               "src_id", "embedding")
    tb = sim.lsh_buckets_frame(t.withColumnRenamed("tv", "embedding"),
                               "tgt_id", "embedding")
    cand = sb.join(tb, ["tbl", "bucket"]).select("src_id", "tgt_id").distinct()
    paired = (
        cand.join(s, "src_id")
        .join(t, "tgt_id")
        .select("src_id", "tgt_id", "sv", "tv")
    )
    pairs = sim.pair_cosine_frame(
        paired, "src_id", "tgt_id", "sv", "tv", micro=True
    ).cache()
    w_f = Window.partitionBy("src_id").orderBy(
        F.col("cos_micro").desc(), F.col("tgt_id").asc()
    )
    fwd = (
        pairs.withColumn("rn", F.row_number().over(w_f))
        .filter(F.col("rn") <= _BT_K)
        .groupBy("src_id")
        .agg(F.sum("cos_micro").cast("long").alias("sumk_fwd"))
    )
    w_b = Window.partitionBy("tgt_id").orderBy(
        F.col("cos_micro").desc(), F.col("src_id").asc()
    )
    bwd = (
        pairs.withColumn("rn", F.row_number().over(w_b))
        .filter(F.col("rn") <= _BT_K)
        .groupBy("tgt_id")
        .agg(F.sum("cos_micro").cast("long").alias("sumk_bwd"))
    )
    margined = (
        pairs.join(fwd, "src_id")
        .join(bwd, "tgt_id")
        .select(
            "src_id",
            "tgt_id",
            "cos_micro",
            F.when(
                (F.col("cos_micro") > 0)
                & (F.col("sumk_fwd") + F.col("sumk_bwd") > 0),
                F.expr(
                    f"CAST(2 * {_BT_K} * cos_micro * 1000000 AS BIGINT)"
                    " DIV CAST(sumk_fwd + sumk_bwd AS BIGINT)"
                ),
            )
            .otherwise(F.lit(0))
            .cast("long")
            .alias("margin_micro"),
        )
    )
    w_best = Window.partitionBy("src_id").orderBy(
        F.col("margin_micro").desc(), F.col("tgt_id").asc()
    )
    return (
        margined.withColumn("rn", F.row_number().over(w_best))
        .filter(F.col("rn") == 1)
        .select(
            "src_id",
            "tgt_id",
            "cos_micro",
            "margin_micro",
            (F.col("margin_micro") > _BT_MARGIN_MICRO).alias("mined"),
        )
    )
