"""Advanced relational / retrieval operators (SURVEY.md §2.11 round-2 depth).

Operator families the Kafka Streams DSL cannot express but a 100 TB
analytics engine needs, each with the scale-correct Spark formulation and a
bit-exact DuckDB oracle:

- ``range_join_coactivity`` — KEYLESS time-range join (bucketed; the naive
  plan is a cartesian product),
- ``concurrent_sessions_hourly`` — interval-overlap concurrency via bounded
  fan-out (no global sweep state),
- ``skyline_parts_by_brand`` — groupwise Pareto frontier (skyline operator),
- ``snapshot_diff_orders`` — full-snapshot reconciliation diff
  (added / removed / changed with per-column change list),
- ``bigram_lift_topk`` — adjacent-pair mining with exact-integer lift
  (one BPE-style merge-candidate round),
- ``setsim_prefix_jaccard_join`` — set-similarity join with prefix
  filtering (PPJoin-family pruning; Xiao et al., WWW'08 — public
  algorithm, re-derived for DataFrame form),
- ``triangle_count_copurchase`` — degree-ordered-orientation triangle
  counting (hub-safe O(m^1.5) wedge join),
- ``longest_daily_streak_per_user`` — gaps-and-islands consecutive-day
  streaks (day − row_number anchor),
- ``revenue_share_within_region`` — ratio-to-report hierarchical share,
- ``top_parts_with_other_rollup`` — top-N per group + OTHER rollup,
- ``temporal_holdout_split`` — leakage-safe last-k-days eval split,
- ``heavy_hitter_words`` — TWO-PASS Misra-Gries heavy hitters (sketch
  candidates, exact recount — deterministic, so strong-checkable).

The streaming twin of the keyless range join lives in
``streaming/range_join.py``.

House rules as everywhere (SURVEY.md §5.2): identical aliases both sides,
deterministic tiebreaks, ratio arithmetic kept on exact int64 products cast
to double for ONE final division (bit-identical across engines), timestamps
surfaced as formatted strings.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from kafka_streams_tcp_reconciliation_spark.operators.joins import bucketed_range_join
from kafka_streams_tcp_reconciliation_spark.plans import register
from kafka_streams_tcp_reconciliation_spark.sources.tables import load_table

_TS_FMT = "yyyy-MM-dd HH:mm:ss"
_GAP_MIN = 30  # session gap, minutes — same knob as session_window_stats
_COACT_RADIUS_S = 300  # ±5 minutes
_SETSIM_TAU = 0.9

# Shared 30-min-gap sessionization (the same construction as
# plans/sequences.session_event_paths): CTE text for the DuckDB oracles,
# DataFrame builder for the Spark side — one definition, every session
# query (ONE user_id shuffle feeds both stacked windows; Catalyst reuses
# the exchange and sort).
_SESS_SPANS_SQL = f"""
    flagged AS (
        SELECT user_id, ts, event_id,
               CASE WHEN lag(ts) OVER w IS NULL
                         OR ts - lag(ts) OVER w >= INTERVAL '{_GAP_MIN} minutes'
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
    spans AS (
        SELECT user_id, session_id,
               min(ts) AS s_start, max(ts) AS s_end, count(*) AS n_events
        FROM sessions GROUP BY user_id, session_id
    )"""


def _session_spans(ev: DataFrame) -> DataFrame:
    """(user_id, session_id, s_start, s_end, n_events) under the 30-min
    inactivity-gap sessionization — the Spark twin of ``_SESS_SPANS_SQL``."""
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gap_ok = (F.col("ts") - F.lag("ts").over(w)) >= F.expr(
        f"INTERVAL {_GAP_MIN} MINUTES"
    )
    flagged = ev.select(
        "user_id",
        "ts",
        "event_id",
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
    return sessions.groupBy("user_id", "session_id").agg(
        F.min("ts").alias("s_start"),
        F.max("ts").alias("s_end"),
        F.count(F.lit(1)).alias("n_events"),
    )


# --- keyless bucketed time-range join ---------------------------------------


@register(
    "range_join_coactivity",
    oracle=f"""
    SELECT p.event_id,
           count(DISTINCT CASE WHEN o.user_id <> p.user_id
                               THEN o.user_id END) AS n_coactive_users
    FROM (SELECT * FROM events WHERE event_type = 'purchase') p
    LEFT JOIN events o
      ON o.ts BETWEEN p.ts - INTERVAL '{_COACT_RADIUS_S} seconds'
                  AND p.ts + INTERVAL '{_COACT_RADIUS_S} seconds'
    GROUP BY p.event_id
    """,
)
def range_join_coactivity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Keyless time-range join: for every purchase, how many DISTINCT other
    users had any event within ±5 minutes (site-wide co-activity — no
    shared key between the two sides).

    Scale: the naive plan is a BroadcastNestedLoopJoin over |purchases| ×
    |events|; ``operators/joins.bucketed_range_join`` turns it into an
    equi-shuffle on a 5-minute int64 bucket (probe side exploded into the
    3 touchable buckets, build side single home bucket), so cost is bounded
    by event density per window, not |L|·|R|. Left-join + conditional
    distinct count keeps zero-co-activity purchases in the result.
    """
    ev = load_table(spark, sf_dir, "events")
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "event_id", "ts", "user_id"
    )
    others = ev.select(
        F.col("user_id").alias("o_user"), F.col("ts").alias("o_ts")
    )
    joined = bucketed_range_join(
        purchases, others, "ts", "o_ts", _COACT_RADIUS_S, how="left",
        left_alias="p", right_alias="o",
    )
    return joined.groupBy(F.col("p.event_id").alias("event_id")).agg(
        F.count_distinct(
            F.when(F.col("o.o_user") != F.col("p.user_id"), F.col("o.o_user"))
        ).alias("n_coactive_users")
    )


# --- interval-overlap concurrency -------------------------------------------


@register(
    "concurrent_sessions_hourly",
    oracle=f"""
    WITH {_SESS_SPANS_SQL},
    hours AS (
        SELECT user_id,
               unnest(generate_series(date_trunc('hour', s_start),
                                      date_trunc('hour', s_end),
                                      INTERVAL 1 HOUR)) AS h
        FROM spans
    )
    SELECT strftime(h, '%Y-%m-%d %H:%M:%S') AS hour,
           count(*) AS n_sessions,
           count(DISTINCT user_id) AS n_users
    FROM hours GROUP BY hour
    """,
)
def concurrent_sessions_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interval-overlap concurrency: how many user sessions (30-min gap
    sessionization) overlap each hour of the calendar.

    Scale: the textbook answer is a global start/+1 end/−1 sweep — a
    single-partition running sum that cannot distribute. This formulation
    explodes each session interval into the hour buckets it covers
    (fan-out bounded by session length, here single digits) and counts per
    bucket: every stage is a keyed shuffle with map-side combine. The
    session build reuses the stacked-window single-shuffle shape of
    ``session_event_paths``.
    """
    spans = _session_spans(load_table(spark, sf_dir, "events"))
    hours = spans.select(
        "user_id",
        F.explode(
            F.sequence(
                F.date_trunc("hour", F.col("s_start")),
                F.date_trunc("hour", F.col("s_end")),
                F.expr("INTERVAL 1 HOUR"),
            )
        ).alias("h"),
    )
    return hours.groupBy(
        F.date_format("h", _TS_FMT).alias("hour")
    ).agg(
        F.count(F.lit(1)).alias("n_sessions"),
        F.count_distinct("user_id").alias("n_users"),
    )


# --- groupwise skyline (Pareto frontier) ------------------------------------


@register(
    "skyline_parts_by_brand",
    oracle="""
    WITH pts AS (
        SELECT p_brand, p_retailprice AS price, p_size AS size,
               count(*) AS n_parts
        FROM part GROUP BY p_brand, p_retailprice, p_size
    )
    SELECT p_brand, price, size, n_parts
    FROM pts p
    WHERE NOT EXISTS (
        SELECT 1 FROM pts q
        WHERE q.p_brand = p.p_brand
          AND q.price <= p.price AND q.size >= p.size
          AND (q.price < p.price OR q.size > p.size)
    )
    """,
)
def skyline_parts_by_brand(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Groupwise skyline: per brand, the Pareto frontier of parts under
    (minimize retail price, maximize size) — no other part of the brand is
    both cheaper-or-equal AND larger-or-equal with one strict.

    Scale: the oracle's NOT-EXISTS is the quadratic dominance definition
    (an intentionally INDEPENDENT formulation — real verification power).
    The Spark plan is the O(n log n) sort-based skyline: distinct points,
    keep the max size per (brand, price), then a running max-size over
    strictly-cheaper points; a point survives iff it strictly beats that
    running max. Both windows partition by brand — no global sort, and
    frontier extraction is one shuffle on the brand key.
    """
    part = load_table(spark, sf_dir, "part")
    pts = part.groupBy(
        "p_brand",
        F.col("p_retailprice").alias("price"),
        F.col("p_size").alias("size"),
    ).agg(F.count(F.lit(1)).alias("n_parts"))
    per_price = pts.withColumn(
        "__mx", F.max("size").over(Window.partitionBy("p_brand", "price"))
    ).filter(F.col("size") == F.col("__mx"))
    w_prev = (
        Window.partitionBy("p_brand")
        .orderBy("price")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    sky = per_price.withColumn("__prev", F.max("size").over(w_prev)).filter(
        F.col("__prev").isNull() | (F.col("size") > F.col("__prev"))
    )
    return sky.select("p_brand", "price", "size", "n_parts")


# --- snapshot reconciliation diff -------------------------------------------

# The "new" snapshot is DERIVED deterministically from orders so both
# engines rebuild the identical pair of tables: orderkey % 97 == 0 rows are
# deleted; % 13 == 0 rows get price += 10.0 and status 'X' (exact double
# add — no rounding divergence surface); % 89 == 0 rows are additionally
# cloned with key + 100000000 (inserts).
_DIFF_B_SQL = """
        SELECT o_orderkey,
               CASE WHEN o_orderkey % 13 = 0 THEN 'X'
                    ELSE o_orderstatus END AS o_orderstatus,
               CASE WHEN o_orderkey % 13 = 0 THEN o_totalprice + 10.0
                    ELSE o_totalprice END AS o_totalprice,
               o_custkey, o_orderdate, o_orderpriority
        FROM orders WHERE o_orderkey % 97 <> 0
        UNION ALL
        SELECT o_orderkey + 100000000, o_orderstatus, o_totalprice,
               o_custkey, o_orderdate, o_orderpriority
        FROM orders WHERE o_orderkey % 89 = 0
"""


@register(
    "snapshot_diff_orders",
    oracle=f"""
    WITH b AS ({_DIFF_B_SQL})
    SELECT coalesce(a.o_orderkey, b.o_orderkey) AS o_orderkey,
           CASE WHEN a.o_orderkey IS NULL THEN 'added'
                WHEN b.o_orderkey IS NULL THEN 'removed'
                ELSE 'changed' END AS change_type,
           CASE WHEN a.o_orderkey IS NULL OR b.o_orderkey IS NULL THEN NULL
                ELSE concat_ws(',',
                     CASE WHEN a.o_orderstatus <> b.o_orderstatus
                          THEN 'o_orderstatus' END,
                     CASE WHEN a.o_totalprice <> b.o_totalprice
                          THEN 'o_totalprice' END,
                     CASE WHEN a.o_custkey <> b.o_custkey
                          THEN 'o_custkey' END)
           END AS changed_cols
    FROM orders a FULL OUTER JOIN b ON a.o_orderkey = b.o_orderkey
    WHERE a.o_orderkey IS NULL OR b.o_orderkey IS NULL
       OR a.o_orderstatus <> b.o_orderstatus
       OR a.o_totalprice <> b.o_totalprice
       OR a.o_custkey <> b.o_custkey
    """,
)
def snapshot_diff_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Snapshot reconciliation diff — the batch analogue of the reference's
    changelog semantics: given yesterday's and today's full table snapshots,
    emit added / removed / changed keys with the list of changed columns
    (the input a CDC or SCD2 pipeline needs when no changelog exists).

    Scale: one full-outer sort-merge join on the primary key; column
    comparison is narrow per-row JVM work. At 100 TB both snapshots would
    be bucketed by key, making the join exchange-free.
    """
    orders = load_table(spark, sf_dir, "orders")
    a = orders
    b_updated = (
        orders.filter(F.col("o_orderkey") % 97 != 0)
        .withColumn(
            "o_orderstatus",
            F.when(F.col("o_orderkey") % 13 == 0, F.lit("X")).otherwise(
                F.col("o_orderstatus")
            ),
        )
        .withColumn(
            "o_totalprice",
            F.when(
                F.col("o_orderkey") % 13 == 0, F.col("o_totalprice") + F.lit(10.0)
            ).otherwise(F.col("o_totalprice")),
        )
    )
    b_inserted = orders.filter(F.col("o_orderkey") % 89 == 0).withColumn(
        "o_orderkey", F.col("o_orderkey") + F.lit(100000000)
    )
    b = b_updated.select(orders.columns).unionByName(
        b_inserted.select(orders.columns)
    )

    aj, bj = a.alias("a"), b.alias("b")
    ak, bk = F.col("a.o_orderkey"), F.col("b.o_orderkey")
    diff_status = F.col("a.o_orderstatus") != F.col("b.o_orderstatus")
    diff_price = F.col("a.o_totalprice") != F.col("b.o_totalprice")
    diff_cust = F.col("a.o_custkey") != F.col("b.o_custkey")
    joined = aj.join(bj, ak == bk, "full_outer")
    return joined.filter(
        ak.isNull() | bk.isNull() | diff_status | diff_price | diff_cust
    ).select(
        F.coalesce(ak, bk).alias("o_orderkey"),
        F.when(ak.isNull(), F.lit("added"))
        .when(bk.isNull(), F.lit("removed"))
        .otherwise(F.lit("changed"))
        .alias("change_type"),
        F.when(ak.isNull() | bk.isNull(), F.lit(None).cast("string"))
        .otherwise(
            F.concat_ws(
                ",",
                F.when(diff_status, F.lit("o_orderstatus")),
                F.when(diff_price, F.lit("o_totalprice")),
                F.when(diff_cust, F.lit("o_custkey")),
            )
        )
        .alias("changed_cols"),
    )


# --- adjacent-pair mining (one BPE merge-candidate round) -------------------


@register(
    "bigram_lift_topk",
    oracle="""
    WITH t AS (SELECT string_split(text, ' ') AS toks FROM documents),
    pairs AS (
        SELECT unnest(toks[1:len(toks)-1]) AS w1,
               unnest(toks[2:len(toks)])   AS w2
        FROM t WHERE len(toks) >= 2
    ),
    bi AS (SELECT w1, w2, count(*) AS n_pair FROM pairs GROUP BY w1, w2),
    uni AS (
        SELECT w, count(*) AS n_w
        FROM (SELECT unnest(toks) AS w FROM t) GROUP BY w
    ),
    tot AS (SELECT sum(n_w) AS n1, (SELECT sum(n_pair) FROM bi) AS np FROM uni)
    SELECT b.w1, b.w2, b.n_pair,
           CAST(b.n_pair * t.n1 * t.n1 AS DOUBLE)
             / CAST(t.np * u1.n_w * u2.n_w AS DOUBLE) AS lift
    FROM bi b
    CROSS JOIN tot t
    JOIN uni u1 ON u1.w = b.w1
    JOIN uni u2 ON u2.w = b.w2
    ORDER BY b.n_pair DESC, b.w1, b.w2
    LIMIT 100
    """,
)
def bigram_lift_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Adjacent word-pair mining — one round of BPE-style merge-candidate
    scoring: count every adjacent token pair across the corpus and rank the
    top 100 by count with exact-integer lift
    (n_pair·N₁²) / (N_pairs·n_w1·n_w2).

    Scale: pair generation is NARROW (zip of two array slices — no
    positional self-join shuffle); pair and unigram counts are map-side
    combinable groupBys. The unigram join is broadcast here; at open-web
    vocabulary (>10⁸ types) it becomes a pair of shuffle joins on the
    token — noted, not silently assumed. Lift stays on int64 products with
    ONE final double division, so both engines produce identical bits.
    Ties broken (n_pair desc, w1, w2) — a deterministic top-k.
    """
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(F.split("text", " ").alias("toks"))
    n = F.size("toks")
    pairs = toks.filter(n >= 2).select(
        F.explode(
            F.zip_with(
                F.slice("toks", 1, n - 1),
                F.slice("toks", 2, n - 1),
                lambda x, y: F.struct(x.alias("w1"), y.alias("w2")),
            )
        ).alias("p")
    ).select("p.w1", "p.w2")
    bi = pairs.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("n_pair"))
    uni = (
        toks.select(F.explode("toks").alias("w"))
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("n_w"))
    )
    tot = uni.agg(F.sum("n_w").alias("n1")).crossJoin(
        bi.agg(F.sum("n_pair").alias("np"))
    )
    out = (
        bi.join(F.broadcast(tot))
        .join(
            F.broadcast(uni.select(F.col("w").alias("w1"), F.col("n_w").alias("n_w1"))),
            "w1",
        )
        .join(
            F.broadcast(uni.select(F.col("w").alias("w2"), F.col("n_w").alias("n_w2"))),
            "w2",
        )
        .select(
            "w1",
            "w2",
            "n_pair",
            (
                (F.col("n_pair") * F.col("n1") * F.col("n1")).cast("double")
                / (F.col("np") * F.col("n_w1") * F.col("n_w2")).cast("double")
            ).alias("lift"),
        )
    )
    return out.orderBy(F.col("n_pair").desc(), "w1", "w2").limit(100)


# --- set-similarity join with prefix filtering (PPJoin family) --------------


@register(
    "setsim_prefix_jaccard_join",
    oracle=f"""
    WITH tok AS (
        SELECT DISTINCT doc_id, lang, source,
               unnest(string_split(text, ' ')) AS w
        FROM documents
    ),
    sz AS (SELECT doc_id, count(*) AS n_tok FROM tok GROUP BY doc_id),
    dfreq AS (SELECT w, count(*) AS df FROM tok GROUP BY w),
    ranked AS (
        SELECT t.doc_id, t.lang, t.source, t.w,
               row_number() OVER (PARTITION BY t.doc_id ORDER BY d.df, t.w)
                   AS rn
        FROM tok t JOIN dfreq d ON d.w = t.w
    ),
    prefix AS (
        SELECT r.doc_id, r.lang, r.source, r.w, r.rn, s.n_tok
        FROM ranked r JOIN sz s ON s.doc_id = r.doc_id
        WHERE r.rn <= s.n_tok - CAST(ceil({_SETSIM_TAU} * s.n_tok) AS BIGINT) + 1
    ),
    cand AS (
        SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
        FROM prefix a JOIN prefix b
          ON a.lang = b.lang AND a.source = b.source
         AND a.w = b.w AND a.doc_id < b.doc_id
         AND b.n_tok >= {_SETSIM_TAU} * a.n_tok - 1e-9
         AND b.n_tok <= a.n_tok / {_SETSIM_TAU} + 1e-9
         AND 1 + least(a.n_tok - a.rn, b.n_tok - b.rn)
             >= {_SETSIM_TAU} / (1 + {_SETSIM_TAU})
                * (a.n_tok + b.n_tok) - 1e-9
    ),
    overlap AS (
        SELECT c.doc_a, c.doc_b, count(*) AS ov
        FROM cand c
        JOIN tok ta ON ta.doc_id = c.doc_a
        JOIN tok tb ON tb.doc_id = c.doc_b AND tb.w = ta.w
        GROUP BY c.doc_a, c.doc_b
    )
    SELECT o.doc_a, o.doc_b,
           round(CAST(o.ov AS DOUBLE)
                 / CAST(sa.n_tok + sb.n_tok - o.ov AS DOUBLE), 6) AS jaccard
    FROM overlap o
    JOIN sz sa ON sa.doc_id = o.doc_a
    JOIN sz sb ON sb.doc_id = o.doc_b
    WHERE CAST(o.ov AS DOUBLE)
          / CAST(sa.n_tok + sb.n_tok - o.ov AS DOUBLE) >= {_SETSIM_TAU}
    """,
)
def setsim_prefix_jaccard_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Set-similarity self-join with PREFIX FILTERING (PPJoin-family,
    Xiao et al. WWW'08 — public algorithm): document pairs in the same
    (lang, source) ingestion block with token Jaccard ≥ 0.9, generating
    candidates only from each document's prefix — its
    (|d| − ⌈τ·|d|⌉ + 1) globally-rarest tokens — since two sets sharing
    no prefix token cannot reach overlap ⌈τ·|d|⌉.

    Versus the full inverted-index join (``dedup_ngram_jaccard``): the
    index holds only prefix tokens, rarest-first, so on a natural long-tail
    vocabulary candidate fan-out collapses (stop-word buckets never enter
    the index). This synthetic corpus is a SMALL-vocabulary word soup where
    every "rare" token still has df in the thousands — prefix filtering
    alone degenerates to all-pairs — so the candidate join also blocks on
    (lang, source) — the incremental within-ingestion-batch dedup
    semantics (cross-batch near-dups are the MinHash-LSH family's job) —
    and applies PPJoin's LENGTH filter (tau*|a| <= |b| <= |a|/tau) and
    POSITIONAL filter (overlap reachable from the shared prefix ranks
    must meet tau/(1+tau)*(|a|+|b|)), both lossless for Jaccard >= tau
    and both decisive on this corpus: the round-7 sf1.0 sweep measured
    the unfiltered candidate join at 74.6 s (~30x for 10x docs) vs
    17.9 s with them — and the remaining time is OUTPUT-bound: this
    word soup genuinely contains 1.12M Jaccard>=0.9 pairs at 50k docs
    (distinct-token sets over a 31-word vocabulary collapse toward each
    other), so the result set itself is quadratic and the filters leave
    per-result cost flat (SCALE.md round-7 section). The global
    token ordering is (df, token) via a per-document window over a df-join
    — NO vocabulary-sized global sort. Verification is an exact overlap
    count on candidates only. The oracle mirrors the pipeline
    stage-for-stage; a property test separately checks the prefix filter
    loses no true pair vs brute force.
    """
    docs = load_table(spark, sf_dir, "documents")
    tok = docs.select(
        "doc_id",
        "lang",
        "source",
        F.explode(F.array_distinct(F.split("text", " "))).alias("w"),
    )
    sz = tok.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_tok"))
    dfreq = tok.groupBy("w").agg(F.count(F.lit(1)).alias("df"))
    ranked = tok.join(dfreq, "w").withColumn(
        "rn",
        F.row_number().over(Window.partitionBy("doc_id").orderBy("df", "w")),
    )
    plen = (
        F.col("n_tok")
        - F.ceil(F.lit(_SETSIM_TAU) * F.col("n_tok")).cast("long")
        + 1
    )
    prefix = (
        ranked.join(sz, "doc_id")
        .filter(F.col("rn") <= plen)
        .select("doc_id", "lang", "source", "w", "rn", "n_tok")
    )
    # PPJoin's two other LOSSLESS prunes (both verified exactly
    # downstream, and both carried with a 1e-9 slack so float boundaries
    # can only ADMIT an extra candidate, never drop a true pair; the
    # oracle applies bit-identical predicates so candidates — and
    # therefore results — stay engine-equal):
    #  - length filter: J >= tau forces tau*|a| <= |b| <= |a|/tau. On
    #    this 31-word-vocabulary corpus it is the decisive prune — the
    #    round-7 sf1.0 sweep measured the prefix filter alone degrading
    #    toward all-pairs (74.6 s, ~30x for 10x docs) because every
    #    token's df is in the thousands; near-equal-length blocking is
    #    what keeps the candidate set ~linear.
    #  - positional filter: the overlap reachable from a shared prefix
    #    token at ranks (ra, rb) is at most 1 + min(|a|-ra, |b|-rb),
    #    which must reach ceil(tau/(1+tau)*(|a|+|b|)).
    tau = float(_SETSIM_TAU)
    cand = (
        prefix.alias("a")
        .join(
            prefix.alias("b"),
            (F.col("a.lang") == F.col("b.lang"))
            & (F.col("a.source") == F.col("b.source"))
            & (F.col("a.w") == F.col("b.w"))
            & (F.col("a.doc_id") < F.col("b.doc_id"))
            & (F.col("b.n_tok") >= tau * F.col("a.n_tok") - 1e-9)
            & (F.col("b.n_tok") <= F.col("a.n_tok") / tau + 1e-9)
            & (
                1
                + F.least(
                    F.col("a.n_tok") - F.col("a.rn"),
                    F.col("b.n_tok") - F.col("b.rn"),
                )
                >= tau / (1 + tau) * (F.col("a.n_tok") + F.col("b.n_tok"))
                - 1e-9
            ),
        )
        .select(
            F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b")
        )
        .distinct()
    )
    ta = tok.select(F.col("doc_id").alias("doc_a"), "w")
    tb = tok.select(F.col("doc_id").alias("doc_b"), "w")
    overlap = (
        cand.join(ta, "doc_a").join(tb, ["doc_b", "w"]).groupBy("doc_a", "doc_b")
        .agg(F.count(F.lit(1)).alias("ov"))
    )
    sa = sz.select(F.col("doc_id").alias("doc_a"), F.col("n_tok").alias("sa"))
    sb = sz.select(F.col("doc_id").alias("doc_b"), F.col("n_tok").alias("sb"))
    jac = F.col("ov").cast("double") / (
        F.col("sa") + F.col("sb") - F.col("ov")
    ).cast("double")
    return (
        overlap.join(sa, "doc_a")
        .join(sb, "doc_b")
        .filter(jac >= _SETSIM_TAU)
        .select("doc_a", "doc_b", F.round(jac, 6).alias("jaccard"))
    )


# --- co-purchase graph (shared edge derivation) -------------------------------

# Edges = part pairs co-ordered >= 2 times, u < v. Shared by the triangle
# count and the 2-hop reach below (same construction as
# graph_degree_distribution). The oracle-side CTE is the id-ordered SQL twin.
_COPURCHASE_EDGES_SQL = """
    op AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
    edges AS (
        SELECT a.l_partkey AS u, b.l_partkey AS v
        FROM op a JOIN op b
          ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
        GROUP BY a.l_partkey, b.l_partkey
        HAVING count(*) >= 2
    )"""


def _copurchase_per_order(li: DataFrame) -> DataFrame:
    """(l_orderkey, ps) — the sorted DISTINCT part set of each order, the
    shared narrow base of every co-purchase consumer (collect_set dedups
    within the one aggregate, saving a separate distinct shuffle)."""
    return li.groupBy("l_orderkey").agg(
        F.sort_array(F.collect_set("l_partkey")).alias("ps")
    )


def _copurchase_pair_counts(per_order: DataFrame) -> DataFrame:
    """(u, v, n_co) co-order counts for every part pair, u < v. Pair
    generation is NARROW: u<v pairs emitted by a HOF over the per-order
    part arrays (bounded by basket size) — one shuffle total, measured
    ~2× faster than the equivalent self-join on l_orderkey at sf0.1
    (round 13 extends the shape to part_pair_cooccurrence and
    graph_degree_distribution, which still paid the self-join)."""
    pair_expr = (
        "flatten(transform(ps, (x, i) ->"
        " transform(slice(ps, i + 2, size(ps) - i - 1),"
        " y -> struct(x AS u, y AS v))))"
    )
    return (
        per_order.select(F.explode(F.expr(pair_expr)).alias("e"))
        .select("e.u", "e.v")
        .groupBy("u", "v")
        .agg(F.count(F.lit(1)).alias("n_co"))
    )


def _copurchase_edges(li: DataFrame) -> DataFrame:
    """(u, v) co-purchase edges (co-ordered >= 2 times), u < v."""
    return (
        _copurchase_pair_counts(_copurchase_per_order(li))
        .filter(F.col("n_co") >= 2)
        .select("u", "v")
    )


# --- triangle counting (degree-ordered orientation) --------------------------


@register(
    "triangle_count_copurchase",
    oracle=f"""
    WITH {_COPURCHASE_EDGES_SQL}
    SELECT (SELECT count(*) FROM edges) AS n_edges,
           (SELECT count(*)
            FROM edges e1
            JOIN edges e2 ON e2.u = e1.v
            JOIN edges e3 ON e3.u = e1.u AND e3.v = e2.v) AS n_triangles
    """,
)
def triangle_count_copurchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Triangle count of the part co-purchase graph (same edge set as
    ``graph_degree_distribution``: part pairs co-ordered ≥ 2 times) — the
    clustering-structure diagnostic (triangles / wedges = global
    clustering coefficient numerator).

    Scale: the Spark plan uses DEGREE-ORDERED ORIENTATION (each edge
    directed from its (degree, id)-smaller endpoint), which bounds
    per-node out-degree by O(√m), then counts triangles EDGE-ITERATOR
    style: per oriented edge (src, dst), |N⁺(src) ∩ N⁺(dst)| via
    array_intersect over the two out-adjacency lists. Compared to the
    wedge-join formulation this never materializes the O(m^1.5) wedge
    set through a shuffle — the only corpus-sized relations are the edge
    list and the O(√m)-bounded adjacency lists — and one final
    aggregation yields BOTH outputs (count(*) over oriented edges IS the
    edge count), removing a separate count pass + crossJoin. The oracle
    is the INDEPENDENT id-ordered 3-way self-join (a<b<c), correct at
    oracle scale: two formulations must agree on the count, a real
    cross-check of the orientation logic.
    """
    edges = _copurchase_edges(load_table(spark, sf_dir, "lineitem")).cache()
    # cache: consumed 2× (degrees, orientation) — without the barrier
    # Catalyst re-runs the pair generation per consumer
    deg = (
        edges.select(F.explode(F.array("u", "v")).alias("node"))
        .groupBy("node")
        .agg(F.count(F.lit(1)).alias("deg"))
    )
    du = deg.select(F.col("node").alias("u"), F.col("deg").alias("du"))
    dv = deg.select(F.col("node").alias("v"), F.col("deg").alias("dv"))
    withdeg = edges.join(du, "u").join(dv, "v")
    # orient src -> dst by (degree, id) ascending
    oriented = withdeg.select(
        F.when(
            (F.col("du") < F.col("dv"))
            | ((F.col("du") == F.col("dv")) & (F.col("u") < F.col("v"))),
            F.struct(F.col("u").alias("src"), F.col("v").alias("dst")),
        )
        .otherwise(
            F.struct(F.col("v").alias("src"), F.col("u").alias("dst"))
        )
        .alias("e")
    ).select("e.src", "e.dst")
    # out-adjacency under the orientation; sorted so array_intersect's
    # cost profile is deterministic. Out-degree ≤ O(√m) bounds list width.
    adj = oriented.groupBy("src").agg(
        F.sort_array(F.collect_set("dst")).alias("nbrs")
    )
    a_src = adj.select(F.col("src"), F.col("nbrs").alias("nbrs_s"))
    a_dst = adj.select(
        F.col("src").alias("dst"), F.col("nbrs").alias("nbrs_d")
    )
    # left joins: a sink dst has no out-list; it closes zero triangles
    per_edge = oriented.join(a_src, "src", "left").join(a_dst, "dst", "left")
    return per_edge.agg(
        F.count(F.lit(1)).alias("n_edges"),
        F.coalesce(
            F.sum(
                F.size(
                    F.array_intersect(
                        F.coalesce("nbrs_s", F.array()),
                        F.coalesce("nbrs_d", F.array()),
                    )
                )
            ),
            F.lit(0),
        ).alias("n_triangles"),
    )


# --- gaps-and-islands: longest daily activity streak -------------------------


@register(
    "longest_daily_streak_per_user",
    oracle="""
    WITH days AS (
        SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM events
    ),
    anchored AS (
        SELECT user_id, day,
               day - CAST(row_number() OVER (
                   PARTITION BY user_id ORDER BY day) AS INTEGER) AS grp
        FROM days
    ),
    streaks AS (
        SELECT user_id, grp, count(*) AS streak_len
        FROM anchored GROUP BY user_id, grp
    )
    SELECT user_id,
           max(streak_len) AS longest_streak,
           CAST(sum(streak_len) AS BIGINT) AS n_active_days
    FROM streaks GROUP BY user_id
    """,
)
def longest_daily_streak_per_user(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gaps-and-islands: each user's longest run of CONSECUTIVE active
    calendar days. The island anchor is the classic trick — day minus
    row_number is constant within a consecutive run — turning streak
    detection into a plain groupBy (no iterative self-join).

    Scale: dedup to (user, day) first (map-side combinable, collapses
    event volume to ≤ users × days), ONE shuffle on user_id feeds the
    row_number window, and both rollups reuse that partitioning. All
    arithmetic is date/int — exact on both engines.
    """
    ev = load_table(spark, sf_dir, "events")
    days = ev.select("user_id", F.col("ts").cast("date").alias("day")).distinct()
    anchored = days.withColumn(
        "grp",
        F.date_sub(
            "day",
            F.row_number()
            .over(Window.partitionBy("user_id").orderBy("day"))
            .cast("int"),
        ),
    )
    streaks = anchored.groupBy("user_id", "grp").agg(
        F.count(F.lit(1)).alias("streak_len")
    )
    return streaks.groupBy("user_id").agg(
        F.max("streak_len").alias("longest_streak"),
        F.sum("streak_len").alias("n_active_days"),
    )


# --- ratio-to-report: nation revenue share within region ---------------------

from kafka_streams_tcp_reconciliation_spark.functions import money as mny  # noqa: E402


@register(
    "revenue_share_within_region",
    oracle=f"""
    WITH nation_rev AS (
        SELECT r.r_name, n.n_name,
               CAST(sum({mny.rev_units()}) AS BIGINT) AS units
        FROM lineitem l
        JOIN orders o    ON o.o_orderkey = l.l_orderkey
        JOIN customer c  ON c.c_custkey = o.o_custkey
        JOIN nation n    ON n.n_nationkey = c.c_nationkey
        JOIN region r    ON r.r_regionkey = n.n_regionkey
        GROUP BY r.r_name, n.n_name
    )
    SELECT r_name, n_name,
           {mny.duck_money2("units", 100)} AS revenue,
           CAST(units AS DOUBLE)
             / CAST(sum(units) OVER (PARTITION BY r_name) AS DOUBLE)
               AS region_share,
           rank() OVER (PARTITION BY r_name ORDER BY units DESC)
               AS region_rank
    FROM nation_rev
    """,
)
def revenue_share_within_region(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ratio-to-report analytic: each nation's share of its region's
    revenue plus its in-region rank — the hierarchical percent-of-parent
    idiom (window aggregate over a grouped aggregate).

    Scale: one fact-side aggregation (dims broadcast as in q5), then a
    window over the NATION-level rollup — 25 rows, so the window exchange
    is trivial at any corpus size. Revenue is summed in exact 10⁻⁴-dollar
    integers (functions/money.py contract); the share is one division of
    two exact int64s — identical bits on both engines; the rank compares
    exact integers, so ties are engine-independent.
    """
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region")
    nation_rev = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .groupBy("r_name", "n_name")
        .agg(F.expr(f"CAST(sum({mny.rev_units()}) AS BIGINT)").alias("units"))
    )
    w_region = Window.partitionBy("r_name")
    return nation_rev.select(
        "r_name",
        "n_name",
        F.expr(mny.spark_money2("units", 100)).alias("revenue"),
        (
            F.col("units").cast("double")
            / F.sum("units").over(w_region).cast("double")
        ).alias("region_share"),
        F.rank()
        .over(w_region.orderBy(F.col("units").desc()))
        .cast("long")
        .alias("region_rank"),
    )


# --- reporting: top-N per group with OTHER rollup ----------------------------


@register(
    "top_parts_with_other_rollup",
    oracle=f"""
    WITH part_rev AS (
        SELECT p.p_brand, p.p_partkey, p.p_name,
               CAST(sum({mny.rev_units()}) AS BIGINT) AS units
        FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
        GROUP BY p.p_brand, p.p_partkey, p.p_name
    ),
    ranked AS (
        SELECT *, row_number() OVER (
            PARTITION BY p_brand ORDER BY units DESC, p_partkey) AS rn
        FROM part_rev
    )
    SELECT p_brand, part_label, revenue, n_parts FROM (
        SELECT p_brand, p_name AS part_label,
               {mny.duck_money2("units", 100)} AS revenue,
               CAST(1 AS BIGINT) AS n_parts
        FROM ranked WHERE rn <= 3
        UNION ALL
        SELECT p_brand, 'OTHER' AS part_label,
               {mny.duck_money2("sum(units)", 100)} AS revenue,
               count(*) AS n_parts
        FROM ranked WHERE rn > 3 GROUP BY p_brand
    )
    """,
)
def top_parts_with_other_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reporting idiom: per brand, the top-3 parts by revenue as named rows
    plus ONE 'OTHER' row rolling up the remainder — the top-N-plus-other
    shape every dashboard needs and plain SQL makes awkward.

    Scale: revenue rollup is the usual broadcast-dim aggregate in exact
    integer units; the rank is a WindowGroupLimit-friendly row_number per
    brand (deterministic tiebreak p_partkey); head and remainder reuse the
    same ranked subplan and union. No global sort.
    """
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    part_rev = (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .groupBy("p_brand", "p_partkey", "p_name")
        .agg(F.expr(f"CAST(sum({mny.rev_units()}) AS BIGINT)").alias("units"))
    )
    ranked = part_rev.withColumn(
        "rn",
        F.row_number().over(
            Window.partitionBy("p_brand").orderBy(
                F.col("units").desc(), F.col("p_partkey")
            )
        ),
    ).cache()  # head + remainder branches both consume the ranked rollup
    head = ranked.filter(F.col("rn") <= 3).select(
        "p_brand",
        F.col("p_name").alias("part_label"),
        F.expr(mny.spark_money2("units", 100)).alias("revenue"),
        F.lit(1).cast("long").alias("n_parts"),
    )
    other = (
        ranked.filter(F.col("rn") > 3)
        .groupBy("p_brand")
        .agg(
            F.expr(mny.spark_money2("sum(units)", 100)).alias("revenue"),
            F.count(F.lit(1)).alias("n_parts"),
        )
        .select(
            "p_brand",
            F.lit("OTHER").alias("part_label"),
            "revenue",
            "n_parts",
        )
    )
    return head.unionByName(other)


# --- temporal holdout split ---------------------------------------------------


@register(
    "temporal_holdout_split",
    oracle="""
    WITH bound AS (
        SELECT max(ts) - INTERVAL '3 days' AS cutoff FROM events
    )
    SELECT CASE WHEN ts < cutoff THEN 'train' ELSE 'eval' END AS split,
           event_type,
           count(*) AS n_events,
           count(DISTINCT user_id) AS n_users,
           strftime(min(ts), '%Y-%m-%d %H:%M:%S') AS first_ts,
           strftime(max(ts), '%Y-%m-%d %H:%M:%S') AS last_ts
    FROM events, bound
    GROUP BY split, event_type
    """,
)
def temporal_holdout_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temporal holdout: the last 3 days of event time become the eval
    split — the leakage-safe alternative to random splits for anything
    time-dependent (forecasting, churn, funnel models). Complements the
    hash-random ``split_train_valid_test``.

    Scale: the cutoff is ONE broadcast scalar (max ts); assignment is a
    per-row comparison, and the audit rollup is map-side combinable. No
    data is moved to make the split — downstream writers filter on the
    same predicate.
    """
    ev = load_table(spark, sf_dir, "events")
    bound = ev.agg(
        (F.max("ts") - F.expr("INTERVAL 3 DAYS")).alias("cutoff")
    )
    tagged = ev.join(F.broadcast(bound)).withColumn(
        "split",
        F.when(F.col("ts") < F.col("cutoff"), F.lit("train")).otherwise(
            F.lit("eval")
        ),
    )
    return tagged.groupBy("split", "event_type").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.count_distinct("user_id").alias("n_users"),
        F.date_format(F.min("ts"), _TS_FMT).alias("first_ts"),
        F.date_format(F.max("ts"), _TS_FMT).alias("last_ts"),
    )


# --- two-pass Misra-Gries heavy hitters --------------------------------------

_HH_K = 200  # report words with count > N/k


def _make_mg_kernel(k: int):
    """Factory for the per-partition Misra-Gries mapInPandas kernel.

    The returned generator is a fully self-contained CLOSURE (imports and
    state all inside) so cloudpickle ships it BY VALUE — executors of a
    foreign-cwd driver never need this package importable (the same rule
    every streaming FSM in this repo follows). MG semantics: k counters,
    one sequential pass; on overflow decrement every counter and drop
    zeros, so any item with partition count > n_p/(k+1) survives."""

    def mg_partition(batches):
        import pandas as pd

        counters: dict[str, int] = {}
        for pdf in batches:
            for w in pdf["word"]:
                if w in counters:
                    counters[w] += 1
                elif len(counters) < k:
                    counters[w] = 1
                else:
                    dead = [key for key in counters if counters[key] == 1]
                    for key in dead:
                        del counters[key]
                    for key in list(counters):
                        counters[key] -= 1
        yield pd.DataFrame({"word": list(counters.keys())})

    return mg_partition


@register(
    "heavy_hitter_words",
    oracle=f"""
    WITH w AS (SELECT unnest(string_split(text, ' ')) AS word FROM documents),
    tot AS (SELECT count(*) AS n FROM w)
    SELECT word, count(*) AS n_word
    FROM w, tot
    GROUP BY word, tot.n
    HAVING count(*) * {_HH_K} > tot.n
    """,
)
def heavy_hitter_words(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heavy hitters: every word with frequency > N/k (k={k}), found with
    the TWO-PASS Misra-Gries pattern — pass 1 runs an MG(k) summary per
    partition (constant memory, one sequential scan, Arrow-batched
    mapInPandas), pass 2 exactly recounts ONLY the candidate union and
    filters by the true threshold.

    Why this shape at 100 TB: a plain groupBy(word) shuffles the full
    token stream; here the shuffle carries at most (#partitions × k)
    candidate rows plus one broadcast of the candidate set back over the
    scan. The MG guarantee (any item with global count > N/(k·p-margin)
    survives in ≥1 partition summary) makes pass 2 EXACT, so the result is
    deterministic and partitioning-independent — which is why a plain
    GROUP BY ... HAVING oracle can strong-check an approximate-sketch
    pipeline. Candidate misses are impossible, not just unlikely.
    """.format(k=_HH_K)
    docs = load_table(spark, sf_dir, "documents")
    words = docs.select(F.explode(F.split("text", " ")).alias("word"))

    k = _HH_K
    candidates = words.mapInPandas(
        _make_mg_kernel(k), "word string"
    ).distinct()
    total = words.agg(F.count(F.lit(1)).alias("n"))
    exact = (
        words.join(F.broadcast(candidates), "word")
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("n_word"))
    )
    return (
        exact.join(F.broadcast(total))
        .filter(F.col("n_word") * k > F.col("n"))
        .select("word", "n_word")
    )


# --- count-min sketch with exact cross-check ---------------------------------

from kafka_streams_tcp_reconciliation_spark.functions import hashing as hsh  # noqa: E402

_CMS_D = 4  # hash rows
_CMS_W = 1024  # buckets per row
_CMS_TOPN = 50  # words whose frequency we estimate


def _cms_bucket_exprs(word_hash: str) -> list[str]:
    """The d bucket expressions ((a_k·x + b_k) mod P) mod W — dialect-
    neutral int64 arithmetic, generated once for BOTH engines from the
    shared universal family so the sketches cannot drift."""
    return [
        f"((({a} * ({word_hash})) + {b}) % {hsh.MOD}) % {_CMS_W}"
        for a, b in hsh.hash_params(_CMS_D)
    ]


def _cms_oracle_sql() -> str:
    x = hsh.duck_poly_hash("word")
    buckets = _cms_bucket_exprs("wx")
    cell_rows = "\nUNION ALL\n".join(
        f"SELECT {k} AS k, {b} AS bucket FROM wh" for k, b in enumerate(buckets)
    )
    probe_rows = "\nUNION ALL\n".join(
        f"SELECT word, n_exact, {k} AS k, {b} AS bucket FROM exact"
        for k, b in enumerate(buckets)
    )
    return f"""
    WITH w AS (SELECT unnest(string_split(text, ' ')) AS word FROM documents),
    wh AS (SELECT word, {x} AS wx FROM w),
    keyed AS ({cell_rows}),
    cells AS (SELECT k, bucket, count(*) AS cell_n FROM keyed GROUP BY k, bucket),
    exact AS (
        SELECT word, min(wx) AS wx, count(*) AS n_exact FROM wh GROUP BY word
        ORDER BY n_exact DESC, word LIMIT {_CMS_TOPN}
    ),
    probes AS ({probe_rows}),
    est AS (
        SELECT p.word, p.n_exact, min(c.cell_n) AS cms_est
        FROM probes p
        JOIN cells c ON c.k = p.k AND c.bucket = p.bucket
        GROUP BY p.word, p.n_exact
    )
    SELECT word, n_exact, cms_est FROM est
    """


@register("count_min_word_frequencies", oracle=_cms_oracle_sql())
def count_min_word_frequencies(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-min sketch: d={d} universal-hash rows × w={w} buckets over the
    token stream, then point-estimate the top-{n} words and surface the
    exact count next to the estimate (CMS guarantees est ≥ exact; the
    property test asserts it).

    Why strong-checkable: the sketch is DETERMINISTIC — both engines build
    the identical d×w cell table from the shared polynomial/universal hash
    family (functions/hashing.py), so the DuckDB oracle rebuilds the same
    sketch bit-for-bit, the same trick the MinHash/SimHash oracles use.

    Scale: the cell table is the whole shuffle — ≤ d·w rows regardless of
    corpus size (THE point of CMS at 100 TB: frequency telemetry with
    constant memory); probes broadcast the candidate set. All hash math is
    JVM-side int64 inside whole-stage codegen, no UDFs.
    """.format(d=_CMS_D, w=_CMS_W, n=_CMS_TOPN)
    docs = load_table(spark, sf_dir, "documents")
    words = docs.select(F.explode(F.split("text", " ")).alias("word"))
    wh = words.select(
        "word", F.expr(hsh.spark_poly_hash("word")).alias("wx")
    )
    buckets = _cms_bucket_exprs("wx")
    keyed = wh.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(k).alias("k"), F.expr(b).cast("long").alias("bucket")
                    )
                    for k, b in enumerate(buckets)
                ]
            )
        ).alias("kb")
    ).select("kb.k", "kb.bucket")
    cells = keyed.groupBy("k", "bucket").agg(F.count(F.lit(1)).alias("cell_n"))
    exact = (
        wh.groupBy("word")
        .agg(F.min("wx").alias("wx"), F.count(F.lit(1)).alias("n_exact"))
        .orderBy(F.col("n_exact").desc(), "word")
        .limit(_CMS_TOPN)
    )
    probes = exact.select(
        "word",
        "n_exact",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(k).alias("k"), F.expr(b).cast("long").alias("bucket")
                    )
                    for k, b in enumerate(buckets)
                ]
            )
        ).alias("kb"),
    ).select("word", "n_exact", "kb.k", "kb.bucket")
    return (
        F.broadcast(probes)
        .join(cells, ["k", "bucket"])
        .groupBy("word", "n_exact")
        .agg(F.min("cell_n").alias("cms_est"))
        .select("word", "n_exact", "cms_est")
    )


# --- sessionized bounce rate --------------------------------------------------


@register(
    "daily_bounce_rate",
    oracle=f"""
    WITH {_SESS_SPANS_SQL}
    SELECT strftime(CAST(s_start AS DATE), '%Y-%m-%d') AS day,
           count(*) AS n_sessions,
           CAST(sum(CASE WHEN n_events = 1 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_bounce,
           CAST(sum(CASE WHEN n_events = 1 THEN 1 ELSE 0 END) AS DOUBLE)
             / CAST(count(*) AS DOUBLE) AS bounce_rate
    FROM spans GROUP BY CAST(s_start AS DATE)
    """,
)
def daily_bounce_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sessionized bounce rate: per calendar day (of session start), the
    share of sessions containing exactly one event — the standard
    engagement KPI on top of gap sessionization.

    Scale: same single user_id shuffle as the other session queries; the
    daily rollup is date-bounded. The rate is one division of two exact
    int64 counts — identical bits on both engines.
    """
    spans = _session_spans(load_table(spark, sf_dir, "events"))
    bounce = F.sum(F.when(F.col("n_events") == 1, 1).otherwise(0))
    return spans.groupBy(
        F.date_format(F.col("s_start").cast("date"), "yyyy-MM-dd").alias("day")
    ).agg(
        F.count(F.lit(1)).alias("n_sessions"),
        bounce.cast("long").alias("n_bounce"),
        (bounce.cast("double") / F.count(F.lit(1)).cast("double")).alias(
            "bounce_rate"
        ),
    )


# --- chunked payload reassembly (multimodal ingest path) ----------------------

_N_CHUNKS = 3


@register(
    "chunk_reassembly_integrity",
    oracle=f"""
    WITH chunks AS (
        SELECT doc_id, i AS chunk_id,
               substring(text,
                         CAST((i * length(text)) / {_N_CHUNKS} AS BIGINT) + 1,
                         CAST(((i + 1) * length(text)) / {_N_CHUNKS} AS BIGINT)
                           - CAST((i * length(text)) / {_N_CHUNKS} AS BIGINT))
                   AS chunk
        FROM documents, (SELECT unnest(range(0, {_N_CHUNKS})) AS i)
        WHERE text IS NOT NULL
    ),
    reassembled AS (
        SELECT doc_id,
               count(*) AS n_chunks,
               md5(string_agg(chunk, '' ORDER BY chunk_id)) AS payload_md5
        FROM chunks GROUP BY doc_id
    )
    SELECT r.doc_id, r.n_chunks, r.payload_md5,
           r.payload_md5 = md5(d.text) AS intact
    FROM reassembled r JOIN documents d ON d.doc_id = r.doc_id
    """,
)
def chunk_reassembly_integrity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Chunked-payload reassembly — the multimodal ingest path: large
    payloads arrive as ordered chunks (here {n} deterministic substring
    thirds standing in for binary parts, since the corpus carries no true
    binary column); reassemble per asset and verify integrity against the
    source checksum.

    Scale: ONE shuffle on the asset key; chunks concatenate inside the
    aggregate (bytes per asset, bounded by payload size); the checksum
    join is by primary key. This is the plumbing a blob-ingest pipeline
    needs before any decode (functions/multimodal.py) can run.
    """.format(n=_N_CHUNKS)
    # a missing payload cannot be chunked (and concat-of-NULL semantics
    # diverge: Spark array_join skips NULLs, DuckDB string_agg nulls out)
    docs = load_table(spark, sf_dir, "documents").filter(
        F.col("text").isNotNull()
    )
    n = _N_CHUNKS
    chunk_struct = F.expr(
        f"transform(sequence(0, {n - 1}), i -> struct(i AS chunk_id,"
        f" substring(text, CAST((i * length(text)) / {n} AS BIGINT) + 1,"
        f" CAST(((i + 1) * length(text)) / {n} AS BIGINT)"
        f" - CAST((i * length(text)) / {n} AS BIGINT)) AS chunk))"
    )
    chunks = docs.select(
        "doc_id", F.explode(chunk_struct).alias("c")
    ).select("doc_id", "c.chunk_id", "c.chunk")
    reassembled = chunks.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_chunks"),
        F.md5(
            F.array_join(
                F.transform(
                    F.sort_array(F.collect_list(F.struct("chunk_id", "chunk"))),
                    lambda s: s["chunk"],
                ),
                "",
            )
        ).alias("payload_md5"),
    )
    src = docs.select("doc_id", F.md5("text").alias("src_md5"))
    return reassembled.join(src, "doc_id").select(
        "doc_id",
        "n_chunks",
        "payload_md5",
        (F.col("payload_md5") == F.col("src_md5")).alias("intact"),
    )


# --- kNN graph construction (IVF-cell-restricted) -----------------------------

from kafka_streams_tcp_reconciliation_spark.operators import similarity as sim  # noqa: E402
from kafka_streams_tcp_reconciliation_spark.operators.joins import asof_join  # noqa: E402

_KNN_K = 3


def _knn_graph_oracle(target_rows: int) -> str:
    """DuckDB oracle for the cell-refined kNN graph: replays the identical
    plane-count + sign-LSH subcell arithmetic, then exact top-k within
    (label, subcell)."""
    return f"""
    WITH base AS (
        SELECT * FROM embeddings WHERE label IS NOT NULL
    ),
    stats AS (
        SELECT count(*) AS kn_n, count(DISTINCT label) AS kn_nl FROM base
    ),
    planes AS (
        SELECT {sim.duck_knn_planes_expr("kn_n", "kn_nl", target_rows)} AS np
        FROM stats
    ),
    norms AS (
        SELECT b.vec_id, b.label,
               {sim.duck_subcell_expr("b.embedding", "p.np")} AS subcell,
               b.embedding,
               {sim.duck_dot_expr("b.embedding", "b.embedding")} AS self_dot
        FROM base b, planes p
    ),
    pairs AS (
        SELECT a.vec_id AS vec_id, b.vec_id AS neighbor_id,
               round(({sim.duck_dot_expr("a.embedding", "b.embedding")})
                     / sqrt(a.self_dot * b.self_dot), 6) AS score
        FROM norms a JOIN norms b
          ON a.label = b.label AND a.subcell = b.subcell
         AND a.vec_id <> b.vec_id
    ),
    ranked AS (
        SELECT *, row_number() OVER (
            PARTITION BY vec_id ORDER BY score DESC, neighbor_id) AS rank
        FROM pairs
    )
    SELECT vec_id, neighbor_id, CAST(rank AS BIGINT) AS rank, score
    FROM ranked WHERE rank <= {_KNN_K}
    """


def _knn_graph_frame(
    spark: SparkSession, sf_dir: str, target_rows: int
) -> DataFrame:
    """Shared builder for the cell-refined kNN graph (see the registered
    queries below for semantics and scale posture)."""
    # NULL-label rows join to nothing in the relational formulation (and
    # the oracle), so they must not form a NULL group here
    emb = load_table(spark, sf_dir, "embeddings").filter(
        F.col("label").isNotNull()
    )
    # Data-proportional refinement (round 10): n and n_labels come from a
    # 1-row aggregate cross-joined back in (broadcast of one row — no
    # driver collect), so the plane count is decided by the DATA at plan
    # runtime and the oracle replays it exactly.
    stats = emb.agg(
        F.count(F.lit(1)).alias("kn_n"),
        F.countDistinct("label").alias("kn_nl"),
    )
    emb = (
        emb.crossJoin(F.broadcast(stats))
        .withColumn(
            "np", F.expr(sim.knn_planes_expr("kn_n", "kn_nl", target_rows))
        )
        .withColumn("subcell", F.expr(sim.subcell_expr("embedding", "np")))
        .select("vec_id", "label", "subcell", "embedding")
    )
    # local bindings: the kernel closure must be SELF-CONTAINED (captured
    # by value) — a foreign-cwd driver's workers can't import this package
    pairwise_blocked, k = sim.pairwise_cosine_blocked, _KNN_K

    def cell_topk(pdf):
        import numpy as np
        import pandas as pd

        ids = pdf["vec_id"].to_numpy()
        n = len(ids)
        # NULL embeddings pair with NULL cosine — they still rank (last,
        # ties by neighbor id), exactly like the SQL fold the oracle runs
        valid = [
            i for i in range(n) if pdf["embedding"].iloc[i] is not None
        ]
        m = len(valid)
        invalid_ids = sorted(
            int(ids[i]) for i in set(range(n)) - set(valid)
        )

        out = []
        # valid rows, scored block-by-block: per-task memory is capped at
        # block·|cell| doubles however large a skewed cell gets, and every
        # emitted double is bitwise-equal to the full-matrix kernel's (see
        # pairwise_cosine_blocked)
        if m >= 1:
            emb_valid = pdf["embedding"].iloc[valid].to_numpy()
            ids_valid = ids[np.asarray(valid)].astype("int64")
            for s0, M in pairwise_blocked(emb_valid):
                # vectorized per-row top-k: lexsort ascending by
                # (-score, neighbor id) in C, replacing a per-row Python
                # sorted() whose O(m log m) interpreted comparisons made
                # the kernel the sf30 wall-clock bottleneck (round 9).
                # NaN scores (zero-norm vectors) are GREATEST in Spark's
                # sort order; negation maps them through -inf so lexsort
                # (NaN-last ascending) ranks them FIRST like the fold.
                neg_block = np.where(np.isnan(M), -np.inf, -M)
                for bi in range(M.shape[0]):
                    p = s0 + bi  # position in the valid list
                    row = M[bi]
                    order = np.lexsort((ids_valid, neg_block[bi]))
                    # self (p) can only displace a winner if it ranks in
                    # the first k+1, so k+1 candidates always suffice —
                    # walking the FULL order in Python was an O(m)-per-row
                    # tail that re-serialized the kernel at sf30
                    top = [int(q) for q in order[: k + 1] if q != p][:k]
                    picks = [
                        (int(ids_valid[q]), float(row[q])) for q in top
                    ]
                    # NULL-embedding candidates rank behind every scored
                    # one (NULL cosine sorts last), smallest id first;
                    # their score is a true None (SQL NULL), not NaN —
                    # the oracle's NULL-list cosine folds to SQL NULL
                    for nid in invalid_ids[: k - len(picks)]:
                        picks.append((nid, None))
                    out.extend(
                        (int(ids[valid[p]]), nid, r, sc)
                        for r, (nid, sc) in enumerate(picks, 1)
                    )
        # NULL-embedding rows: every candidate scores NULL, so top-k is
        # the k smallest other ids (the oracle's NULL-last + id tiebreak)
        for gid in invalid_ids:
            others = sorted(int(v) for v in ids if int(v) != gid)[:k]
            out.extend(
                (gid, nid, r, None)
                for r, nid in enumerate(others, 1)
            )
        df = pd.DataFrame(
            [(a, b, c) for a, b, c, _ in out],
            columns=["vec_id", "neighbor_id", "rank"],
        )
        # object dtype so a None survives Arrow conversion as a true SQL
        # NULL (constructing the column as float64 would coerce it to
        # NaN ≠ NULL) — the same contract as governance.cluster_top_pair
        df["score"] = pd.Series([s for *_, s in out], dtype="object")
        return df

    return emb.groupBy("label", "subcell").applyInPandas(
        cell_topk,
        schema="vec_id long, neighbor_id long, rank long, score double",
    )


@register("knn_graph_within_cells", oracle=_knn_graph_oracle(sim.KNN_CELL_ROWS))
def knn_graph_within_cells(spark: SparkSession, sf_dir: str) -> DataFrame:
    """kNN GRAPH construction (the SemDeDup / graph-clustering / ANN-index
    prerequisite): each vector's top-k cosine neighbors, with candidates
    restricted to the vector's IVF cell — the standard corpus-scale
    recipe, since all-pairs kNN is quadratic.

    The cell is (label, sign-LSH subcell) with a DATA-PROPORTIONAL plane
    count (round 10): n_planes = smallest p with n_labels·2^p·target ≥ n,
    target = SPARK_GRAFT_KNN_CELL_ROWS (default 256), so expected cell
    size stays ~constant however large the corpus — cells ∝ corpus is the
    code's default now, not a SCALE.md footnote. At fixture scales
    (≤2560 vectors) n_planes = 0 and cells reduce to the historical
    per-label behavior; `knn_graph_cell_scaling` below pins a small
    target so the refinement path itself is differentially verified at
    sf0.01.

    Scale: ONE equi-shuffle on the cell id (groupBy → Arrow), then each
    cell's vectors are scored by the ROW-BLOCKED numpy cosine kernel
    (`operators/similarity.pairwise_cosine_blocked`) whose per-dimension
    accumulation replays the JVM fold order exactly — bit-identical
    scores and tiebreaks to the DuckDB oracle, at matrix speed instead
    of |cell|² interpreted folds (measured ~5× at sf0.1). Work is
    quadratic only within a cell, and cell size is held at ~target by
    the plane count, so total work is O(n · target); per-task MEMORY is
    capped at block·|cell| doubles since round 7, so one skewed cell
    degrades to more blocks instead of an executor OOM.
    """
    return _knn_graph_frame(spark, sf_dir, sim.KNN_CELL_ROWS)


# Calibration twin: a target small enough that sf0.01's 500 vectors refine
# to n_planes = 2 (4 subcells per label), so the dynamic-plane arithmetic
# and the refined grouping are exercised by the driver differential at
# fixture scale — the default query's n_planes is 0 there (same precedent
# as the sign-LSH τ-sweep keeping a production-τ query non-trivial).
_KNN_CALIB_CELL_ROWS = 16


@register(
    "knn_graph_cell_scaling", oracle=_knn_graph_oracle(_KNN_CALIB_CELL_ROWS)
)
def knn_graph_cell_scaling(spark: SparkSession, sf_dir: str) -> DataFrame:
    """`knn_graph_within_cells` with the per-cell row target pinned to 16:
    verifies the data-proportional refinement (plane-count fold, sign-LSH
    subcell, per-(label, subcell) exact top-k) against the oracle at a
    scale where it actually refines. Semantics identical, just a smaller
    target; see the default query for the full contract."""
    return _knn_graph_frame(spark, sf_dir, _KNN_CALIB_CELL_ROWS)


# --- conversion-lag percentiles ------------------------------------------------


@register(
    "conversion_lag_percentiles",
    oracle="""
    WITH conv AS (
        SELECT p.event_id, p.ts AS p_ts, c_ts
        FROM (
            SELECT p.event_id, p.ts,
                   c.ts AS c_ts,
                   row_number() OVER (
                       PARTITION BY p.event_id
                       ORDER BY c.ts DESC, c.event_id DESC) AS rn
            FROM (SELECT * FROM events WHERE event_type = 'purchase') p
            JOIN (SELECT * FROM events WHERE event_type = 'click') c
              ON p.user_id = c.user_id AND c.ts <= p.ts
        ) p WHERE rn = 1
    ),
    lags AS (
        SELECT strftime(CAST(p_ts AS DATE), '%Y-%m-%d') AS day,
               epoch_us(p_ts) - epoch_us(c_ts) AS lag_us
        FROM conv
    ),
    ranked AS (
        SELECT day, lag_us,
               row_number() OVER (PARTITION BY day ORDER BY lag_us) AS rn,
               count(*) OVER (PARTITION BY day) AS n
        FROM lags
    )
    SELECT day,
           count(*) AS n_conversions,
           max(CASE WHEN rn = (n + 1) // 2 THEN lag_us END)
               / 1000000.0 AS p50_lag_s,
           max(CASE WHEN rn = (9 * n + 9) // 10 THEN lag_us END)
               / 1000000.0 AS p90_lag_s,
           max(CASE WHEN rn = (99 * n + 99) // 100 THEN lag_us END)
               / 1000000.0 AS p99_lag_s
    FROM ranked GROUP BY day
    """,
)
def conversion_lag_percentiles(
    spark: SparkSession, sf_dir: str, events: DataFrame | None = None
) -> DataFrame:
    """Time-to-convert distribution: per purchase day, exact p50/p90/p99 of
    the lag between each purchase and that user's LAST PRIOR click — the
    reference's per-flow latency percentiles generalized to the funnel.

    Percentiles are NEAREST-RANK order statistics (rank ceil(q*n)) over
    INTEGER microsecond lags, not interpolated: lags live on an exact 1 µs
    grid, so an interpolated midpoint lands exactly on the rounding
    boundary where the engines' float association differs by 1 ulp — the
    round-9 tied-timestamp sweep caught p50 flipping its 6th decimal. An
    order statistic is one of the input integers: bitwise identical on
    both engines, tie-immune, and still an exact percentile definition.
    (Continuous-valued percentile queries keep interpolation — see
    ``percentile_value_by_user``; the boundary has measure zero off-grid.)

    Scale: the as-of pairing is the union-and-carry single-shuffle
    operator (never the quadratic join+rank the oracle uses at its small
    scale); the rank pick is one per-day window sort (daily volumes are
    groupBy-local).

    ``events`` overrides the table scan for the ``*_deduped`` composition.
    """
    ev = events if events is not None else load_table(spark, sf_dir, "events")
    purchases = ev.filter(F.col("event_type") == "purchase")
    clicks = ev.filter(F.col("event_type") == "click").select(
        "user_id", "ts", "event_id"
    )
    paired = asof_join(
        purchases,
        clicks,
        ["user_id"],
        "ts",
        "ts",
        right_value_cols=["ts"],
        tiebreak="event_id",
    )
    lags = paired.select(
        F.date_format(F.col("ts").cast("date"), "yyyy-MM-dd").alias("day"),
        F.expr("timestampdiff(MICROSECOND, asof_ts, ts)").alias("lag_us"),
    )
    ranked = lags.select(
        "day",
        "lag_us",
        F.row_number()
        .over(Window.partitionBy("day").orderBy("lag_us"))
        .alias("rn"),
        F.count(F.lit(1)).over(Window.partitionBy("day")).alias("n"),
    )

    def _pick(qn: int, qd: int, alias: str):
        rank = F.expr(f"({qn} * n + {qd - 1}) DIV {qd}")
        return (
            F.max(F.when(F.col("rn") == rank, F.col("lag_us")))
            / F.lit(1000000.0)
        ).alias(alias)

    return ranked.groupBy("day").agg(
        F.count(F.lit(1)).alias("n_conversions"),
        _pick(1, 2, "p50_lag_s"),
        _pick(9, 10, "p90_lag_s"),
        _pick(99, 100, "p99_lag_s"),
    )


# --- 2-hop neighborhood reach --------------------------------------------------


@register(
    "two_hop_reach_counts",
    oracle=f"""
    WITH {_COPURCHASE_EDGES_SQL},
    adj AS (
        SELECT u AS src, v AS dst FROM edges
        UNION ALL
        SELECT v AS src, u AS dst FROM edges
    ),
    one_hop AS (SELECT DISTINCT src, dst FROM adj),
    two_hop AS (
        SELECT DISTINCT a.src, b.dst
        FROM one_hop a JOIN adj b ON b.src = a.dst
        WHERE b.dst <> a.src
    ),
    reach AS (
        SELECT src, dst FROM one_hop
        UNION
        SELECT src, dst FROM two_hop
    )
    SELECT r.src AS part, 
           (SELECT count(*) FROM one_hop o WHERE o.src = r.src) AS n_1hop,
           count(*) AS n_within_2hops
    FROM reach r GROUP BY r.src
    """,
)
def two_hop_reach_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bounded BFS: for each part in the co-purchase graph, how many parts
    are reachable within 1 hop and within ≤2 hops — the neighborhood-size
    diagnostic that prices any graph algorithm before running it (reach
    explosion ⇒ iterate no further).

    Scale: adjacency is the edge list doubled (map-side) and is DISTINCT
    BY CONSTRUCTION (the edge list is unique u<v pairs), so no 1-hop
    dedup shuffle exists; the 2-hop set is ONE self-join on the middle
    node — Σ deg² rows, the same hub exposure the degree distribution
    measures first. 1-hop and 2-hop walks are tagged and deduped in a
    SINGLE (src, dst) aggregation keeping the min hop tag (partial
    map-side dedup bounds the shuffle to the deduped reach set), and one
    per-src aggregation yields both counts — two exchanges total after
    the join, versus five in the naive distinct-per-layer plan. No
    iteration, no driver-side frontier.
    """
    edges = _copurchase_edges(load_table(spark, sf_dir, "lineitem")).cache()
    adj = edges.select(F.col("u").alias("src"), F.col("v").alias("dst")).unionAll(
        edges.select(F.col("v").alias("src"), F.col("u").alias("dst"))
    )
    mid = adj.select(F.col("src").alias("dst"), F.col("dst").alias("dst2"))
    walks2 = (
        adj.join(mid, "dst")
        .filter(F.col("dst2") != F.col("src"))
        .select("src", F.col("dst2").alias("dst"), F.lit(2).alias("h"))
    )
    tagged = adj.select("src", "dst", F.lit(1).alias("h")).unionByName(walks2)
    reach = tagged.groupBy("src", "dst").agg(F.min("h").alias("h"))
    return reach.groupBy("src").agg(
        F.sum(F.when(F.col("h") == 1, 1).otherwise(0))
        .cast("long")
        .alias("n_1hop"),
        F.count(F.lit(1)).alias("n_within_2hops"),
    ).select(F.col("src").alias("part"), "n_1hop", "n_within_2hops")


# --- time-weighted average (TWAP) ----------------------------------------------


@register(
    "time_weighted_avg_value",
    oracle="""
    WITH seq AS (
        SELECT user_id, value, ts,
               lead(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                   AS next_ts
        FROM events
    ),
    weighted AS (
        SELECT user_id, value,
               epoch_us(next_ts) - epoch_us(ts) AS dt_us
        FROM seq WHERE next_ts IS NOT NULL
    )
    SELECT user_id,
           count(*) AS n_intervals,
           CAST(sum(dt_us) AS BIGINT) AS total_us,
           round(sum(value * CAST(dt_us AS DOUBLE))
                 / CAST(sum(dt_us) AS DOUBLE), 6) AS twap_value
    FROM weighted GROUP BY user_id
    """,
)
def time_weighted_avg_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-weighted average (TWAP): each observation weighted by how long
    it was the user's latest value — the standard aggregate for irregular
    telemetry (a value held for an hour counts 3600× one held a second).

    Scale: one user_id shuffle feeds the lead() window; the weighted sum
    is map-side combinable. dt weights stay exact int64 µs; the weighted
    sum is continuous-valued so the shared 6-dp rounding contract applies
    (same class as ``ewma_value_by_user``).
    """
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = ev.select(
        "user_id",
        "value",
        "ts",
        F.lead("ts").over(w).alias("next_ts"),
    ).filter(F.col("next_ts").isNotNull())
    weighted = seq.select(
        "user_id",
        "value",
        F.expr("timestampdiff(MICROSECOND, ts, next_ts)").alias("dt_us"),
    )
    return weighted.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_intervals"),
        F.sum("dt_us").alias("total_us"),
        F.round(
            F.sum(F.col("value") * F.col("dt_us").cast("double"))
            / F.sum("dt_us").cast("double"),
            6,
        ).alias("twap_value"),
    )


# --- exact-integer CUSUM change-point flags --------------------------------------

_CUSUM_TENTHS = 1  # flag where |S_t| > (tenths/10) · total


@register(
    "cusum_changepoint_days",
    oracle=f"""
    WITH daily AS (
        SELECT CAST(ts AS DATE) AS day, count(*) AS c
        FROM events GROUP BY day
    ),
    cum AS (
        SELECT day, c,
               CAST(count(*) OVER () AS BIGINT) AS n_days,
               CAST(sum(c) OVER () AS BIGINT) AS total,
               CAST(row_number() OVER (ORDER BY day) AS BIGINT) AS t,
               CAST(sum(c) OVER (ORDER BY day
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                    AS BIGINT) AS cum_c
        FROM daily
    )
    SELECT strftime(day, '%Y-%m-%d') AS day,
           c AS n_events,
           n_days * cum_c - t * total AS s_scaled,
           abs(n_days * cum_c - t * total) * 10
               > {_CUSUM_TENTHS} * n_days * total AS shifted
    FROM cum
    """,
)
def cusum_changepoint_days(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUSUM change-point detection on the daily event rate: flag days
    where the cumulative deviation from the overall mean exceeds 10% of
    total volume — the level-shift detector that complements the
    pointwise outlier ops (z-score, MAD) and the distributional one
    (chi-square drift).

    Exactness trick: the textbook statistic S_t = Σc_i − t·mean needs a
    double mean; scaling by n_days gives S'_t = n_days·Σc_i − t·total —
    PURE INT64, so the statistic and the threshold compare exactly on
    both engines (no float ever).

    Scale: the daily rollup is map-side combinable; the running sum is a
    window over |days| rows — calendar-bounded, not event-bounded.
    """
    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy(F.col("ts").cast("date").alias("day")).agg(
        F.count(F.lit(1)).alias("c")
    )
    w_all = Window.partitionBy()
    w_ord = Window.orderBy("day")
    cum = daily.select(
        "day",
        "c",
        F.count(F.lit(1)).over(w_all).alias("n_days"),
        F.sum("c").over(w_all).alias("total"),
        F.row_number().over(w_ord).cast("long").alias("t"),
        F.sum("c")
        .over(w_ord.rowsBetween(Window.unboundedPreceding, Window.currentRow))
        .alias("cum_c"),
    )
    s_scaled = F.col("n_days") * F.col("cum_c") - F.col("t") * F.col("total")
    return cum.select(
        F.date_format("day", "yyyy-MM-dd").alias("day"),
        F.col("c").alias("n_events"),
        s_scaled.alias("s_scaled"),
        (
            F.abs(s_scaled) * 10
            > F.lit(_CUSUM_TENTHS) * F.col("n_days") * F.col("total")
        ).alias("shifted"),
    )


# --- LOCF (last-observation-carried-forward) resample ---------------------------


@register(
    "hourly_locf_by_type",
    oracle="""
    WITH obs AS (
        SELECT event_type, h, v FROM (
            SELECT event_type, date_trunc('hour', ts) AS h, value AS v,
                   row_number() OVER (
                       PARTITION BY event_type, date_trunc('hour', ts)
                       ORDER BY ts DESC, event_id DESC) AS rn
            FROM events
        ) WHERE rn = 1
    ),
    spine AS (
        SELECT event_type,
               unnest(generate_series(min(h), max(h), INTERVAL 1 HOUR)) AS h
        FROM obs GROUP BY event_type
    ),
    joined AS (
        SELECT s.event_type, s.h, o.v
        FROM spine s LEFT JOIN obs o
          ON o.event_type = s.event_type AND o.h = s.h
    )
    SELECT event_type,
           strftime(h, '%Y-%m-%d %H:%M:%S') AS hour,
           last_value(v IGNORE NULLS) OVER (
               PARTITION BY event_type ORDER BY h
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS carried_value,
           v IS NULL AS is_gap
    FROM joined
    """,
)
def hourly_locf_by_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LOCF resampling: a dense hourly series per event type where silent
    hours carry the last observed value forward — the feature-store /
    charting companion to ``events_gapfill_hourly`` (which fills with
    zeros; LOCF fills with state).

    Scale: observations collapse to (type, hour) BEFORE the spine join
    (map-side combinable, deterministic max_by tiebreak (ts, event_id));
    the spine is calendar-bounded; the carry is last(ignorenulls) over the
    per-type hourly frame — |types|×|hours| rows, never event volume. The
    carried value is a SELECTED raw double (no arithmetic), so both
    engines emit identical bits unrounded.
    """
    ev = load_table(spark, sf_dir, "events")
    obs = ev.groupBy(
        "event_type", F.date_trunc("hour", "ts").alias("h")
    ).agg(F.expr("max_by(value, struct(ts, event_id))").alias("v"))
    spine = obs.groupBy("event_type").agg(
        F.min("h").alias("h0"), F.max("h").alias("h1")
    ).select(
        "event_type",
        F.explode(
            F.sequence(F.col("h0"), F.col("h1"), F.expr("INTERVAL 1 HOUR"))
        ).alias("h"),
    )
    joined = spine.join(obs, ["event_type", "h"], "left")
    w = (
        Window.partitionBy("event_type")
        .orderBy("h")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return joined.select(
        "event_type",
        F.date_format("h", _TS_FMT).alias("hour"),
        F.last("v", ignorenulls=True).over(w).alias("carried_value"),
        F.col("v").isNull().alias("is_gap"),
    )


# --- Benford first-digit audit ---------------------------------------------------

# round(log10(1 + 1/d) * 1e6) for d = 1..9, precomputed so BOTH engines use
# the same integer literals — no transcendental ever evaluated in-engine.
_BENFORD_PPM = {
    1: 301030, 2: 176091, 3: 124939, 4: 96910, 5: 79181,
    6: 66947, 7: 57992, 8: 51153, 9: 45757,
}
_BENFORD_CASE = "CASE first_digit " + " ".join(
    f"WHEN {d} THEN {ppm}" for d, ppm in _BENFORD_PPM.items()
) + " END"


@register(
    "benford_first_digit_audit",
    oracle=f"""
    WITH digits AS (
        SELECT CAST(substring(CAST(CAST(floor(o_totalprice) AS BIGINT)
                                    AS VARCHAR), 1, 1) AS BIGINT) AS first_digit
        FROM orders WHERE o_totalprice >= 1
    ),
    counts AS (
        SELECT first_digit, count(*) AS n_orders,
               CAST(sum(count(*)) OVER () AS BIGINT) AS n_total
        FROM digits GROUP BY first_digit
    )
    SELECT first_digit, n_orders,
           n_orders * 1000000 // n_total AS share_ppm,
           {_BENFORD_CASE} AS benford_ppm,
           n_orders * 1000000 // n_total - ({_BENFORD_CASE}) AS dev_ppm
    FROM counts
    """,
)
def benford_first_digit_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benford first-digit audit on order totals — the forensic-accounting
    screen for fabricated or systematically-generated monetary data
    (synthetic generators usually fail it; the DEVIATION is the signal
    either way).

    Exactness: shares are integer parts-per-million (int64 // division);
    the Benford expectations are precomputed integer LITERALS shared by
    both engines, so no log10 is ever evaluated in-engine — the whole
    result is pure int64. Scale: one scan, 9 output groups, map-side
    combinable; the total rides a 9-row window.
    """
    orders = load_table(spark, sf_dir, "orders")
    # floor explicitly: DuckDB's double->BIGINT cast ROUNDS while Spark's
    # truncates — 9.99 would flip digit 9 to 1 without it
    digits = orders.filter(F.col("o_totalprice") >= 1).select(
        F.substring(
            F.floor("o_totalprice").cast("bigint").cast("string"), 1, 1
        )
        .cast("long")
        .alias("first_digit")
    )
    counts = digits.groupBy("first_digit").agg(
        F.count(F.lit(1)).alias("n_orders")
    ).withColumn("n_total", F.sum("n_orders").over(Window.partitionBy()))
    share = F.expr("n_orders * 1000000 div n_total")
    benford = F.expr(_BENFORD_CASE)
    return counts.select(
        "first_digit",
        "n_orders",
        share.alias("share_ppm"),
        benford.alias("benford_ppm"),
        (share - benford).alias("dev_ppm"),
    )


# --- ABC (Pareto) classification --------------------------------------------------


@register(
    "abc_classification_parts",
    oracle=f"""
    WITH part_rev AS (
        SELECT l_partkey AS part,
               CAST(sum({mny.rev_units()}) AS BIGINT) AS units
        FROM lineitem GROUP BY l_partkey
    ),
    ranked AS (
        SELECT part, units,
               CAST(sum(units) OVER (ORDER BY units DESC, part
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                    AS BIGINT) AS cum_units,
               CAST(sum(units) OVER () AS BIGINT) AS total_units
        FROM part_rev
    )
    SELECT CASE WHEN cum_units * 100 <= total_units * 80 THEN 'A'
                WHEN cum_units * 100 <= total_units * 95 THEN 'B'
                ELSE 'C' END AS abc_class,
           count(*) AS n_parts,
           {mny.duck_money2("sum(units)", 100)} AS revenue
    FROM ranked GROUP BY abc_class
    """,
)
def abc_classification_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ABC / Pareto classification: parts ranked by revenue; 'A' holds the
    first 80% of cumulative revenue, 'B' the next 15%, 'C' the tail — the
    inventory-prioritization idiom (running share over a ranked rollup).

    Exactness: class boundaries compare cum_units·100 ≤ total·80 in pure
    int64 — no float share ever computed. Scale note: the running sum
    orders the PART-level rollup globally — parts are a bounded dimension
    (catalog-sized, not fact-sized), the one case a single-partition
    window is legitimate; tiebreak (units desc, part) is total, so the
    cumulative is deterministic.
    """
    li = load_table(spark, sf_dir, "lineitem")
    part_rev = li.groupBy(F.col("l_partkey").alias("part")).agg(
        F.expr(f"CAST(sum({mny.rev_units()}) AS BIGINT)").alias("units")
    )
    w_run = (
        Window.orderBy(F.col("units").desc(), F.col("part"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    ranked = part_rev.select(
        "part",
        "units",
        F.sum("units").over(w_run).alias("cum_units"),
        F.sum("units").over(Window.partitionBy()).alias("total_units"),
    )
    abc = (
        F.when(F.col("cum_units") * 100 <= F.col("total_units") * 80, "A")
        .when(F.col("cum_units") * 100 <= F.col("total_units") * 95, "B")
        .otherwise("C")
    )
    return ranked.groupBy(abc.alias("abc_class")).agg(
        F.count(F.lit(1)).alias("n_parts"),
        F.expr(mny.spark_money2("sum(units)", 100)).alias("revenue"),
    )


# --- weighted median (exact, integer weights) -----------------------------------


@register(
    "weighted_median_quantity",
    oracle=f"""
    WITH w AS (
        SELECT l_returnflag, l_quantity,
               CAST(sum({mny.cents("l_extendedprice")}) AS BIGINT) AS wt
        FROM lineitem GROUP BY l_returnflag, l_quantity
    ),
    cum AS (
        SELECT l_returnflag, l_quantity, wt,
               CAST(sum(wt) OVER (PARTITION BY l_returnflag
                    ORDER BY l_quantity
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                    AS BIGINT) AS cum_wt,
               CAST(sum(wt) OVER (PARTITION BY l_returnflag) AS BIGINT)
                   AS total_wt
        FROM w
    )
    SELECT l_returnflag,
           min(l_quantity) AS weighted_median_qty,
           min(total_wt) AS total_weight_cents
    FROM cum WHERE cum_wt * 2 >= total_wt
    GROUP BY l_returnflag
    """,
)
def weighted_median_quantity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """WEIGHTED median: per return flag, the quantity at which half the
    revenue weight (extended price, exact integer cents) is reached — the
    value-weighted central tendency the unweighted percentile ops
    (``percentile_value_by_user``, GK sketch) cannot express.

    Exactness: weights are int64 cents, the cumulative is an int window
    sum, and the median is SELECTED (first value with 2·cum ≥ total — the
    lower weighted median), so no float is ever compared. Scale: values
    collapse to (flag, quantity) before the window — the window runs over
    the value-domain rollup, not the fact table.
    """
    li = load_table(spark, sf_dir, "lineitem")
    w = li.groupBy("l_returnflag", "l_quantity").agg(
        F.expr(f"CAST(sum({mny.cents('l_extendedprice')}) AS BIGINT)").alias("wt")
    )
    win = Window.partitionBy("l_returnflag").orderBy("l_quantity")
    cum = w.select(
        "l_returnflag",
        "l_quantity",
        F.sum("wt")
        .over(win.rowsBetween(Window.unboundedPreceding, Window.currentRow))
        .alias("cum_wt"),
        F.sum("wt").over(Window.partitionBy("l_returnflag")).alias("total_wt"),
    )
    return (
        cum.filter(F.col("cum_wt") * 2 >= F.col("total_wt"))
        .groupBy("l_returnflag")
        .agg(
            F.min("l_quantity").alias("weighted_median_qty"),
            F.min("total_wt").alias("total_weight_cents"),
        )
    )


# --- per-group min-max feature scaling --------------------------------------------


@register(
    "minmax_scale_values_by_type",
    oracle="""
    WITH stats AS (
        SELECT event_type, min(value) AS lo, max(value) AS hi
        FROM events GROUP BY event_type
    )
    SELECT e.event_id, e.event_type,
           (e.value - s.lo) / (s.hi - s.lo) AS scaled_value
    FROM events e JOIN stats s ON s.event_type = e.event_type
    WHERE s.hi > s.lo
    """,
)
def minmax_scale_values_by_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-group min-max feature scaling: each event's value normalized to
    [0, 1] within its event type — the feature-engineering normalizer
    (complementing the z-score and median/MAD standardizers).

    Exactness: (x − lo)/(hi − lo) is per-row double arithmetic on
    identical operands — bit-identical across engines, no rounding needed.
    Scale: the stats frame is |types| rows, broadcast back over one scan
    (the *locked* broadcast-stats shape of ``value_zscore_outliers``);
    degenerate constant groups are excluded rather than dividing by zero.
    """
    ev = load_table(spark, sf_dir, "events")
    stats = ev.groupBy("event_type").agg(
        F.min("value").alias("lo"), F.max("value").alias("hi")
    )
    return (
        ev.join(F.broadcast(stats), "event_type")
        .filter(F.col("hi") > F.col("lo"))
        .select(
            "event_id",
            "event_type",
            ((F.col("value") - F.col("lo")) / (F.col("hi") - F.col("lo"))).alias(
                "scaled_value"
            ),
        )
    )


# --- Kaplan-Meier survival (time to churn) ----------------------------------------


@register(
    "kaplan_meier_churn",
    oracle="""
    WITH last_day AS (
        SELECT user_id, max(CAST(ts AS DATE)) AS d FROM events GROUP BY user_id
    ),
    churn AS (SELECT d, count(*) AS n_churn FROM last_day GROUP BY d),
    days AS (SELECT DISTINCT CAST(ts AS DATE) AS d FROM events),
    risk AS (
        SELECT days.d,
               coalesce(c.n_churn, 0) AS n_churn,
               CAST((SELECT count(*) FROM last_day) AS BIGINT)
                 - CAST(coalesce(sum(coalesce(c.n_churn, 0)) OVER (
                       ORDER BY days.d
                       ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                       AS BIGINT) AS n_at_risk
        FROM days LEFT JOIN churn c ON c.d = days.d
    ),
    terms AS (
        SELECT d, n_churn, n_at_risk,
               1.0 - CAST(n_churn AS DOUBLE) / CAST(n_at_risk AS DOUBLE)
                   AS term
        FROM risk
    )
    SELECT strftime(d, '%Y-%m-%d') AS day,
           n_churn, n_at_risk,
           round(list_reduce(list_prepend(CAST(1.0 AS DOUBLE),
                 list(term) OVER (ORDER BY d
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
                 (km_a, km_x) -> km_a * km_x), 6) AS survival
    FROM terms
    """,
)
def kaplan_meier_churn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kaplan-Meier survival curve for churn: treating each user's LAST
    event day as their churn date, S(t) = Π_{i≤t} (1 − dᵢ/nᵢ) — the
    survival-analysis estimator behind every retention curve.

    Determinism: each factor is one double division of exact int64 counts;
    the cumulative PRODUCT is a sequential left fold over the day-ordered
    term list in BOTH engines (Spark ``aggregate`` over a window
    ``collect_list``, DuckDB ``list_reduce`` over a window ``list``) — the
    same multiply order, so identical bits before the display rounding.

    Scale: users collapse to last-day rows, then everything is
    calendar-bounded (|days| rows); the curve itself is a window over ~30
    rows. Right-censoring note: users active on the final day count as
    churned that day — a replayable, deterministic convention (the
    horizon-aware variant is ``churned_users``).
    """
    ev = load_table(spark, sf_dir, "events")
    last_day = ev.groupBy("user_id").agg(
        F.max(F.col("ts").cast("date")).alias("d")
    )
    churn = last_day.groupBy("d").agg(F.count(F.lit(1)).alias("n_churn"))
    days = ev.select(F.col("ts").cast("date").alias("d")).distinct()
    total = last_day.agg(F.count(F.lit(1)).alias("n_users"))
    w_prev = Window.orderBy("d").rowsBetween(Window.unboundedPreceding, -1)
    risk = (
        days.join(churn, "d", "left")
        .withColumn("n_churn", F.coalesce(F.col("n_churn"), F.lit(0)))
        .join(F.broadcast(total))
        .withColumn(
            "n_at_risk",
            F.col("n_users")
            - F.coalesce(F.sum("n_churn").over(w_prev), F.lit(0)),
        )
    )
    terms = risk.withColumn(
        "term",
        F.lit(1.0) - F.col("n_churn").cast("double") / F.col("n_at_risk").cast("double"),
    )
    w_run = Window.orderBy("d").rowsBetween(Window.unboundedPreceding, Window.currentRow)
    return terms.select(
        F.date_format("d", "yyyy-MM-dd").alias("day"),
        "n_churn",
        "n_at_risk",
        F.round(
            F.aggregate(
                F.collect_list("term").over(w_run),
                F.lit(1.0),
                lambda acc, x: acc * x,
            ),
            6,
        ).alias("survival"),
    )


# --- 24h-lag autocorrelation (seasonality diagnostic) -------------------------------


@register(
    "hourly_autocorr_24h",
    oracle="""
    WITH hourly AS (
        SELECT date_trunc('hour', ts) AS h, count(*) AS c
        FROM events GROUP BY date_trunc('hour', ts)
    ),
    lagged AS (
        SELECT c, lag(c, 24) OVER (ORDER BY h) AS c_prev
        FROM hourly
    )
    SELECT count(*) AS n_pairs,
           round(corr(CAST(c AS DOUBLE), CAST(c_prev AS DOUBLE)), 6)
               AS autocorr_24h
    FROM lagged WHERE c_prev IS NOT NULL
    """,
)
def hourly_autocorr_24h(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Seasonality diagnostic: Pearson autocorrelation of the hourly event
    count at lag 24 hours — high values mean a daily cycle, the check a
    forecasting pipeline runs before choosing features.

    Scale: the hourly rollup is map-side combinable; the lag pairing is a
    window over |hours| rows and ``corr`` is the one-pass co-moment
    aggregate (same machinery as ``stats_corr_lineitem``), rounded to the
    shared 6-dp contract. NOTE: the generator's events are uniform in
    time, so near-zero is the EXPECTED value here — the operator's point
    is the measurement, not a seasonal fixture.
    """
    ev = load_table(spark, sf_dir, "events")
    hourly = ev.groupBy(F.date_trunc("hour", "ts").alias("h")).agg(
        F.count(F.lit(1)).alias("c")
    )
    lagged = hourly.select(
        F.col("c").cast("double").alias("c"),
        F.lag("c", 24).over(Window.orderBy("h")).cast("double").alias("c_prev"),
    ).filter(F.col("c_prev").isNotNull())
    return lagged.agg(
        F.count(F.lit(1)).alias("n_pairs"),
        F.round(F.corr("c", "c_prev"), 6).alias("autocorr_24h"),
    )


# --- Gini coefficient: revenue concentration within nation --------------------------


@register(
    "gini_revenue_by_nation",
    oracle="""
    WITH cust_rev AS (
        SELECT n.n_name, o.o_custkey,
               CAST(sum(CAST(round(o.o_totalprice * 100) AS BIGINT)) AS BIGINT)
                   AS rev_cents
        FROM orders o
        JOIN customer c ON c.c_custkey = o.o_custkey
        JOIN nation n   ON n.n_nationkey = c.c_nationkey
        GROUP BY n.n_name, o.o_custkey
    ),
    ranked AS (
        SELECT n_name, rev_cents,
               row_number() OVER (PARTITION BY n_name
                                  ORDER BY rev_cents, o_custkey) AS rn
        FROM cust_rev
    ),
    sums AS (
        SELECT n_name,
               count(*) AS n_customers,
               CAST(sum(rev_cents) AS BIGINT) AS revenue_cents,
               sum(CAST(rn AS HUGEINT) * CAST(rev_cents AS HUGEINT)) AS s1
        FROM ranked GROUP BY n_name
    )
    SELECT n_name, n_customers, revenue_cents,
           round((2.0 * CAST(s1 AS DOUBLE)
                  - CAST(n_customers + 1 AS DOUBLE)
                      * CAST(revenue_cents AS DOUBLE))
                 / (CAST(n_customers AS DOUBLE)
                      * CAST(revenue_cents AS DOUBLE)), 6) AS gini
    FROM sums
    """,
)
def gini_revenue_by_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gini coefficient of customer-revenue concentration per nation — the
    inequality measure behind "is our revenue dangerously concentrated in
    a few accounts?" (0 = perfectly even, →1 = one customer is everything).

    Exactness: per-customer revenue is exact int64 cents; the sorted-rank
    identity  G = (2·Σ i·rᵢ − (n+1)·Σ rᵢ) / (n·Σ rᵢ)  keeps every sum in
    integer arithmetic (the rank-weighted sum is widened to DECIMAL(38,0)
    / HUGEINT — at 100 TB, rank×cents products overflow int64 sums) and
    spends ONE float division at the end, mirrored operation-for-operation
    in the oracle. Rank ties break on (rev, custkey) — total order, both
    engines. Scale: orders collapse to per-customer rows before the
    per-nation window; the window sorts |customers| rows partitioned by
    nation, and the final rollup is |nations| rows.
    """
    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    cust_rev = (
        orders.join(F.broadcast(customer), orders.o_custkey == customer.c_custkey)
        .join(F.broadcast(nation), customer.c_nationkey == nation.n_nationkey)
        .groupBy("n_name", "o_custkey")
        .agg(
            F.sum(F.expr("CAST(round(o_totalprice * 100) AS BIGINT)"))
            .cast("long")
            .alias("rev_cents")
        )
    )
    ranked = cust_rev.select(
        "n_name",
        "rev_cents",
        F.row_number()
        .over(Window.partitionBy("n_name").orderBy("rev_cents", "o_custkey"))
        .alias("rn"),
    )
    sums = ranked.groupBy("n_name").agg(
        F.count(F.lit(1)).alias("n_customers"),
        F.sum("rev_cents").cast("long").alias("revenue_cents"),
        F.sum(
            (F.col("rn").cast("decimal(38,0)") * F.col("rev_cents").cast("decimal(38,0)"))
        ).alias("s1"),
    )
    n_d = F.col("n_customers").cast("double")
    rev_d = F.col("revenue_cents").cast("double")
    return sums.select(
        "n_name",
        "n_customers",
        "revenue_cents",
        F.round(
            (F.lit(2.0) * F.col("s1").cast("double")
             - (F.col("n_customers") + 1).cast("double") * rev_d)
            / (n_d * rev_d),
            6,
        ).alias("gini"),
    )


# --- seasonal-naive forecast error (daily MAE at 24h lag) ---------------------------


@register(
    "seasonal_naive_error_daily",
    oracle="""
    WITH hourly AS (
        SELECT date_trunc('hour', ts) AS h, CAST(count(*) AS BIGINT) AS c
        FROM events GROUP BY date_trunc('hour', ts)
    )
    SELECT strftime(CAST(cur.h AS DATE), '%Y-%m-%d') AS day,
           count(*) AS n_hours,
           CAST(sum(abs(cur.c - prev.c)) AS BIGINT) AS sum_abs_err,
           CAST(sum(abs(cur.c - prev.c)) AS DOUBLE) / CAST(count(*) AS DOUBLE)
               AS mae
    FROM hourly cur
    JOIN hourly prev ON prev.h = cur.h - INTERVAL 24 HOUR
    GROUP BY CAST(cur.h AS DATE)
    """,
)
def seasonal_naive_error_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Seasonal-naive forecast backtest: predict each hour's event count
    with the count 24 hours earlier and report the per-day MAE — the
    baseline every forecasting pipeline must beat (companion measurement
    to ``hourly_autocorr_24h``).

    Exactness: counts and absolute errors are pure int64; MAE is ONE
    int/int division to double — bit-identical across engines, no
    rounding. The 24h-ago pairing is an equi-join on ``h − 24 hours``
    (NOT ``lag(24)``: with missing hours, lag silently pairs the wrong
    offset). Scale: events collapse to the |hours| rollup first (map-side
    combinable), so the self-join and daily rollup run over calendar-sized
    relations, not the fact table.
    """
    ev = load_table(spark, sf_dir, "events")
    hourly = (
        ev.groupBy(F.date_trunc("hour", "ts").alias("h"))
        .agg(F.count(F.lit(1)).cast("long").alias("c"))
        .cache()
    )
    cur, prev = hourly.alias("cur"), hourly.alias("prev")
    joined = cur.join(
        prev, F.col("prev.h") == F.col("cur.h") - F.expr("INTERVAL 24 HOURS")
    )
    err = F.abs(F.col("cur.c") - F.col("prev.c"))
    return (
        joined.groupBy(F.col("cur.h").cast("date").alias("d"))
        .agg(
            F.count(F.lit(1)).alias("n_hours"),
            F.sum(err).cast("long").alias("sum_abs_err"),
        )
        .select(
            F.date_format("d", "yyyy-MM-dd").alias("day"),
            "n_hours",
            "sum_abs_err",
            (F.col("sum_abs_err").cast("double") / F.col("n_hours").cast("double"))
            .alias("mae"),
        )
    )


# --- RFM quintile segmentation ------------------------------------------------------


@register(
    "rfm_user_segments",
    oracle="""
    WITH p AS (
        SELECT user_id,
               max(CAST(ts AS DATE)) AS last_day,
               CAST(count(*) AS BIGINT) AS freq,
               CAST(sum(CAST(round(value * 1000000) AS BIGINT)) AS BIGINT)
                   AS monetary_micros
        FROM events WHERE event_type = 'purchase'
        GROUP BY user_id
    ),
    horizon AS (SELECT max(last_day) AS h FROM p),
    scored AS (
        SELECT user_id,
               date_diff('day', last_day, (SELECT h FROM horizon))
                   AS recency_days,
               freq, monetary_micros,
               ntile(5) OVER (ORDER BY date_diff('day', last_day,
                                  (SELECT h FROM horizon)) DESC, user_id)
                   AS r_score,
               ntile(5) OVER (ORDER BY freq, user_id) AS f_score,
               ntile(5) OVER (ORDER BY monetary_micros, user_id) AS m_score
        FROM p
    )
    SELECT user_id, recency_days, freq, monetary_micros,
           r_score, f_score, m_score,
           CAST(r_score AS VARCHAR) || CAST(f_score AS VARCHAR)
               || CAST(m_score AS VARCHAR) AS segment
    FROM scored
    """,
)
def rfm_user_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RFM segmentation: every purchasing user scored 1–5 on Recency,
    Frequency, and Monetary quintiles (5 = best), concatenated into the
    classic 'RFM' marketing segment code ('555' = champions).

    Determinism: recency is whole days against the data horizon (max
    purchase day — replayable, like ``churned_users``); frequency is a
    count; monetary is exact int64 micro-units so the quintile sort never
    compares a float sum. Every ``ntile`` orders by (metric, user_id) — a
    TOTAL order, so bucket boundaries are identical across engines and
    partition layouts. Scale: purchases collapse to |users| rows first;
    the three quintile windows are global sorts over that rollup (at
    100 TB, swap ntile for broadcast approx-quantile boundaries — the
    rollup stays the only corpus-sized stage).
    """
    ev = load_table(spark, sf_dir, "events")
    p = (
        ev.filter(F.col("event_type") == "purchase")
        .groupBy("user_id")
        .agg(
            F.max(F.col("ts").cast("date")).alias("last_day"),
            F.count(F.lit(1)).cast("long").alias("freq"),
            F.sum(F.expr("CAST(round(value * 1000000) AS BIGINT)"))
            .cast("long")
            .alias("monetary_micros"),
        )
    )
    horizon = p.agg(F.max("last_day").alias("h"))
    scored = (
        p.join(F.broadcast(horizon))
        .withColumn("recency_days", F.datediff("h", "last_day").cast("long"))
        .select(
            "user_id",
            "recency_days",
            "freq",
            "monetary_micros",
            F.ntile(5)
            .over(Window.orderBy(F.col("recency_days").desc(), "user_id"))
            .cast("long")
            .alias("r_score"),
            F.ntile(5)
            .over(Window.orderBy("freq", "user_id"))
            .cast("long")
            .alias("f_score"),
            F.ntile(5)
            .over(Window.orderBy("monetary_micros", "user_id"))
            .cast("long")
            .alias("m_score"),
        )
    )
    return scored.select(
        "*",
        F.concat(
            F.col("r_score").cast("string"),
            F.col("f_score").cast("string"),
            F.col("m_score").cast("string"),
        ).alias("segment"),
    )


# --- largest-remainder proration (sum-preserving allocation) ------------------------


@register(
    "prorate_order_total",
    oracle="""
    WITH li AS (
        SELECT l_orderkey, l_linenumber,
               CAST(round(l_extendedprice * 100) AS BIGINT) AS w,
               CAST(row_number() OVER (
                   PARTITION BY l_orderkey
                   ORDER BY l_linenumber,
                            CAST(round(l_extendedprice * 100) AS BIGINT),
                            l_partkey, l_suppkey, l_quantity) AS BIGINT)
                   AS line_uid
        FROM lineitem
    ),
    t AS (
        SELECT o_orderkey, CAST(round(o_totalprice * 100) AS BIGINT) AS t_cents
        FROM orders
    ),
    base AS (
        SELECT li.l_orderkey, li.line_uid, li.l_linenumber, t.t_cents,
               CAST(sum(li.w) OVER (PARTITION BY li.l_orderkey) AS BIGINT) AS big_w,
               t.t_cents * li.w AS prod
        FROM li JOIN t ON t.o_orderkey = li.l_orderkey
    ),
    ranked AS (
        SELECT l_orderkey, line_uid, l_linenumber, t_cents,
               prod // big_w AS floor_cents,
               CAST(sum(prod // big_w) OVER (PARTITION BY l_orderkey) AS BIGINT)
                   AS sum_floor,
               row_number() OVER (PARTITION BY l_orderkey
                                  ORDER BY prod % big_w DESC, line_uid)
                   AS rn
        FROM base
    )
    SELECT l_orderkey, line_uid, l_linenumber,
           CAST(floor_cents
                + CASE WHEN rn <= t_cents - sum_floor THEN 1 ELSE 0 END
                AS BIGINT) AS alloc_cents
    FROM ranked
    """,
)
def prorate_order_total(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Largest-remainder proration: allocate each order's total price
    across its line items proportionally to extended price, in EXACT
    integer cents that sum back to the order total to the cent — the
    invoice/revenue-allocation operator (Hamilton apportionment), where a
    naive ``round(T·wᵢ/W)`` leaks or conjures cents per order.

    Exactness: floor shares are integer division of int64 products
    (T·wᵢ ≲ 10¹⁴ here; widen the product to DECIMAL(38,0)/HUGEINT for
    100 TB order values), remainders are exact modulos, and the leftover
    cents go to the largest remainders with a (remainder DESC, line_uid)
    total-order tiebreak — no float anywhere. ``line_uid`` is a synthetic
    per-order line id (row_number over the full line tuple) because this
    testdata has DUPLICATE (l_orderkey, l_linenumber) pairs — ranking on
    a non-unique key silently breaks both determinism and the
    sum-preservation audit; fully identical duplicate lines remain
    interchangeable, so the OUTPUT SET is still deterministic. Scale:
    all three windows partition by orderkey (bounded fan-in per group);
    the orders-side join is the usual fact-to-fact equi-shuffle.
    """
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey",
        "l_linenumber",
        F.expr("CAST(round(l_extendedprice * 100) AS BIGINT)").alias("w"),
        F.row_number()
        .over(
            Window.partitionBy("l_orderkey").orderBy(
                "l_linenumber",
                F.expr("CAST(round(l_extendedprice * 100) AS BIGINT)"),
                "l_partkey",
                "l_suppkey",
                "l_quantity",
            )
        )
        .cast("long")
        .alias("line_uid"),
    )
    t = load_table(spark, sf_dir, "orders").select(
        "o_orderkey",
        F.expr("CAST(round(o_totalprice * 100) AS BIGINT)").alias("t_cents"),
    )
    wp = Window.partitionBy("l_orderkey")
    base = li.join(t, li.l_orderkey == t.o_orderkey).select(
        "l_orderkey",
        "line_uid",
        "l_linenumber",
        "t_cents",
        F.sum("w").over(wp).cast("long").alias("big_w"),
        (F.col("t_cents") * F.col("w")).alias("prod"),
    )
    ranked = base.select(
        "l_orderkey",
        "line_uid",
        "l_linenumber",
        "t_cents",
        F.expr("prod div big_w").alias("floor_cents"),
        F.sum(F.expr("prod div big_w")).over(wp).cast("long").alias("sum_floor"),
        F.row_number()
        .over(wp.orderBy((F.col("prod") % F.col("big_w")).desc(), "line_uid"))
        .alias("rn"),
    )
    return ranked.select(
        "l_orderkey",
        "line_uid",
        "l_linenumber",
        (
            F.col("floor_cents")
            + F.when(
                F.col("rn") <= F.col("t_cents") - F.col("sum_floor"), F.lit(1)
            ).otherwise(F.lit(0))
        )
        .cast("long")
        .alias("alloc_cents"),
    )


# --- linear-interpolation hourly resample -------------------------------------------


@register(
    "hourly_interp_by_type",
    oracle="""
    WITH obs AS (
        SELECT event_type, h, v FROM (
            SELECT event_type, date_trunc('hour', ts) AS h, value AS v,
                   row_number() OVER (
                       PARTITION BY event_type, date_trunc('hour', ts)
                       ORDER BY ts DESC, event_id DESC) AS rn
            FROM events
        ) WHERE rn = 1
    ),
    spine AS (
        SELECT event_type,
               unnest(generate_series(min(h), max(h), INTERVAL 1 HOUR)) AS h
        FROM obs GROUP BY event_type
    ),
    joined AS (
        SELECT s.event_type, s.h, o.v
        FROM spine s LEFT JOIN obs o
          ON o.event_type = s.event_type AND o.h = s.h
    ),
    carried AS (
        SELECT event_type, h, v,
               last_value(v IGNORE NULLS) OVER wp AS pv,
               last_value(CASE WHEN v IS NOT NULL THEN h END IGNORE NULLS)
                   OVER wp AS ph,
               first_value(v IGNORE NULLS) OVER wn AS nv,
               first_value(CASE WHEN v IS NOT NULL THEN h END IGNORE NULLS)
                   OVER wn AS nh
        FROM joined
        WINDOW wp AS (PARTITION BY event_type ORDER BY h
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
               wn AS (PARTITION BY event_type ORDER BY h
                      ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)
    )
    SELECT event_type,
           strftime(h, '%Y-%m-%d %H:%M:%S') AS hour,
           CASE WHEN v IS NOT NULL THEN v
                ELSE pv + (nv - pv)
                     * (CAST(date_diff('hour', ph, h) AS DOUBLE)
                        / CAST(date_diff('hour', ph, nh) AS DOUBLE))
           END AS interp_value,
           v IS NULL AS is_gap
    FROM carried
    """,
)
def hourly_interp_by_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Linear-interpolation resampling: the dense hourly series per event
    type where silent hours take the time-weighted line between the
    surrounding observations — the numeric-feature companion to
    ``hourly_locf_by_type`` (LOCF holds state; interpolation assumes a
    continuous signal, the convention for sensor/metric gap fill).

    Determinism: endpoints are SELECTED raw doubles (same (ts, event_id)
    max_by tiebreak as LOCF); hour offsets are exact integers; the one
    float expression ``pv + (nv−pv)·(Δ₁/Δ₂)`` is mirrored
    operation-for-operation, so bits match unrounded. The spine spans
    min..max observed hour per type, so every gap has both endpoints
    (no extrapolation branch). Scale: identical to LOCF — events collapse
    to (type, hour) first; both carries are frames over the
    |types|×|hours| spine, never event volume.
    """
    ev = load_table(spark, sf_dir, "events")
    obs = ev.groupBy("event_type", F.date_trunc("hour", "ts").alias("h")).agg(
        F.expr("max_by(value, struct(ts, event_id))").alias("v")
    )
    spine = (
        obs.groupBy("event_type")
        .agg(F.min("h").alias("h0"), F.max("h").alias("h1"))
        .select(
            "event_type",
            F.explode(
                F.sequence(F.col("h0"), F.col("h1"), F.expr("INTERVAL 1 HOUR"))
            ).alias("h"),
        )
    )
    joined = spine.join(obs, ["event_type", "h"], "left")
    wp = (
        Window.partitionBy("event_type")
        .orderBy("h")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    wn = (
        Window.partitionBy("event_type")
        .orderBy("h")
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    )
    h_obs = F.when(F.col("v").isNotNull(), F.col("h"))
    carried = joined.select(
        "event_type",
        "h",
        "v",
        F.last("v", ignorenulls=True).over(wp).alias("pv"),
        F.last(h_obs, ignorenulls=True).over(wp).alias("ph"),
        F.first("v", ignorenulls=True).over(wn).alias("nv"),
        F.first(h_obs, ignorenulls=True).over(wn).alias("nh"),
    )
    interp = F.when(F.col("v").isNotNull(), F.col("v")).otherwise(
        F.col("pv")
        + (F.col("nv") - F.col("pv"))
        * (
            F.expr("CAST(timestampdiff(HOUR, ph, h) AS DOUBLE)")
            / F.expr("CAST(timestampdiff(HOUR, ph, nh) AS DOUBLE)")
        )
    )
    return carried.select(
        "event_type",
        F.date_format("h", _TS_FMT).alias("hour"),
        interp.alias("interp_value"),
        F.col("v").isNull().alias("is_gap"),
    )


# --- Wilson lower-bound CTR ranking -------------------------------------------------

_WILSON_Z = "1.959963984540054"  # 97.5% normal quantile, shared literal


@register(
    "wilson_ctr_by_user",
    oracle=f"""
    WITH agg AS (
        SELECT user_id,
               CAST(count(*) FILTER (WHERE event_type = 'view') AS BIGINT)
                   AS views,
               CAST(count(*) FILTER (WHERE event_type = 'click') AS BIGINT)
                   AS clicks
        FROM events WHERE event_type IN ('view', 'click')
        GROUP BY user_id
    )
    SELECT user_id, views, clicks,
           round((CAST(least(clicks, views) AS DOUBLE) / CAST(views AS DOUBLE)
                  + ({_WILSON_Z} * {_WILSON_Z})
                      / (2.0 * CAST(views AS DOUBLE))
                  - {_WILSON_Z} * sqrt(
                        (CAST(least(clicks, views) AS DOUBLE)
                             / CAST(views AS DOUBLE)
                         * (1.0 - CAST(least(clicks, views) AS DOUBLE)
                                  / CAST(views AS DOUBLE))
                         + ({_WILSON_Z} * {_WILSON_Z})
                             / (4.0 * CAST(views AS DOUBLE)))
                        / CAST(views AS DOUBLE)))
                 / (1.0 + ({_WILSON_Z} * {_WILSON_Z})
                            / CAST(views AS DOUBLE)), 6)
               AS ctr_wilson_lb
    FROM agg WHERE views > 0
    """,
)
def wilson_ctr_by_user(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wilson-score lower-bound CTR per user: the small-sample-safe way to
    rank conversion rates (a 1/1 clicker must NOT outrank a 95/100 one —
    raw CTR does exactly that; the Wilson interval is the standard fix,
    e.g. Reddit's comment ranking).

    Determinism: counts are exact ints; p is ONE int/int division
    (successes clamped to ``least(clicks, views)`` — this synthetic event
    stream does not guarantee every click had a view, and p>1 would put a
    negative under the square root); the
    Wilson expression uses a shared z literal and is mirrored
    operation-for-operation — ``sqrt`` is IEEE-754 correctly-rounded in
    both engines, so bits match before the display rounding. Scale: one
    map-side-combinable rollup to |users| rows; the scoring is per-row
    arithmetic, no further shuffle.
    """
    ev = load_table(spark, sf_dir, "events")
    agg = (
        ev.filter(F.col("event_type").isin("view", "click"))
        .groupBy("user_id")
        .agg(
            F.count_if(F.col("event_type") == "view").cast("long").alias("views"),
            F.count_if(F.col("event_type") == "click").cast("long").alias("clicks"),
        )
        .filter(F.col("views") > 0)
    )
    z = _WILSON_Z
    wilson = F.expr(
        f"""round((CAST(least(clicks, views) AS DOUBLE) / CAST(views AS DOUBLE)
              + ({z} * {z}) / (2.0D * CAST(views AS DOUBLE))
              - {z} * sqrt(
                    (CAST(least(clicks, views) AS DOUBLE) / CAST(views AS DOUBLE)
                     * (1.0D - CAST(least(clicks, views) AS DOUBLE) / CAST(views AS DOUBLE))
                     + ({z} * {z}) / (4.0D * CAST(views AS DOUBLE)))
                    / CAST(views AS DOUBLE)))
             / (1.0D + ({z} * {z}) / CAST(views AS DOUBLE)), 6)"""
    )
    return agg.select(
        "user_id", "views", "clicks", wilson.alias("ctr_wilson_lb")
    )


# --- hour-of-day-adjusted outlier hours ---------------------------------------------


@register(
    "hod_adjusted_outlier_hours",
    oracle="""
    WITH hourly AS (
        SELECT date_trunc('hour', ts) AS h, CAST(count(*) AS BIGINT) AS c
        FROM events GROUP BY date_trunc('hour', ts)
    ),
    prof AS (
        SELECT CAST(hour(h) AS BIGINT) AS hod,
               CAST(count(*) AS BIGINT) AS n,
               CAST(sum(c) AS BIGINT) AS s1,
               CAST(sum(c * c) AS BIGINT) AS s2
        FROM hourly GROUP BY hour(h)
    )
    SELECT strftime(hourly.h, '%Y-%m-%d %H:%M:%S') AS hour,
           CAST(hour(hourly.h) AS BIGINT) AS hod,
           c,
           round((CAST(c AS DOUBLE) - CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE))
                 / sqrt(CAST(n * s2 - s1 * s1 AS DOUBLE)
                        / (CAST(n AS DOUBLE) * CAST(n AS DOUBLE))), 6)
               AS z_seasonal
    FROM hourly JOIN prof ON prof.hod = hour(hourly.h)
    WHERE n * s2 - s1 * s1 <> 0
      AND abs((CAST(c AS DOUBLE) - CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE))
              / sqrt(CAST(n * s2 - s1 * s1 AS DOUBLE)
                     / (CAST(n AS DOUBLE) * CAST(n AS DOUBLE)))) > 2.0
    """,
)
def hod_adjusted_outlier_hours(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Seasonality-adjusted anomaly detection: each hour's event count is
    z-scored against the profile of ITS OWN hour-of-day (all Mondays 9am
    vs this Monday 9am), so a daily cycle never masquerades as an anomaly
    — the deseasonalized upgrade of ``value_zscore_outliers``.

    Determinism: the per-hod profile keeps raw integer moments (n, Σc,
    Σc²); mean and population variance are derived with the exact-integer
    identity var = (n·Σc² − (Σc)²)/n² — no float ever enters a SUM (at
    100 TB widen the Σc² accumulator to DECIMAL(38,0), as elsewhere) —
    and sqrt is IEEE correctly-rounded, so the z expression is
    bit-identical and the >2σ row set matches exactly. Scale: events
    collapse to the |hours| rollup; the profile is 24 rows, broadcast
    back over it.
    """
    ev = load_table(spark, sf_dir, "events")
    hourly = ev.groupBy(F.date_trunc("hour", "ts").alias("h")).agg(
        F.count(F.lit(1)).cast("long").alias("c")
    )
    prof = hourly.groupBy(F.hour("h").cast("long").alias("hod")).agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("c").cast("long").alias("s1"),
        F.sum(F.col("c") * F.col("c")).cast("long").alias("s2"),
    )
    joined = hourly.join(
        F.broadcast(prof), F.hour("h").cast("long") == F.col("hod")
    )
    z = (
        F.col("c").cast("double")
        - F.col("s1").cast("double") / F.col("n").cast("double")
    ) / F.sqrt(
        (F.col("n") * F.col("s2") - F.col("s1") * F.col("s1")).cast("double")
        / (F.col("n").cast("double") * F.col("n").cast("double"))
    )
    # exact-integer guard: a hod profile with zero variance (constant
    # counts, e.g. a single hour per hod) defines no z — flag nothing
    var_nonzero = (F.col("n") * F.col("s2") - F.col("s1") * F.col("s1")) != 0
    return joined.filter(var_nonzero & (F.abs(z) > 2.0)).select(
        F.date_format("h", _TS_FMT).alias("hour"),
        "hod",
        "c",
        F.round(z, 6).alias("z_seasonal"),
    )


# --- exact-OLS hourly trend + one-step forecast -------------------------------------


@register(
    "hourly_trend_forecast",
    oracle="""
    WITH hourly AS (
        SELECT date_trunc('hour', ts) AS h, CAST(count(*) AS BIGINT) AS c
        FROM events GROUP BY date_trunc('hour', ts)
    ),
    xy AS (
        SELECT CAST(date_diff('hour', (SELECT min(h) FROM hourly), h)
                    AS BIGINT) AS x,
               c AS y
        FROM hourly
    ),
    s AS (
        SELECT CAST(count(*) AS BIGINT) AS n,
               CAST(sum(x) AS BIGINT) AS sx,
               CAST(sum(y) AS BIGINT) AS sy,
               CAST(sum(x * y) AS BIGINT) AS sxy,
               CAST(sum(x * x) AS BIGINT) AS sxx,
               CAST(max(x) AS BIGINT) AS xmax
        FROM xy
    )
    SELECT n AS n_hours,
           round(CASE WHEN n * sxx - sx * sx = 0 THEN 0.0 ELSE
                 CAST(n * sxy - sx * sy AS DOUBLE)
                 / CAST(n * sxx - sx * sx AS DOUBLE) END, 6) AS slope,
           round((CAST(sy AS DOUBLE)
                  - CASE WHEN n * sxx - sx * sx = 0 THEN 0.0 ELSE
                    CAST(n * sxy - sx * sy AS DOUBLE)
                    / CAST(n * sxx - sx * sx AS DOUBLE) END
                    * CAST(sx AS DOUBLE)) / CAST(n AS DOUBLE), 6)
               AS intercept,
           round((CAST(sy AS DOUBLE)
                  - CASE WHEN n * sxx - sx * sx = 0 THEN 0.0 ELSE
                    CAST(n * sxy - sx * sy AS DOUBLE)
                    / CAST(n * sxx - sx * sx AS DOUBLE) END
                    * CAST(sx AS DOUBLE)) / CAST(n AS DOUBLE)
                 + CASE WHEN n * sxx - sx * sx = 0 THEN 0.0 ELSE
                   CAST(n * sxy - sx * sy AS DOUBLE)
                   / CAST(n * sxx - sx * sx AS DOUBLE) END
                   * CAST(xmax + 1 AS DOUBLE), 4) AS forecast_next_hour
    FROM s
    """,
)
def hourly_trend_forecast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact-integer OLS trend over the hourly event-count series plus the
    one-step-ahead forecast ŷ(x_max+1) — the deterministic cousin of
    ``stats_regression_lineitem`` (whose ``regr_*`` builtins accumulate
    float co-moments in engine-specific order; here EVERY sum is int64,
    so slope and intercept are single divisions of exact integers and
    bits match across engines and partition layouts).

    x is hours-since-first-hour (exact int), y the hourly count. Sums
    n·Σxy etc. stay well inside int64 at any realistic calendar span
    (x ≤ 10⁶ hours ≈ a century; widen to DECIMAL(38,0) beyond). Scale:
    one map-side-combinable rollup to |hours| rows, one scalar subquery
    for the time origin, one single-row reduce.
    """
    ev = load_table(spark, sf_dir, "events")
    hourly = ev.groupBy(F.date_trunc("hour", "ts").alias("h")).agg(
        F.count(F.lit(1)).cast("long").alias("c")
    )
    h0 = hourly.agg(F.min("h").alias("h0"))
    xy = hourly.join(F.broadcast(h0)).select(
        F.expr("CAST(timestampdiff(HOUR, h0, h) AS BIGINT)").alias("x"),
        F.col("c").alias("y"),
    )
    s = xy.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("x").cast("long").alias("sx"),
        F.sum("y").cast("long").alias("sy"),
        F.sum(F.col("x") * F.col("y")).cast("long").alias("sxy"),
        F.sum(F.col("x") * F.col("x")).cast("long").alias("sxx"),
        F.max("x").cast("long").alias("xmax"),
    )
    # a single distinct hour has zero x-variance: slope degenerates to 0
    # (forecast = the flat mean), identically on both engines — CASE
    # branches evaluate lazily, so the ANSI division never fires
    denom = F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")
    slope = F.when(denom == 0, F.lit(0.0)).otherwise(
        (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")).cast("double")
        / denom.cast("double")
    )
    intercept = (
        F.col("sy").cast("double") - slope * F.col("sx").cast("double")
    ) / F.col("n").cast("double")
    return s.select(
        F.col("n").alias("n_hours"),
        F.round(slope, 6).alias("slope"),
        F.round(intercept, 6).alias("intercept"),
        F.round(
            intercept + slope * (F.col("xmax") + 1).cast("double"), 4
        ).alias("forecast_next_hour"),
    )


# --- open-order aging buckets -------------------------------------------------------


@register(
    "order_aging_buckets",
    oracle="""
    WITH horizon AS (SELECT max(o_orderdate) AS h FROM orders),
    aged AS (
        SELECT CAST(date_diff('day', o_orderdate, (SELECT h FROM horizon))
                    AS BIGINT) AS age_days,
               CAST(round(o_totalprice * 100) AS BIGINT) AS cents
        FROM orders WHERE o_orderstatus = 'O'
    )
    SELECT CASE WHEN age_days <= 30 THEN '0-30'
                WHEN age_days <= 60 THEN '31-60'
                WHEN age_days <= 90 THEN '61-90'
                ELSE '90+' END AS age_bucket,
           CAST(count(*) AS BIGINT) AS n_orders,
           CAST(sum(cents) AS BIGINT) AS total_cents,
           CAST(min(age_days) AS BIGINT) AS min_age_days,
           CAST(max(age_days) AS BIGINT) AS max_age_days
    FROM aged GROUP BY 1
    """,
)
def order_aging_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Open-order aging report: every still-open order ('O') bucketed by
    days outstanding against the data horizon (0-30 / 31-60 / 61-90 /
    90+), with count and exact total value per bucket — the
    accounts-receivable aging statement, the finance twin of
    ``churned_users``' horizon convention.

    Exactness: pure date arithmetic, int64 cents sums. Scale: the filter
    pushes to the scan; the horizon is a 1-row broadcast scalar; the
    rollup has 4 output rows (map-side combine collapses everything).
    """
    orders = load_table(spark, sf_dir, "orders")
    open_orders = orders.filter(F.col("o_orderstatus") == "O")
    horizon = orders.agg(F.max("o_orderdate").alias("h"))
    aged = open_orders.join(F.broadcast(horizon)).select(
        F.datediff(F.col("h"), F.col("o_orderdate")).cast("long").alias("age_days"),
        F.expr("CAST(round(o_totalprice * 100) AS BIGINT)").alias("cents"),
    )
    bucket = (
        F.when(F.col("age_days") <= 30, "0-30")
        .when(F.col("age_days") <= 60, "31-60")
        .when(F.col("age_days") <= 90, "61-90")
        .otherwise("90+")
    )
    return aged.groupBy(bucket.alias("age_bucket")).agg(
        F.count(F.lit(1)).cast("long").alias("n_orders"),
        F.sum("cents").cast("long").alias("total_cents"),
        F.min("age_days").cast("long").alias("min_age_days"),
        F.max("age_days").cast("long").alias("max_age_days"),
    )


# --- inter-order gap median by nation ------------------------------------------------


@register(
    "interorder_gap_median_by_nation",
    oracle="""
    WITH gaps AS (
        SELECT c.c_nationkey,
               CAST(date_diff('day',
                    lag(o.o_orderdate) OVER (PARTITION BY o.o_custkey
                        ORDER BY o.o_orderdate, o.o_orderkey),
                    o.o_orderdate) AS BIGINT) AS gap_days
        FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey
    ),
    vd AS (
        SELECT n.n_name, gap_days, CAST(count(*) AS BIGINT) AS cnt
        FROM gaps JOIN nation n ON n.n_nationkey = gaps.c_nationkey
        WHERE gap_days IS NOT NULL
        GROUP BY n.n_name, gap_days
    ),
    cum AS (
        SELECT n_name, gap_days,
               CAST(sum(cnt) OVER (PARTITION BY n_name ORDER BY gap_days
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                    AS BIGINT) AS cum,
               CAST(sum(cnt) OVER (PARTITION BY n_name) AS BIGINT) AS n
        FROM vd
    )
    SELECT n_name,
           min(gap_days) AS median_gap_days,
           min(n) AS n_gaps
    FROM cum WHERE cum * 2 >= n
    GROUP BY n_name
    """,
)
def interorder_gap_median_by_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Median days between a customer's consecutive orders, rolled up per
    nation — the repeat-purchase cadence metric behind replenishment
    forecasting, with the median SELECTED exactly (lower-median
    convention of ``weighted_median_quantity``), never interpolated.

    Exactness: gaps are integer day differences over a (orderdate,
    orderkey) total order; the median comes from an integer cumulative
    over the per-nation gap VALUE-DOMAIN rollup (≤ |distinct gaps| rows),
    compared with the cross-multiplied test 2·cum ≥ n. Scale: one
    custkey-partitioned lag (the same exchange the per-customer rollup
    uses), broadcast customer/nation dims, calendar-bounded value domain.
    """
    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    lag_d = F.lag("o_orderdate").over(
        Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    )
    gaps = (
        orders.join(F.broadcast(customer), orders.o_custkey == customer.c_custkey)
        .select(
            "c_nationkey",
            F.datediff(F.col("o_orderdate"), lag_d).cast("long").alias("gap_days"),
        )
        .filter(F.col("gap_days").isNotNull())
    )
    vd = (
        gaps.join(F.broadcast(nation), gaps.c_nationkey == nation.n_nationkey)
        .groupBy("n_name", "gap_days")
        .agg(F.count(F.lit(1)).cast("long").alias("cnt"))
    )
    w = Window.partitionBy("n_name").orderBy("gap_days")
    cum = vd.select(
        "n_name",
        "gap_days",
        F.sum("cnt")
        .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
        .cast("long")
        .alias("cum"),
        F.sum("cnt").over(Window.partitionBy("n_name")).cast("long").alias("n"),
    )
    return (
        cum.filter(F.col("cum") * 2 >= F.col("n"))
        .groupBy("n_name")
        .agg(
            F.min("gap_days").alias("median_gap_days"),
            F.min("n").alias("n_gaps"),
        )
    )


# --- catalog price-dispersion audit -------------------------------------------------


@register(
    "price_dispersion_by_part",
    oracle="""
    WITH stats AS (
        SELECT l_partkey,
               CAST(count(*) AS BIGINT) AS n,
               CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT))
                    AS BIGINT) AS s1,
               CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)
                        * CAST(round(l_extendedprice * 100) AS BIGINT))
                    AS BIGINT) AS s2
        FROM lineitem GROUP BY l_partkey
    )
    SELECT l_partkey, n,
           CAST(s1 // n AS BIGINT) AS mean_cents_floor,
           round(sqrt(CAST(n * s2 - s1 * s1 AS DOUBLE))
                 / CAST(s1 AS DOUBLE), 6) AS cv
    FROM stats WHERE n >= 2 AND s1 > 0
    """,
)
def price_dispersion_by_part(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Catalog price-consistency audit: the coefficient of variation of
    the prices each part actually sold at — high CV flags inconsistent
    pricing/data errors (the per-part analog of the per-type z-score
    screens).

    Exactness: integer moments (n, Σcents, Σcents²); the algebraic
    rearrangement cv = σ/μ = √(n·Σx²−(Σx)²) / Σx needs ONE correctly-
    rounded sqrt and ONE division — no mean ever materialized as a float
    (Σx² ≲ 10¹⁴·rows here; DECIMAL(38,0) at 100 TB, as everywhere). The
    displayed mean is an exact integer floor. Scale: one
    map-side-combinable rollup keyed on partkey, per-row finishing math,
    no joins.
    """
    li = load_table(spark, sf_dir, "lineitem")
    cents = F.expr("CAST(round(l_extendedprice * 100) AS BIGINT)")
    stats = li.groupBy("l_partkey").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum(cents).cast("long").alias("s1"),
        F.sum(cents * cents).cast("long").alias("s2"),
    )
    return stats.filter((F.col("n") >= 2) & (F.col("s1") > 0)).select(
        "l_partkey",
        "n",
        F.expr("CAST(s1 div n AS BIGINT)").alias("mean_cents_floor"),
        F.round(
            F.sqrt((F.col("n") * F.col("s2") - F.col("s1") * F.col("s1")).cast("double"))
            / F.col("s1").cast("double"),
            6,
        ).alias("cv"),
    )
