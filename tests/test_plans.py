"""Physical-plan assertions: the scale properties the queries rely on,
locked as tests so a regression in composition (or a Spark upgrade)
surfaces here instead of at 100 TB.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from kafka_streams_tcp_reconciliation_spark.plans import all_queries
from kafka_streams_tcp_reconciliation_spark.sources.tables import load_table

QUERIES = all_queries()


def plan_of(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_q1_filter_pushdown_and_pruning(spark, sf_dir):
    plan = plan_of(QUERIES["q1_pricing_summary"](spark, sf_dir))
    assert "PushedFilters: [IsNotNull(l_shipdate), LessThanOrEqual(l_shipdate" in plan
    # column pruning: the scan must not read l_orderkey/l_partkey/l_suppkey
    read_schema = [l for l in plan.splitlines() if "ReadSchema" in l][0]
    assert "l_orderkey" not in read_schema and "l_partkey" not in read_schema


@pytest.mark.parametrize(
    "name, n_bhj",
    [("q3_top_revenue_orders", 2), ("q5_local_supplier_volume", 5), ("q10_returned_items", 2)],
)
def test_star_joins_broadcast_dimensions(spark, sf_dir, name, n_bhj):
    plan = plan_of(QUERIES[name](spark, sf_dir))
    assert plan.count("BroadcastHashJoin") >= n_bhj, (
        f"{name}: expected >= {n_bhj} broadcast joins\n{plan}"
    )


def test_topk_uses_window_group_limit(spark, sf_dir):
    plan = plan_of(QUERIES["window_topk_orders_per_customer"](spark, sf_dir))
    assert "WindowGroupLimit" in plan


def test_reservoir_sample_uses_window_group_limit(spark, sf_dir):
    """The hash-rank keep-K must prune with per-key K-heaps, never a full
    per-user sort — the property that makes it a 100 TB skew guard."""
    plan = plan_of(QUERIES["reservoir_sample_per_user"](spark, sf_dir))
    assert "WindowGroupLimit" in plan


def test_global_topk_avoids_full_sort(spark, sf_dir):
    plan = plan_of(QUERIES["orderby_limit_top_lineitems"](spark, sf_dir))
    assert "TakeOrderedAndProject" in plan


def test_q2_single_window_exchange(spark, sf_dir):
    """q2's decorrelated min: ONE window over p_partkey (no second scan of
    the supply bridge for the subquery) and a top-k sort, never a global
    sort of the candidate set."""
    plan = plan_of(QUERIES["q2_min_cost_supplier"](spark, sf_dir))
    assert plan.count("Window") == 1
    assert "TakeOrderedAndProject" in plan


def test_q11_threshold_is_broadcast_not_collected(spark, sf_dir):
    """The global-scalar threshold must reach the per-part values via a
    broadcast join — a nested-loop broadcast of a 1-row relation — not a
    driver-side collect or a single-partition window."""
    plan = plan_of(QUERIES["q11_important_parts"](spark, sf_dir))
    assert "BroadcastNestedLoopJoin" in plan
    assert "Window" not in plan


def test_q21_semi_anti_join_chain(spark, sf_dir):
    """EXISTS/NOT EXISTS become semi/anti joins (never a row-exploding
    inner join + dedup)."""
    plan = plan_of(QUERIES["q21_waiting_suppliers"](spark, sf_dir))
    assert "LeftSemi" in plan
    assert "LeftAnti" in plan


def test_tfidf_vocab_broadcast(spark, sf_dir):
    """df (vocabulary-sized) joins back onto tf via broadcast — the tf
    relation must not shuffle by term (zipfian skew at corpus scale)."""
    plan = plan_of(QUERIES["tfidf_top_terms"](spark, sf_dir))
    assert "BroadcastHashJoin" in plan
    # exactly one sort-based window: the final top-k by doc_id
    assert "WindowGroupLimit" in plan


def test_pack_bins_no_global_sort(spark, sf_dir):
    """Sequence packing must sort only within hash shards (window over
    shard), never globally."""
    plan = plan_of(QUERIES["pack_token_budget_bins"](spark, sf_dir))
    assert "Window" in plan
    # the only Sort permitted is the window's local per-shard sort
    import re

    sorts = [l for l in plan.splitlines() if re.search(r"\bSort\b", l)]
    assert all("global=false" in s.lower() or "false" in s for s in sorts), sorts


def test_observe_metrics(spark, sf_dir):
    """P7 peek: observe() accumulates pass-through metrics without
    changing the plan's results."""
    ev = load_table(spark, sf_dir, "events")
    observed = ev.observe(
        "ev_metrics",
        F.count(F.lit(1)).alias("rows_seen"),
        F.sum("value").alias("value_sum"),
    )
    n = observed.count()
    # metrics surface through the observation API on the last action
    from pyspark.sql import Observation  # noqa: F401  (API presence)

    assert n == ev.count()


def test_repetition_score_is_shuffle_free(spark, sf_dir):
    """doc_repetition_score is a narrow map — the gram list never explodes
    to rows, so the executed plan must contain no Exchange at all."""
    plan = plan_of(QUERIES["doc_repetition_score"](spark, sf_dir))
    assert "Exchange" not in plan


def test_mixture_upsample_is_narrow(spark, sf_dir):
    """mixture_upsample_sources is a 1->w flatMap (Generate over a
    sequence) with no shuffle."""
    plan = plan_of(QUERIES["mixture_upsample_sources"](spark, sf_dir))
    assert "Exchange" not in plan
    assert "Generate" in plan


def test_length_outlier_bounds_broadcast_not_collected(spark, sf_dir):
    """The p5/p95 bounds are a 1-row aggregate reaching the scan via a
    broadcast nested-loop join — never a collect()ed literal."""
    plan = plan_of(QUERIES["filter_length_outliers"](spark, sf_dir))
    assert "BroadcastNestedLoopJoin" in plan


def test_decontaminate_joins_on_int_gram_hashes(spark, sf_dir):
    """The train<->eval overlap joins on int64 gram hashes (8-byte shuffle
    keys), and the join is a hash/merge equi-join, not a nested loop."""
    df = QUERIES["decontaminate_train_eval"](spark, sf_dir)
    plan = plan_of(df)
    assert "BroadcastNestedLoopJoin" not in plan and "CartesianProduct" not in plan
    # the join key g is bigint in the analyzed schema of the join input
    assert df.schema["n_shared_grams"].dataType.typeName() == "long"


def test_jaccard_inverted_index_joins_on_hashes(spark, sf_dir):
    """dedup_ngram_jaccard's self-join shuffles 8-byte shingle hashes,
    never n-gram strings: the exploded join column is bigint."""
    from kafka_streams_tcp_reconciliation_spark.operators import dedup as dd
    from kafka_streams_tcp_reconciliation_spark.sources.tables import load_table

    docs = load_table(spark, sf_dir, "documents")
    sh = docs.select(
        "doc_id", dd.shingle_expr("text", 3).alias("raw")
    ).select("doc_id", dd.shingle_hashes_expr("raw").alias("shingles"))
    ex = sh.select(F.explode("shingles").alias("s"))
    assert ex.schema["s"].dataType.typeName() == "long"


@pytest.mark.parametrize(
    "name",
    [
        "doc_repetition_score",
        "decontaminate_train_eval",
        "dedup_minhash_lsh",
        "dedup_simhash",
    ],
)
def test_two_level_gram_hash_not_inlined(spark, sf_dir, name):
    """The word-hash arrays must stay separate projected columns: if the
    gram lambda (or a pushed-down filter) inlines them, per-doc cost goes
    O(words²) — measured 28s vs 0.25s at sf0.1 for the repetition score."""
    plan = plan_of(QUERIES[name](spark, sf_dir))
    assert "slice(transform(split" not in plan
    assert "size(transform(sequence" not in plan  # filter over computed grams


@pytest.mark.parametrize("name", ["text_pii_redact", "embedding_quantize_int8"])
def test_per_row_text_ops_are_narrow(spark, sf_dir, name):
    """Redaction and quantization are per-row maps: the only exchange
    allowed is scale_out's round-robin widening — never a hash shuffle,
    join, or window."""
    plan = plan_of(QUERIES[name](spark, sf_dir))
    assert "Window" not in plan and "Join" not in plan
    assert "hashpartitioning" not in plan


def test_zscore_stats_broadcast_not_collected(spark, sf_dir):
    """The per-type (mu, sigma) stats reach the event scan via a
    broadcast hash join — a 4-row build side, never a collect()ed
    literal and never a corpus-wide window."""
    plan = plan_of(QUERIES["value_zscore_outliers"](spark, sf_dir))
    assert "BroadcastHashJoin" in plan
    assert "Window" not in plan


@pytest.mark.parametrize("name", ["boilerplate_ngram_spans"])
def test_boilerplate_grams_not_inlined(spark, sf_dir, name):
    """Same O(words²) inlining class as test_two_level_gram_hash_not_inlined,
    plus the InferFiltersFromGenerate variant this query regressed on: a
    plain explode of the computed gram array synthesizes size(ghs) > 0 and
    pushes the whole two-level fold into an interpreted Filter (measured
    40s vs 1.6s at sf0.1). explode_outer + null-filter keeps it out."""
    plan = plan_of(QUERIES[name](spark, sf_dir))
    assert "slice(transform(split" not in plan
    assert "size(transform(sequence" not in plan
    assert "size(array_distinct(transform" not in plan


def test_embedding_lsh_buckets_computed_once(spark, sf_dir):
    """The 16-hyperplane bucket expression must appear exactly once (in the
    projection) — an inferred size() filter on the exploded struct array
    would re-evaluate every plane dot product per row. The lambda variable
    `lt_t` occurs ~20 times inside ONE instance of the expression;
    duplication doubles it."""
    plan = plan_of(QUERIES["dedup_embedding_neardup"](spark, sf_dir))
    assert plan.count("lt_t") <= 20, "LSH bucket expression evaluated twice"


def test_domain_quota_uses_window_group_limit(spark, sf_dir):
    """The per-source cap must run as WindowGroupLimit (bounded per-group
    heap), never a full per-domain sort — a hot host with 100M pages is a
    streaming pass, not O(n log n)."""
    plan = plan_of(QUERIES["domain_quota_sample"](spark, sf_dir))
    assert "WindowGroupLimit" in plan


def test_unigram_logprob_total_broadcast(spark, sf_dir):
    """The corpus token total (1 row) must reach the vocab via broadcast
    (nested-loop of a scalar relation), never a collect()ed literal; the
    per-term log-prob join stays a hash join that AQE can skew-split."""
    plan = plan_of(QUERIES["unigram_logprob_score"](spark, sf_dir))
    assert "BroadcastNestedLoopJoin" in plan
    assert "BroadcastHashJoin" in plan


def test_pq_adc_shape(spark, sf_dir):
    """PQ-ADC: encoding must be shuffle-free (the codebook arrives as a
    one-row broadcast frame — broadcast nested-loop, never an exchange,
    feeding the encode projection), queries+LUTs must broadcast
    (nested-loop against the encoded scan), and the per-query top-k must
    run as WindowGroupLimit."""
    plan = plan_of(QUERIES["similarity_pq_adc"](spark, sf_dir))
    assert "BroadcastNestedLoopJoin" in plan
    assert "WindowGroupLimit" in plan
    assert "SortMergeJoin" not in plan and "ShuffledHashJoin" not in plan


def test_dq_audit_referential_check_broadcasts(spark, sf_dir):
    """The orphan-custkey referential check must be a broadcast anti-join
    against the customer dim — never a shuffle of the fact table just to
    count violations."""
    plan = plan_of(QUERIES["dq_audit_contracts"](spark, sf_dir))
    assert "BroadcastHashJoin" in plan
    assert "LeftAnti" in plan


def test_histogram_single_exchange(spark, sf_dir):
    """Equi-width histogram: bucket id is a narrow per-row expression, so
    the whole query is scan → partial agg → ONE exchange (of at most
    #buckets × #partitions rows) → final agg."""
    plan = plan_of(QUERIES["histogram_order_totals"](spark, sf_dir))
    assert plan.count("Exchange") == 1


def test_scd2_single_shuffle(spark, sf_dir):
    """SCD2 build is one shuffle on user_id feeding one streaming window
    (lead) — no join, no second exchange."""
    plan = plan_of(QUERIES["scd2_purchase_value_history"](spark, sf_dir))
    assert plan.count("Exchange") == 1
    assert "SortMergeJoin" not in plan


def test_semantic_dedup_shape(spark, sf_dir):
    """SemDeDup: centroid assignment must broadcast the K seed vectors
    against one corpus scan (nested-loop of a tiny relation), the
    intra-cluster pair stage must join on cluster id (equi-join — never a
    corpus×corpus CartesianProduct), and the per-cluster top pair must
    run as WindowGroupLimit."""
    plan = plan_of(QUERIES["dedup_semantic_clusters"](spark, sf_dir))
    assert "BroadcastNestedLoopJoin" in plan
    assert "CartesianProduct" not in plan
    assert "WindowGroupLimit" in plan


def test_rolling_active_users_fanout_after_dedup(spark, sf_dir):
    """The 24× hour fan-out (explode) must sit ABOVE the (hour, user)
    dedup aggregate, so it multiplies unique pairs, not raw events; the
    observed-hours prune is a broadcast semi-join on the integer bucket."""
    plan = plan_of(QUERIES["rolling_active_users_24h"](spark, sf_dir))
    assert "Generate explode" in plan
    assert "BroadcastHashJoin" in plan and "LeftSemi" in plan
    gen = plan.index("Generate explode")
    # a HashAggregate (the pair dedup) must appear below (later in the
    # printed tree than) the Generate node
    assert "HashAggregate" in plan[gen:]


def test_session_paths_shares_one_sort(spark, sf_dir):
    """Both stacked windows (gap flag + running session id) sort by the
    same (user_id, ts, event_id) key — the plan must contain ONE sort and
    reuse the user_id exchange, not re-shuffle between windows."""
    plan = plan_of(QUERIES["session_event_paths"](spark, sf_dir))
    assert plan.count("Exchange") == 2  # user_id shuffle + final path rollup
    assert plan.count("Sort") == 1


def test_transition_matrix_normalizes_matrix_not_events(spark, sf_dir):
    """The row-normalizing window must run AFTER the (from,to) count
    rollup — over a |types|² relation — never over the event-sized
    sequence; and nothing sort-merge-joins."""
    plan = plan_of(QUERIES["event_transition_matrix"](spark, sf_dir))
    assert "SortMergeJoin" not in plan
    # lag window (event-sized) + normalize window (matrix-sized) only
    assert plan.count("Window") == 2


def test_gapfill_joins_are_broadcast(spark, sf_dir):
    """The dense-spine fill must broadcast: spine × types is a nested-loop
    of calendar-bounded relations and the counts join a BroadcastHashJoin —
    no event-sized relation may shuffle into a sort-merge join."""
    plan = plan_of(QUERIES["events_gapfill_hourly"](spark, sf_dir))
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan and "CartesianProduct" not in plan


def test_mad_outliers_stats_broadcast_back(spark, sf_dir):
    """Both stats relations (median, then median+MAD) are |types|-sized
    and must broadcast back onto the event scan — two BroadcastHashJoins,
    zero sort-merge joins."""
    plan = plan_of(QUERIES["events_mad_outliers"](spark, sf_dir))
    assert plan.count("BroadcastHashJoin") == 2
    assert "SortMergeJoin" not in plan


def test_advanced_ops_plan_locks(spark, sf_dir):
    """Plan-shape locks for the advanced block (SCALE.md claims):
    no nested-loop/cartesian anywhere, dims broadcast where claimed."""
    # keyless range join: equi-shuffle on the bucket, never BNLJ
    p = plan_of(QUERIES["range_join_coactivity"](spark, sf_dir))
    assert "BroadcastNestedLoopJoin" not in p and "CartesianProduct" not in p
    # kNN graph: cell equi-shuffle only — the single allowed BNLJ is the
    # 1-row (count, n_labels) stats broadcast that sizes the plane count
    # (round 10's data-proportional cells); a second one would mean a real
    # cartesian crept in
    p = plan_of(QUERIES["knn_graph_within_cells"](spark, sf_dir))
    assert "CartesianProduct" not in p
    assert p.count("BroadcastNestedLoopJoin") <= 1, p
    p = plan_of(QUERIES["knn_graph_cell_scaling"](spark, sf_dir))
    assert "CartesianProduct" not in p
    assert p.count("BroadcastNestedLoopJoin") <= 1, p
    # revenue share + top-parts: dimension joins broadcast
    p = plan_of(QUERIES["revenue_share_within_region"](spark, sf_dir))
    assert p.count("BroadcastHashJoin") >= 3, p
    p = plan_of(QUERIES["top_parts_with_other_rollup"](spark, sf_dir))
    assert "BroadcastHashJoin" in p, p
    # heavy hitters: candidate set broadcast back over the scan (the total
    # joins as a 1-row broadcast scalar — a BNLJ of one row is fine)
    p = plan_of(QUERIES["heavy_hitter_words"](spark, sf_dir))
    assert p.count("BroadcastHashJoin") >= 1, p
    # CMS probes broadcast against the cell table
    p = plan_of(QUERIES["count_min_word_frequencies"](spark, sf_dir))
    assert "BroadcastHashJoin" in p, p
    # temporal holdout: cutoff is a broadcast scalar, not a collected literal
    p = plan_of(QUERIES["temporal_holdout_split"](spark, sf_dir))
    assert "BroadcastNestedLoopJoin" in p or "BroadcastHashJoin" in p, p


def test_new_analytics_plan_locks(spark, sf_dir):
    """Plan-shape locks for the newest analytics/curation block."""
    # vocab: top-K via TakeOrderedAndProject (never a single-partition
    # global window), vocabulary probe broadcast
    p = plan_of(QUERIES["vocab_oov_rate"](spark, sf_dir))
    assert "TakeOrderedAndProject" in p, p
    assert "BroadcastHashJoin" in p, p
    # gini: customer + nation dims broadcast into the orders scan
    p = plan_of(QUERIES["gini_revenue_by_nation"](spark, sf_dir))
    assert p.count("BroadcastHashJoin") >= 2, p
    # seasonality ops: events collapse to the hourly rollup BEFORE any
    # join/window — exactly one aggregate keyed on the raw scan each side
    p = plan_of(QUERIES["seasonal_naive_error_daily"](spark, sf_dir))
    assert "CartesianProduct" not in p
    p = plan_of(QUERIES["hod_adjusted_outlier_hours"](spark, sf_dir))
    assert "BroadcastHashJoin" in p, p  # 24-row profile broadcast back
    # min-max scaling: |types|-row stats broadcast back over one scan
    p = plan_of(QUERIES["minmax_scale_values_by_type"](spark, sf_dir))
    assert "BroadcastHashJoin" in p, p
    # RFM: horizon is a 1-row broadcast, not a collected literal
    p = plan_of(QUERIES["rfm_user_segments"](spark, sf_dir))
    assert "BroadcastNestedLoopJoin" in p or "BroadcastHashJoin" in p, p
    # proration + interp + growth: single-shuffle families, no cartesian
    for name in ("prorate_order_total", "hourly_interp_by_type",
                 "growth_accounting_daily", "wilson_ctr_by_user"):
        p = plan_of(QUERIES[name](spark, sf_dir))
        assert "CartesianProduct" not in p, name


def test_mlprep_plan_locks(spark, sf_dir):
    """Plan-shape locks for the ML-prep / retrieval-depth block."""
    # full star flatten: every dimension broadcast, ZERO shuffles
    p = plan_of(QUERIES["star_flatten_wide"](spark, sf_dir))
    assert p.count("BroadcastHashJoin") >= 7, p
    assert "Exchange hashpartitioning" not in p, p
    # nearest-in-time join: one user_id shuffle, ONE shared sort for both
    # carry frames (forward + backward)
    p = plan_of(QUERIES["nearest_event_join"](spark, sf_dir))
    assert p.count("Exchange hashpartitioning") == 1, p
    assert p.count("Sort ") == 1, p
    # run-length encoding: lag+running-sum keeps every window on user_id —
    # one raw-data shuffle + one sort; run aggregate rides the same
    # partitioning (only the tiny rollup re-keys)
    p = plan_of(QUERIES["event_type_runlengths"](spark, sf_dir))
    assert p.count("Sort ") == 1, p
    # drawdown: stacked running windows share one exchange + one sort
    p = plan_of(QUERIES["value_drawdown_per_user"](spark, sf_dir))
    assert p.count("Exchange hashpartitioning") == 1, p
    assert p.count("Sort ") == 1, p
    # norm outliers: moment stats come back as a 1-row broadcast, and the
    # vector column never shuffles
    p = plan_of(QUERIES["embedding_norm_outliers"](spark, sf_dir))
    assert "BroadcastNestedLoopJoin" in p, p
    assert "Exchange hashpartitioning" not in p, p
    # winsorize: the |types|-row cut table broadcasts back over the scan
    p = plan_of(QUERIES["winsorize_values_by_type"](spark, sf_dir))
    assert "BroadcastHashJoin" in p, p
    # kNN vote: broadcast query set, per-partition top-k pruning
    p = plan_of(QUERIES["knn_label_accuracy"](spark, sf_dir))
    assert "WindowGroupLimit" in p, p
    assert "CartesianProduct" not in p, p
    # Bloom decontamination: the bitset arrives as a one-row broadcast
    # frame (nested-loop) so both probes are map-side bitmask filters; the
    # ONLY hash join is the exact verify join, broadcast; the train side
    # must never shuffle before it
    p = plan_of(QUERIES["bloom_decontaminate_train_eval"](spark, sf_dir))
    assert "BroadcastNestedLoopJoin" in p, p
    assert p.count("BroadcastHashJoin") >= 1, p
    assert "SortMergeJoin" not in p, p
    assert "CartesianProduct" not in p, p


def test_mlprep_round2_late_plan_locks(spark, sf_dir):
    """Plan locks for the bitmap / signature / experimentation block."""
    # Hamming tier: signature scan + WindowGroupLimit pruning, no cartesian
    p = plan_of(QUERIES["similarity_hamming_topk"](spark, sf_dir))
    assert "WindowGroupLimit" in p and "CartesianProduct" not in p, p
    # bitmap distinct: single fact scan, map-side-combined word aggregate
    p = plan_of(QUERIES["bitmap_distinct_users_by_type"](spark, sf_dir))
    assert p.count("Scan parquet") == 1, p
    # audience algebra: the cached word table feeds all three branches —
    # exactly one fact scan in the whole plan
    p = plan_of(QUERIES["bitmap_audience_combination"](spark, sf_dir))
    assert p.count("Scan parquet") <= 1 or "InMemoryTableScan" in p, p
    # dimension stats: one scan, one exchange (64-key moment rollup)
    p = plan_of(QUERIES["embedding_dimension_stats"](spark, sf_dir))
    assert p.count("Exchange hashpartitioning") == 1, p
    # CUPED: midpoint + theta are broadcast scalars, never collected
    p = plan_of(QUERIES["cuped_ab_lift"](spark, sf_dir))
    assert "BroadcastNestedLoopJoin" in p, p
    # negative sampling: generator is shuffle-free; attribute fetch joins
    p = plan_of(QUERIES["negative_sampling_pairs"](spark, sf_dir))
    assert p.count("Exchange hashpartitioning") == 0, p
    p = plan_of(QUERIES["hard_negative_mining"](spark, sf_dir))
    assert "WindowGroupLimit" in p and "CartesianProduct" not in p, p


def test_mlprep_final_plan_locks(spark, sf_dir):
    """Plan locks for the fusion / standardization / attribution ops."""
    # RRF: both tiers prune per-partition; fusion never goes cartesian
    p = plan_of(QUERIES["rrf_hybrid_retrieval"](spark, sf_dir))
    assert p.count("WindowGroupLimit") >= 2, p
    assert "CartesianProduct" not in p, p
    # standardize: 64-row stats broadcast back over the scan
    p = plan_of(QUERIES["embedding_standardize"](spark, sf_dir))
    assert "BroadcastHashJoin" in p, p
    # attribution: the touch pairing is an equi-join on user (+ time
    # filter), never a nested loop over purchases × clicks
    p = plan_of(QUERIES["positional_attribution_daily"](spark, sf_dir))
    assert "CartesianProduct" not in p and "BroadcastNestedLoopJoin" not in p, p
    # zipf: top-K via TakeOrderedAndProject, not a global sort
    p = plan_of(QUERIES["zipf_slope_terms"](spark, sf_dir))
    assert "TakeOrderedAndProject" in p, p


def test_graph_rewrite_plan_locks(spark, sf_dir):
    """Round-6 structural rewrites, locked: the shapes that made the graph
    cold tier ~2x cheaper must not silently regress."""
    # triangle edge-iterator: NO materialized wedge shuffle means no
    # cartesian and a single final aggregation producing both outputs
    # (no crossJoin of two single-row aggregates)
    p = plan_of(QUERIES["triangle_count_copurchase"](spark, sf_dir))
    assert "CartesianProduct" not in p, p
    assert "BroadcastNestedLoopJoin" not in p, p  # the old ne x tri crossJoin
    # two-hop: one self-join, no nested loop; both counts come out of the
    # single per-src rollup (the plan mentions n_1hop exactly once as an
    # aggregate alias, not via a second aggregation + join)
    p = plan_of(QUERIES["two_hop_reach_counts"](spark, sf_dir))
    assert "CartesianProduct" not in p, p
    assert "BroadcastNestedLoopJoin" not in p, p
    assert p.count("SortMergeJoin") + p.count("ShuffledHashJoin") + p.count(
        "BroadcastHashJoin"
    ) <= 1, p


def test_dsir_lm_joins_broadcast(spark, sf_dir):
    """DSIR's plan contract: BOTH fixed-size LM relations (the 4096-row
    ratio table and the 1-row totals) reach the corpus-sized tf relation
    via broadcast - the per-doc pass must never shuffle for a join, only
    for its own groupBy. The docstring's O(1)-LM-state claim IS this plan
    shape."""
    plan = plan_of(QUERIES["dsir_importance_weights"](spark, sf_dir))
    assert "BroadcastHashJoin" in plan  # ratio -> tf by bucket
    assert "BroadcastNestedLoopJoin" in plan  # 1-row tots -> bucket stats


def test_bpe_pairs_aggregate_over_vocab_only(spark, sf_dir):
    """BPE merge counting: the char-pair explode must consume the
    ALREADY-AGGREGATED word-frequency relation (explode above the word
    groupBy), never the raw token stream - O(vocab) pair extraction is
    the query's scale claim. Locked by requiring the word-frequency
    HashAggregate BELOW the pair Generate in the plan tree, and the final
    listing to be a TakeOrderedAndProject (top-k, never a global sort)."""
    plan = plan_of(QUERIES["bpe_merge_candidates"](spark, sf_dir))
    assert "TakeOrderedAndProject" in plan
    gen_pos = plan.index("Generate explode")
    agg_pos = plan.index("HashAggregate", gen_pos)
    assert agg_pos > gen_pos, "word-freq aggregate must feed the explode"


def test_bpe_iterated_rounds_stay_vocab_sized(spark, sf_dir):
    """Iterated BPE (3 unrolled rounds): every round's re-segmentation must
    consume the 1-ROW best-merge relation by broadcast (two inter-round
    state updates = exactly the allowed nested-loop joins of one row each),
    and the vocab aggregate must appear once per round — no stage rescans
    the corpus-token explode more than the single initial vocab build."""
    plan = plan_of(QUERIES["bpe_train_iterated"](spark, sf_dir))
    assert "CartesianProduct" not in plan
    # the 1-row best-merge broadcasts: round k's union branch re-states the
    # k-1 earlier updates (0 + 1 + 2 across the three branches, plus one
    # exchange the optimizer declines to reuse) — all of them single-row
    # builds; a corpus-sized nested loop would also trip the row histogram
    # in test_bpe_iterated_matches_python_bpe
    assert plan.count("BroadcastNestedLoopJoin") <= 4, plan
    # exactly one scan family of the documents table per UNION branch would
    # be wrong — the corpus-token explode feeds ONE word-freq aggregate;
    # each round's pair count is a vocab-sized HashAggregate above it
    assert plan.count("TakeOrderedAndProject") >= 3, plan


def test_bpe_iterated_matches_python_bpe(spark, sf_dir):
    """3-round BPE == plain-Python greedy BPE trainer (independent of both
    engines' wrapped-string representation — catches a both-sides-wrong
    merge rule)."""
    from collections import Counter

    docs = load_table(spark, sf_dir, "documents").select("text").collect()
    freq: Counter = Counter()
    for r in docs:
        if r.text is None:
            continue
        for w in r.text.split(" "):
            if w:
                freq[w] += 1
    vocab = {w: [c for c in w] for w in freq}
    want = []
    for _ in range(3):
        counts: Counter = Counter()
        for w, toks in vocab.items():
            f = freq[w]
            for i in range(len(toks) - 1):
                counts[(toks[i], toks[i + 1])] += f
        (x, y), n = min(
            counts.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1])
        )
        want.append((x, y, n))
        for w, toks in vocab.items():
            out, i = [], 0
            while i < len(toks):
                if i + 1 < len(toks) and toks[i] == x and toks[i + 1] == y:
                    out.append(x + y)
                    i += 2
                else:
                    out.append(toks[i])
                    i += 1
            vocab[w] = out
    got = sorted(
        QUERIES["bpe_train_iterated"](spark, sf_dir).collect(),
        key=lambda r: r.round,
    )
    assert [(r.lhs, r.rhs, r.n_merges) for r in got] == want
    for r in got:
        assert r.merged == r.lhs + r.rhs


def test_incremental_dedup_has_no_self_join(spark, sf_dir):
    """Incremental dedup joins PROBE vs BASE bucket relations (cross-set);
    both sides carry mutually exclusive doc_id % filters, so the plan's
    bucket join inputs must scan with complementary pushed filters - a
    missing filter would silently reintroduce the full self-join."""
    plan = plan_of(QUERIES["dedup_minhash_incremental"](spark, sf_dir))
    assert plan.count("SortMergeJoin") + plan.count("BroadcastHashJoin") >= 3
    assert "(doc_id" in plan  # the % 17 residue filters survive into scans
