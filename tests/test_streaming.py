"""Streaming semantics tests (SURVEY.md §5.3).

Replays the events table through a chunked file source (one chunk per
micro-batch, time-ordered) and asserts each streaming pipeline converges to
its batch twin's result. This exercises real watermark advancement across
micro-batches — including outer-join null emission, which a single-batch
replay can never trigger.
"""

from __future__ import annotations

import pandas as pd
import pytest

from kafka_streams_tcp_reconciliation_spark.plans import all_queries
from kafka_streams_tcp_reconciliation_spark.streaming.reconcile import (
    reconcile_join_stream,
    reconcile_unmatched_stream,
)
from kafka_streams_tcp_reconciliation_spark.streaming.source import chunked_event_stream
from kafka_streams_tcp_reconciliation_spark.streaming.windows import (
    dedup_stream,
    tumbling_window_stream,
)


@pytest.fixture(scope="module")
def event_stream(spark, sf_dir, tmp_path_factory):
    chunk_dir = str(tmp_path_factory.mktemp("event_chunks"))
    return chunked_event_stream(spark, sf_dir, chunk_dir, n_chunks=4)


def run_stream(spark, stream_df, mode: str, name: str) -> pd.DataFrame:
    q = (
        stream_df.writeStream.format("memory")
        .queryName(name)
        .outputMode(mode)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(timeout=300)
    return spark.sql(f"SELECT * FROM {name}").toPandas()


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    return df.sort_values(by=list(df.columns), na_position="first").reset_index(
        drop=True
    )


def test_tumbling_window_stream_matches_batch(spark, sf_dir, event_stream):
    """W1: complete-mode windowed agg over the replay == batch groupBy."""
    got = run_stream(
        spark, tumbling_window_stream(event_stream), "complete", "t_tumbling"
    )
    want = all_queries()["tumbling_window_hourly"](spark, sf_dir).toPandas()
    pd.testing.assert_frame_equal(canon(got), canon(want))


def test_reconcile_join_stream_matches_batch(spark, sf_dir, event_stream):
    """J1: streaming windowed inner join emits exactly the batch matches."""
    got = run_stream(
        spark, reconcile_join_stream(event_stream), "append", "t_recjoin"
    )
    want = all_queries()["reconcile_purchase_click"](spark, sf_dir).toPandas()
    pd.testing.assert_frame_equal(canon(got), canon(want))


def test_reconcile_unmatched_stream_subset_of_batch(spark, sf_dir, event_stream):
    """J2: outer-join nulls emitted as the watermark closes windows.

    Only windows fully below the final watermark can emit their nulls
    (rows near the end of the replay stay pending forever — stream never
    "ends" in watermark terms), so the streaming result must be a subset
    of the batch anti-join, and nonempty if any early window is unmatched.
    """
    got = run_stream(
        spark, reconcile_unmatched_stream(event_stream), "append", "t_recunmatched"
    )
    want = all_queries()["reconcile_unmatched_purchases"](spark, sf_dir).toPandas()
    got_ids = set(got["purchase_id"])
    want_ids = set(want["purchase_id"])
    assert got_ids <= want_ids, f"false unmatched: {got_ids - want_ids}"
    # watermark advanced across 4 chunks → early unmatched must have fired
    assert len(got_ids) > 0, "no unmatched emitted — watermark never advanced"


def test_dedup_stream_matches_batch(spark, sf_dir, event_stream):
    """O5: dropDuplicatesWithinWatermark keeps one row per key; replayed
    in event-time order it keeps the first (== batch keep-first dedup).

    Watermark wider than the data's time span → no state eviction → exact
    equality with the batch twin. (With a narrow watermark, keys re-emit
    after eviction — correct bounded-state behavior, not a bug.)"""
    got = run_stream(
        spark, dedup_stream(event_stream, watermark="720 hours"), "append", "t_dedup"
    )
    want = all_queries()["dedup_first_event_per_user_type"](spark, sf_dir).toPandas()
    assert len(got) == len(want)
    got_keys = set(zip(got["user_id"], got["event_type"]))
    want_keys = set(zip(want["user_id"], want["event_type"]))
    assert got_keys == want_keys


def test_stateful_fsm_matcher(spark, sf_dir, event_stream):
    """T2/T3: per-key FSM via applyInPandasWithState — clicks match pending
    purchases FIFO; matched output is consistent and keyed correctly."""
    from kafka_streams_tcp_reconciliation_spark.streaming.stateful import pending_match_stream

    got = run_stream(spark, pending_match_stream(event_stream), "append", "t_fsm")
    matched = got[got["kind"] == "matched"]
    assert len(matched) > 0, "no matches produced"
    # each purchase consumed at most once, each click used at most once
    assert matched["probe_id"].is_unique
    assert matched["match_id"].is_unique
    assert matched["lag_us"].notna().all()


def test_hopping_window_stream_matches_batch(spark, sf_dir, event_stream):
    """W2: complete-mode hopping windows over the replay == batch twin."""
    from kafka_streams_tcp_reconciliation_spark.streaming.windows import hopping_window_stream

    got = run_stream(
        spark, hopping_window_stream(event_stream), "complete", "t_hopping"
    )
    want = all_queries()["hopping_window_counts"](spark, sf_dir).toPandas()
    pd.testing.assert_frame_equal(canon(got), canon(want))


def test_stream_static_enrichment(spark, sf_dir, event_stream):
    """J3/J4 streaming: every replayed event is enriched with the
    broadcast customer-geo dimension; result equals the batch join."""
    from kafka_streams_tcp_reconciliation_spark.sources.tables import load_table
    from kafka_streams_tcp_reconciliation_spark.streaming.enrich import (
        customer_geo_dim,
        enrich_stream,
    )

    dim = customer_geo_dim(spark, sf_dir)
    got = run_stream(
        spark, enrich_stream(event_stream, dim), "append", "t_enrich"
    )
    ev = load_table(spark, sf_dir, "events")
    want_rows = ev.count()
    assert len(got) == want_rows
    # every user_id in events maps to a customer in the test data
    assert got["nation"].notna().all()
    assert set(got.columns) >= {"event_id", "customer_name", "nation", "region"}


def test_reconcile_full_outer_stream(spark, sf_dir, event_stream):
    """J2 full-outer: both unmatched sides emit null-padded rows at
    watermark close; matched rows equal the inner join."""
    from pyspark.sql import functions as F
    from kafka_streams_tcp_reconciliation_spark.streaming.reconcile import _sides

    left, right = _sides(event_stream, "purchase", "click", "30 minutes")
    cond = (
        (F.col("user_id") == F.col("r_user_id"))
        & (F.col("r_ts") >= F.col("l_ts") - F.expr("INTERVAL 10 minutes"))
        & (F.col("r_ts") <= F.col("l_ts") + F.expr("INTERVAL 10 minutes"))
    )
    out = left.join(right, cond, "fullOuter").select(
        "l_id", "r_id", "user_id", "r_user_id"
    )
    got = run_stream(spark, out, "append", "t_full")
    matched = got[got["l_id"].notna() & got["r_id"].notna()]
    left_nulls = got[got["r_id"].isna()]
    right_nulls = got[got["l_id"].isna()]
    want_matched = all_queries()["reconcile_purchase_click"](spark, sf_dir).count()
    assert len(matched) == want_matched
    # the replay advances the watermark, so early unmatched rows from BOTH
    # sides must have emitted
    assert len(left_nulls) > 0
    assert len(right_nulls) > 0


def test_windowed_topk_stream_converges(spark, sf_dir, event_stream, tmp_path_factory):
    """Incremental top-k: update-mode windowed agg + foreachBatch re-rank
    converges to the batch windowed_topk_users result."""
    from kafka_streams_tcp_reconciliation_spark.streaming.topk import TopKSink, windowed_topk_stream

    out = str(tmp_path_factory.mktemp("topk"))
    sink = TopKSink(out, k=3)
    q = (
        windowed_topk_stream(event_stream)
        .writeStream.foreachBatch(sink)
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(timeout=300)
    got = spark.read.parquet(f"{out}/topk").toPandas()
    want = all_queries()["windowed_topk_users"](spark, sf_dir).toPandas()
    pd.testing.assert_frame_equal(canon(got), canon(want))


def test_packed_doc_stream_converges(spark, sf_dir, tmp_path_factory):
    """Incremental sequence packing: per-shard stateful offset over an
    ordered replay produces exactly the batch pack_token_budget_bins
    result (same shards, same bins, same doc/token totals)."""
    from kafka_streams_tcp_reconciliation_spark.streaming.packing import (
        chunked_doc_stream,
        packed_doc_stream,
    )

    chunks = str(tmp_path_factory.mktemp("docchunks"))
    feed = chunked_doc_stream(spark, sf_dir, chunks, n_chunks=4)
    got_docs = run_stream(spark, packed_doc_stream(feed), "append", "t_pack")
    got = (
        got_docs.groupby(["shard", "bin"])
        .agg(n_docs=("doc_id", "count"), bin_tokens=("n_tokens", "sum"))
        .reset_index()
    )
    want = all_queries()["pack_token_budget_bins"](spark, sf_dir).toPandas()
    pd.testing.assert_frame_equal(canon(got), canon(want), check_dtype=False)


def test_decontaminate_stream_converges(spark, sf_dir, tmp_path_factory):
    """Streaming decontamination (stateless stream-static broadcast join
    on 64-bit gram hashes) over an ordered replay produces exactly the
    batch decontaminate_train_eval result when hits are aggregated."""
    from kafka_streams_tcp_reconciliation_spark.streaming.decontam import (
        chunked_text_stream,
        decontaminate_stream,
        eval_gram_set,
    )

    chunks = str(tmp_path_factory.mktemp("textchunks"))
    feed = chunked_text_stream(spark, sf_dir, chunks, n_chunks=4)
    hits = run_stream(
        spark, decontaminate_stream(feed, eval_gram_set(spark, sf_dir)),
        "append", "t_decon",
    )
    got = (
        hits.groupby("doc_id").agg(n_shared_grams=("g", "nunique")).reset_index()
    )
    want = all_queries()["decontaminate_train_eval"](spark, sf_dir).toPandas()
    pd.testing.assert_frame_equal(canon(got), canon(want), check_dtype=False)


def test_lm_score_stream_converges(spark, sf_dir, tmp_path_factory):
    """Streaming unigram-LM scoring (stateless stream-static broadcast
    join against the offline-trained vocab) over an ordered replay
    produces exactly the batch unigram_logprob_score result when the
    per-token micro-nat rows are aggregated consumer-side."""
    from kafka_streams_tcp_reconciliation_spark.streaming.decontam import (
        chunked_text_stream,
    )
    from kafka_streams_tcp_reconciliation_spark.streaming.lm_score import (
        lm_score_stream,
        vocab_logprob_table,
    )

    chunks = str(tmp_path_factory.mktemp("lmchunks"))
    feed = chunked_text_stream(spark, sf_dir, chunks, n_chunks=4)
    hits = run_stream(
        spark, lm_score_stream(feed, vocab_logprob_table(spark, sf_dir)),
        "append", "t_lmscore",
    )
    got = (
        hits.groupby("doc_id")
        .agg(n_tokens=("logp_micro", "count"), total=("logp_micro", "sum"))
        .reset_index()
    )
    got["mean_nll_micro"] = (-got["total"]) // got["n_tokens"]
    got = got.drop(columns=["total"])
    want = all_queries()["unigram_logprob_score"](spark, sf_dir).toPandas()
    pd.testing.assert_frame_equal(canon(got), canon(want), check_dtype=False)


def test_transition_stream_converges(spark, sf_dir, event_stream):
    """Incremental transition extraction: counting the emitted (from, to)
    pairs reproduces the batch transition matrix exactly, including the
    pairs that span micro-batch boundaries (carried in per-user state)."""
    from kafka_streams_tcp_reconciliation_spark.streaming.sequences import transition_stream

    got = run_stream(spark, transition_stream(event_stream), "append", "t_trans")
    got_counts = (
        got.groupby(["from_type", "to_type"], as_index=False)
        .size()
        .rename(columns={"size": "n"})
    )
    want = (
        all_queries()["event_transition_matrix"](spark, sf_dir)
        .toPandas()[["from_type", "to_type", "n"]]
    )
    got_counts["n"] = got_counts["n"].astype(want["n"].dtype)
    pd.testing.assert_frame_equal(canon(got_counts), canon(want))


def test_rolling_distinct_stream_converges(spark, sf_dir, event_stream):
    """Incremental trailing-24h distinct users: the LAST emission per hour
    bucket (counts are monotone across batches) equals the batch
    rolling-DAU query on the observed hours."""
    from kafka_streams_tcp_reconciliation_spark.streaming.sequences import (
        rolling_distinct_stream,
    )

    got = run_stream(
        spark, rolling_distinct_stream(event_stream), "append", "t_rolldau"
    )
    # monotone running counts: keep the max per bucket
    last = got.groupby("target_hb", as_index=False)["active_users"].max()
    want = all_queries()["rolling_active_users_24h"](spark, sf_dir).toPandas()
    # map batch window_start strings back to hour buckets for the compare
    epoch = pd.Timestamp("2024-01-01 00:00:00")
    want["target_hb"] = (
        (pd.to_datetime(want["window_start"]) - epoch) / pd.Timedelta(hours=1)
    ).astype("int64")
    merged = want.merge(last, on="target_hb", how="left", suffixes=("_b", "_s"))
    assert (merged["active_users_b"] == merged["active_users_s"]).all(), (
        merged[merged["active_users_b"] != merged["active_users_s"]].head()
    )


def test_asof_enrich_stream_matches_batch(spark, sf_dir, event_stream):
    """J9 incremental: the O(1)-state as-of carry emits exactly the batch
    as-of join's rows, including enrichments whose click arrived in an
    earlier micro-batch than the purchase."""
    from kafka_streams_tcp_reconciliation_spark.streaming.asof import asof_enrich_stream

    got = run_stream(spark, asof_enrich_stream(event_stream), "append", "t_asof")
    want = all_queries()["asof_last_click_before_purchase"](spark, sf_dir).toPandas()
    pd.testing.assert_frame_equal(canon(got), canon(want))


def test_scd2_stream_emits_closed_intervals(spark, sf_dir, event_stream):
    """Incremental SCD2: the emitted (closed) validity intervals equal the
    batch SCD2 rows with a non-null valid_to; the still-open rows stay in
    state."""
    from kafka_streams_tcp_reconciliation_spark.streaming.sequences import scd2_stream

    got = run_stream(spark, scd2_stream(event_stream), "append", "t_scd2")
    want = all_queries()["scd2_purchase_value_history"](spark, sf_dir).toPandas()
    want = want[want["valid_to"].notna()].drop(columns=["is_current"])
    pd.testing.assert_frame_equal(canon(got), canon(want))


def test_chained_hourly_daily_stream_converges(spark, sf_dir, event_stream):
    """Chained windowed aggregations (hourly → daily in ONE streaming
    query): every day that closes under the final watermark emits exactly
    the batch daily rollup; the still-open tail day stays in state."""
    from pyspark.sql import functions as F

    from kafka_streams_tcp_reconciliation_spark.sources.tables import load_table
    from kafka_streams_tcp_reconciliation_spark.streaming.windows import (
        chained_hourly_daily_stream,
    )

    got = run_stream(
        spark, chained_hourly_daily_stream(event_stream), "append", "t_chain"
    )
    ev = load_table(spark, sf_dir, "events")
    # batch daily rollup computed the same two-level way (sum of rounded
    # hourly sums, matching the stream's intermediate rounding)
    hourly = ev.groupBy(
        F.window("ts", "1 hour").alias("w"), "event_type"
    ).agg(
        F.count(F.lit(1)).alias("n_events"),
        F.round(F.sum("value"), 2).alias("total_value"),
    )
    want_all = (
        hourly.groupBy(
            F.date_format(F.date_trunc("day", F.col("w.start")), "yyyy-MM-dd").alias(
                "day"
            ),
            "event_type",
        )
        .agg(
            F.sum("n_events").alias("n_events"),
            F.round(F.sum("total_value"), 2).alias("total_value"),
        )
        .toPandas()
    )
    emitted_days = set(got["day"])
    assert emitted_days, "no day closed under the watermark — replay broken"
    want = want_all[want_all["day"].isin(emitted_days)]
    pd.testing.assert_frame_equal(canon(got), canon(want))
    # the final (open) day must NOT have emitted
    assert want_all["day"].max() not in emitted_days


def test_funnel_attribution_stream_matches_batch(spark, sf_dir, event_stream):
    """Last-touch funnel FSM (view→click→purchase with snapshot-at-click
    state) emits exactly the batch two-stage as-of attribution."""
    from kafka_streams_tcp_reconciliation_spark.streaming.sequences import (
        funnel_attribution_stream,
    )

    got = run_stream(
        spark, funnel_attribution_stream(event_stream), "append", "t_funnel"
    )
    want = all_queries()["funnel_attribution_windowed"](spark, sf_dir).toPandas()
    pd.testing.assert_frame_equal(canon(got), canon(want))


def test_rolling_dau_hll_stream_accuracy(spark, sf_dir, event_stream):
    """The HLL hopping-window DAU (constant state) lands within 5% of the
    exact batch rolling-DAU on every fully-observed window."""
    from kafka_streams_tcp_reconciliation_spark.streaming.sequences import (
        rolling_dau_hll_stream,
    )

    got = run_stream(
        spark, rolling_dau_hll_stream(event_stream), "update", "t_dauhll"
    )
    # update mode re-emits refinements — keep the max (counts only grow)
    last = got.groupby("window_end", as_index=False)["approx_users"].max()
    want = all_queries()["rolling_active_users_24h"](spark, sf_dir).toPandas()
    # batch rows are window STARTS of trailing windows = hopping window END
    # minus 1h; align on the trailing-window anchor hour
    epoch = pd.Timestamp("2024-01-01")
    want["anchor"] = pd.to_datetime(want["window_start"])
    last["anchor"] = pd.to_datetime(last["window_end"]) - pd.Timedelta(hours=1)
    merged = want.merge(last, on="anchor")
    assert len(merged) > 100
    rel = (merged["approx_users"] - merged["active_users"]).abs() / merged[
        "active_users"
    ]
    assert (rel < 0.05).all(), merged[rel >= 0.05].head()


def test_keyless_range_join_stream_matches_batch(spark, sf_dir, event_stream):
    """Streaming keyless bucketed range join converges to the batch pair
    set: every (purchase, other-user event within ±5 min) pair, exactly
    once, across micro-batch boundaries."""
    from kafka_streams_tcp_reconciliation_spark.operators.joins import (
        bucketed_range_join,
    )
    from kafka_streams_tcp_reconciliation_spark.sources.tables import load_table
    from kafka_streams_tcp_reconciliation_spark.streaming.range_join import (
        coactivity_pairs_stream,
    )
    from pyspark.sql import functions as F

    got = run_stream(
        spark,
        coactivity_pairs_stream(event_stream),
        "append",
        "t_range_join",
    )
    ev = load_table(spark, sf_dir, "events")
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("p_id"),
        F.col("ts").alias("p_ts"),
        F.col("user_id").alias("p_user"),
    )
    others = ev.select(
        F.col("event_id").alias("o_id"),
        F.col("ts").alias("o_ts"),
        F.col("user_id").alias("o_user"),
    )
    want = (
        bucketed_range_join(purchases, others, "p_ts", "o_ts", 300)
        .filter(F.col("o_user") != F.col("p_user"))
        .select("p_id", "o_id")
        .toPandas()
    )
    got_pairs = sorted(map(tuple, got[["p_id", "o_id"]].values.tolist()))
    want_pairs = sorted(map(tuple, want.values.tolist()))
    assert got_pairs == want_pairs


def test_cms_cells_stream_converges_to_batch_sketch(spark, sf_dir, event_stream):
    """The incrementally maintained CMS cell table equals the batch sketch
    over the same token stream bit-for-bit after full replay (complete
    mode) — a sketch whose state is the aggregate itself."""
    from kafka_streams_tcp_reconciliation_spark.sources.tables import load_table
    from kafka_streams_tcp_reconciliation_spark.streaming.sketch import (
        cms_cells_stream,
    )

    got = run_stream(
        spark,
        cms_cells_stream(event_stream, text_col="props"),
        "complete",
        "t_cms_cells",
    )
    ev = load_table(spark, sf_dir, "events")
    # the builder is pure DataFrame algebra — the same function computes
    # the batch reference
    want = cms_cells_stream(ev, "props").toPandas()
    got_set = {tuple(r) for r in got[["k", "bucket", "cell_n"]].values.tolist()}
    want_set = {tuple(r) for r in want[["k", "bucket", "cell_n"]].values.tolist()}
    assert got_set == want_set


def test_dsir_lm_stream_converges(spark, sf_dir, tmp_path_factory):
    """Streaming DSIR LM maintenance (update-mode 4096-bucket aggregate —
    O(1) state like the CMS cells): after a full replay the LM table
    equals the batch ``dsir_bucket_stats`` bit-for-bit, and scoring the
    corpus against the streamed LM reproduces the batch
    ``dsir_importance_weights`` exactly (integer micro-nats, no
    tolerance)."""
    from kafka_streams_tcp_reconciliation_spark.plans.pipeline import (
        dsir_bucket_stats,
        dsir_tf,
    )
    from kafka_streams_tcp_reconciliation_spark.sources.tables import load_table
    from kafka_streams_tcp_reconciliation_spark.streaming.dsir import (
        chunked_lang_text_stream,
        dsir_lm_stream,
        dsir_score_against,
    )

    chunks = str(tmp_path_factory.mktemp("dsirchunks"))
    feed = chunked_lang_text_stream(spark, sf_dir, chunks, n_chunks=4)
    got_lm = run_stream(spark, dsir_lm_stream(feed), "complete", "t_dsir_lm")

    docs = load_table(spark, sf_dir, "documents")
    want_lm = dsir_bucket_stats(
        dsir_tf(docs.filter(docs.text.isNotNull()))
    ).toPandas()
    got_set = {tuple(r) for r in got_lm[["bucket", "cnt_c", "cnt_t"]].values.tolist()}
    want_set = {tuple(r) for r in want_lm[["bucket", "cnt_c", "cnt_t"]].values.tolist()}
    assert got_set == want_set

    lm_df = spark.createDataFrame(
        got_lm[["bucket", "cnt_c", "cnt_t"]],
        "bucket long, cnt_c long, cnt_t long",
    )
    got_w = dsir_score_against(docs, lm_df).toPandas()
    want_w = all_queries()["dsir_importance_weights"](spark, sf_dir).toPandas()
    pd.testing.assert_frame_equal(canon(got_w), canon(want_w))


def test_unimax_counts_stream_converges(spark, sf_dir, tmp_path_factory):
    """Streaming UniMax count maintenance (update-mode O(#languages)
    aggregate): after a full replay the count table equals the batch
    ``lang_token_counts`` bit-for-bit, and water-filling the snapshot
    reproduces the batch ``unimax_language_budgets`` exactly (integer
    micro-tokens, no tolerance)."""
    from kafka_streams_tcp_reconciliation_spark.plans.selection import lang_token_counts
    from kafka_streams_tcp_reconciliation_spark.sources.tables import load_table
    from kafka_streams_tcp_reconciliation_spark.streaming.dsir import (
        chunked_lang_text_stream,
    )
    from kafka_streams_tcp_reconciliation_spark.streaming.selection import (
        lang_token_stream,
        unimax_budgets_against,
    )

    chunks = str(tmp_path_factory.mktemp("unimaxchunks"))
    feed = chunked_lang_text_stream(spark, sf_dir, chunks, n_chunks=4)
    got_counts = run_stream(
        spark, lang_token_stream(feed), "complete", "t_unimax_counts"
    )

    docs = load_table(spark, sf_dir, "documents")
    want_counts = lang_token_counts(docs.filter(docs.text.isNotNull())).toPandas()
    got_set = {tuple(r) for r in got_counts[["lang", "c_tokens"]].values.tolist()}
    want_set = {tuple(r) for r in want_counts[["lang", "c_tokens"]].values.tolist()}
    assert got_set == want_set

    snap = spark.createDataFrame(
        got_counts[["lang", "c_tokens"]], "lang string, c_tokens long"
    )
    got_b = unimax_budgets_against(snap).toPandas()
    want_b = all_queries()["unimax_language_budgets"](spark, sf_dir).toPandas()
    pd.testing.assert_frame_equal(canon(got_b), canon(want_b))


def test_unimax_streamed_snapshot_end_to_end(spark, sf_dir, tmp_path_factory):
    """Round-11 end-to-end lock: documents replayed through the count
    stream → parquet snapshot SINK → snapshot read back from disk →
    water-filled — one pipeline, asserting the realized budgets equal the
    batch ``unimax_language_budgets`` bit-for-bit (the prior convergence
    test compared count tables in memory; this drives the actual handoff
    surface a production planner would read)."""
    from kafka_streams_tcp_reconciliation_spark.streaming.dsir import (
        chunked_lang_text_stream,
    )
    from kafka_streams_tcp_reconciliation_spark.streaming.selection import (
        counts_snapshot_sink,
        lang_token_stream,
        read_counts_snapshot,
        unimax_budgets_against,
    )

    chunks = str(tmp_path_factory.mktemp("unimaxe2echunks"))
    snap_root = tmp_path_factory.mktemp("unimaxsnap") / "counts"
    snap_root.mkdir()
    snap_dir = str(snap_root)
    ckpt = str(tmp_path_factory.mktemp("unimaxckpt"))
    feed = chunked_lang_text_stream(spark, sf_dir, chunks, n_chunks=4)
    q = counts_snapshot_sink(lang_token_stream(feed), snap_dir, ckpt)
    q.awaitTermination(timeout=300)

    # the sink writes generation subdirs + an atomically-replaced _LATEST
    # pointer; readers resolve through the pointer, never a raw overwrite
    import os

    assert os.path.exists(os.path.join(snap_dir, "_LATEST"))
    snap = read_counts_snapshot(spark, snap_dir).select("lang", "c_tokens")
    got = unimax_budgets_against(snap).toPandas()
    want = all_queries()["unimax_language_budgets"](spark, sf_dir).toPandas()
    pd.testing.assert_frame_equal(canon(got), canon(want))


def test_growth_stream_converges(spark, sf_dir, event_stream):
    """Incremental growth accounting: rolling the emitted (day, status)
    rows up reproduces the batch new/retained/resurrected decomposition,
    including classifications that span micro-batch boundaries."""
    from kafka_streams_tcp_reconciliation_spark.streaming.sequences import growth_stream

    got = run_stream(spark, growth_stream(event_stream), "append", "t_growth")
    counts = (
        got.groupby(["day", "status"]).size().unstack(fill_value=0)
    )
    for col in ("new", "retained", "resurrected"):
        if col not in counts:
            counts[col] = 0
    counts = counts.reset_index().rename(
        columns={"new": "n_new", "retained": "n_retained",
                 "resurrected": "n_resurrected"}
    )
    counts["n_active"] = (
        counts["n_new"] + counts["n_retained"] + counts["n_resurrected"]
    )
    counts = counts[["day", "n_new", "n_retained", "n_resurrected", "n_active"]]
    counts.columns.name = None
    want = all_queries()["growth_accounting_daily"](spark, sf_dir).toPandas()
    for c in ("n_new", "n_retained", "n_resurrected", "n_active"):
        counts[c] = counts[c].astype(want[c].dtype)
    pd.testing.assert_frame_equal(canon(counts), canon(want))


def test_nearest_enrich_stream_matches_batch(spark, sf_dir, event_stream):
    """J9 bidirectional: the pending-purchase FSM resolves each purchase at
    its user's next click, or at the T3 event-time timer (purchase_ts +
    tolerance) for users who never click again. Every emitted row must be
    bit-equal to the batch nearest_event_join row for that purchase; every
    purchase with an in-replay decision point (a later click) must be
    emitted; and the timer path must actually fire (click-less purchases
    whose horizon the watermark passed are flushed, not held forever)."""
    from kafka_streams_tcp_reconciliation_spark.sources.tables import load_table
    from kafka_streams_tcp_reconciliation_spark.streaming.nearest import (
        nearest_enrich_stream,
    )

    got = run_stream(
        spark, nearest_enrich_stream(event_stream), "append", "t_nearest"
    )
    want = all_queries()["nearest_event_join"](spark, sf_dir).toPandas()
    ev = load_table(spark, sf_dir, "events").toPandas()
    clicks = ev[ev["event_type"] == "click"][["user_id", "ts"]]
    purchases = ev[ev["event_type"] == "purchase"][["event_id", "user_id", "ts"]]
    last_click = clicks.groupby("user_id")["ts"].max().rename("last_click_ts")
    decided = purchases.join(last_click, on="user_id")
    decided = set(
        decided[decided["last_click_ts"] > decided["ts"]]["event_id"]
    )
    emitted = set(got["purchase_id"])
    # each purchase resolves exactly once (click OR timer, never both)
    assert len(emitted) == len(got)
    # completeness: every click-decided purchase emitted; timer path fired
    assert decided <= emitted
    timer_flushed = emitted - decided
    assert timer_flushed, "event-time timer never flushed a pending purchase"
    # state DRAIN: at end of replay the watermark sits at max event ts, so
    # every purchase whose decision horizon (ts + tolerance) that watermark
    # passed must have been flushed — exactly; pending state may hold ONLY
    # the purchases whose horizon is still open. This is the bounded-state
    # guarantee: no click-less user pins rows forever.
    tol = pd.Timedelta(microseconds=600 * 1_000_000)
    # the FSM's withWatermark sits AFTER the click/purchase filter, so the
    # stream's final watermark tracks max(click/purchase ts), not the global
    # max event ts (a later view does not advance it). 2 ms slack absorbs
    # the ms-floored watermark + the strictly-greater timer contract (same
    # rationale as the sliding-window test).
    wm = ev[ev["event_type"].isin(["click", "purchase"])]["ts"].max()
    slack = pd.Timedelta(milliseconds=2)
    must_flush = set(
        purchases[purchases["ts"] + tol <= wm - slack]["event_id"]
    )
    may_flush = set(
        purchases[purchases["ts"] + tol <= wm + slack]["event_id"]
    )
    assert decided | must_flush <= emitted, (
        "pending state failed to drain:"
        f" {len((decided | must_flush) - emitted)} expired purchases held"
    )
    assert emitted <= decided | may_flush, (
        "FSM emitted purchases whose horizon the watermark never passed:"
        f" {sorted(emitted - (decided | may_flush))[:5]}"
    )
    # correctness: whatever was emitted equals the batch row exactly
    want = want[want["purchase_id"].isin(emitted)]
    assert len(want) == len(got)
    pd.testing.assert_frame_equal(canon(got), canon(want))


def test_bitmap_words_stream_converges_to_batch(spark, sf_dir, event_stream):
    """The incrementally maintained user-bitmap word table equals the
    batch bitmap bit-for-bit after full replay (OR is order-insensitive),
    and its popcount rollup reproduces bitmap_distinct_users_by_type."""
    from kafka_streams_tcp_reconciliation_spark.sources.tables import load_table
    from kafka_streams_tcp_reconciliation_spark.streaming.bitmap import (
        bitmap_words_stream,
    )

    got = run_stream(
        spark, bitmap_words_stream(event_stream), "complete", "t_bitmap"
    )
    ev = load_table(spark, sf_dir, "events")
    want = bitmap_words_stream(ev).toPandas()
    got_set = {tuple(r) for r in got[["event_type", "w", "bits"]].values.tolist()}
    want_set = {tuple(r) for r in want[["event_type", "w", "bits"]].values.tolist()}
    assert got_set == want_set
    # popcount rollup == the registered batch query
    counts = (
        got.assign(pc=got["bits"].map(lambda b: bin(b & (2**64 - 1)).count("1")))
        .groupby("event_type", as_index=False)["pc"]
        .sum()
    )
    batch = all_queries()["bitmap_distinct_users_by_type"](spark, sf_dir).toPandas()
    merged = batch.merge(counts, on="event_type")
    assert (merged["n_users"] == merged["pc"]).all(), merged


def test_attribution_stream_converges_to_batch(spark, sf_dir, event_stream):
    """Streaming U-shaped attribution: purchases resolve instantly from
    the trailing click buffer, so the full replay's per-(day, position)
    credit rollup equals the batch operator exactly."""
    from kafka_streams_tcp_reconciliation_spark.streaming.attribution import (
        attribution_stream,
    )

    got = run_stream(
        spark, attribution_stream(event_stream), "append", "t_attrib"
    )
    rolled = (
        got.groupby(["day", "position_class"], as_index=False)
        .agg(n_touches=("click_id", "size"), credit_ppm=("credit_ppm", "sum"))
    )
    want = all_queries()["positional_attribution_daily"](spark, sf_dir).toPandas()
    pd.testing.assert_frame_equal(canon(rolled), canon(want))


def test_sliding_window_stream_matches_batch(spark, sf_dir, event_stream):
    """W2 SlidingWindows twin: per-event trailing (count, exact sum),
    finalized at the watermark frontier so RANGE peer groups are complete
    even when equal-timestamp events split across micro-batches. Every
    event the final watermark strictly passed must be emitted with its
    exact batch row; events at/after the final watermark are legitimately
    still pending (the append-mode finalization contract)."""
    from kafka_streams_tcp_reconciliation_spark.sources.tables import load_table
    from kafka_streams_tcp_reconciliation_spark.streaming.sliding import (
        sliding_window_stream,
    )
    from pyspark.sql import functions as F

    got = run_stream(
        spark,
        sliding_window_stream(event_stream.filter(F.col("user_id") % 20 == 0)),
        "append",
        "t_sliding",
    )
    want = all_queries()["sliding_window_event_counts"](
        spark, sf_dir
    ).toPandas()
    assert len(want) > 0
    ev = (
        load_table(spark, sf_dir, "events")
        .filter(F.col("user_id") % 20 == 0)
        .select("event_id", "ts")
        .toPandas()
    )
    # final watermark == max event ts of the filtered stream (0s delay);
    # everything more than 2 ms below it must have been finalized (2 ms
    # absorbs the ms-resolution watermark floor + the strictly-greater
    # timer contract)
    max_ts = ev["ts"].max()
    must_emit = set(
        ev[ev["ts"] < max_ts - pd.Timedelta(milliseconds=2)]["event_id"]
    )
    emitted = set(got["event_id"])
    assert len(emitted) == len(got), "an event emitted twice"
    missing = must_emit - emitted
    assert not missing, f"{len(missing)} finalized events never emitted"
    # correctness: every emitted row equals its batch RANGE-frame row
    want = want[want["event_id"].isin(emitted)]
    assert len(want) == len(got)
    for c in ("n_30m",):
        got[c] = got[c].astype(want[c].dtype)
    pd.testing.assert_frame_equal(canon(got), canon(want))


def test_sliding_window_stream_cross_batch_peers(spark, tmp_path):
    """Regression for the frontier-buffering fix: equal-timestamp RANGE
    peers split across two micro-batches must still share one complete
    frame. Two peers at t=1000s land in different chunks; both rows must
    report n_30m=3 (both peers + the earlier in-horizon event) — the
    pre-fix FSM emitted the first peer with n_30m=2 on batch-1 arrival."""
    from kafka_streams_tcp_reconciliation_spark.streaming.sliding import (
        sliding_window_stream,
    )
    from kafka_streams_tcp_reconciliation_spark.streaming.source import (
        event_stream_from_dir,
    )

    base = pd.Timestamp("2024-01-01")
    sec = pd.Timedelta(seconds=1)
    chunk1 = pd.DataFrame(
        {
            "event_id": [1, 2],
            "user_id": [7, 7],
            "event_type": ["view", "view"],
            "ts": [base + 100 * sec, base + 1000 * sec],
            "value": [1.0, 2.0],
        }
    )
    chunk2 = pd.DataFrame(
        {
            # the peer: same ts as event 2, later micro-batch
            "event_id": [3, 4],
            "user_id": [7, 7],
            "event_type": ["view", "view"],
            "ts": [base + 1000 * sec, base + 5000 * sec],
            "value": [4.0, 8.0],
        }
    )
    chunk_dir = str(tmp_path / "peer_chunks")
    for i, pdf in enumerate((chunk1, chunk2)):
        sdf = spark.createDataFrame(pdf)
        sdf.coalesce(1).write.mode("overwrite").parquet(
            f"{chunk_dir}/chunk_{i:02d}"
        )
    stream = event_stream_from_dir(spark, f"{chunk_dir}/chunk_*")
    got = run_stream(
        spark, sliding_window_stream(stream), "append", "t_sliding_peers"
    )
    rows = {int(r.event_id): r for r in got.itertuples(index=False)}
    # event 4 (the final watermark) is legitimately still pending
    assert set(rows) == {1, 2, 3}
    assert rows[1].n_30m == 1 and rows[1].sum_value_30m == 1.0
    # BOTH peers see the full 3-event frame (1 is 900s back, in horizon)
    assert rows[2].n_30m == 3 and rows[2].sum_value_30m == 7.0
    assert rows[3].n_30m == 3 and rows[3].sum_value_30m == 7.0


def test_reservoir_sample_stream_converges_to_batch(spark, sf_dir, event_stream):
    """Keep-K changelog: applying adds and evicts across the replay yields
    exactly the batch hash-rank sample per user — bit-equal membership,
    not statistical equivalence — including evictions spanning
    micro-batch boundaries."""
    from kafka_streams_tcp_reconciliation_spark.streaming.reservoir import (
        reservoir_sample_stream,
    )

    got = run_stream(
        spark, reservoir_sample_stream(event_stream), "append", "t_reservoir"
    )
    assert (got["op"] == "evict").any(), "no evictions — changelog untested"
    adds = set(
        zip(got[got["op"] == "add"]["user_id"], got[got["op"] == "add"]["event_id"])
    )
    evicts = set(
        zip(
            got[got["op"] == "evict"]["user_id"],
            got[got["op"] == "evict"]["event_id"],
        )
    )
    assert evicts <= adds, "evicted something never added"
    membership = adds - evicts
    want = all_queries()["reservoir_sample_per_user"](spark, sf_dir).toPandas()
    want_set = set(zip(want["user_id"], want["event_id"]))
    assert membership == want_set


# --- adversarial replay fuzzer (round-5, VERDICT r04 task 6) ----------------
#
# The round-4 sliding-FSM bug came from a cross-batch equal-timestamp split
# the ntile-chunked replay never generated. This matrix replays each FSM
# twin under randomized chunkings that stay INSIDE the delivery contract the
# FSM documents (rows arrive in the FSM's canonical (ts[, side], event_id)
# order across batches; any order within a batch — the FSM re-sorts) but are
# adversarial everywhere else:
#   - random batch boundaries, including cuts INSIDE equal-timestamp runs;
#   - injected duplicate timestamps (~8% of rows copy the previous row's ts,
#     creating multi-row equal-ts runs that straddle boundaries);
#   - idle keys: a random user subsample whose early-finishing users sit
#     idle across many later batches (their timers/evictions must still fire);
#   - shuffled rows within each chunk (intra-batch disorder is legal).
# Each case asserts convergence to the batch twin computed on the SAME
# fuzzed table, using the identical contract as the dedicated test above.

import os
import zlib

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

_FUZZ_SEEDS = 6  # x {clean, redelivery} x 7 FSMs = 84 distinct fuzz cases


def _fuzz_replay(
    spark, sf_dir, tmp_path, seed: int, side_order: bool, redeliver: bool = False
):
    """Build one fuzzed replay; returns (stream_df, batch_dir).

    With ``redeliver=True``, at-least-once delivery is simulated on top of
    the adversarial chunking: ~5% of each chunk's rows are redelivered as
    EXACT copies inside the same chunk, and a few rows from EARLIER chunks
    are redelivered into each later chunk (arbitrary-lag redelivery). The
    batch table never contains the duplicates — a correct consumer must
    absorb them (see the dedup front in the fuzz test)."""
    from kafka_streams_tcp_reconciliation_spark.streaming.source import (
        event_stream_from_dir,
    )
    import os

    rng = np.random.default_rng(seed)
    ev = pq.read_table(f"{sf_dir}/events.parquet").to_pandas()
    users = np.sort(ev["user_id"].unique())
    # keep ~1/3 of users, always including some user_id % 20 == 0 (the
    # sliding query's checked subset must be nonempty)
    keep = set(rng.choice(users, size=max(8, len(users) // 3), replace=False))
    keep |= set(u for u in users if u % 20 == 0 and rng.random() < 0.5)
    sub = ev[ev["user_id"].isin(keep)].copy()
    order = ["ts", "event_id"]
    if side_order:  # clicks sort before purchases at equal ts
        sub["__side"] = (sub["event_type"] == "purchase").astype(int)
        order = ["ts", "__side", "event_id"]
    sub = sub.sort_values(order).reset_index(drop=True)
    # duplicate-timestamp injection: ~8% of rows copy the previous row's ts
    ts = sub["ts"].to_numpy().copy()
    for i in np.flatnonzero(rng.random(len(sub)) < 0.08):
        if i > 0:
            ts[i] = ts[i - 1]
    sub["ts"] = ts
    sub = sub.sort_values(order).reset_index(drop=True)
    sub = sub.drop(columns=["__side"], errors="ignore")
    cols = ["event_id", "ts", "user_id", "event_type", "value", "props"]
    sub = sub[cols]
    batch_dir = tmp_path / "batch"
    batch_dir.mkdir()
    pq.write_table(
        pa.Table.from_pandas(sub, preserve_index=False),
        str(batch_dir / "events.parquet"),
    )
    # random chunk boundaries — cuts may land inside equal-ts runs
    n_chunks = int(rng.integers(3, 8))
    cuts = np.sort(
        rng.choice(np.arange(1, len(sub)), size=n_chunks - 1, replace=False)
    )
    bounds = [0, *cuts.tolist(), len(sub)]
    chunk_dir = tmp_path / "chunks"
    chunk_dir.mkdir()
    for i in range(n_chunks):
        part = sub.iloc[bounds[i] : bounds[i + 1]]
        if redeliver and len(part):
            extras = []
            # same-batch redelivery: ~5% of this chunk's rows, exact copies
            k = max(1, int(0.05 * len(part)))
            extras.append(
                part.sample(n=k, random_state=int(rng.integers(0, 2**31)))
            )
            # cross-batch redelivery: rows from ANY earlier chunk arrive
            # again in this one (arbitrary redelivery lag)
            earlier = sub.iloc[: bounds[i]]
            if len(earlier):
                extras.append(
                    earlier.sample(
                        n=min(3, len(earlier)),
                        random_state=int(rng.integers(0, 2**31)),
                    )
                )
            part = pd.concat([part, *extras], ignore_index=True)
        part = part.sample(frac=1.0, random_state=int(rng.integers(0, 2**31)))
        p = str(chunk_dir / f"chunk_{i:02d}.parquet")
        pq.write_table(pa.Table.from_pandas(part, preserve_index=False), p)
        # file source replays oldest-mtime-first: force strictly increasing
        os.utime(p, (1_600_000_000 + i * 10, 1_600_000_000 + i * 10))
    stream = event_stream_from_dir(spark, str(chunk_dir / "chunk_*"))
    return stream, str(batch_dir)


def _check_sliding(spark, stream, batch_dir, got):
    from kafka_streams_tcp_reconciliation_spark.sources.tables import load_table
    from pyspark.sql import functions as F

    want = all_queries()["sliding_window_event_counts"](spark, batch_dir).toPandas()
    ev = (
        load_table(spark, batch_dir, "events")
        .filter(F.col("user_id") % 20 == 0)
        .select("event_id", "ts")
        .toPandas()
    )
    max_ts = ev["ts"].max()
    must_emit = set(
        ev[ev["ts"] < max_ts - pd.Timedelta(milliseconds=2)]["event_id"]
    )
    emitted = set(got["event_id"])
    assert len(emitted) == len(got), "an event emitted twice"
    assert must_emit <= emitted, f"{len(must_emit - emitted)} never emitted"
    want = want[want["event_id"].isin(emitted)]
    assert len(want) == len(got)
    got = got.copy()
    got["n_30m"] = got["n_30m"].astype(want["n_30m"].dtype)
    pd.testing.assert_frame_equal(canon(got), canon(want))


def _check_nearest(spark, stream, batch_dir, got):
    from kafka_streams_tcp_reconciliation_spark.sources.tables import load_table

    want = all_queries()["nearest_event_join"](spark, batch_dir).toPandas()
    ev = load_table(spark, batch_dir, "events").toPandas()
    purchases = ev[ev["event_type"] == "purchase"][["event_id", "user_id", "ts"]]
    clicks = ev[ev["event_type"] == "click"][["user_id", "ts"]]
    last_click = clicks.groupby("user_id")["ts"].max().rename("last_click_ts")
    decided = purchases.join(last_click, on="user_id")
    decided = set(decided[decided["last_click_ts"] > decided["ts"]]["event_id"])
    emitted = set(got["purchase_id"])
    assert len(emitted) == len(got)
    assert decided <= emitted
    tol = pd.Timedelta(microseconds=600 * 1_000_000)
    wm = ev[ev["event_type"].isin(["click", "purchase"])]["ts"].max()
    slack = pd.Timedelta(milliseconds=2)
    must = set(purchases[purchases["ts"] + tol <= wm - slack]["event_id"])
    may = set(purchases[purchases["ts"] + tol <= wm + slack]["event_id"])
    assert decided | must <= emitted
    assert emitted <= decided | may
    want = want[want["purchase_id"].isin(emitted)]
    assert len(want) == len(got)
    pd.testing.assert_frame_equal(canon(got), canon(want))


def _check_asof(spark, stream, batch_dir, got):
    want = all_queries()["asof_last_click_before_purchase"](
        spark, batch_dir
    ).toPandas()
    pd.testing.assert_frame_equal(canon(got), canon(want))


def _check_transitions(spark, stream, batch_dir, got):
    got_counts = (
        got.groupby(["from_type", "to_type"], as_index=False)
        .size()
        .rename(columns={"size": "n"})
    )
    want = all_queries()["event_transition_matrix"](spark, batch_dir).toPandas()[
        ["from_type", "to_type", "n"]
    ]
    got_counts["n"] = got_counts["n"].astype(want["n"].dtype)
    pd.testing.assert_frame_equal(canon(got_counts), canon(want))


def _check_scd2(spark, stream, batch_dir, got):
    want = all_queries()["scd2_purchase_value_history"](spark, batch_dir).toPandas()
    want = want[want["valid_to"].notna()].drop(columns=["is_current"])
    pd.testing.assert_frame_equal(canon(got), canon(want))


def _check_attribution(spark, stream, batch_dir, got):
    rolled = got.groupby(["day", "position_class"], as_index=False).agg(
        n_touches=("click_id", "size"), credit_ppm=("credit_ppm", "sum")
    )
    want = all_queries()["positional_attribution_daily"](spark, batch_dir).toPandas()
    for c in ("n_touches", "credit_ppm"):
        rolled[c] = rolled[c].astype(want[c].dtype)
    pd.testing.assert_frame_equal(canon(rolled), canon(want))


def _check_reservoir(spark, stream, batch_dir, got):
    adds = set(
        zip(got[got["op"] == "add"]["user_id"], got[got["op"] == "add"]["event_id"])
    )
    evicts = set(
        zip(
            got[got["op"] == "evict"]["user_id"],
            got[got["op"] == "evict"]["event_id"],
        )
    )
    assert evicts <= adds
    want = all_queries()["reservoir_sample_per_user"](spark, batch_dir).toPandas()
    assert adds - evicts == set(zip(want["user_id"], want["event_id"]))


def _fuzz_build_sliding(stream):
    from kafka_streams_tcp_reconciliation_spark.streaming.sliding import (
        sliding_window_stream,
    )
    from pyspark.sql import functions as F

    return sliding_window_stream(stream.filter(F.col("user_id") % 20 == 0))


def _fuzz_build_nearest(stream):
    from kafka_streams_tcp_reconciliation_spark.streaming.nearest import (
        nearest_enrich_stream,
    )

    return nearest_enrich_stream(stream)


def _fuzz_build_asof(stream):
    from kafka_streams_tcp_reconciliation_spark.streaming.asof import (
        asof_enrich_stream,
    )

    return asof_enrich_stream(stream)


def _fuzz_build_transitions(stream):
    from kafka_streams_tcp_reconciliation_spark.streaming.sequences import (
        transition_stream,
    )

    return transition_stream(stream)


def _fuzz_build_scd2(stream):
    from kafka_streams_tcp_reconciliation_spark.streaming.sequences import scd2_stream

    return scd2_stream(stream)


def _fuzz_build_attribution(stream):
    from kafka_streams_tcp_reconciliation_spark.streaming.attribution import (
        attribution_stream,
    )

    return attribution_stream(stream)


def _fuzz_build_reservoir(stream):
    from kafka_streams_tcp_reconciliation_spark.streaming.reservoir import (
        reservoir_sample_stream,
    )

    return reservoir_sample_stream(stream)


# (name, build, check, side_order): side_order=True for FSMs whose canonical
# cross-batch delivery order puts clicks before purchases at equal ts
_FUZZ_MATRIX = [
    ("sliding", _fuzz_build_sliding, _check_sliding, False),
    ("nearest", _fuzz_build_nearest, _check_nearest, True),
    ("asof", _fuzz_build_asof, _check_asof, True),
    ("transitions", _fuzz_build_transitions, _check_transitions, False),
    ("scd2", _fuzz_build_scd2, _check_scd2, False),
    ("attribution", _fuzz_build_attribution, _check_attribution, True),
    ("reservoir", _fuzz_build_reservoir, _check_reservoir, False),
]


def _fuzz_seed(name: str, seed: int) -> int:
    # crc32, not hash(): Python string hashing is salted per process, which
    # would make a failing fuzz case irreproducible on re-run
    return zlib.crc32(f"{name}:{seed}".encode()) & 0x7FFFFFFF


@pytest.mark.parametrize("redeliver", [False, True], ids=["clean", "redeliver"])
@pytest.mark.parametrize("seed", range(_FUZZ_SEEDS))
@pytest.mark.parametrize(
    "name,build,check,side_order", _FUZZ_MATRIX, ids=[m[0] for m in _FUZZ_MATRIX]
)
def test_fsm_replay_fuzz(
    spark, sf_dir, tmp_path, name, build, check, side_order, seed, redeliver
):
    """Every FSM twin under adversarial chunking — and, in the redeliver
    variants, under at-least-once duplicate delivery absorbed by an
    exactly-once dedup front (``dropDuplicates`` on the event key, the
    streaming twin of the ``*_deduped`` batch compositions; unbounded
    state here since a test replay is finite — production bounds it with
    ``dropDuplicatesWithinWatermark`` and a max-redelivery-lag delay).
    The two delivery modes use DISJOINT replay seeds, so every case is a
    distinct chunking: 12 distinct seeds per FSM."""
    full_seed = _fuzz_seed(f"{name}:{int(redeliver)}", seed)
    stream, batch_dir = _fuzz_replay(
        spark, sf_dir, tmp_path, full_seed, side_order, redeliver=redeliver
    )
    if redeliver:
        stream = stream.dropDuplicates(["event_id"])
    got = run_stream(
        spark, build(stream), "append", f"t_fuzz_{name}_{seed}_{int(redeliver)}"
    )
    check(spark, stream, batch_dir, got)


@pytest.mark.parametrize("redeliver", [False, True], ids=["clean", "redeliver"])
@pytest.mark.parametrize(
    "name,build,check,side_order", _FUZZ_MATRIX, ids=[m[0] for m in _FUZZ_MATRIX]
)
def test_fsm_fuzz_kill_and_resume(
    spark, sf_dir, tmp_path, name, build, check, side_order, redeliver
):
    """Kill-and-resume at a random batch boundary for EVERY fuzzed FSM (not
    just the transition FSM): run the fuzzed replay's first k chunks
    through a checkpointed foreachBatch parquet sink, stop, reveal the
    remaining chunks, restart FROM THE SAME CHECKPOINT, and apply the
    exact convergence check to the combined delivery. Any state lost at
    the restart boundary breaks cross-boundary emissions. The redeliver
    variants inject duplicate delivery on top (exactly-once dedup front),
    so the DEDUP operator's seen-keys state must survive the restart
    too — a duplicate spanning the kill must still be absorbed."""
    import glob as _glob
    import shutil

    from kafka_streams_tcp_reconciliation_spark.streaming.sink import (
        IdempotentBatchSink,
    )
    from kafka_streams_tcp_reconciliation_spark.streaming.source import (
        event_stream_from_dir,
    )

    full_seed = _fuzz_seed(name, 977 + int(redeliver))
    _, batch_dir = _fuzz_replay(
        spark, sf_dir, tmp_path, full_seed, side_order, redeliver=redeliver
    )
    chunks = sorted(_glob.glob(str(tmp_path / "chunks" / "chunk_*")))
    assert len(chunks) >= 3
    rng = np.random.default_rng(full_seed)
    k = int(rng.integers(1, len(chunks)))
    in_dir = tmp_path / "in"
    in_dir.mkdir()
    ckpt = str(tmp_path / "ckpt")
    sink = IdempotentBatchSink(str(tmp_path / "out"))

    def run() -> None:
        s = event_stream_from_dir(spark, str(in_dir / "chunk_*"))
        if redeliver:
            s = s.dropDuplicates(["event_id"])
        q = (
            build(s)
            .writeStream.foreachBatch(sink)
            .outputMode("append")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(timeout=300)

    # copy2 preserves the forced strictly-increasing mtimes the replay
    # builder set — the file source orders chunks oldest-mtime-first
    for c in chunks[:k]:
        shutil.copy2(c, in_dir / os.path.basename(c))
    run()
    for c in chunks[k:]:
        shutil.copy2(c, in_dir / os.path.basename(c))
    run()
    got = spark.read.parquet(f"{tmp_path}/out/data").toPandas()
    check(spark, None, batch_dir, got)


def test_incremental_dedup_stream_converges(spark, sf_dir, tmp_path_factory):
    """Streaming incremental fuzzy dedup (two stateless stream-static
    joins: LSH bucket probe + exact-Jaccard verify) over an ordered replay
    of the ingest slice converges to the batch dedup_minhash_incremental
    result once per-band candidate multiplicity is deduped (the
    foreachBatch idiom documented in the module)."""
    from pyspark.sql import functions as F

    from kafka_streams_tcp_reconciliation_spark.plans.llm import _INCR_MOD
    from kafka_streams_tcp_reconciliation_spark.streaming.decontam import (
        chunked_text_stream,
    )
    from kafka_streams_tcp_reconciliation_spark.streaming.incremental_dedup import (
        corpus_index,
        incremental_dedup_stream,
    )

    chunks = str(tmp_path_factory.mktemp("incrchunks"))
    feed = chunked_text_stream(spark, sf_dir, chunks, n_chunks=4).filter(
        F.col("doc_id") % _INCR_MOD == 0
    )
    index, corpus_hs = corpus_index(spark, sf_dir)
    got = run_stream(
        spark,
        incremental_dedup_stream(feed, index, corpus_hs),
        "append",
        "t_incr_dedup",
    ).drop_duplicates()
    want = all_queries()["dedup_minhash_incremental"](spark, sf_dir).toPandas()
    assert len(want) > 0, "fixture produced no incremental dups"
    pd.testing.assert_frame_equal(canon(got), canon(want), check_dtype=False)
