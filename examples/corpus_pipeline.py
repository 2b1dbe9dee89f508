"""Runnable end-to-end training-corpus pipeline demo.

The full pretraining data flow over the ``documents`` table, each stage a
registered operator (so each is independently DuckDB-checked):

    quality gate + near-dup removal  (curate_corpus)
      → deterministic 80/10/10 split (split_train_valid_test expression)
      → TF-IDF keywords for inspection (tfidf_top_terms)
      → token-budget sequence packing (pack_token_budget_bins)

    python examples/corpus_pipeline.py [sf_dir]

Every stage is pure DataFrame algebra — the same code runs on a 1000-
executor cluster; only partition counts change.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from kafka_streams_tcp_reconciliation_spark.session import get_spark
from kafka_streams_tcp_reconciliation_spark.plans import all_queries


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    spark = get_spark(app_name="corpus-pipeline-demo")
    spark.sparkContext.setLogLevel("ERROR")
    q = all_queries()

    kept = q["curate_corpus"](spark, sf_dir)
    print(f"curated corpus: {kept.count()} docs kept")

    splits = q["split_train_valid_test"](spark, sf_dir)
    print("split sizes:")
    splits.show()

    contaminated = q["decontaminate_train_eval"](spark, sf_dir)
    print(f"train docs sharing an 8-gram with the eval split: {contaminated.count()}")

    clusters = q["dedup_cluster_resolve"](spark, sf_dir)
    n_members = clusters.count()
    n_keep = clusters.filter("doc_id = canonical_id").count()
    print(
        f"near-dup clusters: {n_members} docs in clusters, "
        f"{n_keep} canonical keepers (transitive A~B~C keeps one)"
    )

    redacted = q["text_pii_redact"](spark, sf_dir)
    print(f"PII-scrubbed docs: {redacted.count()}")

    rep = q["doc_repetition_score"](spark, sf_dir)
    print("most-repetitive documents (duplicate 5-gram fraction):")
    rep.orderBy(rep.dup_gram_frac.desc(), "doc_id").show(5)

    mix = q["mixture_upsample_sources"](spark, sf_dir)
    print(f"mixture-upsampled corpus: {mix.count()} rows (with epoch copies)")

    print("sample TF-IDF keywords:")
    q["tfidf_top_terms"](spark, sf_dir).show(9)

    bins = q["pack_token_budget_bins"](spark, sf_dir)
    print(f"packed into {bins.count()} training-sequence bins:")
    bins.orderBy("shard", "bin").show(8)

    spark.stop()


if __name__ == "__main__":
    main()
