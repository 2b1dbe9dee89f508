"""Runnable vector-retrieval stack demo.

The serving-side flow over the ``embeddings`` table, each stage a
registered operator (so each is independently DuckDB-checked):

    corpus quality gate        (embedding_norm_outliers)
      → cluster separation map (label_centroid_distances)
      → exact top-k baseline   (similarity_topk_bruteforce)
      → IVF cell-pruned top-k  (similarity_ivf_topk)
      → diversified rerank     (mmr_diversified_topk)
      → label sanity check     (knn_label_accuracy)

    python examples/retrieval_stack.py [sf_dir]

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
    spark = get_spark(app_name="retrieval-stack-demo")
    q = all_queries()

    print("== vector quality gate: norm outliers ==")
    outliers = q["embedding_norm_outliers"](spark, sf_dir)
    outliers.filter("is_outlier").show(10)

    print("== cluster separation: closest label-centroid pairs ==")
    q["label_centroid_distances"](spark, sf_dir).orderBy(
        "cosine", ascending=False
    ).show(5)

    print("== exact top-k (baseline) vs IVF (serving path), query 0 ==")
    q["similarity_topk_bruteforce"](spark, sf_dir).filter("query_id = 0").show()
    q["similarity_ivf_topk"](spark, sf_dir).filter("query_id = 0").show()

    print("== MMR diversified top-5 for query 0 ==")
    q["mmr_diversified_topk"](spark, sf_dir).orderBy("rank").show()

    print("== label sanity: kNN majority-vote accuracy ==")
    acc = q["knn_label_accuracy"](spark, sf_dir)
    acc.groupBy("is_correct").count().show()


if __name__ == "__main__":
    main()
