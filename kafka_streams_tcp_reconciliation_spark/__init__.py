"""kafka_streams_tcp_reconciliation_spark — a PySpark-native analytics engine.

A from-scratch, Spark-first re-expression of the query & data-processing
capabilities of the reference stream processor (a Kafka Streams TCP
reconciliation application — see SURVEY.md; the reference checkout is empty,
so capability parity targets the public Kafka Streams DSL surface, SURVEY.md
§2), extended with LLM-data-pipeline operators (dedup, similarity search,
text analysis, multimodal columns).

Design principles (SURVEY.md §4, §7):

- **DataFrame-declarative.** Every operator is expressed through the
  PySpark DataFrame/SQL API so Catalyst handles predicate pushdown, column
  pruning, join strategy selection, and AQE re-planning. No custom planner.
- **Batch/streaming duality.** Operators are defined once over DataFrames
  and run identically in batch (driver's DuckDB-checked contract) and
  incremental (Structured Streaming) mode.
- **Scale-first.** No ``collect()`` in any operator path; joins broadcast
  small sides; near-dup and similarity ops use LSH banding instead of
  cross joins so they survive 100 TB inputs with partition tuning only.
"""

__version__ = "0.1.0"
