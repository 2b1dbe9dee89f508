"""Structured Streaming layer — the incremental forms of the engine's
operators (SURVEY.md §2.5, §2.9, §3.2).

Batch/streaming duality: every streaming pipeline here composes the SAME
DataFrame expressions as its batch twin in ``plans/``; only the source
(``readStream``), watermarking, and sink differ. The driver's DuckDB gate
checks the batch twins; ``tests/test_streaming.py`` replays the events
table through a chunked file source and asserts the streaming results
converge to the batch results.

Kafka mapping (no broker in this environment, SURVEY.md §2.1): the chunked
file source stands in for topic partitions; ``spark.readStream
.format("kafka")`` drops in unchanged because every pipeline takes a
DataFrame, not a path.
"""

from kafka_streams_tcp_reconciliation_spark.streaming.source import chunked_event_stream, event_stream_from_dir
from kafka_streams_tcp_reconciliation_spark.streaming.windows import (
    session_window_stats_stream,
    tumbling_window_stream,
)
from kafka_streams_tcp_reconciliation_spark.streaming.reconcile import (
    reconcile_join_stream,
    reconcile_unmatched_stream,
)

__all__ = [
    "chunked_event_stream",
    "event_stream_from_dir",
    "tumbling_window_stream",
    "session_window_stats_stream",
    "reconcile_join_stream",
    "reconcile_unmatched_stream",
]
