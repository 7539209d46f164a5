"""Structured Streaming event analytics (extension beyond the reference).

The reference has no streaming operators at all — its Kafka connector reads
topics as static batch tables (presto-kafka/.../KafkaRecordSet.java:53;
SURVEY.md §2.9). This package adds the true-streaming counterpart of the
batch queries in queries/events.py: the same tumbling-window rollups as an
incremental readStream -> watermark -> windowed-agg -> sink pipeline, which
is the shape that handles an unbounded 100 TB/day event feed.
"""

from .events_stream import (
    enriched_stream,
    run_availablenow_to_memory,
    stream_events,
    tumbling_counts,
)
from .ann_ingest_stream import ann_ingest_query, code_against_codebook
from .burst_stream import burst_stream
from .join_stream import attribution_pairs
from .sessionize_stream import sessionize_stream

__all__ = [
    "stream_events",
    "tumbling_counts",
    "enriched_stream",
    "run_availablenow_to_memory",
    "sessionize_stream",
    "attribution_pairs",
    "burst_stream",
    "ann_ingest_query",
    "code_against_codebook",
]
