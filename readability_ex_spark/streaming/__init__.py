"""Structured Streaming wrappers around the extraction kernel."""

from readability_ex_spark.streaming.extract import (
    stream_dedup_first_seen,
    stream_dedup_first_seen_event_time,
    stream_extraction,
    stream_metrics,
)
from readability_ex_spark.streaming.sessions import (
    session_stats,
    stream_sessions,
)

__all__ = [
    "session_stats",
    "stream_dedup_first_seen",
    "stream_dedup_first_seen_event_time",
    "stream_extraction",
    "stream_metrics",
    "stream_sessions",
]
