"""Structured Streaming wrappers around the extraction kernel."""

from readability_ex_spark.streaming.extract import (
    stream_dedup_first_seen,
    stream_dedup_first_seen_event_time,
    stream_extraction,
    stream_metrics,
)

__all__ = [
    "stream_dedup_first_seen",
    "stream_dedup_first_seen_event_time",
    "stream_extraction",
    "stream_metrics",
]
