"""Structured Streaming wrappers around the extraction kernel."""

from readability_ex_spark.streaming.extract import (
    stream_extraction,
    stream_metrics,
)

__all__ = ["stream_extraction", "stream_metrics"]
