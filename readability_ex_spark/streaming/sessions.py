"""Streaming gap-based sessionization over the events stream.

The batch engine sessionizes with lag + cumulative-sum windows
(``operators/relational.q_sessionize``); the streaming twin uses
Spark's NATIVE session windows — ``F.session_window(ts, gap)`` under a
watermark — which is exactly the stateful operator Structured
Streaming maintains incrementally: per-key session state merges as
events arrive and EMITS when the watermark passes a session's end
(gap-closed sessions are final by construction, so append mode needs
no reconciliation).

Scale shape: state is one entry per OPEN session per user (bounded by
the watermark horizon), not per event; the shuffle is the same
user-keyed exchange the batch plan pays.  Late events inside the
watermark merge into (or bridge!) existing sessions — the case the
batch lag-window handles by total ordering and the streaming operator
by state merge; events later than the watermark are dropped by the
watermark filter, the documented trade.

Semantics parity with the batch operator: a session is a maximal run
of same-user events where consecutive gaps are <= ``gap`` —
``session_window`` merges windows that OVERLAP (gap strictly smaller
closes over the boundary), while the batch rule starts a new session
when ``gap_us > threshold``; both cut at the identical boundary, which
``tests/test_streaming_sessions.py`` asserts set-for-set against the
batch plan on the same input.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

EVENTS_SCHEMA = (
    "event_id long, ts timestamp, user_id long, "
    "event_type string, value double, props string"
)


def session_stats(
    events: DataFrame, gap: str = "30 minutes"
) -> DataFrame:
    """Per (user, session) rollup via native session windows — works on
    a batch OR streaming frame (the streaming caller adds a watermark).

    ``ts`` must already be a (tz-aware) timestamp column: casting
    INSIDE ``session_window`` would detach the expression from the
    stream's watermark column and Spark would reject append mode.

    Columns mirror the batch ``sessionize`` oracle: event count, first/
    last event micros, value sum."""
    return events.groupBy(
        F.col("user_id"),
        F.session_window(F.col("ts"), gap),
    ).agg(
        F.count("*").alias("n_events"),
        F.min(F.unix_micros(F.col("ts"))).alias("start_us"),
        F.max(F.unix_micros(F.col("ts"))).alias("end_us"),
        F.round(F.sum("value"), 2).alias("sum_value"),
    )


def q_session_window_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Checked query for the NATIVE operator in batch mode: the session
    rollup over the events table (the session is pinned to UTC, so the
    NTZ-parquet cast is value-preserving — same note as sessionize)."""
    ev = spark.read.parquet(f"{sf_dir}/events.parquet").withColumn(
        "ts", F.col("ts").cast("timestamp")
    )
    return session_stats(ev).select(
        "user_id", "n_events", "start_us", "end_us", "sum_value"
    ).orderBy("user_id", "start_us")


def stream_sessions(
    spark: SparkSession,
    input_path: str,
    output_path: str,
    checkpoint: str,
    *,
    gap: str = "30 minutes",
    watermark: str = "2 hours",
    available_now: bool = True,
):
    """Start the streaming sessionization query (append mode: each
    session row is emitted once, when the watermark closes it).
    Returns the StreamingQuery."""
    events = spark.readStream.schema(EVENTS_SCHEMA).parquet(input_path)
    sessions = session_stats(
        events.withWatermark("ts", watermark), gap
    ).select(
        "user_id",
        F.unix_micros(F.col("session_window.start")).alias("window_start_us"),
        "n_events",
        "start_us",
        "end_us",
        "sum_value",
    )
    writer = (
        sessions.writeStream.outputMode("append")
        .format("parquet")
        .option("path", output_path)
        .option("checkpointLocation", checkpoint)
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
