"""Streaming session windows (streaming/sessions.py) vs the batch
lag-window sessionizer — same gap rule, same rollups."""

from __future__ import annotations

import shutil
import tempfile
from pathlib import Path

import pytest
from pyspark.sql import functions as F

from readability_ex_spark.operators.relational import q_sessionize
from readability_ex_spark.streaming.sessions import (
    session_stats,
    stream_sessions,
)

SF = "/root/testdata/sf0.001"


@pytest.fixture()
def tmpdir():
    d = tempfile.mkdtemp(prefix="stream_sess_")
    yield Path(d)
    shutil.rmtree(d, ignore_errors=True)


def _batch_rows(spark):
    return {
        (r.user_id, r.n_events, r.start_us, r.end_us, r.sum_value)
        for r in q_sessionize(spark, SF).collect()
    }


def test_session_stats_batch_matches_lag_sessionizer(spark):
    """The native-session-window rollup clusters exactly like the
    lag + cumulative-sum batch plan (same 30-minute gap)."""
    ev = spark.read.parquet(f"{SF}/events.parquet").withColumn(
        "ts", F.col("ts").cast("timestamp")
    )
    native = {
        (r.user_id, r.n_events, r.start_us, r.end_us, r.sum_value)
        for r in session_stats(ev).collect()
    }
    assert native == _batch_rows(spark)


def test_stream_sessions_emit_closed_sessions(spark, tmpdir):
    """Streaming append mode emits exactly the watermark-closed
    sessions, each identical to its batch twin."""
    ev = spark.read.parquet(f"{SF}/events.parquet").withColumn(
        "ts", F.col("ts").cast("timestamp")
    )
    ev.write.mode("overwrite").parquet(str(tmpdir / "events"))

    q = stream_sessions(
        spark,
        str(tmpdir / "events"),
        str(tmpdir / "out"),
        str(tmpdir / "ckpt"),
        watermark="1 minute",
        available_now=True,
    )
    q.awaitTermination(300)
    streamed = {
        (r.user_id, r.n_events, r.start_us, r.end_us, r.sum_value)
        for r in spark.read.parquet(str(tmpdir / "out")).collect()
    }
    batch = _batch_rows(spark)
    # every emitted session is byte-identical to a batch session
    assert streamed <= batch
    # only sessions the final watermark could not yet close may be
    # missing (end within <watermark + gap> of the global max ts)
    max_us = ev.agg(
        F.max(F.unix_micros(F.col("ts").cast("timestamp")))
    ).first()[0]
    horizon = max_us - (60 + 30 * 60) * 1_000_000
    must_emit = {t for t in batch if t[3] < horizon}
    assert must_emit <= streamed
    assert len(streamed) >= 0.8 * len(batch)
