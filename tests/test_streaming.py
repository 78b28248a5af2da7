"""Structured Streaming wrapper tests (availableNow drain + windowed
metrics with watermark)."""

from __future__ import annotations

import shutil
import tempfile
from pathlib import Path

import pyspark.sql.functions as F
import pytest

from readability_ex_spark.sources.pages import synthesize_pages
from readability_ex_spark.streaming import stream_extraction, stream_metrics


@pytest.fixture()
def tmpdir():
    d = tempfile.mkdtemp(prefix="stream_test_")
    yield Path(d)
    shutil.rmtree(d, ignore_errors=True)


def test_stream_extraction_drains_input(spark, tmpdir):
    pages = synthesize_pages(spark, "/root/testdata/sf0.001").limit(60)
    pages.write.mode("overwrite").parquet(str(tmpdir / "pages"))

    q = stream_extraction(
        spark,
        str(tmpdir / "pages"),
        str(tmpdir / "out"),
        str(tmpdir / "ckpt"),
        available_now=True,
    )
    q.awaitTermination(300)
    out = spark.read.parquet(str(tmpdir / "out"))
    n_urls = pages.select("url").distinct().count()
    assert out.count() == n_urls
    assert out.filter(F.col("status") == "ok").count() > 0

    # restart with the same checkpoint: nothing new to process
    q2 = stream_extraction(
        spark,
        str(tmpdir / "pages"),
        str(tmpdir / "out"),
        str(tmpdir / "ckpt"),
        available_now=True,
    )
    q2.awaitTermination(300)
    assert spark.read.parquet(str(tmpdir / "out")).count() == n_urls


def test_stream_metrics_windows(spark, tmpdir):
    pages = synthesize_pages(spark, "/root/testdata/sf0.001").limit(40)
    pages.write.mode("overwrite").parquet(str(tmpdir / "pages"))
    stream = spark.readStream.schema(
        spark.read.parquet(str(tmpdir / "pages")).schema
    ).parquet(str(tmpdir / "pages"))
    agg = stream_metrics(stream)
    q = (
        agg.writeStream.format("memory")
        .queryName("metrics_test")
        .outputMode("append")
        .option("checkpointLocation", str(tmpdir / "ckpt2"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    # append mode only emits closed windows; the plan must at least run
    # and register schema correctly
    res = spark.sql("select * from metrics_test")
    assert {"window_start", "window_end", "lang", "n_docs", "n_bytes"} == set(
        res.columns
    )


def test_batch_write_idempotent(spark, tmpdir):
    """A micro-batch retried with the same batch_id replaces its own
    partition instead of appending duplicates (exactly-once output)."""
    from readability_ex_spark.pipeline import run_extraction
    from readability_ex_spark.sinks import write_extracted_batch

    pages = synthesize_pages(spark, "/root/testdata/sf0.001").limit(30)
    extracted = run_extraction(pages).cache()
    out = str(tmpdir / "out_idem")
    write_extracted_batch(extracted, out, batch_id=0)
    n1 = spark.read.parquet(out).count()
    # simulate a retry of the same micro-batch
    write_extracted_batch(extracted, out, batch_id=0)
    assert spark.read.parquet(out).count() == n1
    # a different batch appends alongside
    write_extracted_batch(extracted.limit(5), out, batch_id=1)
    assert spark.read.parquet(out).count() == n1 + 5
    extracted.unpersist()


def test_batch_retry_replaces_drifted_partitions(spark, tmpdir):
    """A retry whose rows land in different (status, bucket) partitions
    must still fully replace the failed attempt's batch output."""
    from readability_ex_spark.pipeline import run_extraction
    from readability_ex_spark.sinks import write_extracted_batch

    pages = synthesize_pages(spark, "/root/testdata/sf0.001").limit(20)
    extracted = run_extraction(pages).cache()
    out = str(tmpdir / "out_drift")
    write_extracted_batch(extracted, out, batch_id=0)  # "partial" attempt
    retry = extracted.limit(5)  # retry produces fewer rows/partitions
    write_extracted_batch(retry, out, batch_id=0)
    assert spark.read.parquet(out).count() == 5
    extracted.unpersist()
