"""Spark pipeline tests: dedup window, anti-join resume, error paths,
lineage counters, salting/partition distribution (SURVEY.md §5.2)."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from readability_ex_spark.pipeline import (
    dedup_latest_crawl,
    metrics_rollup,
    run_extraction,
)
from readability_ex_spark.sources.pages import synthesize_pages

SF = "/root/testdata/sf0.001"
PAGES_DDL = "url string, warc_ts timestamp, html binary, text string, lang string"


@pytest.fixture(scope="module")
def extracted(spark):
    pages = synthesize_pages(spark, SF)
    df = run_extraction(pages).cache()
    yield df
    df.unpersist()


def test_dedup_picks_latest(spark):
    pages = synthesize_pages(spark, SF)
    deduped = dedup_latest_crawl(pages.select("url", "warc_ts", "html"))
    assert deduped.count() == pages.select("url").distinct().count()
    stale = deduped.filter(
        F.col("html").cast("string").contains("stale crawl")
    ).count()
    assert stale == 0


def test_extraction_counts_and_errors(extracted, spark):
    n_urls = synthesize_pages(spark, SF).select("url").distinct().count()
    assert extracted.count() == n_urls
    by_status = dict(
        extracted.groupBy("status").count().rdd.map(tuple).collect()
    )
    assert by_status.get("ok", 0) > 0.9 * n_urls
    assert by_status.get("error", 0) >= 1  # null-html rows surface as errors


def test_extraction_fields(extracted):
    row = (
        extracted.filter(F.col("status") == "ok")
        .orderBy("url")
        .select("title", "site_name", "byline", "text", "length")
        .head()
    )
    assert row.title and row.site_name == "SynthCrawl"
    assert row.byline and row.byline.startswith("Author ")
    assert row.length == len(row.text)


def test_resume_anti_join(spark, extracted):
    pages = synthesize_pages(spark, SF)
    done = extracted.select("url")
    again = run_extraction(pages, done_urls=done)
    assert again.count() == 0


def test_metrics_rollup(extracted):
    m = metrics_rollup(extracted)
    totals = m.agg(
        F.sum("n_docs").alias("docs"), F.sum("n_ok").alias("ok")
    ).head()
    assert totals.docs == extracted.count()
    assert totals.ok == extracted.filter(F.col("status") == "ok").count()


def test_partition_distribution(extracted):
    per_part = [r.n_docs for r in metrics_rollup(extracted).collect()]
    assert len(per_part) > 1
    # url-hash repartition should spread docs: no partition holds >25%
    assert max(per_part) <= 0.25 * sum(per_part)


def test_malformed_html_never_kills_job(spark):
    rows = [
        ("u1", None, b"<div><p>unclosed <b>bold", "t", "en"),
        ("u2", None, b"\xff\xfe\x00garbage", "t", "en"),
        ("u3", None, b"", "t", "en"),
        ("u4", None, None, "t", "en"),
    ]
    df = spark.createDataFrame(rows, schema=PAGES_DDL)
    out = run_extraction(df, dedup=False).select("url", "status").collect()
    assert len(out) == 4
    assert all(r.status in ("ok", "not_readable", "error") for r in out)
