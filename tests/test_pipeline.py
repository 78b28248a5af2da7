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
    assert by_status.get("empty", 0) >= 1  # null-html rows are terminal 'empty'


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
    assert all(
        r.status in ("ok", "not_readable", "empty", "too_large", "error")
        for r in out
    )


def test_salted_output_equals_unsalted(spark):
    """run_extraction(salt_buckets=K) must produce the same rows as the
    unsalted plan — salting only changes the physical layout."""
    import pyspark.sql.functions as F

    from readability_ex_spark.pipeline import run_extraction
    from readability_ex_spark.sources.pages import synthesize_pages

    pages = synthesize_pages(spark, "/root/testdata/sf0.001").limit(80)
    cols = ["url", "status", "title", "text", "length"]
    plain = {
        tuple(r) for r in run_extraction(pages).select(*cols).collect()
    }
    salted = {
        tuple(r)
        for r in run_extraction(pages, salt_buckets=8).select(*cols).collect()
    }
    assert salted == plain


def test_salting_spreads_skewed_url(spark):
    """1 url x 3k pre-dedup rows: unsalted layout puts every row in one
    partition, salting spreads them across buckets."""
    import pyspark.sql.functions as F

    from readability_ex_spark.pipeline import run_extraction

    # distinct html per row so dedup keeps nothing extra to collapse;
    # dedup off to exercise the raw layout
    rows = spark.range(3000).select(
        F.lit("http://skew.test/one").alias("url"),
        F.to_timestamp(F.lit("2024-06-01 00:00:00")).alias("warc_ts"),
        F.concat(
            F.lit("<html><body><p>row "), F.col("id").cast("string"),
            F.lit(" text</p></body></html>"),
        ).cast("binary").alias("html"),
    )

    def hist(salt):
        df = run_extraction(
            rows, dedup=False, salt_buckets=salt, n_partitions=16,
            emit_html=False,
        )
        return (
            df.groupBy("partition_id").count().collect()
        )

    unsalted = hist(0)
    assert len(unsalted) == 1  # all rows behind one url-hash partition
    salted = hist(8)
    assert len(salted) >= 4  # spread across several partitions
    assert max(r["count"] for r in salted) <= 3000 * 0.6


def test_write_jsonl_rejects_missing_columns(spark, tmp_path):
    """A silent column subset would ship a different schema than
    requested — write_jsonl must refuse instead."""
    import pytest as _pytest

    from readability_ex_spark.sinks import write_jsonl

    df = spark.createDataFrame([(1, "t")], "url string, text string")
    with _pytest.raises(ValueError, match="title"):
        write_jsonl(df, str(tmp_path / "x"))


def test_url_bloom_filters_written(spark, tmp_path):
    """Every url-keyed parquet sink writes a bloom filter for the url
    column (and only it): the hash-bucket layout scatters urls within
    row groups, so min/max stats can never prune a url point lookup —
    the bloom is the only row-group pruner. Presence verified through
    parquet-mr (pyarrow in this sandbox predates the metadata field)."""
    import glob

    from pyspark.sql import functions as F

    from readability_ex_spark.sinks import with_url_bloom

    out = str(tmp_path / "bloomed")
    df = spark.range(500).select(
        F.concat(F.lit("http://b.test/"), F.col("id")).alias("url"),
        F.col("id").alias("v"),
    )
    with_url_bloom(df.coalesce(1).write).parquet(out)

    jvm = spark._jvm
    conf = spark._jsc.hadoopConfiguration()
    f = glob.glob(f"{out}/*.parquet")[0]
    reader = jvm.org.apache.parquet.hadoop.ParquetFileReader.open(
        jvm.org.apache.parquet.hadoop.util.HadoopInputFile.fromPath(
            jvm.org.apache.hadoop.fs.Path(f), conf
        )
    )
    try:
        block = reader.getFooter().getBlocks().get(0)
        bd = reader.getBloomFilterDataReader(block)
        has_bloom = {}
        for i in range(block.getColumns().size()):
            col = block.getColumns().get(i)
            has_bloom[col.getPath().toDotString()] = (
                bd.readBloomFilter(col) is not None
            )
    finally:
        reader.close()
    assert has_bloom == {"url": True, "v": False}

    # ...and the zstd codec of CORPUS_SINK_OPTIONS reached the file
    import pyarrow.parquet as pq

    assert (
        pq.ParquetFile(f).metadata.row_group(0).column(0).compression
        == "ZSTD"
    )

    # the bloom/codec change the file bytes only — results identical
    back = spark.read.parquet(out)
    assert back.count() == 500
    assert back.filter(F.col("url") == "http://b.test/7").count() == 1
