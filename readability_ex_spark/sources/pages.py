"""Web-page table source.

Production shape (BASELINE.json input_hint): an Iceberg table
``(url string, warc_ts timestamp, html binary, text string, lang string)``.
Dev/test path reads parquet with the identical schema, or synthesizes a
deterministic pages table from the testdata ``documents`` parquet (no
external data) — each document's text is wrapped in an HTML article
template with nav/footer/aside boilerplate so the extraction kernel has
real work to do.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

PAGES_SCHEMA = T.StructType(
    [
        T.StructField("url", T.StringType(), False),
        T.StructField("warc_ts", T.TimestampType(), True),
        T.StructField("html", T.BinaryType(), True),
        T.StructField("text", T.StringType(), True),
        T.StructField("lang", T.StringType(), True),
    ]
)


def read_pages(
    spark: SparkSession, path: str, table_format: str = "parquet"
) -> DataFrame:
    """Read a pages table with the input_hint schema.

    ``table_format='iceberg'`` loads an Iceberg table (``path`` is then
    a catalog table name, e.g. ``crawl.pages``) — snapshot isolation +
    hidden partitioning at 10^12-doc scale. ``'warc'`` reads raw
    Common-Crawl-style WARC segments (plain or .gz) via the stdlib
    record parser (sources/warc.py). The parquet path is the dev/test
    fallback with the identical schema; in this sandbox there are no
    Iceberg jars, so the iceberg branch is exercised by call-shape
    tests only (tests/test_iceberg_path.py)."""
    if table_format == "iceberg":
        return spark.read.format("iceberg").load(path)
    if table_format == "warc":
        from readability_ex_spark.sources.warc import read_warc_pages

        return read_warc_pages(spark, path)
    return spark.read.parquet(path)


# HTML template: the kernel must strip nav/aside/footer/ads and keep the
# article body. Deterministic per doc_id.
_PAGE_TEMPLATE_SQL = r"""
concat(
  '<!DOCTYPE html><html lang="', lang, '"><head>',
  '<title>Document ', cast(doc_id as string), ' | SynthCrawl</title>',
  '<meta property="og:site_name" content="SynthCrawl"/>',
  '<meta name="author" content="Author ', cast(doc_id % 7 as string), '"/>',
  case when doc_id % 53 = 13
       then '<meta name="robots" content="noindex, noarchive"/>'
       when doc_id % 53 = 29
       then '<meta name="robots" content="noai"/>'
       else '' end,
  case when doc_id % 29 = 3
       then '<link rel="license" href="https://creativecommons.org/licenses/by/4.0/"/>'
       else '' end,
  '</head><body>',
  '<nav class="sidebar menu"><a href="/">Home</a> <a href="/about">About</a></nav>',
  '<div class="-ad- banner">Advertisement</div>',
  '<article id="story"><h1>Document ', cast(doc_id as string), '</h1>',
  body_paras,
  '</article>',
  '<aside class="related">Related stories</aside>',
  '<footer class="footer">Copyright SynthCrawl</footer>',
  '</body></html>'
)
"""


def synthesize_pages(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic pages table from documents.parquet.

    Includes duplicate-url rows at older warc_ts (dedup-window coverage)
    and a null-html error row per 97 docs (error-path coverage).
    """
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    # split text into sentence-ish paragraphs: 3 paragraphs per doc
    paras = (
        "concat('<p>', concat_ws('. ', slice(split(text, ' '), 1, 40)), ', and more.</p>',"
        "'<p>', concat_ws(' ', slice(split(text, ' '), 41, 40)), ', with commas, everywhere.</p>',"
        "'<p>', concat_ws(' ', slice(split(text, ' '), 81, 1000)), '.</p>')"
    )
    base = docs.withColumn("body_paras", F.expr(paras)).withColumn(
        "page_html", F.expr(_PAGE_TEMPLATE_SQL)
    )
    pages = base.select(
        F.concat(F.lit("http://synth.test/doc/"), F.col("doc_id")).alias("url"),
        F.to_timestamp(
            F.lit("2024-06-01 00:00:00")
        ).alias("warc_ts"),
        F.when(F.pmod(F.col("doc_id"), F.lit(97)) == 96, F.lit(None))
        .otherwise(F.col("page_html"))
        .cast("binary")
        .alias("html"),
        F.col("text"),
        F.col("lang"),
    )
    # duplicate-url older-crawl rows for ~1 in 5 docs
    dupes = base.filter(F.pmod(F.col("doc_id"), F.lit(5)) == 0).select(
        F.concat(F.lit("http://synth.test/doc/"), F.col("doc_id")).alias("url"),
        F.to_timestamp(F.lit("2024-01-01 00:00:00")).alias("warc_ts"),
        F.lit("<html><body><p>stale crawl</p></body></html>")
        .cast("binary")
        .alias("html"),
        F.col("text"),
        F.col("lang"),
    )
    return pages.unionByName(dupes)
