"""The end-to-end extraction pipeline (SURVEY.md §4.3 target plan):

    scan(pages) -> filter(html valid) -> dedup latest per url
      -> repartition(xxhash64(url) [+ salt])
      -> mapInPandas(readability kernel)  [Arrow-batched]
      -> lineage columns -> sink (+ per-partition metrics)

Everything outside the kernel is stock DataFrame ops so Catalyst keeps
pushdown/pruning; the kernel runs in Arrow batches with rows capped by
session config (HTML rows are MB-scale — session.py).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F
from pyspark.sql import types as T

EXTRACT_SCHEMA = T.StructType(
    [
        T.StructField("url", T.StringType(), False),
        T.StructField("title", T.StringType(), True),
        T.StructField("byline", T.StringType(), True),
        T.StructField("dir", T.StringType(), True),
        T.StructField("lang", T.StringType(), True),
        T.StructField("site_name", T.StringType(), True),
        T.StructField("published_time", T.StringType(), True),
        T.StructField("excerpt", T.StringType(), True),
        T.StructField("content_html", T.StringType(), True),
        T.StructField("text", T.StringType(), True),
        # topmost block elements of the cleaned article as [start, end)
        # offsets into `text` (kernel/spans.py) — the "text/spans" output
        # contract; text[start:end] == that block's textContent
        T.StructField(
            "spans",
            T.ArrayType(
                T.StructType(
                    [
                        T.StructField("tag", T.StringType(), False),
                        T.StructField("start", T.IntegerType(), False),
                        T.StructField("end", T.IntegerType(), False),
                    ]
                )
            ),
            True,
        ),
        T.StructField("length", T.IntegerType(), True),
        T.StructField("readerable", T.BooleanType(), True),
        # policy/compliance signals harvested from the pre-extraction
        # head (kernel/policy.py): meta-robots directives + license
        # link relations — the columns a corpus build filters on
        # before shipping text
        T.StructField("robots_noindex", T.BooleanType(), True),
        T.StructField("robots_noarchive", T.BooleanType(), True),
        T.StructField("robots_noai", T.BooleanType(), True),
        T.StructField("license_url", T.StringType(), True),
        # best next-page link candidate (kernel/paging.py scoring) — the
        # DOM is already built for extraction, so emitting the edge here
        # saves the chain pass a second full-corpus parse
        T.StructField("next_url", T.StringType(), True),
        # absolutized http(s) <a href> targets of the ORIGINAL document
        # (kernel/links.py: WHATWG-resolved, deduped, capped) — the
        # link-graph feed (operators/linkgraph.py) without a second
        # full-corpus parse
        T.StructField("outlinks", T.ArrayType(T.StringType()), True),
        T.StructField("status", T.StringType(), False),
        T.StructField("error", T.StringType(), True),
    ]
)

# lineage columns appended after extraction
LINEAGE_COLS = ("partition_id", "kernel_version")

KERNEL_VERSION = "0.1.0"


def extract_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """mapInPandas kernel driver: one Arrow batch in, one out.

    Imports inside the function so the Python workers resolve the kernel
    through --py-files without a driver-side closure.
    """
    from readability_ex_spark.kernel import dom, parse
    from readability_ex_spark.kernel.api import NotReadable, TooLarge
    from readability_ex_spark.kernel.encoding import decode_html
    from readability_ex_spark.kernel.links import collect_outlinks
    from readability_ex_spark.kernel.paging import find_next_page_link
    from readability_ex_spark.kernel.policy import extract_policy
    from readability_ex_spark.kernel.readerable import is_probably_readerable

    # one adversarial page must not stall an executor core
    guards = {"max_elems": 500_000, "max_depth": 2_000}

    for pdf in batches:
        out = {k: [] for k in (
            "url", "title", "byline", "dir", "lang", "site_name",
            "published_time", "excerpt", "content_html", "text", "spans",
            "length", "readerable", "robots_noindex", "robots_noarchive",
            "robots_noai", "license_url", "next_url", "outlinks",
            "status", "error",
        )}
        for url, html in zip(pdf["url"], pdf["html"]):
            row = {
                "title": None, "byline": None, "dir": None, "lang": None,
                "site_name": None, "published_time": None, "excerpt": None,
                "content_html": None, "text": None, "spans": None,
                "length": 0, "readerable": None, "robots_noindex": None,
                "robots_noarchive": None, "robots_noai": None,
                "license_url": None, "next_url": None, "outlinks": None,
            }
            if html is None or len(html) == 0:
                # terminal: the payload itself is missing — retrying can
                # never change the outcome (distinct from 'error', which
                # marks unexpected kernel failures worth retrying)
                status, error = "empty", "empty_html"
            else:
                try:
                    raw = decode_html(bytes(html))
                    doc = dom.parse_document(raw)
                    row["readerable"] = is_probably_readerable(doc)
                    try:
                        # before parse(): extraction strips the head
                        # the robots/license tags live in
                        row.update(extract_policy(doc))
                    except Exception:  # noqa: BLE001 — flags are advisory
                        pass
                    try:
                        # before parse(): extraction mutates the DOM and
                        # may strip the pagination links
                        row["next_url"] = find_next_page_link(doc, url)
                    except Exception:  # noqa: BLE001 — scoring is advisory
                        row["next_url"] = None
                    try:
                        # before parse(): the link graph wants the FULL
                        # page's edges, not the cleaned article's;
                        # resolve against the document's effective base
                        # (<base href> merged with the url, exactly as
                        # extraction itself resolves)
                        from readability_ex_spark.kernel.api import (
                            _effective_base_uri,
                        )

                        eff_base, _ = _effective_base_uri(doc, url)
                        row["outlinks"] = collect_outlinks(doc, eff_base)
                    except Exception:  # noqa: BLE001 — edges are advisory
                        row["outlinks"] = None
                    r = parse(raw, doc=doc, base_uri=url, **guards)
                    row.update(
                        title=r["title"], byline=r["byline"], dir=r["dir"],
                        lang=r["lang"], site_name=r["site_name"],
                        published_time=r["published_time"],
                        excerpt=r["excerpt"], content_html=r["content"],
                        text=r["text_content"], length=r["length"],
                        spans=[
                            {"tag": t, "start": s, "end": e}
                            for t, s, e in r["spans"]
                        ],
                    )
                    status, error = "ok", None
                except NotReadable:
                    status, error = "not_readable", None
                except TooLarge as exc:
                    # terminal: guard trips are deterministic per input
                    status, error = "too_large", f"too_large: {exc}"
                except Exception as exc:  # noqa: BLE001 — never kill the job
                    status, error = "error", f"{type(exc).__name__}: {exc}"[:500]
            out["url"].append(url)
            for k, v in row.items():
                out[k].append(v)
            out["status"].append(status)
            out["error"].append(error)
        yield pd.DataFrame(out)


def html_tiebreak_col(col: str = "html"):
    """THE dedup tiebreak for warc_ts ties, shared verbatim by the batch
    (``dedup_latest_crawl``) and streaming (``stream_dedup_first_seen``)
    paths so a streaming run and its batch backfill keep the SAME row
    for the same url: ascending md5 of the payload, null payload -> ''.
    md5 (not xxhash64) because the streaming side computes it in pandas,
    where hashlib.md5 is the portable twin."""
    return F.coalesce(F.md5(F.col(col)), F.lit(""))


def html_tiebreak_py(payload) -> str:
    """Pandas-side twin of ``html_tiebreak_col`` — identical ordering."""
    import hashlib

    if payload is None:
        return ""
    return hashlib.md5(bytes(payload)).hexdigest()


def dedup_latest_crawl(pages: DataFrame) -> DataFrame:
    """One row per url at max warc_ts (deterministic tiebreak on the
    html md5 — ``html_tiebreak_col``, shared with the streaming dedup —
    so reruns are stable and batch backfills agree with the stream)."""
    w = W.partitionBy("url").orderBy(
        F.col("warc_ts").desc(), html_tiebreak_col().asc()
    )
    return (
        pages.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )


def run_extraction(
    pages: DataFrame,
    *,
    n_partitions: int | None = None,
    salt_buckets: int = 0,
    dedup: bool = True,
    done_urls: DataFrame | None = None,
    emit_html: bool = True,
) -> DataFrame:
    """Build the extraction plan over a pages DataFrame.

    - filters null/empty html rows *into* the kernel (they come back as
      status='error' rows, preserving per-url accounting);
    - optional anti-join against ``done_urls`` (checkpoint resume);
    - explicit repartition by xxhash64(url) (+ optional salt for skewed
      hosts) before the expensive UDF so work spreads evenly;
    - appends lineage columns.
    """
    df = pages.select("url", "warc_ts", "html")
    if not n_partitions:
        # an explicit count keeps AQE from coalescing the (byte-small)
        # shuffle output below the core count — the kernel stage is
        # CPU-bound, not byte-bound, so advisory-size coalescing would
        # serialize it onto a handful of cores
        n_partitions = df.sparkSession.sparkContext.defaultParallelism * 2

    if salt_buckets > 1:
        # salted layout needs (url, salt) keys, but the dedup window
        # needs url-only clustering — dedup first, salted repartition
        # after (two exchanges, the price of skew protection)
        if dedup:
            df = dedup_latest_crawl(df)
        if done_urls is not None:
            df = df.join(done_urls.select("url"), "url", "left_anti")
        df = df.select("url", F.col("html").cast("binary").alias("html"))
        df = df.repartition(
            n_partitions,
            F.col("url"),
            F.pmod(F.xxhash64("url", "html"), F.lit(salt_buckets)),
        )
    else:
        # ONE exchange moves the html payload: the done-urls anti-join
        # runs before the layout (a post-repartition SortMergeJoin would
        # re-shuffle to spark.sql.shuffle.partitions and hand the kernel
        # an AQE-coalescible layout on resume), then the explicit
        # url-hash repartition, and the dedup window's
        # ClusteredDistribution(url) is satisfied by ANY url hash
        # partitioning, so ENSURE_REQUIREMENTS adds only a local sort —
        # with the window first, a shuffle.partitions/n_partitions
        # mismatch re-shuffled the full corpus payload a second time
        # (plan-asserted in tests/test_plans.py)
        if done_urls is not None:
            df = df.join(done_urls.select("url"), "url", "left_anti")
        df = df.repartition(n_partitions, F.col("url"))
        if dedup:
            df = dedup_latest_crawl(df)
        df = df.select("url", F.col("html").cast("binary").alias("html"))

    extracted = df.mapInPandas(extract_batches, EXTRACT_SCHEMA)
    if not emit_html:
        # text-only mode: cleaned HTML is usually the largest output
        # column; dropping it (projection, pushed past the UDF boundary
        # by us, not Catalyst) halves sink bytes for text pipelines
        extracted = extracted.drop("content_html")
    return extracted.withColumns(
        {
            "partition_id": F.spark_partition_id(),
            "kernel_version": F.lit(KERNEL_VERSION),
        }
    )


def metrics_rollup(extracted: DataFrame) -> DataFrame:
    """Per-partition counters (docs in/ok/failed, chars out) — persisted
    next to the output table as the _metrics lineage artifact."""
    return (
        extracted.groupBy("partition_id")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum(F.when(F.col("status") == "ok", 1).otherwise(0)).alias("n_ok"),
            F.sum(F.when(F.col("status") != "ok", 1).otherwise(0)).alias("n_failed"),
            F.sum(F.coalesce(F.col("length"), F.lit(0))).alias("n_chars"),
        )
        .orderBy("partition_id")
    )


def flagship_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Driver smoke entry: synthesize pages from sf documents, run the
    full pipeline, return extraction results (stable schema)."""
    from readability_ex_spark.sources.pages import synthesize_pages

    pages = synthesize_pages(spark, sf_dir)
    return run_extraction(pages, n_partitions=None)
