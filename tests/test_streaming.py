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


def test_stream_dedup_first_seen_across_batches(spark, tmpdir):
    """Cross-batch stateful url dedup (applyInPandasWithState): each url
    is emitted exactly once over the stream's lifetime, the earliest
    warc_ts row winning within its arrival batch."""
    import datetime as dt

    from readability_ex_spark.sources.pages import PAGES_SCHEMA
    from readability_ex_spark.streaming import stream_dedup_first_seen

    def ts(h):
        return dt.datetime(2026, 1, 1, h)

    indir = tmpdir / "pages_in"
    b1 = spark.createDataFrame(
        [
            ("http://a", ts(5), b"<p>a5</p>", "t", "en"),
            ("http://b", ts(1), b"<p>b</p>", "t", "en"),
            ("http://a", ts(2), b"<p>a2</p>", "t", "en"),
        ],
        PAGES_SCHEMA,
    )
    b2 = spark.createDataFrame(
        [
            ("http://a", ts(9), b"<p>a9</p>", "t", "en"),  # revisit
            ("http://c", ts(3), b"<p>c</p>", "t", "en"),
        ],
        PAGES_SCHEMA,
    )
    b1.coalesce(1).write.mode("append").parquet(str(indir))
    b2.coalesce(1).write.mode("append").parquet(str(indir))

    stream = (
        spark.readStream.schema(PAGES_SCHEMA)
        .option("maxFilesPerTrigger", 1)  # force >= 2 micro-batches
        .parquet(str(indir))
    )
    q = (
        stream_dedup_first_seen(stream, state_ttl_ms=3_600_000)
        .writeStream.format("memory")
        .queryName("first_seen_test")
        .outputMode("update")
        .option("checkpointLocation", str(tmpdir / "ckpt_fs"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    rows = spark.sql("select url, warc_ts from first_seen_test").collect()
    by_url = {}
    for r in rows:
        by_url.setdefault(r.url, []).append(r.warc_ts)
    # exactly one emission per url across both micro-batches
    assert {u: len(v) for u, v in by_url.items()} == {
        "http://a": 1, "http://b": 1, "http://c": 1,
    }
    # within a's arrival batch the earliest warc_ts row won (ts 2 of
    # {5, 2} if batch1 arrived first; ts 9 only if batch2 led)
    assert by_url["http://a"][0] in (ts(2), ts(9))
    assert by_url["http://b"] == [ts(1)]


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


def test_batch_and_stream_tiebreak_agree(spark, tmpdir):
    """On a warc_ts tie the batch dedup (dedup_latest_crawl) and the
    streaming dedup (stream_dedup_first_seen) must keep the SAME row —
    both use html_tiebreak (ascending payload md5, null -> '') so a
    streaming run and its batch backfill agree."""
    import datetime as dt

    from readability_ex_spark.pipeline import dedup_latest_crawl
    from readability_ex_spark.sources.pages import PAGES_SCHEMA
    from readability_ex_spark.streaming import stream_dedup_first_seen

    t = dt.datetime(2026, 1, 1, 12)
    tied = [
        ("http://tie", t, b"<p>payload one</p>", "t", "en"),
        ("http://tie", t, b"<p>payload two</p>", "t", "en"),
        ("http://tie", t, b"<p>payload three</p>", "t", "en"),
    ]
    batch_df = spark.createDataFrame(tied, PAGES_SCHEMA)
    batch_winner = dedup_latest_crawl(batch_df).collect()
    assert len(batch_winner) == 1

    indir = tmpdir / "tie_in"
    batch_df.coalesce(1).write.mode("overwrite").parquet(str(indir))
    stream = spark.readStream.schema(PAGES_SCHEMA).parquet(str(indir))
    q = (
        stream_dedup_first_seen(stream)
        .writeStream.format("memory")
        .queryName("tie_test")
        .outputMode("update")
        .option("checkpointLocation", str(tmpdir / "ckpt_tie"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    stream_winner = spark.sql("select * from tie_test").collect()
    assert len(stream_winner) == 1
    assert bytes(stream_winner[0].html) == bytes(batch_winner[0].html)


def test_tiebreak_helpers_identical_ordering(spark):
    """html_tiebreak_py is byte-for-byte the pandas twin of
    html_tiebreak_col (incl. the null -> '' convention)."""
    from readability_ex_spark.pipeline import html_tiebreak_col, html_tiebreak_py

    payloads = [b"<p>a</p>", b"", None, b"\xff\xfe binary"]
    df = spark.createDataFrame(
        [(i, p) for i, p in enumerate(payloads)], "i int, html binary"
    )
    jvm = {
        r.i: r.h
        for r in df.select("i", html_tiebreak_col().alias("h")).collect()
    }
    for i, p in enumerate(payloads):
        assert html_tiebreak_py(p) == jvm[i]


def test_stream_dedup_event_time_late_and_eviction(spark, tmpdir):
    """Event-time stateful dedup: (1) a LATE-but-within-watermark
    re-crawl of a seen url is dropped; (2) once the warc_ts watermark
    passes a url's retention horizon its state evicts, so a much-later
    re-crawl is emitted again (a fresh crawl cycle)."""
    import datetime as dt
    import time

    from readability_ex_spark.sources.pages import PAGES_SCHEMA
    from readability_ex_spark.streaming import (
        stream_dedup_first_seen_event_time,
    )

    t0 = dt.datetime(2026, 1, 1, 12)

    def days(n, h=0):
        return t0 + dt.timedelta(days=n, hours=h)

    indir = tmpdir / "et_in"
    batches = [
        # b1: first sightings
        [("http://a", t0, b"<p>a-first</p>", "t", "en"),
         ("http://b", t0, b"<p>b</p>", "t", "en")],
        # b2: late-but-within-watermark dup of a (1h earlier) + fresh c
        [("http://a", days(0, -1), b"<p>a-late-dup</p>", "t", "en"),
         ("http://c", days(0, 1), b"<p>c</p>", "t", "en")],
        # b3: advance the watermark far past a's retention (1 day)
        [("http://d", days(10), b"<p>d</p>", "t", "en")],
        # b4: watermark (computed at b3's end) now exceeds a's timeout ->
        # a evicts during this batch; e just carries the stream forward
        [("http://e", days(10, 1), b"<p>e</p>", "t", "en")],
        # b5: a re-crawled a cycle later -> state was evicted -> re-emit
        [("http://a", days(10, 2), b"<p>a-second-cycle</p>", "t", "en")],
    ]
    for rows in batches:
        spark.createDataFrame(rows, PAGES_SCHEMA).coalesce(1).write.mode(
            "append"
        ).parquet(str(indir))
        time.sleep(1.1)  # distinct mtimes => deterministic file order

    stream = (
        spark.readStream.schema(PAGES_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(indir))
    )
    q = (
        stream_dedup_first_seen_event_time(
            stream, watermark="2 hours", retention_ms=24 * 3_600_000
        )
        .writeStream.format("memory")
        .queryName("et_dedup_test")
        .outputMode("update")
        .option("checkpointLocation", str(tmpdir / "ckpt_et"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    rows = spark.sql("select url, html from et_dedup_test").collect()
    by_url = {}
    for r in rows:
        by_url.setdefault(r.url, []).append(bytes(r.html))
    # late dup within the watermark dropped: a emitted once per CYCLE
    assert by_url["http://a"] == [b"<p>a-first</p>", b"<p>a-second-cycle</p>"]
    # everything else exactly once
    assert {u: len(v) for u, v in by_url.items()} == {
        "http://a": 2, "http://b": 1, "http://c": 1,
        "http://d": 1, "http://e": 1,
    }


def test_stream_extraction_quality_stage_matches_batch(spark, tmpdir):
    """Stateless corpus-safety stages in the stream produce exactly the
    batch verdicts: the survivors equal the batch-side quality filter."""
    from readability_ex_spark.operators.corpus import with_quality_rules
    from readability_ex_spark.pipeline import run_extraction

    pages = synthesize_pages(spark, "/root/testdata/sf0.001").limit(60)
    pages.write.mode("overwrite").parquet(str(tmpdir / "pages_q"))

    q = stream_extraction(
        spark,
        str(tmpdir / "pages_q"),
        str(tmpdir / "out_q"),
        str(tmpdir / "ckpt_q"),
        available_now=True,
        quality_rules=True,
        scrub_pii_text=True,
    )
    q.awaitTermination(300)
    streamed = spark.read.parquet(str(tmpdir / "out_q"))

    batch = run_extraction(pages, dedup=True)
    from readability_ex_spark.operators.pii import scrub_pii

    batch = (
        scrub_pii(batch).drop("text").withColumnRenamed("text_scrubbed", "text")
    )
    expect_keep = {
        r.url
        for r in with_quality_rules(batch)
        .filter((F.col("status") != "ok") | F.col("passes_quality"))
        .select("url")
        .collect()
    }
    got = {r.url for r in streamed.select("url").collect()}
    assert got == expect_keep
    assert 0 < len(got) < pages.select("url").distinct().count()


def test_stream_extraction_canonical_and_blocklist_match_batch(
    spark, tmpdir
):
    """canonical_urls + blocklist in the stream produce exactly the
    batch pipeline's surviving canonical urls."""
    from readability_ex_spark.operators.urlops import canonicalize_url
    from readability_ex_spark.operators.wordlist import wordlist_hits
    from readability_ex_spark.pipeline import run_extraction

    pages = synthesize_pages(spark, "/root/testdata/sf0.001").limit(60)
    # re-spell some urls with tracking params so canonicalization has
    # real collapsing to do inside the stream
    respelled = pages.withColumn(
        "url",
        F.when(
            F.xxhash64("url") % 2 == 0,
            F.concat(F.col("url"), F.lit("?utm_source=feed")),
        ).otherwise(F.col("url")),
    )
    respelled.write.mode("overwrite").parquet(str(tmpdir / "pages_cb"))

    words = ("dup", "casino")
    q = stream_extraction(
        spark,
        str(tmpdir / "pages_cb"),
        str(tmpdir / "out_cb"),
        str(tmpdir / "ckpt_cb"),
        available_now=True,
        canonical_urls=True,
        blocklist=words,
    )
    q.awaitTermination(300)
    streamed = spark.read.parquet(str(tmpdir / "out_cb"))

    batch = run_extraction(
        respelled.withColumn("url", canonicalize_url(F.col("url"))),
        dedup=True,
    )
    flagged = wordlist_hits(batch, words=words, id_col="url").filter(
        "flagged"
    )
    expect = {
        r.url
        for r in batch.join(flagged.select("url"), "url", "left_anti")
        .select("url")
        .collect()
    }
    got = {r.url for r in streamed.select("url").collect()}
    assert got == expect
    assert 0 < len(got)
    # the tracking-param respellings never reach the output
    assert not any("utm_source" in u for u in got)


def test_stream_extraction_respect_robots_matches_batch(spark, tmpdir):
    """respect_robots in the stream produces exactly the batch
    policy_filter verdict: flagged pages never ship, undeclared ones
    do (NULL flags = permissive, per the Robots Exclusion Protocol)."""
    from readability_ex_spark.operators.policyops import policy_filter
    from readability_ex_spark.pipeline import run_extraction

    # synthesize_pages injects <meta name=robots> for doc_id%53 in
    # {13: noindex+noarchive, 29: noai}, so the stream has real policy
    # work to do
    pages = synthesize_pages(spark, "/root/testdata/sf0.001").limit(120)
    pages.write.mode("overwrite").parquet(str(tmpdir / "pages_rb"))

    q = stream_extraction(
        spark,
        str(tmpdir / "pages_rb"),
        str(tmpdir / "out_rb"),
        str(tmpdir / "ckpt_rb"),
        available_now=True,
        respect_robots=True,
    )
    q.awaitTermination(300)
    streamed = spark.read.parquet(str(tmpdir / "out_rb"))

    expect = {
        r.url
        for r in policy_filter(run_extraction(pages, dedup=True))
        .select("url")
        .collect()
    }
    got = {r.url for r in streamed.select("url").collect()}
    assert got == expect
    ids = [int(u.rsplit("/", 1)[1]) for u in got]
    assert ids and all(d % 53 not in (13, 29) for d in ids)
    # and the filter really dropped something (flagged ids existed)
    dropped = {
        int(r.url.rsplit("/", 1)[1])
        for r in pages.select("url").collect()
    } - set(ids)
    assert any(d % 53 in (13, 29) for d in dropped)


def test_stream_extraction_robots_txt_matches_batch(spark, tmpdir):
    """robots_txt_path in the stream produces exactly the batch
    robots_filter verdict on each page's url."""
    from readability_ex_spark.operators.robotstxt import (
        parse_robots,
        robots_filter,
    )
    from readability_ex_spark.pipeline import run_extraction

    pages = synthesize_pages(spark, "/root/testdata/sf0.001").limit(90)
    pages.write.mode("overwrite").parquet(str(tmpdir / "pages_rt"))
    robots = spark.createDataFrame(
        [("synth.test", "User-agent: *\nDisallow: /doc/1*\n")],
        "host string, robots_txt string",
    )
    robots.write.mode("overwrite").parquet(str(tmpdir / "robots_rt"))

    q = stream_extraction(
        spark,
        str(tmpdir / "pages_rt"),
        str(tmpdir / "out_rt"),
        str(tmpdir / "ckpt_rt"),
        available_now=True,
        robots_txt_path=str(tmpdir / "robots_rt"),
    )
    q.awaitTermination(300)
    got = {
        r.url
        for r in spark.read.parquet(str(tmpdir / "out_rt"))
        .select("url")
        .collect()
    }
    expect = {
        r.url
        for r in robots_filter(
            run_extraction(pages, dedup=True), parse_robots(robots)
        )
        .select("url")
        .collect()
    }
    assert got == expect
    assert got and not any(
        u.rsplit("/", 1)[1].startswith("1") for u in got
    )


def test_stream_extraction_host_rank_floor(spark, tmpdir):
    """A batch-computed _hostrank artifact consumed as a static side
    input: streamed pages on the low-ranked host are dropped, the rest
    flow through."""
    pages = synthesize_pages(spark, "/root/testdata/sf0.001").limit(40)
    pages.write.mode("overwrite").parquet(str(tmpdir / "pages_hr"))
    # the batch build ranked synth.test well and lowhost.test poorly
    spark.createDataFrame(
        [("synth.test", 0.9), ("lowhost.test", 0.05), ("mid.test", 0.4)],
        "host string, rank double",
    ).write.mode("overwrite").parquet(str(tmpdir / "hostrank"))

    q = stream_extraction(
        spark,
        str(tmpdir / "pages_hr"),
        str(tmpdir / "out_hr"),
        str(tmpdir / "ckpt_hr"),
        available_now=True,
        hostrank_path=str(tmpdir / "hostrank"),
        host_rank_floor=0.34,
    )
    q.awaitTermination(300)
    out = spark.read.parquet(str(tmpdir / "out_hr"))
    # synth.test sits above the floor -> everything survives
    assert out.count() == pages.select("url").distinct().count()

    # same stream with the floor above synth.test's rank: all dropped
    spark.createDataFrame(
        [("synth.test", 0.05), ("good.test", 0.9), ("best.test", 0.95)],
        "host string, rank double",
    ).write.mode("overwrite").parquet(str(tmpdir / "hostrank2"))
    q2 = stream_extraction(
        spark,
        str(tmpdir / "pages_hr"),
        str(tmpdir / "out_hr2"),
        str(tmpdir / "ckpt_hr2"),
        available_now=True,
        hostrank_path=str(tmpdir / "hostrank2"),
        host_rank_floor=0.34,
    )
    q2.awaitTermination(300)
    # all rows cut: no data files land (the dir may exist but empty)
    import glob as _glob

    assert not _glob.glob(
        str(tmpdir / "out_hr2" / "**" / "part-*.parquet"), recursive=True
    )
