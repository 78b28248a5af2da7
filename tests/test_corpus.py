"""Composed training-corpus flow: extraction -> dedup -> quality."""

from __future__ import annotations

import pyspark.sql.functions as F

from readability_ex_spark.operators.corpus import (
    dedup_keep_manifest,
    near_dup_pairs,
    prepare_training_corpus,
)
from readability_ex_spark.sources.pages import synthesize_pages


def test_prepare_training_corpus(spark):
    pages = synthesize_pages(spark, "/root/testdata/sf0.001")
    # inject an exact duplicate page under a different url
    dup = pages.filter(F.col("url") == "http://synth.test/doc/1").withColumn(
        "url", F.lit("http://synth.test/doc/1-copy")
    )
    corpus = prepare_training_corpus(
        pages.unionByName(dup), near_dup_threshold=None
    ).cache()

    urls = {r.url for r in corpus.select("url").collect()}
    # exactly one of the duplicate pair survives (min url = canonical)
    assert ("http://synth.test/doc/1" in urls) != (
        "http://synth.test/doc/1-copy" in urls
    )
    row = corpus.head()
    assert 0.0 <= row.quality_score <= 1.0 and row.n_tokens > 0
    dupe_group = corpus.filter(F.col("n_copies") > 1)
    assert dupe_group.count() >= 1

    # default mode additionally drops near-dup cluster members: the
    # result is a subset of the exact-only corpus, still one per
    # exact group
    nd_corpus = prepare_training_corpus(pages.unionByName(dup)).cache()
    nd_urls = {r.url for r in nd_corpus.select("url").collect()}
    assert nd_urls <= urls
    assert not (
        "http://synth.test/doc/1" in nd_urls
        and "http://synth.test/doc/1-copy" in nd_urls
    )


def test_dedup_keep_manifest_chain_and_dropped_bucket(spark):
    base = " ".join(f"w{i}" for i in range(20))
    rows = [
        # near-dup (not exact) chain a-b-c: J(a,b)=20/24, J(b,c)=24/28
        # both >= 0.8; J(a,c)=20/28 < 0.8 — only clustering keeps one
        ("http://s/a", base),
        ("http://s/b", base + " e1 e2 e3 e4"),
        ("http://s/c", base + " e1 e2 e3 e4 f1 f2 f3 f4"),
    ] + [
        # planted boilerplate family LARGER than the LSH bucket cap:
        # without the exact-collapse-first ordering these would all be
        # dropped from near-dup coverage
        (f"http://boiler/{i:02d}", "parked domain lorem ipsum dolor " * 5)
        for i in range(30)
    ]
    extracted = spark.createDataFrame(rows, "url string, text string")
    m = dedup_keep_manifest(extracted, max_bucket=10).cache()

    boiler = m.filter(F.col("url").startswith("http://boiler/"))
    assert boiler.count() == 30
    # all 30 resolve to ONE canonical despite exceeding the bucket cap
    assert boiler.filter(F.col("keep")).count() == 1
    assert boiler.select("canonical_url").distinct().count() == 1

    chain = {
        r.url: (r.canonical_url, r.keep)
        for r in m.filter(F.col("url").startswith("http://s/")).collect()
    }
    assert [u for u, (_, k) in sorted(chain.items()) if k] == ["http://s/a"]
    assert all(c == "http://s/a" for c, _ in chain.values())


def test_near_dup_pairs_on_extracted(spark):
    pages = synthesize_pages(spark, "/root/testdata/sf0.001").limit(80)
    from readability_ex_spark.pipeline import run_extraction

    extracted = run_extraction(pages).filter(F.col("status") == "ok")
    pairs = near_dup_pairs(extracted)
    # deterministic candidate set; each pair ordered url_a < url_b
    rows = pairs.collect()
    assert all(r.url_a < r.url_b for r in rows)
