"""Composed training-corpus flow: extraction -> dedup -> quality."""

from __future__ import annotations

import pyspark.sql.functions as F

from readability_ex_spark.operators.corpus import (
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
    corpus = prepare_training_corpus(pages.unionByName(dup)).cache()

    urls = {r.url for r in corpus.select("url").collect()}
    # exactly one of the duplicate pair survives (min url = canonical)
    assert ("http://synth.test/doc/1" in urls) != (
        "http://synth.test/doc/1-copy" in urls
    )
    row = corpus.head()
    assert 0.0 <= row.quality_score <= 1.0 and row.n_tokens > 0
    dupe_group = corpus.filter(F.col("n_copies") > 1)
    assert dupe_group.count() >= 1


def test_near_dup_pairs_on_extracted(spark):
    pages = synthesize_pages(spark, "/root/testdata/sf0.001").limit(80)
    from readability_ex_spark.pipeline import run_extraction

    extracted = run_extraction(pages).filter(F.col("status") == "ok")
    pairs = near_dup_pairs(extracted)
    # deterministic candidate set; each pair ordered url_a < url_b
    rows = pairs.collect()
    assert all(r.url_a < r.url_b for r in rows)
