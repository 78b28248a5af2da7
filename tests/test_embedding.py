"""Hashing-trick text_embedding operator + end-to-end embedding dedup."""

from __future__ import annotations

import math

import pyspark.sql.functions as F
import pytest

from readability_ex_spark.operators.embedding import (
    TEXT_EMB_DIM,
    text_embedding,
)


def _docs_df(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_text_embedding_shape_and_norm(spark):
    df = _docs_df(
        spark,
        [
            (1, "the quick brown fox jumps over the lazy dog"),
            (2, ""),
            (3, "   "),
            (4, None),
            (5, "single"),
        ],
    )
    out = {r.doc_id: r.embedding for r in text_embedding(df).collect()}
    assert set(out) == {1, 2, 3, 4, 5}
    for v in out.values():
        assert len(v) == TEXT_EMB_DIM
    # non-empty text -> unit vector
    assert math.isclose(sum(x * x for x in out[1]), 1.0, rel_tol=1e-9)
    # empty / whitespace / null text -> all-zero vector (never null)
    for d in (2, 3, 4):
        assert out[d] == [0.0] * TEXT_EMB_DIM
    # deterministic across runs
    again = {r.doc_id: r.embedding for r in text_embedding(df).collect()}
    assert again == out


def test_text_embedding_similarity_orders_correctly(spark):
    base = " ".join(f"word{i}" for i in range(50))
    df = _docs_df(
        spark,
        [
            (1, base),
            (2, base + " extra tail tokens here"),  # near-dup of 1
            (3, " ".join(f"other{i}" for i in range(50))),  # unrelated
        ],
    )
    out = {r.doc_id: r.embedding for r in text_embedding(df).collect()}

    def cos(a, b):
        return sum(x * y for x, y in zip(a, b))  # unit vectors

    assert cos(out[1], out[2]) > 0.9
    assert cos(out[1], out[2]) > cos(out[1], out[3])
    assert cos(out[1], out[3]) < 0.8


def test_text_embedding_dim_bounds(spark):
    df = _docs_df(spark, [(1, "a b")])
    with pytest.raises(ValueError):
        text_embedding(df, dim=257)
    out = text_embedding(df, dim=8).head()
    assert len(out.embedding) == 8


def test_prepare_corpus_embedding_stage(spark):
    """The optional emb_near_dup_threshold stage drops a paraphrase-level
    duplicate that survives token-level dedup."""
    from readability_ex_spark.operators.corpus import prepare_training_corpus
    from readability_ex_spark.sources.pages import synthesize_pages

    pages = synthesize_pages(spark, "/root/testdata/sf0.001").limit(40)
    # token-level near-dup of doc/1's page under a new url: same text
    # plus a distinct tail — high embedding cosine, below-exact identity
    victim = pages.filter(F.col("url") == "http://synth.test/doc/1")
    near = victim.withColumn(
        "url", F.lit("http://synth.test/doc/1-para")
    ).withColumn(
        "html",
        F.regexp_replace(
            F.col("html").cast("string"),
            "</article>",
            "<p>tiny appended paragraph of filler words</p></article>",
        ).cast("binary"),
    )
    both = pages.unionByName(near)
    # with the embedding stage OFF and token near-dup off, both survive
    base = prepare_training_corpus(both, near_dup_threshold=None)
    base_urls = {r.url for r in base.select("url").collect()}
    assert {"http://synth.test/doc/1", "http://synth.test/doc/1-para"} <= base_urls
    # with the embedding stage ON, exactly one of the pair survives
    deduped = prepare_training_corpus(
        both, near_dup_threshold=None, emb_near_dup_threshold=0.9
    )
    dd_urls = {r.url for r in deduped.select("url").collect()}
    assert ("http://synth.test/doc/1" in dd_urls) != (
        "http://synth.test/doc/1-para" in dd_urls
    )
    # only embedding-near-dup members were dropped (the synthetic corpus
    # carries its own near-dup families, so more than the planted pair
    # may go — but never the bulk of the corpus)
    assert dd_urls < base_urls
    assert len(base_urls) - len(dd_urls) <= 5


def test_prepare_corpus_semantic_dedup_stage(spark):
    """The SemDeDup stage drops one member of a paraphrase pair (same
    planted setup as the LSH stage test) and keeps the corpus bulk."""
    from readability_ex_spark.operators.corpus import prepare_training_corpus
    from readability_ex_spark.sources.pages import synthesize_pages

    pages = synthesize_pages(spark, "/root/testdata/sf0.001").limit(40)
    victim = pages.filter(F.col("url") == "http://synth.test/doc/1")
    near = victim.withColumn(
        "url", F.lit("http://synth.test/doc/1-para")
    ).withColumn(
        "html",
        F.regexp_replace(
            F.col("html").cast("string"),
            "</article>",
            "<p>tiny appended paragraph of filler words</p></article>",
        ).cast("binary"),
    )
    both = pages.unionByName(near)
    base = prepare_training_corpus(both, near_dup_threshold=None)
    base_urls = {r.url for r in base.select("url").collect()}
    deduped = prepare_training_corpus(
        both, near_dup_threshold=None, semantic_dedup_threshold=0.9
    )
    dd_urls = {r.url for r in deduped.select("url").collect()}
    # exactly one of the planted pair survives (the kept one is the
    # farthest-from-centroid member, whichever that is)
    assert ("http://synth.test/doc/1" in dd_urls) != (
        "http://synth.test/doc/1-para" in dd_urls
    )
    assert dd_urls < base_urls
    assert len(base_urls) - len(dd_urls) <= 5


def test_semantic_dedup_drops_deterministic(spark):
    """Two invocations return the same drop set (sample ordering and
    k-means training are deterministic)."""
    from readability_ex_spark.operators.corpus import semantic_dedup_drops
    from readability_ex_spark.sources.pages import synthesize_pages
    from readability_ex_spark.pipeline import flagship_extract

    corpus = (
        flagship_extract(spark, "/root/testdata/sf0.001")
        .filter(F.col("status") == "ok")
        .select("url", "text")
        .limit(60)
    ).localCheckpoint()
    a = {r.url for r in semantic_dedup_drops(corpus, 0.85).collect()}
    b = {r.url for r in semantic_dedup_drops(corpus, 0.85).collect()}
    assert a == b
