"""Kernel policy harvest (meta robots / license links) + the pipeline
plumbing that surfaces it as EXTRACT_SCHEMA columns."""

from __future__ import annotations

from readability_ex_spark.kernel import dom
from readability_ex_spark.kernel.policy import extract_policy


def _policy(html: str) -> dict:
    return extract_policy(dom.parse_document(html))


def test_robots_directives_parsed():
    p = _policy(
        "<html><head>"
        '<meta name="robots" content="noindex, noarchive"/>'
        "</head><body><p>x</p></body></html>"
    )
    assert p["robots_noindex"] is True
    assert p["robots_noarchive"] is True
    assert p["robots_noai"] is False
    assert p["license_url"] is None


def test_robots_none_implies_noindex():
    p = _policy('<html><head><meta name="robots" content="none"/></head></html>')
    assert p["robots_noindex"] is True
    assert p["robots_noarchive"] is False


def test_robots_noai_variants_and_case():
    assert _policy(
        '<html><head><meta name="ROBOTS" content="NoAI"/></head></html>'
    )["robots_noai"] is True
    assert _policy(
        '<html><head><meta name="robots" content="noimageai"/></head></html>'
    )["robots_noai"] is True


def test_non_robots_meta_ignored():
    p = _policy(
        '<html><head><meta name="googlebot-news" content="noindex"/>'
        '<meta name="description" content="noindex noarchive"/></head></html>'
    )
    assert p["robots_noindex"] is False
    assert p["robots_noarchive"] is False


def test_rel_license_link():
    p = _policy(
        "<html><head>"
        '<link rel="license" href="https://example.com/terms"/>'
        "</head><body></body></html>"
    )
    assert p["license_url"] == "https://example.com/terms"


def test_rel_license_anchor_token_list():
    p = _policy(
        "<html><body>"
        '<a rel="nofollow license" href="/license.html">license</a>'
        "</body></html>"
    )
    assert p["license_url"] == "/license.html"


def test_cc_url_fallback_without_rel():
    p = _policy(
        "<html><body>"
        '<a href="https://creativecommons.org/licenses/by-sa/4.0/">CC</a>'
        "</body></html>"
    )
    assert p["license_url"] == "https://creativecommons.org/licenses/by-sa/4.0/"


def test_rel_license_wins_over_cc_fallback():
    p = _policy(
        "<html><head>"
        '<link rel="license" href="https://example.com/eula"/>'
        '</head><body><a href="https://creativecommons.org/licenses/by/4.0/">'
        "cc</a></body></html>"
    )
    assert p["license_url"] == "https://example.com/eula"


def test_undeclared_page_is_permissive():
    p = _policy("<html><head><title>t</title></head><body><p>x</p></body></html>")
    assert p == {
        "robots_noindex": False,
        "robots_noarchive": False,
        "robots_noai": False,
        "license_url": None,
    }


def test_pipeline_emits_policy_columns(spark):
    """The mapInPandas kernel surfaces the flags for every parsed page,
    and synthesize_pages' deterministic tags land on the right docs."""
    from pyspark.sql import functions as F

    from readability_ex_spark.pipeline import run_extraction
    from readability_ex_spark.sources.pages import synthesize_pages

    pages = synthesize_pages(spark, "/root/testdata/sf0.001")
    out = run_extraction(pages, n_partitions=4).filter("status = 'ok'")
    rows = {
        int(r.url.rsplit("/", 1)[1]): r
        for r in out.select(
            "url",
            "robots_noindex",
            "robots_noarchive",
            "robots_noai",
            "license_url",
        ).collect()
    }
    assert rows
    hit = [d for d in rows if d % 53 == 13]
    noai = [d for d in rows if d % 53 == 29]
    lic = [d for d in rows if d % 29 == 3]
    assert hit and noai and lic  # the sf table is big enough
    for d, r in rows.items():
        assert r.robots_noindex is (d % 53 == 13)
        assert r.robots_noarchive is (d % 53 == 13)
        assert r.robots_noai is (d % 53 == 29)
        if d % 29 == 3:
            assert r.license_url == (
                "https://creativecommons.org/licenses/by/4.0/"
            )
        else:
            assert r.license_url is None


def test_respect_robots_in_composition(spark):
    """prepare_training_corpus(respect_robots=True) ships no flagged
    page and keeps undeclared ones."""
    from pyspark.sql import functions as F

    from readability_ex_spark.operators.corpus import prepare_training_corpus
    from readability_ex_spark.sources.pages import synthesize_pages

    pages = synthesize_pages(spark, "/root/testdata/sf0.001")
    corpus = prepare_training_corpus(
        pages, respect_robots=True, near_dup_threshold=None, n_partitions=4
    )
    ids = [
        int(r.url.rsplit("/", 1)[1]) for r in corpus.select("url").collect()
    ]
    assert ids
    assert all(d % 53 not in (13, 29) for d in ids)
