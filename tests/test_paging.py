"""Paging: next-link scoring (kernel) and corpus self-join chaining
(mirrors the reference's paging_test.exs fake-fetcher scenario as a
batch self-join — SURVEY.md §2.A G1)."""

from __future__ import annotations

from readability_ex_spark.kernel import dom
from readability_ex_spark.kernel.paging import find_next_page_link
from readability_ex_spark.operators.paging import chain_pages, next_page_edges


def _page(n: int, total: int = 3) -> str:
    nxt = (
        f'<a rel="next" href="/art/page/{n + 1}">Next page</a>'
        if n < total
        else ""
    )
    prev = f'<a href="/art/page/{n - 1}">Previous</a>' if n > 1 else ""
    return (
        f"<html><body><article><p>page {n} body text, long enough, with "
        f"commas, to matter.</p>{prev}{nxt}</article></body></html>"
    )


def test_find_next_page_link_scoring():
    doc = dom.parse_document(_page(1))
    assert (
        find_next_page_link(doc, "http://s.test/art/page/1")
        == "http://s.test/art/page/2"
    )
    last = dom.parse_document(_page(3))
    assert find_next_page_link(last, "http://s.test/art/page/3") is None


def test_find_next_skips_visited_and_fragments():
    html = (
        '<html><body><a href="#next">next</a>'
        '<a rel="next" href="/p2">next</a></body></html>'
    )
    doc = dom.parse_document(html)
    assert find_next_page_link(doc, "http://s.test/") == "http://s.test/p2"
    assert (
        find_next_page_link(
            doc, "http://s.test/", frozenset(["http://s.test/p2"])
        )
        is None
    )


def test_chain_pages_self_join(spark):
    rows = [
        (f"http://s.test/art/page/{n}", None, _page(n).encode(), "t", "en")
        for n in (1, 2, 3)
    ] + [("http://s.test/other", None, _page(1, total=1).encode(), "t", "en")]
    pages = spark.createDataFrame(
        rows, schema="url string, warc_ts timestamp, html binary, text string, lang string"
    )
    edges = {r.url: r.next_url for r in next_page_edges(pages).collect()}
    assert edges["http://s.test/art/page/1"] == "http://s.test/art/page/2"
    assert edges["http://s.test/art/page/3"] is None

    chains = chain_pages(pages, max_pages=5).collect()
    art = sorted(
        (r.page_number, r.url)
        for r in chains
        if r.root_url == "http://s.test/art/page/1"
    )
    assert [u for _n, u in art] == [
        "http://s.test/art/page/1",
        "http://s.test/art/page/2",
        "http://s.test/art/page/3",
    ]


def test_kernel_emits_next_url_edges(spark):
    """The extraction kernel's next_url column matches the standalone
    edge derivation, and chain_pages accepts it directly (no second
    full-corpus parse)."""
    import pyspark.sql.functions as F

    from readability_ex_spark.pipeline import run_extraction

    rows = [
        (f"http://s.test/art/page/{n}", None, _page(n).encode(), "t", "en")
        for n in (1, 2, 3)
    ] + [("http://s.test/other", None, _page(1, total=1).encode(), "t", "en")]
    pages = spark.createDataFrame(
        rows, schema="url string, warc_ts timestamp, html binary, text string, lang string"
    )
    extracted = run_extraction(pages).cache()
    kernel_edges = {r.url: r.next_url for r in extracted.select("url", "next_url").collect()}
    derived = {r.url: r.next_url for r in next_page_edges(pages).collect()}
    assert kernel_edges == derived

    chains = chain_pages(
        pages, max_pages=5, edges=extracted.select("url", "next_url")
    ).collect()
    art = sorted(
        (r.page_number, r.url)
        for r in chains
        if r.root_url == "http://s.test/art/page/1"
    )
    assert [u for _n, u in art] == [
        "http://s.test/art/page/1",
        "http://s.test/art/page/2",
        "http://s.test/art/page/3",
    ]
    extracted.unpersist()


def test_assemble_articles_reference_semantics(spark):
    """3-page chain merges into one article with the reference's
    wrap_page/update_result semantics (paging.ex:119-156): numbered
    page divs in chain order, text = raw text-node concat, length =
    its character count."""
    import pyspark.sql.functions as F

    from readability_ex_spark.operators.paging import assemble_articles
    from readability_ex_spark.pipeline import run_extraction

    rows = [
        (f"http://s.test/art/page/{n}", None, _page(n).encode(), "t", "en")
        for n in (1, 2, 3)
    ]
    pages = spark.createDataFrame(
        rows,
        schema="url string, warc_ts timestamp, html binary, text string, lang string",
    )
    chains = chain_pages(pages, max_pages=5)
    extracted = run_extraction(pages).filter(F.col("status") == "ok")
    merged = assemble_articles(chains, extracted).collect()
    assert len(merged) == 1
    art = merged[0]
    assert art.root_url == "http://s.test/art/page/1" and art.n_pages == 3

    # outer wrappers appear in order. NB each page's own parse already
    # wraps its content in an inner readability-page-1 div (JS emits one
    # around every single-document result), and the reference's
    # wrap_page wraps that again — so page-1 divs appear 1 outer +
    # 3 inner times, pages 2/3 exactly once (their outer wrapper).
    assert (
        art.content.count('<div id="readability-page-1" class="page">') == 4
    )
    for n in (2, 3):
        assert (
            art.content.count(f'<div id="readability-page-{n}" class="page">')
            == 1
        )
    assert art.content.index("readability-page-1") < art.content.index(
        "readability-page-2"
    ) < art.content.index("readability-page-3")
    # every page's body text present, in page order
    idx = [art.text.index(f"page {n} body text") for n in (1, 2, 3)]
    assert idx == sorted(idx)
    # update_result: text is the raw text of the assembly; length matches
    from readability_ex_spark.kernel import dom

    assert art.text == dom.text(dom.parse_fragment(art.content))
    assert art.length == len(art.text)


def test_assemble_articles_skips_failed_pages(spark):
    """A mid-chain page with no extractable content is skipped and later
    pages renumber (the reference numbers successful pages only)."""
    import pyspark.sql.functions as F

    from readability_ex_spark.operators.paging import assemble_articles

    chains = spark.createDataFrame(
        [("r", "r", 1), ("r", "p2", 2), ("r", "p3", 3)],
        "root_url string, url string, page_number int",
    )
    extracted = spark.createDataFrame(
        [("r", "<p>one</p>"), ("p2", None), ("p3", "<p>three</p>")],
        "url string, content_html string",
    )
    merged = assemble_articles(chains, extracted).collect()
    assert len(merged) == 1
    art = merged[0]
    assert art.n_pages == 2
    assert '<div id="readability-page-1" class="page"><p>one</p></div>' in art.content
    assert '<div id="readability-page-2" class="page"><p>three</p></div>' in art.content
    assert art.text == "onethree" and art.length == 8

    # a chain whose ROOT page failed produces no article
    chains2 = spark.createDataFrame(
        [("r2", "r2", 1), ("r2", "q2", 2)],
        "root_url string, url string, page_number int",
    )
    extracted2 = spark.createDataFrame(
        [("r2", None), ("q2", "<p>two</p>")], "url string, content_html string"
    )
    assert assemble_articles(chains2, extracted2).count() == 0
