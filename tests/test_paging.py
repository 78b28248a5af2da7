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
