"""Next-page link discovery (reference: paging.ex).

The reference fetches next pages through a per-document callback
(paging.ex:31-38) — impossible inside a Spark UDF (no network). The
Spark-native shape (SURVEY.md §2.A G1 note): this module only *scores*
the best next-page link per document; the pipeline materializes a
(url, next_url) edge column and chains multi-page articles with an
iterative self-join against the corpus table
(operators/paging.py:chain_pages)."""

from __future__ import annotations

import re

from readability_ex_spark.kernel import dom
from readability_ex_spark.kernel.constants import RE_NEXT_LINK, RE_PREV_LINK
from readability_ex_spark.kernel.cleaner import _to_abs

_RE_SKIP = re.compile(r"^(mailto|tel|data|javascript|about):", re.I)
_RE_WS = re.compile(r"\s+", re.A)


def find_next_page_link(
    doc, base_uri: str | None, visited: frozenset | None = None
) -> str | None:
    """Highest-scoring next-page candidate (paging.ex:68-117):
    rel~next +50; NEXT_LINK regex on text or class/id +25; PREV_LINK
    -50; fragments/protocol-schemes skipped; score must be > 0."""
    visited = visited or frozenset()
    best_score = None
    best_href = None
    for link in dom.find(doc, "a[href]"):
        href = link.attr("href")
        if href == "" or href.startswith("#") or _RE_SKIP.match(href):
            continue
        text = _RE_WS.sub(" ", dom.text(link).strip()).lower()
        rel = link.attr("rel").lower()
        match_string = (link.attr("class") + " " + link.attr("id")).lower()
        score = 50 if "next" in rel else 0
        if RE_NEXT_LINK.search(text) or RE_NEXT_LINK.search(match_string):
            score += 25
        if RE_PREV_LINK.search(text) or RE_PREV_LINK.search(match_string):
            score -= 50
        abs_href = _to_abs(href, base_uri) if base_uri else href
        if abs_href in visited:
            continue
        if best_score is None or score > best_score:
            best_score, best_href = score, abs_href
    if best_score is not None and best_score > 0:
        return best_href
    return None


def next_page_of(html: str | bytes, url: str) -> str | None:
    """Convenience: parse + score in one call (used by the pipeline UDF)."""
    if isinstance(html, (bytes, bytearray)):
        html = html.decode("utf-8", errors="replace")
    return find_next_page_link(dom.parse_document(html), url)
