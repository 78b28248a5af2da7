"""Fixture conformance helpers: normalization + comparison semantics of
the reference test harness (test/support/helpers_test.exs:30-37,
fixture_case.exs:8-45)."""

from __future__ import annotations

import json
import re
from pathlib import Path

from readability_ex_spark.kernel import dom

_RE_WS = re.compile(r"\s+", re.A)
_RE_WS_CLOSE = re.compile(r"\s+</", re.A)
_RE_INTER_TAG_WS = re.compile(r">\s+<", re.A)

FIXTURES_DIR = Path("/root/reference/test/fixtures/readability-test-pages")

# NB the Mozilla expected.html files are beautified (indentation inserted
# between block-level tags by the test generator), so byte-level and even
# whitespace-collapsed comparison sees formatting, not content. We compare
# (a) html_strict — the reference harness normalizer (helpers_test.exs:30-37),
# (b) html — additionally canonicalizing inter-tag whitespace,
# (c) text — block-aware text extraction of both sides, collapsed.

_BLOCK_SEPARATED = frozenset(
    [
        "address", "article", "aside", "blockquote", "canvas", "details",
        "div", "dl", "dd", "dt", "fieldset", "figcaption", "figure",
        "footer", "form", "h1", "h2", "h3", "h4", "h5", "h6", "header",
        "hgroup", "hr", "li", "main", "menu", "nav", "ol", "p", "pre",
        "section", "table", "tbody", "td", "tfoot", "th", "thead", "tr",
        "ul", "caption", "br",
    ]
)


def normalize_html(html: str, strict: bool = False) -> str:
    """Whitespace-collapsing normalizer: parse -> serialize -> collapse."""
    rendered = dom.raw_html(dom.parse_fragment(html))
    rendered = _RE_WS.sub(" ", rendered)
    rendered = _RE_WS_CLOSE.sub("</", rendered)
    if not strict:
        rendered = _RE_INTER_TAG_WS.sub("><", rendered)
    return rendered.strip()


def normalize_text(text: str) -> str:
    return _RE_WS.sub(" ", text).strip()


def html_to_text(html: str) -> str:
    """textContent of an HTML string via our parser (golden text oracle)."""
    return dom.text(dom.parse_fragment(html))


def html_to_compare_text(html: str) -> str:
    """Block-aware text for symmetric comparison: a newline at every
    block-element boundary so beautifier-inserted inter-block whitespace
    in the goldens cannot create false diffs (both sides pass through
    this same function before normalize_text)."""
    out: list[str] = []

    def rec(node):
        if isinstance(node, str):
            out.append(node)
            return
        if isinstance(node, list):
            for c in node:
                rec(c)
            return
        if isinstance(node, dom.Element):
            if node.tag == "script":
                return
            block = node.tag in _BLOCK_SEPARATED
            if block:
                out.append("\n")
            for c in node.children:
                rec(c)
            if block:
                out.append("\n")

    rec(dom.parse_fragment(html))
    return "".join(out)


def load_fixture(fixture_id: str, base: Path = FIXTURES_DIR) -> dict:
    d = base / fixture_id
    return {
        "id": fixture_id,
        "source": (d / "source.html").read_text(encoding="utf-8", errors="replace"),
        "expected_html": (d / "expected.html").read_text(
            encoding="utf-8", errors="replace"
        ),
        "expected_meta": json.loads(
            (d / "expected-metadata.json").read_text(encoding="utf-8")
        ),
    }


def fixture_ids(base: Path = FIXTURES_DIR) -> list[str]:
    return sorted(p.name for p in base.iterdir() if p.is_dir())


def compare_fixture(result: dict, fix: dict) -> dict:
    """Run the reference's assertions; returns per-field pass booleans."""
    meta = fix["expected_meta"]
    checks = {}
    checks["html_strict"] = normalize_html(
        result["content"], strict=True
    ) == normalize_html(fix["expected_html"], strict=True)
    checks["html"] = normalize_html(result["content"]) == normalize_html(
        fix["expected_html"]
    )
    checks["text"] = normalize_text(
        html_to_compare_text(result["content"])
    ) == normalize_text(html_to_compare_text(fix["expected_html"]))
    checks["title"] = result["title"] == meta.get("title")
    checks["byline"] = result["byline"] == meta.get("byline")
    checks["lang"] = result["lang"] == meta.get("lang")
    checks["site_name"] = result["site_name"] == meta.get("siteName")
    checks["published_time"] = result["published_time"] == meta.get("publishedTime")
    if meta.get("dir"):
        checks["dir"] = result["dir"] == meta.get("dir")
    if meta.get("excerpt"):
        checks["excerpt"] = normalize_text(result["excerpt"] or "") == normalize_text(
            meta["excerpt"]
        )
    if meta.get("readerable"):
        checks["readerable"] = result["length"] > 0
    return checks
