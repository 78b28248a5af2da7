"""Block-span invariants: text[start:end] reproduces each block's
textContent, spans are sorted/non-overlapping, and the pipeline surfaces
them per row (north rule: "extracted text/spans" output contract)."""
from __future__ import annotations

import os

import pytest

from readability_ex_spark.kernel import dom
from readability_ex_spark.kernel.api import parse
from readability_ex_spark.kernel.spans import BLOCK_SPAN_TAGS, block_spans

FIXTURE_ROOT = "/root/reference/test/fixtures/readability-test-pages"


def _check_invariants(tree, text, spans):
    prev_end = 0
    for tag, start, end in spans:
        assert tag in BLOCK_SPAN_TAGS
        assert start >= prev_end, "spans overlap or are out of order"
        assert end > start, "empty span emitted"
        prev_end = end
    assert prev_end <= len(text)
    # offsets slice back to the exact textContent of each topmost block,
    # matched in document order
    blocks = _topmost_blocks(tree)
    nonempty = [b for b in blocks if dom.text(b) != ""]
    assert len(nonempty) == len(spans)
    for b, (tag, start, end) in zip(nonempty, spans):
        assert b.tag == tag
        assert text[start:end] == dom.text(b)


def _topmost_blocks(node):
    out = []
    stack = [(node, False)]
    while stack:
        n, in_block = stack.pop()
        if isinstance(n, list):
            for c in reversed(n):
                stack.append((c, in_block))
        elif isinstance(n, dom.Element):
            if n.tag == "script":
                continue
            if not in_block and n.tag in BLOCK_SPAN_TAGS:
                out.append(n)
            else:
                for c in reversed(n.children):
                    stack.append((c, in_block))
    return out


def test_simple_blocks():
    html = (
        "<html><body><div id='main'>"
        + "".join(
            f"<p>Paragraph {i} with enough text to matter for extraction, "
            f"commas, and more commas, keeping readability happy.</p>"
            for i in range(8)
        )
        + "<h2>A heading</h2><ul><li>item one</li><li>item two</li></ul>"
        + "</div></body></html>"
    )
    r = parse(html, base_uri="https://example.com/a")
    text, spans = r["text_content"], r["spans"]
    assert spans, "no spans emitted"
    tags = [t for t, _, _ in spans]
    assert "p" in tags
    # slices reproduce block text
    for tag, start, end in spans:
        assert text[start:end].strip() != "" or end > start
    assert text[spans[0][1] : spans[0][2]].startswith("Paragraph 0")
    # strictly increasing, non-overlapping
    for (_, s1, e1), (_, s2, e2) in zip(spans, spans[1:]):
        assert e1 <= s2


def test_nested_block_swallowed_by_topmost():
    html = (
        "<html><body><div>"
        + "<p>lead paragraph with plenty of words, commas, and text to "
        "score well in candidate selection, definitely long enough.</p>" * 6
        + "<ul><li><p>inner para</p> trailing</li></ul></div></body></html>"
    )
    r = parse(html, base_uri="https://example.com/b")
    spans = r["spans"]
    # the <li> owns its subtree — no separate span for the inner <p>
    li_spans = [s for s in spans if s[0] == "li"]
    if li_spans:  # the cleaner may drop a low-content list; if kept, check
        tag, start, end = li_spans[0]
        assert "inner para" in r["text_content"][start:end]
    assert not any(
        s[0] == "p" and "inner para" in r["text_content"][s[1] : s[2]]
        for s in spans
    )


def test_block_spans_unit_skips_script_and_empty():
    tree = dom.parse_document(
        "<div><p>abc</p><script>var x=1;</script><p></p><p>de</p>stray</div>"
    )
    spans = block_spans(tree)
    text = dom.text(tree)
    assert [t for t, _, _ in spans] == ["p", "p"]
    assert text[spans[0][1] : spans[0][2]] == "abc"
    assert text[spans[1][1] : spans[1][2]] == "de"


@pytest.mark.parametrize(
    "fixture",
    sorted(os.listdir(FIXTURE_ROOT))[::7],  # every 7th fixture (~19 pages)
)
def test_fixture_span_invariants(fixture):
    src = os.path.join(FIXTURE_ROOT, fixture, "source.html")
    if not os.path.exists(src):
        pytest.skip("no source.html")
    with open(src, "rb") as f:
        html = f.read()
    try:
        r = parse(html, base_uri="http://fakehost/test/page.html")
    except Exception:
        pytest.skip("fixture not readable (conformance suite owns that)")
    # re-derive the winning tree is not exposed; instead check the
    # self-consistency contract on the emitted values
    text, spans = r["text_content"], r["spans"]
    prev_end = 0
    for tag, start, end in spans:
        assert tag in BLOCK_SPAN_TAGS
        assert prev_end <= start < end <= len(text)
        prev_end = end
        assert text[start:end] != ""


def test_unit_invariants_against_tree():
    tree = dom.parse_document(
        "<article><h1>T</h1><div><p>one</p><blockquote>q</blockquote>"
        "</div><table><tr><td>c1</td><td>c2</td></tr></table></article>"
    )
    text = dom.text(tree)
    spans = block_spans(tree)
    _check_invariants(tree, text, spans)
