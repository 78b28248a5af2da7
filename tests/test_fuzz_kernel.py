"""Property tests: the kernel must never crash and must stay
deterministic on arbitrary garbage (crawl data is adversarial)."""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st

from readability_ex_spark.kernel import dom, parse
from readability_ex_spark.kernel.api import NotReadable
from readability_ex_spark.kernel.readerable import is_probably_readerable

_tagish = st.sampled_from(
    ["<div>", "</div>", "<p>", "</p>", "<br>", "<a href='x'>", "</a>",
     "<table>", "<tr>", "<td>", "</table>", "<!--c-->", "<![CDATA[x]]>",
     "<script>var a = '<p>';</script>", "<style>p{}</style>", "<img src=x>",
     "&amp;", "&#x41;", "&#bogus;", "<p", "p>", "<>", "</>",
     "<li>", "<noscript><img src='y.jpg'></noscript>"]
)
_html_soup = st.lists(
    st.one_of(_tagish, st.text(max_size=40)), max_size=60
).map("".join)


@settings(max_examples=30, deadline=None)
@given(_html_soup)
def test_parse_never_crashes(soup):
    html = f"<html><body>{soup}</body></html>"
    try:
        r1 = parse(html)
        r2 = parse(html)
        assert r1["text_content"] == r2["text_content"]
        assert r1["content"] == r2["content"]
    except NotReadable:
        pass


@settings(max_examples=30, deadline=None)
@given(_html_soup)
def test_dom_roundtrip_stable(soup):
    """Serializing a parsed tree and re-parsing it must be a fixpoint
    (serializer output is always parseable to the same tree)."""
    t1 = dom.parse_document(soup)
    h1 = dom.raw_html(t1)
    t2 = dom.parse_document(h1)
    assert dom.raw_html(t2) == h1


@settings(max_examples=20, deadline=None)
@given(_html_soup)
def test_readerable_never_crashes(soup):
    assert is_probably_readerable(soup) in (True, False)


# -- attribute soup: malformed/duplicated/unterminated attributes --------

_ATTR_NAMES = st.sampled_from(
    ["class", "id", "CLASS", "href", "style", "onload", "data-x", "x-y", "="]
)
_ATTR_VALS = st.text(alphabet="ab <>\"'=&;#\n\t", max_size=10)


@st.composite
def _attr_soup_tag(draw):
    tag = draw(st.sampled_from(["div", "p", "a", "span", "img", "table", "li"]))
    parts = [f"<{tag}"]
    for _ in range(draw(st.integers(0, 4))):
        name = draw(_ATTR_NAMES)
        if draw(st.booleans()):
            q = draw(st.sampled_from(['"', "'", ""]))
            # values may contain quotes / '>' / '=' — unterminated and
            # early-closed attributes are the point
            parts.append(f" {name}={q}{draw(_ATTR_VALS)}{q}")
        else:
            parts.append(f" {name}")
    if draw(st.booleans()):
        parts.append(" /")
    parts.append(">")
    return "".join(parts)


_attr_soup = st.lists(
    st.one_of(_attr_soup_tag(), st.sampled_from(["</div>", "</a>", "</p>"]),
              st.text(max_size=20)),
    max_size=40,
).map("".join)


@settings(max_examples=30, deadline=None)
@given(_attr_soup)
def test_attribute_soup_parse_deterministic(soup):
    html = f"<html><body>{soup}</body></html>"
    try:
        assert parse(html)["content"] == parse(html)["content"]
    except NotReadable:
        pass
    t1 = dom.parse_document(soup)
    h1 = dom.raw_html(t1)
    assert dom.raw_html(dom.parse_document(h1)) == h1


# -- mis-nested table/list/select soup: the implied-end-tag rules --------
# (kernel/dom.py _CLOSES/_SCOPE_BARRIERS) must never raise and must be a
# serialize -> reparse fixpoint on arbitrary open/close interleavings

_NEST_TAGS = [
    "table", "tr", "td", "th", "thead", "tbody", "tfoot", "caption",
    "colgroup", "ul", "ol", "li", "dl", "dt", "dd", "select", "option",
    "optgroup", "ruby", "rt", "rp", "p", "div",
]
_misnested = st.lists(
    st.one_of(
        st.sampled_from(
            [f"<{t}>" for t in _NEST_TAGS] + [f"</{t}>" for t in _NEST_TAGS]
        ),
        st.text(alphabet="ab c,", max_size=8),
    ),
    max_size=80,
).map("".join)


@settings(max_examples=40, deadline=None)
@given(_misnested)
def test_misnested_structure_parse_deterministic(soup):
    html = f"<html><body>{soup}</body></html>"
    try:
        r1, r2 = parse(html), parse(html)
        assert r1["text_content"] == r2["text_content"]
    except NotReadable:
        pass
    t1 = dom.parse_document(soup)
    h1 = dom.raw_html(t1)
    assert dom.raw_html(dom.parse_document(h1)) == h1


def test_pathological_nesting_guard():
    from readability_ex_spark.kernel.api import TooLarge

    deep = "<div>" * 5000 + "text" + "</div>" * 5000
    try:
        parse(f"<html><body>{deep}</body></html>", max_depth=2000)
        raise AssertionError("guard did not trip")
    except TooLarge:
        pass
    # moderately deep without guard must still complete
    deep = "<div>" * 600 + "text" + "</div>" * 600
    try:
        parse(f"<html><body>{deep}</body></html>")
    except NotReadable:
        pass


def test_huge_flat_document():
    flat = "<p>word, word, and more words in this paragraph.</p>" * 4000
    r = parse(f"<html><body><div>{flat}</div></body></html>")
    assert r["length"] > 20_000
