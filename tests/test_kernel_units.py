"""Unit tests for the pure-Python kernel (no Spark).

Mirrors the reference's operator unit tests (SURVEY.md §5.1.2:
cleaner_test.exs, byline_test.exs, metadata_test.exs,
fix_relative_uris_test.exs) against our modules.
"""

from __future__ import annotations

from readability_ex_spark.kernel import cleaner, dom, metadata, metrics, title
from readability_ex_spark.kernel.dom import Element


def parse_frag(html: str):
    return dom.parse_fragment(html)


# -- dom ---------------------------------------------------------------------

def test_parse_implied_p_close():
    tree = parse_frag("<div><p>one<p>two</div>")
    div = tree[0]
    assert [c.tag for c in div.element_children()] == ["p", "p"]


def test_parse_void_and_raw_text():
    tree = parse_frag("<p>a<br>b</p><script>if (a < b) {}</script>")
    assert dom.text(tree) == "ab"  # script content excluded
    assert dom.raw_html(tree[0]) == "<p>a<br/>b</p>"


def test_parse_entities_decoded():
    tree = parse_frag("<p>a &amp; b &#233;</p>")
    assert dom.text(tree) == "a & b é"


def test_find_descendant_combinator():
    tree = parse_frag("<table><tr><td><table><tr><td>x</td></tr></table></td></tr></table>")
    assert len(dom.find(tree, "table table")) == 1
    assert len(dom.find(tree, "table")) == 2


def test_implied_li_and_td_close():
    tree = parse_frag("<ul><li>a<li>b</ul><table><tr><td>1<td>2<tr><td>3</table>")
    ul = tree[0]
    assert len(ul.element_children()) == 2
    assert len(dom.find(tree, "tr")) == 2
    assert len(dom.find(tree, "td")) == 3


# -- metrics -------------------------------------------------------------------

def test_link_density_inner_text():
    tree = parse_frag(
        '<div>   <a href="/x">12345</a>12345   </div>'
    )
    assert abs(metrics.link_density(tree[0]) - 0.5) < 1e-9


def test_link_density_hash_coefficient():
    tree = parse_frag('<div><a href="#f">12345</a>12345</div>')
    assert abs(metrics.link_density(tree[0]) - 0.15) < 1e-9


def test_class_weight_per_field():
    assert metrics.class_weight("article", "main") == 50
    assert metrics.class_weight("comment", "") == -25
    assert metrics.class_weight("article comment", None) == 0


# -- cleaners ------------------------------------------------------------------

def test_clean_styles_svg_exempt():
    tree = parse_frag(
        '<div style="x" align="left"><svg style="y"><rect style="z"/></svg></div>'
    )
    cleaner.clean_styles(tree[0])
    assert not tree[0].has_attr("style") and not tree[0].has_attr("align")
    svg = dom.find(tree, "svg")[0]
    assert svg.attr("style") == "y"


def test_clean_tag_keeps_allowed_video():
    tree = parse_frag(
        '<div><iframe src="https://www.youtube.com/embed/x"></iframe>'
        '<iframe src="https://ads.example.com/f"></iframe></div>'
    )
    out = cleaner.clean_tag(tree[0], "iframe")
    frames = dom.find(out, "iframe")
    assert len(frames) == 1 and "youtube" in frames[0].attr("src")


def test_replace_brs_makes_paragraphs():
    tree = parse_frag("<div>one<br> <br>two<br>three</div>")
    out = cleaner.replace_brbr_with_p(tree)
    ps = dom.find(out, "p")
    assert len(ps) == 1
    assert dom.text(ps[0]).strip().startswith("two")
    assert len(dom.find(ps[0], "br")) == 1  # single br kept inside


def test_mark_data_tables():
    layout = parse_frag("<table><tr><td>x</td></tr></table>")[0]
    cleaner.mark_data_tables(layout)
    assert layout.attr("data-readability-datatable") == "0"
    data = parse_frag(
        "<table><caption>c</caption><tr><td>x</td></tr></table>"
    )[0]
    cleaner.mark_data_tables(data)
    assert data.attr("data-readability-datatable") == "1"


def test_flatten_single_cell_table():
    tree = parse_frag("<div><table><tbody><tr><td>just text</td></tr></tbody></table></div>")
    out = cleaner.flatten_tables(tree[0])
    assert not dom.find(out, "table")
    assert dom.text(dom.find(out, "p")[0]) == "just text"


def test_unwrap_noscript_images():
    tree = parse_frag(
        '<div><img src="data:image/gif;base64,tiny"/>'
        '<noscript><img src="https://x.test/real.jpg" alt="r"/></noscript></div>'
    )
    out = cleaner.unwrap_noscript_images(tree)
    out = cleaner.remove_scripts(out)
    imgs = dom.find(out, "img")
    assert len(imgs) == 1
    assert imgs[0].attr("src") == "https://x.test/real.jpg"
    assert imgs[0].attr("data-old-src").startswith("data:")


def test_absolutize_uris():
    tree = parse_frag(
        '<div><a href="../x?a=1">l</a><img src="//cdn.test/i.png"/>'
        '<a href="#frag">f</a><a href="mailto:a@b">m</a></div>'
    )
    out = cleaner.absolutize_uris(tree, "http://Host.test/dir/page.html", False)
    links = dom.find(out, "a")
    assert links[0].attr("href") == "http://host.test/x?a=1"
    assert links[1].attr("href") == "#frag"  # no <base> -> untouched
    assert links[2].attr("href") == "mailto:a@b"
    assert dom.find(out, "img")[0].attr("src") == "http://cdn.test/i.png"


def test_text_similarity():
    assert cleaner.text_similarity("Hello World News", "hello world news") == 1.0
    assert cleaner.text_similarity("abc", "xyz") == 0.0


# -- metadata / title ----------------------------------------------------------

def test_metadata_precedence_and_entities():
    doc = dom.parse_document(
        "<html><head><title>T</title>"
        '<meta property="og:title" content="OG &amp; Title"/>'
        '<meta name="author" content="Jane Doe"/>'
        '<meta property="og:site_name" content="Site"/>'
        "</head><body></body></html>"
    )
    meta = metadata.extract(doc, "")
    assert meta["title"] == "OG & Title"
    assert meta["byline"] == "Jane Doe"
    assert meta["site_name"] == "Site"


def test_jsonld_article():
    raw = (
        '<script type="application/ld+json">{"@context":"https://schema.org",'
        '"@type":"NewsArticle","headline":"JL Title",'
        '"author":{"name":"JL Author"},"datePublished":"2020-01-01"}</script>'
    )
    doc = dom.parse_document(f"<html><head>{raw}</head><body></body></html>")
    meta = metadata.extract(doc, f"<html><head>{raw}</head></html>")
    assert meta["title"] == "JL Title"
    assert meta["byline"] == "JL Author"
    assert meta["published_time"] == "2020-01-01"


def test_jsonld_string_author_ignored():
    raw = (
        '<script type="application/ld+json">{"@context":"https://schema.org",'
        '"@type":"Article","author":"blogname"}</script>'
    )
    doc = dom.parse_document(f"<html><head>{raw}</head><body></body></html>")
    meta = metadata.extract(doc, f"<html>{raw}</html>")
    assert meta["byline"] is None


def test_title_separator_refinement():
    doc = dom.parse_document(
        "<html><head><title>The Actual Long Headline Here | Some Site</title>"
        "</head><body></body></html>"
    )
    assert (
        title.get_article_title(doc, {"title": ""})
        == "The Actual Long Headline Here"
    )


def test_title_short_rollback():
    doc = dom.parse_document(
        "<html><head><title>Tiny One | Site</title></head><body></body></html>"
    )
    # refined candidate <= 4 words -> roll back to original
    assert title.get_article_title(doc, {"title": ""}) == "Tiny One | Site"
