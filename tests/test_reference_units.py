"""Direct mirrors of the reference's remaining unit tests
(byline_test.exs, metadata_test.exs) against our kernel."""

from __future__ import annotations

from readability_ex_spark.kernel import dom, metadata, parse


def _extract(html: str) -> dict:
    return metadata.extract(dom.parse_document(html), html)


def test_uses_itemprop_name_for_byline():
    html = """
    <html><head><title>Example</title></head><body><article>
      <div class="byline" itemprop="author">
        <span itemprop="name">Jane Doe</span>
      </div>
      <p>Sample content for extraction.</p>
    </article></body></html>
    """
    result = parse(html, char_threshold=0)
    assert result["byline"] == "Jane Doe"


def test_keeps_byline_nodes_when_metadata_byline_exists():
    html = """
    <html><head><title>Example</title>
      <meta name="author" content="Meta Author">
    </head><body><article>
      <div class="byline">Byline Node</div>
      <p>Sample content for extraction.</p>
    </article></body></html>
    """
    result = parse(html, char_threshold=0)
    assert result["byline"] == "Meta Author"
    assert "Byline Node" in result["content"]


def test_weibo_meta_tags():
    html = """
    <html><head><title>Doc Title</title>
      <meta name="weibo:article:title" content="Weibo Title">
      <meta name="weibo:article:description" content="Weibo Desc">
    </head><body></body></html>
    """
    meta = _extract(html)
    assert meta["title"] == "Weibo Title"
    assert meta["excerpt"] == "Weibo Desc"


def test_article_author_url_filtered_but_name_meta_kept():
    html = """
    <html><head>
      <meta property="article:author" content="https://example.com/author">
      <meta name="author" content="https://example.com/other">
    </head><body></body></html>
    """
    assert _extract(html)["byline"] == "https://example.com/other"


def test_dcterm_dot_notation_title():
    html = """
    <html><head>
      <meta name="dcterm.title" content="Dcterm Title">
      <meta property="og:title" content="OG Title">
    </head><body></body></html>
    """
    assert _extract(html)["title"] == "Dcterm Title"
