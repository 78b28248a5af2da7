"""Direct mirrors of the reference's unit tests against our kernel:
byline_test.exs, metadata_test.exs, fix_relative_uris_test.exs,
simplify_nested_elements_test.exs, prep_document_test.exs and
cleaner_test.exs (conditional-cleaning cases live in
test_cleaner_conditional.py). Deliberate reference-vs-JS divergences
are asserted with the JS/golden behavior and documented inline."""

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


# -- fix_relative_uris_test.exs mirrors --------------------------------------


def _first_el(html):
    from readability_ex_spark.kernel import dom

    nodes = dom.parse_fragment(html)
    return next(n for n in nodes if isinstance(n, dom.Element))


def _find(node, sel):
    from readability_ex_spark.kernel import dom

    return dom.select(node, sel) if hasattr(dom, "select") else None


def test_fix_relative_uris_hash_links():
    """fix_relative_uris_test.exs: hash links kept verbatim unless
    absolute_fragments; protocol-relative srcs get the base scheme."""
    from readability_ex_spark.kernel import cleaner, dom

    el = _first_el('<div><a href="#section">Link</a></div>')
    out = cleaner.absolutize_uris(el, "https://example.com/path/", False)
    a = next(n for n in dom.iter_elements(out) if n.tag == "a")
    assert a.attr("href") == "#section"

    el = _first_el('<div><a href="#section">Link</a></div>')
    out = cleaner.absolutize_uris(el, "https://example.com/path/", True)
    a = next(n for n in dom.iter_elements(out) if n.tag == "a")
    assert a.attr("href") == "https://example.com/path/#section"

    # deliberate divergence from fix_relative_uris_test.exs: the
    # reference absolutizes iframe srcs, but Readability.js's media list
    # (img/picture/figure/video/audio/source) excludes iframe and the
    # goldens require the JS behavior — iframe srcs pass through
    el = _first_el('<div><iframe src="//cdn.example.com/video"></iframe></div>')
    out = cleaner.absolutize_uris(el, "https://example.com/path/", True)
    fr = next(n for n in dom.iter_elements(out) if n.tag == "iframe")
    assert fr.attr("src") == "//cdn.example.com/video"

    # the JS media handling itself: protocol-relative img src resolves
    el = _first_el('<div><img src="//cdn.example.com/pic.jpg"></div>')
    out = cleaner.absolutize_uris(el, "https://example.com/path/", True)
    img = next(n for n in dom.iter_elements(out) if n.tag == "img")
    assert img.attr("src") == "https://cdn.example.com/pic.jpg"


# -- simplify_nested_elements_test.exs mirrors --------------------------------


def test_simplify_nested_removes_empty_br_hr_div():
    from readability_ex_spark.kernel import cleaner

    el = _first_el('<div id="wrap"><br><hr></div>')
    assert cleaner.simplify_nested_elements(el) is None


def test_simplify_nested_unwraps_single_div_child():
    from readability_ex_spark.kernel import cleaner, dom

    el = _first_el(
        '<div id="parent" class="outer"><div id="child" class="inner">'
        "Text</div></div>"
    )
    out = cleaner.simplify_nested_elements(el)
    # JS replaceChild copies the parent's attributes onto the child, so
    # the surviving div carries id=parent / class=outer
    divs = [n for n in dom.iter_elements(out) if n.tag == "div"]
    assert len(divs) == 1
    assert divs[0].attr("id") == "parent" and divs[0].attr("class") == "outer"


def test_simplify_nested_keeps_readability_containers():
    from readability_ex_spark.kernel import cleaner, dom

    el = _first_el(
        '<div id="readability-content"><div id="child">Text</div></div>'
    )
    out = cleaner.simplify_nested_elements(el)
    ids = {n.attr("id") for n in dom.iter_elements(out)}
    assert {"readability-content", "child"} <= ids


# -- prep_document_test.exs mirrors -------------------------------------------


def test_remove_scripts_keeps_styles_and_preload_links():
    from readability_ex_spark.kernel import cleaner, dom

    doc = dom.parse_document(
        "<html><head><style>.a{color:red}</style>"
        '<script>console.log("x")</script></head>'
        "<body><noscript><p>fallback</p></noscript>"
        '<link rel="preload" as="script" href="/x.js"></body></html>'
    )
    cleaned = cleaner.remove_scripts(doc)
    tags = [n.tag for el in cleaned if isinstance(el, dom.Element)
            for n in dom.iter_elements(el)]
    assert "script" not in tags and "noscript" not in tags
    assert "style" in tags and "link" in tags


def test_all_styles_removed_js_semantics():
    """Deliberate divergence from prep_document_test.exs: the reference
    keeps body styles (head-only removal); Readability.js and the
    goldens remove ALL style tags (SURVEY §8, VERDICT P3) — assert the
    JS behavior."""
    from readability_ex_spark.kernel import cleaner, dom

    doc = dom.parse_document(
        "<html><head><style>.a{color:red}</style></head>"
        '<body><style>.b{}</style><div style="color: blue">ok</div>'
        "</body></html>"
    )
    cleaned = cleaner.remove_head_styles(doc)
    els = [n for el in cleaned if isinstance(el, dom.Element)
           for n in dom.iter_elements(el)]
    assert all(n.tag != "style" for n in els)
    # inline style ATTRIBUTES survive prep (cleaned later by clean_styles)
    assert any(n.attr("style") == "color: blue" for n in els)


def test_brbr_replaced_inside_span():
    from readability_ex_spark.kernel import cleaner, dom

    doc = dom.parse_document(
        "<html><body><span>alpha<br><br>beta</span></body></html>"
    )
    cleaned = cleaner.replace_brbr_with_p(doc)
    spans = [n for el in cleaned if isinstance(el, dom.Element)
             for n in dom.iter_elements(el) if n.tag == "span"]
    assert spans and any(
        c.tag == "p" for c in spans[0].children if isinstance(c, dom.Element)
    )


# -- cleaner_test.exs mirrors (the six not already in
#    test_cleaner_conditional.py) ---------------------------------------------


def test_clean_share_elements_removes_low_text_share_nodes():
    from readability_ex_spark.kernel import cleaner, dom

    el = _first_el(
        '<div id="root"><div id="article"><div class="share">Share</div>'
        '<div class="content">Real content</div></div></div>'
    )
    out = cleaner.clean_share_elements(el, 500)
    classes = {n.attr("class") for n in dom.iter_elements(out)}
    assert "share" not in classes and "content" in classes


def test_clean_share_elements_keeps_top_level_candidates():
    from readability_ex_spark.kernel import cleaner, dom

    el = _first_el('<div id="root"><div class="share">Share</div></div>')
    out = cleaner.clean_share_elements(el, 500)
    assert any(n.attr("class") == "share" for n in dom.iter_elements(out))


def test_clean_styles_drops_presentational_attrs():
    from readability_ex_spark.kernel import cleaner, dom

    el = _first_el(
        '<div style="color: red" align="center">'
        '<table width="100" height="200" border="1"></table></div>'
    )
    out = cleaner.clean_styles(el)
    els = {n.tag: n for n in dom.iter_elements(out)}
    for attr in ("style", "align"):
        assert not els["div"].has_attr(attr)
    for attr in ("border", "width", "height"):
        assert not els["table"].has_attr(attr)


def test_clean_styles_preserves_svg_subtree():
    from readability_ex_spark.kernel import cleaner, dom

    el = _first_el(
        '<div><svg style="fill: red"><rect width="10" height="10"></rect>'
        "</svg></div>"
    )
    out = cleaner.clean_styles(el)
    svg = next(n for n in dom.iter_elements(out) if n.tag == "svg")
    assert svg.attr("style") == "fill: red"


def test_strip_attributes_keeps_classes_when_preserve_none():
    from readability_ex_spark.kernel import cleaner, dom

    el = _first_el('<div class="keep drop" style="color: red"></div>')
    out = cleaner.strip_attributes_and_classes(el, None)
    d = next(iter(dom.iter_elements(out)))
    assert d.has_attr("class") and d.has_attr("style")


def test_strip_attributes_filters_classes_and_readability_data():
    from readability_ex_spark.kernel import cleaner, dom

    el = _first_el('<div class="page keep" data-readability-datatable="1"></div>')
    out = cleaner.strip_attributes_and_classes(el, {"page"})
    d = next(iter(dom.iter_elements(out)))
    assert not d.has_attr("data-readability-datatable")
    assert d.attr("class") == "page"


def test_clean_tag_video_allowlist():
    from readability_ex_spark.kernel import cleaner, dom

    el = _first_el(
        '<div><iframe src="https://player.vimeo.com/video/123"></iframe></div>'
    )
    out = cleaner.clean_tag(el, "iframe")
    assert any(n.tag == "iframe" for n in dom.iter_elements(out))

    el = _first_el('<div><iframe src="https://example.com/video"></iframe></div>')
    out = cleaner.clean_tag(el, "iframe")
    assert all(n.tag != "iframe" for n in dom.iter_elements(out))
