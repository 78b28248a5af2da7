"""Mirrors of the reference's cleaner_test.exs conditional-cleaning cases."""

from __future__ import annotations

from readability_ex_spark.kernel import cleaner, dom


def _clean(html: str):
    tree = dom.parse_fragment(html)
    return cleaner.clean_conditionally(tree[0])


def test_keeps_allowed_video_embeds():
    out = _clean(
        '<div id="root"><div id="container">'
        '<iframe src="https://www.youtube.com/embed/abc"></iframe>'
        "</div></div>"
    )
    assert dom.find(out, "div[id='container']")


def test_removes_negative_weight_divs():
    out = _clean('<div id="root"><div class="comment">Sponsored</div></div>')
    assert not dom.find(out, "div[class='comment']")


def test_keeps_image_only_lists():
    out = _clean(
        '<div id="root"><ul id="gallery">'
        '<li><img src="a.jpg"></li><li><img src="b.jpg"></li>'
        "</ul></div>"
    )
    assert dom.find(out, "ul[id='gallery']")


def test_removes_link_farms():
    links = "".join(
        f'<a href="/l{i}">some linked words here {i}</a> ' for i in range(8)
    )
    out = _clean(f'<div id="root"><div id="farm">{links}</div></div>')
    assert not dom.find(out, "div[id='farm']")


def test_ad_word_block_removed():
    out = _clean('<div id="root"><div id="ad1">Advertisement</div></div>')
    assert not dom.find(out, "div[id='ad1']")


def test_data_table_protected():
    table = (
        "<table><caption>Data</caption>"
        "<tr><th>h</th></tr><tr><td>1</td></tr></table>"
    )
    tree = dom.parse_fragment(f'<div id="root">{table}</div>')
    cleaner.mark_data_tables(tree[0])
    out = cleaner.clean_conditionally(tree[0])
    assert dom.find(out, "table")
