"""Sibling-joining semantics (mirrors the reference's
sibling_joining_test.exs — qualifying paragraph siblings join the
article, link-farm lists do not)."""

from __future__ import annotations

from readability_ex_spark.kernel import parse


def test_joins_qualifying_paragraph_siblings():
    long_text = "Long sentence with enough words. " * 5
    html = f"""
    <html><head><title>Example</title></head><body>
      <div id="main" class="article">
        <p>{long_text}</p>
        <p>Extra line.</p>
      </div>
      <p id="sib">Short sentence.</p>
      <ul id="list"><li>List item sentence.</li></ul>
    </body></html>
    """
    result = parse(html, char_threshold=0)
    assert "Short sentence." in result["content"]  # short p, ends with '.'
    assert long_text.strip() in result["text_content"]
    assert "List item sentence." not in result["content"]


def test_short_sibling_without_sentence_end_dropped():
    # two <p>s so the wrapper survives lone-p replacement and stays the
    # top candidate; the sibling without a sentence end is not joined
    long_text = "Long sentence with enough words here. " * 6
    html = f"""
    <html><body>
      <div class="article"><p>{long_text}</p><p>{long_text}</p></div>
      <p>no sentence end here</p>
    </body></html>
    """
    result = parse(html, char_threshold=0)
    assert "no sentence end here" not in result["content"]


def test_linky_sibling_paragraph_dropped():
    long_text = "Long sentence with plenty of words in it, truly. " * 4
    links = "".join(
        f'<a href="/x{i}">linked text that is quite long {i}</a>' for i in range(6)
    )
    html = f"""
    <html><body>
      <div class="article"><p>{long_text}</p><p>{long_text}</p></div>
      <p>{links}</p>
    </body></html>
    """
    result = parse(html, char_threshold=0)
    assert "linked text that is quite long 0" not in result["content"]
