"""Same input -> byte-identical output, twice in one process and across
document orderings (the kernel has no global state; ids are
per-document sequential — unlike the reference's System.unique_integer,
index.ex:54)."""

from __future__ import annotations

import hashlib

from readability_ex_spark.kernel import parse

HTML = """
<!DOCTYPE html><html lang="en"><head><title>Determinism | Site</title></head>
<body><div id="main" class="content">
<h1>Determinism</h1>
<p>First paragraph with commas, and more commas, and a reasonable amount of
text so that the threshold is reached across several sentences, easily.</p>
<p>Second paragraph is similarly long, with some commas, and plenty of words
to make the content score high enough for stable candidate selection.</p>
<p>Third paragraph continues, because articles have multiple paragraphs, and
each contributes score to the shared ancestor element in the tree.</p>
<p>Fourth paragraph adds more characters so that the five hundred character
threshold is comfortably met by the extracted text content overall.</p>
</div><footer class="footer">(c)</footer></body></html>
"""


def _digest(result: dict) -> str:
    h = hashlib.sha256()
    for k in sorted(result):
        h.update(f"{k}={result[k]!r}\x1e".encode())
    return h.hexdigest()


def test_parse_deterministic():
    a = parse(HTML, base_uri="http://d.test/x")
    b = parse(HTML, base_uri="http://d.test/x")
    assert _digest(a) == _digest(b)
    assert a["text_content"] == b["text_content"]
    assert a["content"] == b["content"]


def test_byte_identical_text_repeated():
    texts = {parse(HTML)["text_content"] for _ in range(5)}
    assert len(texts) == 1
