"""parse() option surface: keep_classes / preserve_classes /
nb_top_candidates / char_threshold (the reference's option schema,
readability_ex.ex:193-205)."""

from __future__ import annotations

from readability_ex_spark.kernel import parse

HTML = """
<html><body><div id="art" class="content page fancy">
<p class="lead caption">First paragraph, with commas, and a good amount of
words to be scored properly by the algorithm, easily enough.</p>
<p class="body-text">Second paragraph is similarly long, with words, and
commas, and keeps the candidate selection perfectly stable here.</p>
<p>Third paragraph continues, because articles have multiple paragraphs,
and each contributes its score to the shared ancestor element.</p>
<p>Fourth paragraph adds more characters so that the five hundred char
threshold is comfortably met by the extracted text content, fine.</p>
</div></body></html>
"""


def test_default_strips_unlisted_classes():
    r = parse(HTML)
    assert 'class="body-text"' not in r["content"]
    assert 'class="caption"' in r["content"]  # preserved by default set
    assert 'class="page"' in r["content"]


def test_keep_classes_retains_everything():
    r = parse(HTML, keep_classes=True)
    assert 'class="lead caption"' in r["content"]
    assert 'class="body-text"' in r["content"]


def test_custom_preserve_classes():
    r = parse(HTML, preserve_classes=frozenset(["body-text"]))
    assert 'class="body-text"' in r["content"]
    assert "caption" not in r["content"]


def test_char_threshold_controls_pass_acceptance():
    short = (
        "<html><body><div class='content'>"
        "<p>Small piece, with commas, but short text here.</p>"
        "<p>Another small piece of text, also short, fine.</p>"
        "</div></body></html>"
    )
    r = parse(short, char_threshold=10)
    assert r["length"] > 10


def test_skip_noop_attempts_is_output_identical():
    """The retry-skip optimization must be byte-identical to the literal
    4-pass loop — verified across the full fixture corpus (the pages
    that exercise multi-pass retries) and short synthetic docs (which
    fail every pass and take the longest attempt)."""
    from readability_ex_spark.kernel import parse
    from readability_ex_spark.kernel.api import NotReadable
    from readability_ex_spark.kernel.conformance import fixture_ids, load_fixture

    def both(html, **kw):
        out = []
        for skip in (True, False):
            try:
                r = parse(html, skip_noop_attempts=skip, **kw)
                out.append((r["content"], r["text_content"], r["byline"]))
            except NotReadable:
                out.append(None)
        return out

    # short docs: every pass fails the threshold, longest-attempt wins
    shorts = [
        "<html><body><article><p>tiny text, with commas.</p></article></body></html>",
        "<html><body><div class='sidebar'><p>unlikely short</p></div>"
        "<div><p>main but short, still.</p></div></body></html>",
        "<html><body><div class='footer entry'><p>short body text here,"
        " with a comma.</p></div></body></html>",
        # a pass that FINDS a byline removes its node; the next pass runs
        # with known_byline set and keeps it — skipping there was a real
        # bug (review finding): text differed between the two modes
        "<html><body><article><div class='byline'>Jane Q. Author, staff"
        "</div><p>short body text, with commas, below threshold.</p>"
        "</article></body></html>",
    ]
    for h in shorts:
        a, b = both(h)
        assert a == b

    for fid in fixture_ids()[::7]:  # every 7th fixture (~19 pages)
        fix = load_fixture(fid)
        a, b = both(fix["source"], base_uri="http://fakehost/test/page.html")
        assert a == b, fid
