"""parse(html, **opts) — the full extraction pipeline
(reference: readability_ex.ex:17-124)."""

from __future__ import annotations

import re
import sys
from urllib.parse import urljoin

from readability_ex_spark.kernel import cleaner, dom, metadata, sieve, title
from readability_ex_spark.kernel import spans as spans_mod
from readability_ex_spark.kernel import index as kernel_index
from readability_ex_spark.kernel.constants import (
    FLAG_CLEAN_CONDITIONALLY,
    FLAG_PASSES,
    FLAG_STRIP_UNLIKELYS,
    FLAG_WEIGHT_CLASSES,
)

DEFAULT_OPTS = {
    "char_threshold": 500,
    "base_uri": None,
    "nb_top_candidates": 5,
    "preserve_classes": frozenset(["page", "caption", "OPEN", "CLOSE", "ORD"]),
    "keep_classes": False,
    # resource guards (Readability.js maxElemsToParse, plus a depth guard
    # for pathological nesting): 0 = unlimited. The Spark pipeline sets
    # both so one adversarial crawl page cannot stall an executor.
    "max_elems": 0,
    "max_depth": 0,
    # skip retry passes whose cleared flags provably changed nothing
    # (output-identical; False forces the literal 4-pass JS loop —
    # exists so tests can assert the equivalence)
    "skip_noop_attempts": True,
}


class TooLarge(Exception):
    """Document exceeds the configured element/depth guards."""

_RE_NUM_ENTITY = re.compile(r"&#x[0-9a-fA-F]+;|&#\d+;")

# Deep real-world DOMs + recursive traversals need headroom beyond the
# default 1000 frames.
_MIN_RECURSION_LIMIT = 20000


class NotReadable(Exception):
    pass


def parse(html: str | bytes, doc: list | None = None, **opts) -> dict:
    """Extract the main article. Returns a dict with keys
    title, content (HTML), text_content, length, excerpt, byline, dir,
    site_name, lang, published_time, spans (block-level [tag, start, end)
    offsets into text_content — kernel/spans.py).

    ``doc``: optionally a pre-parsed tree of ``html`` (it is consumed and
    mutated by the pre-clean phase — do not reuse it afterwards).

    Raises NotReadable when no pass produces a candidate.
    """
    if sys.getrecursionlimit() < _MIN_RECURSION_LIMIT:
        sys.setrecursionlimit(_MIN_RECURSION_LIMIT)
    if isinstance(html, (bytes, bytearray)):
        html = html.decode("utf-8", errors="replace")
    o = dict(DEFAULT_OPTS)
    o.update(opts)
    base_uri = o.get("base_uri") or ""

    if doc is None:
        doc = dom.parse_document(html)
    _check_guards(doc, o["max_elems"], o["max_depth"])
    doc = cleaner.unwrap_noscript_images(doc)
    doc = cleaner.remove_scripts(doc)
    doc = cleaner.prep_document(doc)

    base_uri, absolute_fragments = _effective_base_uri(doc, base_uri)

    meta = metadata.extract(doc, html)
    article_title = title.get_article_title(doc, meta)

    result = None
    attempts = []
    found_byline = None  # persists across passes (JS _articleByline)
    prev_flags = None
    prev_effects: dict | None = None
    for flags in FLAG_PASSES:
        # Skip provably-identical retries: each pass differs from the
        # previous only by the flags it clears, and grab_article records
        # whether each flag actually CHANGED anything. If none of the
        # newly-cleared flags had an effect, this pass reproduces the
        # previous one byte-for-byte (same failed length, same byline),
        # so running it adds nothing — 76% of short crawl pages
        # otherwise pay all 4 passes.
        if (
            o["skip_noop_attempts"]
            and prev_flags is not None
            and prev_effects is not None
        ):
            cleared = prev_flags & ~flags
            if not (
                (cleared & FLAG_STRIP_UNLIKELYS and prev_effects.get("strip"))
                or (cleared & FLAG_WEIGHT_CLASSES and prev_effects.get("weight"))
                or (
                    cleared & FLAG_CLEAN_CONDITIONALLY
                    and prev_effects.get("cond")
                )
                # a pass that newly FOUND a byline removed its node; the
                # next pass runs with known_byline set and keeps the
                # node, so it is not a replay of this one
                or prev_effects.get("byline")
            ):
                prev_flags = flags  # the skipped pass stands in as 'previous'
                continue
        effects: dict = {}
        attempt = _run_attempt(
            doc, meta, article_title, base_uri, absolute_fragments, flags, o,
            found_byline, effects,
        )
        prev_flags, prev_effects = flags, effects
        if attempt is None:
            continue
        if attempt["byline"] is not None:
            found_byline = attempt["byline"]
        if attempt["_pass_ok"]:
            result = attempt
            break
        attempts.append(attempt)

    best = result
    if best is None and attempts:
        best = max(attempts, key=lambda a: a["_norm_length"])
        if best["_norm_length"] == 0:
            best = None  # JS: all attempts empty -> not readable
    if best is None:
        raise NotReadable("not_readable")
    # byline resolves at the end of all passes (JS reads _articleByline
    # after grabArticle settles, whichever pass set it)
    best["byline"] = meta.get("byline") or found_byline
    # block-level spans over text_content, winner-only (one linear walk;
    # losing attempts never pay it)
    best["spans"] = spans_mod.block_spans(best.pop("_tree"))
    best.pop("_pass_ok", None)
    best.pop("_norm_length", None)
    return best


def _check_guards(doc, max_elems: int, max_depth: int) -> None:
    if not max_elems and not max_depth:
        return
    n = 0
    stack = [(c, 1) for c in doc if isinstance(c, dom.Element)]
    while stack:
        el, depth = stack.pop()
        n += 1
        if max_elems and n > max_elems:
            raise TooLarge(f"more than {max_elems} elements")
        if max_depth and depth > max_depth:
            raise TooLarge(f"nesting deeper than {max_depth}")
        for c in el.children:
            if isinstance(c, dom.Element):
                stack.append((c, depth + 1))


def _run_attempt(
    doc, meta, article_title, base_uri, absolute_fragments, flags, opts,
    known_byline=None, effects=None,
):
    grab = sieve.grab_article(
        doc, flags, base_uri, absolute_fragments, article_title, opts, meta,
        known_byline, effects,
    )
    if grab is None:
        return None
    text = grab["text"]
    # the threshold compares innerText length (trim + whitespace collapse,
    # Readability.js getInnerText), not raw textContent length
    norm_len = len(kernel_index.inner_text(text))
    best_ok = norm_len >= opts["char_threshold"]
    excerpt = meta.get("excerpt")
    if excerpt is None or (isinstance(excerpt, str) and excerpt.strip() == ""):
        excerpt = _first_excerpt(grab["tree"], text)
    return {
        "title": article_title,
        "content": grab["content_html"],
        "_tree": grab["tree"],  # winner's spans computed once in parse()
        "text_content": text,
        "length": len(text),
        "excerpt": _decode_html_entities(excerpt),
        "byline": meta.get("byline") or grab["byline"],
        # Readability.js takes dir from the candidate-ancestor crawl only
        # (the <html> dir is found by the crawl as an ancestor); the
        # reference prefers the metadata dir (readability_ex.ex:114),
        # which loses rtl articles inside ltr chrome.
        "dir": grab["dir"] or meta.get("dir"),
        "site_name": meta.get("site_name"),
        "lang": meta.get("lang"),
        "published_time": meta.get("published_time"),
        "_pass_ok": best_ok,
        "_norm_length": norm_len,
    }


def _first_excerpt(tree, text: str) -> str:
    """First non-empty <p> of the output, text without <br> contributions;
    else truncated full text (readability_ex.ex:126-144)."""
    for p in dom.find(tree, "p"):
        if dom.text(p).strip() != "":
            return _text_no_br(p).strip()
    text = text.strip()
    return text if len(text) <= 200 else text[:200]


def _text_no_br(node) -> str:
    if isinstance(node, str):
        return node
    if isinstance(node, dom.Element):
        if node.tag == "br":
            return ""
        return "".join(_text_no_br(c) for c in node.children)
    return ""


def _decode_html_entities(text):
    """Numeric entities only (readability_ex.ex:147-178)."""
    if text is None:
        return None

    def repl(m):
        s = m.group(0)
        if s[:3].lower() == "&#x":
            body, base = s[3:-1], 16
        else:
            body, base = s[2:-1], 10
        value = int(body, base)
        if 0 < value <= 0x10FFFF and not (0xD800 <= value <= 0xDFFF):
            return chr(value)
        return "�"

    return _RE_NUM_ENTITY.sub(repl, text)


def _effective_base_uri(doc, base_uri):
    """<base href> merges with base_uri; fragment hrefs become absolute
    only when a <base> exists (readability_ex.ex:207-222)."""
    base_href = None
    for b in dom.find(doc, "base[href]"):
        base_href = b.attr("href")
        break
    if base_href:
        if base_uri in (None, ""):
            merged = base_href
        else:
            merged = urljoin(base_uri, base_href)
        return merged, True
    return base_uri, False
