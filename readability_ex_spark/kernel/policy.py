"""Policy/compliance signals from the page ``<head>``.

Neither Readability.js (docs/design/00_original_code.js) nor the
reference port (lib/readability_ex) emits these — they are the columns
a production corpus build filters on before shipping text, and the
metadata walk that harvests og/twitter tags already visits every node
needed.  Semantics are the public specs:

- Robots Exclusion Protocol HTML extension: ``<meta name="robots"
  content="noindex, noarchive, ...">`` — comma-separated, case-
  insensitive directives (RFC 9309 covers robots.txt; the meta-tag
  directive vocabulary is the de-facto search-engine standard, with
  ``none`` == ``noindex, nofollow``).
- ``noai`` / ``noimageai`` — the emerging opt-out-of-ML-training
  directives (spawned by DeviantArt, honored by several crawlers);
  either one sets the ``robots_noai`` flag.
- License link relations: ``rel="license"`` on ``<link>``/``<a>``
  (HTML spec link types; rel is a space-separated token list), plus
  bare Creative Commons license URLs as a weaker fallback hint.

Harvest runs on the PRE-extraction DOM (extraction mutates the tree
and strips the head), alongside the next-page-link scorer.
"""

from __future__ import annotations

import re

from readability_ex_spark.kernel import dom

# comma-separated directive list, whitespace-tolerant, case-insensitive
_SPLIT_DIRECTIVES = re.compile(r"[,\s]+", re.A)

# scheme-tolerant CC license/public-domain URL (the fallback hint when
# no rel=license is declared)
_RE_CC_URL = re.compile(
    r"https?://(?:[\w.-]+\.)?creativecommons\.org/"
    r"(?:licenses|licences|publicdomain)/",
    re.I | re.A,
)


def extract_policy(doc: list) -> dict:
    """``{robots_noindex, robots_noarchive, robots_noai, license_url}``
    from a parsed (pre-extraction) document tree.

    ``license_url``: the first ``rel=license`` href — ``<link>``
    (head) checked before ``<a>`` (body); if none is declared, the
    first Creative Commons license URL found in a ``<link>``/``<a>``
    href.  ``None`` when the page declares nothing.
    """
    noindex = noarchive = noai = False
    for meta in dom.find(doc, "meta"):
        name = meta.attr("name") if meta.has_attr("name") else None
        if name is None or name.strip().lower() != "robots":
            continue
        content = meta.attr("content") if meta.has_attr("content") else ""
        for d in _SPLIT_DIRECTIVES.split(content.strip().lower()):
            if d in ("noindex", "none"):
                noindex = True
            elif d == "noarchive":
                noarchive = True
            elif d in ("noai", "noimageai"):
                noai = True
    license_url = None
    cc_fallback = None
    for tag in ("link", "a"):
        for el in dom.find(doc, tag):
            href = el.attr("href") if el.has_attr("href") else None
            if not href:
                continue
            rel = el.attr("rel") if el.has_attr("rel") else ""
            if "license" in rel.lower().split():
                license_url = href
                break
            if cc_fallback is None and _RE_CC_URL.match(href.strip()):
                cc_fallback = href
        if license_url is not None:
            break
    return {
        "robots_noindex": noindex,
        "robots_noarchive": noarchive,
        "robots_noai": noai,
        "license_url": license_url if license_url is not None else cc_fallback,
    }
