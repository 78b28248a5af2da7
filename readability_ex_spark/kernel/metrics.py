"""Scoring metrics (reference: lib/readability_ex/metrics.ex)."""

from __future__ import annotations

from readability_ex_spark.kernel import dom
from readability_ex_spark.kernel.constants import RE_NEGATIVE, RE_POSITIVE


import re

_RE_NORM = re.compile(r"\s{2,}")
_RE_HASH_URL = re.compile(r"^#.+")


def _inner_len(node, cache=None) -> int:
    if cache is not None:
        try:
            return len(cache.inner(node))
        except AttributeError:
            pass
    return len(_RE_NORM.sub(" ", dom.text(node).strip()))


def link_density(node, cache=None) -> float:
    """Readability.js _getLinkDensity: innerText (trim + whitespace
    collapse) lengths; 0.3 coefficient for /^#.+/ hrefs. (The reference,
    metrics.ex:5-23, uses raw Floki.text lengths — indentation inflates
    the denominator and misclassifies link-heavy wrappers.)

    ``cache``: optional cleaner._TextCache for O(1) text lookups during
    the conditional-clean pass."""
    n = _inner_len(node, cache)
    if n == 0:
        return 0.0
    links_text = 0.0
    for link in dom.find(node, "a"):
        href = link.attr("href")
        coef = 0.3 if _RE_HASH_URL.match(href) else 1.0
        links_text += _inner_len(link, cache) * coef
    return links_text / n


def class_weight(class_: str | None, id_attr: str | None) -> int:
    """Readability.js _getClassWeight: ±25 for class and ±25 for id
    *separately* (range −50..+50). The reference concatenates the two
    fields (metrics.ex:25-31, range ±25) — the fixture goldens encode the
    per-field behavior (wrapper selection on id'd+classed containers)."""
    w = 0
    if class_:
        if RE_NEGATIVE.search(class_):
            w -= 25
        if RE_POSITIVE.search(class_):
            w += 25
    if id_attr:
        if RE_NEGATIVE.search(id_attr):
            w -= 25
        if RE_POSITIVE.search(id_attr):
            w += 25
    return w
