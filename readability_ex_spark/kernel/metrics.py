"""Scoring metrics (reference: lib/readability_ex/metrics.ex)."""

from __future__ import annotations

from readability_ex_spark.kernel import dom
from readability_ex_spark.kernel.constants import RE_NEGATIVE, RE_POSITIVE


import re

_RE_NORM = re.compile(r"\s{2,}")
_RE_HASH_URL = re.compile(r"^#.+")


def _inner_len(node) -> int:
    return len(_RE_NORM.sub(" ", dom.text(node).strip()))


def link_density(node) -> float:
    """Readability.js _getLinkDensity: innerText (trim + whitespace
    collapse) lengths; 0.3 coefficient for /^#.+/ hrefs. (The reference,
    metrics.ex:5-23, uses raw Floki.text lengths — indentation inflates
    the denominator and misclassifies link-heavy wrappers.)"""
    n = _inner_len(node)
    if n == 0:
        return 0.0
    links_text = 0.0
    for link in dom.find(node, "a"):
        href = link.attr("href")
        coef = 0.3 if _RE_HASH_URL.match(href) else 1.0
        links_text += _inner_len(link) * coef
    return links_text / n


def class_weight(class_: str | None, id_attr: str | None) -> int:
    """+25 positive / -25 negative on the *concatenated* class+id string —
    reference semantics (metrics.ex:25-31), range -25..+25 (unlike
    Readability.js's per-field −50..+50; SURVEY.md §2.A S2)."""
    s = (class_ or "") + " " + (id_attr or "")
    w = 0
    if RE_POSITIVE.search(s):
        w += 25
    if RE_NEGATIVE.search(s):
        w -= 25
    return w
