"""isProbablyReaderable — the cheap pre-check from Mozilla's
Readability-readerable.js: can this page plausibly yield an article,
without running the full extraction? Useful at crawl scale as a filter
before the expensive kernel (SURVEY.md §2.B filter stage).
"""

from __future__ import annotations

import math
import re

from readability_ex_spark.kernel import dom
from readability_ex_spark.kernel.constants import RE_UNLIKELY
from readability_ex_spark.kernel.dom import Element
from readability_ex_spark.kernel.index import _style_hides

# readerable.js uses a slightly smaller okMaybe set than the main lib
_RE_OK_MAYBE_READERABLE = re.compile(
    r"and|article|body|column|content|main|shadow", re.I
)

MIN_SCORE = 20.0
MIN_CONTENT_LENGTH = 140


def _is_visible(el: Element) -> bool:
    if _style_hides(el.attr("style")):
        return False
    if el.has_attr("hidden"):
        return False
    if el.attr("aria-hidden") == "true" and "fallback-image" not in el.attr(
        "class"
    ):
        return False
    return True


def is_probably_readerable(
    source,
    min_score: float = MIN_SCORE,
    min_content_length: int = MIN_CONTENT_LENGTH,
) -> bool:
    """``source``: HTML string/bytes or an already-parsed node list."""
    if isinstance(source, (bytes, bytearray)):
        source = source.decode("utf-8", errors="replace")
    doc = dom.parse_document(source) if isinstance(source, str) else source

    # candidate nodes: p, pre, article — plus divs with a direct <br> child
    nodes: list[Element] = []
    seen: set[int] = set()
    for el in dom.iter_elements(doc):
        if el.tag in ("p", "pre", "article") and id(el) not in seen:
            seen.add(id(el))
            nodes.append(el)
    for el in dom.iter_elements(doc):
        if el.tag == "div" and id(el) not in seen:
            if any(isinstance(c, Element) and c.tag == "br" for c in el.children):
                seen.add(id(el))
                nodes.append(el)

    # "li p" exclusion needs ancestor knowledge: collect p-under-li ids
    li_ps: set[int] = set()
    for li in dom.find(doc, "li"):
        for p in dom.find(li.children, "p"):
            li_ps.add(id(p))

    score = 0.0
    for node in nodes:
        if not _is_visible(node):
            continue
        match_string = node.attr("class") + " " + node.attr("id")
        if RE_UNLIKELY.search(match_string) and not _RE_OK_MAYBE_READERABLE.search(
            match_string
        ):
            continue
        if node.tag == "p" and id(node) in li_ps:
            continue
        text_len = len(dom.text(node).strip())
        if text_len < min_content_length:
            continue
        score += math.sqrt(text_len - min_content_length)
        if score > min_score:
            return True
    return False
