"""Outlink harvest from the parsed DOM — the per-document-accurate
counterpart of the bulk regex path (``operators/linkgraph.py``).

Runs BEFORE ``parse()`` mutates the tree (same contract as the paging
and policy harvests): every ``<a href>`` in the ORIGINAL document,
resolved through the kernel's WHATWG absolutizer
(``cleaner._to_abs`` — the same resolution Readability.js applies in
``_fixRelativeUris``, 00_original_code.js), restricted to the
crawlable http(s) graph, fragment-stripped, order-preserving-deduped,
and capped so a link-farm page with 10^5 anchors cannot produce an
unbounded array cell in the output table.
"""

from __future__ import annotations

import re

from readability_ex_spark.kernel import dom
from readability_ex_spark.kernel.cleaner import _to_abs

_RE_SKIP = re.compile(r"^(mailto|tel|data|javascript|about):", re.I)
_RE_HTTP = re.compile(r"^https?://", re.I)

DEFAULT_MAX_OUTLINKS = 100


def collect_outlinks(
    doc, base_uri: str | None, max_links: int = DEFAULT_MAX_OUTLINKS
) -> list[str]:
    """Absolutized http(s) link targets of ``doc``, document order,
    first occurrence wins, at most ``max_links``."""
    seen: set[str] = set()
    out: list[str] = []
    for link in dom.find(doc, "a[href]"):
        href = link.attr("href").strip()
        if href == "" or href.startswith("#") or _RE_SKIP.match(href):
            continue
        ab = _to_abs(href, base_uri) if base_uri else href
        if not _RE_HTTP.match(ab):
            continue
        ab = ab.split("#", 1)[0]
        if ab in seen:
            continue
        seen.add(ab)
        out.append(ab)
        if len(out) >= max_links:
            break
    return out
