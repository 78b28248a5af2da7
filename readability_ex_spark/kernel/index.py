"""Flat node index over the DOM tree (reference: index.ex).

One pass, DFS pre-order, sequential ids (deterministic — the reference
uses System.unique_integer, index.ex:54, which we deliberately replace
for reproducible output). Per-node text and link stats are computed
bottom-up in the same pass (O(total text) instead of the reference's
per-node Floki.text rescans, cf. SURVEY.md §4.1).
"""

from __future__ import annotations

import re

from readability_ex_spark.kernel.dom import Element

# Readability.js innerText: textContent.trim() + collapse of 2+ whitespace
# runs (REGEXPS.normalize = /\s{2,}/g) — Unicode-aware like JS \s.
_RE_NORM = re.compile(r"\s{2,}")


def inner_text(raw: str) -> str:
    return _RE_NORM.sub(" ", raw.strip())


class Node:
    __slots__ = (
        "id", "tag", "el", "parent_id", "child_ids", "text", "norm_text",
        "link_density", "class_", "id_attr", "role", "dir", "hidden",
    )

    def __init__(self, id_: int, tag: str, el: Element, parent_id: int | None):
        self.id = id_
        self.tag = tag
        self.el = el
        self.parent_id = parent_id
        self.child_ids: list[int] = []
        self.text = ""
        self.norm_text = ""
        self.link_density = 0.0
        self.class_ = ""
        self.id_attr = ""
        self.role = ""
        self.dir = ""
        self.hidden = False


def build(doc: list) -> tuple[dict[int, Node], dict[int, int]]:
    """Build the node table.

    Returns (state, el_ids) where ``state`` maps node id -> Node and
    ``el_ids`` maps ``id(element_object)`` -> node id (used to honor
    index-level removals when copying subtrees for output).
    """
    state: dict[int, Node] = {}
    el_ids: dict[int, int] = {}
    counter = [0]

    def walk(el, parent_id):
        """Returns (node_id | None, text, link_len_weighted)."""
        if isinstance(el, str):
            return None, el, 0.0
        if not isinstance(el, Element):
            return None, "", 0.0
        counter[0] += 1
        nid = counter[0]
        node = Node(nid, el.tag, el, parent_id)
        state[nid] = node
        el_ids[id(el)] = nid

        texts: list[str] = []
        link_len = 0.0
        for child in el.children:
            cid, ctext, clink = walk(child, nid)
            if cid is not None:
                node.child_ids.append(cid)
            texts.append(ctext)
            link_len += clink

        own_text = "" if el.tag == "script" else "".join(texts)
        if el.tag == "script":
            link_len = 0.0

        node.text = own_text
        node.norm_text = inner_text(own_text)
        # link density per Readability.js _getLinkDensity: innerText
        # lengths, <a> descendants only (not self), 0.3 coefficient for
        # /^#.+/ fragment hrefs (00_original_code.js REGEXPS.hashUrl)
        n = len(node.norm_text)
        node.link_density = link_len / n if n else 0.0
        if el.tag == "a":
            href = el.attr("href")
            coef = 0.3 if _RE_HASH_URL.match(href) else 1.0
            link_len += len(node.norm_text) * coef

        node.class_ = el.attr("class")
        node.id_attr = el.attr("id")
        node.role = el.attr("role")
        node.dir = el.attr("dir")

        aria_hidden = el.attr("aria-hidden").lower() == "true"
        fallback_image = (
            node.class_ != "" and "fallback-image" in node.class_.lower()
        )
        node.hidden = (
            el.has_attr("hidden")
            or (aria_hidden and not fallback_image)
            or _style_hides(el.attr("style"))
        )
        return nid, own_text, link_len

    for top in doc:
        walk(top, None)
    return state, el_ids


_RE_HASH_URL = re.compile(r"^#.+")


def _style_hides(style: str) -> bool:
    """display:none / visibility:hidden with CSS-style whitespace tolerance
    (Readability.js _isProbablyVisible reads parsed node.style; the
    reference's raw substring check, index.ex:71-72, misses 'display: none')."""
    if not style:
        return False
    for decl in style.lower().split(";"):
        prop, _, value = decl.partition(":")
        prop = prop.strip()
        value = value.strip()
        if prop == "display" and value == "none":
            return True
        if prop == "visibility" and value == "hidden":
            return True
    return False


