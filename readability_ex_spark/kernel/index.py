"""Flat node index over the DOM tree (reference: index.ex).

One pass, DFS pre-order, sequential ids (deterministic — the reference
uses System.unique_integer, index.ex:54, which we deliberately replace
for reproducible output). Per-node text and link stats are computed
bottom-up in the same pass (O(total text) instead of the reference's
per-node Floki.text rescans, cf. SURVEY.md §4.1).
"""

from __future__ import annotations

from readability_ex_spark.kernel.dom import Element


class Node:
    __slots__ = (
        "id", "tag", "el", "parent_id", "child_ids", "text",
        "link_density", "class_", "id_attr", "role", "dir", "hidden",
    )

    def __init__(self, id_: int, tag: str, el: Element, parent_id: int | None):
        self.id = id_
        self.tag = tag
        self.el = el
        self.parent_id = parent_id
        self.child_ids: list[int] = []
        self.text = ""
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
        if el.tag == "a":
            href = el.attr("href")
            coef = 0.3 if href.startswith("#") else 1.0
            link_len += len(own_text) * coef

        node.text = own_text
        n = len(own_text)
        node.link_density = (link_len - _self_link(el, own_text)) / n if n else 0.0

        node.class_ = el.attr("class")
        node.id_attr = el.attr("id")
        node.role = el.attr("role")
        node.dir = el.attr("dir")

        aria_hidden = el.attr("aria-hidden").lower() == "true"
        fallback_image = (
            node.class_ != "" and "fallback-image" in node.class_.lower()
        )
        style = el.attr("style").lower()
        node.hidden = (
            el.attr("hidden") != ""
            or (aria_hidden and not fallback_image)
            or "display:none" in style
            or "visibility:hidden" in style
        )
        return nid, own_text, link_len

    for top in doc:
        walk(top, None)
    return state, el_ids


def _self_link(el: Element, own_text: str) -> float:
    """link_density in the reference counts <a> descendants of the node —
    the node's own <a>-ness included only if it's in Floki.find(node,"a"),
    which matches the node itself too. So for an <a> node itself the self
    contribution stays; this helper exists to document that and returns 0."""
    return 0.0
