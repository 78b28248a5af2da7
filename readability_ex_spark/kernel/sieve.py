"""The sieve: filtering, scoring, candidate promotion, sibling joining,
and the post-processing cleaner chain (reference: sieve.ex).

State model: the node table (index.build) is immutable and shared across
the four flag passes (readability_ex.ex:33-64); each pass keeps its own
``removed`` id set and score maps (the reference filters copies of the
state map — same semantics, ids only). Output honors removals: subtrees
whose root id is in ``removed`` are excluded when the article is copied
for cleaning (Readability.js DOM-mutation semantics; the fixture goldens
encode that behavior).
"""

from __future__ import annotations

import re

from readability_ex_spark.kernel import cleaner, dom, metrics
from readability_ex_spark.kernel.constants import (
    CANDIDATE_TAGS,
    DEFAULT_CHAR_THRESHOLD,
    FLAG_CLEAN_CONDITIONALLY,
    FLAG_STRIP_UNLIKELYS,
    FLAG_WEIGHT_CLASSES,
    RE_BYLINE,
    RE_COMMAS,
    RE_NEGATIVE,
    RE_OK_MAYBE,
    RE_UNLIKELY,
    TAG_SCORE_BASE,
    has_flag,
)
from readability_ex_spark.kernel.dom import Comment, Doctype, Element
from readability_ex_spark.kernel.index import Node

_RE_ARTICLE_ID = re.compile(r"\bnews-article\b|\bstory\b", re.I | re.A)
_RE_TRAILING_DASH = re.compile(r"\s*[\-–—]+$", re.A)
_RE_BY_PREFIX = re.compile(r"^(par|by)\b", re.I | re.A)
_RE_AUTEUR = re.compile(r"\bauteur\b", re.I | re.A)
_RE_AUTHORNAME = re.compile(r"\bauthorname\b", re.I | re.A)
_RE_PAR_X = re.compile(r"^Par\s+\S+", re.I | re.A)
# Readability.js keeps short sibling <p>s only on /\.( |$)/
# (00_original_code.js:1502); the reference widened it to [.?!]
# (sieve.ex:483) — goldens follow JS.
_RE_SENT_END = re.compile(r"\.( |$)", re.A)
_RE_WS = re.compile(r"\s+", re.A)


class PassState:
    """Per-pass view over the shared node table."""

    __slots__ = ("nodes", "el_ids", "removed", "score", "content_score",
                 "is_candidate")

    def __init__(self, nodes: dict[int, Node], el_ids: dict[int, int]):
        self.nodes = nodes
        self.el_ids = el_ids
        self.removed: set[int] = set()
        self.score: dict[int, float] = {}
        self.content_score: dict[int, float] = {}
        self.is_candidate: set[int] = set()

    def get(self, nid) -> Node | None:
        if nid is None or nid in self.removed:
            return None
        return self.nodes.get(nid)

    def live_ids(self):
        """Document order (ids are DFS pre-order)."""
        return (i for i in self.nodes if i not in self.removed)

    def remove(self, nid: int) -> None:
        self.removed.add(nid)


def grab_article(
    nodes: dict[int, Node],
    el_ids: dict[int, int],
    flags: int,
    base_uri: str | None,
    absolute_fragments: bool,
    article_title: str,
    opts: dict,
    meta: dict,
):
    """sieve.ex:17-88. Returns dict or None (no candidate)."""
    ps = PassState(nodes, el_ids)

    _drop_hidden(ps)
    _drop_aria_roles(ps)
    _drop_modal_dialogs(ps)
    if has_flag(flags, FLAG_STRIP_UNLIKELYS):
        _strip_unlikely(ps)
    _drop_empty_containers(ps)
    byline = _drop_bylines(ps, meta)
    _drop_title_duplicates(ps, article_title)

    _score_candidates(ps, flags)
    top_id, top_candidates = _pick_top_candidate(ps, opts)
    if top_id is None:
        return None

    top_id = _promote_common_ancestor(ps, top_id, top_candidates, flags)
    top_id = _promote_content_ancestor(ps, top_id)
    # NB: the reference's promote_article_container (sieve.ex:344-358) and
    # promote_byline_container (sieve.ex:360-387) are deliberately absent —
    # they are reference-specific compensations with no Readability.js
    # counterpart, and they over-promote against the fixture goldens.

    article = _build_article_node(ps, top_id)

    preserve_classes = None if opts.get("keep_classes") else opts.get(
        "preserve_classes"
    )
    # Cleaner chain in the exact Readability.js _prepArticle +
    # _postProcessContent order (00_original_code.js). The reference's
    # extra cleaners (remove_semantic_junk, wrap_continue_links,
    # remove_title_headers, unwrap_content_main, code-table flattening —
    # sieve.ex:44-78) have no JS counterpart and are omitted; our
    # index-level drops already reach the output.
    cleaned = article
    cleaned = cleaner.clean_styles(cleaned)
    cleaned = cleaner.mark_data_tables(cleaned)
    cleaned = cleaner.fix_lazy_images(cleaned)
    if has_flag(flags, FLAG_CLEAN_CONDITIONALLY):
        cleaned = cleaner.clean_conditionally(cleaned, ("form", "fieldset"))
    for t in ("object", "embed", "footer", "link", "aside"):
        cleaned = cleaner.clean_tag(cleaned, t)
    cleaned = cleaner.clean_share_elements(cleaned, DEFAULT_CHAR_THRESHOLD)
    for t in ("iframe", "input", "textarea", "select", "button"):
        cleaned = cleaner.clean_tag(cleaned, t)
    cleaned = cleaner.clean_headers(cleaned)
    if has_flag(flags, FLAG_CLEAN_CONDITIONALLY):
        cleaned = cleaner.clean_conditionally(cleaned, ("table", "ul", "div"))
    cleaned = cleaner.downgrade_h1(cleaned)
    cleaned = cleaner.remove_empty_nodes(cleaned)
    cleaned = cleaner.remove_br_before_p(cleaned)
    cleaned = cleaner.flatten_tables(cleaned)
    # _postProcessContent
    cleaned = cleaner.absolutize_uris(cleaned, base_uri, absolute_fragments)
    cleaned = cleaner.replace_javascript_links(cleaned)
    cleaned = cleaner.simplify_nested_elements(cleaned)
    cleaned = cleaner.strip_attributes_and_classes(cleaned, preserve_classes)

    return {
        "content_html": dom.raw_html(cleaned),
        "text": dom.text(cleaned),
        "byline": byline if byline is not None else _find_byline_near(ps, top_id),
        "dir": _get_direction(ps, top_id),
    }


# -- drops (S3-S9) -----------------------------------------------------------

def _drop_hidden(ps: PassState) -> None:
    for nid in list(ps.live_ids()):
        if ps.nodes[nid].hidden:
            ps.remove(nid)


_UNLIKELY_ROLES = frozenset(
    ["menu", "menubar", "complementary", "navigation", "alert", "alertdialog",
     "dialog"]
)


def _drop_aria_roles(ps: PassState) -> None:
    for nid in list(ps.live_ids()):
        r = ps.nodes[nid].role.lower()
        if r != "" and r in _UNLIKELY_ROLES:
            ps.remove(nid)


def _drop_modal_dialogs(ps: PassState) -> None:
    for nid in list(ps.live_ids()):
        n = ps.nodes[nid]
        if (
            n.el.attr("aria-modal").lower() == "true"
            and n.role.lower() == "dialog"
        ):
            ps.remove(nid)


def _strip_unlikely(ps: PassState) -> None:
    for nid in list(ps.live_ids()):
        n = ps.nodes[nid]
        s = n.class_ + " " + n.id_attr
        if (
            RE_UNLIKELY.search(s)
            and not RE_OK_MAYBE.search(s)
            and not _has_ancestor_tag(ps, nid, "table")
            and not _has_ancestor_tag(ps, nid, "code")
            and n.tag not in ("body", "a")
        ):
            ps.remove(nid)


def _has_ancestor_tag(ps: PassState, nid: int, tag: str) -> bool:
    """Up to 4 ancestor levels; chain stops past a removed node
    (sieve.ex:678-691)."""
    node = ps.nodes.get(nid)
    pid = node.parent_id if node else None
    for _ in range(4):
        if pid is None:
            return False
        pn = ps.get(pid)  # None if removed: chain stops there
        if pn is None:
            return False
        if pn.tag == tag:
            return True
        pid = pn.parent_id
    return False


def _drop_empty_containers(ps: PassState) -> None:
    for nid in list(ps.live_ids()):
        n = ps.nodes[nid]
        if n.tag in ("div", "section", "header", "h1", "h2", "h3", "h4", "h5", "h6"):
            if n.text.strip() != "":
                continue
            elements = n.el.element_children()
            br_hr = sum(1 for e in elements if e.tag in ("br", "hr"))
            if len(elements) == 0 or len(elements) == br_hr:
                ps.remove(nid)


def _drop_bylines(ps: PassState, meta: dict) -> str | None:
    """sieve.ex:791-838; returns byline text if a node was consumed."""
    byline = meta.get("byline")
    if isinstance(byline, str) and byline.strip() != "":
        return None
    root_id = _find_root_id(ps)
    if root_id is not None:
        nodes_in_order = _collect_nodes_in_order(ps, root_id)
    else:
        nodes_in_order = [ps.nodes[i] for i in ps.live_ids()]

    candidates = [n for n in nodes_in_order if _valid_byline_node(n)]
    chosen = None
    for n in candidates:
        if _RE_BY_PREFIX.match(_normalize_byline_text(n.text)):
            chosen = n
            break
    if chosen is None and candidates:
        chosen = candidates[0]
    if chosen is None:
        return None
    text = _find_itemprop_name(chosen.el)
    if text is None:
        text = chosen.text
    ps.remove(chosen.id)
    return _normalize_byline_text(text)


def _valid_byline_node(n: Node) -> bool:
    match_string = n.class_ + " " + n.id_attr
    rel = n.el.attr("rel").lower()
    itemprop = n.el.attr("itemprop").lower()
    blen = len(n.text.strip())
    return (
        rel == "author"
        or "author" in itemprop
        or bool(RE_BYLINE.search(match_string))
    ) and 0 < blen < 100


def _normalize_byline_text(text: str) -> str:
    return _RE_TRAILING_DASH.sub("", text.strip()).strip()


def _find_itemprop_name(el: Element) -> str | None:
    for node in dom.find(el, "[itemprop]"):
        if "name" in node.attr("itemprop").lower():
            t = dom.text(node).strip()
            if t != "":
                return t
    return None


def _find_root_id(ps: PassState) -> int | None:
    for nid in ps.live_ids():
        if ps.nodes[nid].tag == "html":
            return nid
    for nid in ps.live_ids():
        if ps.nodes[nid].tag == "body":
            return nid
    return None


def _collect_nodes_in_order(ps: PassState, root_id: int) -> list[Node]:
    out: list[Node] = []

    def rec(nid):
        n = ps.get(nid)
        if n is None:
            return
        out.append(n)
        for cid in n.child_ids:
            rec(cid)

    rec(root_id)
    return out


def _drop_title_duplicates(ps: PassState, title: str) -> None:
    title = (title or "").strip()
    if title == "":
        return
    matching = [
        nid for nid in ps.live_ids()
        if ps.nodes[nid].tag in ("h1", "h2")
        and cleaner.text_similarity(title, ps.nodes[nid].text) > 0.75
    ]
    if matching:
        ps.remove(min(matching))


# -- scoring (S10-S11) --------------------------------------------------------

def _class_weight(n: Node, flags: int) -> int:
    if has_flag(flags, FLAG_WEIGHT_CLASSES):
        return metrics.class_weight(n.class_, n.id_attr)
    return 0


def _ancestor_ids(ps: PassState, nid: int, max_depth: int) -> list[int]:
    """Parent chain; includes a removed ancestor id (skipped by the caller)
    but stops the walk there (sieve.ex:670-676)."""
    out = []
    node = ps.nodes.get(nid)
    pid = node.parent_id if node else None
    while pid is not None and len(out) < max_depth:
        out.append(pid)
        pn = ps.nodes.get(pid)
        if pid in ps.removed or pn is None:
            break
        pid = pn.parent_id
    return out


def _score_candidates(ps: PassState, flags: int) -> None:
    for nid in list(ps.live_ids()):
        n = ps.nodes[nid]
        # innerText semantics (trim + collapse) per Readability.js
        if n.tag not in CANDIDATE_TAGS or len(n.norm_text) < 25:
            continue
        comma_segments = len(RE_COMMAS.split(n.norm_text))
        len_bonus = min(float(len(n.norm_text) // 100), 3.0)
        content_score = 1.0 + comma_segments + len_bonus
        for level, ancestor_id in enumerate(_ancestor_ids(ps, nid, 5)):
            anc = ps.get(ancestor_id)
            if anc is None:
                continue
            if ancestor_id not in ps.is_candidate:
                base = float(
                    TAG_SCORE_BASE.get(anc.tag, 0) + _class_weight(anc, flags)
                )
                ps.is_candidate.add(ancestor_id)
                ps.score[ancestor_id] = base
                ps.content_score[ancestor_id] = base
            divider = 1 if level == 0 else (2 if level == 1 else level * 3)
            add = content_score / divider
            ps.score[ancestor_id] = ps.score.get(ancestor_id, 0.0) + add
            ps.content_score[ancestor_id] = (
                ps.content_score.get(ancestor_id, 0.0) + add
            )


def _pick_top_candidate(ps: PassState, opts: dict):
    """sieve.ex:225-261: final score scaled by (1 - link_density)."""
    cand_ids = [
        nid for nid in ps.live_ids()
        if nid in ps.is_candidate
        and ps.nodes[nid].tag not in ("html", "body", "head")
    ]
    for nid in cand_ids:
        final = ps.content_score.get(nid, 0.0) * (
            1.0 - ps.nodes[nid].link_density
        )
        ps.score[nid] = final
        ps.content_score[nid] = final

    nb_top = opts.get("nb_top_candidates", 5)
    top_candidates = sorted(
        cand_ids, key=lambda i: (-ps.score.get(i, 0.0), i)
    )[:nb_top]
    top_id = top_candidates[0] if top_candidates else None

    if top_id is None or ps.score.get(top_id, 0.0) <= 0.0:
        body_id = next(
            (nid for nid in ps.live_ids() if ps.nodes[nid].tag == "body"), None
        )
        return (body_id if body_id is not None else top_id), top_candidates
    return top_id, top_candidates


# -- promotions (S12-S16) ------------------------------------------------------

def _ensure_initialized(ps: PassState, nid: int, flags: int) -> None:
    n = ps.get(nid)
    if n is None or nid in ps.is_candidate:
        return
    base = float(TAG_SCORE_BASE.get(n.tag, 0) + _class_weight(n, flags))
    ps.is_candidate.add(nid)
    ps.score[nid] = base
    ps.content_score[nid] = base


def _ancestor_chain(ps: PassState, nid: int) -> list[int]:
    """Chain including self, stopping past removed (sieve.ex:397-410)."""
    out = []
    cur = nid
    while cur is not None:
        out.append(cur)
        n = ps.get(cur)
        cur = n.parent_id if n is not None else None
    return out


def _promote_common_ancestor(ps, top_id, top_candidates, flags):
    top = ps.get(top_id)
    if top is None:
        return top_id
    top_score = max(0.0001, ps.score.get(top_id, 0.0))
    alternative = [
        cid for cid in top_candidates[1:]
        if ps.get(cid) is not None
        and ps.score.get(cid, 0.0) / top_score >= 0.75
    ]
    alternative_ancestors = [_ancestor_chain(ps, cid) for cid in alternative]
    min_candidates = 3
    new_top = top_id
    if len(alternative_ancestors) >= min_candidates:
        found = _find_common_ancestor(
            ps, top.parent_id, alternative_ancestors, min_candidates
        )
        if found is not None:
            new_top = found
    _ensure_initialized(ps, new_top, flags)
    return new_top


def _find_common_ancestor(ps, parent_id, alternative_ancestors, min_candidates):
    while True:
        parent = ps.get(parent_id)
        if parent is None:
            return None
        if parent.tag == "body":
            return None
        containing = sum(
            1 for chain in alternative_ancestors if parent_id in chain
        )
        if containing >= min_candidates:
            return parent_id
        parent_id = parent.parent_id


def _promote_content_ancestor(ps: PassState, top_id: int) -> int:
    top = ps.get(top_id)
    if top is None:
        return top_id
    last_score = ps.score.get(top_id, 0.0)
    score_threshold = last_score / 3.0
    current_id = top_id
    pid = top.parent_id
    while pid is not None:
        parent = ps.get(pid)
        if parent is None:
            break
        if parent.tag == "body":
            break
        if pid not in ps.is_candidate:
            pid = parent.parent_id
            continue
        pscore = ps.score.get(pid, 0.0)
        if pscore < score_threshold:
            break
        if pscore > last_score:
            current_id = pid
            break
        last_score = pscore
        pid = parent.parent_id
    return _promote_single_child(ps, current_id)


def _promote_single_child(ps: PassState, top_id: int) -> int:
    """While the parent has exactly one LIVE element child, promote —
    Readability.js counts live DOM children after removals
    (00_original_code.js parentOfTopCandidate.children.length == 1; the
    reference uses stale build-time child_ids, sieve.ex:745)."""
    cur = top_id
    while True:
        node = ps.get(cur)
        if node is None:
            return top_id
        parent = ps.get(node.parent_id)
        if parent is None or parent.tag == "body":
            return cur
        live_children = [c for c in parent.child_ids if c not in ps.removed]
        if len(live_children) == 1:
            cur = parent.id
            continue
        return cur






# -- sibling joining (S17) -----------------------------------------------------

_ALTER_KEEP = frozenset(["div", "article", "section", "p", "ol", "ul"])


def _build_article_node(ps: PassState, top_id: int) -> Element:
    top = ps.get(top_id)
    wrapper_attrs = [("id", "readability-page-1"), ("class", "page")]
    if top is None:
        return Element("div", wrapper_attrs, [])

    if top.tag == "body":
        kids = _copy_children_live(ps, top.el)
        return Element("div", wrapper_attrs, kids)

    siblings = _siblings_of(ps, top_id)
    top_final = ps.score.get(top_id, 0.0)
    threshold = max(10.0, top_final * 0.2)
    kept: list = []
    for sib in siblings:
        if not _keep_sibling(ps, sib, top_id, top, threshold):
            continue
        el_copy = _copy_subtree_live(ps, sib.el)
        if el_copy is None:
            continue
        if sib.tag not in _ALTER_KEEP:
            el_copy.tag = "div"
        kept.append(el_copy)
    return Element("div", wrapper_attrs, kept)


def _siblings_of(ps: PassState, nid: int) -> list[Node]:
    node = ps.nodes[nid]
    parent = ps.get(node.parent_id)
    if parent is None:
        pid = node.parent_id
        return [
            ps.nodes[i] for i in ps.live_ids() if ps.nodes[i].parent_id == pid
        ]
    out = []
    for cid in parent.child_ids:
        child = ps.get(cid)
        if child is not None:
            out.append(child)
    return out


def _keep_sibling(ps, sib: Node, top_id: int, top: Node, threshold: float) -> bool:
    if sib.id == top_id:
        return True
    content_bonus = 0.0
    if sib.class_ != "" and sib.class_ == top.class_:
        content_bonus = ps.score.get(top_id, 0.0) * 0.2
    if (
        sib.id in ps.is_candidate
        and ps.score.get(sib.id, 0.0) + content_bonus >= threshold
    ):
        return True
    if sib.tag == "p":
        ln = len(sib.norm_text)
        if ln > 80 and sib.link_density < 0.25:
            return True
        if (
            0 < ln < 80
            and sib.link_density == 0.0
            and _RE_SENT_END.search(sib.norm_text)
        ):
            return True
    return False


def _copy_subtree_live(ps: PassState, el: Element) -> Element | None:
    """Deep copy excluding subtrees whose element id is in removed."""
    nid = ps.el_ids.get(id(el))
    if nid is not None and nid in ps.removed:
        return None
    kids = []
    for c in el.children:
        if isinstance(c, Element):
            cc = _copy_subtree_live(ps, c)
            if cc is not None:
                kids.append(cc)
        elif isinstance(c, Comment):
            kids.append(Comment(c.data))
        elif isinstance(c, Doctype):
            kids.append(Doctype(c.data))
        else:
            kids.append(c)
    return Element(el.tag, list(el.attrs), kids)


def _copy_children_live(ps: PassState, el: Element) -> list:
    out = []
    for c in el.children:
        if isinstance(c, Element):
            cc = _copy_subtree_live(ps, c)
            if cc is not None:
                out.append(cc)
        elif isinstance(c, Comment):
            out.append(Comment(c.data))
        else:
            out.append(c)
    return out


# -- byline near top (S18) ----------------------------------------------------

def _find_byline_near(ps: PassState, top_id: int) -> str | None:
    chain_ids = []
    cur = top_id
    while cur is not None:
        chain_ids.append(cur)
        n = ps.get(cur)
        cur = n.parent_id if n is not None else None

    candidates: list[str] = []
    seen = set()
    for nid in chain_ids:
        n = ps.get(nid)
        if n is None:
            continue
        for t in _find_all_bylines_in(n.el):
            t = t.strip()
            if 3 <= len(t) <= 120 and t not in seen:
                seen.add(t)
                candidates.append(t)

    best = None
    if candidates:
        best = max(
            enumerate(candidates),
            key=lambda iv: (_byline_priority(iv[1]), len(iv[1]), -iv[0]),
        )[1]
    if best is None or len(best) <= 4:
        fb = _fallback_byline(ps, top_id)
        return fb if fb is not None else best
    return best


def _byline_priority(text: str) -> int:
    return 2 if _RE_BY_PREFIX.match(text) else 1


def _find_all_bylines_in(el) -> list[str]:
    out: list[str] = []

    def rec(node):
        if isinstance(node, list):
            for c in node:
                rec(c)
            return
        if not isinstance(node, Element):
            return
        s = node.attr("class") + " " + node.attr("id")
        if RE_NEGATIVE.search(s) or RE_UNLIKELY.search(s):
            return
        if (
            _itemprop_author(node)
            or _RE_AUTEUR.search(s)
            or _rel_author(node)
            or RE_BYLINE.search(s)
        ):
            out.append(_RE_TRAILING_DASH.sub("", dom.text(node).strip()))
        rec(node.children)

    rec(el)
    return out


def _rel_author(node: Element) -> bool:
    return any(p == "author" for p in _RE_WS.split(node.attr("rel").lower()))


def _itemprop_author(node: Element) -> bool:
    return any(
        "author" in p
        for p in _RE_WS.split(node.attr("itemprop").lower())
        if p != ""
    )


def _fallback_byline(ps: PassState, root_id: int) -> str | None:
    for n in _collect_nodes_in_order(ps, root_id):
        s = n.class_ + " " + n.id_attr
        if _RE_AUTHORNAME.search(s):
            name = n.text.strip()
            if name != "":
                found = "Par " + name
                return found if 3 <= len(found) <= 120 else None
        else:
            t = n.text.strip()
            if _RE_PAR_X.match(t):
                return t if 3 <= len(t) <= 120 else None
    return None


def _get_direction(ps: PassState, top_id: int) -> str | None:
    """Article direction per Readability.js: check the top candidate's
    PARENT first, then the top candidate, then the parent's ancestors
    (00_original_code.js 'Find out text direction from ancestors')."""
    top = ps.nodes.get(top_id)
    if top is None:
        return None
    order = []
    parent = ps.nodes.get(top.parent_id) if top.parent_id else None
    if parent is not None:
        order.append(parent)
    order.append(top)
    cur = parent.parent_id if parent is not None else None
    while cur is not None:
        n = ps.nodes.get(cur)
        if n is None:
            break
        order.append(n)
        cur = n.parent_id
    for n in order:
        if n.dir:
            return n.dir
    return None
