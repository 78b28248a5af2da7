"""The sieve: grab-article walk, scoring, candidate promotion, sibling
joining, and the post-processing cleaner chain.

Mirrors Readability.js _grabArticle (00_original_code.js; the reference's
sieve.ex re-expresses the same stages over its node table):

1. one pre-order walk over the shared node table applying, per node:
   visibility -> modal -> byline -> title-duplicate header -> unlikely
   (class/id + roles, flag-gated) -> empty containers;
2. a pass-private tree copy with the removals applied;
3. in-walk div conversion (phrasing runs wrapped into <p>, div-with-
   single-p replaced, divs without block descendants re-tagged <p>);
4. a second node index over the converted tree for scoring, top-candidate
   selection, promotions, and sibling joining;
5. the cleaner chain in _prepArticle/_postProcessContent order.

The node table is immutable and shared across the four flag passes
(readability_ex.ex:33-64); each pass owns its removal set and tree copy.
"""

from __future__ import annotations

import re

from readability_ex_spark.kernel import cleaner, dom, index as index_mod, metrics
from readability_ex_spark.kernel.constants import (
    CANDIDATE_TAGS,
    DEFAULT_CHAR_THRESHOLD,
    FLAG_CLEAN_CONDITIONALLY,
    FLAG_STRIP_UNLIKELYS,
    FLAG_WEIGHT_CLASSES,
    RE_BYLINE,
    RE_COMMAS,
    RE_OK_MAYBE,
    RE_UNLIKELY,
    TAG_SCORE_BASE,
    UNLIKELY_ROLES,
    has_flag,
)
from readability_ex_spark.kernel.dom import Comment, Doctype, Element
from readability_ex_spark.kernel.index import Node

_RE_WS = re.compile(r"\s+", re.A)
_RE_TRAILING_DASH = re.compile(r"\s*[\-–—]+$", re.A)
# Readability.js keeps short sibling <p>s only on /\.( |$)/
_RE_SENT_END = re.compile(r"\.( |$)", re.A)

# DIV_TO_P_ELEMS (00_original_code.js): block markers for the recursive
# has-child-block check driving div->p conversion
_DIV_TO_P_ELEMS = frozenset(
    ["blockquote", "dl", "div", "img", "ol", "p", "pre", "table", "ul"]
)

_EMPTYABLE_TAGS = frozenset(
    ["div", "section", "header", "h1", "h2", "h3", "h4", "h5", "h6"]
)

_ALTER_KEEP = frozenset(["div", "article", "section", "p", "ol", "ul"])


class PassState:
    """View over a node table; ``removed`` is only used for stage-1."""

    __slots__ = (
        "nodes", "el_ids", "removed", "score", "is_candidate",
        "weight_nonzero",
    )

    def __init__(self, nodes: dict[int, Node], el_ids: dict[int, int]):
        self.nodes = nodes
        self.el_ids = el_ids
        self.removed: set[int] = set()
        self.score: dict[int, float] = {}
        self.is_candidate: set[int] = set()
        self.weight_nonzero = False  # any scored node with class weight != 0

    def get(self, nid) -> Node | None:
        if nid is None or nid in self.removed:
            return None
        return self.nodes.get(nid)


def grab_article(
    doc: list,
    flags: int,
    base_uri: str | None,
    absolute_fragments: bool,
    article_title: str,
    opts: dict,
    meta: dict,
    known_byline: str | None = None,
    effects: dict | None = None,
):
    """One flag pass over a pass-private copy of the prepped tree.
    Returns result dict or None (nothing to extract).

    ``known_byline``: byline found by an earlier pass — Readability.js
    keeps _articleByline across grabArticle retries, so later passes
    neither hunt for nor remove byline nodes.

    ``effects``: optional dict this pass fills with whether each flag
    actually CHANGED anything — ``strip`` (the unlikely-candidates
    branch removed a node), ``weight`` (some scored node had a nonzero
    class weight), ``cond`` (conditional cleaning removed a node). A
    flag that had no effect can be cleared without changing the output,
    which lets the retry loop skip provably-identical passes
    (api.py:parse)."""
    roots: list = [
        c.copy_deep() if isinstance(c, Element) else c for c in doc
    ]
    walker = _GrabWalk(flags, article_title, meta, known_byline)
    walker.stats = _subtree_stats(roots)
    roots = walker.walk_list(roots, [])
    byline = walker.byline
    if effects is not None:
        effects["strip"] = walker.strip_removed
        # a NEWLY found byline changes the next pass's input: with
        # known_byline set, the walker keeps the byline node it removed
        # here — the retry is not identical and must not be skipped.
        # When known_byline was ALREADY set, walker.byline is non-None by
        # construction (it is initialized from known_byline) but nothing
        # new was found — a pass re-running with the same known_byline is
        # a true replay and MAY be skipped.
        effects["byline"] = walker.byline is not None and known_byline is None
    if not any(isinstance(r, Element) for r in roots):
        return None

    nodes2, el_ids2 = index_mod.build(roots)
    ps2 = PassState(nodes2, el_ids2)
    _score_candidates(ps2, flags)
    top_id = _pick_top_candidate(ps2, opts, flags)
    if effects is not None:
        # INVARIANT the skip-noop optimization relies on: class weight is
        # tracked here (candidate scoring) ONLY. cleaner.py's
        # clean_conditionally (cleaner.py:558) and clean_headers
        # (cleaner.py:672) call metrics.class_weight UN-GATED by
        # FLAG_WEIGHT_CLASSES — a deliberate divergence from the JS
        # _getClassWeight (00_original_code.js:2169, which zeroes weight
        # when the flag is cleared) under which the golden corpus passes. If
        # cleaner gating is ever aligned with the JS, those call sites
        # must ALSO set weight_nonzero or the skip becomes output-changing.
        effects["weight"] = ps2.weight_nonzero
    if top_id is None:
        return None

    article = _build_article_node(ps2, top_id)

    preserve_classes = None if opts.get("keep_classes") else opts.get(
        "preserve_classes"
    )
    # Cleaner chain in the exact Readability.js _prepArticle +
    # _postProcessContent order. The reference's extra cleaners
    # (remove_semantic_junk, wrap_continue_links, remove_title_headers,
    # unwrap_content_main, code-table flattening — sieve.ex:44-78) have no
    # JS counterpart and are omitted.
    cleaned = article
    cleaned = cleaner.clean_styles(cleaned)
    cleaned = cleaner.mark_data_tables(cleaned)
    cleaned = cleaner.fix_lazy_images(cleaned)
    if has_flag(flags, FLAG_CLEAN_CONDITIONALLY):
        _n0 = _count_elements(cleaned) if effects is not None else 0
        cleaned = cleaner.clean_conditionally(cleaned, ("form", "fieldset"))
        if effects is not None and _count_elements(cleaned) != _n0:
            effects["cond"] = True
    cleaned = cleaner.clean_tag(cleaned, "object")
    cleaned = cleaner.clean_tag(cleaned, "embed")
    cleaned = cleaner.clean_tags(cleaned, frozenset(["footer", "link", "aside"]))
    cleaned = cleaner.clean_share_elements(cleaned, DEFAULT_CHAR_THRESHOLD)
    cleaned = cleaner.clean_tags(
        cleaned,
        frozenset(["iframe", "input", "textarea", "select", "button"]),
        video_exempt=True,
    )
    cleaned = cleaner.clean_headers(cleaned)
    if has_flag(flags, FLAG_CLEAN_CONDITIONALLY):
        _n0 = _count_elements(cleaned) if effects is not None else 0
        cleaned = cleaner.clean_conditionally(cleaned, ("table", "ul", "div"))
        if effects is not None and _count_elements(cleaned) != _n0:
            effects["cond"] = True
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
        "tree": cleaned,
        "byline": byline,
        "dir": _get_direction(ps2, top_id),
    }


# -- stage 1: the grab walk ---------------------------------------------------
# One pre-order pass over the live (pass-private) tree applying, per node
# and in Readability.js order: visibility -> modal -> byline ->
# title-duplicate header -> unlikely (class/id + roles) -> empty
# containers -> div conversion. Removal and conversion interleave exactly
# like the JS while-loop: a node's conversion decision sees descendants
# that are only removed later in the walk.

def _count_elements(node) -> int:
    """Element count of a subtree — conditional cleaning only ever
    REMOVES nodes, so an unchanged count proves it was a no-op."""
    if not isinstance(node, Element):
        return 0
    n = 1
    for c in node.children:
        if isinstance(c, Element):
            n += _count_elements(c)
    return n


def _subtree_stats(roots: list) -> dict[int, tuple[bool, int]]:
    """One bottom-up pass: id(element) -> (has_nonws_text, n_br_hr_desc).

    Exact for the walk's visit-time checks (pre-order: a node's own
    subtree is untouched when it is visited), and turns the per-node
    empty-container check from O(subtree) into O(1) — pathological deep
    chains would otherwise make the walk quadratic."""
    stats: dict[int, tuple[bool, int]] = {}

    def rec(el) -> tuple[bool, int]:
        has_text = False
        brhr = 1 if el.tag in ("br", "hr") else 0
        for c in el.children:
            if isinstance(c, Element):
                ct, cb = rec(c)
                has_text = has_text or ct
                brhr += cb
            elif isinstance(c, str) and not has_text and c.strip() != "":
                has_text = True
        stats[id(el)] = (has_text, brhr)
        return has_text, brhr

    for r in roots:
        if isinstance(r, Element):
            rec(r)
    return stats


class _GrabWalk:
    def __init__(self, flags: int, article_title: str, meta: dict,
                 known_byline: str | None = None):
        self.strip = has_flag(flags, FLAG_STRIP_UNLIKELYS)
        self.strip_removed = False  # did the strip flag remove anything?
        mb = meta.get("byline")
        self.have_byline = isinstance(mb, str) and mb.strip() != ""
        self.byline: str | None = known_byline
        self.stats: dict[int, tuple[bool, int]] = {}
        self.title = (article_title or "").strip()
        self.should_remove_title_header = bool(self.title)

    def walk_list(self, children: list, ancestors: list[str]) -> list:
        out = []
        for c in children:
            if isinstance(c, Element):
                r = self.visit(c, ancestors)
                if r is not None:
                    out.append(r)
            else:
                out.append(c)
        return out

    def visit(self, el: Element, ancestors: list[str]):
        if _el_hidden(el):
            return None
        if (
            el.attr("aria-modal").lower() == "true"
            and el.attr("role").lower() == "dialog"
        ):
            return None
        match_string = el.attr("class") + " " + el.attr("id")
        if self.byline is None and not self.have_byline:
            if _is_valid_byline_el(el, match_string):
                # prefer a descendant [itemprop~=name] for the author name
                # (00_original_code.js:1097-1110)
                name_node = next(
                    (
                        d for d in dom.iter_elements(el.children)
                        if "name" in d.attr("itemprop")
                    ),
                    None,
                )
                self.byline = dom.text(
                    name_node if name_node is not None else el
                ).strip()
                return None
        if (
            self.should_remove_title_header
            and el.tag in ("h1", "h2")
            and cleaner.text_similarity(self.title, dom.text(el).strip()) > 0.75
        ):
            self.should_remove_title_header = False
            return None
        if self.strip:
            if (
                RE_UNLIKELY.search(match_string)
                and not RE_OK_MAYBE.search(match_string)
                and "table" not in ancestors[-4:]
                and "code" not in ancestors[-4:]
                and el.tag not in ("body", "a")
            ):
                self.strip_removed = True
                return None
            if el.attr("role") in UNLIKELY_ROLES:
                self.strip_removed = True
                return None
        if el.tag in _EMPTYABLE_TAGS:
            stat = self.stats.get(id(el))
            if stat is not None:
                has_text, brhr = stat
                if not has_text:
                    elements = el.element_children()
                    if not elements or len(elements) == brhr:
                        return None
            elif _element_without_content_el(el):
                return None

        if el.tag == "div":
            el.children = _wrap_phrasing_runs(el.children)
            p_child = _single_p_child(el)
            if p_child is not None and metrics.link_density(el) < 0.25:
                # replace the div with its lone <p> (no attr merge — JS
                # replaceChild keeps only the child)
                el = p_child
            elif not _has_child_block(el):
                el.tag = "p"

        ancestors.append(el.tag)
        el.children = self.walk_list(el.children, ancestors)
        ancestors.pop()
        return el


def _el_hidden(el: Element) -> bool:
    """Readability.js _isProbablyVisible (negated)."""
    if el.has_attr("hidden"):
        return True
    if el.attr("aria-hidden").lower() == "true":
        cls = el.attr("class")
        if not (cls and "fallback-image" in cls.lower()):
            return True
    return index_mod._style_hides(el.attr("style"))


def _is_valid_byline_el(el: Element, match_string: str) -> bool:
    """Readability.js _checkByline + _isValidByline."""
    rel = el.attr("rel").lower()
    itemprop = el.attr("itemprop").lower()
    if not (
        rel == "author" or "author" in itemprop or RE_BYLINE.search(match_string)
    ):
        return False
    blen = len(dom.text(el).strip())
    return 0 < blen < 100


def _element_without_content_el(el: Element) -> bool:
    """JS _isElementWithoutContent: no trimmed text and either no element
    children or exactly as many as there are br+hr DESCENDANTS (sic)."""
    if dom.text(el).strip() != "":
        return False
    elements = el.element_children()
    if not elements:
        return True
    return len(elements) == len(dom.find(el, "br,hr"))


def _wrap_phrasing_runs(children: list) -> list:
    """Consecutive phrasing nodes -> <p>, edge whitespace/brs of each run
    dropped entirely (JS fragment trim)."""
    out: list = []
    i = 0
    n = len(children)
    while i < n:
        c = children[i]
        if cleaner._phrasing_content(c):
            j = i
            run = []
            while j < n and cleaner._phrasing_content(children[j]):
                run.append(children[j])
                j += 1
            start, end = 0, len(run)
            while start < end and cleaner._is_ws_js(run[start]):
                start += 1
            while end > start and cleaner._is_ws_js(run[end - 1]):
                end -= 1
            trimmed = run[start:end]
            if trimmed:
                if len(trimmed) == len(run) == 1 and isinstance(
                    trimmed[0], Element
                ) and trimmed[0].tag == "p":
                    out.append(trimmed[0])  # already a paragraph
                else:
                    out.append(Element("p", [], trimmed))
            i = j
        else:
            out.append(c)
            i += 1
    return out


def _single_p_child(el: Element):
    elements = el.element_children()
    if len(elements) == 1 and elements[0].tag == "p":
        if all(not isinstance(c, str) or c.strip() == "" for c in el.children):
            return elements[0]
    return None


def _has_child_block(el: Element) -> bool:
    """JS _hasChildBlockElement: recursive over all descendants."""
    for c in el.children:
        if isinstance(c, Element):
            if c.tag in _DIV_TO_P_ELEMS or _has_child_block(c):
                return True
    return False


# -- stage 3: scoring ---------------------------------------------------------

def _class_weight(n: Node, flags: int) -> int:
    if has_flag(flags, FLAG_WEIGHT_CLASSES):
        return metrics.class_weight(n.class_, n.id_attr)
    return 0


def _initialize(ps: PassState, nid: int, flags: int) -> None:
    n = ps.nodes[nid]
    ps.is_candidate.add(nid)
    w = _class_weight(n, flags)
    if w:
        ps.weight_nonzero = True
    ps.score[nid] = float(TAG_SCORE_BASE.get(n.tag, 0) + w)


def _score_candidates(ps: PassState, flags: int) -> None:
    nodes = ps.nodes
    for nid, n in nodes.items():
        if n.tag not in CANDIDATE_TAGS:
            continue
        if n.parent_id is None:
            continue
        if len(n.norm_text) < 25:
            continue
        content_score = (
            1.0
            + len(RE_COMMAS.split(n.norm_text))
            + min(float(len(n.norm_text) // 100), 3.0)
        )
        level = 0
        pid = n.parent_id
        while pid is not None and level < 5:
            anc = nodes[pid]
            # JS skips ancestors without an element parent (the root)
            if anc.parent_id is None:
                break
            if pid not in ps.is_candidate:
                _initialize(ps, pid, flags)
            divider = 1 if level == 0 else (2 if level == 1 else level * 3)
            ps.score[pid] += content_score / divider
            pid = anc.parent_id
            level += 1


def _pick_top_candidate(ps: PassState, opts: dict, flags: int) -> int | None:
    """Final score scaled by (1 - link_density); top-5 kept; body/None
    falls back to wrapping the whole page (JS neededToCreateTopCandidate
    is modeled by the body special-case in _build_article_node)."""
    for nid in ps.is_candidate:
        ps.score[nid] = ps.score[nid] * (1.0 - ps.nodes[nid].link_density)

    nb_top = opts.get("nb_top_candidates", 5)
    ranked = sorted(ps.is_candidate, key=lambda i: (-ps.score[i], i))
    top_candidates = ranked[:nb_top]
    top_id = top_candidates[0] if top_candidates else None

    if top_id is None or ps.nodes[top_id].tag == "body":
        body_id = next(
            (nid for nid, n in ps.nodes.items() if n.tag == "body"), None
        )
        if body_id is None:
            # no <body> element: treat the document root as the page
            body_id = next(iter(ps.nodes), None)
        return body_id

    # common-ancestor promotion (alternative candidates)
    top_score = max(0.0001, ps.score.get(top_id, 0.0))
    alternative_ancestors = [
        set(_ancestors_of(ps, cid))
        for cid in top_candidates[1:]
        if ps.score.get(cid, 0.0) / top_score >= 0.75
    ]
    if len(alternative_ancestors) >= 3:
        pid = ps.nodes[top_id].parent_id
        while pid is not None:
            parent = ps.nodes.get(pid)
            if parent is None or parent.tag == "body":
                break
            containing = sum(1 for chain in alternative_ancestors if pid in chain)
            if containing >= 3:
                top_id = pid
                break
            pid = parent.parent_id
    if top_id not in ps.is_candidate:
        _initialize(ps, top_id, flags)

    # parent-score promotion
    top_id = _promote_content_ancestor(ps, top_id)
    # single-child promotion
    top_id = _promote_single_child(ps, top_id)
    return top_id


def _ancestors_of(ps: PassState, nid: int) -> list[int]:
    out = []
    cur = ps.nodes[nid].parent_id
    while cur is not None:
        out.append(cur)
        cur = ps.nodes[cur].parent_id
    return out


def _promote_content_ancestor(ps: PassState, top_id: int) -> int:
    last_score = ps.score.get(top_id, 0.0)
    score_threshold = last_score / 3.0
    pid = ps.nodes[top_id].parent_id
    while pid is not None:
        parent = ps.nodes.get(pid)
        if parent is None or parent.tag == "body":
            break
        if pid not in ps.is_candidate:
            pid = parent.parent_id
            continue
        pscore = ps.score.get(pid, 0.0)
        if pscore < score_threshold:
            break
        if pscore > last_score:
            return pid
        last_score = pscore
        pid = parent.parent_id
    return top_id


def _promote_single_child(ps: PassState, top_id: int) -> int:
    cur = top_id
    while True:
        node = ps.nodes.get(cur)
        if node is None:
            return cur
        parent = ps.nodes.get(node.parent_id) if node.parent_id else None
        if parent is None or parent.tag == "body":
            return cur
        if len(parent.child_ids) == 1:
            cur = parent.id
            continue
        return cur


# -- stage 4: sibling joining -------------------------------------------------

def _build_article_node(ps: PassState, top_id: int) -> Element:
    top = ps.nodes[top_id]
    wrapper_attrs = [("id", "readability-page-1"), ("class", "page")]

    if top.tag in ("body", "html") or top.parent_id is None:
        # JS neededToCreateTopCandidate: wrap the whole page
        kids = [
            c.copy_deep() if isinstance(c, Element) else c
            for c in top.el.children
        ]
        return Element("div", wrapper_attrs, kids)

    parent = ps.nodes.get(top.parent_id)
    siblings = (
        [ps.nodes[cid] for cid in parent.child_ids] if parent else [top]
    )
    threshold = max(10.0, ps.score.get(top_id, 0.0) * 0.2)
    kept: list = []
    for sib in siblings:
        if not _keep_sibling(ps, sib, top_id, top, threshold):
            continue
        el_copy = sib.el.copy_deep()
        if sib.tag not in _ALTER_KEEP:
            el_copy.tag = "div"
        kept.append(el_copy)
    return Element("div", wrapper_attrs, kept)


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


def _get_direction(ps: PassState, top_id: int) -> str | None:
    """JS: check the top candidate's parent first, then the top candidate,
    then the parent's ancestors."""
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
