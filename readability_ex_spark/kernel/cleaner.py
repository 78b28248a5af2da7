"""DOM cleaners: pre-processing (P1-P10) and post-processing (C1-C19).

Faithful re-implementation of /root/reference/lib/readability_ex/cleaner.ex
over our mutable Element tree. Traversals mirror Floki.traverse_and_update
(post-order; see dom.traverse_update) unless the reference recurses
manually (mark_data_tables, clean_conditionally, clean_share_elements —
those are top-down there and here).
"""

from __future__ import annotations

import re
from urllib.parse import urlsplit

from readability_ex_spark.kernel import dom, metrics
from readability_ex_spark.kernel.constants import (
    PHRASING_ELEMS,
    PRESENTATIONAL_ATTRS,
    RE_AD_WORDS,
    RE_ALLOWED_VIDEO,
    RE_LOADING_WORDS,
    RE_NONWORD,
    RE_SHARE_ELEMENTS,
)
from readability_ex_spark.kernel.dom import Comment, Element

RE_WS_ASCII = re.compile(r"\s+", re.A)


def _is_ws(s) -> bool:
    return isinstance(s, str) and s.strip() == ""


# ---------------------------------------------------------------------------
# P1: unwrap_noscript_images (cleaner.ex:48-127)
# ---------------------------------------------------------------------------

_RE_URLISH = re.compile(r"\.(jpg|jpeg|png|webp)", re.I)


def _is_single_image(node) -> bool:
    """JS _isSingleImage: an <img>, possibly nested in single-child
    wrappers with no text."""
    while isinstance(node, Element):
        if node.tag == "img":
            return True
        elements = node.element_children()
        if len(elements) != 1 or dom.text(node).strip() != "":
            return False
        node = elements[0]
    return False


def unwrap_noscript_images(doc: list) -> list:
    """Readability.js _unwrapNoscriptImages: drop source-less placeholder
    imgs; replace the element before a single-image <noscript> with the
    noscript's image, preserving image-bearing old attributes under
    data-old-* on conflict."""
    # pass 1: remove imgs with no src/srcset/data-src/data-srcset and no
    # image-ish attribute value
    def drop_placeholder(node):
        if isinstance(node, Element) and node.tag == "img":
            for k, v in node.attrs:
                if k in ("src", "srcset", "data-src", "data-srcset"):
                    return node
                if _RE_URLISH.search(v):
                    return node
            return None
        return node

    doc = dom.traverse_update(doc, drop_placeholder)

    # pass 2: swap previous single-image element with the noscript image
    def swap(node):
        if isinstance(node, Element):
            node.children = _swap_noscript_prev(node.children)
        return node

    return dom.traverse_update(doc, swap)


def _swap_noscript_prev(children: list) -> list:
    out = list(children)
    for i, child in enumerate(out):
        if not (isinstance(child, Element) and child.tag == "noscript"):
            continue
        if not _is_single_image(child):
            continue
        # previousElementSibling (any text nodes in between are skipped)
        prev_idx = next(
            (j for j in range(i - 1, -1, -1) if isinstance(out[j], Element)),
            None,
        )
        if prev_idx is None:
            continue
        prev = out[prev_idx]
        if not _is_single_image(prev):
            continue
        prev_img = prev if prev.tag == "img" else next(
            (e for e in dom.iter_elements(prev.children) if e.tag == "img"),
            None,
        )
        new_img = next(
            (e for e in dom.iter_elements(child.children) if e.tag == "img"),
            None,
        )
        first_el = next(
            (c for c in child.children if isinstance(c, Element)), None
        )
        if prev_img is None or new_img is None or first_el is None:
            continue
        for k, v in list(prev_img.attrs):
            if v == "":
                continue
            if k in ("src", "srcset") or _RE_URLISH.search(v):
                if new_img.attr(k) == v:
                    continue
                name = k
                if new_img.has_attr(name):
                    name = "data-old-" + name
                new_img.set_attr(name, v)
        out[prev_idx] = first_el
        child.children = []  # moved out; noscript dies in remove_scripts
    return out


# ---------------------------------------------------------------------------
# P2: remove_scripts (cleaner.ex:130-132)
# ---------------------------------------------------------------------------

def remove_scripts(doc: list) -> list:
    def fn(node):
        if isinstance(node, Element) and node.tag in ("script", "noscript"):
            return None
        return node

    return dom.traverse_update(doc, fn)


# ---------------------------------------------------------------------------
# prep_document chain (cleaner.ex:134-144)
# ---------------------------------------------------------------------------

def prep_document(doc: list) -> list:
    """Readability.js _prepDocument: remove styles, convert double-br
    runs to paragraphs, font->span. (Div->p conversion happens inside the
    grab walk — sieve._convert_divs — not here; the reference's prep-time
    conversion, cleaner.ex:142, sees pre-removal content and diverges.)"""
    doc = remove_head_styles(doc)
    doc = remove_comments(doc)
    doc = replace_brbr_with_p(doc)
    doc = replace_font_tags(doc)
    return doc


def remove_head_styles(doc: list) -> list:
    """P3 — remove ALL <style> tags (Readability.js _prepDocument,
    00_original_code.js:673; the reference restricts to <head>,
    cleaner.ex:146-160, and fails the style-tags-removal fixture)."""
    def fn(node):
        if isinstance(node, Element) and node.tag == "style":
            return None
        return node

    return dom.traverse_update(doc, fn)


def replace_font_tags(doc: list) -> list:  # P6 (cleaner.ex:162-167)
    def fn(node):
        if isinstance(node, Element) and node.tag == "font":
            node.tag = "span"
        return node

    return dom.traverse_update(doc, fn)



def remove_comments(doc: list) -> list:  # P4
    """Delete comment nodes. NB: the text nodes around a removed comment
    stay SEPARATE (JSDOM semantics) — merging them destroys the run-edge
    whitespace trimming that the goldens encode."""
    def fn(node):
        if isinstance(node, Comment):
            return None
        return node

    return dom.traverse_update(doc, fn)


# ---------------------------------------------------------------------------
# P5: normalize_text_nodes (cleaner.ex:197-258)
# ---------------------------------------------------------------------------






# ---------------------------------------------------------------------------
# P7: replace_brbr_with_p (cleaner.ex:373-503)
# ---------------------------------------------------------------------------

def replace_brbr_with_p(doc: list) -> list:
    """Readability.js _replaceBrs semantics (00_original_code.js):
    a chain of 2+ <br>s (whitespace text transparent) is replaced by one
    <p> that swallows following phrasing siblings until the next double-br
    or a non-phrasing node; trailing whitespace/brs are popped from the
    new <p>; a <p> parent that gained <p> children becomes a <div>.

    (The reference instead wraps every br-delimited segment including the
    leading one, cleaner.ex:397-441, and treats whitespace between brs as
    breaking the chain — both diverge from the goldens.)"""
    def fn(node):
        if isinstance(node, Element):
            new_children, changed = _replace_brs_in_children(node.children)
            if changed:
                node.children = new_children
                if node.tag == "p":
                    node.tag = "div"
        return node

    return dom.traverse_update(doc, fn)


def _is_br(c) -> bool:
    return isinstance(c, Element) and c.tag == "br"


def _replace_brs_in_children(children: list) -> tuple[list, bool]:
    out: list = []
    changed = False
    i = 0
    n = len(children)
    while i < n:
        c = children[i]
        if _is_br(c):
            # scan the chain: brs with ws-only text transparent
            j = i + 1
            ws_between: list = []
            n_brs = 1
            pending_ws: list = []
            while j < n:
                nxt = children[j]
                if _is_ws(nxt):
                    pending_ws.append(nxt)
                    j += 1
                elif _is_br(nxt):
                    ws_between.extend(pending_ws)
                    pending_ws = []
                    n_brs += 1
                    j += 1
                else:
                    break
            if n_brs >= 2:
                changed = True
                # ws text nodes that sat between the removed brs remain and
                # get pulled into the new <p>, plus trailing pending ws
                p_children: list = ws_between + pending_ws
                k = j
                while k < n:
                    nxt = children[k]
                    if _is_br(nxt):
                        m = k + 1
                        while m < n and _is_ws(children[m]):
                            m += 1
                        if m < n and _is_br(children[m]):
                            break
                    if not _phrasing_content(nxt):
                        break
                    p_children.append(nxt)
                    k += 1
                # pop trailing whitespace text and brs (JS _isWhitespace)
                while p_children and (
                    _is_ws(p_children[-1]) or _is_br(p_children[-1])
                ):
                    p_children.pop()
                out.append(Element("p", [], p_children))
                i = k
                continue
        out.append(c)
        i += 1
    return out, changed


# ---------------------------------------------------------------------------
# P9: convert_divs_to_paragraphs (cleaner.ex:260-371)
# ---------------------------------------------------------------------------


def _phrasing_content(node) -> bool:
    """cleaner.ex:1707-1722."""
    if isinstance(node, str):
        return True
    if not isinstance(node, Element):
        return False
    if node.tag in PHRASING_ELEMS:
        return True
    if node.tag in ("a", "del", "ins"):
        return all(_phrasing_content(c) for c in node.children)
    return False


def _is_ws_js(c) -> bool:
    """JS _isWhitespace: whitespace-only text node OR a <br> element."""
    return (isinstance(c, str) and c.strip() == "") or _is_br(c)






# ---------------------------------------------------------------------------
# P10/C3: fix_lazy_images (cleaner.ex:542-565, 736-788)
# ---------------------------------------------------------------------------

_RE_B64_DATA_URL = re.compile(r"^data:\s*([^\s;,]+)\s*;\s*base64\s*,", re.I)
_RE_SRCSET_VALUE = re.compile(r"\.(jpg|jpeg|png|webp)\s+\d")
_RE_SRC_VALUE = re.compile(r"^\s*\S+\.(jpg|jpeg|png|webp)\S*\s*$")


def fix_lazy_images(doc):
    """Readability.js _fixLazyImages over img/picture/figure."""
    def fn(node):
        if not isinstance(node, Element) or node.tag not in (
            "img", "picture", "figure"
        ):
            return node
        src = node.attr("src")
        m = _RE_B64_DATA_URL.match(src) if src else None
        if m and m.group(1) != "image/svg+xml":
            if any(
                k != "src" and _RE_URLISH.search(v) for k, v in node.attrs
            ):
                if len(src) - m.end() < 133:
                    node.del_attr("src")
                    src = ""
        srcset = node.attr("srcset")
        if (src or (srcset and srcset != "null")) and "lazy" not in node.attr(
            "class"
        ).lower():
            return node
        for k, v in list(node.attrs):
            if k in ("src", "srcset", "alt"):
                continue
            copy_to = None
            if _RE_SRCSET_VALUE.search(v):
                copy_to = "srcset"
            elif _RE_SRC_VALUE.match(v):
                copy_to = "src"
            if copy_to:
                if node.tag in ("img", "picture"):
                    node.set_attr(copy_to, v)
                elif node.tag == "figure" and not dom.find(
                    node.children, "img,picture"
                ):
                    node.children.append(Element("img", [(copy_to, v)]))
        return node

    return dom.traverse_update(doc, fn)


# ---------------------------------------------------------------------------
# C1: clean_styles (cleaner.ex:567-593)
# ---------------------------------------------------------------------------

def clean_styles(node):
    if node is None or not isinstance(node, Element):
        return node
    if node.tag == "svg":
        return node
    node.attrs = [(k, v) for k, v in node.attrs if k not in PRESENTATIONAL_ATTRS]
    if node.tag in ("table", "th", "td", "hr", "pre"):
        node.del_attr("width")
        node.del_attr("height")
    for c in node.children:
        clean_styles(c)
    return node


# ---------------------------------------------------------------------------
# C2: mark_data_tables (cleaner.ex:595-734)
# ---------------------------------------------------------------------------

def mark_data_tables(root):
    return _mark_node(root, False, False)


def _mark_node(node, inside_data_table: bool, inside_table: bool):
    if not isinstance(node, Element):
        return node
    tag = node.tag
    is_table = tag == "table"
    data_table = is_table and _is_data_table(node)
    if data_table:
        node.set_attr("data-readability-datatable", "1")
    elif is_table:
        node.set_attr("data-readability-datatable", "0")
    if inside_data_table:
        node.set_attr("data-readability-inside-datatable", "1")
    if inside_table:
        node.set_attr("data-readability-inside-table", "1")
    for c in node.children:
        _mark_node(c, inside_data_table or data_table, inside_table or is_table)
    return node


def _is_data_table(node: Element) -> bool:
    role = node.attr("role")
    if role == "presentation":
        return False
    if node.attr("datatable") == "0":
        return False
    if node.attr("summary") != "":
        return True
    if _has_caption(node.children):
        return True
    if dom.find(node, "col,colgroup,tfoot,thead,th"):
        return True
    if dom.find(node, "table table"):
        return False
    size = _row_and_column_count(node)
    if size["columns"] == 1 or size["rows"] == 1:
        return False
    if size["rows"] >= 10 or size["columns"] > 4:
        return True
    return size["rows"] * size["columns"] > 10


def _has_caption(children) -> bool:
    for c in children:
        if isinstance(c, Element) and c.tag == "caption":
            for cc in c.children:
                if isinstance(cc, str):
                    if cc.strip() != "":
                        return True
                elif isinstance(cc, Element):
                    return True
    return False


def _row_and_column_count(node: Element) -> dict:
    rows = 0
    columns = 0
    for row in dom.find(node, "tr"):
        rowspan = _parse_int(row.attr("rowspan"), 0)
        rows += max(rowspan, 1)
        cols_in_row = 0
        for cell in dom.find(row, "td"):
            colspan = _parse_int(cell.attr("colspan"), 0)
            cols_in_row += max(colspan, 1)
        columns = max(columns, cols_in_row)
    return {"rows": rows, "columns": columns}


def _parse_int(value: str, default: int) -> int:
    m = re.match(r"[+-]?\d+", value.strip()) if value else None
    return int(m.group(0)) if m else default


# ---------------------------------------------------------------------------
# C9: clean_conditionally (cleaner.ex:790-1041)
# ---------------------------------------------------------------------------

class _TextCache:
    """Bottom-up text cache for one conditional-clean pass: raw subtree
    text (script-free) and its innerText normalization, keyed by element
    identity and rebuilt as removals happen (post-order keeps it exact —
    a parent's text is computed after its children were pruned). Without
    it, per-node text-density scans make deep trees cubic."""

    __slots__ = ("raw", "norm")

    def __init__(self):
        self.raw: dict[int, str] = {}
        self.norm: dict[int, str] = {}

    def set_raw(self, el: Element) -> None:
        parts = []
        for c in el.children:
            if isinstance(c, str):
                parts.append(c)
            elif isinstance(c, Element):
                parts.append(self.raw.get(id(c), ""))
        self.raw[id(el)] = "" if el.tag == "script" else "".join(parts)

    def inner(self, el: Element) -> str:
        key = id(el)
        n = self.norm.get(key)
        if n is None:
            raw = self.raw.get(key)
            if raw is None:  # not built by this pass (shouldn't happen)
                raw = dom.text(el)
            n = RE_WS_ASCII.sub(" ", raw.strip())
            self.norm[key] = n
        return n


def clean_conditionally(node, tags=("form", "fieldset", "table", "ul", "div")):
    for tag in tags:
        node = _clean_conditionally_tag(
            node, tag, (False, False, False), True, _TextCache()
        )
    return node


def _clean_conditionally_tag(node, tag_name, ctx, is_root, cache):
    """Post-order (children evaluated/removed before the parent) —
    equivalent to Readability.js _removeNodes' reverse-document-order
    iteration; a removed inner node changes the stats its ancestors are
    judged on. (The reference goes top-down, cleaner.ex:808-848.)"""
    if not isinstance(node, Element):
        return node
    in_code, in_figure, in_data_table = ctx
    tag = node.tag
    in_code = in_code or tag == "code"
    in_figure = in_figure or tag == "figure"
    in_data_table = in_data_table or node.attr("data-readability-datatable") == "1"
    new_ctx = (in_code, in_figure, in_data_table)

    new_children = []
    for c in node.children:
        r = _clean_conditionally_tag(c, tag_name, new_ctx, False, cache)
        if r is not None:
            new_children.append(r)
    node.children = new_children
    cache.set_raw(node)

    if tag == tag_name and not is_root and _should_remove_conditionally(
        node, tag_name, new_ctx, cache
    ):
        return None
    return node


def _inner_text(node, normalize_spaces=True, cache=None) -> str:
    if cache is not None and isinstance(node, Element):
        return cache.inner(node)
    t = dom.text(node).strip()
    if normalize_spaces:
        t = RE_WS_ASCII.sub(" ", t)
    return t


def _should_remove_conditionally(node: Element, tag_name: str, ctx, cache=None) -> bool:
    in_code, in_figure, in_data_table = ctx
    tag = node.tag
    is_list = tag in ("ul", "ol") or _list_content(node, cache)

    if tag_name == "table" and node.attr("data-readability-datatable") == "1":
        return False
    if in_data_table:
        return False
    if in_code:
        return False
    if dom.find(node, "table[data-readability-datatable='1']"):
        return False

    weight = metrics.class_weight(node.attr("class"), node.attr("id"))
    if weight < 0:
        return True
    if _char_count(node, ",", cache) >= 10:
        return False

    p = len(dom.find(node, "p"))
    img = len(dom.find(node, "img"))
    li = len(dom.find(node, "li")) - 100
    input_ = len(dom.find(node, "input"))
    heading_density = _text_density(node, ["h1", "h2", "h3", "h4", "h5", "h6"], cache)
    embed_count, allowed_embed = _count_embeds(node)
    if allowed_embed:
        return False

    inner = _inner_text(node, True, cache)
    if RE_AD_WORDS.search(inner):
        return True
    if RE_LOADING_WORDS.search(inner):
        return True

    content_length = len(inner)
    link_density = metrics.link_density(node, cache)
    text_density = _text_density(node, TEXTISH_TAGS, cache)
    is_figure_child = in_figure
    link_density_modifier = 0.0

    have_to_remove = (
        (not is_figure_child and img > 1 and _safe_ratio(p, img) < 0.5)
        or (not is_list and li > p)
        or (input_ > p // 3)
        or (
            not is_list
            and not is_figure_child
            and heading_density < 0.9
            and content_length < 25
            and (img == 0 or img > 2)
            and link_density > 0
        )
        or (not is_list and weight < 25 and link_density > 0.2 + link_density_modifier)
        or (weight >= 25 and link_density > 0.5 + link_density_modifier)
        or ((embed_count == 1 and content_length < 75) or embed_count > 1)
        or (img == 0 and text_density == 0)
    )

    if is_list and have_to_remove:
        return _remove_list_anyway(node, img)
    return have_to_remove


TEXTISH_TAGS = ["span", "li", "td", "blockquote", "dl", "div", "img", "ol", "p",
                "pre", "table", "ul"]


def _list_content(node: Element, cache=None) -> bool:
    inner = _inner_text(node, True, cache)
    if inner == "":
        return False
    list_length = 0
    for lst in dom.find(node, "ul,ol"):
        list_length += len(_inner_text(lst, True, cache))
    return list_length / len(inner) > 0.9


def _remove_list_anyway(node: Element, img_count: int) -> bool:
    """Image-gallery exception (cleaner.ex:953-964): keep lists whose <li>
    count equals the image count, unless a child has >1 element children."""
    for child in node.element_children():
        if len(child.element_children()) > 1:
            return True
    li_count = len(dom.find(node, "li"))
    return img_count != li_count


def _char_count(node, char: str, cache=None) -> int:
    return _inner_text(node, True, cache).count(char)


def _text_density(node, tags, cache=None) -> float:
    total = _inner_text(node, True, cache)
    total_len = len(total)
    if total_len == 0:
        return 0.0
    child_len = 0
    # descendants only (JS getElementsByTagName excludes the node itself);
    # passing the children list keeps the root out of the match set
    children = node.children if isinstance(node, Element) else node
    for child in dom.find(children, ",".join(tags)):
        child_len += len(_inner_text(child, True, cache))
    return child_len / total_len


def _safe_ratio(num, denom) -> float:
    return 0.0 if denom == 0 else num / denom


def _count_embeds(node) -> tuple[int, bool]:
    count = 0
    for embed in dom.find(node, "object,embed,iframe"):
        if any(RE_ALLOWED_VIDEO.search(v) for _k, v in embed.attrs):
            return (count, True)
        if embed.tag == "object" and RE_ALLOWED_VIDEO.search(dom.raw_html(embed)):
            return (count, True)
        count += 1
    return (count, False)


# ---------------------------------------------------------------------------
# C8: clean_headers (cleaner.ex:1043-1058)
# ---------------------------------------------------------------------------

def clean_headers(node):
    def fn(n):
        if isinstance(n, Element) and n.tag in ("h1", "h2"):
            if metrics.class_weight(n.attr("class"), n.attr("id")) < 0:
                return None
        return n

    return dom.traverse_update(node, fn)


# ---------------------------------------------------------------------------
# C6: clean_share_elements (cleaner.ex:1060-1103)
# ---------------------------------------------------------------------------

def clean_share_elements(node, threshold: int):
    if not isinstance(node, Element):
        return node
    node.children = [
        _clean_share_descendants(c, threshold) if isinstance(c, Element) else c
        for c in node.children
    ]
    return node


def _clean_share_descendants(node: Element, threshold: int) -> Element:
    new_children = []
    for c in node.children:
        if isinstance(c, Element):
            match_string = c.attr("class") + " " + c.attr("id")
            if (
                RE_SHARE_ELEMENTS.search(match_string)
                and len(dom.text(c)) < threshold
            ):
                continue
            new_children.append(_clean_share_descendants(c, threshold))
        else:
            new_children.append(c)
    node.children = new_children
    return node


# ---------------------------------------------------------------------------
# C7: remove_title_headers (cleaner.ex:1105-1146)
# ---------------------------------------------------------------------------


def text_similarity(text_a: str, text_b: str) -> float:
    """Token-overlap similarity (cleaner.ex:1148-1168, sieve.ex:137-157)."""
    tokens_a = _tokenize(text_a)
    tokens_b = _tokenize(text_b)
    if not tokens_a or not tokens_b:
        return 0.0
    set_a = set(tokens_a)
    uniq_b = [t for t in tokens_b if t not in set_a]
    distance_b = len(" ".join(uniq_b)) / max(1, len(" ".join(tokens_b)))
    return 1.0 - distance_b


def _tokenize(text: str) -> list[str]:
    return [t for t in RE_NONWORD.split(text.lower()) if t != ""]


# ---------------------------------------------------------------------------
# C4: remove_semantic_junk (cleaner.ex:1170-1341) — reference-specific
# ---------------------------------------------------------------------------

# ---------------------------------------------------------------------------

def clean_tag(node, tag: str):
    target = tag.lower()
    embed_tag = target in ("object", "embed", "iframe")

    def fn(n):
        if isinstance(n, Element) and n.tag == target:
            if embed_tag and _allowed_video(n):
                return n
            return None
        return n

    return dom.traverse_update(node, fn)


def clean_tags(node, tags: frozenset | set, video_exempt: bool = False):
    """Single-pass removal of a tag group. ONLY valid for groups whose
    sequential per-tag passes are order-independent: unconditional
    removals, or removals whose keep-condition (the allowed-video check)
    doesn't depend on the other tags in the group. object/embed interact
    through object's serialized-HTML video check and must stay as
    separate clean_tag passes."""
    def fn(n):
        if isinstance(n, Element) and n.tag in tags:
            if video_exempt and n.tag == "iframe" and _allowed_video(n):
                return n
            return None
        return n

    return dom.traverse_update(node, fn)


def _allowed_video(n: Element) -> bool:
    if any(RE_ALLOWED_VIDEO.search(v) for _k, v in n.attrs):
        return True
    return n.tag == "object" and bool(RE_ALLOWED_VIDEO.search(dom.raw_html(n)))


# ---------------------------------------------------------------------------
# C10: wrap_continue_links (cleaner.ex:1243-1275)
# ---------------------------------------------------------------------------



# ---------------------------------------------------------------------------
# C11: flatten_tables (cleaner.ex:1619-1673)
# ---------------------------------------------------------------------------

def flatten_tables(node):
    """Single-cell table -> its cell as <p>/<div> (Readability.js
    _prepArticle tail; the reference's extra lone-<pre> flattening,
    cleaner.ex:1639-1654, has no JS counterpart and is omitted)."""
    def fn(n):
        if isinstance(n, Element) and n.tag == "table":
            cell = _single_cell_table(n)
            if cell is not None:
                cell.tag = "p" if _all_phrasing(cell) else "div"
                return cell
        return n

    return dom.traverse_update(node, fn)


def _single_cell_table(table: Element):
    tbody = table
    if _has_single_tag_inside(table, "tbody"):
        tbody = _first_element_child(table)
    if not _has_single_tag_inside(tbody, "tr"):
        return None
    row = _first_element_child(tbody)
    if row is None or row.tag != "tr":
        return None
    if not _has_single_tag_inside(row, "td"):
        return None
    cell = _first_element_child(row)
    if cell is None or cell.tag != "td":
        return None
    return cell


def _has_single_tag_inside(node, wanted: str) -> bool:
    if not isinstance(node, Element):
        return False
    elements = node.element_children()
    if len(elements) != 1:
        return False
    if elements[0].tag != wanted:
        return False
    return not any(isinstance(c, str) and c.strip() != "" for c in node.children)


def _first_element_child(node: Element):
    for c in node.children:
        if isinstance(c, Element):
            return c
    return None


def _all_phrasing(node: Element) -> bool:
    return all(_phrasing_content(c) for c in node.children)


# ---------------------------------------------------------------------------
# C12: downgrade_h1 (cleaner.ex:1392-1400)
# ---------------------------------------------------------------------------

def downgrade_h1(node):
    def fn(n):
        if isinstance(n, Element) and n.tag == "h1":
            n.tag = "h2"
        return n

    return dom.traverse_update(node, fn)


# ---------------------------------------------------------------------------
# C13: simplify_nested_elements (cleaner.ex:1402-1460)
# ---------------------------------------------------------------------------

def simplify_nested_elements(node):
    """Readability.js _simplifyNestedElements: pre-order walk; a
    div/section without content is removed; a div/section whose only
    element child is a div/section is merged into it (parent attrs
    override child's), re-examining the merged child so chains collapse.

    (The reference's extra branches — photoviewer, #content unwrap,
    redundant-div-around-p heuristics, cleaner.ex:1402-1460 — are
    compensations without a JS counterpart and are omitted.)"""
    def simplify(n):
        if not isinstance(n, Element):
            return n
        while (
            isinstance(n, Element)
            and n.tag in ("div", "section")
            and not n.attr("id").startswith("readability")
        ):
            if _element_without_content(n):
                return None
            if _has_single_tag_inside(n, "div") or _has_single_tag_inside(
                n, "section"
            ):
                child = _first_element_child(n)
                for k, v in n.attrs:
                    child.set_attr(k, v)
                n = child
                continue
            break
        if isinstance(n, Element):
            new_children = []
            for c in n.children:
                r = simplify(c)
                if r is not None:
                    new_children.append(r)
            n.children = new_children
        return n

    if isinstance(node, list):
        return [r for r in (simplify(c) for c in node) if r is not None]
    return simplify(node)




def _element_without_content(node: Element) -> bool:
    if dom.text(node).strip() != "":
        return False
    elements = node.element_children()
    if not elements:
        return True
    br_count = len(dom.find(node, "br"))
    hr_count = len(dom.find(node, "hr"))
    return len(elements) == br_count + hr_count









# ---------------------------------------------------------------------------
# C14: unwrap_content_main (cleaner.ex:1462-1483)
# ---------------------------------------------------------------------------


# ---------------------------------------------------------------------------
# C15: absolutize_uris (cleaner.ex:1900-1988)
# ---------------------------------------------------------------------------

_RE_PROTO_SKIP = re.compile(r"^(mailto|tel|data|javascript|about):", re.I)
_RE_SRCSET_PART = re.compile(r"(\S+)(\s+[\d.]+[xw])?(\s*(?:,|$))", re.A)


_MEDIA_TAGS = frozenset(["img", "picture", "figure", "video", "audio", "source"])


def absolutize_uris(node, base_uri: str | None, absolute_fragments: bool):
    """Readability.js _fixRelativeUris: href on <a>; src/poster/srcset on
    media tags only (iframes keep their original src)."""
    if not base_uri:
        return node

    def fn(n):
        if isinstance(n, Element):
            if n.tag == "a":
                _abs_attr(n, "href", base_uri, absolute_fragments)
            elif n.tag in _MEDIA_TAGS:
                _abs_attr(n, "src", base_uri, True)
                _abs_attr(n, "poster", base_uri, True)
                _abs_srcset(n, base_uri)
        return n

    return dom.traverse_update(node, fn)


def _abs_attr(n: Element, k: str, base_uri: str, absolute_fragments: bool) -> None:
    v = n.attr(k)
    if v == "" or not n.has_attr(k):
        return
    if v.startswith("#") and k == "href" and not absolute_fragments:
        return
    if _RE_PROTO_SKIP.match(v):
        return
    # WHATWG URL (JS `new URL(uri, base)`) strips leading/trailing
    # C0-control-or-space from the input before resolving
    n.set_attr(k, _to_abs(v.strip(), base_uri))


def _abs_srcset(n: Element, base_uri: str) -> None:
    v = n.attr("srcset")
    if v == "" or not n.has_attr("srcset"):
        return
    def repl(m):
        return _to_abs(m.group(1), base_uri) + (m.group(2) or "") + m.group(3)
    n.set_attr("srcset", _RE_SRCSET_PART.sub(repl, v))


def _remove_dot_segments(path: str) -> str:
    """RFC 3986 5.2.4 — preserves empty segments ('//' stays), unlike
    urljoin's resolver."""
    out: list[str] = []
    s = path
    while s:
        if s.startswith("../"):
            s = s[3:]
        elif s.startswith("./"):
            s = s[2:]
        elif s.startswith("/./"):
            s = "/" + s[3:]
        elif s == "/.":
            s = "/"
        elif s.startswith("/../"):
            s = "/" + s[4:]
            if out:
                out.pop()
        elif s == "/..":
            s = "/"
            if out:
                out.pop()
        elif s in (".", ".."):
            s = ""
        else:
            i = s.find("/", 1) if s.startswith("/") else s.find("/")
            if i == -1:
                out.append(s)
                s = ""
            else:
                out.append(s[:i])
                s = s[i:]
    return "".join(out)


_RE_FILE_DRIVE = re.compile(r"^/([A-Za-z])\|(/|$)")


def _unsplit_keep_delims(scheme, netloc, path, query, fragment,
                         had_query, had_fragment) -> str:
    """Like urlunsplit but keeps empty '?'/'#' delimiters that were
    present in the input (WHATWG serialization keeps them)."""
    out = ""
    if scheme:
        out += scheme + ":"
    if netloc or scheme in ("http", "https", "file", "ftp", "ws", "wss"):
        out += "//" + netloc
    out += path
    if query or had_query:
        out += "?" + query
    if fragment or had_fragment:
        out += "#" + fragment
    return out


def _normalize_absolute(parts, url: str) -> str:
    """WHATWG-ish normalization of an absolute URL: lowercase scheme and
    host, mandatory '/' path on authority URLs, file drive 'C|' -> 'C:'."""
    scheme = parts.scheme.lower()
    netloc = parts.netloc.lower()
    path = parts.path
    if scheme == "file":
        path = _RE_FILE_DRIVE.sub(lambda m: f"/{m.group(1)}:{m.group(2)}", path)
    if netloc and path == "":
        path = "/"
    return _unsplit_keep_delims(
        scheme, netloc, path, parts.query, parts.fragment,
        "?" in url, "#" in url,
    )


def _to_abs(url: str, base_uri: str) -> str:
    """Resolve like the WHATWG URL constructor (JS `new URL(uri, base)`):
    host lowercasing, '/'-defaulted paths, '//'-preserving path merge."""
    try:
        parts = urlsplit(url)
    except ValueError:
        return url
    scheme = parts.scheme.lower()
    if scheme in ("mailto", "tel", "data", "javascript", "about"):
        return url
    if scheme:
        return _normalize_absolute(parts, url)
    if url.startswith("//"):
        base_scheme = urlsplit(base_uri).scheme or "https"
        full = base_scheme + ":" + url
        try:
            return _normalize_absolute(urlsplit(full), full)
        except ValueError:
            return full
    try:
        bp = urlsplit(base_uri)
    except ValueError:
        return url
    # split rel into path / query / fragment manually so the merged path
    # keeps empty segments (urljoin collapses 'a//b')
    rest = url
    had_fragment = "#" in rest
    fragment = ""
    if had_fragment:
        rest, fragment = rest.split("#", 1)
    had_query = "?" in rest
    query = ""
    if had_query:
        rest, query = rest.split("?", 1)
    if rest == "":
        path = bp.path or "/"
        if not had_query and had_fragment:
            query = bp.query
            had_query = bool(bp.query)
    elif rest.startswith("/"):
        path = _remove_dot_segments(rest)
    else:
        bdir = bp.path[: bp.path.rfind("/") + 1] if "/" in bp.path else "/"
        if not bdir.startswith("/"):
            bdir = "/" + bdir
        path = _remove_dot_segments(bdir + rest)
    return _unsplit_keep_delims(
        bp.scheme.lower(), bp.netloc.lower(), path, query, fragment,
        had_query, had_fragment,
    )


# ---------------------------------------------------------------------------
# C16: replace_javascript_links (cleaner.ex:1757-1777)
# ---------------------------------------------------------------------------

_RE_JS_HREF = re.compile(r"^javascript:", re.I)


def replace_javascript_links(node):
    def fn(n):
        if isinstance(n, Element) and n.tag == "a":
            href = n.attr("href").strip()
            if _RE_JS_HREF.match(href):
                if len(n.children) == 1 and isinstance(n.children[0], str):
                    return n.children[0]
                return Element("span", [], n.children)
        return n

    return dom.traverse_update(node, fn)


# ---------------------------------------------------------------------------
# C17: remove_empty_nodes (cleaner.ex:1779-1791, 1833-1858)
# ---------------------------------------------------------------------------

def remove_empty_nodes(node):
    """Remove <p> with no img/embed/object/iframe and no trimmed text
    (Readability.js _prepArticle 'Remove extra paragraphs')."""
    def fn(n):
        if (
            isinstance(n, Element)
            and n.tag == "p"
            and not dom.find(n, "img,embed,object,iframe")
            and dom.text(n).strip() == ""
        ):
            return None
        return n

    return dom.traverse_update(node, fn)


# ---------------------------------------------------------------------------
# C18: remove_br_before_p (cleaner.ex:1793-1831)
# ---------------------------------------------------------------------------

def remove_br_before_p(node):
    def fn(n):
        if isinstance(n, Element):
            n.children = _drop_br_before_p(n.children)
        return n

    return dom.traverse_update(node, fn)


def _drop_br_before_p(children: list) -> list:
    out = []
    for i, c in enumerate(children):
        if _is_br(c) and _next_non_ws_is_p(children[i + 1:]):
            continue
        out.append(c)
    return out


def _next_non_ws_is_p(rest: list) -> bool:
    for c in rest:
        if isinstance(c, str):
            if c.strip() != "":
                return False
            continue
        return isinstance(c, Element) and c.tag == "p"
    return False


# ---------------------------------------------------------------------------
# C19: strip_attributes_and_classes (cleaner.ex:1728-1743, 1860-1881)
# ---------------------------------------------------------------------------

def strip_attributes_and_classes(node, preserve_classes):
    """preserve_classes: set of class names to keep, or None to keep all."""
    def fn(n):
        if isinstance(n, Element):
            n.attrs = [
                (k, v) for k, v in n.attrs
                if not k.startswith("data-readability-")
            ]
            if preserve_classes is not None and n.has_attr("class"):
                kept = [
                    c for c in RE_WS_ASCII.split(n.attr("class"))
                    if c != "" and c in preserve_classes
                ]
                if kept:
                    n.set_attr("class", " ".join(kept))
                else:
                    n.del_attr("class")
        return n

    return dom.traverse_update(node, fn)
