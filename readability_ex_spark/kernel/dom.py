"""Lightweight DOM: tolerant HTML parser, tree, serializer, tiny selectors.

Stands in for the reference's Floki tuple tree (`{tag, attrs, children}`,
readability_ex.ex:21-26). Built on the stdlib ``html.parser`` tokenizer
with HTML5-ish tree construction (implied end tags for p/li/td/..., void
elements, raw-text script/style), since the golden fixtures were produced
by an HTML5 parser.

Conventions matching the reference:
- tags and attr names lowercase;
- attrs is a list of (name, value) pairs preserving order, first
  occurrence wins on duplicates;
- boolean attrs get value == attr name (mochiweb convention relied on by
  index.ex:69 ``get_attr(attrs, "hidden") != ""``);
- text nodes are plain ``str`` children; comments/doctype are wrapper
  objects ignored by text extraction.
"""

from __future__ import annotations

from html.parser import HTMLParser

VOID_ELEMENTS = frozenset(
    [
        "area", "base", "br", "col", "command", "embed", "hr", "img",
        "input", "keygen", "link", "meta", "param", "source", "track", "wbr",
    ]
)

RAW_TEXT_ELEMENTS = frozenset(["script", "style"])

# HTML5 implied-end-tag rules: starting tag T closes an open element E when
# E is in _CLOSES[T]. A <p> in scope is closed by any block-start tag.
_P_CLOSERS = frozenset(
    [
        "address", "article", "aside", "blockquote", "details", "div", "dl",
        "fieldset", "figcaption", "figure", "footer", "form", "h1", "h2",
        "h3", "h4", "h5", "h6", "header", "hgroup", "hr", "main", "menu",
        "nav", "ol", "p", "pre", "section", "table", "ul", "dir", "center",
        "listing", "plaintext", "summary", "xmp",
    ]
)
_CLOSES = {
    "li": frozenset(["li"]),
    "dt": frozenset(["dt", "dd"]),
    "dd": frozenset(["dt", "dd"]),
    "tr": frozenset(["tr", "td", "th"]),
    "td": frozenset(["td", "th"]),
    "th": frozenset(["td", "th"]),
    "thead": frozenset(["tr", "td", "th", "tbody", "tfoot", "caption", "colgroup"]),
    "tbody": frozenset(["tr", "td", "th", "thead", "tfoot", "caption", "colgroup"]),
    "tfoot": frozenset(["tr", "td", "th", "thead", "tbody", "caption", "colgroup"]),
    "option": frozenset(["option"]),
    "optgroup": frozenset(["option", "optgroup"]),
    "rt": frozenset(["rt", "rp"]),
    "rp": frozenset(["rt", "rp"]),
    "colgroup": frozenset(["colgroup"]),
    "caption": frozenset(["caption"]),
}
# Scope barriers: implied closes never cross these.
_SCOPE_BARRIERS = frozenset(
    ["html", "body", "table", "td", "th", "caption", "template", "applet",
     "object", "marquee"]
)
_TABLE_SECTION_BARRIERS = {
    "li": frozenset(["ul", "ol", "menu", "dir"]),
    "dt": frozenset(["dl"]),
    "dd": frozenset(["dl"]),
    "tr": frozenset(["table", "thead", "tbody", "tfoot"]),
    "td": frozenset(["tr", "table"]),
    "th": frozenset(["tr", "table"]),
    "thead": frozenset(["table"]),
    "tbody": frozenset(["table"]),
    "tfoot": frozenset(["table"]),
    "option": frozenset(["select", "optgroup", "datalist"]),
    "optgroup": frozenset(["select"]),
    "colgroup": frozenset(["table"]),
    "caption": frozenset(["table"]),
}


class Comment:
    __slots__ = ("data",)

    def __init__(self, data: str):
        self.data = data

    def __repr__(self):  # pragma: no cover
        return f"Comment({self.data!r})"


class Doctype:
    __slots__ = ("data",)

    def __init__(self, data: str):
        self.data = data

    def __repr__(self):  # pragma: no cover
        return f"Doctype({self.data!r})"


class Element:
    __slots__ = ("tag", "attrs", "children")

    def __init__(self, tag: str, attrs: list[tuple[str, str]] | None = None,
                 children: list | None = None):
        self.tag = tag
        self.attrs = attrs if attrs is not None else []
        self.children = children if children is not None else []

    def attr(self, name: str, default: str = "") -> str:
        """First occurrence wins (cleaner.ex:1990 List.keyfind)."""
        for k, v in self.attrs:
            if k == name:
                return v
        return default

    def has_attr(self, name: str) -> bool:
        return any(k == name for k, _ in self.attrs)

    def set_attr(self, name: str, value: str) -> None:
        """Replace first occurrence in place, else append (List.keystore)."""
        for i, (k, _) in enumerate(self.attrs):
            if k == name:
                self.attrs[i] = (name, value)
                return
        self.attrs.append((name, value))

    def del_attr(self, name: str) -> None:
        """Delete first occurrence (List.keydelete)."""
        for i, (k, _) in enumerate(self.attrs):
            if k == name:
                del self.attrs[i]
                return

    def element_children(self) -> list["Element"]:
        return [c for c in self.children if isinstance(c, Element)]

    def copy_deep(self) -> "Element":
        kids = []
        for c in self.children:
            if isinstance(c, Element):
                kids.append(c.copy_deep())
            elif isinstance(c, Comment):
                kids.append(Comment(c.data))
            elif isinstance(c, Doctype):
                kids.append(Doctype(c.data))
            else:
                kids.append(c)
        return Element(self.tag, list(self.attrs), kids)

    def __repr__(self):  # pragma: no cover
        return f"<{self.tag} attrs={self.attrs} kids={len(self.children)}>"


class _TreeBuilder(HTMLParser):
    def __init__(self):
        super().__init__(convert_charrefs=True)
        self.root_children: list = []
        self.stack: list[Element] = []
        # open-tag counters let the implied-close scans bail in O(1) when
        # the target tag isn't open at all (deep div chains would
        # otherwise make parsing quadratic)
        self._open: dict[str, int] = {}

    # -- helpers ---------------------------------------------------------
    def _append(self, node) -> None:
        if self.stack:
            self.stack[-1].children.append(node)
        else:
            self.root_children.append(node)

    def _pop_to(self, i: int) -> None:
        for el in self.stack[i:]:
            self._open[el.tag] -= 1
        del self.stack[i:]

    def _implied_close(self, tag: str) -> None:
        """Pop elements a start-tag of ``tag`` implicitly closes."""
        if tag in _P_CLOSERS and self._open.get("p", 0) > 0:
            # close the nearest <p> unless a scope barrier intervenes
            for i in range(len(self.stack) - 1, -1, -1):
                t = self.stack[i].tag
                if t == "p":
                    self._pop_to(i)
                    break
                if t in _SCOPE_BARRIERS:
                    break
        closes = _CLOSES.get(tag)
        if closes:
            barriers = _TABLE_SECTION_BARRIERS.get(tag, frozenset())
            # repeat while the new top is still a closer: <tr> after
            # [tr, td] must end the CELL and then the ROW (HTML5 "in
            # cell" -> close the cell, reprocess -> end the row); a
            # single pop would nest the new row inside the old one and
            # break the serialize -> reparse fixpoint (found by fuzz:
            # '<tr><td><tr>')
            while any(self._open.get(t, 0) > 0 for t in closes):
                popped = False
                for i in range(len(self.stack) - 1, -1, -1):
                    t = self.stack[i].tag
                    if t in closes:
                        self._pop_to(i)
                        popped = True
                        break
                    if t in barriers or t in ("html", "body"):
                        break
                if not popped:
                    break

    # -- HTMLParser callbacks --------------------------------------------
    def handle_starttag(self, tag, attrs):
        self._implied_close(tag)
        seen = set()
        alist: list[tuple[str, str]] = []
        for k, v in attrs:
            if k in seen:
                continue
            seen.add(k)
            alist.append((k, v if v is not None else k))
        el = Element(tag, alist)
        self._append(el)
        if tag not in VOID_ELEMENTS:
            self.stack.append(el)
            self._open[tag] = self._open.get(tag, 0) + 1

    def handle_startendtag(self, tag, attrs):
        # <tag/> — treat as empty element regardless of voidness, but
        # run the same implied closes as a start tag: '<p><div/>' must
        # close the p exactly like '<p><div>' would, or the serialized
        # '<div></div>' re-parses to a different tree (fuzz-found)
        self._implied_close(tag)
        seen = set()
        alist = []
        for k, v in attrs:
            if k in seen:
                continue
            seen.add(k)
            alist.append((k, v if v is not None else k))
        self._append(Element(tag, alist))

    def handle_endtag(self, tag):
        if tag in VOID_ELEMENTS:
            return
        if self._open.get(tag, 0) <= 0:
            return  # unmatched end tag: ignored
        for i in range(len(self.stack) - 1, -1, -1):
            if self.stack[i].tag == tag:
                self._pop_to(i)
                return

    def handle_data(self, data):
        if not data:
            return
        parent = self.stack[-1].children if self.stack else self.root_children
        if parent and isinstance(parent[-1], str):
            parent[-1] = parent[-1] + data
        else:
            parent.append(data)

    def handle_comment(self, data):
        self._append(Comment(data))

    def handle_decl(self, decl):
        self._append(Doctype(decl))

    def unknown_decl(self, data):
        self._append(Comment(data))


def parse_document(html: str) -> list:
    """Parse a full document -> list of top-level nodes (like
    Floki.parse_document!, readability_ex.ex:23)."""
    import sys

    # deep DOMs + recursive build/traversals; the tokenizer try/except
    # below would otherwise silently truncate on RecursionError
    if sys.getrecursionlimit() < 20000:
        sys.setrecursionlimit(20000)
    builder = _TreeBuilder()
    try:
        builder.feed(html)
        builder.close()
    except Exception:
        # tolerate tokenizer blowups on garbage input; keep what we have
        pass
    return builder.root_children


def parse_fragment(html: str) -> list:
    """Fragment parse (Floki.parse_fragment)."""
    return parse_document(html)


# -- serialization --------------------------------------------------------

_TEXT_ESCAPES = {"&": "&amp;", "<": "&lt;", ">": "&gt;"}
_ATTR_ESCAPES = {"&": "&amp;", "<": "&lt;", ">": "&gt;", '"': "&quot;"}


def _esc_text(s: str) -> str:
    if "&" in s or "<" in s or ">" in s:
        for ch, rep in _TEXT_ESCAPES.items():
            s = s.replace(ch, rep)
    return s


def _esc_attr(s: str) -> str:
    for ch, rep in _ATTR_ESCAPES.items():
        if ch in s:
            s = s.replace(ch, rep)
    return s


def raw_html(node) -> str:
    """Serialize node/list back to HTML (Floki.raw_html)."""
    out: list[str] = []
    _raw(node, out)
    return "".join(out)


def _raw(node, out: list[str]) -> None:
    if node is None:
        return
    if isinstance(node, str):
        out.append(_esc_text(node))
        return
    if isinstance(node, list):
        for c in node:
            _raw(c, out)
        return
    if isinstance(node, Comment):
        out.append(f"<!--{node.data}-->")
        return
    if isinstance(node, Doctype):
        out.append(f"<!{node.data}>")
        return
    tag = node.tag
    out.append("<")
    out.append(tag)
    for k, v in node.attrs:
        out.append(f' {k}="{_esc_attr(v)}"')
    if tag in VOID_ELEMENTS and not node.children:
        out.append("/>")
        return
    out.append(">")
    is_raw = tag in RAW_TEXT_ELEMENTS
    for c in node.children:
        if is_raw and isinstance(c, str):
            out.append(c)
        else:
            _raw(c, out)
    out.append(f"</{tag}>")


# -- text extraction -------------------------------------------------------

def text(node, *, include_script: bool = False) -> str:
    """Concatenated text of all descendant text nodes (Floki.text: skips
    <script> content by default, keeps everything else verbatim)."""
    out: list[str] = []
    _collect_text(node, out, include_script)
    return "".join(out)


def _collect_text(node, out: list[str], include_script: bool) -> None:
    if isinstance(node, str):
        out.append(node)
        return
    if isinstance(node, list):
        for c in node:
            _collect_text(c, out, include_script)
        return
    if isinstance(node, Element):
        if node.tag == "script" and not include_script:
            return
        for c in node.children:
            _collect_text(c, out, include_script)


# -- traversal with update ---------------------------------------------------

def traverse_update(node, fn):
    """Post-order traverse-and-update (Floki.traverse_and_update):
    children are processed first, then ``fn`` is applied to the node with
    its updated children. ``fn`` may return the node (possibly mutated), a
    replacement node/str, ``None`` to delete, or a list to splice.

    Applied to every node kind (Element, str, Comment, Doctype), like the
    reference relies on for comment removal (cleaner.ex:189-195).
    """
    if isinstance(node, list):
        out = []
        append = out.append
        for c in node:
            # inline the per-child dispatch: only Elements recurse — text
            # nodes dominate real documents and need just the fn call
            if c.__class__ is Element:
                c.children = traverse_update(c.children, fn)
                r = fn(c)
            else:
                r = fn(c)
            if r is None:
                continue
            if r.__class__ is list:
                out.extend(x for x in r if x is not None)
            else:
                append(r)
        return out
    if isinstance(node, Element):
        node.children = traverse_update(node.children, fn)
        return fn(node)
    return fn(node)


# -- tiny selector engine --------------------------------------------------
# Supports: "tag", "[attr]", "tag[attr]", "tag[attr='v']", comma unions,
# and a single descendant combinator ("table table") — all the reference
# uses (cleaner.ex / sieve.ex call sites).

def _parse_simple(sel: str):
    sel = sel.strip()
    tag = None
    attr_name = None
    attr_value = None
    if "[" in sel:
        base, _, rest = sel.partition("[")
        tag = base.strip() or None
        inner = rest.rstrip("]")
        if "=" in inner:
            attr_name, _, val = inner.partition("=")
            attr_name = attr_name.strip()
            attr_value = val.strip().strip("'\"")
        else:
            attr_name = inner.strip()
    else:
        tag = sel or None
    return (tag, attr_name, attr_value)


def _matches(el: Element, simple) -> bool:
    tag, attr_name, attr_value = simple
    if tag is not None and el.tag != tag:
        return False
    if attr_name is not None:
        if not el.has_attr(attr_name):
            return False
        if attr_value is not None and el.attr(attr_name) != attr_value:
            return False
    return True


def iter_elements(node):
    """Pre-order DFS over Elements, including the root if an Element."""
    stack = [node]
    while stack:
        cur = stack.pop()
        if isinstance(cur, list):
            stack.extend(reversed(cur))
        elif isinstance(cur, Element):
            yield cur
            stack.extend(reversed(cur.children))


from functools import lru_cache


@lru_cache(maxsize=256)
def _compile_selector(selector: str):
    chains = tuple(
        tuple(_parse_simple(s) for s in p.strip().split())
        for p in selector.split(",")
    )
    # fast path: a union of bare tag names (the overwhelmingly common
    # call shape — "p", "img", "ul,ol", "span,li,td,...") compiles to a
    # frozenset lookup instead of the combinator state machine
    if all(
        len(c) == 1 and c[0][0] is not None and c[0][1] is None
        for c in chains
    ):
        return frozenset(c[0][0] for c in chains)
    return chains


def find(node, selector: str) -> list[Element]:
    """Document-order matches of a comma-separated selector list."""
    results: list[Element] = []
    compiled = _compile_selector(selector)

    if isinstance(compiled, frozenset):
        tags = compiled
        stack = [node] if not isinstance(node, list) else list(reversed(node))
        while stack:
            cur = stack.pop()
            if isinstance(cur, Element):
                if cur.tag in tags:
                    results.append(cur)
                stack.extend(reversed(cur.children))
            elif isinstance(cur, list):
                stack.extend(reversed(cur))
        return results

    def walk(cur, states):
        # states[i] = set of prefix lengths of chain i satisfied by some
        # ancestor path (0 always active: a chain may start at any depth).
        if isinstance(cur, list):
            for c in cur:
                walk(c, states)
            return
        if not isinstance(cur, Element):
            return
        new_states = []
        matched = False
        for chain, positions in zip(compiled, states):
            nxt = set(positions)
            for p in positions:
                if p < len(chain) and _matches(cur, chain[p]):
                    if p + 1 == len(chain):
                        if not matched:
                            results.append(cur)
                            matched = True
                    else:
                        nxt.add(p + 1)
            new_states.append(nxt)
        for c in cur.children:
            walk(c, new_states)

    walk(node, [{0} for _ in compiled])
    return results
