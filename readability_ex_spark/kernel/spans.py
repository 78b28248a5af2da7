"""Block-level character spans over the extracted text.

The north-star contract writes "extracted text/spans" per document: the
`text` column is `dom.text(cleaned)` (kernel/sieve.py grab result) and a
span is the [start, end) slice of that string covered by one topmost
block-level element of the cleaned article tree.  Offsets are computed
by a walk that mirrors ``dom._collect_text`` exactly (same node kinds,
same <script> skip), so ``text[start:end] == dom.text(block)`` holds by
construction — tested in tests/test_spans.py against the fixture corpus.

Granularity: the TOPMOST block wins — a <p> inside an <li> is part of
the <li> span, not its own.  Text that sits directly under a non-block
container (stray text in a <div>) belongs to no span; spans therefore
tile a subset of [0, len(text)) in strictly increasing, non-overlapping
order.
"""
from __future__ import annotations

from . import dom

# Block-level output tags of the cleaned article tree (the cleaner's
# allowlist keeps roughly this set as structural containers of text).
BLOCK_SPAN_TAGS = frozenset(
    {
        "p", "h1", "h2", "h3", "h4", "h5", "h6", "li", "pre",
        "blockquote", "figcaption", "dt", "dd", "caption", "th", "td",
    }
)


def block_spans(node) -> list[tuple[str, int, int]]:
    """Spans of the topmost block elements of ``node``, as offsets into
    ``dom.text(node)``.  Returns ``[(tag, start, end), ...]`` sorted by
    ``start`` (document order), ``start < end`` (empty blocks skipped).
    """
    spans: list[tuple[str, int, int]] = []
    # (node, in_block) — iterative to stay clear of deep-tree recursion;
    # children pushed in reverse so pops run in document order.
    pos = 0
    stack: list[tuple[object, bool]] = [(node, False)]
    while stack:
        n, in_block = stack.pop()
        if isinstance(n, str):
            pos += len(n)
            continue
        if isinstance(n, list):
            for c in reversed(n):
                stack.append((c, in_block))
            continue
        if isinstance(n, dom.Element):
            if n.tag == "script":  # dom.text skips script content
                continue
            if not in_block and n.tag in BLOCK_SPAN_TAGS:
                # sentinel closes the span once the subtree is consumed
                stack.append((_Close(n.tag, pos, len(spans)), True))
                spans.append((n.tag, pos, -1))  # end patched by _Close
                for c in reversed(n.children):
                    stack.append((c, True))
            else:
                for c in reversed(n.children):
                    stack.append((c, in_block))
            continue
        if isinstance(n, _Close):
            tag, start, idx = n.tag, n.start, n.idx
            if pos > start:
                spans[idx] = (tag, start, pos)
            else:
                spans[idx] = None  # empty block — drop below
        # Comment / Doctype nodes contribute no text (dom._collect_text)
    return [s for s in spans if s is not None]


class _Close:
    __slots__ = ("tag", "start", "idx")

    def __init__(self, tag: str, start: int, idx: int):
        self.tag = tag
        self.start = start
        self.idx = idx
