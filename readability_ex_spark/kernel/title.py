"""Article title refinement (reference: title.ex).

Implements the separator-splitting / colon-handling / length-bounds rules
of Readability's _getArticleTitle as pinned by the reference. NB the
reference mixes byte indexes (title.ex:125-137 :binary.match) with
codepoint slicing (title.ex:139-147 String.slice); we replicate with
byte indexes re-interpreted as codepoint offsets, which coincide for
ASCII separators/colons in practice.
"""

from __future__ import annotations

import re

from readability_ex_spark.kernel import dom

_RE_SEP = re.compile(r"\s[|\-–—\\/>»]\s", re.A)
_RE_HIER_SEP = re.compile(r"\s[\\/>»]\s", re.A)
_RE_LEAD_TO_SEP = re.compile(r"^[^|\-–—\\/>»]*[|\-–—\\/>»]", re.A)
_RE_WS = re.compile(r"\s+", re.A)
_RE_MULTI_WS = re.compile(r"\s{2,}", re.A)


def _word_count(s: str) -> int:
    return len([w for w in _RE_WS.split(s) if w != ""])


def get_article_title(doc: list, meta: dict) -> str:
    """title.ex:4-15: meta title wins; else refine the <title> text."""
    meta_title = (meta.get("title") or "").strip()
    if meta_title != "":
        return meta_title
    raw = dom.text(dom.find(doc, "title")).strip()
    if raw == "":
        return ""
    return _get_title_from_raw(doc, raw)


def _get_title_from_raw(doc: list, orig_title: str) -> str:
    title_had_hierarchical_separators = False
    if _RE_SEP.search(orig_title):
        title_had_hierarchical_separators = bool(_RE_HIER_SEP.search(orig_title))
        matches = list(_RE_SEP.finditer(orig_title))
        # keep the prefix before the LAST separator (character indices —
        # JS substring semantics; the reference mixes byte offsets into
        # codepoint slicing, title.ex:26-35, mangling CJK titles)
        cur_title = orig_title[: matches[-1].start()]
        if _word_count(cur_title) < 3:
            cur_title = _RE_LEAD_TO_SEP.sub("", orig_title, count=1)
    elif ": " in orig_title:
        headings = [dom.text(h).strip() for h in dom.find(doc, "h1,h2")]
        trimmed = orig_title.strip()
        if trimmed in headings:
            cur_title = orig_title
        else:
            idx = _last_byte_index(orig_title, ":")
            cur_title = (
                _slice_from_index(orig_title, idx + 1)
                if idx is not None
                else orig_title
            )
            if _word_count(cur_title) < 3:
                first_idx = _first_byte_index(orig_title, ":")
                if first_idx is None:
                    cur_title = orig_title
                else:
                    new_title = _slice_from_index(orig_title, first_idx + 1)
                    if _word_count(_slice_cp(orig_title, 0, first_idx)) > 5:
                        cur_title = orig_title
                    else:
                        cur_title = new_title
    elif len(orig_title) > 150 or len(orig_title) < 15:
        h1s = dom.find(doc, "h1")
        if len(h1s) == 1:
            cur_title = dom.text(h1s[0])
        else:
            cur_title = orig_title
    else:
        cur_title = orig_title

    cur_title = _RE_MULTI_WS.sub(" ", cur_title.strip())
    cur_count = _word_count(cur_title)
    if cur_count <= 4 and (
        not title_had_hierarchical_separators
        or cur_count != _word_count(_RE_SEP.sub("", orig_title)) - 1
    ):
        return orig_title
    return cur_title


def _slice_cp(s: str, start: int, length: int) -> str:
    return s[start : start + length]


def _slice_from_index(s: str, start_idx: int) -> str:
    if start_idx >= len(s):
        return ""
    return s[start_idx:]


def _first_byte_index(s: str, pat: str) -> int | None:
    i = s.find(pat)
    return i if i >= 0 else None


def _last_byte_index(s: str, pat: str) -> int | None:
    i = s.rfind(pat)
    return i if i >= 0 else None
