"""The corpus-standard whitespace tokenizer, as one shared expression.

Every token-grain operator (LM scoring, BM25, chunking, n-grams,
decontamination spans, quality features) must tokenize IDENTICALLY or
their term statistics silently drift apart — a fix to one copy would
break df/tf agreement with the others.  This is that single contract:

    trim, split on ``\\s+``; NULL or whitespace-only text -> empty
    array (``F.split`` alone would return ``[""]``).

The DuckDB oracle twin is ``regexp_split_to_array(trim(text),'\\s+')``
with the same empty-text guard — dialect-checked by every hash-green
token-grain query in ``__spark_entry__.py``.
"""

from __future__ import annotations

import re

from pyspark.sql import Column, functions as F

# Java \s is ASCII-only: [ \t\n\x0B\f\r] — NOT Python str.split()'s
# Unicode whitespace (U+00A0 etc.)
_JAVA_WS = re.compile("[ \\t\\n\\x0b\\f\\r]+")


def ws_tokens(text_col: str | Column, lower: bool = False) -> Column:
    """``array<string>`` of whitespace tokens; empty for NULL/blank.
    ``lower=True`` is the case-folded variant the quality features use
    (classifier buckets, repetition stats)."""
    c = F.col(text_col) if isinstance(text_col, str) else text_col
    body = F.lower(F.trim(c)) if lower else F.trim(c)
    return F.when(
        c.isNull() | (F.trim(c) == ""), F.array().cast("array<string>")
    ).otherwise(F.split(body, r"\s+"))


def py_ws_tokens(text: str | None, lower: bool = False) -> list[str]:
    """Driver-side twin of :func:`ws_tokens`, reproducing the JVM
    semantics EXACTLY — anything trained/referenced in Python against
    text the cluster tokenizes must use this, not ``str.split()``:

    - trim strips ASCII spaces only (``F.trim``), not all whitespace;
    - NULL or space-only text -> ``[]``;
    - split on Java ``\\s`` (ASCII ``[ \\t\\n\\x0B\\f\\r]``), keeping
      leading/trailing empty tokens like ``F.split``'s limit=-1 —
      ``re.split`` matches both, ``str.split()`` matches neither (it
      also swallows U+00A0 and friends, producing buckets the
      distributed scorer never sees).
    """
    if text is None:
        return []
    t = text.strip(" ")
    if t == "":
        return []
    if lower:
        t = t.lower()
    return _JAVA_WS.split(t)
