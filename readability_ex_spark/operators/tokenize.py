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

from pyspark.sql import Column, functions as F


def ws_tokens(text_col: str | Column, lower: bool = False) -> Column:
    """``array<string>`` of whitespace tokens; empty for NULL/blank.
    ``lower=True`` is the case-folded variant the quality features use
    (classifier buckets, repetition stats)."""
    c = F.col(text_col) if isinstance(text_col, str) else text_col
    body = F.lower(F.trim(c)) if lower else F.trim(c)
    return F.when(
        c.isNull() | (F.trim(c) == ""), F.array().cast("array<string>")
    ).otherwise(F.split(body, r"\s+"))
