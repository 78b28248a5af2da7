"""Blocklist (C4 "bad words") filtering: flag documents containing any
listed word or phrase.

C4 (Raffel et al. 2020 §2.2) drops any page containing a word from a
blocklist; production crawls run the same stage with locale-specific
lists.  The operator compiles the list into ONE token-boundary,
case-insensitive regex evaluated as a codegen column expression — no
UDF, no shuffle, free at scan time, and the same pattern runs verbatim
in the DuckDB oracle (Java-regex ∩ RE2 dialect: literal words only,
``\\b`` boundaries, ASCII case folding via ``lower()``).

The list is a *parameter*: ships with a neutral spam-flavoured default
for tests/queries; a deployment passes its own.  No reference
counterpart (training-data layer).
"""
from __future__ import annotations

import re

from pyspark.sql import DataFrame, functions as F

# Demo list: one token that exists in the synthetic corpus ("dup", ~5%
# of docs) plus spam markers that don't — exercising both the hit and
# the zero-hit path.  Real deployments pass their own list.
DEFAULT_BLOCKLIST = ("dup", "spam", "casino")

_WORD_RE = re.compile(r"^[a-z0-9]+( [a-z0-9]+)*$")


def blocklist_pattern(words: tuple[str, ...] | list[str]) -> str:
    """`\\b(w1|w2|...)\\b` over the lowercased words.  Words must be
    lowercase ASCII alnum tokens (optionally space-separated phrases) —
    anything else would need dialect-specific escaping, so it is
    rejected rather than silently mis-matched."""
    ws = sorted(set(words))
    if not ws:
        # r"\b()\b" would match at every token boundary — flag nothing
        # by matching nothing is NOT what an empty list means; make the
        # caller say what they want
        raise ValueError("blocklist is empty")
    for w in ws:
        if not _WORD_RE.match(w):
            raise ValueError(f"blocklist word not lowercase-alnum: {w!r}")
    return r"\b(" + "|".join(ws) + r")\b"


def wordlist_hits(
    docs: DataFrame,
    words: tuple[str, ...] | list[str] = DEFAULT_BLOCKLIST,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """``(id_col, n_hits, flagged)`` per document: total blocklist
    occurrences (token-boundary, case-insensitive) and the C4 drop
    verdict (any hit flags the doc).  Pure codegen map — one scan,
    zero exchanges; at 100 TB this fuses into whatever scan is already
    reading the text."""
    pat = blocklist_pattern(words)
    n = F.when(F.col(text_col).isNull(), F.lit(0).cast("long")).otherwise(
        F.regexp_count(F.lower(F.col(text_col)), F.lit(pat)).cast("long")
    )
    return docs.select(
        F.col(id_col),
        n.alias("n_hits"),
        (n > 0).alias("flagged"),
    )


def q_wordlist_filter(spark, sf_dir: str) -> DataFrame:
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return wordlist_hits(docs).orderBy("doc_id")
