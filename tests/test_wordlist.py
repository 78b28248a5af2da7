"""Blocklist filter: boundary/case semantics, phrase support, list
validation, exchange-free plan."""
from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from readability_ex_spark.operators.wordlist import (
    blocklist_pattern,
    wordlist_hits,
)


@pytest.fixture(scope="module")
def rows(spark):
    docs = spark.createDataFrame(
        [
            (1, "visit our CASINO and casino hall"),  # case-folded, 2 hits
            (2, "casinos are not casino-adjacent"),  # boundary: 1 hit
            (3, "clean text here"),
            (4, "win big money now"),  # phrase hit
            (5, None),
            (6, ""),
        ],
        "doc_id long, text string",
    )
    out = wordlist_hits(docs, words=("casino", "win big money"))
    return {r.doc_id: r for r in out.collect()}


def test_case_insensitive_count(rows):
    assert rows[1].n_hits == 2 and rows[1].flagged


def test_token_boundaries(rows):
    # "casinos" doesn't match; hyphenated "casino-adjacent" does (\b at
    # the hyphen), matching C4's word-boundary semantics
    assert rows[2].n_hits == 1


def test_phrase_match(rows):
    assert rows[4].n_hits == 1 and rows[4].flagged


def test_clean_null_empty(rows):
    for d in (3, 5, 6):
        assert rows[d].n_hits == 0 and not rows[d].flagged


def test_pattern_validation():
    assert blocklist_pattern(["b", "a"]) == r"\b(a|b)\b"
    with pytest.raises(ValueError):
        blocklist_pattern(["Upper"])
    with pytest.raises(ValueError):
        blocklist_pattern(["regex|inject"])


def test_plan_exchange_free(spark):
    docs = spark.range(10).select(
        F.col("id").alias("doc_id"), F.lit("casino text").alias("text")
    )
    plan = (
        wordlist_hits(docs)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Exchange" not in plan
    for marker in ("BatchEvalPython", "ArrowEvalPython", "mapInPandas"):
        assert marker not in plan


def test_empty_blocklist_rejected():
    with pytest.raises(ValueError, match="empty"):
        blocklist_pattern([])
