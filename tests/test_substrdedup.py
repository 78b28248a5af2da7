"""Exact substring dedup: crafted-span semantics + naive re-derivation
oracle on random dup-planted corpora."""
from __future__ import annotations

import random

import pytest
from pyspark.sql import functions as F

from readability_ex_spark.operators.substrdedup import substring_dedup


def _naive(corpus: dict[int, str], k: int) -> dict[int, tuple]:
    """Reference implementation: dict of window hash -> occurrences in
    (doc_id, pos) order; non-first occurrences cut, overlaps merged."""
    occ: dict[tuple, list] = {}
    toks = {d: t.split() for d, t in corpus.items()}
    for d in sorted(toks):
        ts = toks[d]
        for i in range(max(0, len(ts) - k + 1)):
            occ.setdefault(tuple(ts[i : i + k]), []).append((d, i))
    removed = {d: set() for d in toks}
    for win, places in occ.items():
        if len(places) > 1:
            for d, p in places[1:]:
                removed[d].update(range(p, p + k))
    out = {}
    for d, ts in toks.items():
        kept = [t for i, t in enumerate(ts) if i not in removed[d]]
        out[d] = (len(ts), len(ts) - len(kept), " ".join(kept))
    return out


def _run(spark, corpus: dict[int, str], k: int) -> dict[int, tuple]:
    df = spark.createDataFrame(
        sorted(corpus.items()), "doc_id long, text string"
    )
    return {
        r.doc_id: (r.n_tokens, r.n_dup_tokens, r.text_clean)
        for r in substring_dedup(df, k=k).collect()
    }


def test_cross_doc_first_occurrence_survives(spark):
    run = " ".join(f"w{i}" for i in range(6))
    corpus = {
        1: f"alpha {run} beta",
        2: f"gamma {run} delta",
    }
    out = _run(spark, corpus, k=6)
    assert out[1] == (8, 0, corpus[1])  # first occurrence kept whole
    assert out[2] == (8, 6, "gamma delta")


def test_within_doc_repeat_removed(spark):
    run = " ".join(f"x{i}" for i in range(5))
    corpus = {7: f"{run} middle {run}"}
    out = _run(spark, corpus, k=5)
    n, dup, clean = out[7]
    assert (n, dup) == (11, 5)
    assert clean == f"{run} middle"


def test_long_run_merges_overlapping_windows(spark):
    """A 10-token shared run with k=5 removes the WHOLE run from the
    second doc (6 overlapping dup windows merge into one span)."""
    run = " ".join(f"r{i}" for i in range(10))
    corpus = {1: run, 2: f"pre {run} post"}
    out = _run(spark, corpus, k=5)
    assert out[1][1] == 0
    assert out[2] == (12, 10, "pre post")


def test_below_floor_untouched(spark):
    corpus = {1: "a b c", 2: "a b c"}  # 3 tokens < k
    out = _run(spark, corpus, k=5)
    assert out[1] == (3, 0, "a b c")
    assert out[2] == (3, 0, "a b c")


def test_empty_and_null(spark):
    df = spark.createDataFrame(
        [(1, ""), (2, None)], "doc_id long, text string"
    )
    out = {r.doc_id: r for r in substring_dedup(df, k=5).collect()}
    for d in (1, 2):
        assert out[d].n_tokens == 0
        assert out[d].text_clean == ""


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_naive_rederivation(spark, seed):
    """Random corpora with planted shared runs match the naive dict
    re-derivation row-for-row."""
    rng = random.Random(seed)
    vocab = [f"t{i}" for i in range(30)]
    planted = [rng.choice(vocab) for _ in range(12)]
    corpus = {}
    for d in range(14):
        words = [rng.choice(vocab) for _ in range(rng.randrange(0, 60))]
        if d % 3 == 0 and len(words) > 4:
            at = rng.randrange(0, len(words))
            words[at:at] = planted  # plant a shared 12-run
        corpus[d] = " ".join(words)
    assert _run(spark, corpus, k=8) == _naive(corpus, k=8)


def test_single_token_shuffle(spark):
    """The opt-in window plan must really be single-exchange: one
    Exchange on the hash (a window function yields count + rank
    together), not an agg + self-join pair."""
    df = spark.createDataFrame(
        [(i, "a b c d e f g h i j") for i in range(4)],
        "doc_id long, text string",
    )
    plan = (
        substring_dedup(df, k=5, skew_safe=False)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert plan.count("Exchange hashpartitioning(h#") <= 1


@pytest.mark.parametrize("seed", [0, 3])
def test_skew_safe_plan_equivalent(spark, seed):
    """The agg+join skew-safe plan returns byte-identical results to
    the single-exchange window plan."""
    rng = random.Random(seed)
    vocab = [f"t{i}" for i in range(20)]
    hot = " ".join(rng.choice(vocab) for _ in range(10))
    corpus = {}
    for d in range(12):
        words = [rng.choice(vocab) for _ in range(rng.randrange(0, 50))]
        if d % 2 == 0:  # a hot run repeated in half the docs
            at = rng.randrange(0, len(words) + 1)
            words[at:at] = hot.split()
        corpus[d] = " ".join(words)
    df = spark.createDataFrame(
        sorted(corpus.items()), "doc_id long, text string"
    )
    a = {
        r.doc_id: (r.n_tokens, r.n_dup_tokens, r.text_clean)
        for r in substring_dedup(df, k=8, skew_safe=False).collect()
    }
    b = {
        r.doc_id: (r.n_tokens, r.n_dup_tokens, r.text_clean)
        for r in substring_dedup(df, k=8, skew_safe=True).collect()
    }
    assert a == b


def test_skew_safe_plan_has_no_window(spark):
    """skew_safe=True must really avoid the unsplittable window: no
    Window node, and the verdict arrives via join."""
    df = spark.createDataFrame(
        [(i, "a b c d e f g h i j") for i in range(4)],
        "doc_id long, text string",
    )
    plan = (
        substring_dedup(df, k=5, skew_safe=True)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Window" not in plan
    assert "Join" in plan


def test_default_plan_is_skew_safe(spark):
    """The DEFAULT plan (what compositions ship) must be the skew-safe
    agg+join verdict — a hot boilerplate window's hash partition must
    be AQE-splittable, which a Window node is not."""
    df = spark.createDataFrame(
        [(i, "a b c d e f g h i j") for i in range(4)],
        "doc_id long, text string",
    )
    plan = (
        substring_dedup(df, k=5)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Window" not in plan


def test_cut_matches_jvm_tokenizer_on_edge_whitespace(spark):
    """Window positions come from the JVM tokenizer (F.trim strips
    SPACES only, so a leading tab yields a leading empty token); the
    cut must operate on the same token array, or positions shift and
    the wrong tokens are removed (ADVICE r5 finding)."""
    run = " ".join(f"w{i}" for i in range(5))
    corpus = {
        1: f"\t{run} tail\n",  # leading tab -> JVM split keeps "" at pos 0
        2: f"pre {run} post",
    }
    df = spark.createDataFrame(
        sorted(corpus.items()), "doc_id long, text string"
    )
    out = {
        r.doc_id: (r.n_tokens, r.n_dup_tokens, r.text_clean)
        for r in substring_dedup(df, k=5).collect()
    }
    # doc 1 is first in (doc_id, pos) order: run kept; doc 2 loses it.
    # n_tokens for doc 1 counts the JVM's leading AND trailing empty
    # tokens (Spark split uses limit -1, keeping trailing empties —
    # 8), and the cut text round-trips the JVM token array exactly.
    assert out[1] == (8, 0, f" {run} tail ")
    assert out[2] == (7, 5, "pre post")
