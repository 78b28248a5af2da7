"""Gopher repetition rules: n-gram coverage math on crafted docs."""
from __future__ import annotations

import pytest

from readability_ex_spark.operators.corpus import repetition_stats


@pytest.fixture(scope="module")
def out(spark):
    docs = spark.createDataFrame(
        [
            # "spam spam spam spam": top 2-gram "spam spam" cnt=3,
            # chars=9 -> cov 27 over total 19 chars = 1.421052
            (1, "spam spam spam spam"),
            # varied prose: every 2-gram unique (long enough that a
            # single gram's coverage is small — short docs are gated by
            # the word-count rule, not the repetition rules)
            (2, " ".join(f"w{i}" for i in range(60))),
            # duplicated 6-gram block: "a b c d e f" twice
            (3, "a b c d e f a b c d e f"),
            (4, ""),          # empty -> all zeros, all rules pass
            (5, None),        # null -> same
            (6, "single"),    # shorter than every n -> zeros
        ],
        "doc_id long, text string",
    )
    return {r.doc_id: r for r in repetition_stats(docs).collect()}


def test_spam_doc_fails_top2(out):
    r = out[1]
    assert r.top2gram_frac == pytest.approx(27 / 19, abs=1e-6)
    assert not r.r_top2gram
    assert not r.r_top3gram  # "spam spam spam" cnt=2, chars=14 -> 28/19


def test_prose_passes(out):
    r = out[2]
    assert r.r_top2gram and r.r_top3gram and r.r_dup6gram
    assert r.dup6gram_frac == 0.0  # no duplicated 6-gram


def test_duplicated_6gram_detected(out):
    r = out[3]
    # 6-grams: windows 1..7; "a b c d e f" occurs at i=1 and i=7 -> cnt 2,
    # cov = 2 * 11 = 22 over total 23 chars
    assert r.dup6gram_frac == pytest.approx(22 / 23, abs=1e-6)
    assert not r.r_dup6gram


def test_degenerate_docs_get_zero_verdicts(out):
    for doc_id in (4, 5, 6):
        r = out[doc_id]
        assert (
            r.top2gram_frac,
            r.top3gram_frac,
            r.dup6gram_frac,
        ) == (0.0, 0.0, 0.0)
        assert r.r_top2gram and r.r_top3gram and r.r_dup6gram


def test_vectorized_matches_naive_counter(spark):
    """The numpy path (factorize + void-view uniques + cumsum windows)
    must agree with a dumb Counter re-derivation on arbitrary corpora."""
    import random
    from collections import Counter

    from readability_ex_spark.operators.corpus import REP_NGRAM_SIZES

    rng = random.Random(42)
    vocab = [f"t{i}" for i in range(12)] + ["longword" * 3, "x"]
    docs = []
    for doc_id in range(40):
        n = rng.choice([0, 1, 5, 29, 30, 31, 63, 200])
        docs.append((doc_id, " ".join(rng.choice(vocab) for _ in range(n))))

    def naive(text):
        toks = text.split() if text.strip() else []
        total = len(" ".join(toks))
        out = {}
        for n in REP_NGRAM_SIZES:
            grams = [" ".join(toks[i : i + n]) for i in range(len(toks) - n + 1)]
            c = Counter(grams)
            top = max((cnt * len(g) for g, cnt in c.items()), default=0)
            dup = sum(cnt * len(g) for g, cnt in c.items() if cnt >= 2)
            out[n] = (top, dup)
        return (
            round(out[2][0] / total, 6) if total else 0.0,
            round(out[3][0] / total, 6) if total else 0.0,
            round(out[6][1] / total, 6) if total else 0.0,
        )

    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = {
        r.doc_id: (r.top2gram_frac, r.top3gram_frac, r.dup6gram_frac)
        for r in repetition_stats(df).collect()
    }
    for doc_id, text in docs:
        want = naive(text.lower())
        assert got[doc_id] == pytest.approx(want, abs=2e-6), (doc_id, text[:50])


def test_plan_is_map_only(spark):
    """Document-local stats must never shuffle: no Exchange, no
    SortMergeJoin — one scan, one Arrow stage."""
    df = spark.createDataFrame([(1, "a b c")], "doc_id long, text string")
    plan = (
        repetition_stats(df)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Exchange" not in plan
    assert "Join" not in plan
