"""Unigram LM quality scoring: hand-computed scores, OOV floor,
persisted-vocab reuse, and the broadcast-scored plan shape."""
from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from readability_ex_spark.operators.lmquality import (
    unigram_logprob,
    unigram_vocab,
)


@pytest.fixture(scope="module")
def corpus(spark):
    # counts: a=4, b=3, c=2, d=1 -> total=10
    return spark.createDataFrame(
        [
            (1, "a a b c"),
            (2, "a b d"),
            (3, "a b c"),
            (4, ""),
            (5, None),
        ],
        "doc_id long, text string",
    )


def test_hand_computed_scores(corpus):
    # vocab_size=3 keeps {a,b,c}; d is OOV with p = 1/10
    out = {
        r.doc_id: r
        for r in unigram_logprob(corpus, vocab_size=3).collect()
    }
    ln = math.log
    # doc 1: (ln4 + ln4 + ln3 + ln2)/4 - ln10
    exp1 = (ln(4) + ln(4) + ln(3) + ln(2)) / 4 - ln(10)
    assert out[1].lm_logprob == pytest.approx(exp1, abs=1e-4)
    assert out[1].n_oov == 0
    # doc 2: d OOV contributes ln(1)=0 to the sum
    exp2 = (ln(4) + ln(3)) / 3 - ln(10)
    assert out[2].lm_logprob == pytest.approx(exp2, abs=1e-4)
    assert out[2].n_oov == 1
    # empty / NULL docs: zero tokens, NULL score
    for d in (4, 5):
        assert out[d].n_tokens == 0
        assert out[d].lm_logprob is None


def test_common_words_beat_rare_words(corpus):
    out = {
        r.doc_id: r
        for r in unigram_logprob(corpus, vocab_size=3).collect()
    }
    # doc 3 (all in-vocab) must outscore doc 2 (one OOV floor hit)
    assert out[3].lm_logprob > out[2].lm_logprob


def test_vocab_artifact(corpus):
    v = unigram_vocab(corpus, vocab_size=3).collect()
    total = [r for r in v if r.token is None]
    assert len(total) == 1 and total[0].c == 10
    by_tok = {r.token: r.c for r in v if r.token is not None}
    assert by_tok == {"a": 4, "b": 3, "c": 2}


def test_persisted_vocab_reuse(spark, corpus):
    """Scoring a NEW batch against a persisted model must equal scoring
    with the same model inline — and use the model's counts, not the
    batch's."""
    vocab = unigram_vocab(corpus, vocab_size=3)
    batch = spark.createDataFrame(
        [(10, "a d d"), (11, "c c")], "doc_id long, text string"
    )
    out = {
        r.doc_id: r
        for r in unigram_logprob(batch, vocab=vocab).collect()
    }
    ln = math.log
    assert out[10].lm_logprob == pytest.approx(
        ln(4) / 3 - ln(10), abs=1e-4
    )
    assert out[10].n_oov == 2
    assert out[11].lm_logprob == pytest.approx(ln(2) - ln(10), abs=1e-4)


def test_scoring_join_is_broadcast(corpus):
    plan = (
        unigram_logprob(corpus, vocab_size=3)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BroadcastHashJoin" in plan
    for marker in ("BatchEvalPython", "ArrowEvalPython"):
        assert marker not in plan


def test_deterministic_vocab_tiebreak(spark):
    """Equal-count tokens cut bytewise: with vocab_size=1 of {x:1, y:1},
    'x' wins."""
    df = spark.createDataFrame([(1, "x y")], "doc_id long, text string")
    v = [
        r.token
        for r in unigram_vocab(df, vocab_size=1).collect()
        if r.token is not None
    ]
    assert v == ["x"]


def test_dsir_weights_prefer_target_like_docs(spark):
    """A doc written in the target domain's vocabulary outweighs a doc
    written in the corpus's own background vocabulary."""
    from readability_ex_spark.operators.lmquality import dsir_weights

    target = spark.createDataFrame(
        [(100, "quantum physics lattice " * 5)], "doc_id long, text string"
    )
    docs = spark.createDataFrame(
        [
            (1, "quantum physics lattice quantum physics"),
            (2, "celebrity gossip news celebrity gossip"),
            (3, ""),
        ],
        "doc_id long, text string",
    )
    out = {r.doc_id: r for r in dsir_weights(docs, target).collect()}
    assert out[1].dsir_weight > out[2].dsir_weight
    assert out[1].dsir_weight > 0  # more target-like than corpus-average
    assert out[3].n_tokens == 0 and out[3].dsir_weight is None


def test_dsir_persisted_vocabs(spark):
    """Passing persisted models reproduces the inline result."""
    from readability_ex_spark.operators.lmquality import (
        dsir_weights,
        unigram_vocab,
    )

    target = spark.createDataFrame(
        [(100, "alpha beta alpha")], "doc_id long, text string"
    )
    docs = spark.createDataFrame(
        [(1, "alpha gamma"), (2, "delta delta")],
        "doc_id long, text string",
    )
    inline = {
        r.doc_id: r.dsir_weight
        for r in dsir_weights(docs, target).collect()
    }
    persisted = {
        r.doc_id: r.dsir_weight
        for r in dsir_weights(
            docs,
            None,
            target_vocab=unigram_vocab(target),
            self_vocab=unigram_vocab(docs),
        ).collect()
    }
    assert inline == persisted


def test_lm_buckets_exact_split(spark):
    """Per-language ntile: near-equal band sizes, and every head doc
    outscores every tail doc within its language."""
    from readability_ex_spark.operators.lmquality import lm_buckets

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    b = lm_buckets(docs).cache()
    sizes = {
        (r.lang, r.lm_bucket): r.n
        for r in b.groupBy("lang", "lm_bucket")
        .agg(F.count("*").alias("n"))
        .collect()
    }
    langs = {lang for lang, _ in sizes}
    for lang in langs:
        per = [sizes.get((lang, k), 0) for k in (1, 2, 3)]
        assert max(per) - min(per) <= 1, (lang, per)
    edges = (
        b.filter(F.col("lm_logprob").isNotNull())
        .groupBy("lang", "lm_band")
        .agg(
            F.min("lm_logprob").alias("lo"),
            F.max("lm_logprob").alias("hi"),
        )
        .collect()
    )
    by = {(r.lang, r.lm_band): (r.lo, r.hi) for r in edges}
    for lang in langs:
        if (lang, "head") in by and (lang, "tail") in by:
            assert by[(lang, "head")][0] >= by[(lang, "tail")][1]
    b.unpersist()


def test_lm_bucket_thresholds_scale_path(spark):
    """The percentile-threshold variant is monotone within a language
    and lands band shares near the exact tertiles."""
    from readability_ex_spark.operators.lmquality import (
        assign_lm_buckets,
        lm_bucket_thresholds,
        unigram_logprob,
    )

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    scored = unigram_logprob(docs).join(
        docs.select("doc_id", "lang"), "doc_id"
    )
    cuts = lm_bucket_thresholds(scored)
    out = assign_lm_buckets(scored, cuts).cache()
    rows = out.select("lang", "lm_logprob", "lm_bucket").filter(
        F.col("lm_logprob").isNotNull()
    ).collect()
    by_lang: dict[str, list] = {}
    for r in rows:
        by_lang.setdefault(r.lang, []).append((r.lm_logprob, r.lm_bucket))
    for lang, pairs in by_lang.items():
        pairs.sort(key=lambda p: -p[0])
        buckets = [bk for _, bk in pairs]
        assert buckets == sorted(buckets), lang  # monotone
        n = len(buckets)
        for k in (1, 2, 3):
            share = buckets.count(k) / n
            assert 0.15 < share < 0.55, (lang, k, share)
    # NULL scores land in the tail bucket
    nulls = out.filter(F.col("lm_logprob").isNull())
    if nulls.count():
        assert {r.lm_bucket for r in nulls.collect()} == {3}
    out.unpersist()


# ---------------------------------------------------------------------------
# bigram_logprob
# ---------------------------------------------------------------------------


def test_bigram_hand_computed(corpus):
    """Tiny corpus, tiny model: verify the interpolated mixture per
    position against a direct Python recompute."""
    from readability_ex_spark.operators.lmquality import bigram_logprob

    # unigram counts: a=4 b=3 c=2 d=1, total=10; vocab_size=3 -> {a,b,c}
    # bigram counts: 'a a'=1 'a b'=3 'b c'=2 'b d'=1; bigram_size=2 ->
    # {'a b':3, 'b c':2}
    out = {
        r.doc_id: r
        for r in bigram_logprob(corpus, vocab_size=3, bigram_size=2).collect()
    }
    lam, om = 0.75, 0.25
    pu = {"a": 4 / 10, "b": 3 / 10, "c": 2 / 10, "d": 1 / 10}  # d = OOV floor
    # doc 1 = "a a b c": pos1 pure uni(a); 'a a' unseen pair, a in vocab
    # -> lam*0/4 + om*pu(a); 'a b' hit -> lam*3/4 + om*pu(b);
    # 'b c' hit -> lam*2/3 + om*pu(c)
    expect1 = (
        math.log(pu["a"])
        + math.log(lam * 0 / 4 + om * pu["a"])
        + math.log(lam * 3 / 4 + om * pu["b"])
        + math.log(lam * 2 / 3 + om * pu["c"])
    ) / 4
    assert out[1].lm2_logprob == pytest.approx(round(expect1, 4), abs=1e-9)
    assert out[1].n_bigram_hits == 2
    # doc 2 = "a b d": uni(a); 'a b' hit; 'b d' unseen, b in vocab ->
    # lam*0/3 + om*pu(d) (d OOV as a WORD uses the count-1 floor)
    expect2 = (
        math.log(pu["a"])
        + math.log(lam * 3 / 4 + om * pu["b"])
        + math.log(lam * 0 / 3 + om * pu["d"])
    ) / 3
    assert out[2].lm2_logprob == pytest.approx(round(expect2, 4), abs=1e-9)
    # empty docs: NULL score, zero counts
    assert out[4].lm2_logprob is None and out[4].n_tokens == 0
    assert out[5].lm2_logprob is None


def test_bigram_oov_context_scores_discounted_unigram(spark):
    """A word after an OOV context scores (1-lam) * p_uni, not a
    zero-mass crash and not full unigram mass."""
    from readability_ex_spark.operators.lmquality import bigram_logprob

    df = spark.createDataFrame(
        [(1, "x x x x"), (2, "rare x")], "doc_id long, text string"
    )
    # vocab_size=1 keeps only 'x' (5 occurrences); 'rare' is OOV
    out = {
        r.doc_id: r
        for r in bigram_logprob(df, vocab_size=1, bigram_size=1).collect()
    }
    lam, om = 0.75, 0.25
    # doc 2: pos1 = OOV floor 1/6 (total = 6 tokens); pos2 prev OOV ->
    # om * pu(x) with pu(x) = 5/6
    expect = (math.log(1 / 6) + math.log(om * (5 / 6))) / 2
    assert out[2].lm2_logprob == pytest.approx(round(expect, 4), abs=1e-9)


def test_bigram_persisted_models_reuse(spark, corpus):
    """Persisted unigram + bigram artifacts reproduce the self-trained
    scores (the incremental-update path)."""
    from readability_ex_spark.operators.lmquality import (
        bigram_logprob,
        bigram_vocab,
        unigram_vocab,
    )

    v = unigram_vocab(corpus, vocab_size=3).localCheckpoint(eager=True)
    b = bigram_vocab(corpus, bigram_size=2).localCheckpoint(eager=True)
    inline = {
        (r.doc_id, r.lm2_logprob)
        for r in bigram_logprob(corpus, vocab_size=3, bigram_size=2).collect()
    }
    reused = {
        (r.doc_id, r.lm2_logprob)
        for r in bigram_logprob(corpus, vocab=v, bigrams=b).collect()
    }
    assert inline == reused


def test_bigram_scoring_joins_broadcast(corpus):
    """All three model joins broadcast; the corpus is never shuffled on
    token or pair (the only exchange below the doc agg is doc-keyed)."""
    from readability_ex_spark.operators.lmquality import bigram_logprob

    plan = (
        bigram_logprob(corpus)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert plan.count("BroadcastHashJoin") >= 3
    assert "SortMergeJoin" not in plan
