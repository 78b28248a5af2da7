"""Mixture sampling: target proportions, binding stratum kept whole,
unweighted strata dropped, rerun stability, broadcast-only plan."""
from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from readability_ex_spark.operators.sampling import mixture_sample


@pytest.fixture(scope="module")
def skewed(spark):
    # en: 8000 docs, fr: 1000, de: 300, zh: 500 (no weight -> dropped)
    rows = (
        [(i, "en") for i in range(8000)]
        + [(10_000 + i, "fr") for i in range(1000)]
        + [(20_000 + i, "de") for i in range(300)]
        + [(30_000 + i, "zh") for i in range(500)]
    )
    return spark.createDataFrame(rows, "doc_id long, lang string")


WEIGHTS = {"en": 0.5, "fr": 0.3, "de": 0.2}


def test_mix_proportions(skewed):
    # binding stratum: de (300/0.2 = 1500) -> target mix ~750/450/300
    out = (
        mixture_sample(skewed, WEIGHTS)
        .groupBy("lang")
        .count()
        .collect()
    )
    by_lang = {r.lang: r["count"] for r in out}
    assert "zh" not in by_lang  # unweighted stratum dropped
    assert by_lang["de"] == 300  # binding stratum kept whole
    # md5-draw sampling is binomial around the target; 10% tolerance
    assert by_lang["en"] == pytest.approx(750, rel=0.1)
    assert by_lang["fr"] == pytest.approx(450, rel=0.1)


def test_rerun_stability(skewed):
    a = sorted(r.doc_id for r in mixture_sample(skewed, WEIGHTS).collect())
    b = sorted(r.doc_id for r in mixture_sample(skewed, WEIGHTS).collect())
    assert a == b


def test_adding_data_only_grows_membership(spark, skewed):
    """Doubling the binding stratum's data keeps every previously
    sampled non-binding doc (rates only rise), the md5-draw property
    fixed-rate sampling has and RNG sampling lacks."""
    before = {
        r.doc_id
        for r in mixture_sample(skewed, WEIGHTS).collect()
        if r.lang != "de"
    }
    more_de = spark.createDataFrame(
        [(40_000 + i, "de") for i in range(300)], "doc_id long, lang string"
    )
    after = {
        r.doc_id
        for r in mixture_sample(skewed.unionByName(more_de), WEIGHTS).collect()
    }
    assert before <= after


def test_corpus_never_shuffled(skewed):
    """The corpus side must reach the filter via broadcast join only —
    the single Exchange feeds the tiny per-stratum count agg."""
    plan = (
        mixture_sample(skewed, WEIGHTS)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BroadcastHashJoin" in plan
    for marker in ("BatchEvalPython", "ArrowEvalPython", "SortMergeJoin"):
        assert marker not in plan


def test_degenerate_weights_rejected(spark, skewed):
    """w <= 0 would turn rates into inf/NaN inside the plan — rejected
    up front; dropping a stratum is spelled by omitting it."""
    import pytest as _pytest

    for bad in ({"en": 0.0}, {"en": -1.0}, {}):
        with _pytest.raises(ValueError):
            mixture_sample(skewed, bad)


def test_token_weighted_mix(spark):
    """weight_col='n_tokens' targets TOKEN shares: long-doc strata
    downsample by mass, and the token-binding stratum is kept whole
    even when doc counts would bind differently."""
    # en: many short docs; de: few long docs -> by tokens de binds much
    # harder than by docs
    rows = (
        [(i, "en", 100) for i in range(6000)]       # 600k tokens
        + [(10_000 + i, "de", 2000) for i in range(100)]  # 200k tokens
    )
    df = spark.createDataFrame(rows, "doc_id long, lang string, n_tokens long")
    weights = {"en": 0.5, "de": 0.5}
    out = (
        mixture_sample(df, weights, weight_col="n_tokens")
        .groupBy("lang")
        .agg(F.sum("n_tokens").alias("toks"), F.count("*").alias("docs"))
        .collect()
    )
    by = {r.lang: r for r in out}
    # binding stratum by tokens: de (200k/0.5 = 400k < en's 1.2M)
    assert by["de"].docs == 100  # kept whole
    # en downsamples to ~200k tokens (== de's mass, 50/50 target)
    assert by["en"].toks == pytest.approx(200_000, rel=0.1)
    # doc-count mixing would instead keep ~all of de AND bind on de's
    # 100/0.5=200 -> en ~200 docs; token mixing keeps 10x more en docs
    assert by["en"].docs == pytest.approx(2000, rel=0.1)
