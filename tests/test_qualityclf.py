"""Trained quality classifier (operators/qualityclf.py): deterministic
training, held-out generalization, Spark/driver scorer agreement, and
the zero-UDF scoring plan."""

from __future__ import annotations

import math

import pyspark.sql.functions as F

from readability_ex_spark.operators.qualityclf import (
    _BAD_TEMPLATES,
    _GOOD_TEMPLATES,
    SCORE_DECIMALS,
    default_model,
    score_texts,
    train_quality_classifier,
    train_quality_model,
    with_quality_scores,
)


def _held_out(n_topics: int = 8):
    """Labeled texts built from topics the default model never saw."""
    topics = [f"held{i}topic" for i in range(n_topics)]
    texts, labels = [], []
    for i, t in enumerate(topics):
        o = topics[(i + 1) % n_topics]
        for tpl in _GOOD_TEMPLATES:
            texts.append(tpl.format(t, o))
            labels.append(True)
        for tpl in _BAD_TEMPLATES:
            texts.append(tpl.format(t, o))
            labels.append(False)
    return texts, labels


def test_training_is_deterministic():
    assert default_model() == default_model()


def test_generalizes_to_held_out_topics():
    m = default_model()
    texts, labels = _held_out()
    scores = score_texts(m, texts)
    acc = sum(
        (s > 0.5) == y for s, y in zip(scores, labels)
    ) / len(labels)
    assert acc >= 0.9, acc


def test_spark_scores_match_driver_reference(spark):
    texts, _ = _held_out(4)
    texts += ["", "   ", None, "one-token"]
    m = default_model()
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    got = {
        r.doc_id: r.clf_score
        for r in with_quality_scores(df, m).select(
            "doc_id", "clf_score"
        ).collect()
    }
    expect = score_texts(m, texts)
    for i, e in enumerate(expect):
        assert abs(got[i] - e) < 10 ** -(SCORE_DECIMALS - 1), (i, got[i], e)
    # empty / NULL text scores exactly sigmoid(bias)
    base = round(1.0 / (1.0 + math.exp(-m.bias)), SCORE_DECIMALS)
    for i in (len(texts) - 4, len(texts) - 3, len(texts) - 2):
        assert got[i] == base


def test_train_on_dataframe_labels(spark):
    texts, labels = _held_out(10)
    df = spark.createDataFrame(
        [(i, t, y) for i, (t, y) in enumerate(zip(texts, labels))],
        "doc_id long, text string, label boolean",
    )
    m = train_quality_classifier(df, "label", max_rows=1000)
    scored = with_quality_scores(df, m)
    acc = (
        scored.select(
            ((F.col("clf_score") > 0.5) == F.col("label"))
            .cast("int")
            .alias("ok")
        )
        .agg(F.avg("ok"))
        .first()[0]
    )
    assert acc >= 0.95, acc


def test_bounded_sample_is_deterministic(spark):
    texts, labels = _held_out(10)
    df = spark.createDataFrame(
        [(i, t, y) for i, (t, y) in enumerate(zip(texts, labels))],
        "doc_id long, text string, label boolean",
    ).repartition(7)
    m1 = train_quality_classifier(df, "label", max_rows=40)
    m2 = train_quality_classifier(df, "label", max_rows=40)
    assert m1 == m2


def test_scoring_plan_is_udf_free_and_broadcasts(spark):
    df = spark.createDataFrame(
        [(1, "the story of rivers"), (2, "buy cheap buy cheap")],
        "doc_id long, text string",
    )
    plan = (
        with_quality_scores(df, default_model())
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BatchEvalPython" not in plan and "PythonUDF" not in plan
    assert "BroadcastHashJoin" in plan


def test_save_load_roundtrip(spark, tmp_path):
    from readability_ex_spark.operators.qualityclf import (
        load_model,
        save_model,
    )

    m = default_model()
    save_model(m, spark, str(tmp_path / "clf"))
    assert load_model(spark, str(tmp_path / "clf")) == m


def test_trainer_script_end_to_end(spark, tmp_path):
    """scripts/train_quality_clf.py trains, persists, and reports
    accuracy; the saved model drives with_quality_scores."""
    import subprocess
    import sys as _sys
    from pathlib import Path as _Path

    from readability_ex_spark.operators.qualityclf import (
        load_model,
        with_quality_scores,
    )

    repo = _Path(__file__).resolve().parent.parent
    texts, labels = _held_out(10)
    spark.createDataFrame(
        [(i, t, y) for i, (t, y) in enumerate(zip(texts, labels))],
        "doc_id long, text string, is_good boolean",
    ).coalesce(1).write.mode("overwrite").parquet(
        str(tmp_path / "labeled")
    )
    proc = subprocess.run(
        [
            _sys.executable, str(repo / "scripts" / "train_quality_clf.py"),
            "--input", str(tmp_path / "labeled"),
            "--output", str(tmp_path / "model"),
            "--label-col", "is_good",
        ],
        capture_output=True, text=True, timeout=420, cwd=str(repo),
    )
    assert proc.returncode == 0, proc.stderr[-1500:]
    acc_line = [
        ln for ln in proc.stdout.splitlines() if ln.startswith("labeled_rows=")
    ]
    assert acc_line
    acc = float(acc_line[0].split("accuracy=")[1])
    assert acc >= 0.95, proc.stdout
    m = load_model(spark, str(tmp_path / "model"))
    assert m.weights  # non-trivial model round-trips through the script
    df = spark.createDataFrame(
        [(0, "the quick study of rivers went to print")],
        "doc_id long, text string",
    )
    assert with_quality_scores(df, m).first().clf_score > 0.5


def test_training_inputs_affect_weights():
    m1 = train_quality_model(["alpha beta", "gamma delta"], [True, False])
    m2 = train_quality_model(["alpha beta", "gamma delta"], [False, True])
    assert m1 != m2


def test_py_ws_tokens_matches_jvm_expression(spark):
    """The driver-side tokenizer twin reproduces ws_tokens exactly on
    the whitespace shapes where str.split() diverges (NBSP, tabs at the
    edges, runs of mixed ASCII whitespace, NULL/blank)."""
    from pyspark.sql import functions as F

    from readability_ex_spark.operators.tokenize import (
        py_ws_tokens,
        ws_tokens,
    )

    cases = [
        None,
        "",
        "   ",
        "\t\n",
        "plain words here",
        "foo bar",          # NBSP: ONE jvm token, two for str.split
        "\tlead tab",            # trim keeps the tab -> leading empty tok
        "trail tab\t",
        "a  b\t\tc\nd",
        " MiXeD Case WS ",
    ]
    df = spark.createDataFrame([(i, t) for i, t in enumerate(cases)],
                               "i int, text string")
    for lower in (False, True):
        jvm = {
            r.i: r.toks
            for r in df.select(
                "i", ws_tokens("text", lower=lower).alias("toks")
            ).collect()
        }
        for i, t in enumerate(cases):
            assert jvm[i] == py_ws_tokens(t, lower=lower), (t, lower)
