"""Trained-BPE tokenizer: reference-implementation equivalence,
determinism, cross-engine counts, and the shard-unit drift it closes."""

from __future__ import annotations

import random

from readability_ex_spark.operators.bpe import (
    BpeModel,
    bpe_count_sql,
    default_model,
    train_bpe,
)


def _reference_encode(model: BpeModel, word: str) -> list[str]:
    """Sennrich-style apply: symbol list, one merge rule at a time in
    learned order, left-to-right non-overlapping — the semantics the
    single-char replace chain must reproduce."""
    seq = [ch for ch in word if not 0xE000 <= ord(ch) <= 0xF8FF]
    for a, b in model.merges:
        out: list[str] = []
        i = 0
        while i < len(seq):
            if i + 1 < len(seq) and seq[i] == a and seq[i + 1] == b:
                out.append(a + b)
                i += 2
            else:
                out.append(seq[i])
                i += 1
        seq = out
    return seq


def test_training_is_deterministic():
    texts = ["the cat sat on the mat", "the bat and the rat chat"] * 5
    m1 = train_bpe(texts, n_merges=16)
    m2 = train_bpe(texts, n_merges=16)
    assert m1.merges == m2.merges
    assert m1.rules == m2.rules


def test_merges_learn_frequent_pairs():
    texts = ["aaab aaab aaab bbbc"] * 4
    m = train_bpe(texts, n_merges=4)
    assert ("a", "a") in m.merges  # the dominant pair merges first


def test_encode_word_matches_reference_and_roundtrips():
    rng = random.Random(7)
    texts = [
        " ".join(
            "".join(rng.choice("abcdef") for _ in range(rng.randrange(1, 9)))
            for _ in range(30)
        )
        for _ in range(20)
    ]
    model = train_bpe(texts, n_merges=32)
    words = set(w for t in texts for w in t.split())
    words.add("unseen")
    words.add("fedcba")
    for w in sorted(words):
        toks = model.encode_word(w)
        assert "".join(toks) == w  # lossless
        assert toks == _reference_encode(model, w)


def test_count_expr_matches_duckdb_and_python(spark):
    """The Spark codegen replace chain, the inlined DuckDB twin, and
    the per-word Python apply agree doc-for-doc."""
    import duckdb

    model = default_model()
    path = "/root/testdata/sf0.001/documents.parquet"
    sql = (
        f"SELECT doc_id, {bpe_count_sql(model)} AS n FROM "
        f"read_parquet('{path}') ORDER BY doc_id LIMIT 50"
    )
    duck = dict(duckdb.sql(sql).fetchall())
    docs = spark.read.parquet(path).orderBy("doc_id").limit(50)
    got = {
        r.doc_id: r.n
        for r in docs.select(
            "doc_id", model.count_expr("text").alias("n")
        ).collect()
    }
    assert got == duck
    texts = {
        r.doc_id: r.text for r in docs.select("doc_id", "text").collect()
    }
    for d, t in texts.items():
        n_py = sum(len(model.encode_word(w)) for w in t.split())
        assert got[d] == n_py


def test_count_expr_is_udf_free(spark):
    model = default_model()
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    plan = (
        docs.select(model.count_expr("text").alias("n"))
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BatchEvalPython" not in plan
    assert "ArrowEvalPython" not in plan


def test_shard_assign_unit_drift(spark):
    """Re-keying shard_assign on trained-BPE counts changes the shard
    map materially (the 20-40% proxy drift VERDICT r5 'what's missing'
    #1 describes) while both keyings satisfy the shard invariants."""
    from pyspark.sql import functions as F

    from readability_ex_spark.operators.sampling import shard_assign

    model = default_model()
    docs = (
        spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
        .select(
            "doc_id",
            "lang",
            F.size(F.split(F.trim("text"), r"\s+"))
            .cast("long")
            .alias("n_tokens"),
            model.count_expr("text").alias("n_bpe_tokens"),
        )
        .cache()
    )
    tot = docs.agg(
        F.sum("n_tokens").alias("ws"), F.sum("n_bpe_tokens").alias("bpe")
    ).collect()[0]
    # the unit the proxy under-counts by: real vocabularies emit more,
    # shorter units than whitespace words
    assert tot.bpe > tot.ws * 1.2
    by_ws = {
        r.doc_id: r.shard_id
        for r in shard_assign(docs, 2_000, tokens_col="n_tokens").collect()
    }
    by_bpe = {
        r.doc_id: r.shard_id
        for r in shard_assign(
            docs, 2_000, tokens_col="n_bpe_tokens"
        ).collect()
    }
    assert set(by_ws) == set(by_bpe)
    # same nominal budget, different unit -> more shards under BPE
    assert max(by_bpe.values()) > max(by_ws.values())
    docs.unpersist()
