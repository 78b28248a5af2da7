"""Corpus-mixing operators: deterministic sampling + budget packing."""

from __future__ import annotations

from readability_ex_spark.operators.sampling import (
    deterministic_sample,
    sample_hex_threshold,
    token_budget_pack,
)


def _docs(spark, n=400):
    rows = [(i, "en" if i % 2 else "de") for i in range(n)]
    return spark.createDataFrame(rows, "doc_id long, lang string")


def test_deterministic_sample_reproducible_and_nested(spark):
    docs = _docs(spark)
    half = {r.doc_id for r in deterministic_sample(docs, {"en": 0.5}).collect()}
    again = {r.doc_id for r in deterministic_sample(docs, {"en": 0.5}).collect()}
    assert half == again  # pure function of the id, no RNG state
    tenth = {r.doc_id for r in deterministic_sample(docs, {"en": 0.1}).collect()}
    # prefix-threshold draws nest: a lower rate is a SUBSET of a higher
    # one (raising a stratum's rate never evicts previously kept rows)
    assert tenth <= half
    # unlisted strata use default_rate (0 -> dropped entirely)
    assert all(i % 2 for i in half)
    # rate ~ proportion (200 en docs; md5 draw is uniform)
    assert 60 <= len(half) <= 140
    everything = deterministic_sample(
        docs, {"en": 1.0}, default_rate=1.0
    ).count()
    assert everything == docs.count()


def test_sample_hex_threshold_edges():
    assert sample_hex_threshold(0.0) == "000000"
    assert sample_hex_threshold(1.0) == "g"  # sorts above every hex digit
    assert sample_hex_threshold(0.5) == "800000"


def test_token_budget_pack_greedy_by_quality(spark):
    rows = [
        # (doc_id, lang, n_tokens, quality_score)
        (1, "en", 600, 0.9),
        (2, "en", 500, 0.8),
        (3, "en", 600, 0.7),   # would overflow the 1200 budget at cum=1700
        (4, "en", 100, 0.6),   # still fits after 3 is skipped? no — cum
                               # counts ALL ordered rows above, so 4's cum
                               # is 1800: greedy cumulative, not knapsack
        (5, "de", 300, 0.5),
        (6, "de", 9999, 0.4),  # overflows alone
    ]
    df = spark.createDataFrame(
        rows, "doc_id long, lang string, n_tokens long, quality_score double"
    )
    kept = {r.doc_id for r in token_budget_pack(df, 1200).collect()}
    assert kept == {1, 2, 5}
    # deterministic tiebreak: equal quality orders by doc_id
    ties = spark.createDataFrame(
        [(10, "en", 700, 0.5), (11, "en", 700, 0.5)],
        "doc_id long, lang string, n_tokens long, quality_score double",
    )
    assert {r.doc_id for r in token_budget_pack(ties, 700).collect()} == {10}


def test_shard_assign_properties(spark):
    """Shards fill to ~shard_tokens in id order, overflow by at most
    one doc, and appending new ids never reassigns existing docs."""
    from pyspark.sql import functions as F

    from readability_ex_spark.operators.sampling import shard_assign

    rows = [(i, "en", 100 + (i % 7) * 30) for i in range(40)] + [
        (100 + i, "fr", 250) for i in range(10)
    ]
    df = spark.createDataFrame(rows, "doc_id long, lang string, n_tokens long")
    out = shard_assign(df, 1_000).collect()
    by_doc = {r.doc_id: r.shard_id for r in out}
    # recompute naively
    for lang in ("en", "fr"):
        docs = sorted(
            [r for r in rows if r[1] == lang], key=lambda r: r[0]
        )
        cum = 0
        for d, _, n in docs:
            assert by_doc[d] == cum // 1_000, d
            cum += n
    # monotone under append
    more = spark.createDataFrame(
        [(500, "en", 999)], "doc_id long, lang string, n_tokens long"
    )
    out2 = {
        r.doc_id: r.shard_id
        for r in shard_assign(df.unionByName(more), 1_000).collect()
    }
    for d, s in by_doc.items():
        assert out2[d] == s


def test_shard_assign_rejects_nonpositive_size(spark):
    import pytest as _pytest

    from readability_ex_spark.operators.sampling import shard_assign

    df = spark.createDataFrame(
        [(1, "en", 10)], "doc_id long, lang string, n_tokens long"
    )
    for bad in (0, -5):
        with _pytest.raises(ValueError):
            shard_assign(df, bad)


def test_pack_sequences_invariants(spark):
    """Every sequence except each stratum's last is exactly full; each
    doc's slices tile [0, n_tokens) contiguously; slice offsets fit the
    sequence; zero-token docs vanish."""
    from readability_ex_spark.operators.sampling import (
        SEQ_LEN,
        q_pack_sequences,
    )

    rows = q_pack_sequences(spark, "/root/testdata/sf0.001").collect()
    assert rows
    by_seq: dict[tuple, int] = {}
    by_doc: dict[int, list] = {}
    for r in rows:
        assert 0 <= r.tok_from < r.tok_to
        assert 0 <= r.seq_off and r.seq_off + (r.tok_to - r.tok_from) <= SEQ_LEN
        by_seq[(r.lang, r.seq_id)] = by_seq.get((r.lang, r.seq_id), 0) + (
            r.tok_to - r.tok_from
        )
        by_doc.setdefault(r.doc_id, []).append(r)
    last_seq = {}
    for (lang, sid) in by_seq:
        last_seq[lang] = max(last_seq.get(lang, -1), sid)
    for (lang, sid), filled in by_seq.items():
        if sid < last_seq[lang]:
            assert filled == SEQ_LEN, (lang, sid, filled)
        else:
            assert 0 < filled <= SEQ_LEN
    for doc_id, slices in by_doc.items():
        slices.sort(key=lambda r: r.seq_id)
        assert slices[0].tok_from == 0
        for a, b in zip(slices, slices[1:]):
            assert b.tok_from == a.tok_to  # contiguous
            assert b.seq_id == a.seq_id + 1
            assert b.seq_off == 0  # continuation starts a sequence


def test_pack_sequences_within_shards(spark):
    """shard_col packing: sequence ids restart per shard and every
    slice's doc belongs to that shard (the bounded-window 100 TB shape
    composed with shard_assign)."""
    from pyspark.sql import functions as F

    from readability_ex_spark.operators.sampling import (
        _docs_with_signals,
        pack_sequences,
        shard_assign,
    )

    docs = _docs_with_signals(spark, "/root/testdata/sf0.001").select(
        "doc_id", "lang", "n_tokens"
    )
    sharded = shard_assign(docs, 2_000)
    packed = pack_sequences(
        sharded, 512, shard_col="shard_id"
    )
    assert packed.filter(F.col("seq_id") < 0).count() == 0
    # every (lang, shard) partition has a seq 0
    firsts = (
        packed.groupBy("lang", "shard_id")
        .agg(F.min("seq_id").alias("m"))
        .collect()
    )
    assert firsts and all(r.m == 0 for r in firsts)
    # a doc's slices never leave its shard
    assert (
        packed.join(sharded, ["doc_id", "lang", "shard_id"], "left_anti")
        .count()
        == 0
    )


def test_pack_sequences_plan_single_window_exchange(spark):
    """pack_sequences costs one hash exchange (the stratum window) and
    nothing else — the explode adds no shuffle."""
    from readability_ex_spark.operators.sampling import pack_sequences

    df = spark.createDataFrame(
        [(1, "en", 700), (2, "en", 300), (3, "de", 900)],
        "doc_id long, lang string, n_tokens long",
    )
    plan = (
        pack_sequences(df, 512)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert plan.count("Exchange hashpartitioning") == 1
    assert "BatchEvalPython" not in plan


def test_corpus_split_stable_under_growth(spark):
    """A document's split is a pure function of its id: the assignment
    over a subset equals the assignment over the grown corpus."""
    from readability_ex_spark.operators.sampling import corpus_split

    small = spark.range(0, 200).withColumnRenamed("id", "doc_id")
    big = spark.range(0, 2000).withColumnRenamed("id", "doc_id")
    a = {r.doc_id: r.split for r in corpus_split(small).collect()}
    b = {r.doc_id: r.split for r in corpus_split(big).collect()}
    assert all(b[k] == v for k, v in a.items())
    # bands roughly hold on 2000 ids (5% each, generous tolerance)
    from collections import Counter

    c = Counter(b.values())
    assert 40 <= c["test"] <= 160 and 40 <= c["val"] <= 160
    assert c["train"] == 2000 - c["test"] - c["val"]


def test_corpus_split_rejects_bad_fracs(spark):
    import pytest

    from readability_ex_spark.operators.sampling import corpus_split

    df = spark.range(1).withColumnRenamed("id", "doc_id")
    with pytest.raises(ValueError):
        corpus_split(df, val_frac=0.6, test_frac=0.5)
    with pytest.raises(ValueError):
        corpus_split(df, val_frac=-0.1)


def test_corpus_split_plan_exchange_free(spark):
    """The split is a codegen projection — no shuffle, no Python."""
    from readability_ex_spark.operators.sampling import corpus_split

    df = spark.range(0, 100).withColumnRenamed("id", "doc_id")
    plan = (
        corpus_split(df)._jdf.queryExecution().executedPlan().toString()
    )
    assert "Exchange" not in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
