"""Decontamination: exact 13-gram overlap vs a broadcast eval set."""
from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from readability_ex_spark.operators.decontam import (
    N_DECONTAM,
    decontaminate,
    eval_ngram_set,
)


WORDS = (
    "alpha bravo charlie delta echo foxtrot golf hotel india juliet "
    "kilo lima mike november oscar papa quebec romeo sierra tango"
).split()


def _text(n, shift=0):
    return " ".join(WORDS[(i + shift) % len(WORDS)] for i in range(n))


@pytest.fixture(scope="module")
def frames(spark):
    eval_df = spark.createDataFrame(
        [(100, _text(20))], "doc_id long, text string"
    )
    docs = spark.createDataFrame(
        [
            # embeds a full 13-token window of the eval text -> leak
            (1, "prefix words here " + _text(15) + " suffix words"),
            # only 12 shared consecutive tokens -> clean
            (2, "x " + _text(12) + " y " + _text(12, shift=5) + " z"),
            # unrelated -> clean
            (3, " ".join(f"w{i}" for i in range(40))),
            # shorter than N tokens -> clean by construction
            (4, _text(8)),
            # same leaked window repeated twice -> still counted once/window
            (5, _text(13) + " mid " + _text(13)),
        ],
        "doc_id long, text string",
    )
    return docs, eval_df


def test_flags_only_true_leaks(spark, frames):
    docs, eval_df = frames
    out = {r.doc_id: r for r in decontaminate(docs, eval_df).collect()}
    assert out[1].contaminated
    assert out[1].n_hit_grams == 3  # 15-token window -> 3 distinct 13-grams
    assert not out[2].contaminated and out[2].n_hit_grams == 0
    assert not out[3].contaminated
    assert not out[4].contaminated
    assert out[5].contaminated
    assert out[5].n_hit_grams == 1  # duplicate leak counted once


def test_every_doc_gets_a_verdict(spark, frames):
    docs, eval_df = frames
    out = decontaminate(docs, eval_df)
    assert out.count() == docs.count()
    assert out.filter(F.col("contaminated").isNull()).count() == 0


def test_eval_gram_set_is_distinct(spark, frames):
    _, eval_df = frames
    doubled = eval_df.union(eval_df)  # same benchmark loaded twice
    grams = eval_ngram_set(doubled)
    assert grams.count() == grams.distinct().count() == 20 - N_DECONTAM + 1


def test_plan_broadcasts_eval_side(spark, frames):
    docs, eval_df = frames
    plan = (
        decontaminate(docs, eval_df)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    # the corpus-side gram join must be broadcast (the eval set is the
    # build side); the final verdict join may start as SMJ pre-AQE
    assert "BroadcastHashJoin [gram" in plan
    assert plan.count("SortMergeJoin") <= 1


# -- line/chunk boilerplate removal -----------------------------------------

def test_line_dedup_drops_boilerplate_keeps_order(spark):
    from readability_ex_spark.operators.decontam import line_dedup

    boiler = " ".join(f"b{i}" for i in range(30))  # exactly one chunk
    docs = spark.createDataFrame(
        [
            (1, boiler + " " + " ".join(f"u1x{i}" for i in range(30))),
            (2, boiler + " " + " ".join(f"u2x{i}" for i in range(30))),
            (3, boiler + " " + " ".join(f"u3x{i}" for i in range(30))),
            (4, " ".join(f"u4x{i}" for i in range(45))),  # 2 chunks, unique
            (5, ""),
        ],
        "doc_id long, text string",
    )
    out = {r.doc_id: r for r in line_dedup(docs).collect()}
    # boilerplate chunk is in 3 docs > max_df=2 -> dropped everywhere
    for d in (1, 2, 3):
        assert out[d].n_chunks == 2 and out[d].n_dropped == 1
        assert out[d].text_clean.startswith(f"u{d}x0")
        assert "b0" not in out[d].text_clean
    # unique doc untouched, order preserved across chunk boundary
    assert out[4].n_dropped == 0
    assert out[4].text_clean == " ".join(f"u4x{i}" for i in range(45))
    # empty doc: zero chunks, empty clean text
    assert out[5].n_chunks == 0 and out[5].text_clean == ""


def test_line_dedup_plan_has_no_cartesian(spark):
    from readability_ex_spark.operators.decontam import line_dedup

    docs = spark.createDataFrame([(1, "a b c")], "doc_id long, text string")
    plan = (
        line_dedup(docs)._jdf.queryExecution().executedPlan().toString()
    )
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_chunk_dedup_within_doc(spark):
    """Within-doc repeated chunks collapse to the FIRST occurrence
    (order preserved — pins Spark array_distinct's first-occurrence
    semantics against a naive reference), cross-doc repeats untouched."""
    from readability_ex_spark.operators.decontam import (
        dedup_chunks_within_doc,
    )

    a = " ".join(f"a{i}" for i in range(30))
    b = " ".join(f"b{i}" for i in range(30))
    z = " ".join(f"z{i}" for i in range(30))
    docs = spark.createDataFrame(
        [
            (1, " ".join([a, b, a, z, b])),  # dupes interleaved
            (2, a),  # same chunk as doc 1 -> NOT a within-doc dupe
            (3, ""),
            (4, " ".join([z, z, z])),
        ],
        "doc_id long, text string",
    )
    out = {r.doc_id: r for r in dedup_chunks_within_doc(docs).collect()}
    assert out[1].n_chunks == 5 and out[1].n_dupes == 2
    assert out[1].text_clean == " ".join([a, b, z])  # first-occurrence order
    assert out[2].n_dupes == 0 and out[2].text_clean == a
    assert out[3].n_chunks == 0 and out[3].text_clean == ""
    assert out[4].n_chunks == 3 and out[4].n_dupes == 2
    assert out[4].text_clean == z
    # document-local: the plan has no exchange at all
    plan = (
        dedup_chunks_within_doc(docs)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Exchange" not in plan


def test_line_dedup_verdict_is_broadcast_anti_join(spark):
    """The df verdict must be a broadcast LEFT ANTI join of the exploded
    corpus against the small violator set — never a corpus-scale shuffle
    join against the full chunk-frequency table (SCALE.md contract)."""
    from readability_ex_spark.operators.decontam import line_dedup

    docs = spark.createDataFrame(
        [(i, " ".join(f"w{i}x{j}" for j in range(35))) for i in range(4)],
        "doc_id long, text string",
    )
    plan = (
        line_dedup(docs)._jdf.queryExecution().executedPlan().toString()
    )
    # the only join keyed on `chunk` is the broadcast anti-join
    assert "LeftAnti, BuildRight" in plan
    assert "BroadcastHashJoin [chunk" in plan
    # no shuffle (sort-merge or shuffled-hash) join anywhere on chunk
    assert "SortMergeJoin [chunk" not in plan
    assert "ShuffledHashJoin [chunk" not in plan


def test_line_dedup_matches_naive_reference(spark):
    """Vectorized chunk pipeline vs a dumb dict re-derivation on random
    corpora (chunking, df counting, order-preserving reassembly)."""
    import random
    from collections import defaultdict

    from readability_ex_spark.operators.decontam import (
        LINE_CHUNK_TOKENS,
        LINE_MAX_DF,
        line_dedup,
    )

    rng = random.Random(7)
    vocab = [f"w{i}" for i in range(9)]
    boiler = " ".join(rng.choice(vocab) for _ in range(LINE_CHUNK_TOKENS))
    docs = []
    for doc_id in range(30):
        n = rng.choice([0, 7, 30, 31, 60, 95])
        body = " ".join(rng.choice(vocab) for _ in range(n))
        if doc_id % 4 == 0:  # plant shared boilerplate in 8 docs
            body = boiler + (" " + body if body else "")
        docs.append((doc_id, body))

    def naive():
        chunks = {}
        for doc_id, text in docs:
            toks = text.split() if text.strip() else []
            cs = [
                " ".join(toks[i : i + LINE_CHUNK_TOKENS])
                for i in range(0, len(toks), LINE_CHUNK_TOKENS)
            ]
            chunks[doc_id] = cs
        df = defaultdict(set)
        for doc_id, cs in chunks.items():
            for c in cs:
                df[c].add(doc_id)
        out = {}
        for doc_id, cs in chunks.items():
            kept = [c for c in cs if len(df[c]) <= LINE_MAX_DF]
            out[doc_id] = (len(cs), len(cs) - len(kept), " ".join(kept))
        return out

    want = naive()
    spark_df = spark.createDataFrame(docs, "doc_id long, text string")
    got = {
        r.doc_id: (r.n_chunks, r.n_dropped, r.text_clean)
        for r in line_dedup(spark_df).collect()
    }
    assert got == want


def test_decontaminate_spans_cuts_only_the_overlap(spark):
    """A training doc quoting an eval n-gram loses exactly that span;
    surrounding text and clean docs survive."""
    from readability_ex_spark.operators.decontam import decontaminate_spans

    leak = " ".join(f"q{i}" for i in range(13))
    eval_df = spark.createDataFrame(
        [(100, f"intro {leak} outro")], "doc_id long, text string"
    )
    docs = spark.createDataFrame(
        [
            (1, f"alpha beta {leak} gamma delta"),
            (2, "totally clean document text"),
        ],
        "doc_id long, text string",
    )
    out = {
        r.doc_id: r for r in decontaminate_spans(docs, eval_df).collect()
    }
    assert out[1].n_dup_tokens == 13
    assert out[1].text_clean == "alpha beta gamma delta"
    assert out[2].n_dup_tokens == 0
    assert out[2].text_clean == "totally clean document text"


def test_decontaminate_spans_merges_long_quotes(spark):
    """A 20-token quote (8 overlapping 13-gram hits) cuts as ONE
    maximal span, not 8 separate windows."""
    from readability_ex_spark.operators.decontam import decontaminate_spans

    quote = " ".join(f"s{i}" for i in range(20))
    eval_df = spark.createDataFrame(
        [(100, quote)], "doc_id long, text string"
    )
    docs = spark.createDataFrame(
        [(1, f"pre {quote} post")], "doc_id long, text string"
    )
    r = decontaminate_spans(docs, eval_df).collect()[0]
    assert r.n_dup_tokens == 20
    assert r.text_clean == "pre post"


def test_decontaminate_spans_gram_join_is_broadcast(spark):
    """The corpus-side window stream must meet the eval gram set via a
    broadcast join — never a shuffle keyed on gram."""
    from readability_ex_spark.operators.decontam import decontaminate_spans

    docs = spark.createDataFrame(
        [(i, "w " * 40) for i in range(8)], "doc_id long, text string"
    )
    eval_df = spark.createDataFrame(
        [(99, "w " * 20)], "doc_id long, text string"
    )
    plan = (
        decontaminate_spans(docs, eval_df)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin [gram" not in plan
    # the ONLY gram exchange allowed is the eval side's tiny distinct;
    # the corpus-side window stream must reach the join unshuffled
    assert plan.count("Exchange hashpartitioning(gram") == 1


def test_line_dedup_cross_batch_counts(spark):
    """A chunk under the df cap within the batch but over it once prior
    batches' persisted counts are added is dropped — and without the
    sidecar it survives (the exact incremental-update closure)."""
    from readability_ex_spark.operators.decontam import (
        chunk_document_frequency,
        line_dedup,
    )

    boiler = " ".join(f"b{i}" for i in range(30))
    tail = " ".join(f"t{i}" for i in range(30))
    batch = spark.createDataFrame(
        [(1, f"{boiler} {tail}")], "doc_id long, text string"
    )
    prior = spark.createDataFrame(
        [(100, boiler), (101, f"{boiler} other words here")],
        "doc_id long, text string",
    )
    alone = line_dedup(batch).collect()[0]
    assert alone.n_dropped == 0  # df=1 within the batch

    extra = chunk_document_frequency(prior)  # boiler chunk df=2
    combined = line_dedup(batch, extra_chunk_df=extra).collect()[0]
    assert combined.n_dropped == 1
    assert combined.text_clean == tail


def test_chunk_document_frequency_additive(spark):
    """Appended per-batch tables sum to the union's counts (disjoint
    doc sets) — the property the persisted sidecar relies on."""
    from readability_ex_spark.operators.decontam import (
        chunk_document_frequency,
    )

    c = " ".join(f"w{i}" for i in range(30))
    a = spark.createDataFrame([(1, c), (2, c)], "doc_id long, text string")
    b = spark.createDataFrame([(3, c)], "doc_id long, text string")
    from pyspark.sql import functions as F

    summed = (
        chunk_document_frequency(a)
        .unionByName(chunk_document_frequency(b))
        .groupBy("chunk_h")
        .agg(F.sum("df").alias("df"))
        .collect()
    )
    union = chunk_document_frequency(a.unionByName(b)).collect()
    assert {(r.chunk_h, r.df) for r in summed} == {
        (r.chunk_h, r.df) for r in union
    }


def test_contamination_report_per_item_audit(spark):
    """The eval-side audit counts leaked grams and corpus breadth per
    item; clean items report zeros."""
    from readability_ex_spark.operators.decontam import (
        N_DECONTAM,
        contamination_report,
    )

    leak = " ".join(f"w{i}" for i in range(N_DECONTAM))  # one exact gram
    eval_df = spark.createDataFrame(
        [
            (100, leak + " tail tokens beyond"),
            (101, " ".join(f"clean{i}" for i in range(N_DECONTAM + 3))),
            (102, "too short"),
        ],
        "doc_id long, text string",
    )
    corpus = spark.createDataFrame(
        [
            (1, "prefix " + leak),
            (2, leak + " another suffix"),
            (3, "unrelated body of words entirely"),
        ],
        "doc_id long, text string",
    )
    rows = {
        r.doc_id: r for r in contamination_report(corpus, eval_df).collect()
    }
    assert rows[100].leaked and rows[100].n_corpus_docs == 2
    assert rows[100].n_leaked_grams == 1
    assert rows[100].n_grams == 4  # 16 tokens -> 16 - 13 + 1 windows
    assert not rows[101].leaked and rows[101].n_corpus_docs == 0
    assert rows[102].n_grams == 0 and not rows[102].leaked
