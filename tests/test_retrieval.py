"""BM25 retrieval: hand-computed scores, corpus-constant semantics,
and the codegen/broadcast plan shape."""

from __future__ import annotations

import math

import pytest

from readability_ex_spark.operators.retrieval import BM25_B, BM25_K1, bm25_topk


def _mk(spark, texts):
    return spark.createDataFrame(
        list(enumerate(texts)), "doc_id long, text string"
    )


def _bm25(tf, df, n_docs, dl, avgdl, k1=BM25_K1, b=BM25_B):
    idf = math.log(1.0 + (n_docs - df + 0.5) / (df + 0.5))
    return idf * (tf * (k1 + 1.0)) / (tf + k1 * (1 - b + b * dl / avgdl))


def test_bm25_matches_hand_computation(spark):
    docs = _mk(
        spark,
        [
            "spark spark window",  # tf(spark)=2, dl=3
            "spark join join join",  # tf(spark)=1, dl=4
            "window window window",  # no match
            "",  # empty: dl=0, still counts in N and avgdl
        ],
    )
    rows = {r.doc_id: r for r in bm25_topk(docs, ["spark"], k=10).collect()}
    n_docs, avgdl, df = 4, (3 + 4 + 3 + 0) / 4, 2
    assert set(rows) == {0, 1}
    assert rows[0].n_terms == 1
    assert rows[0].score == pytest.approx(
        round(_bm25(2, df, n_docs, 3, avgdl), 6), abs=1e-9
    )
    assert rows[1].score == pytest.approx(
        round(_bm25(1, df, n_docs, 4, avgdl), 6), abs=1e-9
    )
    # higher tf in a shorter doc must outrank
    assert rows[0].score > rows[1].score


def test_bm25_multi_term_sums_and_ranks(spark):
    docs = _mk(
        spark,
        [
            "a b c",
            "a a a b",
            "c c c c",
        ],
    )
    out = bm25_topk(docs, ["a", "b"], k=2).collect()
    # doc 1 matches both terms with higher tf -> rank 1
    assert [r.doc_id for r in out] == [1, 0]
    assert out[0].n_terms == 2 and out[1].n_terms == 2


def test_bm25_rejects_empty_query(spark):
    with pytest.raises(ValueError):
        bm25_topk(_mk(spark, ["x"]), [])


def test_bm25_plan_is_codegen_with_broadcasts(spark):
    """No Python evaluation anywhere; the df and stats sides broadcast."""
    docs = _mk(spark, ["spark window merge"] * 8)
    plan = (
        bm25_topk(docs, ["spark", "merge"], k=3)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert plan.count("BroadcastHashJoin") >= 1
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastHashJoin" in plan


# ---------------------------------------------------------------------------
# chunk_documents
# ---------------------------------------------------------------------------


def _chunk_naive(tokens, size, stride):
    n = len(tokens)
    if n == 0:
        return []
    n_chunks = 1 if n <= size else 1 + -(-(n - size) // stride)
    out = []
    for k in range(n_chunks):
        s, e = k * stride, min(k * stride + size, n)
        out.append((k, s, e, " ".join(tokens[s:e])))
    return out


def test_chunk_documents_matches_naive(spark):
    from readability_ex_spark.operators.retrieval import chunk_documents

    texts = [
        "",  # no chunks
        "one",
        " ".join(f"t{i}" for i in range(8)),  # == size -> 1 chunk
        " ".join(f"t{i}" for i in range(9)),  # size+1 -> 2 chunks
        " ".join(f"t{i}" for i in range(25)),
        " ".join(f"t{i}" for i in range(30)),  # exact multiple edge
    ]
    docs = spark.createDataFrame(
        list(enumerate(texts)), "doc_id long, text string"
    )
    got = {}
    for r in chunk_documents(docs, size=8, stride=6).collect():
        got.setdefault(r.doc_id, []).append(
            (r.chunk_id, r.tok_start, r.tok_end, r.chunk_text)
        )
    for i, text in enumerate(texts):
        toks = text.split() if text.strip() else []
        assert sorted(got.get(i, [])) == _chunk_naive(toks, 8, 6), i


def test_chunk_documents_covers_every_token(spark):
    """Every token index lands in >= 1 chunk; consecutive chunks
    overlap by exactly size - stride (except possibly at the tail);
    the final chunk reaches the end."""
    from readability_ex_spark.operators.retrieval import chunk_documents

    docs = spark.createDataFrame(
        [(1, " ".join(f"w{i}" for i in range(101)))],
        "doc_id long, text string",
    )
    rows = sorted(
        chunk_documents(docs, size=32, stride=24).collect(),
        key=lambda r: r.chunk_id,
    )
    covered = set()
    for r in rows:
        covered |= set(range(r.tok_start, r.tok_end))
    assert covered == set(range(101))
    assert rows[-1].tok_end == 101
    for a, b in zip(rows, rows[1:]):
        assert b.tok_start == a.tok_start + 24


def test_chunk_documents_rejects_bad_params(spark):
    from readability_ex_spark.operators.retrieval import chunk_documents

    docs = spark.createDataFrame([(1, "a b")], "doc_id long, text string")
    with pytest.raises(ValueError):
        chunk_documents(docs, size=4, stride=5)
    with pytest.raises(ValueError):
        chunk_documents(docs, size=0, stride=0)


def test_chunk_documents_plan_exchange_free(spark):
    from readability_ex_spark.operators.retrieval import chunk_documents

    docs = spark.createDataFrame([(1, "a b c")], "doc_id long, text string")
    plan = (
        chunk_documents(docs)._jdf.queryExecution().executedPlan().toString()
    )
    assert "Exchange" not in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


# ---------------------------------------------------------------------------
# materialized BM25 index
# ---------------------------------------------------------------------------


def test_bm25_materialized_matches_inline(spark, tmp_path):
    """The partition-pruned probe returns exactly the inline result."""
    from readability_ex_spark.operators.retrieval import (
        bm25_materialized_topk,
        bm25_topk,
        materialize_bm25,
    )

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    idx = str(tmp_path / "bm25")
    materialize_bm25(docs, idx)
    inline = [
        tuple(r) for r in bm25_topk(docs, ["vector", "stream"], k=7).collect()
    ]
    probed = [
        tuple(r)
        for r in bm25_materialized_topk(
            spark, idx, ["vector", "stream"], k=7
        ).collect()
    ]
    assert inline == probed


def test_bm25_materialized_reads_only_query_buckets(spark, tmp_path):
    """The probe scan carries a PartitionFilter on term_bucket and the
    pruned read returns only the query terms' postings."""
    from readability_ex_spark.operators.retrieval import (
        bm25_materialized_topk,
        materialize_bm25,
        term_bucket,
    )
    from pyspark.sql import functions as F

    docs = spark.createDataFrame(
        [(i, "alpha beta gamma delta " * (i + 1)) for i in range(6)],
        "doc_id long, text string",
    )
    idx = str(tmp_path / "bm25")
    materialize_bm25(docs, idx)
    # construction raises on a non-pruned scan — reaching here IS the
    # pruning assertion; also verify bucket math agrees with the data
    out = bm25_materialized_topk(spark, idx, ["beta"], k=3)
    assert out.count() == 3
    stored = (
        spark.read.parquet(f"{idx}/postings")
        .filter(F.col("term") == "beta")
        .select("term_bucket")
        .distinct()
        .collect()
    )
    assert [r.term_bucket for r in stored] == [term_bucket("beta")]
