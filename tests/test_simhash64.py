"""64-bit SimHash: near-identical docs land at small Hamming distance,
the 4-band join finds every Hamming<=3 pair (pigeonhole), and the
bucket cap drops degenerate boilerplate buckets."""

from __future__ import annotations

import pyspark.sql.functions as F

from readability_ex_spark.operators.textops import (
    N_SIMHASH64_BANDS,
    simhash64,
    simhash_near_dup,
)


def _hamming(r1, r2):
    return sum(
        bin(getattr(r1, f"band{k}") ^ getattr(r2, f"band{k}")).count("1")
        for k in range(N_SIMHASH64_BANDS)
    )


def test_simhash_distance_tracks_similarity(spark):
    base = " ".join(f"tok{i}" for i in range(200))
    docs = spark.createDataFrame(
        [
            (0, base),
            (1, base + " extra1 extra2"),  # near-identical
            (2, " ".join(f"other{i}" for i in range(200))),  # unrelated
        ],
        "doc_id long, text string",
    )
    rows = {r.doc_id: r for r in simhash64(docs).collect()}
    near = _hamming(rows[0], rows[1])
    far = _hamming(rows[0], rows[2])
    assert near < far
    assert near <= 6  # 2 extra tokens out of 202 flip very few vote sums
    assert far > 16  # unrelated vocab: expected ~32 of 64 bits differ


def test_band_join_finds_all_low_hamming_pairs(spark):
    # many doc variants of one base text — brute-force the truth set and
    # check the banded operator returns exactly the Hamming<=3 subset
    base_toks = [f"w{i}" for i in range(120)]
    rows = [(0, " ".join(base_toks))]
    for d in range(1, 12):
        toks = list(base_toks)
        toks[d] = f"sub{d}"  # substitute d-th token
        rows.append((d, " ".join(toks)))
    docs = spark.createDataFrame(rows, "doc_id long, text string")

    sims = {r.doc_id: r for r in simhash64(docs).collect()}
    truth = {
        (a, b)
        for a in sims
        for b in sims
        if a < b and _hamming(sims[a], sims[b]) <= 3
    }
    found = {
        (r.id_a, r.id_b)
        for r in simhash_near_dup(docs, max_bucket=10**6).collect()
    }
    assert found == truth
    assert truth  # the construction does produce at least one close pair


def test_simhash_bucket_cap(spark):
    rows = [(i, "identical boilerplate text here") for i in range(20)]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    assert simhash_near_dup(docs, max_bucket=10).count() == 0
    assert simhash_near_dup(docs, max_bucket=100).count() == 20 * 19 // 2


def test_empty_text_band_zero(spark):
    docs = spark.createDataFrame([(1, ""), (2, "a b c")], "doc_id long, text string")
    r = {x.doc_id: x for x in simhash64(docs).collect()}
    assert all(getattr(r[1], f"band{k}") == 0 for k in range(N_SIMHASH64_BANDS))
