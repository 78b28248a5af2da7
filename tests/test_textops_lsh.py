"""b×r MinHash-LSH unit tests: multi-band recall beats single-band, the
bucket cap drops degenerate (boilerplate) buckets, and pairs are
distinct across bands."""

from __future__ import annotations

from readability_ex_spark.operators.textops import lsh_band_candidates


def _doc_pairs_df(spark, n_pairs: int = 30, shared: int = 80, total: int = 100):
    """n_pairs pairs (2i, 2i+1) sharing `shared` of `total` tokens each —
    token-set Jaccard = shared / (2*total - shared) per pair."""
    rows = []
    for i in range(n_pairs):
        common = [f"c{i}_{k}" for k in range(shared)]
        a_only = [f"a{i}_{k}" for k in range(total - shared)]
        b_only = [f"b{i}_{k}" for k in range(total - shared)]
        rows.append((2 * i, " ".join(common + a_only)))
        rows.append((2 * i + 1, " ".join(common + b_only)))
    return spark.createDataFrame(rows, "doc_id long, text string")


def _pair_set(df):
    return {(r.id_a, r.id_b) for r in df.collect()}


def test_multiband_recall_beats_single_band(spark):
    docs = _doc_pairs_df(spark)
    truth = {(2 * i, 2 * i + 1) for i in range(30)}
    single = _pair_set(
        lsh_band_candidates(docs, n_bands=1, rows_per_band=2, max_bucket=10**6)
    )
    multi = _pair_set(
        lsh_band_candidates(docs, n_bands=3, rows_per_band=2, max_bucket=10**6)
    )
    # band 0 of the multi-band run IS the single band: superset by design
    assert single <= multi
    # OR-ing bands strictly improves recall on this corpus (deterministic
    # md5 permutations, so these counts are stable run to run)
    assert len(multi & truth) > len(single & truth)
    # no false candidate pairs across unrelated docs should survive the
    # verify threshold; candidates themselves stay within constructed pairs
    # plus possible cross-pair collisions — all real pairs that ARE found
    # must be the constructed ones at this Jaccard (~0.67) at least 80%:
    assert len(multi & truth) >= 24  # 1-(1-j^2)^3 ≈ 0.82 expected recall


def test_bucket_cap_drops_degenerate_bucket(spark):
    # 20 identical boilerplate docs (one bucket of 20 in every band) plus
    # one genuine near-dup pair
    rows = [(i, "empty parked domain page") for i in range(20)]
    common = " ".join(f"w{k}" for k in range(90))
    rows.append((100, common + " x1 x2 x3 x4 x5"))
    rows.append((101, common + " y1 y2 y3 y4 y5"))
    docs = spark.createDataFrame(rows, "doc_id long, text string")

    capped = _pair_set(lsh_band_candidates(docs, max_bucket=10))
    # the boilerplate bucket (size 20 > cap 10) emits nothing
    assert all(a >= 100 for a, _ in capped)
    # the real near-dup pair (j ≈ 0.9) is still found
    assert (100, 101) in capped

    uncapped = _pair_set(lsh_band_candidates(docs, max_bucket=10**6))
    assert (0, 1) in uncapped and len(uncapped) == 20 * 19 // 2 + 1


def test_pairs_distinct_and_ordered(spark):
    docs = _doc_pairs_df(spark, n_pairs=5)
    pairs = lsh_band_candidates(docs).collect()
    assert len(pairs) == len({(r.id_a, r.id_b) for r in pairs})
    assert all(r.id_a < r.id_b for r in pairs)


def test_empty_text_produces_no_bands(spark):
    docs = spark.createDataFrame(
        [(1, ""), (2, "   "), (3, "hello world")], "doc_id long, text string"
    )
    assert lsh_band_candidates(docs).count() == 0


def test_shingle_jaccard_pairs_semantics(spark):
    from readability_ex_spark.operators.textops import shingle_jaccard_pairs

    # doc 1/2: same host, one-word prefix difference -> most 5-shingles
    # shared; doc 3: same host, disjoint text; doc 4: other host, would
    # pair with 1 but is blocked away
    t = " ".join(f"w{i}" for i in range(20))
    docs = spark.createDataFrame(
        [
            (1, "h1", t),
            (2, "h1", "x0 " + t),
            (3, "h1", " ".join(f"z{i}" for i in range(20))),
            (4, "h2", t),
        ],
        "doc_id long, source string, text string",
    )
    pairs = {
        (r.id_a, r.id_b): r.jaccard
        for r in shingle_jaccard_pairs(docs, threshold=0.1).collect()
    }
    # doc1 has 16 shingles, doc2 has 17 (one extra at the front), 16 shared
    assert abs(pairs[(1, 2)] - 16 / 17) < 1e-6
    assert (1, 3) not in pairs  # disjoint shingle sets never pair
    assert (1, 4) not in pairs  # cross-host pairs never compared

    # the inverted-index plan is sound only for positive thresholds
    import pytest

    with pytest.raises(ValueError, match="threshold > 0"):
        shingle_jaccard_pairs(docs, threshold=0.0)

    # short docs (< w tokens) have empty shingle sets -> Jaccard 0
    short = spark.createDataFrame(
        [(1, "h", "a b c"), (2, "h", "a b c")], "doc_id long, source string, text string"
    )
    assert shingle_jaccard_pairs(short, threshold=0.1).count() == 0


def test_shingle_block_cap(spark):
    from readability_ex_spark.operators.textops import shingle_jaccard_pairs

    t = " ".join(f"w{i}" for i in range(10))
    rows = [(i, "mega", t) for i in range(12)] + [(100, "tiny", t), (101, "tiny", t)]
    docs = spark.createDataFrame(rows, "doc_id long, source string, text string")
    pairs = {
        (r.id_a, r.id_b)
        for r in shingle_jaccard_pairs(docs, max_block=10).collect()
    }
    # the 12-doc mega block exceeds the cap and emits nothing; the tiny
    # block still pairs
    assert pairs == {(100, 101)}


def test_winnow_overlap_detects_containment(spark):
    """A small doc embedded verbatim in a much larger doc: containment
    flags the pair (near 1.0 for the smaller side) even though
    whole-document Jaccard would be diluted far below any near-dup
    threshold — the partial-overlap failure mode near-dup can't catch."""
    from readability_ex_spark.operators.textops import winnow_overlap_pairs

    shared = (
        "the quick brown fox jumps over the lazy dog and runs far away "
        "tonight while nobody watches the garden gate"
    )
    filler = " ".join(f"filler{i}" for i in range(300))
    docs = spark.createDataFrame(
        [
            (1, shared),
            (2, filler + " " + shared),
            (3, "completely different words here entirely unrelated text"),
        ],
        "doc_id long, text string",
    )
    pairs = {
        (r.id_a, r.id_b): r.containment
        for r in winnow_overlap_pairs(docs, threshold=0.3).collect()
    }
    assert (1, 2) in pairs and pairs[(1, 2)] >= 0.8
    assert not any(3 in p for p in pairs)


def test_winnowing_guarantee(spark):
    """Winnowing (k=3 tokens, w=4): docs sharing a run of >= k+w-1
    tokens share at least one fingerprint; disjoint docs share none."""
    from readability_ex_spark.operators.textops import winnow_fingerprints

    shared = "the quick brown fox jumps over the lazy dog"  # 9 tokens
    docs = spark.createDataFrame(
        [
            (1, "AAAA " + shared + " BBBB"),
            (2, "CCCC " + shared + " DDDD"),
            (3, "zyxw vuts rqpo nmlk jihg fedc 0123 4567 89"),
        ],
        "doc_id long, text string",
    )
    fps = winnow_fingerprints(docs).collect()
    by_doc = {}
    for r in fps:
        by_doc.setdefault(r.doc_id, set()).add(r.fingerprint)
    assert by_doc[1] & by_doc[2]  # shared 9-token run >= 3+4-1
    assert not (by_doc[1] & by_doc[3])
    assert not (by_doc[2] & by_doc[3])

    # short docs (< k+w-1 tokens) produce no fingerprints
    short = spark.createDataFrame([(1, "tiny text")], "doc_id long, text string")
    assert winnow_fingerprints(short).count() == 0


def test_winnow_df_cut_scales_with_corpus(spark):
    """A 60-doc duplicate family exceeds the fixed WINNOW_MAX_DF floor,
    but the corpus-scaled default cut (max(floor, n_docs // df_scale))
    keeps its fingerprints, so the family's true overlap pairs survive.
    With the old fixed cut the same corpus detected nothing."""
    from readability_ex_spark.operators.textops import winnow_overlap_pairs

    shared = "one common paragraph that every family member fully contains"
    family = [(i, f"prefix {i:04d} {shared} suffix {i:04d}") for i in range(60)]
    # filler docs (disjoint text) so the corpus is 600 docs total
    filler = [
        (1000 + i, f"unique filler document {i:04d} " + " ".join(
            f"tok{i}x{j}" for j in range(8)))
        for i in range(540)
    ]
    docs = spark.createDataFrame(family + filler, "doc_id long, text string")

    # scaled default: 600 docs // 10 = 60 >= family size -> pairs found
    scaled = winnow_overlap_pairs(docs, df_scale=10)
    assert scaled.count() >= 60 * 59 // 2  # every family pair surfaces
    # the fixed floor alone (explicit max_df=50) cuts the whole family
    fixed = winnow_overlap_pairs(docs, max_df=50)
    assert fixed.count() == 0


def test_corpus_top_ngrams(spark):
    """Counts, tiebreak order, and the below-n edge match a naive
    recount."""
    from collections import Counter

    from readability_ex_spark.operators.textops import corpus_top_ngrams

    docs = spark.createDataFrame(
        [
            (1, "a b a b c"),
            (2, "a b x"),
            (3, "z"),  # shorter than n -> contributes nothing
            (4, None),
        ],
        "doc_id long, text string",
    )
    out = [(r.gram, r.c) for r in corpus_top_ngrams(docs, n=2, k=3).collect()]
    naive = Counter()
    for t in ("a b a b c", "a b x"):
        w = t.split()
        for i in range(len(w) - 1):
            naive[" ".join(w[i : i + 2])] += 1
    want = sorted(naive.items(), key=lambda kv: (-kv[1], kv[0]))[:3]
    assert out == want
    assert out[0] == ("a b", 3)


def test_corpus_checksums_null_text_contributes(spark):
    """A NULL-text row still flips the checksum (content_hash60
    coalesces, so bit_xor never skips the row), and NULL hashes like
    empty text — matching the DuckDB oracle's COALESCE."""
    import hashlib

    from readability_ex_spark.operators.textops import corpus_checksums

    base = spark.createDataFrame(
        [("u1", "alpha"), ("u2", None)], "url string, text string"
    )
    out = {
        r.bucket: (r.n_docs, r.content_xor)
        for r in corpus_checksums(base, n_buckets=1).collect()
    }
    expect = 0
    for url, text in (("u1", "alpha"), ("u2", "")):
        h = hashlib.md5(f"{url}|{text}".encode()).hexdigest()[:15]
        expect ^= int(h, 16)
    assert out == {0: (2, expect)}

    # dropping the NULL-text row changes the checksum (the integrity
    # property the old concat-null plan silently lost)
    only = {
        r.bucket: r.content_xor
        for r in corpus_checksums(
            base.filter("text IS NOT NULL"), n_buckets=1
        ).collect()
    }
    assert only[0] != out[0][1]
