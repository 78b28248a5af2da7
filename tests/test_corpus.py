"""Composed training-corpus flow: extraction -> dedup -> quality."""

from __future__ import annotations

import pyspark.sql.functions as F

from readability_ex_spark.operators.corpus import (
    dedup_keep_manifest,
    near_dup_pairs,
    prepare_training_corpus,
)
from readability_ex_spark.sources.pages import synthesize_pages


def test_prepare_training_corpus(spark):
    pages = synthesize_pages(spark, "/root/testdata/sf0.001")
    # inject an exact duplicate page under a different url
    dup = pages.filter(F.col("url") == "http://synth.test/doc/1").withColumn(
        "url", F.lit("http://synth.test/doc/1-copy")
    )
    corpus = prepare_training_corpus(
        pages.unionByName(dup), near_dup_threshold=None
    ).cache()

    urls = {r.url for r in corpus.select("url").collect()}
    # exactly one of the duplicate pair survives (min url = canonical)
    assert ("http://synth.test/doc/1" in urls) != (
        "http://synth.test/doc/1-copy" in urls
    )
    row = corpus.head()
    assert 0.0 <= row.quality_score <= 1.0 and row.n_tokens > 0
    dupe_group = corpus.filter(F.col("n_copies") > 1)
    assert dupe_group.count() >= 1

    # default mode additionally drops near-dup cluster members: the
    # result is a subset of the exact-only corpus, still one per
    # exact group
    nd_corpus = prepare_training_corpus(pages.unionByName(dup)).cache()
    nd_urls = {r.url for r in nd_corpus.select("url").collect()}
    assert nd_urls <= urls
    assert not (
        "http://synth.test/doc/1" in nd_urls
        and "http://synth.test/doc/1-copy" in nd_urls
    )


def test_dedup_keep_manifest_chain_and_dropped_bucket(spark):
    base = " ".join(f"w{i}" for i in range(20))
    rows = [
        # near-dup (not exact) chain a-b-c: J(a,b)=20/24, J(b,c)=24/28
        # both >= 0.8; J(a,c)=20/28 < 0.8 — only clustering keeps one
        ("http://s/a", base),
        ("http://s/b", base + " e1 e2 e3 e4"),
        ("http://s/c", base + " e1 e2 e3 e4 f1 f2 f3 f4"),
    ] + [
        # planted boilerplate family LARGER than the LSH bucket cap:
        # without the exact-collapse-first ordering these would all be
        # dropped from near-dup coverage
        (f"http://boiler/{i:02d}", "parked domain lorem ipsum dolor " * 5)
        for i in range(30)
    ]
    extracted = spark.createDataFrame(rows, "url string, text string")
    m = dedup_keep_manifest(extracted, max_bucket=10).cache()

    boiler = m.filter(F.col("url").startswith("http://boiler/"))
    assert boiler.count() == 30
    # all 30 resolve to ONE canonical despite exceeding the bucket cap
    assert boiler.filter(F.col("keep")).count() == 1
    assert boiler.select("canonical_url").distinct().count() == 1

    chain = {
        r.url: (r.canonical_url, r.keep)
        for r in m.filter(F.col("url").startswith("http://s/")).collect()
    }
    assert [u for u, (_, k) in sorted(chain.items()) if k] == ["http://s/a"]
    assert all(c == "http://s/a" for c, _ in chain.values())


def test_prepare_training_corpus_quality_keeper(spark):
    """quality_keeper=True ships the cluster's argmax-quality member;
    the default composition ships the min url."""
    import datetime

    from readability_ex_spark.operators.corpus import (
        prepare_training_corpus,
    )

    ts = datetime.datetime(2024, 6, 1)

    def page(url, body):
        html = (
            f"<html><body><article><p>{body}</p></article></body></html>"
        ).encode()
        return (url, ts, html, "", "en")

    # b = a + 8 extra tokens: Jaccard 60/68 = 0.88 >= 0.8 (near-dup
    # cluster), and b's longer text scores higher on the length signal
    base = " ".join(f"alpha{i} beta{i}" for i in range(30))
    extra = " ".join(f"gamma{i}" for i in range(8))
    pages = spark.createDataFrame(
        [
            page("http://q.test/a", base),
            page("http://q.test/b", base + " " + extra),
        ],
        "url string, warc_ts timestamp, html binary, "
        "text string, lang string",
    )
    default = prepare_training_corpus(pages)
    assert [r.url for r in default.select("url").collect()] == [
        "http://q.test/a"
    ]
    kept = prepare_training_corpus(pages, quality_keeper=True)
    assert [r.url for r in kept.select("url").collect()] == [
        "http://q.test/b"
    ]


def test_dedup_quality_keeper(spark):
    """Survivor re-picked by argmax quality (ties -> min id); cluster
    keys unchanged; the argmax is a hash agg, never a window."""
    from readability_ex_spark.operators.corpus import dedup_quality_keeper

    base = " ".join(f"w{i}" for i in range(20))
    rows = [
        # near-dup cluster a-b-c (same construction as the chain test):
        # the HIGHEST-quality member is c, not the min url a
        ("http://s/a", base),
        ("http://s/b", base + " e1 e2 e3 e4"),
        ("http://s/c", base + " e1 e2 e3 e4 f1 f2 f3 f4"),
        # singleton: trivially keeps itself
        ("http://t/solo", "unrelated text entirely different words here"),
        # exact-dup pair with TIED scores: falls back to min url
        ("http://u/x", "same text"),
        ("http://u/y", "same text"),
    ]
    extracted = spark.createDataFrame(rows, "url string, text string")
    scores = spark.createDataFrame(
        [
            ("http://s/a", 0.2),
            ("http://s/b", 0.5),
            ("http://s/c", 0.9),
            ("http://t/solo", 0.1),
            ("http://u/x", 0.4),
            ("http://u/y", 0.4),
        ],
        "url string, quality_score double",
    )
    manifest = dedup_keep_manifest(extracted, max_bucket=10)
    out = dedup_quality_keeper(manifest, scores).cache()

    got = {r.url: (r.canonical_url, r.kept_id, r.keep) for r in out.collect()}
    assert len(got) == 6  # every input id still covered
    # cluster key stays min-url; survivor moves to the argmax member
    assert got["http://s/a"] == ("http://s/a", "http://s/c", False)
    assert got["http://s/b"] == ("http://s/a", "http://s/c", False)
    assert got["http://s/c"] == ("http://s/a", "http://s/c", True)
    assert got["http://t/solo"] == ("http://t/solo", "http://t/solo", True)
    # tied scores degrade to the manifest's own min-id rule
    assert got["http://u/x"] == ("http://u/x", "http://u/x", True)
    assert got["http://u/y"] == ("http://u/x", "http://u/x", False)
    # exactly one survivor per cluster
    assert out.filter(F.col("keep")).count() == 3

    # skew-safety: the keeper argmax compiles to hash aggregation —
    # no Window operator anywhere in the physical plan
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Window" not in plan, plan


def test_dedup_quality_keeper_matches_naive(spark):
    """Seeded multi-family batch: the struct-min argmax agrees with a
    naive per-cluster (-score, url) min for every member."""
    import random

    from readability_ex_spark.operators.corpus import dedup_quality_keeper

    rnd = random.Random(7)
    rows, scores = [], []
    for fam in range(8):
        base = " ".join(f"f{fam}tok{i}" for i in range(25))
        for m in range(rnd.randint(1, 5)):
            url = f"http://f{fam}.test/{m}"
            rows.append((url, base))  # exact-dup family
            scores.append((url, round(rnd.random(), 3)))
    extracted = spark.createDataFrame(rows, "url string, text string")
    sdf = spark.createDataFrame(scores, "url string, quality_score double")
    out = dedup_quality_keeper(
        dedup_keep_manifest(extracted, max_bucket=10), sdf
    ).collect()
    assert len(out) == len(rows)
    sc = dict(scores)
    clusters: dict[str, list] = {}
    for r in out:
        clusters.setdefault(r.canonical_url, []).append(r)
    for members in clusters.values():
        expect = min(members, key=lambda r: (-sc[r.url], r.url)).url
        for r in members:
            assert r.kept_id == expect
            assert r.keep == (r.url == expect)


def test_near_dup_pairs_on_extracted(spark):
    pages = synthesize_pages(spark, "/root/testdata/sf0.001").limit(80)
    from readability_ex_spark.pipeline import run_extraction

    extracted = run_extraction(pages).filter(F.col("status") == "ok")
    pairs = near_dup_pairs(extracted)
    # deterministic candidate set; each pair ordered url_a < url_b
    rows = pairs.collect()
    assert all(r.url_a < r.url_b for r in rows)


def test_prepare_corpus_normalize_unicode_stage(spark):
    """normalize_unicode=True ships NFC-canonical, control-free,
    whitespace-collapsed text; the stage composes before quality
    signals so they describe the shipping text."""
    pages = synthesize_pages(spark, "/root/testdata/sf0.001").limit(8)
    corpus = prepare_training_corpus(
        pages, near_dup_threshold=None, normalize_unicode=True
    )
    rows = corpus.select("url", "text", "n_tokens").collect()
    assert rows
    import re as _re

    for r in rows:
        assert not _re.search(r"[\x00-\x08\x0b\x0c\x0e-\x1f\x7f-\x9f]", r.text)
        assert "  " not in r.text  # whitespace runs collapsed
        assert r.text == r.text.strip()


def test_quality_rules_each_rule_fires(spark):
    """One crafted document per Gopher/C4 rule; each fails EXACTLY its
    target rule (plus rules its construction necessarily violates)."""
    from readability_ex_spark.operators.corpus import with_quality_rules

    good = (
        "The quick brown fox jumps over the lazy dog and runs off to be "
        "with the pack of hounds that have gathered near the old barn. "
    ) * 3  # ~60 words, plenty of stopwords, sane shape
    docs = [
        ("good", good),
        ("short", "The fox and the dog have to be here with us now."),
        ("long_words", " ".join(["pneumonoultramicroscopic"] * 30)
         + " the of and that have to be with " * 4),
        ("symbols", good + " " + "# " * 30),
        ("bullets", "\n".join(f"- the item {i} of that list to have" for i in range(19))
         + "\nwith the of that to be have"),
        ("ellipses", "\n".join(
            f"the line {i} of that story to be continued with more..."
            for i in range(10))),
        ("nonalpha", good + " " + " ".join(["12345"] * 160)),
        ("few_stop", " ".join(f"word{i}" for i in range(80))),
        ("dup_lines", "\n".join(["the same line of that text to be here with us"] * 10)),
        ("digits", good + " " + " ".join(["9" * 6] * 60)),
        ("empty", ""),
        ("null", None),
    ]
    df = spark.createDataFrame(docs, "doc_id string, text string")
    out = {r.doc_id: r for r in with_quality_rules(df).collect()}

    assert out["good"].passes_quality
    assert not out["short"].r_word_count
    assert not out["long_words"].r_mean_word_len
    assert not out["symbols"].r_symbol_ratio
    assert not out["bullets"].r_bullet_frac
    assert not out["ellipses"].r_ellipsis_frac
    assert not out["nonalpha"].r_alpha_frac
    assert not out["few_stop"].r_stopwords
    assert not out["dup_lines"].r_dup_lines
    assert not out["digits"].r_digit_ratio
    for key in ("empty", "null"):
        assert not out[key].r_word_count
        assert not out[key].passes_quality
        assert out[key].mean_word_len == 0.0
    # every non-good doc fails overall
    for key, _ in docs:
        if key != "good":
            assert not out[key].passes_quality, key


def test_quality_rules_lang_routed_stopwords(spark):
    """Stop-word rule keys off the doc's lang: a French doc passes via
    the French stop set (it always failed the English-only rule), a
    language with no stop set passes vacuously, NULL lang falls back to
    English, and a frame WITHOUT a lang column keeps English-only."""
    from readability_ex_spark.operators.corpus import with_quality_rules

    fr = (
        "le renard brun saute par-dessus le chien paresseux et court "
        "vers la vieille grange pour retrouver les chiens qui se sont "
        "rassembles dans la cour pres de la riviere "
    ) * 3
    en = (
        "The quick brown fox jumps over the lazy dog and runs off to be "
        "with the pack of hounds that have gathered near the old barn. "
    ) * 3
    salad = " ".join(f"hanzi{i}" for i in range(80))
    # unsegmented Chinese with 的/是/了/在 etc. scattered through —
    # padded with filler words so only the CJK substring rule decides
    zh = (
        "今天 的 天气 很 好 我们 在 公园 里 散步 了 很 久 这 是 一个 "
        "非常 愉快 的 下午 大家 都 不 想 回家 "
    ) * 4
    docs = [
        ("fr_doc", fr, "fr"),
        ("fr_doc_regional", fr, "fr-CA"),
        ("en_doc", en, "en"),
        ("zh_doc", zh, "zh"),
        # Latin word salad tagged zh: fails zh's substring stop rule
        ("zh_salad", salad, "zh"),
        ("ja_doc", salad, "ja"),  # vacuous: no stop set for ja
        ("null_lang_en", en, None),
        ("null_lang_salad", salad, None),
        # English text tagged French: fails (wrong language's stop set)
        ("mislabeled", " ".join(f"word{i}" for i in range(80)), "fr"),
    ]
    df = spark.createDataFrame(docs, "doc_id string, text string, lang string")
    out = {r.doc_id: r for r in with_quality_rules(df).collect()}
    assert out["fr_doc"].r_stopwords and out["fr_doc"].n_stopwords_g >= 2
    assert out["fr_doc_regional"].r_stopwords  # prefix match
    assert out["en_doc"].r_stopwords
    assert out["zh_doc"].r_stopwords and out["zh_doc"].n_stopwords_g >= 2
    assert not out["zh_salad"].r_stopwords
    assert out["ja_doc"].r_stopwords  # vacuous: no stop set for ja
    assert out["null_lang_en"].r_stopwords  # NULL -> English fallback
    assert not out["null_lang_salad"].r_stopwords
    assert not out["mislabeled"].r_stopwords

    # no lang column -> English-only behavior is unchanged
    no_lang = spark.createDataFrame(
        [("fr_doc", fr), ("en_doc", en)], "doc_id string, text string"
    )
    out2 = {r.doc_id: r for r in with_quality_rules(no_lang).collect()}
    assert not out2["fr_doc"].r_stopwords
    assert out2["en_doc"].r_stopwords


def test_prepare_corpus_quality_rules_stage(spark):
    from readability_ex_spark.operators.corpus import prepare_training_corpus
    from readability_ex_spark.sources.pages import synthesize_pages

    pages = synthesize_pages(spark, "/root/testdata/sf0.001").limit(60)
    base = prepare_training_corpus(pages, near_dup_threshold=None)
    ruled = prepare_training_corpus(
        pages, near_dup_threshold=None, quality_rules=True
    )
    nb, nr = base.count(), ruled.count()
    assert 0 < nr < nb  # the rules bind on the synthetic corpus
    assert set(ruled.columns) == set(base.columns)


def test_prepare_corpus_decontaminate_scrub_repetition(spark):
    """The three round-4 stages compose: eval-overlap docs drop, text is
    scrubbed before quality stats, repetition spam drops."""
    pages = synthesize_pages(spark, "/root/testdata/sf0.001").limit(20)
    extracted_text = {
        r.url: r.text
        for r in prepare_training_corpus(
            pages, near_dup_threshold=None
        ).select("url", "text").collect()
    }
    assert extracted_text
    leaked_url, leaked_text = sorted(extracted_text.items())[0]
    eval_df = spark.createDataFrame(
        [(leaked_text,)], "text string"
    )

    out = prepare_training_corpus(
        pages,
        near_dup_threshold=None,
        eval_df=eval_df,
        scrub_pii_text=True,
        repetition_rules=True,
    )
    urls = {r.url for r in out.select("url").collect()}
    # the doc whose full text is in the eval set is gone (13+ tokens)
    if len(leaked_text.split()) >= 13:
        assert leaked_url not in urls
    # scrub stage ran: the PII count columns ride along as lineage
    assert {"n_email", "n_ipv4", "n_phone"} <= set(out.columns)
    # repetition stage: all survivors pass every repetition rule
    from readability_ex_spark.operators.corpus import repetition_stats

    rep = repetition_stats(
        out.select("url", "text"), id_col="url"
    )
    bad = rep.filter(
        ~(F.col("r_top2gram") & F.col("r_top3gram") & F.col("r_dup6gram"))
    )
    assert bad.count() == 0


def test_prepare_corpus_lang_routing(spark):
    pages = synthesize_pages(spark, "/root/testdata/sf0.001").limit(30)
    all_langs = prepare_training_corpus(pages, near_dup_threshold=None)
    langs = {r.lang for r in all_langs.select("lang").distinct().collect()}
    if len(langs) < 2:
        import pytest

        pytest.skip("synthetic slice has one lang; routing untestable here")
    pick = sorted(l for l in langs if l)[0]
    routed = prepare_training_corpus(
        pages, near_dup_threshold=None, lang=pick
    )
    got = {r.lang for r in routed.select("lang").distinct().collect()}
    assert all(l and l.lower().startswith(pick.lower()) for l in got)


def test_incremental_corpus_update(spark):
    from readability_ex_spark.operators.corpus import (
        incremental_corpus_update,
    )

    pages_a = synthesize_pages(spark, "/root/testdata/sf0.001").limit(12)
    corpus_a = prepare_training_corpus(pages_a, near_dup_threshold=None)

    # batch B: one re-crawl of an existing url, one exact dup under a
    # new url, one genuinely new page
    first_url = corpus_a.select("url").orderBy("url").head().url
    recrawl = pages_a.filter(F.col("url") == first_url)
    dup_new_url = recrawl.withColumn("url", F.lit("http://synth.test/doc/renamed"))
    fresh = synthesize_pages(spark, "/root/testdata/sf0.001").filter(
        F.col("url") == "http://synth.test/doc/400"
    )
    batch_b = recrawl.unionByName(dup_new_url).unionByName(fresh)

    delta = incremental_corpus_update(
        corpus_a, batch_b, near_dup_threshold=None
    )
    urls = {r.url for r in delta.select("url").collect()}
    assert "http://synth.test/doc/400" in urls          # new doc appended
    assert first_url not in urls                        # re-crawl dropped
    assert "http://synth.test/doc/renamed" not in urls  # exact dup dropped
    assert len(urls) == 1


def test_prepare_corpus_boilerplate_stage(spark):
    """drop_boilerplate_chunks strips cross-doc chunks and the quality
    signals score the cleaned text."""
    pages = synthesize_pages(spark, "/root/testdata/sf0.001").limit(25)
    out = prepare_training_corpus(
        pages, near_dup_threshold=None, drop_boilerplate_chunks=True
    )
    rows = out.select("url", "text", "n_boilerplate_chunks", "n_tokens").collect()
    assert rows
    for r in rows:
        assert r.n_boilerplate_chunks >= 0
        # n_tokens was computed AFTER cleaning
        expected = len(r.text.split()) if r.text.strip() else 0
        assert r.n_tokens == expected


def test_incremental_update_cross_near_dup(spark):
    """near_dup_vs_existing_threshold drops a new-url paraphrase of an
    existing doc that exact-fingerprint matching misses."""
    from readability_ex_spark.operators.corpus import (
        incremental_corpus_update,
    )

    pages_a = synthesize_pages(spark, "/root/testdata/sf0.001").limit(10)
    corpus_a = prepare_training_corpus(pages_a, near_dup_threshold=None)

    # paraphrase: take an existing doc's html, re-url it, and append a
    # couple of words so the exact fingerprint changes
    donor_url = corpus_a.select("url").orderBy("url").head().url
    donor = pages_a.filter(F.col("url") == donor_url)
    paraphrase = donor.withColumn(
        "url", F.lit("http://synth.test/doc/paraphrased")
    ).withColumn(
        "html",
        F.concat(
            F.col("html"),
            F.lit(b"<!-- trailing comment changes nothing visible -->"),
        ),
    )
    fresh = synthesize_pages(spark, "/root/testdata/sf0.001").filter(
        F.col("url") == "http://synth.test/doc/401"
    )
    batch = paraphrase.unionByName(fresh)

    no_check = incremental_corpus_update(
        corpus_a, batch, near_dup_threshold=None
    )
    with_check = incremental_corpus_update(
        corpus_a,
        batch,
        near_dup_threshold=None,
        near_dup_vs_existing_threshold=0.8,
    )
    urls_no = {r.url for r in no_check.select("url").collect()}
    urls_yes = {r.url for r in with_check.select("url").collect()}
    # the comment-only change keeps the extracted text identical ->
    # exact fingerprint catches it either way; force a REAL paraphrase
    # only if it slipped through the exact path
    assert "http://synth.test/doc/401" in urls_yes
    assert urls_yes <= urls_no


def test_cross_near_dup_matches_direct(spark):
    """cross_near_dup_matches finds a batch doc embedding an existing
    doc's text with small edits."""
    from readability_ex_spark.operators.textops import (
        cross_near_dup_matches,
    )

    base = " ".join(f"tok{i}" for i in range(120))
    edited = base.replace("tok5", "tokX").replace("tok80", "tokY")
    existing = spark.createDataFrame(
        [(1, base)], "doc_id long, text string"
    )
    batch = spark.createDataFrame(
        [(100, edited), (101, " ".join(f"z{i}" for i in range(120)))],
        "doc_id long, text string",
    )
    drops = {r.doc_id for r in cross_near_dup_matches(
        batch, existing, threshold=0.5
    ).collect()}
    assert drops == {100}


def test_cross_near_dup_uses_persisted_band_index(spark, tmp_path):
    """With a persisted band_index the existing corpus is never
    re-banded — same verdicts, and the plan computes band hashes for
    the batch side only (existing text is touched only for verify
    candidates via the semi-join)."""
    from readability_ex_spark.operators.textops import (
        band_index,
        cross_near_dup_matches,
    )

    base = " ".join(f"tok{i}" for i in range(120))
    edited = base.replace("tok5", "tokX").replace("tok80", "tokY")
    rows = [(1, base)] + [
        (i, " ".join(f"e{i}w{j}" for j in range(60))) for i in range(2, 12)
    ]
    spark.createDataFrame(rows, "doc_id long, text string").write.parquet(
        str(tmp_path / "existing")
    )
    existing = spark.read.parquet(str(tmp_path / "existing"))
    band_index(existing).write.parquet(str(tmp_path / "bands"))
    bands = spark.read.parquet(str(tmp_path / "bands"))

    batch = spark.createDataFrame(
        [(100, edited), (101, " ".join(f"z{i}" for i in range(120)))],
        "doc_id long, text string",
    )
    out = cross_near_dup_matches(
        batch, existing, threshold=0.5, existing_bands=bands
    )
    assert {r.doc_id for r in out.collect()} == {100}
    # same verdicts as the re-banding path
    assert {r.doc_id for r in cross_near_dup_matches(
        batch, existing, threshold=0.5
    ).collect()} == {100}

    # the supplied index is AUTHORITATIVE: with an empty index the
    # paraphrase is not found, proving the existing corpus is never
    # re-banded when an index is given (re-banding would rediscover it)
    empty = bands.filter(F.lit(False))
    assert cross_near_dup_matches(
        batch, existing, threshold=0.5, existing_bands=empty
    ).count() == 0


def test_cross_near_dup_verify_scan_partition_pruned(spark, tmp_path):
    """With the corpus stored partitioned by a derivable bucket, the
    verify read touches only the candidates' buckets — the isin over
    the partition column must reach the scan as a PartitionFilter."""
    from readability_ex_spark.operators.textops import (
        band_index,
        cross_near_dup_matches,
    )

    base = " ".join(f"tok{i}" for i in range(120))
    edited = base.replace("tok5", "tokX")
    rows = [("u1", base)] + [
        (f"u{i}", " ".join(f"e{i}w{j}" for j in range(60)))
        for i in range(2, 40)
    ]
    bucket = lambda c: F.pmod(F.xxhash64(c), F.lit(8)).cast("int")
    spark.createDataFrame(rows, "url string, text string").withColumn(
        "url_bucket", bucket(F.col("url"))
    ).write.partitionBy("url_bucket").parquet(str(tmp_path / "existing"))
    existing = spark.read.parquet(str(tmp_path / "existing"))
    band_index(existing, id_col="url").write.parquet(str(tmp_path / "bands"))
    bands = spark.read.parquet(str(tmp_path / "bands"))
    batch = spark.createDataFrame(
        [("b1", edited), ("b2", " ".join(f"z{i}" for i in range(120)))],
        "url string, text string",
    )
    out = cross_near_dup_matches(
        batch,
        existing,
        id_col="url",
        threshold=0.5,
        existing_bands=bands,
        existing_partition_col="url_bucket",
        partition_of=bucket,
    )
    assert {r.url for r in out.collect()} == {"b1"}
    import re

    plan = out._jdf.queryExecution().executedPlan().toString()
    assert re.search(
        r"PartitionFilters: \[[^\]]*url_bucket#\d+ = \d+", plan
    ), plan[:3000]


def test_prepare_training_corpus_crawl_filter_stages(spark):
    """The library-level composition carries the crawl-filter stages:
    canonical urls, blocklist, substring dedup, LM floor, domain cap,
    mixture, shard ids — matching the script's flag semantics."""
    from pyspark.sql import functions as F

    from readability_ex_spark.operators.corpus import (
        prepare_training_corpus,
    )
    from readability_ex_spark.sources.pages import synthesize_pages

    pages = synthesize_pages(spark, "/root/testdata/sf0.001").limit(80)
    # re-spell some urls with tracking params to give canonicalization
    # real work
    pages = pages.withColumn(
        "url",
        F.when(
            F.xxhash64("url") % 2 == 0,
            F.concat(F.col("url"), F.lit("?utm_source=x")),
        ).otherwise(F.col("url")),
    )
    corpus = prepare_training_corpus(
        pages,
        canonical_urls=True,
        blocklist=("dup",),
        drop_substring_dups=True,
        min_lm_logprob=-30.0,
        max_per_domain=1_000,
        mixture_weights={"en": 0.5, "fr": 0.3, "de": 0.2},
        shard_tokens=400,
        n_partitions=4,
    )
    rows = corpus.collect()
    assert rows
    for r in rows:
        assert "utm_source" not in r.url  # canonical space
        assert " dup " not in f" {r.text} "  # blocklist enforced
        assert r.shard_id >= 0
    langs = {r.lang for r in rows}
    assert langs <= {"en", "fr", "de"}  # mixture dropped the rest
    assert "n_substr_dup_tokens" in corpus.columns


def test_composed_substring_dedup_is_skew_safe(spark):
    """The COMPOSED corpus job must ship the skew-safe substring-dedup
    verdict (agg + AQE-splittable join), not the unsplittable
    window-on-hash plan — a boilerplate window occurring 10^6+ times
    is a certainty at 100 TB (VERDICT r5 #2)."""
    import re

    from readability_ex_spark.operators.corpus import (
        prepare_training_corpus,
    )
    from readability_ex_spark.sources.pages import synthesize_pages

    pages = synthesize_pages(spark, "/root/testdata/sf0.001").limit(40)
    corpus = prepare_training_corpus(
        pages, drop_substring_dups=True, n_partitions=4
    )
    plan = corpus._jdf.queryExecution().executedPlan().toString()
    assert not re.search(r"windowspecdefinition\(h#\d+", plan), (
        "composed job uses the window-on-hash substring-dedup plan"
    )
    # the opt-out still reaches the window plan when asked
    window_plan = (
        prepare_training_corpus(
            pages,
            drop_substring_dups=True,
            substring_skew_safe=False,
            n_partitions=4,
        )
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert re.search(r"windowspecdefinition\(h#\d+", window_plan)
