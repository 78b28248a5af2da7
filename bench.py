"""Benchmark: headline queries at $SPARK_GRAFT_SF_DIR (default sf0.1).

Prints ONE JSON line:
  {"metric": "...", "value": <docs/sec>, "unit": "docs/sec",
   "queries": {name: seconds}, "sf": <dir>, ...}

The headline metric is extraction throughput (docs/sec) through the full
pipeline (synth pages -> dedup -> repartition -> mapInPandas kernel);
per-query wall times for the relational/training-data operators ride
along. Scaling-efficiency evidence (local[8] vs local[32]) is produced
by scripts/bench_scaling.py and recorded in BENCH/BASELINE.md.
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent
sys.path.insert(0, str(REPO))


def main() -> int:
    import argparse

    ap = argparse.ArgumentParser()
    ap.add_argument(
        "--composed",
        action="store_true",
        help="also time the composed corpus job end-to-end (extraction -> "
        "dedup manifest -> quality -> partitioned corpus write) — the "
        "wall time a prepare_corpus.py user actually experiences, and "
        "the only place cross-stage plan regressions show",
    )
    ap.add_argument(
        "--composed-full",
        action="store_true",
        help="like --composed but with every corpus-safety stage on "
        "(decontamination vs a held-out eval split, PII scrub, Gopher "
        "quality + repetition rules, canonical urls, blocklist, "
        "substring dedup, LM floor, domain cap, shard ids) — the "
        "maximal build a user runs",
    )
    args, _ = ap.parse_known_args()
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    def _loadavg() -> list[float]:
        # ambient co-tenant load at measurement time — without it a bench
        # artifact from a loaded box is unadjudicable (round 5 burned a
        # review cycle on a uniform 1.5x ambient factor)
        try:
            return [
                float(x)
                for x in Path("/proc/loadavg").read_text().split()[:3]
            ]
        except (OSError, ValueError):
            return []

    # Quiet-box gate: both r5 and r6 driver benches landed at ~0.75x the
    # steady band purely because ambient load was ~3 at start.  Wait
    # (bounded) for BOTH the 1- AND 5-minute loadavg to drop below the
    # gate before measuring — measured round 7: runs at load1 < 1 but
    # load5 ~2 still read 20% under the band (2,599-2,738 vs 3,385 at
    # load5 0.23), so the 5-minute average is the real discriminator of
    # a settled box.  Budget 900 s covers a 5-min average decaying from
    # ~4 (exponential, ~5 ln 4 ≈ 7 min).  Gate and budget are
    # env-tunable; on timeout we proceed and the stamped loadavg_start
    # makes the compromise visible.
    gate = float(os.environ.get("SPARK_GRAFT_LOADAVG_GATE", "1.0"))
    budget = float(os.environ.get("SPARK_GRAFT_LOADAVG_WAIT_SEC", "900"))
    waited = 0.0
    while budget > 0:
        la = _loadavg()
        if not la or max(la[0], la[1]) < gate:
            break
        step = min(15.0, budget)
        time.sleep(step)
        waited += step
        budget -= step

    load_start = _loadavg()

    from readability_ex_spark.operators import embedding as E
    from readability_ex_spark.operators import relational as R
    from readability_ex_spark.operators import similarity as S
    from readability_ex_spark.operators import textops as T
    from readability_ex_spark.operators.corpus import q_quality_rules
    from readability_ex_spark.pipeline import run_extraction
    from readability_ex_spark.session import get_spark
    from readability_ex_spark.sources.pages import synthesize_pages

    # the synthetic bench pages are ~3 KB; 512 rows/batch ≈ 1.5 MB — the
    # same per-batch byte budget the 64-row production default targets on
    # ~100 KB crawl pages (see BENCH/BASELINE.md)
    spark = get_spark(
        "bench",
        extra_conf={"spark.sql.execution.arrow.maxRecordsPerBatch": "512"},
    )

    timings: dict[str, float] = {}

    def run(name, fn):
        t0 = time.perf_counter()
        n = fn()
        timings[name] = round(time.perf_counter() - t0, 3)
        return n

    # headline: full extraction pipeline. Python workers are spawned once
    # per executor core and reused for the life of the application — warm
    # them outside the measurement so the number reflects steady-state
    # throughput (the quantity that matters at 100 TB), not JVM+fork
    # startup. Worker spawn cost is reported separately.
    pages = synthesize_pages(spark, sf_dir)
    n_pages = pages.select("url").distinct().count()
    t0 = time.perf_counter()
    run_extraction(pages.limit(256), dedup=False).count()
    timings["worker_warmup"] = round(time.perf_counter() - t0, 3)
    # second ambient gate, IN-BAND: the guest loadavg cannot see host
    # co-tenancy (measured: both loadavgs < 1 yet warmup 6.4 s vs the
    # ~3.2 s steady state, and the headline read 40% low). The warmup
    # pass is a calibrated control — if it runs slow, the box is slow;
    # wait and re-measure it (bounded) before taking the numbers.
    warm_gate = float(os.environ.get("SPARK_GRAFT_WARMUP_GATE", "4.5"))
    warm_budget = float(os.environ.get("SPARK_GRAFT_WARMUP_WAIT_SEC", "600"))
    warm_retries = 0
    while timings["worker_warmup"] > warm_gate and warm_budget > 0:
        time.sleep(min(60.0, warm_budget))
        warm_budget -= 60.0
        warm_retries += 1
        t0 = time.perf_counter()
        run_extraction(pages.limit(256), dedup=False).count()
        # keep the LAST measurement, not the min: it reflects the box
        # the rest of the bench is about to run on
        timings["worker_warmup"] = round(time.perf_counter() - t0, 3)
    # best of N: the sandbox is co-tenant and single runs swing ±30%;
    # min-of-N reports steady-state throughput, not scheduler luck
    extract_runs = int(os.environ.get("SPARK_GRAFT_BENCH_RUNS", "2"))
    extract_sec = None
    n_extracted = 0
    for _ in range(extract_runs):
        t0 = time.perf_counter()
        n_extracted = run_extraction(pages).count()
        sec = time.perf_counter() - t0
        extract_sec = sec if extract_sec is None else min(extract_sec, sec)
    timings["extract_pipeline"] = round(extract_sec, 3)
    docs_per_sec = round(n_extracted / extract_sec, 2) if extract_sec > 0 else 0.0

    # relational / training-data operators (count() forces execution)
    run("agg_counters", lambda: R.q_agg_counters(spark, sf_dir).count())
    run("dedup_latest", lambda: R.q_dedup_latest(spark, sf_dir).count())
    run("anti_join_resume", lambda: R.q_anti_join_resume(spark, sf_dir).count())
    run("broadcast_join", lambda: R.q_broadcast_join(spark, sf_dir).count())
    run("token_count", lambda: T.q_token_count(spark, sf_dir).count())
    run("exact_dedup", lambda: T.q_exact_dedup(spark, sf_dir).count())
    run("minhash_sig", lambda: T.q_minhash_sig(spark, sf_dir).count())
    run("winnow_fingerprint", lambda: T.q_winnow_fingerprint(spark, sf_dir).count())
    run("winnow_overlap", lambda: T.q_winnow_overlap(spark, sf_dir).count())
    run("near_dup", lambda: T.q_near_dup(spark, sf_dir).count())
    run("simhash_near_dup", lambda: T.q_simhash_near_dup(spark, sf_dir).count())
    run("shingle_jaccard", lambda: T.q_shingle_jaccard(spark, sf_dir).count())
    run("ann_bruteforce", lambda: S.q_ann_bruteforce(spark, sf_dir).count())
    run("ann_batch_topk", lambda: S.q_ann_batch_topk(spark, sf_dir).count())
    run("ann_ivf_topk", lambda: S.q_ann_ivf_topk(spark, sf_dir).count())
    run("ann_materialized_topk", lambda: S.q_ann_materialized_topk(spark, sf_dir).count())

    # split view of the same operator: the one-time index BUILD vs the
    # per-query PROBE (at 100 TB the build amortizes across probes; the
    # conflated number above is what a cold single-query caller pays)
    import shutil as _sh
    import tempfile as _tf

    _idx = _tf.mkdtemp(prefix="bench_ann_idx_")
    try:
        _emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
        _q = _emb.orderBy("vec_id").head()
        run(
            "ann_index_build",
            lambda: S.materialize_buckets(_emb, f"{_idx}/t") or 1,
        )
        run(
            "ann_materialized_probe",
            lambda: S.ann_materialized_topk(
                spark, f"{_idx}/t", list(_q.embedding), k=5,
                exclude_id=_q.vec_id,
            ).count(),
        )
    finally:
        _sh.rmtree(_idx, ignore_errors=True)

    # same split for the IVF family: one-time cell-partitioned index
    # build vs the per-batch partition-pruned probe
    _ivf_dir = _tf.mkdtemp(prefix="bench_ivf_idx_")
    try:
        _emb2 = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
        _cents = S._seed_centroids(_emb2)
        run(
            "ann_ivf_index_build",
            lambda: S.materialize_ivf(_emb2, f"{_ivf_dir}/i", _cents) or 1,
        )
        from pyspark.sql import functions as _Fq

        _qs = _emb2.filter(_Fq.col("vec_id") < 8).select(
            _Fq.col("vec_id").alias("query_id"),
            _Fq.col("embedding").alias("query_vec"),
        )
        run(
            "ann_ivf_materialized_probe",
            lambda: S.ann_ivf_materialized_topk(
                spark, f"{_ivf_dir}/i", _qs, k=3, nprobe=4
            ).count(),
        )
    finally:
        _sh.rmtree(_ivf_dir, ignore_errors=True)

    run("quality_rules", lambda: q_quality_rules(spark, sf_dir).count())
    from readability_ex_spark.operators.bpe import q_bpe_tokenize
    from readability_ex_spark.operators.policyops import q_policy_filter

    run("bpe_tokenize", lambda: q_bpe_tokenize(spark, sf_dir).count())
    run("policy_filter", lambda: q_policy_filter(spark, sf_dir).count())
    from readability_ex_spark.operators.robotstxt import q_robots_verdict

    run("robots_verdict", lambda: q_robots_verdict(spark, sf_dir).count())
    from readability_ex_spark.operators.qualityclf import q_quality_classifier

    run(
        "quality_classifier",
        lambda: q_quality_classifier(spark, sf_dir).count(),
    )
    from readability_ex_spark.operators.lmquality import q_unigram_logprob
    from readability_ex_spark.operators.sampling import q_mixture_sample
    from readability_ex_spark.operators.urlops import q_canonical_dedup
    from readability_ex_spark.operators.wordlist import q_wordlist_filter

    run("unigram_logprob", lambda: q_unigram_logprob(spark, sf_dir).count())
    from readability_ex_spark.operators.lmquality import q_bigram_logprob

    # two model aggs + one position explode with 3 broadcast joins
    run("bigram_logprob", lambda: q_bigram_logprob(spark, sf_dir).count())
    from readability_ex_spark.operators.lmquality import q_lm_buckets

    run("lm_buckets", lambda: q_lm_buckets(spark, sf_dir).count())
    from readability_ex_spark.operators.sampling import q_pack_sequences

    run("pack_sequences", lambda: q_pack_sequences(spark, sf_dir).count())
    from readability_ex_spark.operators.lmquality import q_dsir_weights

    run("dsir_weights", lambda: q_dsir_weights(spark, sf_dir).count())

    # split view: dsir_weights above pays BOTH model builds inline; with
    # persisted vocabs (the recurring-pipeline path — prepare_corpus.py
    # persists _lm_vocab) only the single-pass scoring runs, and that
    # pass should cost ≈ unigram_logprob's scoring (one explode, one
    # doc-level agg) despite scoring two models
    from readability_ex_spark.operators.lmquality import (
        dsir_weights as _dsirw,
        unigram_vocab as _uvocab,
    )
    from pyspark.sql import functions as _Fd

    _docs_lm = spark.read.parquet(f"{sf_dir}/documents.parquet")
    _tv = _uvocab(
        _docs_lm.filter(
            _Fd.md5(_Fd.col("doc_id").cast("string")).startswith("0")
        )
    ).localCheckpoint(eager=True)
    _sv = _uvocab(_docs_lm).localCheckpoint(eager=True)
    run(
        "dsir_weights_scored",
        lambda: _dsirw(
            _docs_lm, None, target_vocab=_tv, self_vocab=_sv
        ).count(),
    )
    run("wordlist_filter", lambda: q_wordlist_filter(spark, sf_dir).count())
    run("canonical_dedup", lambda: q_canonical_dedup(spark, sf_dir).count())
    from readability_ex_spark.operators.linkgraph import (
        q_extract_outlinks,
        q_host_pagerank,
    )

    run(
        "extract_outlinks",
        lambda: q_extract_outlinks(spark, sf_dir).count(),
    )
    # pays edge derivation + host agg + 3 PageRank iterations (each one
    # join + one agg + an eager localCheckpoint) + 3 dangling scalars
    run("host_pagerank", lambda: q_host_pagerank(spark, sf_dir).count())
    from readability_ex_spark.operators.linkgraph import q_page_inlinks
    from readability_ex_spark.operators.urlops import q_crawl_frontier

    # Expand + two exchanges (the exact multi-distinct price)
    run("page_inlinks", lambda: q_page_inlinks(spark, sf_dir).count())
    # distinct + anti-join + salted two-stage per-host cap
    run("crawl_frontier", lambda: q_crawl_frontier(spark, sf_dir).count())
    run("mixture_sample", lambda: q_mixture_sample(spark, sf_dir).count())
    from readability_ex_spark.operators.retrieval import q_bm25_topk
    from readability_ex_spark.operators.urlops import q_recrawl_schedule

    # two pruned scans (stats + filtered postings), broadcast scoring
    run("bm25_topk", lambda: q_bm25_topk(spark, sf_dir).count())
    # build/probe split for the postings index (build amortizes)
    from readability_ex_spark.operators.retrieval import (
        bm25_materialized_topk as _bm25probe,
        materialize_bm25 as _bm25build,
        BM25_QUERY as _BM25Q,
    )

    _bm25_dir = _tf.mkdtemp(prefix="bench_bm25_idx_")
    try:
        _bdocs = spark.read.parquet(f"{sf_dir}/documents.parquet")
        run(
            "bm25_index_build",
            lambda: _bm25build(_bdocs, f"{_bm25_dir}/i") or 1,
        )
        run(
            "bm25_materialized_probe",
            lambda: _bm25probe(spark, f"{_bm25_dir}/i", _BM25Q).count(),
        )
    finally:
        _sh.rmtree(_bm25_dir, ignore_errors=True)
    # latest-fetch agg + host sizes + salted two-stage staleness cap
    run("recrawl_schedule", lambda: q_recrawl_schedule(spark, sf_dir).count())
    # cell assign (Arrow matmul) + within-cell pair join + components
    run(
        "semantic_dedup",
        lambda: S.q_semantic_dedup(spark, sf_dir).count(),
    )
    from readability_ex_spark.operators.corpus import q_repetition_stats
    from readability_ex_spark.operators.decontam import q_decontaminate
    from readability_ex_spark.operators.pii import q_pii_scrub

    run("repetition_stats", lambda: q_repetition_stats(spark, sf_dir).count())
    from readability_ex_spark.operators.decontam import q_line_dedup

    run("decontaminate", lambda: q_decontaminate(spark, sf_dir).count())
    from readability_ex_spark.operators.decontam import q_decontaminate_spans

    run(
        "decontaminate_spans",
        lambda: q_decontaminate_spans(spark, sf_dir).count(),
    )
    run("line_dedup", lambda: q_line_dedup(spark, sf_dir).count())
    from readability_ex_spark.operators.substrdedup import q_substring_dedup

    run(
        "substring_dedup", lambda: q_substring_dedup(spark, sf_dir).count()
    )
    run("pii_scrub", lambda: q_pii_scrub(spark, sf_dir).count())
    run("text_embedding", lambda: E.q_text_embedding(spark, sf_dir).count())
    run(
        "text_emb_near_dup",
        lambda: E.q_text_emb_near_dup(spark, sf_dir).count(),
    )

    from readability_ex_spark.operators import clusters as C

    run("near_dup_clusters", lambda: C.q_near_dup_clusters(spark, sf_dir).count())
    run("dedup_manifest", lambda: C.q_dedup_manifest(spark, sf_dir).count())
    # same manifest + one codegen score map + one cluster-keyed hash agg
    run(
        "dedup_manifest_quality",
        lambda: C.q_dedup_manifest_quality(spark, sf_dir).count(),
    )

    # incremental update: a small batch (some paraphrases of existing
    # docs, some fresh) checked against the whole existing corpus for
    # cross-batch near-dups. Three numbers: the legacy full-rescan plan,
    # the one-time persisted band-index build (amortizes across
    # updates), and the per-update indexed path — the recurring-crawl
    # cost that actually matters.
    from pyspark.sql import functions as _F

    _docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", "text"
    )
    _para = (
        _docs.filter(_F.col("doc_id") % 100 == 0)
        .select(
            (_F.col("doc_id") + 10_000_000).alias("doc_id"),
            _F.concat(_F.col("text"), _F.lit(" extra trailing tokens")).alias(
                "text"
            ),
        )
    )
    _fresh = _docs.filter(_F.col("doc_id") % 100 == 1).select(
        (_F.col("doc_id") + 20_000_000).alias("doc_id"),
        _F.concat_ws(
            " ",
            _F.transform(
                _F.sequence(_F.lit(0), _F.lit(79)),
                lambda i: _F.concat(
                    _F.lit("fresh"), _F.col("doc_id").cast("string"),
                    _F.lit("w"), i.cast("string"),
                ),
            ),
        ).alias("text"),
    )
    _batch = _para.unionByName(_fresh).localCheckpoint()
    run(
        "update_delta_rescan",
        lambda: T.cross_near_dup_matches(_batch, _docs).count(),
    )
    _bdir = _tf.mkdtemp(prefix="bench_bands_")
    try:
        run(
            "update_index_build",
            lambda: T.band_index(_docs).write.parquet(f"{_bdir}/b") or 1,
        )
        _bands = spark.read.parquet(f"{_bdir}/b")
        run(
            "update_delta_indexed",
            lambda: T.cross_near_dup_matches(
                _batch, _docs, existing_bands=_bands
            ).count(),
        )
    finally:
        _sh.rmtree(_bdir, ignore_errors=True)

    # the same three incremental numbers in EMBEDDING space: full
    # rescan (both sides re-coded), the one-time _emb_sigs signature
    # index build, and the per-update indexed path that codes only the
    # batch
    from readability_ex_spark.operators import similarity as _S
    from readability_ex_spark.operators.embedding import (
        TEXT_EMB_DIM as _ED,
        TEXT_EMB_ND_K as _EK,
        TEXT_EMB_ND_TABLES as _ET,
        TEXT_EMB_ND_THRESHOLD as _ETH,
        nonzero_embeddings as _nz,
        text_embedding as _temb,
    )

    _eexist = _nz(_temb(_docs)).select(
        _F.col("doc_id").alias("vec_id"), "embedding"
    ).localCheckpoint()
    _ebatch = _nz(_temb(_batch)).select(
        _F.col("doc_id").alias("vec_id"), "embedding"
    ).localCheckpoint()

    def _emb_cross(sigs=None):
        return _S.cross_emb_near_dup_matches(
            _ebatch, _eexist, threshold=_ETH, dim=_ED, k_planes=_EK,
            n_tables=_ET, existing_sigs=sigs,
        ).count()

    run("emb_update_rescan", _emb_cross)
    _sdir = _tf.mkdtemp(prefix="bench_embsigs_")
    try:
        run(
            "emb_sig_index_build",
            lambda: _S.banded_sig_codes(
                _eexist, dim=_ED, k_planes=_EK, n_tables=_ET
            ).select("vec_id", "cs", "sig").write.parquet(f"{_sdir}/s")
            or 1,
        )
        _esigs = spark.read.parquet(f"{_sdir}/s")
        run("emb_update_indexed", lambda: _emb_cross(_esigs))
    finally:
        _sh.rmtree(_sdir, ignore_errors=True)

    if args.composed:
        import shutil
        import tempfile

        from pyspark.sql import functions as F

        from readability_ex_spark.operators.corpus import (
            prepare_training_corpus,
        )

        def composed() -> int:
            outdir = tempfile.mkdtemp(prefix="bench_corpus_")
            try:
                corpus = prepare_training_corpus(pages).withColumn(
                    "url_bucket",
                    F.pmod(F.xxhash64("url"), F.lit(64)).cast("int"),
                )
                corpus.write.partitionBy("url_bucket").mode(
                    "overwrite"
                ).parquet(f"{outdir}/corpus")
                return spark.read.parquet(f"{outdir}/corpus").count()
            finally:
                shutil.rmtree(outdir, ignore_errors=True)

        run("prepare_corpus_e2e", composed)

    if args.composed_full:
        import shutil
        import tempfile

        from pyspark.sql import functions as F

        from readability_ex_spark.operators.corpus import (
            prepare_training_corpus,
        )

        def composed_full() -> int:
            outdir = tempfile.mkdtemp(prefix="bench_corpus_full_")
            try:
                # held-out eval split: 1/16 of the docs table's text
                eval_df = (
                    spark.read.parquet(f"{sf_dir}/documents.parquet")
                    .filter(
                        F.md5(F.col("doc_id").cast("string")).startswith("0")
                    )
                    .select("text")
                )
                corpus = prepare_training_corpus(
                    pages,
                    eval_df=eval_df,
                    scrub_pii_text=True,
                    quality_rules=True,
                    repetition_rules=True,
                    canonical_urls=True,
                    blocklist=("casino", "lottery"),
                    drop_substring_dups=True,
                    min_lm_logprob=-30.0,
                    max_per_domain=100_000,
                    shard_tokens=50_000,
                ).withColumn(
                    "url_bucket",
                    F.pmod(F.xxhash64("url"), F.lit(64)).cast("int"),
                )
                corpus.write.partitionBy("url_bucket").mode(
                    "overwrite"
                ).parquet(f"{outdir}/corpus")
                return spark.read.parquet(f"{outdir}/corpus").count()
            finally:
                shutil.rmtree(outdir, ignore_errors=True)

        run("prepare_corpus_full_e2e", composed_full)

    print(
        json.dumps(
            {
                "metric": "extraction docs/sec (full pipeline, synth pages)",
                "value": docs_per_sec,
                "unit": "docs/sec",
                "queries": timings,
                "sf": sf_dir,
                "n_pages": n_pages,
                "n_extracted": n_extracted,
                "cores": os.environ.get("SPARK_GRAFT_CPUS", "*"),
                "extract_runs": extract_runs,
                "loadavg_start": load_start,
                "loadavg_end": _loadavg(),
                "loadavg_gate_waited_sec": round(waited, 1),
                "warmup_gate_retries": warm_retries,
            }
        )
    )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
