"""Training-corpus preparation job — the spark-submit entry point for
the composed pipeline a 100 TB text-corpus build actually runs:

    spark-submit --py-files readability_ex_spark.zip scripts/prepare_corpus.py \
        --input  /data/pages          # parquet/Iceberg pages table
        --output /data/corpus         # deduped, quality-annotated corpus
        [--min-quality 0.3]           # drop docs below this score
        [--quality-rules]             # apply the Gopher/C4 rule set
        [--repetition-rules]          # Gopher n-gram repetition rules
        [--scrub-pii]                 # redact emails/IPs/phones in text
        [--decontaminate /data/eval]  # drop docs overlapping this eval set
        [--near-dup-threshold 0.8]    # token-Jaccard cluster threshold
        [--no-near-dup]               # exact-dup collapse only
        [--emb-near-dup 0.9]          # embedding-space dedup stage
        [--partitions 4096]

pages -> extraction (mapInPandas kernel) -> exact-dup collapse ->
capped-LSH near-dup clusters -> keep min url per cluster -> quality
signals -> min_quality filter -> url-bucketed parquet, plus a
`_manifest` artifact recording every url's keep decision (the dedup
audit trail: url, fingerprint, n_copies, canonical_url, keep).
"""

from __future__ import annotations

import argparse
import json
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent


def _emb_sig_rows(corpus_df, orphan_keys=None):
    """``(url, cs, sig)`` banded-signature index rows for a corpus
    frame — the ``_emb_sigs`` artifact (embedding-space mirror of
    ``_bands``): text-embed, drop zero-norm vectors (empty text has no
    cosine), code with the production band/signature constants. With
    ``orphan_keys``, restricted to those urls (the heal_sidecars
    re-derive contract)."""
    from pyspark.sql import functions as F

    from readability_ex_spark.operators.embedding import (
        TEXT_EMB_DIM,
        TEXT_EMB_ND_K,
        TEXT_EMB_ND_TABLES,
        nonzero_embeddings,
        text_embedding,
    )
    from readability_ex_spark.operators.similarity import banded_sig_codes

    src = corpus_df.select("url", "text")
    if orphan_keys is not None:
        src = src.join(orphan_keys, "url", "left_semi")
    emb = nonzero_embeddings(
        text_embedding(src, id_col="url")
    ).select(F.col("url").alias("vec_id"), "embedding")
    coded = banded_sig_codes(
        emb,
        dim=TEXT_EMB_DIM,
        k_planes=TEXT_EMB_ND_K,
        n_tables=TEXT_EMB_ND_TABLES,
    ).select(F.col("vec_id").alias("url"), "cs", "sig")
    # EVERY corpus url gets a row (zero-norm text -> NULL cs/sig):
    # a key-complete index is what lets heal_sidecars tell a crashed
    # append from a legitimately sig-less doc; consumers explode cs,
    # and exploding NULL yields no rows, so NULL rows are inert
    return src.select("url").join(coded, "url", "left")
if str(REPO) not in sys.path:
    sys.path.insert(0, str(REPO))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", required=True)
    ap.add_argument("--output", required=True)
    ap.add_argument("--min-quality", type=float, default=0.0)
    ap.add_argument(
        "--quality-rules", action="store_true",
        help="keep only documents passing every Gopher/C4 quality rule",
    )
    ap.add_argument(
        "--lang", default=None, metavar="TAG",
        help="keep only docs whose metadata lang starts with TAG "
        "(language routing — run before the English stopword rules)",
    )
    ap.add_argument(
        "--repetition-rules", action="store_true",
        help="drop documents failing any Gopher n-gram repetition rule",
    )
    ap.add_argument(
        "--drop-boilerplate", action="store_true",
        help="remove C4-style cross-document boilerplate chunks from "
        "every doc's text before quality stats",
    )
    ap.add_argument(
        "--normalize-text", action="store_true",
        help="replace text with its unicode-canonical form (control "
        "strip, whitespace collapse, NFC) before all later stages",
    )
    ap.add_argument(
        "--respect-robots", action="store_true",
        help="drop pages whose head declared meta-robots "
        "noindex/noarchive/noai (kernel-emitted policy columns; pages "
        "with no declaration are kept)",
    )
    ap.add_argument(
        "--robots-txt", default=None, metavar="PATH",
        help="parquet table (host, robots_txt) of the crawl's robots.txt "
        "fetches; drop pages an RFC 9309 rule disallows for "
        "--robots-agent (hosts without a row, and pages no rule "
        "matches, are kept — the protocol's permissive default)",
    )
    ap.add_argument(
        "--robots-agent", default="*",
        help="product token to evaluate robots rules for "
        "(exact group when the host declares one, else the * group)",
    )
    ap.add_argument(
        "--robots-from-crawl", action="store_true",
        help="derive the robots rules from the INPUT pages themselves "
        "(rows whose path is exactly /robots.txt; latest fetch per "
        "host wins) — no separate --robots-txt table needed when the "
        "crawl archived its robots fetches",
    )
    ap.add_argument(
        "--scrub-pii", action="store_true",
        help="replace text with its PII-scrubbed form before quality stats",
    )
    ap.add_argument(
        "--canonical-urls", action="store_true",
        help="rewrite every url to its canonical form at read time so "
        "url-spelling duplicates collapse in the latest-fetch dedup "
        "before extraction; all url-keyed artifacts then live in "
        "canonical space — use consistently across --update runs",
    )
    ap.add_argument(
        "--host-rank-floor", type=float, default=0.0, metavar="FRAC",
        help="drop documents whose host sits in the bottom FRAC of the "
        "batch's host-PageRank distribution (link graph built from the "
        "kernel-emitted outlinks; 5 iterations). Hosts absent from the "
        "graph are KEPT (unknown != bad). Writes the rank table as a "
        "_hostrank sidecar. In --update mode the graph covers the "
        "batch only (same batch-local scope as the df statistics)",
    )
    ap.add_argument(
        "--blocklist", default=None, metavar="WORDS",
        help="comma-separated lowercase words/phrases; drop any doc "
        "containing one (C4 bad-words rule)",
    )
    ap.add_argument(
        "--drop-substring-dups", action="store_true",
        help="remove non-first occurrences of corpus-duplicated 20-token "
        "runs from every doc's text (exact substring dedup; skew-safe "
        "agg+join verdict plan by default)",
    )
    ap.add_argument(
        "--substring-window-plan", action="store_true",
        help="with --drop-substring-dups: use the single-exchange "
        "window-function verdict plan instead of the skew-safe default "
        "— one token-scale shuffle cheaper, but a hot boilerplate "
        "window's hash partition cannot be split across tasks; only "
        "for corpora known to be boilerplate-free",
    )
    ap.add_argument(
        "--min-lm-logprob", type=float, default=None, metavar="LOGPROB",
        help="drop docs whose mean unigram log-probability vs the "
        "corpus's own term statistics is below this (CCNet-style; "
        "token-less docs always drop)",
    )
    ap.add_argument(
        "--lm-bands", type=int, default=None, metavar="K",
        help="annotate each doc with lm_bucket (1=head ... K=tail): "
        "per-language percentile bands of the unigram-LM score "
        "(CCNet head/middle/tail; scalable broadcast-threshold "
        "assignment — docs the model cannot score land in band K)",
    )
    ap.add_argument(
        "--lm-order", type=int, choices=(1, 2), default=1,
        help="LM used by --min-lm-logprob / --lm-bands: 1 = unigram "
        "(default), 2 = Jelinek-Mercer interpolated bigram (closer to "
        "CCNet's KenLM; persists/loads a _lm_bigrams pair table next "
        "to _lm_vocab; score scales differ between orders — retune "
        "the floor when switching)",
    )
    ap.add_argument(
        "--clf-model", default=None, metavar="MODEL_PATH",
        help="parquet weight table written by qualityclf.save_model (a "
        "quality classifier trained on YOUR labeled sample via "
        "qualityclf.train_quality_classifier); keep only docs scoring "
        ">= --clf-floor",
    )
    ap.add_argument(
        "--clf-floor", type=float, default=0.5, metavar="SCORE",
        help="minimum classifier score when --clf-model is given "
        "(sigmoid output, default 0.5)",
    )
    ap.add_argument(
        "--dsir-target", default=None, metavar="TARGET_PATH",
        help="parquet table with a text column describing the TARGET "
        "domain; keep only docs whose DSIR importance weight "
        "(log p_target - log p_self) is >= --min-dsir-weight",
    )
    ap.add_argument(
        "--min-dsir-weight", type=float, default=0.0, metavar="W",
        help="DSIR weight floor used with --dsir-target (default 0: "
        "keep docs at least as target-like as the corpus average)",
    )
    ap.add_argument(
        "--max-per-domain", type=int, default=None, metavar="N",
        help="cap each hostname's contribution at its N highest-quality "
        "docs (skew-safe two-stage top-k; C4/Gopher dominant-host rule)",
    )
    ap.add_argument(
        "--shard-tokens", type=int, default=None, metavar="N",
        help="annotate each doc with a per-language shard_id assigning "
        "~N tokens per shard (deterministic url order; training "
        "loaders regroup by (lang, shard_id))",
    )
    ap.add_argument(
        "--pack-seq-len", type=int, default=None, metavar="L",
        help="write a _sequences sidecar mapping each shipped doc to "
        "its fixed-length-L training sequences (doc-relative "
        "[tok_from, tok_to) slices; boundary-straddling docs split). "
        "Rebuilt from the shipped corpus every run (derived data; "
        "key-column scan only). With --shard-tokens, packing runs "
        "WITHIN shards so the windows stay bounded under language skew",
    )
    ap.add_argument(
        "--chunk-index", default=None, metavar="SIZE,STRIDE",
        help="write a _chunks sidecar: overlapping fixed-token retrieval "
        "chunks of every shipped doc (retrieval.chunk_documents — "
        "token spans + chunk text, the RAG-ingestion index unit). "
        "Rebuilt from the shipped corpus every run (derived data)",
    )
    ap.add_argument(
        "--mixture", default=None, metavar="LANG=W,...",
        help="downsample to target language proportions, e.g. "
        "en=0.5,fr=0.3,de=0.2 (largest achievable mix; languages "
        "without a weight are dropped)",
    )
    ap.add_argument(
        "--mix-by-tokens", action="store_true",
        help="make --mixture target TOKEN shares instead of document "
        "shares (the unit a training run consumes; rates derive from "
        "per-language token mass)",
    )
    ap.add_argument(
        "--decontaminate", default=None, metavar="EVAL_PATH",
        help="parquet table with a text column; drop docs sharing any "
        "13-token gram with it",
    )
    ap.add_argument(
        "--contamination-report", action="store_true",
        help="with --decontaminate: also write a _contamination sidecar "
        "auditing each eval item (keyed by md5 of its text): how many "
        "of its 13-grams leaked into the PRE-drop corpus and how many "
        "corpus docs carried them — the table the benchmark owner "
        "reads; costs one extra corpus gram pass",
    )
    ap.add_argument(
        "--decontaminate-spans", default=None, metavar="EVAL_PATH",
        help="cut eval-overlapping 13-token spans from each doc's text "
        "(surgical variant of --decontaminate: the page survives, the "
        "quoted benchmark item doesn't)",
    )
    ap.add_argument(
        "--emb-near-dup", type=float, default=None, metavar="COSINE",
        help="additionally drop embedding-space near-dups at this cosine",
    )
    ap.add_argument(
        "--semantic-dedup", type=float, default=None, metavar="COSINE",
        help="SemDeDup stage: k-means cells over text embeddings "
        "(centroids trained on a bounded deterministic sample), "
        "within-cell pairwise cosine at this threshold, keep each "
        "semantic family's farthest-from-centroid member",
    )
    ap.add_argument("--near-dup-threshold", type=float, default=0.8)
    ap.add_argument(
        "--no-near-dup", action="store_true",
        help="collapse exact duplicates only (skip the LSH cluster pass)",
    )
    ap.add_argument(
        "--checksums", action="store_true",
        help="also write a _checksums sidecar: per-url_bucket doc count "
        "+ order-independent 60-bit content XOR over the corpus as "
        "written (textops.corpus_checksums) — the integrity check a "
        "consumer verifies before training; rewritten whole every run",
    )
    ap.add_argument(
        "--quality-keeper", action="store_true",
        help="keep each dedup cluster's argmax-quality member instead "
        "of the min url (ties fall back to min url; FineWeb-style "
        "survivor rule). The _manifest audit keeps its schema — only "
        "the keep bit moves, cluster keys are unchanged",
    )
    ap.add_argument(
        "--update", action="store_true",
        help="incremental mode: treat --output as an EXISTING corpus and "
        "append only the new batch's delta (existing urls and exact-text "
        "fingerprints win; see corpus.incremental_corpus_update). Run "
        "with the SAME stage flags as the original build so the "
        "appended schema matches. Cross-batch closure comes from the "
        "persisted artifacts: _bands (near-dups), _emb_sigs "
        "(embedding near-dups), _lm_vocab (LM "
        "floor), _chunk_df (pre-verdict chunk counts, so "
        "--drop-boilerplate judges each batch against ALL prior "
        "batches' frequencies), and --update-near-dup. Only "
        "--drop-substring-dups stays batch-local: its 20-token-window "
        "df is computed over the batch, so a run duplicated across "
        "old and new batches is not cut",
    )
    ap.add_argument(
        "--update-near-dup", type=float, default=None, metavar="JACCARD",
        help="with --update: also drop batch docs whose shingle Jaccard "
        "vs ANY existing doc reaches this threshold (cross-corpus band "
        "join; exact urls/fingerprints are always dropped)",
    )
    ap.add_argument(
        "--update-emb-near-dup", type=float, default=None, metavar="COSINE",
        help="with --update: also drop batch docs whose text-embedding "
        "cosine vs ANY existing doc reaches this threshold — the "
        "paraphrase-level net token Jaccard misses. Uses the persisted "
        "_emb_sigs signature index when present (batch-linear: the "
        "existing corpus is never re-embedded except for verify "
        "candidates); implies --emb-sigs so the index extends",
    )
    ap.add_argument(
        "--emb-sigs", action="store_true",
        help="persist/extend the _emb_sigs banded-signature index of "
        "the kept corpus (url, band codes, packed Hamming signature) "
        "so --update-emb-near-dup runs never re-embed the world",
    )
    ap.add_argument(
        "--export-jsonl", default=None, metavar="DIR",
        help="additionally export the final corpus as gzipped "
        "JSON-lines (url/text/lang + shard_id when --shard-tokens is "
        "set) under DIR",
    )
    ap.add_argument(
        "--split", default=None, metavar="VAL,TEST",
        help="annotate every row with a deterministic train/val/test "
        "split (md5 url bands, sampling.corpus_split; VAL and TEST are "
        "fractions, e.g. 0.05,0.05). Growth-stable: a url's split "
        "never changes, so --update batches land consistently — but "
        "the flag must match the existing corpus (both or neither)",
    )
    ap.add_argument("--partitions", type=int, default=None)
    ap.add_argument(
        "--table-format", choices=("parquet", "iceberg"), default="parquet",
    )
    args = ap.parse_args()
    if args.lm_order == 2 and args.min_lm_logprob is None and not args.lm_bands:
        ap.error("--lm-order 2 needs --min-lm-logprob and/or --lm-bands")
    if args.contamination_report and args.decontaminate is None:
        # refusing beats silence: without the eval set there is nothing
        # to audit, and a run that exits 0 with no _contamination
        # sidecar reads as "the check passed"
        ap.error("--contamination-report needs --decontaminate EVAL_PATH")
    chunk_params = None
    if args.chunk_index is not None:
        try:
            _sz, _st = (int(x) for x in args.chunk_index.split(","))
        except ValueError:
            ap.error("--chunk-index takes SIZE,STRIDE ints, e.g. 256,192")
        if _sz < 1 or _st < 1 or _st > _sz:
            ap.error("--chunk-index needs 1 <= STRIDE <= SIZE")
        chunk_params = (_sz, _st)
    split_fracs = None
    if args.split is not None:
        try:
            _v, _t = (float(x) for x in args.split.split(","))
        except ValueError:
            ap.error("--split takes VAL,TEST fractions, e.g. 0.05,0.05")
        if _v < 0 or _t < 0 or _v + _t > 1:
            ap.error("--split fractions must be >= 0 and sum to <= 1")
        split_fracs = (_v, _t)

    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    from readability_ex_spark.operators.corpus import (
        dedup_keep_manifest,
        dedup_quality_keeper,
        embedding_dedup_drops,
        exact_dup_manifest,
        with_quality_rules,
        with_quality_signals,
    )
    from readability_ex_spark.pipeline import run_extraction
    from readability_ex_spark.sidecars import (
        load_sidecar,
        record_sidecars,
        sidecar_exists,
        sidecar_path,
        write_sidecar,
    )
    from readability_ex_spark.sources.pages import read_pages

    spark = SparkSession.builder.appName("prepare_corpus").getOrCreate()
    pages = read_pages(spark, args.input, table_format=args.table_format)
    if args.canonical_urls:
        from readability_ex_spark.operators.urlops import canonicalize_url

        pages = pages.withColumn("url", canonicalize_url(F.col("url")))
    if args.robots_txt or args.robots_from_crawl:
        # host-level REP rules depend only on the url, so they filter
        # the RAW pages: a disallowed page never pays extraction, and
        # robots_filter's two references to its input re-derive only
        # the cheap page scan — not the kernel (the post-extraction
        # placement ran the UDF stage twice). The rules table is tiny
        # (one row per host x agent x rule) and broadcast; only matched
        # urls reach the precedence agg.
        from readability_ex_spark.operators.robotstxt import (
            parse_robots,
            robots_filter,
            robots_from_pages,
        )

        if args.robots_txt:
            robots_df = spark.read.parquet(args.robots_txt)
        else:
            # the crawl archived its own robots fetches: lift them off
            # the RAW page rows BEFORE the filter below prunes them
            # (robots.txt is not HTML — those rows never become corpus
            # docs anyway)
            robots_df = robots_from_pages(pages, ts_col="warc_ts")
        robots_rules = parse_robots(robots_df).localCheckpoint(
            eager=True
        )  # tiny; cut the re-derivation per use
        pages = robots_filter(pages, robots_rules, agent=args.robots_agent)

    # extraction is the expensive stage — run it ONCE and cache; both the
    # corpus and the manifest artifact derive from it
    extracted = run_extraction(pages, n_partitions=args.partitions).filter(
        F.col("status") == "ok"
    )
    if args.respect_robots:
        # kernel-emitted meta-robots flags: excluded pages drop before
        # any dedup/quality work (and can never become canonicals)
        from readability_ex_spark.operators.policyops import policy_filter

        extracted = policy_filter(extracted)
    hostrank_df = None
    if args.host_rank_floor > 0:
        # crawl-graph quality floor: rank hosts by the batch's own link
        # structure (kernel-emitted outlinks — no second parse) and cut
        # the bottom slice BEFORE any content work pays for its pages.
        # One approx-percentile scalar instead of a global rank window,
        # so no single-partition sort at 10^8 hosts.
        from readability_ex_spark.operators.linkgraph import (
            host_graph,
            host_pagerank,
        )
        from readability_ex_spark.operators.urlops import host_expr

        # the edge walk (materialized by the threshold collect below)
        # and the host anti-join both reference extracted BEFORE the
        # cache() downstream — checkpoint so the kernel runs once
        extracted = extracted.localCheckpoint(eager=False)
        edges = (
            extracted.filter(F.col("outlinks").isNotNull())
            .select("url", F.explode("outlinks").alias("dst"))
            .distinct()
        )
        hostrank_df = host_pagerank(
            host_graph(edges, src_col="url", dst_col="dst"), iterations=5
        )
        thr_row = hostrank_df.agg(
            F.expr(
                f"approx_percentile(rank, {args.host_rank_floor})"
            ).alias("thr")
        ).collect()
        thr = thr_row[0]["thr"]
        if thr is not None:
            low = hostrank_df.filter(F.col("rank") < thr).select("host")
            extracted = extracted.join(
                low,
                host_expr(F.col("url")) == low.host,
                "left_anti",
            )
        # the sidecar itself is written AFTER the corpus write — the
        # corpus overwrite clears the output dir (hostrank_df is
        # checkpoint-materialized, so it survives the wait)
    if args.lang:
        extracted = extracted.filter(
            F.lower(F.coalesce(F.col("lang"), F.lit(""))).startswith(
                args.lang.lower()
            )
        )
    extracted = extracted.cache()

    if args.no_near_dup:
        manifest = exact_dup_manifest(extracted).withColumn(
            "keep", F.col("url") == F.col("canonical_url")
        )
    else:
        manifest = dedup_keep_manifest(
            extracted, near_dup_threshold=args.near_dup_threshold
        )
    if args.quality_keeper:
        # survivor = argmax-quality member per cluster (ties -> min
        # url); scores are one codegen map over the cached extraction.
        # The select pins the _manifest sidecar's 5-column schema so
        # update-mode appends and the heal pass stay compatible.
        manifest = dedup_quality_keeper(
            manifest,
            with_quality_signals(extracted).select("url", "quality_score"),
        ).select("url", "fingerprint", "n_copies", "canonical_url", "keep")
    manifest = manifest.cache()

    keep = manifest.filter(F.col("keep")).select("url", "fingerprint", "n_copies")
    survivors = extracted.join(keep, "url")
    contamination_rep_df = None
    if args.decontaminate:
        from readability_ex_spark.operators.decontam import decontaminate

        eval_df = spark.read.parquet(args.decontaminate)
        verdicts = decontaminate(survivors, eval_df, id_col="url")
        if args.contamination_report:
            # audit the PRE-drop corpus (what was endangered); written
            # AFTER the corpus lands — an overwrite-mode corpus write
            # wipes the output dir, sidecars included
            from readability_ex_spark.operators.decontam import (
                contamination_report,
            )

            contamination_rep_df = contamination_report(
                survivors,
                eval_df.select(
                    F.md5("text").alias("eval_id"), "text"
                ).distinct(),
                id_col="url",
                eval_id_col="eval_id",
            )
        survivors = survivors.join(
            verdicts.filter("contaminated").select("url"), "url", "left_anti"
        )
    if args.decontaminate_spans:
        from readability_ex_spark.operators.decontam import (
            decontaminate_spans,
        )

        eval_df = spark.read.parquet(args.decontaminate_spans)
        cut = decontaminate_spans(survivors, eval_df, id_col="url").select(
            "url", "text_clean", "n_dup_tokens"
        )
        survivors = (
            survivors.drop("text")
            .join(cut, "url")
            .withColumnRenamed("text_clean", "text")
            .withColumnRenamed("n_dup_tokens", "n_decontam_tokens")
        )
    if args.normalize_text:
        from readability_ex_spark.operators.textops import normalize_text

        survivors = (
            normalize_text(survivors)
            .drop("text")
            .withColumnRenamed("text_norm", "text")
        )
    if args.scrub_pii:
        from readability_ex_spark.operators.pii import scrub_pii

        survivors = (
            scrub_pii(survivors)
            .drop("text")
            .withColumnRenamed("text_scrubbed", "text")
        )
    chunk_df_path = sidecar_path(args.output, "_chunk_df")
    chunk_df_staging = f"{args.output.rstrip('/')}_chunk_df.staging"
    had_chunk_df = sidecar_exists(args.output, "_chunk_df")
    if args.drop_boilerplate:
        from readability_ex_spark.operators.decontam import (
            chunk_document_frequency,
            line_dedup,
        )

        # Cross-batch closure: the persisted additive sidecar carries
        # PRE-verdict chunk counts (frequencies over each batch's
        # input text BEFORE the boilerplate cut) — post-clean counts
        # would zero out every chunk the cut removed, letting the next
        # batch re-admit up to max_df copies of exactly that
        # boilerplate.  This batch's counts are written FIRST, then
        # the summed table (prior batches + this one) is read back as
        # the verdict — the write doubles as the materialization
        # barrier, so the corpus is chunk-counted exactly once.
        count_src = survivors.select("url", "text")
        if args.update:
            # a re-crawled url already counted by a prior batch would
            # double-count its chunks; the existing corpus wins on url
            # anyway, so exclude those rows from the COUNTING side
            # (key-only scan of the existing output)
            count_src = count_src.join(
                spark.read.parquet(args.output).select("url"),
                "url",
                "left_anti",
            )
            if had_chunk_df:
                print("chunk_df=loaded")
            else:
                # first update of a pre-sidecar corpus: bootstrap from
                # the existing corpus's written text (post-clean — the
                # best still available; its over-cap chunks were never
                # persisted pre-clean) plus this batch's pre-clean
                # counts — the one-time migration cost. Appending just
                # the batch would leave a partial table later updates
                # silently trust.
                count_src = count_src.unionByName(
                    spark.read.parquet(args.output).select("url", "text")
                )
            # corpus writes append in update mode, so the sidecar can
            # be extended in place
            chunk_df_mode = "append" if had_chunk_df else "overwrite"
            chunk_document_frequency(count_src, id_col="url").write.mode(
                chunk_df_mode
            ).parquet(chunk_df_path)
            print(
                "chunk_df="
                + ("appended" if chunk_df_mode == "append" else "rebuilt")
            )
            counts_read_path = chunk_df_path
        else:
            # full build: the corpus overwrite below wipes args.output
            # (sidecar included), so stage the counts in a sibling dir
            # and promote to _chunk_df after the corpus lands
            chunk_document_frequency(count_src, id_col="url").write.mode(
                "overwrite"
            ).parquet(chunk_df_staging)
            print("chunk_df=rebuilt")
            counts_read_path = chunk_df_staging
        all_counts = (
            spark.read.parquet(counts_read_path)
            .groupBy("chunk_h")
            .agg(F.sum("df").alias("df"))
        )
        cleaned = line_dedup(
            survivors, id_col="url", precomputed_dfreq=all_counts
        ).select("url", "text_clean", "n_dropped")
        survivors = (
            survivors.drop("text")
            .join(cleaned, "url")
            .withColumnRenamed("text_clean", "text")
            .withColumnRenamed("n_dropped", "n_boilerplate_chunks")
        )
    if args.blocklist:
        from readability_ex_spark.operators.wordlist import wordlist_hits

        words = tuple(
            w.strip() for w in args.blocklist.split(",") if w.strip()
        )
        flagged = wordlist_hits(survivors, words=words, id_col="url")
        survivors = survivors.join(
            flagged.filter("flagged").select("url"), "url", "left_anti"
        )
    if args.drop_substring_dups:
        from readability_ex_spark.operators.substrdedup import (
            substring_dedup,
        )

        cleaned = substring_dedup(
            survivors,
            id_col="url",
            skew_safe=not args.substring_window_plan,
        ).select("url", "text_clean", "n_dup_tokens")
        survivors = (
            survivors.drop("text")
            .join(cleaned, "url")
            .withColumnRenamed("text_clean", "text")
            .withColumnRenamed("n_dup_tokens", "n_substr_dup_tokens")
        )
    corpus = with_quality_signals(survivors)
    if args.emb_near_dup is not None:
        # drops derivation + verdict anti-join both reference corpus —
        # cut the plan tree once (CLAUDE.md tree-plan rule)
        corpus = corpus.localCheckpoint(eager=False)
        drops = embedding_dedup_drops(corpus, args.emb_near_dup)
        corpus = corpus.join(drops, "url", "left_anti")
    sem_cents = None
    sem_cents_loaded = False
    if args.semantic_dedup is not None:
        # up to three references below (centroid-training collect,
        # scoring scan, anti-join) — checkpoint so the composed
        # upstream runs once
        corpus = corpus.localCheckpoint(eager=False)
        from readability_ex_spark.operators.corpus import (
            semantic_dedup_drops,
            train_text_centroids,
        )

        # the centroid model has the _lm_vocab lifecycle: estimated on
        # a full build, persisted as _sem_centroids, loaded by updates
        # (every batch must cluster in the SAME semantic space), and
        # bootstrapped from the EXISTING corpus on the first update of
        # a pre-model corpus
        sem_cents_loaded = args.update and sidecar_exists(
            args.output, "_sem_centroids"
        )
        if sem_cents_loaded:
            rows = load_sidecar(spark, args.output, "_sem_centroids").collect()
            sem_cents = [
                list(r.centroid) for r in sorted(rows, key=lambda r: r.cell)
            ]
            print("sem_centroids=loaded")
        elif args.update:
            sem_cents = train_text_centroids(spark.read.parquet(args.output))
            print("sem_centroids=bootstrapped")
        else:
            sem_cents = train_text_centroids(corpus)
            print("sem_centroids=estimated")
        if sem_cents is not None:
            sem_drops = semantic_dedup_drops(
                corpus, args.semantic_dedup, centroids=sem_cents
            )
            corpus = corpus.join(sem_drops, "url", "left_anti")
    if args.min_quality > 0:
        corpus = corpus.filter(F.col("quality_score") >= args.min_quality)
    lm_vocab_df = None
    lm_bigrams_df = None
    lm_bigrams_loaded = False
    if args.min_lm_logprob is not None or args.lm_bands:
        from readability_ex_spark.operators.lmquality import (
            bigram_logprob,
            bigram_vocab,
            unigram_logprob,
            unigram_vocab,
        )

        # the vocab is the amortizable half: a full build estimates it
        # from its own corpus and persists it as {output}/_lm_vocab; an
        # --update scores the BATCH against the existing corpus's model
        # (the statistics the kept corpus was filtered by) instead of
        # re-counting the world per batch
        lm_vocab_loaded = args.update and sidecar_exists(
            args.output, "_lm_vocab"
        )
        if lm_vocab_loaded:
            lm_vocab_df = load_sidecar(spark, args.output, "_lm_vocab")
            print("lm_vocab=loaded")
        elif args.update:
            # first update of a pre-model corpus: estimate from the
            # EXISTING corpus's text (the statistics its floor should
            # have been governed by), not the batch — a batch-only
            # model would be a partial artifact later updates silently
            # trust (same migration rule as _bands / _chunk_df)
            lm_vocab_df = unigram_vocab(
                spark.read.parquet(args.output), text_col="text"
            )
            print("lm_vocab=bootstrapped")
        else:
            lm_vocab_df = unigram_vocab(corpus, text_col="text")
            print("lm_vocab=estimated")
        if args.lm_order == 2:
            # second-order model: same sidecar lifecycle for the pair
            # table (_lm_bigrams), scored by the interpolated bigram LM
            lm_bigrams_loaded = args.update and sidecar_exists(
                args.output, "_lm_bigrams"
            )
            if lm_bigrams_loaded:
                lm_bigrams_df = load_sidecar(spark, args.output, "_lm_bigrams")
                print("lm_bigrams=loaded")
            elif args.update:
                lm_bigrams_df = bigram_vocab(
                    spark.read.parquet(args.output), text_col="text"
                )
                print("lm_bigrams=bootstrapped")
            else:
                lm_bigrams_df = bigram_vocab(corpus, text_col="text")
                print("lm_bigrams=estimated")
            lm = bigram_logprob(
                corpus, id_col="url", vocab=lm_vocab_df,
                bigrams=lm_bigrams_df,
            ).withColumnRenamed("lm2_logprob", "lm_logprob")
        else:
            lm_bigrams_df = None
            lm = unigram_logprob(corpus, id_col="url", vocab=lm_vocab_df)
        if args.min_lm_logprob is not None:
            corpus = corpus.join(
                lm.filter(
                    F.col("lm_logprob") >= args.min_lm_logprob
                ).select("url"),
                "url",
                "left_semi",
            )
        if args.lm_bands:
            # CCNet head/middle/tail annotation via the SCALABLE
            # percentile-threshold path (broadcast cuts + codegen CASE;
            # the exact ntile would funnel a dominant language through
            # one window task). Scoring + thresholds + assignment all
            # reference the corpus — checkpoint once (plans are trees).
            from readability_ex_spark.operators.lmquality import (
                assign_lm_buckets,
                lm_bucket_thresholds,
            )

            corpus = corpus.localCheckpoint(eager=False)
            if args.lm_order == 2:
                scored = bigram_logprob(
                    corpus, id_col="url", vocab=lm_vocab_df,
                    bigrams=lm_bigrams_df,
                ).withColumnRenamed("lm2_logprob", "lm_logprob")
            else:
                scored = unigram_logprob(
                    corpus, id_col="url", vocab=lm_vocab_df
                )
            scored = scored.join(corpus.select("url", "lang"), "url")
            cuts = lm_bucket_thresholds(scored, n_buckets=args.lm_bands)
            corpus = corpus.join(
                assign_lm_buckets(
                    scored, cuts, n_buckets=args.lm_bands
                ).select("url", "lm_bucket"),
                "url",
            )
    if args.clf_model:
        # trained-classifier floor (fastText/CCNet practice): the model
        # is a bounded driver-side load, scoring is the one-pass
        # broadcast plan of qualityclf.with_quality_scores
        from readability_ex_spark.operators.qualityclf import (
            load_model,
            with_quality_scores,
        )

        clf = load_model(spark, args.clf_model)
        # scoring + verdict reference the corpus twice — checkpoint so
        # the upstream pipeline is not re-derived (plans are trees)
        corpus = corpus.localCheckpoint(eager=False)
        corpus = corpus.join(
            with_quality_scores(corpus, clf, id_col="url")
            .filter(F.col("clf_score") >= args.clf_floor)
            .select("url"),
            "url",
            "left_semi",
        )
    if args.dsir_target:
        from readability_ex_spark.operators.lmquality import dsir_weights

        target_df = spark.read.parquet(args.dsir_target)
        # like the LM floor: the stage references the corpus three
        # times (self model, scoring, verdict target) — checkpoint once
        corpus = corpus.localCheckpoint(eager=False)
        dw = dsir_weights(corpus, target_df, id_col="url")
        corpus = corpus.join(
            dw.filter(
                F.col("dsir_weight") >= args.min_dsir_weight
            ).select("url"),
            "url",
            "left_semi",
        )
    if args.max_per_domain is not None:
        from readability_ex_spark.operators.relational import top_k_per_key
        from readability_ex_spark.operators.urlops import host_expr

        corpus = (
            top_k_per_key(
                corpus.withColumn("_domain", host_expr("url")),
                ["_domain"],
                [F.col("quality_score").desc(), F.col("url").asc()],
                args.max_per_domain,
            )
            .drop("_domain", "rk")
        )
    if args.mixture:
        from readability_ex_spark.operators.sampling import mixture_sample

        weights = {}
        for part in args.mixture.split(","):
            lang_tag, w = part.split("=")
            weights[lang_tag.strip()] = float(w)
        corpus = mixture_sample(
            corpus,
            weights,
            stratum_col="lang",
            id_col="url",
            weight_col="n_tokens" if args.mix_by_tokens else None,
        )
    if args.shard_tokens is not None:
        from readability_ex_spark.operators.sampling import shard_assign

        corpus = shard_assign(
            corpus, args.shard_tokens, stratum_col="lang", id_col="url"
        )
    # per-rule kill-rate accounting: one extra aggregation per rule
    # stage (a single summary row each), written as the _quality_stats
    # artifact — the number an operator tuning thresholds actually needs
    kill_stats: dict[str, int] = {}

    def _rule_counts(annotated, prefix):
        rule_cols = [c for c in annotated.columns if c.startswith("r_")]
        if "passes_quality" in annotated.columns:
            rule_cols.append("passes_quality")
        row = annotated.agg(
            F.count("*").alias("n"),
            *[
                F.sum(F.col(c).cast("long")).alias(c)
                for c in rule_cols
            ],
        ).collect()[0]
        kill_stats[f"{prefix}_n_in"] = row["n"]
        for c in rule_cols:
            name = c[2:] if c.startswith("r_") else c
            kill_stats[f"{prefix}_pass_{name}"] = row[c] or 0

    if args.quality_rules:
        cols = corpus.columns
        annotated = with_quality_rules(corpus)
        _rule_counts(annotated, "quality")
        corpus = annotated.filter(F.col("passes_quality")).select(*cols)
    if args.repetition_rules:
        from readability_ex_spark.operators.corpus import repetition_stats

        rep = repetition_stats(corpus, id_col="url")
        _rule_counts(rep, "repetition")
        rep_ok = rep.filter(
            F.col("r_top2gram") & F.col("r_top3gram") & F.col("r_dup6gram")
        )
        corpus = corpus.join(rep_ok.select("url"), "url", "left_semi")
    had_bands = sidecar_exists(args.output, "_bands")
    if args.update_emb_near_dup is not None:
        args.emb_sigs = True  # the drop path keeps its own index fresh
    had_emb_sigs = sidecar_exists(args.output, "_emb_sigs")
    if args.update and args.emb_sigs and had_emb_sigs:
        from readability_ex_spark.operators.embedding import EMB_SIG_RULE
        from readability_ex_spark.sidecars import read_sidecar_params

        _rec = read_sidecar_params(args.output).get("emb_sig_rule")
        if _rec != EMB_SIG_RULE:
            raise SystemExit(
                "refusing to extend/use _emb_sigs: the existing index "
                f"records signature rule {_rec!r} but this build would "
                f"write {EMB_SIG_RULE!r} — mixed schemes in one index "
                "are incomparable; delete the _emb_sigs directory to "
                "rebuild it in full under the current rule"
            )
    if args.update:
        # incremental mode: the batch-composed corpus anti-joins what the
        # existing output already covers (same url: the existing
        # canonical wins — corpus stability outranks recency; same
        # fingerprint: cross-batch exact dup). Only the delta appends.
        # Kept urls/fingerprints are unique by construction (exact
        # collapse + every prior delta anti-joined on both), so the
        # column-pruned key scans need no distinct — the existing
        # corpus's text column is never read on this path.
        existing = spark.read.parquet(args.output)
        # split-column symmetry: appending split-less rows to a split
        # corpus (or vice versa) would leave NULL bands parquet schema
        # merge silently fills in — refuse instead
        if (split_fracs is not None) != ("split" in existing.columns):
            raise SystemExit(
                "--split must match the existing corpus: it was built "
                + ("without" if "split" not in existing.columns else "with")
                + " a split column"
            )
        if split_fracs is not None:
            # ...and under the SAME fractions: bands assigned under a
            # different threshold would mix [0,v1) and [0,v2) test
            # membership across batches — exactly the cross-batch eval
            # contamination the symmetry guard above refuses
            from readability_ex_spark.sidecars import read_sidecar_params

            recorded = read_sidecar_params(args.output).get("split")
            if recorded is None:
                raise SystemExit(
                    "--split update refused: the existing corpus does "
                    "not record its split fractions in _sidecars.json "
                    "(built by an older version?); rebuild, or restore "
                    "the manifest"
                )
            if tuple(recorded) != split_fracs:
                raise SystemExit(
                    "--split must match the existing corpus's recorded "
                    f"fractions {tuple(recorded)}; got {split_fracs} — "
                    "a url's split band would change across batches"
                )
        # Self-heal before extending: the artifact appends of an update
        # (corpus, then each sidecar) are not atomic — a crash between
        # them leaves corpus rows the sidecars never learned about, and
        # every later update would silently trust the incomplete
        # sidecars. One shared repair pass (sidecars.heal_sidecars)
        # re-derives missing keyed rows from the written corpus alone:
        # a corpus row was keep=True with itself as canonical by
        # construction, and its bands recompute from its text.
        from readability_ex_spark.operators.textops import band_index
        from readability_ex_spark.sidecars import (
            SidecarSpec,
            heal_sidecars,
        )

        def _manifest_rows(corpus_df, orphan_keys):
            return corpus_df.select(
                "url", "fingerprint", "n_copies"
            ).join(orphan_keys, "url", "left_semi").select(
                "url",
                "fingerprint",
                "n_copies",
                F.col("url").alias("canonical_url"),
                F.lit(True).alias("keep"),
            )

        def _band_rows(corpus_df, orphan_keys):
            return band_index(
                corpus_df.select("url", "text").join(
                    orphan_keys, "url", "left_semi"
                ),
                id_col="url",
            )

        repaired = heal_sidecars(
            spark,
            args.output,
            existing,
            [
                SidecarSpec("_manifest", "url", _manifest_rows),
                SidecarSpec("_bands", "url", _band_rows),
                SidecarSpec("_emb_sigs", "url", _emb_sig_rows),
            ],
        )
        for _name, _n in repaired.items():
            if _n:
                print(f"{_name.lstrip('_')}_repaired={_n}")
        corpus = corpus.join(
            existing.select("url"), "url", "left_anti"
        ).join(
            existing.select("fingerprint"),
            "fingerprint",
            "left_anti",
        )
        if args.update_near_dup is not None:
            from readability_ex_spark.operators.textops import (
                cross_near_dup_matches,
            )

            # the persisted band index (written by the full build and
            # extended by every update) replaces the per-update
            # re-banding of the whole existing corpus; existing text is
            # then only read for band-collision candidates. A corpus
            # built before the artifact existed falls back to inline
            # banding once — the delta append below starts the index.
            existing_bands = (
                load_sidecar(spark, args.output, "_bands")
            )
            # url_bucket is the corpus's storage partition column —
            # passing its derivation lets the verify read partition-
            # prune to candidate buckets only
            nd_drops = cross_near_dup_matches(
                corpus.select("url", "text"),
                existing.select("url", "text", "url_bucket"),
                id_col="url",
                threshold=args.update_near_dup,
                existing_bands=existing_bands,
                existing_partition_col="url_bucket",
                partition_of=lambda c: F.pmod(F.xxhash64(c), F.lit(64)).cast(
                    "int"
                ),
            )
            corpus = corpus.join(nd_drops, "url", "left_anti")
        if args.update_emb_near_dup is not None:
            from readability_ex_spark.operators.embedding import (
                TEXT_EMB_DIM,
                TEXT_EMB_ND_K,
                TEXT_EMB_ND_TABLES,
                nonzero_embeddings,
                text_embedding,
            )
            from readability_ex_spark.operators.similarity import (
                cross_emb_near_dup_matches,
            )

            # the persisted signature index (written by the full build,
            # extended by every update) replaces re-embedding the whole
            # existing corpus; existing text is then only embedded for
            # signature-collision verify CANDIDATES (the left-semi
            # prune pushes below the embedding projection). A corpus
            # built before the artifact existed falls back to inline
            # coding once — the write below starts the index.
            _esigs = load_sidecar(spark, args.output, "_emb_sigs")
            if _esigs is not None:
                _esigs = _esigs.filter(
                    F.col("cs").isNotNull()
                ).select(F.col("url").alias("vec_id"), "cs", "sig")
            _bemb = nonzero_embeddings(
                text_embedding(corpus.select("url", "text"), id_col="url")
            ).select(F.col("url").alias("vec_id"), "embedding")
            _eemb = nonzero_embeddings(
                text_embedding(
                    existing.select("url", "text"), id_col="url"
                )
            ).select(F.col("url").alias("vec_id"), "embedding")
            emb_drops = cross_emb_near_dup_matches(
                _bemb,
                _eemb,
                threshold=args.update_emb_near_dup,
                dim=TEXT_EMB_DIM,
                k_planes=TEXT_EMB_ND_K,
                n_tables=TEXT_EMB_ND_TABLES,
                existing_sigs=_esigs,
            ).select(F.col("vec_id").alias("url"))
            corpus = corpus.join(emb_drops, "url", "left_anti")
        # the delta must be materialized BEFORE the append below starts
        # overwriting the directory it was derived from
        corpus = corpus.localCheckpoint(eager=True)
        manifest = manifest.join(
            load_sidecar(spark, args.output, "_manifest")
            .select("url")
            .distinct(),
            "url",
            "left_anti",
        ).localCheckpoint(eager=True)
        write_mode = "append"
    else:
        # overwrite: a fresh corpus build is a whole-batch artifact —
        # append-mode reruns (e.g. after a partial failure) would
        # silently duplicate every row; deterministic kernel + overwrite
        # make reruns idempotent
        write_mode = "overwrite"
    if split_fracs is not None:
        from readability_ex_spark.operators.sampling import corpus_split

        # pure function of the url — codegen, growth-stable under
        # --update (the band thresholds ride in the datacard stages)
        corpus = corpus_split(
            corpus,
            val_frac=split_fracs[0],
            test_frac=split_fracs[1],
            id_col="url",
        )
    corpus = corpus.withColumn(
        "url_bucket", F.pmod(F.xxhash64("url"), F.lit(64)).cast("int")
    )
    if args.update:
        # schema symmetry for the WHOLE row, not just the flag-guarded
        # columns: appending part-files with different columns (a stage
        # flag changed, or the code version added a kernel column)
        # makes reads of the mixed directory nondeterministic — the
        # parquet footer that wins file-listing order decides which
        # columns exist. Refuse instead. The guard's OWN read must be
        # schema-merged, or on a corpus already mixed by a pre-guard
        # code version it would compare against whichever footer wins
        # listing order — the union of columns is the deterministic
        # comparison target.
        existing_cols = set(
            spark.read.option("mergeSchema", "true")
            .parquet(args.output)
            .columns
        )
        new_cols = set(corpus.columns)
        if new_cols != existing_cols:
            raise SystemExit(
                "--update refused: appended schema would not match the "
                f"existing corpus (missing: {sorted(existing_cols - new_cols)}; "
                f"extra: {sorted(new_cols - existing_cols)}). Re-run with "
                "the stage flags the corpus was built with (see the "
                "_datacard stages), or rebuild without --update to "
                "migrate it to this code version's schema."
            )
    from readability_ex_spark.sinks import with_url_bloom

    # url bloom filters: the bucket layout hash-scatters urls, so
    # min/max stats never prune a point lookup — the bloom is the only
    # row-group pruner the update verify reads / url audits can use
    with_url_bloom(corpus.write).partitionBy("url_bucket").mode(
        write_mode
    ).parquet(args.output)
    if args.drop_boilerplate and not args.update:
        # promote the staged pre-verdict chunk counts into the output
        # dir now that the overwrite is done. NOTE: shutil (like the
        # Path-based sidecar_exists checks) only works on a LOCAL
        # --output path — the sandbox's deployment shape; an object-
        # store/HDFS deployment must swap these filesystem calls for
        # the Hadoop FileSystem API (one seam: sidecars.py + this
        # block), same caveat as compact_corpus.py's rename swap
        import shutil

        shutil.move(chunk_df_staging, chunk_df_path)
    # the dedup audit trail: every extracted url's keep decision
    write_sidecar(manifest, args.output, "_manifest", mode=write_mode)
    if hostrank_df is not None:
        # batch-scope host PageRank behind --host-rank-floor (the rank
        # table the floor was cut against, for audit/reuse)
        write_sidecar(hostrank_df, args.output, "_hostrank")
    if not args.no_near_dup:
        # persist/extend the banded-LSH index of the kept corpus so the
        # NEXT --update equality-joins stored blocks instead of
        # re-banding the world (~40 bytes x b per doc). An update on a
        # corpus whose index already exists appends only the
        # checkpointed delta's blocks; a full build — or the FIRST
        # update of a pre-index corpus (appending just the delta there
        # would leave a silently partial index that later updates would
        # trust) — bands the entire written output once, the one-time
        # migration cost
        from readability_ex_spark.operators.textops import band_index

        if args.update and had_bands:
            write_sidecar(
                band_index(corpus, id_col="url"),
                args.output,
                "_bands",
                mode="append",
            )
            print("band_index=appended")
        else:
            write_sidecar(
                band_index(spark.read.parquet(args.output), id_col="url"),
                args.output,
                "_bands",
            )
            print("band_index=rebuilt")
    if args.emb_sigs:
        # same persist/extend/migrate contract as _bands, in embedding
        # space: append only the checkpointed delta's signatures when
        # the index already exists; otherwise (full build, or the first
        # update of a pre-index corpus) sign the entire written output
        # once
        if args.update and had_emb_sigs:
            write_sidecar(
                _emb_sig_rows(corpus),
                args.output,
                "_emb_sigs",
                mode="append",
            )
            print("emb_sigs=appended")
        else:
            write_sidecar(
                _emb_sig_rows(spark.read.parquet(args.output)),
                args.output,
                "_emb_sigs",
            )
            print("emb_sigs=rebuilt")
    if contamination_rep_df is not None:
        write_sidecar(contamination_rep_df, args.output, "_contamination")
        print("contamination_report=written")
    if args.pack_seq_len is not None:
        # derived sidecar, rebuilt from the SHIPPED corpus every run
        # (update mode shifts downstream offsets, so incremental
        # maintenance buys nothing): a key-column scan — url/lang/
        # n_tokens(/shard_id) only, text never read
        from readability_ex_spark.operators.sampling import pack_sequences

        key_cols = ["url", "lang", "n_tokens"] + (
            ["shard_id"] if args.shard_tokens is not None else []
        )
        shipped = spark.read.parquet(args.output).select(*key_cols)
        seqs = pack_sequences(
            shipped,
            args.pack_seq_len,
            stratum_col="lang",
            id_col="url",
            shard_col="shard_id" if args.shard_tokens is not None else None,
        )
        write_sidecar(seqs, args.output, "_sequences")
        print("sequences=packed")
    if chunk_params is not None:
        # derived sidecar like _sequences, rebuilt from the SHIPPED
        # corpus (url + text scan; document-local, zero shuffles)
        from readability_ex_spark.operators.retrieval import chunk_documents

        write_sidecar(
            chunk_documents(
                spark.read.parquet(args.output).select("url", "text"),
                size=chunk_params[0],
                stride=chunk_params[1],
                id_col="url",
            ),
            args.output,
            "_chunks",
        )
        print("chunks=indexed")
    if lm_vocab_df is not None and not lm_vocab_loaded:
        # persist the model the corpus was filtered by (tiny: V+1 rows)
        # so later --update batches score against it without a
        # corpus-wide token count
        write_sidecar(lm_vocab_df.coalesce(1), args.output, "_lm_vocab")
    if lm_bigrams_df is not None and not lm_bigrams_loaded:
        # the second-order half of the model (top-B pair counts)
        write_sidecar(lm_bigrams_df.coalesce(1), args.output, "_lm_bigrams")
    if sem_cents is not None and not sem_cents_loaded:
        # the semantic-dedup centroid model (n_cells rows)
        write_sidecar(
            spark.createDataFrame(
                [(i, c) for i, c in enumerate(sem_cents)],
                "cell int, centroid array<double>",
            ).coalesce(1),
            args.output,
            "_sem_centroids",
        )
    if kill_stats:
        write_sidecar(
            spark.createDataFrame(
                [tuple(kill_stats.values())],
                schema=", ".join(f"`{k}` long" for k in kill_stats),
            ).coalesce(1),
            args.output,
            "_quality_stats",
        )

    n_docs = spark.read.parquet(args.output).count()
    n_in = manifest.count()
    if args.export_jsonl:
        from readability_ex_spark.sinks import write_jsonl

        cols = ("url", "text", "lang") + (
            ("shard_id",) if args.shard_tokens is not None else ()
        )
        write_jsonl(
            spark.read.parquet(args.output), args.export_jsonl, columns=cols
        )
    # dataset card: per-language rollup + the exact stage configuration
    # that produced the corpus — the provenance record a downstream
    # trainer (or an auditor) reads first. One bounded collect
    # (#languages rows); rewritten whole on every run including
    # updates, since it describes the corpus as it now stands.
    final = spark.read.parquet(args.output)
    lang_rows = (
        final.groupBy("lang")
        .agg(
            F.count("*").alias("docs"),
            F.sum("n_tokens").alias("tokens"),
            F.round(F.avg("quality_score"), 6).alias("mean_quality"),
            F.round(F.percentile("quality_score", F.lit(0.5)), 6).alias(
                "p50_quality"
            ),
            F.round(F.percentile("quality_score", F.lit(0.9)), 6).alias(
                "p90_quality"
            ),
        )
        .orderBy("lang")
        .collect()
    )
    card = {
        "docs": n_docs,
        "extracted_ok": n_in,
        "languages": {
            (r.lang or ""): {
                "docs": r.docs,
                "tokens": int(r.tokens or 0),
                "mean_quality": r.mean_quality,
                "p50_quality": r.p50_quality,
                "p90_quality": r.p90_quality,
            }
            for r in lang_rows
        },
        "stages": {
            k: v
            for k, v in sorted(vars(args).items())
            if v not in (None, False) and k not in ("input", "output")
        },
    }
    if split_fracs is not None:
        # per-split doc counts (one 3-row agg) — the sanity number a
        # trainer checks against the requested fractions
        card["splits"] = {
            r.split: r.c
            for r in final.groupBy("split")
            .agg(F.count("*").alias("c"))
            .collect()
        }
    card_dir = Path(args.output) / "_datacard"
    card_dir.mkdir(parents=True, exist_ok=True)
    (card_dir / "datacard.json").write_text(
        json.dumps(card, indent=1, sort_keys=True)
    )
    if args.checksums:
        # shard-integrity rollup over the corpus AS WRITTEN (the final
        # read-back), keyed by the storage partition column so each
        # row checksums one physical shard; rewritten whole every run
        # like the datacard — it describes the output as it now stands
        from readability_ex_spark.operators.textops import (
            corpus_checksums,
        )

        write_sidecar(
            corpus_checksums(
                final,
                id_col="url",
                text_col="text",
                bucket_expr=F.col("url_bucket"),
            ).withColumnRenamed("bucket", "url_bucket"),
            args.output,
            "_checksums",
        )
    # versioned sidecar manifest: what this corpus carries, written by
    # which lifecycle version — the check a future layout change needs
    _params: dict = {}
    if split_fracs is not None:
        _params["split"] = list(split_fracs)
    if args.checksums:
        # pin WHICH hash rule wrote _checksums, so consumers
        # (compact_corpus --verify-checksums, corpus_diff) can refuse
        # cross-rule comparisons instead of reporting phantom drift
        from readability_ex_spark.operators.textops import (
            CONTENT_HASH_RULE,
        )

        _params["checksum_rule"] = CONTENT_HASH_RULE
    if args.emb_sigs:
        # pin WHICH banding/signature scheme wrote _emb_sigs: an update
        # appending codes computed under different constants would mix
        # incomparable signatures in one index (same posture as
        # checksum_rule)
        from readability_ex_spark.operators.embedding import EMB_SIG_RULE

        _params["emb_sig_rule"] = EMB_SIG_RULE
    record_sidecars(
        args.output,
        params=_params or None,
        names=[
            n
            for n in (
                "_manifest",
                "_bands",
                "_emb_sigs",
                "_chunk_df",
                "_lm_vocab",
                "_lm_bigrams",
                "_sem_centroids",
                "_quality_stats",
                "_sequences",
                "_chunks",
                "_contamination",
                "_hostrank",
                "_datacard",
                "_checksums",
            )
            if sidecar_exists(args.output, n)
        ],
    )
    print(f"corpus_docs={n_docs} extracted_ok={n_in}")
    extracted.unpersist()
    manifest.unpersist()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
