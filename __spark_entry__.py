"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship extraction pipeline on sf0.001;
``queries()`` / ``oracle_sql()`` expose one entry per implemented
operator from SURVEY.md §2.B plus the training-data operator family
(dedup, similarity, text analysis, multimodal plumbing).
"""

from __future__ import annotations

import sys
from collections.abc import Callable
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession

_REPO = Path(__file__).resolve().parent
if str(_REPO) not in sys.path:
    sys.path.insert(0, str(_REPO))

from readability_ex_spark.operators import clusters as C  # noqa: E402
from readability_ex_spark.operators import embedding as E  # noqa: E402
from readability_ex_spark.operators.multimodal import (  # noqa: E402
    q_multimodal_dedup as _q_multimodal_dedup,
)
from readability_ex_spark.operators import corpus as CO  # noqa: E402
from readability_ex_spark.operators import decontam as DC  # noqa: E402
from readability_ex_spark.operators import pii as PII  # noqa: E402
from readability_ex_spark.operators import relational as R  # noqa: E402
from readability_ex_spark.operators import retrieval as RT  # noqa: E402
from readability_ex_spark.operators import sampling as SA  # noqa: E402
from readability_ex_spark.operators import similarity as S  # noqa: E402
from readability_ex_spark.operators import spanops as SP  # noqa: E402
from readability_ex_spark.operators import substrdedup as SD  # noqa: E402
from readability_ex_spark.operators import textops as T  # noqa: E402
from readability_ex_spark.operators import bpe as BP  # noqa: E402
from readability_ex_spark.operators import linkgraph as LG  # noqa: E402
from readability_ex_spark.operators import lmquality as LM  # noqa: E402
from readability_ex_spark.operators import policyops as PO  # noqa: E402
from readability_ex_spark.operators import qualityclf as QC  # noqa: E402
from readability_ex_spark.operators import robotstxt as RB  # noqa: E402
from readability_ex_spark.operators import urlops as U  # noqa: E402
from readability_ex_spark.operators import wordlist as WL  # noqa: E402
from readability_ex_spark.streaming.sessions import (  # noqa: E402
    q_session_window_stats as _q_session_window_stats,
)


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: synthesize a web-page table from sf0.001 documents and
    run the full readability extraction pipeline (mapInPandas kernel)."""
    from readability_ex_spark.pipeline import flagship_extract

    return flagship_extract(spark, "/root/testdata/sf0.001")


def _rotate_by_driver_history(
    registry: dict[str, Callable[[SparkSession, str], DataFrame]],
) -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """Order the registry least-recently-driver-checked FIRST.

    The per-round driver check covers only the first 50 entries, so the
    window must rotate to keep the whole surface under its eye (VERDICT
    r5 #1). Instead of hand-reordering each round, read the repo's own
    ``CORRECTNESS_r*.json`` artifacts: an entry's key is (last round it
    had a driver row, registry position) — never-checked entries lead
    in registry order, then the stalest, so no query can go unchecked
    for two rounds while any other was checked twice. Deterministic
    (pure function of the committed artifacts) and self-maintaining.
    """
    import json
    import re

    last: dict[str, int] = {}
    try:
        for p in _REPO.glob("CORRECTNESS_r*.json"):
            m = re.search(r"r(\d+)", p.name)
            if not m:
                continue
            rnd = int(m.group(1))
            try:
                data = json.loads(p.read_text())
            except (OSError, ValueError):
                continue
            if not isinstance(data, dict):
                continue
            for name in data:
                if name in registry:
                    last[name] = max(last.get(name, -1), rnd)
    except OSError:
        return registry
    pos = {name: i for i, name in enumerate(registry)}
    ordered = sorted(registry, key=lambda n: (last.get(n, -1), pos[n]))
    return {name: registry[name] for name in ordered}


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """Ordered least-recently-driver-checked FIRST (see
    _rotate_by_driver_history): the per-round correctness check covers
    the first 50 entries, so entries without a recent driver row lead
    and last-round-green ones trail. The literal below is the registry
    (grouping is thematic); the returned dict is the rotated view."""
    registry = {
        # -- never / least-recently driver-checked (r5 window missed
        #    these; r4-green at best) --
        "extract_outlinks": LG.q_extract_outlinks,
        "host_graph": LG.q_host_graph,
        "host_pagerank": LG.q_host_pagerank,
        "extract_anchors": LG.q_extract_anchors,
        "anchor_index": LG.q_anchor_index,
        "host_components": LG.q_host_components,
        "robots_parse": RB.q_robots_parse,
        "robots_verdict": RB.q_robots_verdict,
        "robots_sitemaps": RB.q_robots_sitemaps,
        "quality_classifier": QC.q_quality_classifier,
        "lm_buckets": LM.q_lm_buckets,
        "pack_sequences": SA.q_pack_sequences,
        "mixture_sample_tokens": SA.q_mixture_sample_tokens,
        "session_window_stats": _q_session_window_stats,
        "contamination_report": DC.q_contamination_report,
        "policy_filter": PO.q_policy_filter,
        "bpe_tokenize": BP.q_bpe_tokenize,
        "top_ngrams": T.q_top_ngrams,
        "mixture_sample": SA.q_mixture_sample,
        "shard_assign": SA.q_shard_assign,
        "ann_ivf_materialized": S.q_ann_ivf_materialized,
        "corpus_cardinality": T.q_corpus_cardinality,
        "stratified_sample": SA.q_stratified_sample,
        "token_budget_pack": SA.q_token_budget_pack,
        "text_embedding": E.q_text_embedding,
        "text_emb_near_dup": E.q_text_emb_near_dup,
        "cross_emb_near_dup": E.q_cross_emb_near_dup,
        "multimodal_meta": T.q_multimodal_meta,
        "multimodal_dedup": _q_multimodal_dedup,
        "ann_bruteforce": S.q_ann_bruteforce,
        "knn_label_pairs": S.q_knn_label_pairs,
        "ann_lsh": S.q_ann_lsh,
        "ann_lsh_topk": S.q_ann_lsh_topk,
        "ann_materialized_topk": S.q_ann_materialized_topk,
        "ann_batch_topk": S.q_ann_batch_topk,
        "emb_near_dup": S.q_emb_near_dup,
        "emb_near_dup_clusters": C.q_emb_near_dup_clusters,
        "ann_ivf_cells": S.q_ann_ivf_cells,
        "ann_ivf_topk": S.q_ann_ivf_topk,
        # new this round: quality-keeper manifest + per-lang quality
        # rollup (never driver-checked)
        "semantic_dedup": S.q_semantic_dedup,
        "bm25_topk": RT.q_bm25_topk,
        "corpus_split": SA.q_corpus_split,
        "recrawl_schedule": U.q_recrawl_schedule,
        "bigram_logprob": LM.q_bigram_logprob,
        "chunk_documents": RT.q_chunk_documents,
        "bm25_materialized": RT.q_bm25_materialized,
        "dedup_manifest_quality": C.q_dedup_manifest_quality,
        "lang_quality_quantiles": CO.q_lang_quality_quantiles,
        "page_inlinks": LG.q_page_inlinks,
        "crawl_frontier": U.q_crawl_frontier,
        "robots_crawl_delay": RB.q_robots_crawl_delay,
        "sitemap_urls": RB.q_sitemap_urls,
        "corpus_checksums": T.q_corpus_checksums,
        # -- r5-green, re-checked as window room allows --
        # relational pipeline operators (SURVEY.md §2.B)
        "filter_project": R.q_filter_project,
        "dedup_latest": R.q_dedup_latest,
        "agg_counters": R.q_agg_counters,
        "anti_join_resume": R.q_anti_join_resume,
        "semi_join": R.q_semi_join,
        "broadcast_join": R.q_broadcast_join,
        "part_brand_stats": R.q_part_brand_stats,
        "supplier_balance": R.q_supplier_balance,
        "topk_docs": R.q_topk_docs,
        "source_cap": R.q_source_cap,
        "source_stats": R.q_source_stats,
        "set_diff": R.q_set_diff,
        "events_window": R.q_events_window,
        "sessionize": R.q_sessionize,
        "events_props": R.q_events_props,
        "url_canonicalize": U.q_url_canonicalize,
        "canonical_dedup": U.q_canonical_dedup,
        # text analysis / training-data ops
        "token_count": T.q_token_count,
        "text_normalize": T.q_text_normalize,
        "bpe_token_count": T.q_bpe_token_count,
        "quality_score": T.q_quality_score,
        "quality_rules": CO.q_quality_rules,
        "unigram_logprob": LM.q_unigram_logprob,
        "dsir_weights": LM.q_dsir_weights,
        "wordlist_filter": WL.q_wordlist_filter,
        "repetition_stats": CO.q_repetition_stats,
        "lang_id": T.q_lang_id,
        "fingerprint": T.q_fingerprint,
        "winnow_fingerprint": T.q_winnow_fingerprint,
        "winnow_overlap": T.q_winnow_overlap,
        "exact_dedup": T.q_exact_dedup,
        "decontaminate": DC.q_decontaminate,
        "line_dedup": DC.q_line_dedup,
        "chunk_dedup_within": DC.q_chunk_dedup_within,
        "substring_dedup": SD.q_substring_dedup,
        "decontaminate_spans": DC.q_decontaminate_spans,
        "encoding_quality": T.q_encoding_quality,
        "pii_scrub": PII.q_pii_scrub,
        "spans_tiling": SP.q_spans_tiling,
        "minhash_sig": T.q_minhash_sig,
        "minhash_band_pairs": T.q_minhash_band_pairs,
        "simhash": T.q_simhash,
        "simhash64": T.q_simhash64,
        "simhash_near_dup": T.q_simhash_near_dup,
        "near_dup": T.q_near_dup,
        "cross_near_dup": T.q_cross_near_dup,
        "near_dup_clusters": C.q_near_dup_clusters,
        "dedup_manifest": C.q_dedup_manifest,
        "shingle_jaccard": T.q_shingle_jaccard,
        "corpus_stats": T.q_corpus_stats,
    }
    return _rotate_by_driver_history(registry)


def _lsh_ctes(sig, src: str = "documents") -> str:
    """Shared DuckDB CTEs mirroring textops.lsh_band_candidates exactly:
    b=N_LSH_BANDS bands × r=N_LSH_ROWS rows, band hash = md5 of the
    '|'-joined band signatures, buckets capped at MAX_BAND_BUCKET.
    ``src`` narrows the corpus (e.g. to exact-dup survivors)."""
    b, r, cap = T.N_LSH_BANDS, T.N_LSH_ROWS, T.MAX_BAND_BUCKET
    sig_cols = ", ".join(f"{sig(i)} AS sig{i}" for i in range(b * r))
    band_rows = " UNION ALL ".join(
        "SELECT doc_id, {j} AS band_id, md5({parts}) AS band_hash FROM s".format(
            j=j,
            parts=" || '|' || ".join(f"sig{j * r + k}" for k in range(r)),
        )
        for j in range(b)
    )
    return f"""s AS (SELECT doc_id, {sig_cols} FROM {src}),
            bands AS (
              SELECT * FROM ({band_rows}) WHERE band_hash IS NOT NULL),
            bounded AS (
              SELECT doc_id, band_id, band_hash FROM (
                SELECT *, count(*) OVER (PARTITION BY band_id, band_hash)
                       AS _n
                FROM bands)
              WHERE _n <= {cap})"""


def _winnow_ctes() -> str:
    """DuckDB CTEs mirroring textops.winnow_fingerprints exactly (md5
    token-k-gram rolling hashes, lexicographic window minima, distinct),
    ending in ``wfp(doc_id, fingerprint)`` — shared by the
    winnow_fingerprint and winnow_overlap oracles."""
    return f"""t AS (
              SELECT doc_id,
                     lower(regexp_replace(trim(text), '\\s+', ' ', 'g')) AS tx
              FROM documents),
            tk AS (
              SELECT doc_id,
                     CASE WHEN tx = '' THEN CAST([] AS VARCHAR[])
                          ELSE str_split(tx, ' ') END AS toks
              FROM t),
            g AS (
              SELECT doc_id,
                     CASE WHEN len(toks) >= {T.K_GRAM + T.WINNOW_WINDOW - 1}
                          THEN list_transform(
                            generate_series(1, len(toks) - {T.K_GRAM - 1}),
                            i -> md5(array_to_string(
                              list_slice(toks, i, i + {T.K_GRAM - 1}), ' ')))
                          ELSE CAST([] AS VARCHAR[]) END AS gr
              FROM tk),
            f AS (
              SELECT doc_id,
                     CASE WHEN len(gr) >= {T.WINNOW_WINDOW}
                          THEN list_distinct(list_transform(
                            generate_series(1, len(gr) - {T.WINNOW_WINDOW - 1}),
                            j -> list_aggregate(
                              list_slice(gr, j, j + {T.WINNOW_WINDOW - 1}),
                              'min')))
                          ELSE CAST([] AS VARCHAR[]) END AS fps
              FROM g),
            wfp AS (SELECT doc_id, unnest(fps) AS fingerprint FROM f)"""


def _near_dup_ctes(sig, toks: str, src: str = "documents") -> str:
    """LSH CTEs + candidate pairs + token-Jaccard verify, ending in
    ``p(doc_a, doc_b, jaccard)`` — mirrors textops.near_dup_verified_pairs
    (shared by the near_dup, near_dup_clusters, dedup_manifest oracles)."""
    return f"""{_lsh_ctes(sig, src)},
            cand AS (
              SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
              FROM bounded a JOIN bounded b
                ON a.band_id = b.band_id AND a.band_hash = b.band_hash
                AND a.doc_id < b.doc_id),
            t AS (
              SELECT doc_id,
                     CASE WHEN trim(text) = '' THEN CAST([] AS VARCHAR[])
                          ELSE list_distinct({toks}) END AS toks
              FROM documents),
            p AS (
              SELECT c.doc_a, c.doc_b,
                     round(CASE
                       WHEN len(list_distinct(ta.toks || tb.toks)) > 0
                       THEN len(list_intersect(ta.toks, tb.toks)) /
                            CAST(len(list_distinct(ta.toks || tb.toks)) AS DOUBLE)
                       ELSE 0.0 END, 6) AS jaccard
              FROM cand c
              JOIN t ta ON ta.doc_id = c.doc_a
              JOIN t tb ON tb.doc_id = c.doc_b)"""


def _cross_near_dup_sql(sig, toks: str) -> str:
    """DuckDB twin of textops.q_cross_near_dup: batch-vs-existing band
    blocks (bucket cap on the EXISTING side only, as the operator does),
    candidate equality join, shingle-Jaccard verify, distinct batch ids."""
    b, r, cap = T.N_LSH_BANDS, T.N_LSH_ROWS, T.MAX_BAND_BUCKET
    m, thr, w = T.CROSS_SPLIT_MOD, T.CROSS_NEAR_DUP_THRESHOLD, T.W_SHINGLE
    sig_cols = ", ".join(f"{sig(i)} AS sig{i}" for i in range(b * r))

    def band_rows(src: str) -> str:
        sep = " || '|' || "
        return " UNION ALL ".join(
            f"SELECT doc_id, {j} AS band_id, "
            f"md5({sep.join(f'sig{j * r + k}' for k in range(r))}) "
            f"AS band_hash FROM {src}"
            for j in range(b)
        )

    shingles = (
        f"CASE WHEN trim(text) = '' OR len({toks}) < {w} "
        "THEN CAST([] AS VARCHAR[]) "
        "ELSE list_distinct(list_transform("
        f"generate_series(1, len({toks}) - {w - 1}), "
        "i -> substr(md5(array_to_string("
        f"list_slice({toks}, i, i + {w - 1}), ' ')), 1, 16))) END"
    )
    return f"""
        WITH bsrc AS (
          SELECT doc_id, text FROM documents WHERE doc_id % {m} = 0),
        esrc AS (
          SELECT doc_id, text FROM documents WHERE doc_id % {m} <> 0),
        bs AS (SELECT doc_id, {sig_cols} FROM bsrc),
        es AS (SELECT doc_id, {sig_cols} FROM esrc),
        bbands AS (
          SELECT * FROM ({band_rows('bs')}) WHERE band_hash IS NOT NULL),
        ebands AS (
          SELECT * FROM ({band_rows('es')}) WHERE band_hash IS NOT NULL),
        ebounded AS (
          SELECT doc_id, band_id, band_hash FROM (
            SELECT *, count(*) OVER (PARTITION BY band_id, band_hash) AS _n
            FROM ebands)
          WHERE _n <= {cap}),
        cand AS (
          SELECT DISTINCT b.doc_id AS bid, e.doc_id AS eid
          FROM bbands b JOIN ebounded e
            ON b.band_id = e.band_id AND b.band_hash = e.band_hash),
        sh AS (SELECT doc_id, {shingles} AS sh FROM documents),
        v AS (
          SELECT c.bid FROM cand c
          JOIN sh sa ON sa.doc_id = c.bid
          JOIN sh se ON se.doc_id = c.eid
          WHERE CASE WHEN len(list_distinct(sa.sh || se.sh)) > 0
                THEN len(list_intersect(sa.sh, se.sh)) /
                     CAST(len(list_distinct(sa.sh || se.sh)) AS DOUBLE)
                ELSE 0.0 END >= {thr})
        SELECT DISTINCT bid AS doc_id FROM v ORDER BY doc_id
    """


def _simhash64_ctes(toks: str) -> str:
    """DuckDB CTE `sims` mirroring textops.simhash64: per-token 64-hex
    string md5(t)||md5('#'||t), bit g = sign of lsb-votes of digit g,
    packed into 4 × 16-bit bands."""

    def band(k: int) -> str:
        bits = " + ".join(
            "CASE WHEN list_aggregate(list_transform(hx, h -> "
            f"CASE WHEN strpos('13579bdf', substr(h, {k * 16 + i + 1}, 1)) > 0 "
            "THEN 1 ELSE -1 END), 'sum') > 0 "
            f"THEN {1 << i} ELSE 0 END"
            for i in range(16)
        )
        return f"CAST({bits} AS BIGINT) AS band{k}"

    bands = ", ".join(band(k) for k in range(T.N_SIMHASH64_BANDS))
    return f"""h AS (
              SELECT doc_id,
                     list_transform(
                       CASE WHEN trim(text) = '' THEN CAST([] AS VARCHAR[])
                            ELSE list_distinct({toks}) END,
                       t -> md5(t) || md5('#' || t)) AS hx
              FROM documents),
            sims AS (SELECT doc_id, {bands} FROM h)"""


def _sql_floats(vals) -> str:
    return "[" + ", ".join(repr(float(v)) for v in vals) + "]"


_HEX = "0123456789abcdef"


def _text_emb_ctes() -> str:
    """DuckDB CTEs mirroring embedding.text_embedding exactly: feature
    hashes = md5 of unigrams + adjacent bigrams, bucket = first 2 hex
    digits mod TEXT_EMB_DIM, sign = lsb of digit 3 — ending in
    ``tv(doc_id, bucket, val)`` (raw signed counts) and
    ``tn(doc_id, nrm)`` (L2 norms). Shared by the text_embedding and
    text_emb_near_dup oracles."""
    return f"""t AS (
              SELECT doc_id,
                     CASE WHEN trim(text) = '' THEN CAST([] AS VARCHAR[])
                          ELSE regexp_split_to_array(trim(text), '\\s+') END
                       AS toks
              FROM documents),
            fe AS (
              SELECT doc_id,
                     list_transform(toks, x -> md5(x)) ||
                     CASE WHEN len(toks) >= 2
                          THEN list_transform(
                            generate_series(1, len(toks) - 1),
                            i -> md5(toks[i] || ' ' || toks[i + 1]))
                          ELSE CAST([] AS VARCHAR[]) END AS hs
              FROM t),
            raw AS (SELECT doc_id, unnest(hs) AS h FROM fe),
            bv AS (
              SELECT doc_id,
                     (16 * (strpos('{_HEX}', substr(h, 1, 1)) - 1) +
                      (strpos('{_HEX}', substr(h, 2, 1)) - 1))
                       % {E.TEXT_EMB_DIM} AS bucket,
                     CASE WHEN strpos('13579bdf', substr(h, 3, 1)) > 0
                          THEN 1 ELSE -1 END AS sign
              FROM raw),
            tv AS (
              SELECT doc_id, bucket, CAST(sum(sign) AS DOUBLE) AS val
              FROM bv GROUP BY 1, 2),
            tn AS (
              SELECT doc_id, sqrt(sum(val * val)) AS nrm
              FROM tv GROUP BY 1)"""


def _banded_code_sql(emb_expr: str, t: int, total: int | None = None) -> str:
    """DuckDB expression for table ``t``'s sign-hash code, mirroring
    similarity.embedding_near_dup_banded: planes t*k..t*k+k-1 of one
    seeded stream, plane 0 of the table = MSB, component-sequential
    list_sum dots (the exact accumulation order of the Arrow UDF).
    ``total`` widens the generated plane stream for the prefilter
    signature's extra 8-bit groups (t >= n_tables); the stream is
    prefix-stable, so band codes are identical either way."""
    from readability_ex_spark.operators import embedding as _E

    k, n_tables = _E.TEXT_EMB_ND_K, _E.TEXT_EMB_ND_TABLES
    planes = S.hyperplanes(S.EMB_DIM, total or (k * n_tables), S.LSH_SEED)
    bits = " + ".join(
        f"CASE WHEN list_sum(list_transform(list_zip({emb_expr}, "
        f"{_sql_floats(planes[t * k + i])}), z -> z[1] * z[2])) >= 0 "
        f"THEN {1 << (k - 1 - i)} ELSE 0 END"
        for i in range(k)
    )
    return f"CAST({bits} AS BIGINT)"


def _lsh_bucket_sql(emb_expr: str, n_planes: int = S.N_PLANES) -> str:
    """DuckDB expression mirroring similarity.lsh_bucket: sign bit per
    inlined hyperplane, plane 0 = MSB."""
    planes = S.hyperplanes(S.EMB_DIM, n_planes, S.LSH_SEED)
    n = n_planes
    bits = " + ".join(
        f"CASE WHEN list_sum(list_transform(list_zip({emb_expr}, "
        f"{_sql_floats(p)}), z -> z[1] * z[2])) >= 0 "
        f"THEN {1 << (n - 1 - i)} ELSE 0 END"
        for i, p in enumerate(planes)
    )
    return f"CAST({bits} AS BIGINT)"


def _emb_nd_ctes() -> str:
    """CTEs mirroring similarity.embedding_near_dup: capped LSH buckets,
    Hamming<=1 candidate join, exact cosine — ending in
    ``p(vec_a, vec_b, cosine)`` (shared by emb_near_dup and
    emb_near_dup_clusters)."""
    return f"""b0 AS (
              SELECT vec_id, {_SQL_ED} AS ed,
                     {_lsh_bucket_sql(_SQL_ED)} AS bucket
              FROM embeddings),
            b AS (
              SELECT vec_id, ed, bucket FROM (
                SELECT *, count(*) OVER (PARTITION BY bucket) AS _n
                FROM b0)
              WHERE _n <= {S.EMB_MAX_BUCKET}),
            p AS (
              SELECT ce.vec_id AS vec_a, cq.vec_id AS vec_b,
                     round(
                       list_sum(list_transform(list_zip(ce.ed, cq.ed),
                                               z -> z[1] * z[2])) /
                       (sqrt(list_sum(list_transform(ce.ed, x -> x * x))) *
                        sqrt(list_sum(list_transform(cq.ed, x -> x * x)))),
                       6) AS cosine
              FROM b ce JOIN b cq
                ON ce.vec_id < cq.vec_id
                AND bit_count(xor(ce.bucket, cq.bucket)) <= 1)"""


_SQL_ED = "CAST(embedding AS DOUBLE[])"
_SQL_COS = """round(
          list_sum(list_transform(list_zip(ce.ed, cq.qd),
                                  z -> z[1] * z[2])) /
          (sqrt(list_sum(list_transform(ce.ed, x -> x * x))) *
           sqrt(list_sum(list_transform(cq.qd, x -> x * x)))), 6)"""


def _ivf_ctes() -> str:
    """DuckDB CTEs mirroring similarity's data-seeded IVF: centroids =
    L2-normalized embeddings of IVF_SEED_IDS, cell = argmin squared L2
    from the unit vector, ties to the lowest cell id."""
    lo, hi = min(S.IVF_SEED_IDS), max(S.IVF_SEED_IDS)
    return f"""cents AS (
              SELECT vec_id - {lo} AS cid,
                     list_transform({_SQL_ED}, x -> x /
                       greatest(sqrt(list_sum(list_transform({_SQL_ED},
                                y -> y * y))), 1e-12)) AS c
              FROM embeddings WHERE vec_id BETWEEN {lo} AND {hi}),
            units AS (
              SELECT vec_id, label, {_SQL_ED} AS ed,
                     list_transform({_SQL_ED}, x -> x /
                       sqrt(list_sum(list_transform({_SQL_ED},
                            y -> y * y)))) AS u
              FROM embeddings),
            dists AS (
              SELECT e.vec_id, e.label, e.ed, c.cid,
                     list_sum(list_transform(list_zip(e.u, c.c),
                              z -> (z[1] - z[2]) *
                                   (z[1] - z[2]))) AS d
              FROM units e CROSS JOIN cents c),
            assigned AS (
              SELECT vec_id, label, ed, cid AS cell FROM (
                SELECT *, row_number() OVER (
                  PARTITION BY vec_id ORDER BY d, cid) AS rn
                FROM dists)
              WHERE rn = 1)"""


# Shared CTE chain mirroring operators/urlops.py byte-for-byte: the
# deterministic synthetic url per doc_id, then the canonicalizer
# decomposed with regexp_extract + concat (no capture-group replacements
# — the one regex feature whose spelling differs between engines).
# the synthetic per-doc url derivation shared by the url/robots oracles
# (same arithmetic as operators/urlops.synth_url_expr)
_URLS_CTE = """
    urls AS (
      SELECT doc_id,
             CASE WHEN doc_id % 20 = 19
                  THEN 'urn:doc:' || CAST(doc_id AS VARCHAR)
                       || CASE WHEN doc_id % 2 = 0
                               THEN '#Section-2' ELSE '' END
                  ELSE 'HTTP://WWW.Site' || CAST(doc_id % 40 AS VARCHAR)
                       || '.Example.COM'
                       || CASE WHEN doc_id % 4 = 0 THEN ':80'
                               WHEN doc_id % 4 = 1 THEN ':8080'
                               ELSE '' END
                       || CASE WHEN doc_id % 5 = 0 THEN '/'
                               ELSE '/Articles/item-'
                                    || CAST(doc_id % 40 AS VARCHAR) END
                       || CASE WHEN doc_id % 3 = 0
                               THEN '?utm_source=feed&b='
                                    || CAST(doc_id % 2 AS VARCHAR)
                                    || '&A=1&fbclid=XYZ'
                               WHEN doc_id % 3 = 1
                               THEN '?UTM_CAMPAIGN=x&gclid=abc'
                               ELSE '' END
                       || CASE WHEN doc_id % 2 = 0
                               THEN '#Section-2' ELSE '' END
             END AS url
      FROM documents)
"""

# --- link-graph oracles (mirrors operators/linkgraph.py) ---------------
# host pattern shared by host_of() — userinfo and port stripped
_HOST_RE = r"^[A-Za-z][A-Za-z0-9+.-]*://(?:[^/?#@]*@)?([^/?#:]*)"

# anchor grammar (mirrors linkgraph._ANCHOR_DQ_RE), spelled for a
# DuckDB single-quoted string (backslashes are literal there)
_ANCHOR_RE_SQL = (
    r'(?i)<a\s[^>]*?href\s*=\s*"([^"]*)"[^>]*>([\s\S]*?)</a>'
)

# synthetic link page html (mirrors linkgraph.synth_link_html_expr),
# as a SELECT body over (urls u JOIN documents d)
_LINK_HTML_SQL = """
              '<html><body><p>doc</p>'
              || CASE WHEN d.doc_id % 7 = 5
                      THEN '<base href="https://based.example.org/dir/deep/">'
                      ELSE '' END
              || '<a href="HTTPS://Other'
              || CAST(d.doc_id % 9 AS VARCHAR)
              || '.Example.net/Lib/x">abs</a>'
              || CASE WHEN d.doc_id % 3 = 0
                      THEN '<A Href=''/Local/Page-'
                           || CAST(d.doc_id % 6 AS VARCHAR)
                           || '''>root</A>' ELSE '' END
              || CASE WHEN d.doc_id % 3 = 1
                      THEN '<a id="r" href="rel/item-'
                           || CAST(d.doc_id % 4 AS VARCHAR)
                           || '.html">rel</a>' ELSE '' END
              || CASE WHEN d.doc_id % 3 = 2
                      THEN '<a href="../up/'
                           || CAST(d.doc_id % 4 AS VARCHAR)
                           || '">up</a>' ELSE '' END
              || CASE WHEN d.doc_id % 4 = 0
                      THEN '<a href="//cdn.example.net/l">pp</a>'
                      ELSE '' END
              || CASE WHEN d.doc_id % 4 = 1
                      THEN '<a href="?Page=2">q</a>' ELSE '' END
              || CASE WHEN d.doc_id % 4 = 2
                      THEN '<a href="#frag">f</a>'
                           || '<a href="mailto:x@y.z">m</a>'
                      ELSE '' END
              || CASE WHEN d.doc_id % 4 = 3
                      THEN '<a href="javascript:void(0)">j</a>'
                      ELSE '' END
              || '</body></html>'
"""

# base-uri parts of the synthetic url (consumed by _resolve_case);
# prefix with the urls CTE and an lp CTE providing (doc_id, url, html).
# An absolute http(s) <base href> overrides the page url as the
# resolution base (mirrors linkgraph.effective_base)
_LINK_BASE_CTES = """
    lpb AS (
      SELECT *, regexp_extract(html,
        '(?i)<base\\s[^>]*?href\\s*=\\s*"([^"]*)"', 1) AS b0
      FROM lp),
    lp2 AS (
      SELECT * REPLACE (CASE WHEN regexp_matches(lower(b0), '^https?://')
                             THEN b0 ELSE url END AS url)
      FROM lpb),
    bp AS (
      SELECT *,
             regexp_extract(url,
               '^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*', 0) AS auth,
             lower(regexp_extract(url,
               '^([A-Za-z][A-Za-z0-9+.-]*)://', 1)) AS scheme
      FROM lp2),
    bp2 AS (
      SELECT *, regexp_extract(substring(url, length(auth) + 1),
                               '^[^?#]*', 0) AS path
      FROM bp),
    bp3 AS (
      SELECT *, CASE WHEN regexp_extract(path, '^.*/', 0) = ''
                     THEN '/'
                     ELSE regexp_extract(path, '^.*/', 0)
                END AS basedir
      FROM bp2)
"""


def _resolve_case(var: str) -> str:
    """The linkgraph.resolve_href CASE over a fragment-stripped href
    ``var``; expects auth/scheme/path/basedir columns in scope."""
    return f"""CASE
        WHEN {var} = '' THEN NULL
        WHEN regexp_matches(lower({var}), '^https?://') THEN {var}
        WHEN regexp_matches({var},
             '^[A-Za-z][A-Za-z0-9+.-]*:') THEN NULL
        WHEN auth = '' THEN NULL
        WHEN left({var}, 2) = '//' THEN scheme || ':' || {var}
        WHEN left({var}, 1) = '/' THEN auth || {var}
        WHEN left({var}, 1) = '?' THEN auth || path || {var}
        ELSE auth || basedir || {var}
    END"""

# synthetic page-level edges (mirrors linkgraph.synth_host_edges): 13
# case-varied source hosts, 17 destination hosts → hosts 13-16 dangling
_HOST_EDGES_CTES = f"""
    d AS (SELECT CAST(doc_id AS BIGINT) AS d FROM documents),
    e0 AS (
      SELECT 'http://Host-' || CAST(d % 13 AS VARCHAR)
             || '.Test/page/' || CAST(d % 7 AS VARCHAR) AS src,
             'https://host-' || CAST((d * 7 + 1) % 17 AS VARCHAR)
             || '.test/x' AS dst
      FROM d
      UNION ALL
      SELECT 'http://Host-' || CAST(d % 13 AS VARCHAR)
             || '.Test/page/' || CAST(d % 7 AS VARCHAR),
             'http://host-' || CAST((d * 11 + 3) % 17 AS VARCHAR)
             || '.test/y#f'
      FROM d),
    he AS (
      SELECT lower(regexp_extract(src, '{_HOST_RE}', 1)) AS src_host,
             lower(regexp_extract(dst, '{_HOST_RE}', 1)) AS dst_host
      FROM e0
      WHERE lower(regexp_extract(src, '{_HOST_RE}', 1)) <> ''
        AND lower(regexp_extract(dst, '{_HOST_RE}', 1)) <> '')
"""


def _pagerank_oracle_sql(k: int = 3, damping: float = 0.85) -> str:
    """Unrolled K-iteration PageRank CTE chain over the synthetic host
    graph — the same damped update host_pagerank runs iteratively,
    with the float literals injected as Python double reprs so both
    engines compute the identical IEEE expression."""
    ctes = [
        f"""WITH {_HOST_EDGES_CTES.strip()},
    eg AS (SELECT DISTINCT src_host AS src, dst_host AS dst FROM he),
    nodes AS (SELECT src AS host FROM eg UNION SELECT dst AS host FROM eg),
    nn AS (SELECT CAST(count(*) AS DOUBLE) AS n FROM nodes),
    outdeg AS (SELECT src AS host, CAST(count(*) AS DOUBLE) AS deg
               FROM eg GROUP BY src),
    r0 AS (SELECT host, 1.0 / nn.n AS rank FROM nodes CROSS JOIN nn)"""
    ]
    base = f"CAST({(1.0 - damping)!r} AS DOUBLE) / nn.n"
    damp = f"CAST({damping!r} AS DOUBLE)"
    for i in range(1, k + 1):
        ctes.append(
            f"""d{i} AS (SELECT coalesce(sum(r.rank), 0.0) AS dm
           FROM r{i - 1} r LEFT JOIN outdeg o ON o.host = r.host
           WHERE o.deg IS NULL),
    c{i} AS (SELECT e.dst AS host, sum(r.rank / o.deg) AS c
           FROM eg e
           JOIN r{i - 1} r ON r.host = e.src
           JOIN outdeg o ON o.host = e.src
           GROUP BY e.dst),
    r{i} AS (SELECT nodes.host,
                  {base} + {damp} * (coalesce(c{i}.c, 0.0)
                                     + d{i}.dm / nn.n) AS rank
           FROM nodes CROSS JOIN nn CROSS JOIN d{i}
           LEFT JOIN c{i} ON c{i}.host = nodes.host)"""
        )
    return (
        ",\n    ".join(ctes)
        + f"\n    SELECT host, round(rank, 6) AS rank"
        f" FROM r{k} ORDER BY host"
    )


_URL_CTES = f"""
    WITH {_URLS_CTE.strip()},
    u1 AS (
      SELECT doc_id, url,
             regexp_extract(url, '^[^#]*', 0) AS nofrag
      FROM urls),
    u2 AS (
      SELECT *, regexp_extract(nofrag,
                    '^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*', 0) AS auth
      FROM u1),
    u3 AS (
      SELECT *, substring(nofrag, length(auth) + 1) AS rest
      FROM u2),
    u4 AS (
      SELECT *, regexp_extract(rest, '^[^?]*', 0) AS path
      FROM u3),
    u5 AS (
      SELECT *,
             CASE WHEN length(rest) > length(path)
                  THEN substring(rest, length(path) + 2)
                  ELSE '' END AS query
      FROM u4),
    u6 AS (
      SELECT *,
             CASE WHEN lower(auth) LIKE 'http://%'
                       AND lower(auth) LIKE '%:80'
                  THEN substring(lower(auth), 1, length(auth) - 3)
                  WHEN lower(auth) LIKE 'https://%'
                       AND lower(auth) LIKE '%:443'
                  THEN substring(lower(auth), 1, length(auth) - 4)
                  ELSE lower(auth) END AS lauth,
             array_to_string(list_sort(list_filter(
                 str_split(query, '&'),
                 p -> p <> '' AND NOT regexp_matches(
                     lower(regexp_extract(p, '^[^=]*', 0)),
                     '{U.TRACKING_PARAM_RE}'))), '&') AS qjoin
      FROM u5),
    canon AS (
      SELECT doc_id, url,
             CASE WHEN auth = '' THEN nofrag
                  ELSE lauth
                       || (CASE WHEN path = '/' THEN '' ELSE path END)
                       || (CASE WHEN qjoin <> '' THEN '?' || qjoin
                                ELSE '' END)
             END AS canonical_url
      FROM u6)
"""


# unigram-LM scoring pipeline (mirrors lmquality.unigram_logprob),
# shared by the unigram_logprob and lm_buckets oracles
_LM_SCORE_CTES = f"""
    toks AS (
      SELECT doc_id,
             unnest(CASE WHEN text IS NULL OR trim(text) = ''
                         THEN CAST([] AS VARCHAR[])
                         ELSE regexp_split_to_array(trim(text),
                                                    '\\s+') END)
               AS token
      FROM documents),
    tf AS (SELECT token, count(*) AS c FROM toks GROUP BY token),
    top AS (
      SELECT token, ln(CAST(c AS DOUBLE)) AS ln_c
      FROM tf ORDER BY c DESC, token ASC
      LIMIT {LM.DEFAULT_VOCAB_SIZE}),
    tot AS (
      SELECT ln(CAST(sum(c) AS DOUBLE)) AS ln_total FROM tf),
    per AS (
      SELECT t.doc_id, count(*) AS n_tokens,
             CAST(sum(CASE WHEN v.ln_c IS NULL
                           THEN 1 ELSE 0 END) AS BIGINT)
               AS n_oov,
             sum(coalesce(v.ln_c, 0.0)) AS s
      FROM toks t LEFT JOIN top v USING (token)
      GROUP BY t.doc_id),
    lmscore AS (
      SELECT d.doc_id,
             CAST(coalesce(p.n_tokens, 0) AS BIGINT) AS n_tokens,
             CAST(coalesce(p.n_oov, 0) AS BIGINT) AS n_oov,
             CASE WHEN coalesce(p.n_tokens, 0) > 0
                  THEN round(p.s / p.n_tokens - tot.ln_total,
                             {LM.LOGPROB_DECIMALS}) END
               AS lm_logprob
      FROM documents d
      LEFT JOIN per p USING (doc_id) CROSS JOIN tot)
"""


def _robots_rx_sql(expr: str) -> str:
    """Fold ``operators/robotstxt.PATTERN_ESCAPES`` into nested DuckDB
    ``regexp_replace`` calls — the SAME table the Spark side applies,
    using its RE2-rewrite replacement column (the dialects spell only
    the literal-'$' replacement differently; see the table's
    docstring), so REP-wildcard escaping produces byte-identical
    regexes by construction."""
    out = expr
    for pat, _java, rep in RB.PATTERN_ESCAPES:
        out = f"regexp_replace({out}, '{pat}', '{rep}', 'g')"
    return out


# robots.txt parse pipeline (mirrors operators/robotstxt.parse_robots:
# line explode with ordinality, comment strip, key/value split, RFC 9309
# group formation via lag + running sum, agents x rules join)
def _robots_ctes(keys: tuple = ("user-agent", "allow", "disallow")) -> str:
    """The robots.txt group-formation CTEs over the synthetic bodies,
    parametrized by the recognized key set: the default mirrors
    parse_robots (RFC 9309 rules only); ('user-agent', 'crawl-delay')
    mirrors parse_crawl_delay (the de-facto politeness extension)."""
    key_list = ", ".join(f"'{k}'" for k in keys)
    return f"""
    WITH {_URLS_CTE.strip()},
    rhosts AS (
      SELECT DISTINCT (doc_id % 40) AS h FROM documents),
    robots AS (
      SELECT 'www.site' || CAST(h AS VARCHAR) || '.example.com' AS host,
             CASE WHEN h % 4 = 1 THEN '{{body1}}'
                  WHEN h % 4 = 2 THEN '{{body2}}'
                  ELSE '{{body3}}' END AS body
      FROM rhosts WHERE h % 4 <> 0),
    rlines0 AS (
      SELECT host,
             unnest(list_transform(string_split(body, chr(10)),
                    (x, i) -> struct_pack(raw := x, line_no := i))) AS e
      FROM robots),
    rlines AS (
      SELECT host, e.line_no AS line_no,
             trim(regexp_extract(e.raw, '^[^#]*', 0)) AS s
      FROM rlines0),
    rkv AS (
      SELECT host, line_no,
             lower(regexp_extract(s, '^([A-Za-z][A-Za-z-]*)\\s*:', 1))
               AS key,
             trim(regexp_extract(s, '^[A-Za-z][A-Za-z-]*\\s*:(.*)$', 1))
               AS value
      FROM rlines),
    rkvf AS (
      SELECT * FROM rkv
      WHERE key IN ({key_list})),
    rg0 AS (
      SELECT *, (key = 'user-agent') AS is_ua,
             lag(key = 'user-agent') OVER
               (PARTITION BY host ORDER BY line_no) AS prev_ua
      FROM rkvf),
    rg1 AS (
      SELECT *,
             sum(CASE WHEN is_ua AND NOT coalesce(prev_ua, FALSE)
                      THEN 1 ELSE 0 END)
               OVER (PARTITION BY host ORDER BY line_no
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS group_id
      FROM rg0),
    rg AS (SELECT * FROM rg1 WHERE group_id > 0),
    ragents AS (
      SELECT host, group_id, lower(value) AS agent FROM rg WHERE is_ua),
    rrules AS (
      SELECT host, group_id, key AS rule, value AS path
      FROM rg WHERE NOT is_ua AND value <> ''),
    parsed AS (
      SELECT a.host, a.group_id, a.agent, r.rule, r.path
      FROM ragents a JOIN rrules r USING (host, group_id))
""".replace(
        "{body1}", RB.ROBOTS_BODY_BY_MOD[1]
    ).replace(
        "{body2}", RB.ROBOTS_BODY_BY_MOD[2]
    ).replace(
        "{body3}", RB.ROBOTS_BODY_BY_MOD[3]
    )


_ROBOTS_CTES = _robots_ctes()


def oracle_sql() -> dict[str, str]:
    toks = "regexp_split_to_array(trim(text), '\\s+')"
    ntoks = f"CASE WHEN trim(text) = '' THEN 0 ELSE len({toks}) END"
    nstop = "len(regexp_extract_all(text, '\\b(the|a|of|and|to)\\b'))"

    def vote(words: list[str]) -> str:
        return " + ".join(
            f"len(regexp_extract_all(text, '\\b{w}\\b'))" for w in words
        )

    # lang-routed Gopher stop-word count (mirrors corpus.STOPWORDS_BY_LANG:
    # per-language set, English fallback for unknown langs, rule binds
    # only for languages with a defined set)
    _lang2 = "substr(lower(coalesce(lang, 'en')), 1, 2)"

    # shared builder (corpus.stopword_pattern): \b-wrapped for ASCII
    # sets, plain substring alternation for CJK — identical semantics
    # in Java regex and RE2 (both default \w/\b to ASCII)
    _stop_re = CO.stopword_pattern

    _stop_case = (
        "CASE "
        + " ".join(
            f"WHEN {_lang2} = '{tag}' THEN CAST(len(regexp_extract_all("
            f"lower(text), '{_stop_re(ws)}')) AS BIGINT)"
            for tag, ws in CO.STOPWORDS_BY_LANG.items()
        )
        + f" ELSE CAST(len(regexp_extract_all(lower(text), "
        f"'{_stop_re(CO.GOPHER_STOPWORDS)}')) AS BIGINT) END"
    )
    _stop_binds = (
        f"{_lang2} IN ("
        + ", ".join(f"'{t}'" for t in CO.STOPWORDS_BY_LANG)
        + ")"
    )

    sig = lambda i: (
        "CASE WHEN trim(text) = '' THEN NULL ELSE "
        f"list_aggregate(list_transform(list_distinct({toks}), "
        f"t -> md5('{i}|' || t)), 'min') END"
    )

    sqls = {
        # mirrors linkgraph.q_extract_outlinks: synthetic page html over
        # the synthetic url base; href harvest (double-quoted matches
        # first, then single-quoted) + the RFC 3986 safe-subset
        # resolution.  SCALAR rows only (driver contract): the outlink
        # list is UNNESTed WITH ORDINALITY to (doc_id, pos, outlink)
        # rows — NULL elements (skipped refs) survive as NULL rows,
        # matching Spark's posexplode of the same array.
        "extract_outlinks": f"""
            WITH {_URLS_CTE.strip()},
            lp AS (
              SELECT u.doc_id, u.url, {_LINK_HTML_SQL.strip()} AS html
              FROM urls u JOIN documents d USING (doc_id)),
            {_LINK_BASE_CTES.strip()},
            hr AS (
              SELECT *,
                     list_concat(
                       regexp_extract_all(html,
                         '(?i)<a\\s[^>]*?href\\s*=\\s*"([^"]*)"', 1),
                       regexp_extract_all(html,
                         '(?i)<a\\s[^>]*?href\\s*=\\s*''([^'']*)''', 1)
                     ) AS hrefs
              FROM bp3),
            res AS (
              SELECT doc_id, CAST(len(hrefs) AS INTEGER) AS n_hrefs,
                     list_transform(
                       list_transform(hrefs,
                         x -> regexp_extract(trim(x), '^[^#]*', 0)),
                       h -> {_resolve_case('h')}) AS outlinks
              FROM hr)
            SELECT doc_id, n_hrefs,
                   CAST(len(list_filter(outlinks, x -> x IS NOT NULL))
                        AS INTEGER) AS n_outlinks,
                   CAST(unnest(range(len(outlinks))) AS INTEGER) AS pos,
                   unnest(outlinks) AS outlink
            FROM res ORDER BY doc_id, pos
        """,
        # mirrors linkgraph.q_page_inlinks: same href/base/resolve CTEs
        # as extract_outlinks, with the ORIGINAL page url carried as
        # page_url (the base CTEs REPLACE url with the effective base),
        # then one in-degree rollup; opaque-id sources count pages but
        # not hosts (nullif host -> NULL, skipped by count DISTINCT in
        # both engines)
        "page_inlinks": f"""
            WITH {_URLS_CTE.strip()},
            lp AS (
              SELECT u.doc_id, u.url, u.url AS page_url,
                     {_LINK_HTML_SQL.strip()} AS html
              FROM urls u JOIN documents d USING (doc_id)),
            {_LINK_BASE_CTES.strip()},
            hr AS (
              SELECT *,
                     list_concat(
                       regexp_extract_all(html,
                         '(?i)<a\\s[^>]*?href\\s*=\\s*"([^"]*)"', 1),
                       regexp_extract_all(html,
                         '(?i)<a\\s[^>]*?href\\s*=\\s*''([^'']*)''', 1)
                     ) AS hrefs
              FROM bp3),
            res AS (
              SELECT page_url,
                     list_transform(
                       list_transform(hrefs,
                         x -> regexp_extract(trim(x), '^[^#]*', 0)),
                       h -> {_resolve_case('h')}) AS outlinks
              FROM hr),
            edges AS (
              SELECT page_url AS src, unnest(outlinks) AS dst FROM res),
            e2 AS (
              SELECT src, dst,
                     nullif(lower(regexp_extract(src, '{_HOST_RE}', 1)),
                            '') AS src_host
              FROM edges WHERE dst IS NOT NULL)
            SELECT dst AS target_url,
                   CAST(count(*) AS BIGINT) AS n_inlinks,
                   CAST(count(DISTINCT src) AS BIGINT) AS n_src_pages,
                   CAST(count(DISTINCT src_host) AS BIGINT) AS n_src_hosts
            FROM e2 GROUP BY dst ORDER BY target_url
        """,
        # mirrors urlops.q_crawl_frontier: resolved outlinks -> distinct
        # http(s) candidates -> anti-join the known set (synth urls +
        # an md5-bucket subset of the candidates, identical bytes in
        # both engines) -> politeness cap 2/host (row_number twin of
        # the salted two-stage top-k, which is result-identical)
        "crawl_frontier": f"""
            WITH {_URLS_CTE.strip()},
            lp AS (
              SELECT u.doc_id, u.url, u.url AS page_url,
                     {_LINK_HTML_SQL.strip()} AS html
              FROM urls u JOIN documents d USING (doc_id)),
            {_LINK_BASE_CTES.strip()},
            hr AS (
              SELECT *,
                     list_concat(
                       regexp_extract_all(html,
                         '(?i)<a\\s[^>]*?href\\s*=\\s*"([^"]*)"', 1),
                       regexp_extract_all(html,
                         '(?i)<a\\s[^>]*?href\\s*=\\s*''([^'']*)''', 1)
                     ) AS hrefs
              FROM bp3),
            res AS (
              SELECT page_url,
                     list_transform(
                       list_transform(hrefs,
                         x -> regexp_extract(trim(x), '^[^#]*', 0)),
                       h -> {_resolve_case('h')}) AS outlinks
              FROM hr),
            cand AS (
              SELECT DISTINCT u2 AS url
              FROM (SELECT unnest(outlinks) AS u2 FROM res)
              WHERE u2 IS NOT NULL
                AND regexp_matches(lower(u2), '^https?://')),
            known AS (
              SELECT url FROM urls
              UNION
              SELECT url FROM cand
              WHERE substr(md5(url), 1, 1) IN ('0','1','2','3','4')),
            fr AS (
              SELECT c.url,
                     lower(regexp_extract(c.url, '{_HOST_RE}', 1)) AS host
              FROM cand c
              WHERE NOT EXISTS (SELECT 1 FROM known k
                                WHERE k.url = c.url)),
            ranked AS (
              SELECT url, host,
                     CAST(row_number() OVER (PARTITION BY host
                       ORDER BY url) AS INTEGER) AS rk
              FROM fr)
            SELECT url, host, rk FROM ranked
            WHERE rk <= 2 ORDER BY host, rk
        """,
        # mirrors linkgraph.extract_anchors: one pattern, two group
        # extractions (index-aligned), tag-strip + ws-collapse with 'g'
        # (DuckDB replaces first-only by default; Spark always-all)
        "extract_anchors": f"""
            WITH {_URLS_CTE.strip()},
            lp AS (
              SELECT u.doc_id, u.url, {_LINK_HTML_SQL.strip()} AS html
              FROM urls u JOIN documents d USING (doc_id)),
            {_LINK_BASE_CTES.strip()},
            an AS (
              SELECT *,
                     regexp_extract_all(html,
                       '{_ANCHOR_RE_SQL}', 1) AS hrefs,
                     list_transform(
                       regexp_extract_all(html,
                         '{_ANCHOR_RE_SQL}', 2),
                       t -> trim(regexp_replace(regexp_replace(t,
                              '<[^>]*>', '', 'g'),
                              '\\s+', ' ', 'g'))) AS texts
              FROM bp3),
            ex AS (
              SELECT doc_id, auth, scheme, path, basedir,
                     hrefs[CAST(u.i AS INTEGER)] AS href,
                     texts[CAST(u.i AS INTEGER)] AS anchor_text
              FROM an, unnest(range(1, len(hrefs) + 1)) AS u(i)),
            rs AS (
              SELECT doc_id, href, anchor_text,
                     auth, scheme, path, basedir,
                     regexp_extract(trim(href), '^[^#]*', 0) AS h0
              FROM ex),
            rs2 AS (
              SELECT doc_id, href, anchor_text,
                     {_resolve_case('h0')} AS outlink
              FROM rs)
            SELECT doc_id, href, anchor_text, outlink
            FROM rs2 ORDER BY doc_id, href, anchor_text
        """,
        # mirrors linkgraph.anchor_index over the same derivation
        "anchor_index": f"""
            WITH {_URLS_CTE.strip()},
            lp AS (
              SELECT u.doc_id, u.url, {_LINK_HTML_SQL.strip()} AS html
              FROM urls u JOIN documents d USING (doc_id)),
            {_LINK_BASE_CTES.strip()},
            an AS (
              SELECT *,
                     regexp_extract_all(html,
                       '{_ANCHOR_RE_SQL}', 1) AS hrefs,
                     list_transform(
                       regexp_extract_all(html,
                         '{_ANCHOR_RE_SQL}', 2),
                       t -> trim(regexp_replace(regexp_replace(t,
                              '<[^>]*>', '', 'g'),
                              '\\s+', ' ', 'g'))) AS texts
              FROM bp3),
            ex AS (
              SELECT doc_id, auth, scheme, path, basedir,
                     regexp_extract(trim(hrefs[CAST(u.i AS INTEGER)]),
                                    '^[^#]*', 0) AS h0,
                     texts[CAST(u.i AS INTEGER)] AS anchor_text
              FROM an, unnest(range(1, len(hrefs) + 1)) AS u(i)),
            rs AS (
              SELECT {_resolve_case('h0')} AS target, anchor_text
              FROM ex)
            SELECT target, anchor_text, count(*) AS n_anchors
            FROM rs
            WHERE target IS NOT NULL AND anchor_text <> ''
            GROUP BY target, anchor_text
            ORDER BY target, anchor_text
        """,
        # mirrors linkgraph.host_graph over synth_host_edges: one hash
        # aggregation on the lowercased host pair
        "host_graph": f"""
            WITH {_HOST_EDGES_CTES.strip()}
            SELECT src_host, dst_host, count(*) AS n_links
            FROM he
            GROUP BY src_host, dst_host
            ORDER BY src_host, dst_host
        """,
        # mirrors linkgraph.host_pagerank (K=3, d=0.85): unrolled CTE
        # chain with dangling-mass redistribution
        "host_pagerank": _pagerank_oracle_sql(k=3, damping=0.85),
        # mirrors linkgraph.host_components over the four-component
        # synthetic derivation: recursive transitive closure, component
        # id = least reachable host (same genre as near_dup_clusters)
        "host_components": """
            WITH RECURSIVE
            d AS (SELECT CAST(doc_id AS BIGINT) AS d FROM documents),
            e0 AS (
              SELECT 'c' || CAST(d % 4 AS VARCHAR) || '-h'
                     || CAST(d % 5 AS VARCHAR) || '.test' AS src,
                     'c' || CAST(d % 4 AS VARCHAR) || '-h'
                     || CAST((d + 1) % 5 AS VARCHAR) || '.test' AS dst
              FROM d
              UNION ALL
              SELECT 'c' || CAST(d % 4 AS VARCHAR) || '-h'
                     || CAST(d % 5 AS VARCHAR) || '.test',
                     'c' || CAST(d % 4 AS VARCHAR) || '-h'
                     || CAST((d * 3 + 2) % 5 AS VARCHAR) || '.test'
              FROM d),
            e AS (
              SELECT src, dst FROM e0
              UNION
              SELECT dst, src FROM e0),
            reach(src, dst) AS (
              SELECT src, dst FROM e
              UNION
              SELECT r.src, e2.dst FROM reach r JOIN e e2 ON r.dst = e2.src)
            SELECT src AS host,
                   least(src, min(dst)) AS component_id
            FROM reach GROUP BY src ORDER BY host
        """,
        "filter_project": """
            SELECT doc_id, md5(text) AS text_md5, n_chars,
                   CAST(strlen(text) AS BIGINT) AS n_bytes
            FROM documents WHERE lang = 'en' AND n_chars > 200
            ORDER BY doc_id
        """,
        "dedup_latest": """
            SELECT o_custkey, o_orderkey,
                   CAST(o_orderdate AS VARCHAR) AS latest_date
            FROM (
              SELECT *, row_number() OVER (
                PARTITION BY o_custkey
                ORDER BY o_orderdate DESC, o_orderkey DESC) AS rn
              FROM orders)
            WHERE rn = 1 ORDER BY o_custkey
        """,
        "agg_counters": """
            SELECT l_returnflag, l_linestatus,
                   count(*) AS n_rows,
                   CAST(sum(l_quantity) AS DOUBLE) AS sum_qty,
                   round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
                   round(avg(l_discount), 6) AS avg_disc
            FROM lineitem WHERE l_shipdate <= DATE '1998-09-02'
            GROUP BY l_returnflag, l_linestatus
            ORDER BY l_returnflag, l_linestatus
        """,
        "anti_join_resume": """
            SELECT o_orderkey, o_custkey, o_totalprice
            FROM orders
            WHERE o_orderkey NOT IN (SELECT l_orderkey FROM lineitem)
            ORDER BY o_orderkey
        """,
        "semi_join": """
            SELECT c_custkey, c_name, c_nationkey
            FROM customer
            WHERE c_custkey IN (
              SELECT o_custkey FROM orders WHERE o_totalprice > 100000.0)
            ORDER BY c_custkey
        """,
        "broadcast_join": """
            SELECT r_name, count(*) AS n_customers,
                   round(sum(c_acctbal), 2) AS sum_acctbal
            FROM customer c
            JOIN nation n ON c.c_nationkey = n.n_nationkey
            JOIN region r ON n.n_regionkey = r.r_regionkey
            GROUP BY r_name ORDER BY r_name
        """,
        "part_brand_stats": """
            SELECT p_brand, count(*) AS n_parts,
                   round(avg(p_retailprice), 2) AS avg_price,
                   max(p_size) AS max_size
            FROM part GROUP BY p_brand
            HAVING count(*) >= 2 ORDER BY p_brand
        """,
        "supplier_balance": """
            SELECT n_name, count(*) AS n_suppliers,
                   round(sum(s_acctbal), 2) AS sum_acctbal
            FROM supplier s JOIN nation n ON s.s_nationkey = n.n_nationkey
            GROUP BY n_name ORDER BY n_name
        """,
        "topk_docs": """
            SELECT doc_id, n_chars, lang FROM documents
            ORDER BY n_chars DESC, doc_id ASC LIMIT 10
        """,
        "set_diff": """
            SELECT doc_id FROM documents WHERE lang = 'en'
            EXCEPT ALL
            SELECT doc_id FROM documents WHERE lang = 'en' AND n_chars > 300
            ORDER BY doc_id
        """,
        "events_window": """
            SELECT CAST(date_trunc('hour', ts) AS VARCHAR) AS hour,
                   event_type, count(*) AS n_events,
                   round(sum(value), 2) AS sum_value
            FROM events GROUP BY 1, 2 ORDER BY 1, 2
        """,
        "sessionize": f"""
            WITH o AS (
              SELECT user_id, event_id, value, epoch_us(ts) AS us,
                     lag(epoch_us(ts)) OVER (
                       PARTITION BY user_id ORDER BY ts, event_id) AS prev
              FROM events),
            s AS (
              SELECT *, CAST(sum(CASE WHEN prev IS NULL
                                      OR us - prev > {R.SESSION_GAP_US}
                                 THEN 1 ELSE 0 END) OVER (
                       PARTITION BY user_id ORDER BY us, event_id
                       ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_id
              FROM o)
            SELECT user_id, session_id, count(*) AS n_events,
                   min(us) AS start_us, max(us) AS end_us,
                   round(sum(value), 2) AS sum_value
            FROM s GROUP BY user_id, session_id
            ORDER BY user_id, session_id
        """,
        # mirrors streaming.sessions.session_stats (Spark's NATIVE
        # session_window operator, batch mode): DuckDB has no session
        # windows, so the oracle is the equivalent lag + cumulative-sum
        # clustering — the same rollup as `sessionize`, minus the
        # within-user session ordinal the native operator doesn't emit
        "session_window_stats": f"""
            WITH o AS (
              SELECT user_id, event_id, value, epoch_us(ts) AS us,
                     lag(epoch_us(ts)) OVER (
                       PARTITION BY user_id ORDER BY ts, event_id) AS prev
              FROM events),
            s AS (
              SELECT *, CAST(sum(CASE WHEN prev IS NULL
                                      OR us - prev > {R.SESSION_GAP_US}
                                 THEN 1 ELSE 0 END) OVER (
                       PARTITION BY user_id ORDER BY us, event_id
                       ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_id
              FROM o)
            SELECT user_id, count(*) AS n_events,
                   min(us) AS start_us, max(us) AS end_us,
                   round(sum(value), 2) AS sum_value
            FROM s GROUP BY user_id, session_id
            ORDER BY user_id, start_us
        """,
        "events_props": """
            SELECT event_type,
                   count(CAST(props ->> '$.k' AS BIGINT)) AS n_with_k,
                   CAST(sum(CAST(props ->> '$.k' AS BIGINT)) AS BIGINT)
                     AS sum_k,
                   max(CAST(props ->> '$.k' AS BIGINT)) AS max_k
            FROM events GROUP BY event_type ORDER BY event_type
        """,
        # mirrors wordlist.wordlist_hits over the same compiled pattern
        "wordlist_filter": f"""
            SELECT doc_id,
                   CAST(CASE WHEN text IS NULL THEN 0
                        ELSE len(regexp_extract_all(lower(text),
                                 '{WL.blocklist_pattern(WL.DEFAULT_BLOCKLIST)}'))
                        END AS BIGINT) AS n_hits,
                   (CASE WHEN text IS NULL THEN 0
                         ELSE len(regexp_extract_all(lower(text),
                                  '{WL.blocklist_pattern(WL.DEFAULT_BLOCKLIST)}'))
                         END) > 0 AS flagged
            FROM documents ORDER BY doc_id
        """,
        # mirrors lmquality.dsir_weights: train docs scored under the
        # eval-split target unigram model AND the train corpus's own
        "dsir_weights": f"""
            WITH t0 AS (
              SELECT doc_id, text,
                     substr(md5(CAST(doc_id AS VARCHAR)), 1,
                            {DC.EVAL_HEX_BITS}) = '{DC.EVAL_HEX_PREFIX}'
                       AS is_eval
              FROM documents),
            train AS (SELECT doc_id, text FROM t0 WHERE NOT is_eval),
            toks AS (
              SELECT doc_id,
                     unnest(CASE WHEN text IS NULL OR trim(text) = ''
                                 THEN CAST([] AS VARCHAR[])
                                 ELSE regexp_split_to_array(trim(text),
                                                            '\\s+') END)
                       AS token
              FROM train),
            ttoks AS (
              SELECT unnest(CASE WHEN text IS NULL OR trim(text) = ''
                                 THEN CAST([] AS VARCHAR[])
                                 ELSE regexp_split_to_array(trim(text),
                                                            '\\s+') END)
                       AS token
              FROM t0 WHERE is_eval),
            stf AS (SELECT token, count(*) AS c FROM toks GROUP BY token),
            stop AS (
              SELECT token, ln(CAST(c AS DOUBLE)) AS ln_c
              FROM stf ORDER BY c DESC, token ASC
              LIMIT {LM.DEFAULT_VOCAB_SIZE}),
            stot AS (
              SELECT ln(CAST(sum(c) AS DOUBLE)) AS ln_total FROM stf),
            ttf AS (SELECT token, count(*) AS c FROM ttoks GROUP BY token),
            ttop AS (
              SELECT token, ln(CAST(c AS DOUBLE)) AS ln_c
              FROM ttf ORDER BY c DESC, token ASC
              LIMIT {LM.DEFAULT_VOCAB_SIZE}),
            ttot AS (
              SELECT ln(CAST(sum(c) AS DOUBLE)) AS ln_total FROM ttf),
            per_s AS (
              SELECT t.doc_id, count(t.token) AS n_tokens,
                     sum(coalesce(v.ln_c, 0.0)) AS s
              FROM toks t LEFT JOIN stop v USING (token)
              GROUP BY t.doc_id),
            per_t AS (
              SELECT t.doc_id, sum(coalesce(v.ln_c, 0.0)) AS s
              FROM toks t LEFT JOIN ttop v USING (token)
              GROUP BY t.doc_id),
            scored AS (
              SELECT tr.doc_id,
                     CAST(coalesce(ps.n_tokens, 0) AS BIGINT)
                       AS n_tokens,
                     CASE WHEN coalesce(ps.n_tokens, 0) > 0
                          THEN round(pt.s / ps.n_tokens - ttot.ln_total,
                                     {LM.LOGPROB_DECIMALS}) END
                       AS target_logprob,
                     CASE WHEN coalesce(ps.n_tokens, 0) > 0
                          THEN round(ps.s / ps.n_tokens - stot.ln_total,
                                     {LM.LOGPROB_DECIMALS}) END
                       AS self_logprob
              FROM train tr
              LEFT JOIN per_s ps USING (doc_id)
              LEFT JOIN per_t pt USING (doc_id)
              CROSS JOIN stot CROSS JOIN ttot)
            SELECT doc_id, n_tokens, target_logprob, self_logprob,
                   round(target_logprob - self_logprob,
                         {LM.LOGPROB_DECIMALS}) AS dsir_weight
            FROM scored ORDER BY doc_id
        """,
        # mirrors lmquality.unigram_logprob: top-V unigram model from
        # corpus counts, OOV floor 1/total, mean ln-prob per doc
        "unigram_logprob": f"""
            WITH {_LM_SCORE_CTES}
            SELECT doc_id, n_tokens, n_oov, lm_logprob
            FROM lmscore ORDER BY doc_id
        """,
        # mirrors lmquality.lm_buckets: CCNet head/middle/tail split,
        # per-language ntile over the shared lmscore CTEs (score DESC
        # NULLS LAST, id ASC — total order, so ntile agrees)
        "lm_buckets": f"""
            WITH {_LM_SCORE_CTES},
            lb AS (
              SELECT s.doc_id, d.lang, s.lm_logprob,
                     CAST(ntile(3) OVER (
                       PARTITION BY d.lang
                       ORDER BY s.lm_logprob DESC NULLS LAST,
                                s.doc_id ASC) AS INTEGER) AS lm_bucket
              FROM lmscore s JOIN documents d USING (doc_id))
            SELECT doc_id, lang, lm_logprob, lm_bucket,
                   CASE WHEN lm_bucket = 1 THEN 'head'
                        WHEN lm_bucket = 3 THEN 'tail'
                        ELSE 'middle' END AS lm_band
            FROM lb ORDER BY doc_id
        """,
        "url_canonicalize": f"""
            {_URL_CTES}
            SELECT doc_id, url, canonical_url
            FROM canon ORDER BY doc_id
        """,
        "canonical_dedup": f"""
            {_URL_CTES}
            SELECT canonical_url,
                   count(*) AS n_dupes,
                   min(doc_id) AS keeper
            FROM canon GROUP BY canonical_url ORDER BY canonical_url
        """,
        "token_count": f"""
            SELECT doc_id,
                   CAST({ntoks} AS BIGINT) AS n_tokens,
                   CAST(CASE WHEN trim(text) = '' THEN 0
                        ELSE len(list_distinct({toks})) END AS BIGINT)
                     AS n_distinct_tokens
            FROM documents ORDER BY doc_id
        """,
        "bpe_token_count": f"""
            WITH t AS (
              SELECT doc_id,
                     CAST(len(regexp_extract_all(text,
                       '{T.BPE_TOKEN_RE.replace("'", "''")}')) AS BIGINT)
                       AS n_bpe_tokens,
                     CAST({ntoks} AS BIGINT) AS n_ws_tokens
              FROM documents)
            SELECT doc_id, n_bpe_tokens, n_ws_tokens,
                   round(CASE WHEN n_ws_tokens > 0
                         THEN n_bpe_tokens / CAST(n_ws_tokens AS DOUBLE)
                         ELSE 0.0 END, 6) AS bpe_per_ws
            FROM t ORDER BY doc_id
        """,
        "quality_score": f"""
            WITH t AS (
              SELECT doc_id,
                     CAST({ntoks} AS BIGINT) AS n_tokens,
                     CAST({nstop} AS BIGINT) AS n_stopwords
              FROM documents)
            SELECT doc_id, n_tokens, n_stopwords,
                   round(CASE WHEN n_tokens > 0
                         THEN n_stopwords / CAST(n_tokens AS DOUBLE)
                         ELSE 0.0 END, 6) AS stopword_ratio,
                   round(least(n_tokens / 400.0, 1.0) * 0.5 +
                         (CASE WHEN n_tokens > 0
                          THEN n_stopwords / CAST(n_tokens AS DOUBLE)
                          ELSE 0.0 END) * 0.5, 6) AS quality_score
            FROM t ORDER BY doc_id
        """,
        # mirrors corpus.repetition_stats: lowercased whitespace tokens,
        # grams tagged by n in one unnest, coverage = count * chars of the
        # space-joined window, fractions over normalized-text length
        "repetition_stats": f"""
            WITH tok AS (
              SELECT doc_id,
                     CASE WHEN text IS NULL OR trim(text) = ''
                          THEN CAST([] AS VARCHAR[])
                          ELSE regexp_split_to_array(lower(trim(text)),
                                                     '\\s+') END AS toks
              FROM documents),
            base AS (
              SELECT doc_id, toks,
                     len(array_to_string(toks, ' ')) AS total_chars
              FROM tok),
            g AS (
              SELECT doc_id, total_chars, ns.n,
                     unnest(CASE WHEN len(toks) >= ns.n
                       THEN list_transform(
                         generate_series(1, len(toks) - ns.n + 1),
                         i -> array_to_string(
                           list_slice(toks, i, i + ns.n - 1), ' '))
                       ELSE CAST([] AS VARCHAR[]) END) AS gram
              FROM base CROSS JOIN
                   (SELECT unnest({list(CO.REP_NGRAM_SIZES)}) AS n) ns),
            c AS (
              SELECT doc_id, total_chars, n, gram,
                     count(*) AS cnt, count(*) * len(gram) AS cov
              FROM g GROUP BY doc_id, total_chars, n, gram),
            a AS (
              SELECT doc_id, any_value(total_chars) AS total_chars,
                     max(CASE WHEN n = 2 THEN cov END) AS t2,
                     max(CASE WHEN n = 3 THEN cov END) AS t3,
                     sum(CASE WHEN n = 6 AND cnt >= 2 THEN cov END) AS d6
              FROM c GROUP BY doc_id),
            s AS (
              SELECT d.doc_id,
                     CASE WHEN a.total_chars > 0 THEN round(
                       CAST(coalesce(a.t2, 0) AS DOUBLE) / a.total_chars, 6)
                       ELSE 0.0 END AS top2gram_frac,
                     CASE WHEN a.total_chars > 0 THEN round(
                       CAST(coalesce(a.t3, 0) AS DOUBLE) / a.total_chars, 6)
                       ELSE 0.0 END AS top3gram_frac,
                     CASE WHEN a.total_chars > 0 THEN round(
                       CAST(coalesce(a.d6, 0) AS DOUBLE) / a.total_chars, 6)
                       ELSE 0.0 END AS dup6gram_frac
              FROM (SELECT doc_id FROM documents) d
              LEFT JOIN a USING (doc_id))
            SELECT doc_id,
                   coalesce(top2gram_frac, 0.0) AS top2gram_frac,
                   coalesce(top3gram_frac, 0.0) AS top3gram_frac,
                   coalesce(dup6gram_frac, 0.0) AS dup6gram_frac,
                   coalesce(top2gram_frac, 0.0)
                     <= {CO.GOPHER_MAX_TOP2GRAM_FRAC} AS r_top2gram,
                   coalesce(top3gram_frac, 0.0)
                     <= {CO.GOPHER_MAX_TOP3GRAM_FRAC} AS r_top3gram,
                   coalesce(dup6gram_frac, 0.0)
                     <= {CO.GOPHER_MAX_DUP6GRAM_FRAC} AS r_dup6gram
            FROM s ORDER BY doc_id
        """,
        "quality_rules": f"""
            WITH w AS (
              SELECT doc_id, text, lang,
                     CASE WHEN text IS NULL OR trim(text) = ''
                          THEN CAST([] AS VARCHAR[])
                          ELSE regexp_split_to_array(trim(text), '\\s+') END
                       AS words,
                     CASE WHEN text IS NULL THEN CAST([] AS VARCHAR[])
                          ELSE list_filter(
                            list_transform(str_split(text, chr(10)),
                                           l -> trim(l)),
                            l -> l <> '') END AS lines
              FROM documents),
            s AS (
              SELECT doc_id,
                     CAST(len(words) AS BIGINT) AS n_words,
                     CASE WHEN len(words) > 0
                          THEN length(regexp_replace(trim(text),
                                      '\\s+', '', 'g'))
                               / CAST(len(words) AS DOUBLE)
                          ELSE 0.0 END AS mean_word_len,
                     CASE WHEN len(words) > 0
                          THEN len(regexp_extract_all(text,
                                   '#|\\.\\.\\.|…'))
                               / CAST(len(words) AS DOUBLE)
                          ELSE 0.0 END AS symbol_ratio,
                     CASE WHEN len(lines) > 0
                          THEN len(list_filter(lines,
                                   l -> regexp_matches(l, '^[-*•]')))
                               / CAST(len(lines) AS DOUBLE)
                          ELSE 0.0 END AS bullet_frac,
                     CASE WHEN len(lines) > 0
                          THEN len(list_filter(lines,
                                   l -> regexp_matches(l,
                                        '(\\.\\.\\.|…)$')))
                               / CAST(len(lines) AS DOUBLE)
                          ELSE 0.0 END AS ellipsis_frac,
                     CASE WHEN len(words) > 0
                          THEN len(list_filter(words,
                                   x -> regexp_matches(x, '[A-Za-z]')))
                               / CAST(len(words) AS DOUBLE)
                          ELSE 0.0 END AS alpha_frac,
                     {_stop_case} AS n_stopwords_g,
                     {_stop_binds} AS stop_binds,
                     CASE WHEN len(lines) > 0
                          THEN (len(lines) - len(list_distinct(lines)))
                               / CAST(len(lines) AS DOUBLE)
                          ELSE 0.0 END AS dup_line_frac,
                     CASE WHEN length(text) > 0
                          THEN len(regexp_extract_all(text, '[0-9]'))
                               / CAST(length(text) AS DOUBLE)
                          ELSE 0.0 END AS digit_ratio
              FROM w),
            r AS (
              SELECT *,
                     n_words >= {CO.GOPHER_MIN_WORDS}
                       AND n_words <= {CO.GOPHER_MAX_WORDS} AS r_word_count,
                     mean_word_len >= {CO.GOPHER_MIN_MEAN_WORD_LEN}
                       AND mean_word_len <= {CO.GOPHER_MAX_MEAN_WORD_LEN}
                       AS r_mean_word_len,
                     symbol_ratio <= {CO.GOPHER_MAX_SYMBOL_RATIO}
                       AS r_symbol_ratio,
                     bullet_frac <= {CO.GOPHER_MAX_BULLET_FRAC}
                       AS r_bullet_frac,
                     ellipsis_frac <= {CO.GOPHER_MAX_ELLIPSIS_FRAC}
                       AS r_ellipsis_frac,
                     alpha_frac >= {CO.GOPHER_MIN_ALPHA_FRAC} AS r_alpha_frac,
                     CASE WHEN stop_binds
                          THEN n_stopwords_g >= {CO.GOPHER_MIN_STOPWORDS}
                          ELSE TRUE END AS r_stopwords,
                     dup_line_frac <= {CO.C4_MAX_DUP_LINE_FRAC}
                       AS r_dup_lines,
                     digit_ratio <= {CO.MAX_DIGIT_RATIO} AS r_digit_ratio
              FROM s)
            SELECT doc_id, n_words,
                   round(mean_word_len, 6) AS mean_word_len,
                   round(symbol_ratio, 6) AS symbol_ratio,
                   round(bullet_frac, 6) AS bullet_frac,
                   round(ellipsis_frac, 6) AS ellipsis_frac,
                   round(alpha_frac, 6) AS alpha_frac,
                   n_stopwords_g,
                   round(dup_line_frac, 6) AS dup_line_frac,
                   round(digit_ratio, 6) AS digit_ratio,
                   r_word_count, r_mean_word_len, r_symbol_ratio,
                   r_bullet_frac, r_ellipsis_frac, r_alpha_frac,
                   r_stopwords, r_dup_lines, r_digit_ratio,
                   r_word_count AND r_mean_word_len AND r_symbol_ratio
                     AND r_bullet_frac AND r_ellipsis_frac AND r_alpha_frac
                     AND r_stopwords AND r_dup_lines AND r_digit_ratio
                     AS passes_quality
            FROM r ORDER BY doc_id
        """,
        "lang_id": f"""
            WITH v AS (
              SELECT doc_id, lang,
                     {vote(['the', 'and', 'of'])} AS v_en,
                     {vote(['el', 'la', 'los'])} AS v_es,
                     {vote(['le', 'les', 'des'])} AS v_fr,
                     {vote(['der', 'die', 'und'])} AS v_de
              FROM documents)
            SELECT doc_id, lang,
                   CASE
                     WHEN v_en >= v_es AND v_en >= v_fr AND v_en >= v_de
                          AND v_en > 0 THEN 'en'
                     WHEN v_es >= v_fr AND v_es >= v_de AND v_es > 0 THEN 'es'
                     WHEN v_fr >= v_de AND v_fr > 0 THEN 'fr'
                     WHEN v_de > 0 THEN 'de'
                     ELSE 'und' END AS lang_guess
            FROM v ORDER BY doc_id
        """,
        "fingerprint": """
            SELECT doc_id,
                   md5(lower(regexp_replace(trim(text), '\\s+', ' ', 'g')))
                     AS fingerprint
            FROM documents ORDER BY doc_id
        """,
        "winnow_fingerprint": f"""
            WITH {_winnow_ctes()}
            SELECT doc_id, fingerprint FROM wfp
            ORDER BY doc_id, fingerprint
        """,
        "winnow_overlap": f"""
            WITH {_winnow_ctes()},
            sizes AS (SELECT doc_id, count(*) AS n FROM wfp GROUP BY doc_id),
            dfreq AS (
              SELECT fingerprint, count(*) AS df FROM wfp
              GROUP BY fingerprint),
            bounded AS (
              SELECT w.doc_id, w.fingerprint
              FROM wfp w JOIN dfreq USING (fingerprint)
              WHERE df <= greatest({T.WINNOW_MAX_DF},
                                   (SELECT count(*) FROM documents)
                                     // {T.WINNOW_DF_SCALE})),
            inter AS (
              SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS i
              FROM bounded a JOIN bounded b
                ON a.fingerprint = b.fingerprint AND a.doc_id < b.doc_id
              GROUP BY 1, 2)
            SELECT doc_a, doc_b,
                   round(i / CAST(least(sa.n, sb.n) AS DOUBLE), 6)
                     AS containment
            FROM inter
            JOIN sizes sa ON sa.doc_id = inter.doc_a
            JOIN sizes sb ON sb.doc_id = inter.doc_b
            WHERE i / CAST(least(sa.n, sb.n) AS DOUBLE)
                  >= {T.WINNOW_CONTAINMENT}
            ORDER BY doc_a, doc_b
        """,
        "exact_dedup": """
            SELECT md5(lower(regexp_replace(trim(text), '\\s+', ' ', 'g')))
                     AS fingerprint,
                   min(doc_id) AS canonical_id,
                   count(*) AS n_copies
            FROM documents GROUP BY 1 ORDER BY fingerprint
        """,
        # mirrors decontam.decontaminate: 13-token md5 grams (the shingle
        # unit), eval split = md5(doc_id) prefix, train = the rest,
        # contaminated = any shared gram; n_hit_grams = DISTINCT shared
        "decontaminate": f"""
            WITH g AS (
              SELECT doc_id,
                     CASE WHEN trim(text) = ''
                               OR len({toks}) < {DC.N_DECONTAM}
                          THEN CAST([] AS VARCHAR[])
                          ELSE list_distinct(list_transform(
                            generate_series(
                              1, len({toks}) - {DC.N_DECONTAM - 1}),
                            i -> substr(md5(array_to_string(
                              list_slice({toks}, i, i + {DC.N_DECONTAM - 1}),
                              ' ')), 1, 16)))
                          END AS sh,
                     substr(md5(CAST(doc_id AS VARCHAR)), 1,
                            {DC.EVAL_HEX_BITS}) = '{DC.EVAL_HEX_PREFIX}'
                       AS is_eval
              FROM documents),
            e AS (SELECT DISTINCT unnest(sh) AS gram FROM g WHERE is_eval),
            t AS (SELECT doc_id, unnest(sh) AS gram FROM g WHERE NOT is_eval)
            SELECT t.doc_id, count(DISTINCT t.gram) AS n_hit_grams
            FROM t JOIN e USING (gram)
            GROUP BY t.doc_id
            ORDER BY doc_id
        """,
        # mirrors decontam.contamination_report: per-EVAL-ITEM audit —
        # leaked gram count + breadth (distinct corpus docs carrying
        # any of the item's grams); zeros for clean items
        "contamination_report": f"""
            WITH g AS (
              SELECT doc_id,
                     CASE WHEN trim(text) = ''
                               OR len({toks}) < {DC.N_DECONTAM}
                          THEN CAST([] AS VARCHAR[])
                          ELSE list_distinct(list_transform(
                            generate_series(
                              1, len({toks}) - {DC.N_DECONTAM - 1}),
                            i -> substr(md5(array_to_string(
                              list_slice({toks}, i, i + {DC.N_DECONTAM - 1}),
                              ' ')), 1, 16)))
                          END AS sh,
                     substr(md5(CAST(doc_id AS VARCHAR)), 1,
                            {DC.EVAL_HEX_BITS}) = '{DC.EVAL_HEX_PREFIX}'
                       AS is_eval
              FROM documents),
            e AS (SELECT doc_id, unnest(sh) AS gram FROM g WHERE is_eval),
            t AS (SELECT doc_id AS cdoc, unnest(sh) AS gram
                  FROM g WHERE NOT is_eval),
            hits AS (
              SELECT e.doc_id,
                     count(DISTINCT e.gram) AS n_leaked_grams,
                     count(DISTINCT t.cdoc) AS n_corpus_docs
              FROM e JOIN t USING (gram)
              GROUP BY e.doc_id),
            tot AS (
              SELECT doc_id, CAST(len(sh) AS BIGINT) AS n_grams
              FROM g WHERE is_eval)
            SELECT tot.doc_id,
                   tot.n_grams,
                   CAST(coalesce(h.n_leaked_grams, 0) AS BIGINT)
                     AS n_leaked_grams,
                   CAST(coalesce(h.n_corpus_docs, 0) AS BIGINT)
                     AS n_corpus_docs,
                   coalesce(h.n_leaked_grams, 0) > 0 AS leaked
            FROM tot LEFT JOIN hits h USING (doc_id)
            ORDER BY tot.doc_id
        """,
        # mirrors decontam.decontaminate_spans: eval 13-gram set, train
        # side positional windows, overlapping hit spans cut and merged
        "decontaminate_spans": f"""
            WITH t0 AS (
              SELECT doc_id,
                     CASE WHEN text IS NULL OR trim(text) = ''
                          THEN CAST([] AS VARCHAR[]) ELSE {toks} END
                       AS tk,
                     substr(md5(CAST(doc_id AS VARCHAR)), 1,
                            {DC.EVAL_HEX_BITS}) = '{DC.EVAL_HEX_PREFIX}'
                       AS is_eval
              FROM documents),
            e AS (
              SELECT DISTINCT substr(md5(array_to_string(
                       tk[u.i:u.i + {DC.N_DECONTAM} - 1], ' ')), 1, 16)
                       AS gram
              FROM t0, unnest(range(1, len(tk) - {DC.N_DECONTAM} + 2))
                     AS u(i)
              WHERE is_eval AND len(tk) >= {DC.N_DECONTAM}),
            t AS (SELECT doc_id, tk FROM t0 WHERE NOT is_eval),
            w AS (
              SELECT doc_id, u.i - 1 AS pos,
                     substr(md5(array_to_string(
                       tk[u.i:u.i + {DC.N_DECONTAM} - 1], ' ')), 1, 16)
                       AS gram
              FROM t, unnest(range(1, len(tk) - {DC.N_DECONTAM} + 2))
                     AS u(i)
              WHERE len(tk) >= {DC.N_DECONTAM}),
            d AS (SELECT doc_id, pos FROM w JOIN e USING (gram)),
            tok AS (
              SELECT doc_id, u.i - 1 AS idx, tk[u.i] AS tokval
              FROM t, unnest(range(1, len(tk) + 1)) AS u(i)),
            rem AS (
              SELECT DISTINCT tok.doc_id, idx
              FROM tok JOIN d ON tok.doc_id = d.doc_id
                   AND idx >= d.pos AND idx < d.pos + {DC.N_DECONTAM}),
            kept AS (
              SELECT tok.doc_id, idx, tokval
              FROM tok ANTI JOIN rem USING (doc_id, idx)),
            agg AS (
              SELECT doc_id, count(*) AS n_kept,
                     string_agg(tokval, ' ' ORDER BY idx) AS text_clean
              FROM kept GROUP BY doc_id),
            tot AS (SELECT doc_id, len(tk) AS n_tokens FROM t)
            SELECT tot.doc_id,
                   CAST(tot.n_tokens AS BIGINT) AS n_tokens,
                   CAST(tot.n_tokens - coalesce(agg.n_kept, 0) AS BIGINT)
                     AS n_dup_tokens,
                   md5(coalesce(agg.text_clean, '')) AS clean_hash
            FROM tot LEFT JOIN agg USING (doc_id)
            ORDER BY tot.doc_id
        """,
        # mirrors decontam.line_dedup: fixed token windows, df over
        # distinct docs, drop df > LINE_MAX_DF, order-preserving rejoin
        # mirrors spanops.q_spans_tiling: 25-token blocks, single-space
        # joins, prefix-sum offsets via a window cumulative sum, and the
        # same in-engine substring invariant (slice_ok)
        "spans_tiling": f"""
            WITH base AS (
              SELECT doc_id,
                     CASE WHEN text IS NULL OR trim(text) = ''
                          THEN CAST([] AS VARCHAR[]) ELSE {toks} END AS tk
              FROM documents),
            b2 AS (
              SELECT doc_id, tk,
                     CAST(ceil(len(tk) / {SP.SPAN_BLOCK_TOKENS}.0) AS INT)
                       AS n_blocks
              FROM base),
            g AS (
              SELECT doc_id,
                     unnest(CASE WHEN n_blocks > 0
                       THEN generate_series(0, n_blocks - 1)
                       ELSE CAST([] AS BIGINT[]) END) AS pos,
                     tk
              FROM b2),
            c AS (
              SELECT doc_id, pos,
                     array_to_string(list_slice(tk,
                       pos * {SP.SPAN_BLOCK_TOKENS} + 1,
                       pos * {SP.SPAN_BLOCK_TOKENS}
                         + {SP.SPAN_BLOCK_TOKENS}), ' ') AS block
              FROM g),
            s AS (
              SELECT doc_id, pos, block,
                     CAST(coalesce(sum(length(block) + 1) OVER (
                       PARTITION BY doc_id ORDER BY pos
                       ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                       0) AS BIGINT) AS span_start
              FROM c),
            f AS (
              SELECT doc_id, string_agg(block, ' ' ORDER BY pos) AS joined
              FROM c GROUP BY doc_id)
            SELECT s.doc_id,
                   CAST(s.pos AS INT) AS block_idx,
                   s.span_start,
                   s.span_start + length(s.block) AS span_end,
                   md5(s.block) AS block_hash,
                   substr(f.joined, CAST(s.span_start AS INT) + 1,
                          length(s.block)) = s.block AS slice_ok
            FROM s JOIN f USING (doc_id)
            ORDER BY doc_id, block_idx
        """,
        "line_dedup": f"""
            WITH base AS (
              SELECT doc_id,
                     CASE WHEN trim(text) = ''
                          THEN CAST([] AS VARCHAR[]) ELSE {toks} END AS tk
              FROM documents),
            b2 AS (
              SELECT doc_id, tk,
                     CAST(ceil(len(tk) / {DC.LINE_CHUNK_TOKENS}.0) AS INT)
                       AS n_chunks
              FROM base),
            g AS (
              SELECT doc_id,
                     unnest(CASE WHEN n_chunks > 0
                       THEN generate_series(0, n_chunks - 1)
                       ELSE CAST([] AS BIGINT[]) END) AS pos,
                     tk
              FROM b2),
            c AS (
              SELECT doc_id, pos,
                     array_to_string(list_slice(tk,
                       pos * {DC.LINE_CHUNK_TOKENS} + 1,
                       pos * {DC.LINE_CHUNK_TOKENS}
                         + {DC.LINE_CHUNK_TOKENS}), ' ') AS chunk
              FROM g),
            dfreq AS (
              SELECT chunk, count(DISTINCT doc_id) AS df
              FROM c GROUP BY chunk),
            kept AS (
              SELECT c.doc_id, c.pos, c.chunk
              FROM c JOIN dfreq USING (chunk)
              WHERE df <= {DC.LINE_MAX_DF}),
            re AS (
              SELECT doc_id, string_agg(chunk, ' ' ORDER BY pos)
                       AS text_clean,
                     count(*) AS n_kept
              FROM kept GROUP BY doc_id),
            tot AS (
              SELECT doc_id, count(*) AS n_chunks FROM c GROUP BY doc_id)
            SELECT d.doc_id,
                   coalesce(tot.n_chunks, 0) AS n_chunks,
                   coalesce(tot.n_chunks, 0) - coalesce(re.n_kept, 0)
                     AS n_dropped,
                   md5(coalesce(re.text_clean, '')) AS clean_hash
            FROM documents d
            LEFT JOIN tot USING (doc_id)
            LEFT JOIN re USING (doc_id)
            ORDER BY doc_id
        """,
        # mirrors pii.q_pii_scrub: deterministic PII fixture column from
        # doc_id, then the email -> ipv4 -> phone chain with each count
        # taken on that stage's INPUT (matching scrub_pii's sequencing)
        "pii_scrub": f"""
            WITH f AS (
              SELECT doc_id,
                     substr(text, 1, 80)
                       || ' contact user' || CAST(doc_id AS VARCHAR)
                       || '@mail.example.org'
                       || ' from 10.' || CAST(doc_id % 200 AS VARCHAR)
                       || '.' || CAST(doc_id % 250 AS VARCHAR) || '.7'
                       || ' call +1 555-01'
                       || lpad(CAST(doc_id % 100 AS VARCHAR), 2, '0')
                       || '-' || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0')
                       AS t0
              FROM documents),
            s1 AS (SELECT doc_id, t0,
                          regexp_replace(t0, '{PII.PII_RULES[0][1]}',
                                         '<EMAIL>', 'g') AS t1 FROM f),
            s2 AS (SELECT *, regexp_replace(t1, '{PII.PII_RULES[1][1]}',
                                            '<IP>', 'g') AS t2 FROM s1),
            s3 AS (SELECT *, regexp_replace(t2, '{PII.PII_RULES[2][1]}',
                                            '<PHONE>', 'g') AS t3 FROM s2)
            SELECT doc_id, md5(t3) AS scrubbed_hash,
                   CAST(len(regexp_extract_all(t0, '{PII.PII_RULES[0][1]}'))
                        AS BIGINT) AS n_email,
                   CAST(len(regexp_extract_all(t1, '{PII.PII_RULES[1][1]}'))
                        AS BIGINT) AS n_ipv4,
                   CAST(len(regexp_extract_all(t2, '{PII.PII_RULES[2][1]}'))
                        AS BIGINT) AS n_phone
            FROM s3 ORDER BY doc_id
        """,
        "minhash_sig": f"""
            SELECT doc_id, {sig(0)} AS sig0, {sig(1)} AS sig1,
                   {sig(2)} AS sig2, {sig(3)} AS sig3
            FROM documents ORDER BY doc_id
        """,
        "simhash": f"""
            WITH t AS (
              SELECT doc_id,
                     CASE WHEN trim(text) = '' THEN CAST([] AS VARCHAR[])
                          ELSE list_distinct({toks}) END AS toks
              FROM documents)
            SELECT doc_id,
                   CAST({' + '.join(
                       "CASE WHEN list_aggregate(list_transform(toks, t -> "
                       f"CASE WHEN strpos('13579bdf', substr(md5(t), {i + 1}, 1)) > 0 "
                       "THEN 1 ELSE -1 END), 'sum') > 0 "
                       f"THEN {1 << i} ELSE 0 END"
                       for i in range(16)
                   )} AS BIGINT) AS simhash
            FROM t ORDER BY doc_id
        """,
        "simhash64": f"""
            WITH {_simhash64_ctes(toks)}
            SELECT doc_id, band0, band1, band2, band3
            FROM sims ORDER BY doc_id
        """,
        "simhash_near_dup": f"""
            WITH {_simhash64_ctes(toks)},
            bands AS (
              SELECT doc_id, band_id, band_val FROM (
                {" UNION ALL ".join(
                    f"SELECT doc_id, {k} AS band_id, band{k} AS band_val FROM sims"
                    for k in range(T.N_SIMHASH64_BANDS)
                )})),
            bounded AS (
              SELECT doc_id, band_id, band_val FROM (
                SELECT *, count(*) OVER (PARTITION BY band_id, band_val)
                       AS _n
                FROM bands)
              WHERE _n <= {T.MAX_BAND_BUCKET}),
            cand AS (
              SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
              FROM bounded a JOIN bounded b
                ON a.band_id = b.band_id AND a.band_val = b.band_val
                AND a.doc_id < b.doc_id)
            SELECT c.doc_a, c.doc_b,
                   CAST(bit_count(xor(sa.band0, sb.band0)) +
                        bit_count(xor(sa.band1, sb.band1)) +
                        bit_count(xor(sa.band2, sb.band2)) +
                        bit_count(xor(sa.band3, sb.band3)) AS BIGINT)
                     AS hamming
            FROM cand c
            JOIN sims sa ON sa.doc_id = c.doc_a
            JOIN sims sb ON sb.doc_id = c.doc_b
            WHERE bit_count(xor(sa.band0, sb.band0)) +
                  bit_count(xor(sa.band1, sb.band1)) +
                  bit_count(xor(sa.band2, sb.band2)) +
                  bit_count(xor(sa.band3, sb.band3))
                  <= {T.SIMHASH_MAX_HAMMING}
            ORDER BY doc_a, doc_b
        """,
        "minhash_band_pairs": f"""
            WITH {_lsh_ctes(sig)}
            SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
            FROM bounded a JOIN bounded b
              ON a.band_id = b.band_id AND a.band_hash = b.band_hash
              AND a.doc_id < b.doc_id
            ORDER BY doc_a, doc_b
        """,
        "near_dup": f"""
            WITH {_near_dup_ctes(sig, toks)}
            SELECT doc_a, doc_b, jaccard FROM p
            WHERE jaccard >= 0.8 ORDER BY doc_a, doc_b
        """,
        "near_dup_clusters": f"""
            WITH RECURSIVE {_near_dup_ctes(sig, toks)},
            nd AS (SELECT doc_a, doc_b FROM p WHERE jaccard >= 0.8),
            e AS (
              SELECT doc_a AS src, doc_b AS dst FROM nd
              UNION
              SELECT doc_b, doc_a FROM nd),
            reach(src, dst) AS (
              SELECT src, dst FROM e
              UNION
              SELECT r.src, e2.dst FROM reach r JOIN e e2 ON r.dst = e2.src)
            SELECT src AS doc_id,
                   least(src, min(dst)) AS cluster_id,
                   src = least(src, min(dst)) AS is_canonical
            FROM reach GROUP BY src ORDER BY doc_id
        """,
        "dedup_manifest": f"""
            WITH RECURSIVE
            fp AS (
              SELECT doc_id,
                     md5(lower(regexp_replace(trim(text), '\\s+', ' ', 'g')))
                       AS f
              FROM documents),
            grp AS (SELECT f, min(doc_id) AS ec FROM fp GROUP BY f),
            ex AS (SELECT fp.doc_id, grp.ec FROM fp JOIN grp USING (f)),
            surv AS (
              SELECT d.* FROM documents d
              JOIN ex ON d.doc_id = ex.doc_id AND ex.doc_id = ex.ec),
            {_near_dup_ctes(sig, toks, src="surv")},
            nd AS (SELECT doc_a, doc_b FROM p WHERE jaccard >= 0.8),
            e AS (
              SELECT doc_a AS src, doc_b AS dst FROM nd
              UNION
              SELECT doc_b, doc_a FROM nd),
            reach(src, dst) AS (
              SELECT src, dst FROM e
              UNION
              SELECT r.src, e2.dst FROM reach r JOIN e e2 ON r.dst = e2.src),
            lab AS (
              SELECT src AS ec, least(src, min(dst)) AS ndc
              FROM reach GROUP BY src)
            SELECT ex.doc_id,
                   coalesce(lab.ndc, ex.ec) AS canonical_id,
                   ex.doc_id = coalesce(lab.ndc, ex.ec) AS keep
            FROM ex LEFT JOIN lab ON ex.ec = lab.ec
            ORDER BY doc_id
        """,
        # mirrors clusters.q_dedup_manifest_quality: the SAME two-stage
        # manifest CTEs as dedup_manifest, then the survivor re-picked
        # per cluster by argmax quality_score (the q_quality_score
        # formula, rounded to 6 in both engines), ties -> min doc_id
        "dedup_manifest_quality": f"""
            WITH RECURSIVE
            fp AS (
              SELECT doc_id,
                     md5(lower(regexp_replace(trim(text), '\\s+', ' ', 'g')))
                       AS f
              FROM documents),
            grp AS (SELECT f, min(doc_id) AS ec FROM fp GROUP BY f),
            ex AS (SELECT fp.doc_id, grp.ec FROM fp JOIN grp USING (f)),
            surv AS (
              SELECT d.* FROM documents d
              JOIN ex ON d.doc_id = ex.doc_id AND ex.doc_id = ex.ec),
            {_near_dup_ctes(sig, toks, src="surv")},
            nd AS (SELECT doc_a, doc_b FROM p WHERE jaccard >= 0.8),
            e AS (
              SELECT doc_a AS src, doc_b AS dst FROM nd
              UNION
              SELECT doc_b, doc_a FROM nd),
            reach(src, dst) AS (
              SELECT src, dst FROM e
              UNION
              SELECT r.src, e2.dst FROM reach r JOIN e e2 ON r.dst = e2.src),
            lab AS (
              SELECT src AS ec, least(src, min(dst)) AS ndc
              FROM reach GROUP BY src),
            man AS (
              SELECT ex.doc_id,
                     coalesce(lab.ndc, ex.ec) AS canonical_id
              FROM ex LEFT JOIN lab ON ex.ec = lab.ec),
            qs AS (
              SELECT doc_id,
                     round(least(n_tokens / 400.0, 1.0) * 0.5 +
                           (CASE WHEN n_tokens > 0
                                 THEN n_stopwords / CAST(n_tokens AS DOUBLE)
                                 ELSE 0.0 END) * 0.5, 6) AS quality_score
              FROM (SELECT doc_id, CAST({ntoks} AS BIGINT) AS n_tokens,
                           CAST({nstop} AS BIGINT) AS n_stopwords
                    FROM documents)),
            j AS (
              SELECT man.doc_id, man.canonical_id, qs.quality_score
              FROM man JOIN qs USING (doc_id)),
            k AS (
              SELECT canonical_id, doc_id AS kept_id
              FROM (SELECT canonical_id, doc_id,
                           row_number() OVER (PARTITION BY canonical_id
                             ORDER BY quality_score DESC, doc_id ASC) AS rn
                    FROM j)
              WHERE rn = 1)
            SELECT j.doc_id, j.canonical_id, k.kept_id,
                   j.doc_id = k.kept_id AS keep, j.quality_score
            FROM j JOIN k USING (canonical_id)
            ORDER BY doc_id
        """,
        # mirrors corpus.q_lang_quality_quantiles: per-language doc
        # count, mean, and EXACT type-7 percentiles of the 6-rounded
        # quality score (Spark percentile == DuckDB quantile_cont)
        "lang_quality_quantiles": f"""
            WITH qs AS (
              SELECT doc_id,
                     substr(lower(coalesce(lang, 'en')), 1, 2) AS lang2,
                     round(least(n_tokens / 400.0, 1.0) * 0.5 +
                           (CASE WHEN n_tokens > 0
                                 THEN n_stopwords / CAST(n_tokens AS DOUBLE)
                                 ELSE 0.0 END) * 0.5, 6) AS q
              FROM (SELECT doc_id, lang,
                           CAST({ntoks} AS BIGINT) AS n_tokens,
                           CAST({nstop} AS BIGINT) AS n_stopwords
                    FROM documents))
            SELECT lang2, CAST(count(*) AS BIGINT) AS docs,
                   round(avg(q), 6) AS mean_quality,
                   round(quantile_cont(q, 0.5), 6) AS p50_quality,
                   round(quantile_cont(q, 0.9), 6) AS p90_quality
            FROM qs GROUP BY lang2 ORDER BY lang2
        """,
        # mirrors bpe.q_bpe_tokenize: the TRAINED merge table (learned
        # once on the pinned sf0.001 sample, like a persisted tokenizer
        # artifact) inlined as a literal single-char replace chain —
        # count semantics identical to the Spark codegen expression
        "bpe_tokenize": f"""
            SELECT doc_id,
                   CAST({BP.bpe_count_sql(BP.default_model())} AS BIGINT)
                     AS n_bpe_tokens,
                   CAST({ntoks} AS BIGINT) AS n_ws_tokens
            FROM documents ORDER BY doc_id
        """,
        # mirrors robotstxt.parse_robots over the synthetic per-host
        # bodies (group formation, comments, case, empty Disallow)
        "robots_parse": f"""
            {_ROBOTS_CTES}
            SELECT host, CAST(group_id AS BIGINT) AS group_id,
                   agent, rule, path
            FROM parsed
            ORDER BY host, group_id, agent, rule, path
        """,
        # mirrors robotstxt.parse_sitemaps: standalone directive, so a
        # plain key filter over the same line CTEs (no group windows)
        "robots_sitemaps": f"""
            {_ROBOTS_CTES}
            SELECT DISTINCT host, value AS sitemap_url
            FROM rkv
            WHERE key = 'sitemap' AND value <> ''
            ORDER BY host, sitemap_url
        """,
        # mirrors textops.corpus_checksums: 60-bit md5-prefix content
        # hash (Spark conv == DuckDB CAST('0x…')), BIT_XOR per bucket —
        # order-independent, so both engines agree regardless of
        # scheduling; COALESCE matches the Spark side's NULL-text rule
        # (DuckDB concat skips NULLs, Spark concat nulls the row)
        "corpus_checksums": """
            SELECT CAST(doc_id % 16 AS INTEGER) AS bucket,
                   CAST(count(*) AS BIGINT) AS n_docs,
                   bit_xor(CAST(concat('0x',
                     substr(md5(concat(CAST(doc_id AS VARCHAR), '|',
                                       COALESCE(text, ''))), 1, 15))
                     AS BIGINT))
                     AS content_xor
            FROM documents GROUP BY 1 ORDER BY bucket
        """,
        # mirrors robotstxt.parse_sitemap_urls over the synthetic
        # per-host sitemap bodies: one regexp_extract_all for <loc>
        # ([^<]* needs no lazy quantifier), doc-level urlset-vs-index
        # flag, trim + literal entity replaces (&amp; last), dedup,
        # empty-loc drop
        "sitemap_urls": """
            WITH rhosts AS (
              SELECT DISTINCT (doc_id % 40) AS h FROM documents),
            smaps AS (
              SELECT 'www.site' || CAST(h AS VARCHAR) || '.example.com'
                       AS host,
                     CASE WHEN h % 4 = 1 THEN '{s1}'
                          WHEN h % 4 = 2 THEN '{s2}'
                          ELSE '{s3}' END AS body
              FROM rhosts WHERE h % 4 <> 0),
            ex AS (
              SELECT host,
                     lower(body) LIKE '%<sitemapindex%' AS from_index,
                     unnest(regexp_extract_all(body,
                       '(?i)<loc[^>]*>([^<]*)</loc>', 1)) AS raw
              FROM smaps),
            dec AS (
              -- regexp whitespace trim at both ends, matching the Spark
              -- side (SQL trim strips only spaces; pretty-printed
              -- sitemaps newline-pad their locs); two anchored replaces
              -- because DuckDB regexp_replace is first-match-only
              SELECT DISTINCT host,
                     replace(replace(replace(replace(replace(
                       regexp_replace(regexp_replace(raw,
                         '^\\s+', ''), '\\s+$', ''),
                       '&lt;', '<'), '&gt;', '>'), '&quot;', '"'),
                       '&apos;', ''''), '&amp;', '&') AS loc,
                     from_index
              FROM ex)
            SELECT host, loc, from_index FROM dec
            WHERE loc <> '' ORDER BY host, loc
        """.replace(
            "{s1}", RB.SITEMAP_BODY_BY_MOD[1]
        ).replace(
            "{s2}", RB.SITEMAP_BODY_BY_MOD[2]
        ).replace(
            "{s3}", RB.SITEMAP_BODY_BY_MOD[3]
        ),
        # mirrors robotstxt.parse_crawl_delay: group formation with
        # crawl-delay as the recognized directive, numeric values only,
        # MIN per (host, agent)
        "robots_crawl_delay": f"""
            {_robots_ctes(("user-agent", "crawl-delay"))}
            SELECT host, agent,
                   CAST(min(CAST(path AS DOUBLE)) AS DOUBLE) AS crawl_delay
            FROM parsed
            WHERE rule = 'crawl-delay'
              AND regexp_matches(path, '^[0-9]+(\\.[0-9]+)?$')
            GROUP BY host, agent
            ORDER BY host, agent
        """,
        # mirrors robotstxt.robots_verdict for ROBOTS_CHECK_AGENT: group
        # selection (exact token else *), REP wildcard escaping (the
        # shared PATTERN_ESCAPES chain), longest-match precedence with
        # allow winning ties, permissive no-rule default
        "robots_verdict": f"""
            {_ROBOTS_CTES},
            vsel AS (
              SELECT *,
                     max(CASE WHEN agent = '{RB.ROBOTS_CHECK_AGENT}'
                              THEN 1 ELSE 0 END)
                       OVER (PARTITION BY host) AS has_exact
              FROM parsed
              WHERE agent IN ('{RB.ROBOTS_CHECK_AGENT}', '*')),
            arules AS (
              SELECT host, rule, path,
                     length(path) AS patlen,
                     ends_with(path, '$') AS anchored,
                     CASE WHEN ends_with(path, '$')
                          THEN substring(path, 1, length(path) - 1)
                          ELSE path END AS pbody
              FROM vsel
              WHERE agent = '{RB.ROBOTS_CHECK_AGENT}'
                    OR (has_exact = 0 AND agent = '*')),
            rrx AS (
              SELECT host, rule, path, patlen,
                     '^' || {_robots_rx_sql("pbody")}
                         || CASE WHEN anchored THEN '$' ELSE '' END AS rx
              FROM arules),
            vpages AS (
              SELECT doc_id, url,
                     regexp_extract(url, '^[^#]*', 0) AS nofrag
              FROM urls),
            vp2 AS (
              SELECT *, regexp_extract(nofrag,
                           '^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*', 0)
                          AS auth
              FROM vpages),
            vp3 AS (
              SELECT doc_id, url,
                     lower(regexp_extract(url,
                       '^[A-Za-z][A-Za-z0-9+.-]*://([^/?#@]*@)?([^/?#:]*)',
                       2)) AS phost,
                     CASE WHEN auth = ''
                               OR substring(nofrag, length(auth) + 1) = ''
                          THEN '/'
                          ELSE substring(nofrag, length(auth) + 1)
                          END AS ppath
              FROM vp2),
            vm AS (
              SELECT p.doc_id, p.url, r.rule, r.path AS rpath, r.patlen,
                     coalesce(r.host IS NOT NULL
                              AND regexp_matches(p.ppath, r.rx), FALSE)
                       AS is_match,
                     (r.rule = 'allow') AS is_allow
              FROM vp3 p LEFT JOIN rrx r ON p.phost = r.host),
            vr AS (
              SELECT *, row_number() OVER
                       (PARTITION BY doc_id
                        ORDER BY is_match DESC, patlen DESC,
                                 is_allow DESC, rpath DESC) AS rn
              FROM vm)
            SELECT doc_id, url,
                   CASE WHEN is_match THEN is_allow
                        ELSE TRUE END AS robots_allowed,
                   CASE WHEN is_match THEN rule END AS robots_rule,
                   CASE WHEN is_match THEN rpath END AS robots_path
            FROM vr WHERE rn = 1
            ORDER BY doc_id
        """,
        # mirrors qualityclf.with_quality_scores with the deterministic
        # default model inlined as a VALUES weight table (same md5-hex
        # feature buckets, mean, sigmoid; trainer is driver-side numpy)
        "quality_classifier": f"""
            WITH {QC.clf_score_sql(QC.default_model())}
            SELECT doc_id, clf_score FROM cscore ORDER BY doc_id
        """,
        # mirrors policyops.with_synthetic_policy + policy_keep_expr:
        # md5-derived robots/license flags, default keep verdict (the
        # kernel-side HTML harvest is golden-tested in
        # tests/test_policy.py — DuckDB cannot parse HTML)
        "policy_filter": """
            WITH f AS (
              SELECT doc_id,
                     substr(md5(CAST(doc_id AS VARCHAR)), 1, 1) = '0'
                       AS robots_noindex,
                     substr(md5(CAST(doc_id AS VARCHAR)), 2, 1) = '1'
                       AS robots_noarchive,
                     substr(md5(CAST(doc_id AS VARCHAR)), 3, 1)
                       IN ('2', '3') AS robots_noai,
                     CASE WHEN substr(md5(CAST(doc_id AS VARCHAR)), 4, 1)
                               = '4'
                          THEN 'https://creativecommons.org/licenses/by/4.0/'
                          END AS license_url
              FROM documents)
            SELECT doc_id, robots_noindex, robots_noarchive, robots_noai,
                   license_url IS NOT NULL AS has_license,
                   (NOT robots_noindex) AND (NOT robots_noarchive)
                     AND (NOT robots_noai) AS keep
            FROM f ORDER BY doc_id
        """,
        # mirrors textops.corpus_top_ngrams: stride-1 bigram strings,
        # count, deterministic top-50 (count desc, gram asc)
        "top_ngrams": f"""
            WITH t AS (
              SELECT CASE WHEN text IS NULL OR trim(text) = ''
                          THEN CAST([] AS VARCHAR[]) ELSE {toks} END
                       AS tk
              FROM documents),
            g AS (
              SELECT array_to_string(tk[u.i:u.i + 1], ' ') AS gram
              FROM t, unnest(range(1, len(tk))) AS u(i)
              WHERE len(tk) >= 2)
            SELECT gram, count(*) AS c
            FROM g GROUP BY gram
            ORDER BY c DESC, gram ASC LIMIT 50
        """,
        "corpus_stats": """
            SELECT lang, count(*) AS n_docs,
                   count(DISTINCT source) AS n_sources,
                   CAST(sum(n_chars) AS BIGINT) AS total_chars,
                   round(avg(n_chars), 2) AS avg_chars
            FROM documents GROUP BY lang ORDER BY lang
        """,
        "corpus_cardinality": f"""
            SELECT lang, count(*) AS n_docs,
                   count(DISTINCT source) AS n_sources_exact,
                   abs(CAST(approx_count_distinct(source) AS DOUBLE) -
                       count(DISTINCT source))
                     <= {T.APPROX_TOL} * count(DISTINCT source)
                     AS approx_within_tol
            FROM documents GROUP BY lang ORDER BY lang
        """,
        "shingle_jaccard": f"""
            WITH t AS (
              SELECT doc_id, source,
                     CASE WHEN trim(text) = '' OR len({toks}) < {T.W_SHINGLE}
                          THEN CAST([] AS VARCHAR[])
                          ELSE list_distinct(list_transform(
                            generate_series(1, len({toks}) - {T.W_SHINGLE - 1}),
                            i -> substr(md5(array_to_string(
                              list_slice({toks}, i, i + {T.W_SHINGLE - 1}),
                              ' ')), 1, 16)))
                          END AS sh
              FROM documents),
            c AS (
              SELECT source FROM t GROUP BY source
              HAVING count(*) <= {T.MAX_SOURCE_BLOCK}),
            b AS (SELECT t.* FROM t JOIN c USING (source)),
            p AS (
              SELECT a.doc_id AS doc_a, x.doc_id AS doc_b,
                     round(CASE
                       WHEN len(list_distinct(a.sh || x.sh)) > 0
                       THEN len(list_intersect(a.sh, x.sh)) /
                            CAST(len(list_distinct(a.sh || x.sh)) AS DOUBLE)
                       ELSE 0.0 END, 6) AS jaccard
              FROM b a JOIN b x
                ON a.source = x.source AND a.doc_id < x.doc_id)
            SELECT doc_a, doc_b, jaccard FROM p
            WHERE jaccard >= 0.5 ORDER BY doc_a, doc_b
        """,
        "encoding_quality": f"""
            SELECT doc_id,
                   CAST(len(regexp_extract_all(coalesce(text, ''),
                     '{T._REPLACEMENT_CHAR}')) AS BIGINT) AS n_replacement,
                   CAST(len(regexp_extract_all(coalesce(text, ''),
                     '{T._CTRL_CLASS}')) AS BIGINT) AS n_control,
                   CAST(len(regexp_extract_all(coalesce(text, ''),
                     '{T._MOJIBAKE_RE}')) AS BIGINT) AS n_mojibake,
                   len(regexp_extract_all(coalesce(text, ''),
                     '{T._REPLACEMENT_CHAR}'))
                   + len(regexp_extract_all(coalesce(text, ''),
                     '{T._CTRL_CLASS}'))
                   + len(regexp_extract_all(coalesce(text, ''),
                     '{T._MOJIBAKE_RE}')) = 0 AS enc_ok
            FROM documents ORDER BY doc_id
        """,
        # within-doc repeated-chunk removal: same chunking CTEs as
        # line_dedup, first occurrence kept via row_number over pos
        # mirrors substrdedup.substring_dedup: stride-1 k-token window
        # hashes, first occurrence (min doc_id, pos) of a duplicated
        # window survives, other occurrences' spans removed (merged)
        "substring_dedup": f"""
            WITH t AS (
              SELECT doc_id,
                     CASE WHEN text IS NULL OR trim(text) = ''
                          THEN CAST([] AS VARCHAR[]) ELSE {toks} END
                       AS tk
              FROM documents),
            w AS (
              SELECT doc_id, u.i - 1 AS pos,
                     substr(md5(array_to_string(
                       tk[u.i:u.i + {SD.K_SUBSTR} - 1], ' ')), 1, 16) AS h
              FROM t, unnest(range(1, len(tk) - {SD.K_SUBSTR} + 2)) AS u(i)
              WHERE len(tk) >= {SD.K_SUBSTR}),
            v AS (
              SELECT doc_id, pos,
                     count(*) OVER (PARTITION BY h) AS c,
                     row_number() OVER (
                       PARTITION BY h ORDER BY doc_id, pos) AS rn
              FROM w),
            d AS (SELECT doc_id, pos FROM v WHERE c > 1 AND rn > 1),
            tok AS (
              SELECT doc_id, u.i - 1 AS idx, tk[u.i] AS tokval
              FROM t, unnest(range(1, len(tk) + 1)) AS u(i)),
            rem AS (
              SELECT DISTINCT tok.doc_id, idx
              FROM tok JOIN d ON tok.doc_id = d.doc_id
                   AND idx >= d.pos AND idx < d.pos + {SD.K_SUBSTR}),
            kept AS (
              SELECT tok.doc_id, idx, tokval
              FROM tok ANTI JOIN rem USING (doc_id, idx)),
            agg AS (
              SELECT doc_id, count(*) AS n_kept,
                     string_agg(tokval, ' ' ORDER BY idx) AS text_clean
              FROM kept GROUP BY doc_id),
            tot AS (SELECT doc_id, len(tk) AS n_tokens FROM t)
            SELECT tot.doc_id,
                   CAST(tot.n_tokens AS BIGINT) AS n_tokens,
                   CAST(tot.n_tokens - coalesce(agg.n_kept, 0) AS BIGINT)
                     AS n_dup_tokens,
                   md5(coalesce(agg.text_clean, '')) AS clean_hash
            FROM tot LEFT JOIN agg USING (doc_id)
            ORDER BY tot.doc_id
        """,
        "chunk_dedup_within": f"""
            WITH base AS (
              SELECT doc_id,
                     CASE WHEN text IS NULL OR trim(text) = ''
                          THEN CAST([] AS VARCHAR[]) ELSE {toks} END AS tk
              FROM documents),
            b2 AS (
              SELECT doc_id, tk,
                     CAST(ceil(len(tk) / {DC.LINE_CHUNK_TOKENS}.0) AS INT)
                       AS n_chunks
              FROM base),
            g AS (
              SELECT doc_id,
                     unnest(CASE WHEN n_chunks > 0
                       THEN generate_series(0, n_chunks - 1)
                       ELSE CAST([] AS BIGINT[]) END) AS pos,
                     tk
              FROM b2),
            c AS (
              SELECT doc_id, pos,
                     array_to_string(list_slice(tk,
                       pos * {DC.LINE_CHUNK_TOKENS} + 1,
                       pos * {DC.LINE_CHUNK_TOKENS}
                         + {DC.LINE_CHUNK_TOKENS}), ' ') AS chunk
              FROM g),
            fst AS (
              SELECT doc_id, pos, chunk,
                     row_number() OVER (
                       PARTITION BY doc_id, chunk ORDER BY pos) AS rn
              FROM c),
            re AS (
              SELECT doc_id, string_agg(chunk, ' ' ORDER BY pos)
                       AS text_clean,
                     count(*) AS n_kept
              FROM fst WHERE rn = 1 GROUP BY doc_id),
            tot AS (
              SELECT doc_id, count(*) AS n_chunks FROM c GROUP BY doc_id)
            SELECT d.doc_id,
                   CAST(coalesce(tot.n_chunks, 0) AS INT) AS n_chunks,
                   CAST(coalesce(tot.n_chunks, 0) - coalesce(re.n_kept, 0)
                     AS INT) AS n_dupes,
                   md5(coalesce(re.text_clean, '')) AS clean_hash
            FROM documents d
            LEFT JOIN tot USING (doc_id)
            LEFT JOIN re USING (doc_id)
            ORDER BY doc_id
        """,
        # mirrors textops.normalize_text: control strip -> whitespace
        # collapse -> trim -> NFC, same Java∩RE2 character classes
        "text_normalize": f"""
            SELECT doc_id,
                   md5(norm) AS norm_hash,
                   CAST(length(norm) AS BIGINT) AS n_chars_norm,
                   norm <> coalesce(text, '') AS changed
            FROM (
              SELECT doc_id, text,
                     nfc_normalize(trim(regexp_replace(regexp_replace(
                       coalesce(text, ''),
                       '{T._CTRL_CLASS}', '', 'g'),
                       '{T._WS_CLASS}', ' ', 'g'))) AS norm
              FROM documents)
            ORDER BY doc_id
        """,
        # source_cap: the oracle states the SEMANTICS (global top-3 per
        # source, total order) — the Spark side must produce identical
        # rows through its two-stage skew-safe plan
        "source_cap": """
            SELECT doc_id, source, n_chars, rk FROM (
              SELECT doc_id, source, n_chars,
                     CAST(row_number() OVER (
                       PARTITION BY source
                       ORDER BY n_chars DESC, doc_id ASC) AS INT) AS rk
              FROM documents)
            WHERE rk <= 3 ORDER BY source, rk
        """,
        "source_stats": """
            SELECT source,
                   count(*) AS n_docs,
                   CAST(sum(n_chars) AS BIGINT) AS total_chars,
                   round(avg(n_chars), 6) AS mean_chars,
                   count(DISTINCT lang) AS n_langs,
                   max(n_chars) AS max_chars
            FROM documents GROUP BY source ORDER BY source
        """,
        "stratified_sample": f"""
            SELECT doc_id, lang, n_chars FROM documents
            WHERE substr(md5(CAST(doc_id AS VARCHAR)), 1,
                         {SA.SAMPLE_HEX_DIGITS}) <
                  CASE lang
                    {" ".join(
                        f"WHEN '{k}' THEN '{SA.sample_hex_threshold(v)}'"
                        for k, v in sorted(SA.SAMPLE_RATES.items())
                    )}
                    ELSE '{SA.sample_hex_threshold(0.0)}' END
            ORDER BY doc_id
        """,
        # mirrors sampling.shard_assign: per-stratum running token
        # total in doc_id order; shard = floor(start_offset / size)
        "shard_assign": f"""
            WITH s AS (
              SELECT doc_id, lang, CAST({ntoks} AS BIGINT) AS n_tokens
              FROM documents),
            w AS (
              SELECT doc_id, lang, n_tokens,
                     sum(n_tokens) OVER (
                       PARTITION BY lang ORDER BY doc_id
                       ROWS UNBOUNDED PRECEDING) AS cum
              FROM s)
            SELECT doc_id, lang, n_tokens,
                   CAST(floor((cum - n_tokens)
                        / {SA.SHARD_TOKENS}.0) AS BIGINT) AS shard_id
            FROM w ORDER BY doc_id
        """,
        # mirrors sampling.pack_sequences: cumulative token offsets,
        # per-doc sequence range exploded, boundary-straddling docs
        # split into doc-relative [tok_from, tok_to) slices
        "pack_sequences": f"""
            WITH s AS (
              SELECT doc_id, lang, CAST({ntoks} AS BIGINT) AS n_tokens
              FROM documents),
            w AS (
              SELECT doc_id, lang, n_tokens,
                     CAST(sum(n_tokens) OVER (
                       PARTITION BY lang ORDER BY doc_id
                       ROWS UNBOUNDED PRECEDING) - n_tokens
                       AS BIGINT) AS strt
              FROM s),
            p AS (
              SELECT doc_id, lang, strt,
                     CAST(strt + n_tokens AS BIGINT) AS nd
              FROM w WHERE n_tokens > 0),
            e AS (
              SELECT doc_id, lang, strt, nd,
                     unnest(range(strt // {SA.SEQ_LEN},
                                  (nd - 1) // {SA.SEQ_LEN} + 1)) AS seq_id
              FROM p)
            SELECT lang, doc_id, CAST(seq_id AS BIGINT) AS seq_id,
                   CAST(greatest(strt, seq_id * {SA.SEQ_LEN}) - strt
                        AS BIGINT) AS tok_from,
                   CAST(least(nd, (seq_id + 1) * {SA.SEQ_LEN}) - strt
                        AS BIGINT) AS tok_to,
                   CAST(greatest(strt, seq_id * {SA.SEQ_LEN})
                        - seq_id * {SA.SEQ_LEN} AS BIGINT) AS seq_off
            FROM e ORDER BY doc_id, seq_id
        """,
        # mirrors sampling.mixture_sample: rates derived from corpus
        # counts (T = min n/w; rate = min(1, w*T/n)), md5-prefix draw
        # mirrors mixture_sample(weight_col="n_tokens"): identical rate
        # machinery with per-language TOKEN mass as the mix unit (the
        # long sum is exact, so the doubles agree bit-for-bit)
        "mixture_sample_tokens": f"""
            WITH w(lang, w) AS (VALUES {", ".join(
                f"('{k}', {v})"
                for k, v in sorted(SA.MIXTURE_WEIGHTS.items())
            )}),
            s AS (
              SELECT doc_id, lang, CAST({ntoks} AS BIGINT) AS n_tokens
              FROM documents),
            cnt AS (
              SELECT lang, CAST(sum(n_tokens) AS DOUBLE) AS n
              FROM s GROUP BY lang),
            cw AS (SELECT c.lang, c.n, w.w FROM cnt c JOIN w USING (lang)),
            t AS (SELECT min(n / w) AS t FROM cw),
            th AS (
              SELECT lang,
                     CASE WHEN least(1.0, w * t.t / n) >= 1.0
                          THEN 'g'
                          ELSE lpad(lower(hex(CAST(floor(
                                 least(1.0, w * t.t / n)
                                 * {float(16 ** SA.SAMPLE_HEX_DIGITS)})
                               AS BIGINT))), {SA.SAMPLE_HEX_DIGITS}, '0')
                     END AS thresh
              FROM cw CROSS JOIN t)
            SELECT d.doc_id, d.lang, d.n_tokens
            FROM s d LEFT JOIN th USING (lang)
            WHERE substr(md5(CAST(d.doc_id AS VARCHAR)), 1,
                         {SA.SAMPLE_HEX_DIGITS}) < coalesce(thresh, '')
            ORDER BY d.doc_id
        """,
        "mixture_sample": f"""
            WITH w(lang, w) AS (VALUES {", ".join(
                f"('{k}', {v})"
                for k, v in sorted(SA.MIXTURE_WEIGHTS.items())
            )}),
            cnt AS (
              SELECT lang, count(*) AS n FROM documents GROUP BY lang),
            cw AS (SELECT c.lang, c.n, w.w FROM cnt c JOIN w USING (lang)),
            t AS (SELECT min(CAST(n AS DOUBLE) / w) AS t FROM cw),
            th AS (
              SELECT lang,
                     CASE WHEN least(1.0, w * t.t / CAST(n AS DOUBLE))
                               >= 1.0
                          THEN 'g'
                          ELSE lpad(lower(hex(CAST(floor(
                                 least(1.0, w * t.t / CAST(n AS DOUBLE))
                                 * {float(16 ** SA.SAMPLE_HEX_DIGITS)})
                               AS BIGINT))), {SA.SAMPLE_HEX_DIGITS}, '0')
                     END AS thresh
              FROM cw CROSS JOIN t)
            SELECT d.doc_id, d.lang
            FROM documents d LEFT JOIN th USING (lang)
            WHERE substr(md5(CAST(d.doc_id AS VARCHAR)), 1,
                         {SA.SAMPLE_HEX_DIGITS}) < coalesce(thresh, '')
            ORDER BY d.doc_id
        """,
        "token_budget_pack": f"""
            WITH s AS (
              SELECT doc_id, lang,
                     CAST({{ntoks}} AS BIGINT) AS n_tokens,
                     round(least({{ntoks}} / 400.0, 1.0) * 0.5 +
                           (CASE WHEN {{ntoks}} > 0
                            THEN {{nstop}} / CAST({{ntoks}} AS DOUBLE)
                            ELSE 0.0 END) * 0.5, 6) AS quality_score
              FROM documents),
            c AS (
              SELECT *, sum(n_tokens) OVER (
                PARTITION BY lang
                ORDER BY quality_score DESC, doc_id ASC
                ROWS UNBOUNDED PRECEDING) AS cum
              FROM s)
            SELECT doc_id, lang, n_tokens, quality_score FROM c
            WHERE cum <= {SA.PACK_BUDGET} ORDER BY doc_id
        """.format(ntoks=ntoks, nstop=nstop),
        "text_embedding": f"""
            WITH {_text_emb_ctes()}
            SELECT tv.doc_id, bucket, round(val / nrm, 6) AS value
            FROM tv JOIN tn USING (doc_id)
            WHERE val <> 0
            ORDER BY doc_id, bucket
        """,
        "text_emb_near_dup": f"""
            WITH {_text_emb_ctes()},
            arr AS (
              SELECT fe.doc_id,
                     list_transform(generate_series(0, {E.TEXT_EMB_DIM - 1}),
                       b -> CAST(coalesce(list_sum(list_transform(hs, h ->
                         CASE WHEN
                           (16 * (strpos('{_HEX}', substr(h, 1, 1)) - 1) +
                            (strpos('{_HEX}', substr(h, 2, 1)) - 1))
                             % {E.TEXT_EMB_DIM} = b
                           THEN CASE WHEN strpos('13579bdf',
                                             substr(h, 3, 1)) > 0
                                     THEN 1 ELSE -1 END
                           ELSE 0 END)), 0) AS DOUBLE)) AS v
              FROM fe),
            temb AS (
              SELECT arr.doc_id AS vec_id,
                     list_transform(v, x -> x / nrm) AS ed
              FROM arr JOIN tn ON tn.doc_id = arr.doc_id
              WHERE nrm > 0),
            tb0 AS (
              {" UNION ALL ".join(
                  f'''SELECT vec_id, {t} AS t,
                      {_banded_code_sql("ed", t)} AS code FROM temb'''
                  for t in range(E.TEXT_EMB_ND_TABLES)
              )}),
            tb AS (
              SELECT vec_id, t, code FROM (
                SELECT *, count(*) OVER (PARTITION BY t, code) AS _n
                FROM tb0)
              WHERE _n <= {S.EMB_MAX_BUCKET}),
            sgx AS (
              SELECT vec_id, t, code FROM tb0
              UNION ALL {" UNION ALL ".join(
                  f'''SELECT vec_id, {t} AS t,
                      {_banded_code_sql("ed", t,
                          total=2 * E.TEXT_EMB_ND_K * E.TEXT_EMB_ND_TABLES)}
                      AS code FROM temb'''
                  for t in range(E.TEXT_EMB_ND_TABLES,
                                 2 * E.TEXT_EMB_ND_TABLES)
              )}),
            sg AS (
              SELECT vec_id, list(code ORDER BY t) AS cs
              FROM sgx GROUP BY vec_id),
            p0 AS (
              -- signature-Hamming prefilter, mirroring the Spark plan:
              -- Σ_group popcount(code_a XOR code_b) over the 2*k*T-bit
              -- signature (band bits prefix-extended by as many again)
              -- == popcount of the packed signature Spark carries; the
              -- cutoff is the SAME Python-computed integer both
              -- engines interpolate
              SELECT DISTINCT a.vec_id AS doc_a, x.vec_id AS doc_b
              FROM tb a JOIN tb x
                ON a.t = x.t AND a.code = x.code AND a.vec_id < x.vec_id
              JOIN sg ca ON ca.vec_id = a.vec_id
              JOIN sg cb ON cb.vec_id = x.vec_id
              WHERE list_sum(list_transform(list_zip(ca.cs, cb.cs),
                      z -> bit_count(xor(z[1], z[2]))))
                    <= {S.hamming_prefilter_cutoff(
                        E.TEXT_EMB_ND_THRESHOLD,
                        2 * E.TEXT_EMB_ND_K * E.TEXT_EMB_ND_TABLES)}),
            p AS (
              SELECT doc_a, doc_b,
                     round(
                       list_sum(list_transform(list_zip(ea.ed, eb.ed),
                                               z -> z[1] * z[2])) /
                       (sqrt(list_sum(list_transform(ea.ed, x -> x * x))) *
                        sqrt(list_sum(list_transform(eb.ed, x -> x * x)))),
                       6) AS cosine
              FROM p0
              JOIN temb ea ON ea.vec_id = p0.doc_a
              JOIN temb eb ON eb.vec_id = p0.doc_b)
            SELECT doc_a, doc_b, cosine FROM p
            WHERE cosine >= {E.TEXT_EMB_ND_THRESHOLD}
            ORDER BY doc_a, doc_b
        """,
        # mirrors embedding.q_cross_emb_near_dup: the SAME text-emb +
        # banded-code + signature CTEs as text_emb_near_dup, with the
        # corpus split doc_id % CROSS_SPLIT_MOD (batch = 0, existing
        # != 0), the bucket cap computed over the EXISTING side only
        # (the batch is never capped — mirror of the text-LSH cross
        # path), the Hamming prefilter over the full 2*k*T-bit
        # signature, and the exact-cosine verify; output = distinct
        # batch doc_ids to drop
        "cross_emb_near_dup": f"""
            WITH {_text_emb_ctes()},
            arr AS (
              SELECT fe.doc_id,
                     list_transform(generate_series(0, {E.TEXT_EMB_DIM - 1}),
                       b -> CAST(coalesce(list_sum(list_transform(hs, h ->
                         CASE WHEN
                           (16 * (strpos('{_HEX}', substr(h, 1, 1)) - 1) +
                            (strpos('{_HEX}', substr(h, 2, 1)) - 1))
                             % {E.TEXT_EMB_DIM} = b
                           THEN CASE WHEN strpos('13579bdf',
                                             substr(h, 3, 1)) > 0
                                     THEN 1 ELSE -1 END
                           ELSE 0 END)), 0) AS DOUBLE)) AS v
              FROM fe),
            temb AS (
              SELECT arr.doc_id AS vec_id,
                     list_transform(v, x -> x / nrm) AS ed
              FROM arr JOIN tn ON tn.doc_id = arr.doc_id
              WHERE nrm > 0),
            tb0 AS (
              {" UNION ALL ".join(
                  f'''SELECT vec_id, {t} AS t,
                      {_banded_code_sql("ed", t)} AS code FROM temb'''
                  for t in range(E.TEXT_EMB_ND_TABLES)
              )}),
            sgx AS (
              SELECT vec_id, t, code FROM tb0
              UNION ALL {" UNION ALL ".join(
                  f'''SELECT vec_id, {t} AS t,
                      {_banded_code_sql("ed", t,
                          total=2 * E.TEXT_EMB_ND_K * E.TEXT_EMB_ND_TABLES)}
                      AS code FROM temb'''
                  for t in range(E.TEXT_EMB_ND_TABLES,
                                 2 * E.TEXT_EMB_ND_TABLES)
              )}),
            sg AS (
              SELECT vec_id, list(code ORDER BY t) AS cs
              FROM sgx GROUP BY vec_id),
            ebt AS (
              SELECT vec_id, t, code FROM (
                SELECT *, count(*) OVER (PARTITION BY t, code) AS _n
                FROM tb0 WHERE vec_id % {T.CROSS_SPLIT_MOD} <> 0)
              WHERE _n <= {S.EMB_MAX_BUCKET}),
            bbt AS (
              SELECT vec_id, t, code FROM tb0
              WHERE vec_id % {T.CROSS_SPLIT_MOD} = 0),
            cand AS (
              SELECT DISTINCT b.vec_id AS _batch_id,
                              e.vec_id AS _existing_id
              FROM bbt b JOIN ebt e
                ON b.t = e.t AND b.code = e.code
              JOIN sg ca ON ca.vec_id = b.vec_id
              JOIN sg cb ON cb.vec_id = e.vec_id
              WHERE list_sum(list_transform(list_zip(ca.cs, cb.cs),
                      z -> bit_count(xor(z[1], z[2]))))
                    <= {S.hamming_prefilter_cutoff(
                        E.TEXT_EMB_ND_THRESHOLD,
                        2 * E.TEXT_EMB_ND_K * E.TEXT_EMB_ND_TABLES)}),
            v AS (
              SELECT _batch_id,
                     round(
                       list_sum(list_transform(list_zip(ea.ed, eb.ed),
                                               z -> z[1] * z[2])) /
                       (sqrt(list_sum(list_transform(ea.ed, x -> x * x))) *
                        sqrt(list_sum(list_transform(eb.ed, x -> x * x)))),
                       6) AS cosine
              FROM cand
              JOIN temb ea ON ea.vec_id = cand._batch_id
              JOIN temb eb ON eb.vec_id = cand._existing_id)
            SELECT DISTINCT _batch_id AS doc_id FROM v
            WHERE cosine >= {E.TEXT_EMB_ND_THRESHOLD}
            ORDER BY doc_id
        """,
        "multimodal_dedup": """
            SELECT md5(text) AS content_hash,
                   min(doc_id) AS canonical_id,
                   count(*) AS n_copies,
                   'fake' AS format
            FROM documents GROUP BY 1 ORDER BY content_hash
        """,
        "multimodal_meta": """
            SELECT doc_id,
                   CAST(strlen(text) AS BIGINT) AS n_bytes,
                   CAST(strlen(text) % 640 + 1 AS BIGINT) AS fake_width,
                   CAST(strlen(text) % 480 + 1 AS BIGINT) AS fake_height
            FROM documents ORDER BY doc_id
        """,
        "ann_bruteforce": """
            WITH q AS (
              SELECT generate_subscripts(embedding, 1) AS i,
                     unnest(embedding) AS qv
              FROM embeddings WHERE vec_id = 0),
            e AS (
              SELECT vec_id, label,
                     generate_subscripts(embedding, 1) AS i,
                     unnest(embedding) AS ev
              FROM embeddings WHERE vec_id <> 0),
            d AS (
              SELECT vec_id, any_value(label) AS label,
                     sum(CAST(ev AS DOUBLE) * CAST(qv AS DOUBLE)) AS dot,
                     sum(CAST(ev AS DOUBLE) * CAST(ev AS DOUBLE)) AS ne,
                     sum(CAST(qv AS DOUBLE) * CAST(qv AS DOUBLE)) AS nq
              FROM e JOIN q USING (i) GROUP BY vec_id)
            SELECT vec_id, label,
                   round(dot / (sqrt(ne) * sqrt(nq)), 6) AS cosine
            FROM d ORDER BY cosine DESC, vec_id ASC LIMIT 5
        """,
        "knn_label_pairs": f"""
            WITH ok_labels AS (
              SELECT label FROM embeddings GROUP BY label
              HAVING count(*) <= {S.MAX_LABEL_BLOCK}),
            e AS (
              SELECT vec_id, label,
                     generate_subscripts(embedding, 1) AS i,
                     unnest(embedding) AS v
              FROM embeddings WHERE label IN (SELECT label FROM ok_labels)),
            d AS (
              SELECT a.label AS label, a.vec_id AS vec_a, b.vec_id AS vec_b,
                     sum(CAST(a.v AS DOUBLE) * CAST(b.v AS DOUBLE)) AS dot,
                     sum(CAST(a.v AS DOUBLE) * CAST(a.v AS DOUBLE)) AS na,
                     sum(CAST(b.v AS DOUBLE) * CAST(b.v AS DOUBLE)) AS nb
              FROM e a JOIN e b
                ON a.label = b.label AND a.i = b.i AND a.vec_id < b.vec_id
              GROUP BY a.label, a.vec_id, b.vec_id),
            c AS (
              SELECT label, vec_a, vec_b,
                     round(dot / (sqrt(na) * sqrt(nb)), 6) AS cosine
              FROM d)
            SELECT label, vec_a, vec_b, cosine FROM c
            WHERE cosine >= 0.2 ORDER BY label, vec_a, vec_b
        """,
        "ann_lsh": f"""
            SELECT {_lsh_bucket_sql(_SQL_ED)} AS bucket,
                   count(*) AS n_vecs
            FROM embeddings GROUP BY 1 ORDER BY bucket
        """,
        "ann_lsh_topk": f"""
            WITH b AS (
              SELECT vec_id, label, {_SQL_ED} AS ed,
                     {_lsh_bucket_sql(_SQL_ED)} AS bucket
              FROM embeddings),
            q AS (SELECT ed AS qd, bucket AS qb FROM b WHERE vec_id = 0),
            ce AS (
              SELECT b.vec_id, b.label, b.ed FROM b, q
              WHERE b.vec_id <> 0 AND bit_count(xor(b.bucket, q.qb)) <= 1),
            cq AS (SELECT qd FROM q)
            SELECT ce.vec_id, ce.label, {_SQL_COS} AS cosine
            FROM ce CROSS JOIN cq
            ORDER BY cosine DESC, vec_id ASC LIMIT 5
        """,
        "ann_batch_topk": f"""
            WITH b AS (
              SELECT vec_id, label, {_SQL_ED} AS ed,
                     {_lsh_bucket_sql(_SQL_ED)} AS bucket
              FROM embeddings),
            qs AS (
              SELECT vec_id AS query_id, ed AS qd, bucket AS qb
              FROM b WHERE vec_id < 8),
            scored AS (
              SELECT cq.query_id, ce.vec_id, ce.label, {_SQL_COS} AS cosine
              FROM b ce JOIN qs cq
                ON bit_count(xor(ce.bucket, cq.qb)) <= 1
                AND ce.vec_id <> cq.query_id),
            ranked AS (
              SELECT *, row_number() OVER (
                PARTITION BY query_id
                ORDER BY cosine DESC, vec_id ASC) AS rn
              FROM scored)
            SELECT query_id, vec_id, label, cosine FROM ranked
            WHERE rn <= 3 ORDER BY query_id, cosine DESC, vec_id
        """,
        "emb_near_dup": f"""
            WITH {_emb_nd_ctes()}
            SELECT vec_a, vec_b, cosine FROM p
            WHERE cosine >= {S.EMB_NEAR_DUP_THRESHOLD}
            ORDER BY vec_a, vec_b
        """,
        "emb_near_dup_clusters": f"""
            WITH RECURSIVE {_emb_nd_ctes()},
            nd AS (SELECT vec_a, vec_b FROM p
                   WHERE cosine >= {S.EMB_NEAR_DUP_THRESHOLD}),
            e AS (
              SELECT vec_a AS src, vec_b AS dst FROM nd
              UNION
              SELECT vec_b, vec_a FROM nd),
            reach(src, dst) AS (
              SELECT src, dst FROM e
              UNION
              SELECT r.src, e2.dst FROM reach r JOIN e e2 ON r.dst = e2.src)
            SELECT src AS vec_id,
                   least(src, min(dst)) AS cluster_id,
                   src = least(src, min(dst)) AS is_canonical
            FROM reach GROUP BY src ORDER BY vec_id
        """,
        "ann_ivf_cells": f"""
            WITH {_ivf_ctes()}
            SELECT cell, count(*) AS n_vecs
            FROM assigned GROUP BY cell ORDER BY cell
        """,
        "ann_ivf_topk": f"""
            WITH {_ivf_ctes()},
            qprobe AS (
              SELECT vec_id AS query_id, ed AS qd, cid AS cell FROM (
                SELECT d.*, row_number() OVER (
                  PARTITION BY vec_id ORDER BY d.d, d.cid) AS rn
                FROM dists d WHERE vec_id < 8)
              WHERE rn <= {S.IVF_NPROBE}),
            scored AS (
              SELECT cq.query_id, ce.vec_id, ce.label, {_SQL_COS} AS cosine
              FROM assigned ce JOIN qprobe cq USING (cell)
              WHERE ce.vec_id <> cq.query_id),
            ranked AS (
              SELECT *, row_number() OVER (
                PARTITION BY query_id
                ORDER BY cosine DESC, vec_id ASC) AS rn
              FROM scored)
            SELECT query_id, vec_id, label, cosine FROM ranked
            WHERE rn <= 3 ORDER BY query_id, cosine DESC, vec_id
        """,
    }
    # the materialized-index probe must return EXACTLY what the in-flight
    # multi-probe returns — same oracle, different physical read path
    sqls["ann_materialized_topk"] = sqls["ann_lsh_topk"]
    # the materialized-index IVF probe has the SAME result contract as
    # the inline path — one oracle pins both (parity between the two
    # Spark paths is additionally asserted in tests/test_similarity.py)
    sqls["ann_ivf_materialized"] = sqls["ann_ivf_topk"]
    sqls["cross_near_dup"] = _cross_near_dup_sql(sig, toks)
    # overlapping token chunks (retrieval.chunk_documents): exact
    # integer chunk-count/offset arithmetic, inclusive-end list_slice
    # mirrors Spark's (start, length) slice
    _cs, _cstr = RT.CHUNK_SIZE, RT.CHUNK_STRIDE
    sqls["chunk_documents"] = f"""
        WITH t AS (
          SELECT doc_id,
                 CASE WHEN text IS NULL OR trim(text) = ''
                      THEN CAST([] AS VARCHAR[])
                      ELSE regexp_split_to_array(trim(text), '\\s+') END
                   AS toks
          FROM documents),
        m AS (
          SELECT doc_id, toks, len(toks) AS n,
                 CASE WHEN len(toks) = 0 THEN 0
                      WHEN len(toks) <= {_cs} THEN 1
                      ELSE 1 + (len(toks) - {_cs} + {_cstr} - 1)
                               // {_cstr} END AS n_chunks
          FROM t),
        e AS (
          SELECT doc_id, toks, n,
                 unnest(generate_series(0, n_chunks - 1)) AS k
          FROM m)
        SELECT doc_id,
               k AS chunk_id,
               k * {_cstr} AS tok_start,
               least(k * {_cstr} + {_cs}, n) AS tok_end,
               array_to_string(
                 list_slice(toks, k * {_cstr} + 1,
                            least(k * {_cstr} + {_cs}, n)), ' ')
                 AS chunk_text
        FROM e ORDER BY doc_id, chunk_id
    """
    # interpolated bigram LM (lmquality.bigram_logprob): top-V unigram +
    # top-B pair tables from integer counts, Jelinek-Mercer mixture with
    # float-exact lambda, position 1 pure unigram, OOV context ->
    # (1-lam) * p_uni; same literal association order as the Spark side
    _lam, _one_m = LM.BIGRAM_LAMBDA, 1.0 - LM.BIGRAM_LAMBDA
    sqls["bigram_logprob"] = f"""
        WITH t AS (
          SELECT doc_id,
                 CASE WHEN text IS NULL OR trim(text) = ''
                      THEN CAST([] AS VARCHAR[])
                      ELSE regexp_split_to_array(trim(text), '\\s+') END
                   AS toks
          FROM documents),
        tf AS (
          SELECT token, count(*) AS c
          FROM (SELECT unnest(toks) AS token FROM t) GROUP BY token),
        top AS (
          SELECT token, c FROM tf
          ORDER BY c DESC, token ASC LIMIT {LM.DEFAULT_VOCAB_SIZE}),
        tot AS (SELECT CAST(sum(c) AS DOUBLE) AS total FROM tf),
        bf AS (
          SELECT pair, count(*) AS c FROM (
            SELECT unnest(list_transform(
                     generate_series(1, len(toks) - 1),
                     i -> toks[i] || ' ' || toks[i + 1])) AS pair
            FROM t WHERE len(toks) >= 2)
          GROUP BY pair),
        btop AS (
          SELECT pair, c FROM bf
          ORDER BY c DESC, pair ASC LIMIT {LM.DEFAULT_BIGRAM_SIZE}),
        pos AS (
          SELECT doc_id, toks[i] AS w,
                 CASE WHEN i > 1 THEN toks[i - 1] END AS prev
          FROM (SELECT doc_id, toks,
                       unnest(generate_series(1, len(toks))) AS i
                FROM t)),
        sc AS (
          SELECT p.doc_id, p.prev,
                 u.c AS c_w, pu.c AS c_prev, b.c AS c_pw, tot.total
          FROM pos p
          LEFT JOIN top u ON u.token = p.w
          LEFT JOIN top pu ON pu.token = p.prev
          LEFT JOIN btop b
            ON p.prev IS NOT NULL AND b.pair = p.prev || ' ' || p.w
          CROSS JOIN tot),
        terms AS (
          SELECT doc_id,
                 CASE WHEN prev IS NULL
                      THEN coalesce(c_w, 1) / total
                      WHEN c_prev IS NULL
                      THEN {_one_m} * (coalesce(c_w, 1) / total)
                      ELSE {_lam} * (coalesce(c_pw, 0) /
                                     CAST(c_prev AS DOUBLE))
                           + {_one_m} * (coalesce(c_w, 1) / total) END
                   AS p,
                 CASE WHEN c_pw IS NOT NULL THEN 1 ELSE 0 END AS hit
          FROM sc),
        per AS (
          SELECT doc_id, count(*) AS n_tokens,
                 CAST(sum(hit) AS BIGINT) AS n_bigram_hits,
                 sum(ln(p)) AS s
          FROM terms GROUP BY doc_id)
        SELECT d.doc_id,
               CAST(coalesce(p.n_tokens, 0) AS BIGINT) AS n_tokens,
               CAST(coalesce(p.n_bigram_hits, 0) AS BIGINT)
                 AS n_bigram_hits,
               CASE WHEN coalesce(p.n_tokens, 0) > 0
                    THEN round(p.s / p.n_tokens, {LM.LOGPROB_DECIMALS})
                    END AS lm2_logprob
        FROM documents d LEFT JOIN per p USING (doc_id)
        ORDER BY d.doc_id
    """
    # recrawl scheduler: latest fetch per url, integer day staleness vs
    # the in-plan max date, ln(1 + host size) weight rounded BEFORE the
    # per-host rank (both engines rank the identical 6-digit value);
    # naive-window semantics = the two-stage top_k_per_key result
    sqls["recrawl_schedule"] = f"""
        WITH {_URLS_CTE},
        pages AS (
          SELECT url,
                 DATE '2024-01-01'
                   + CAST(doc_id * 7 % 365 AS INTEGER) AS fetch_date
          FROM urls),
        latest AS (
          SELECT url, max(fetch_date) AS fetch_date FROM pages GROUP BY url),
        h AS (
          SELECT url, fetch_date,
                 lower(regexp_extract(url, '{_HOST_RE}', 1)) AS host
          FROM latest),
        b AS (SELECT max(fetch_date) AS as_of FROM h),
        sz AS (SELECT host, count(*) AS n FROM h GROUP BY host),
        sc AS (
          SELECT h.url, h.host,
                 (b.as_of - h.fetch_date) AS age_days,
                 round((b.as_of - h.fetch_date) * ln(1.0 + sz.n), 6)
                   AS priority
          FROM h CROSS JOIN b JOIN sz USING (host)),
        r AS (
          SELECT *, row_number() OVER (
            PARTITION BY host ORDER BY priority DESC, url) AS rk
          FROM sc)
        SELECT url, host, age_days, priority, rk FROM r
        WHERE rk <= {U.RECRAWL_PER_HOST} ORDER BY host, rk
    """
    # deterministic split bands over the md5('split:' || id) draw —
    # same hex-prefix machinery as deterministic_sample
    _tt = SA.sample_hex_threshold(SA.SPLIT_TEST_FRAC)
    _tv = SA.sample_hex_threshold(SA.SPLIT_TEST_FRAC + SA.SPLIT_VAL_FRAC)
    sqls["corpus_split"] = f"""
        SELECT doc_id,
               CASE WHEN substr(md5('split:' || CAST(doc_id AS VARCHAR)),
                                1, {SA.SAMPLE_HEX_DIGITS}) < '{_tt}'
                    THEN 'test'
                    WHEN substr(md5('split:' || CAST(doc_id AS VARCHAR)),
                                1, {SA.SAMPLE_HEX_DIGITS}) < '{_tv}'
                    THEN 'val'
                    ELSE 'train' END AS split
        FROM documents ORDER BY doc_id
    """
    # BM25 (operators/retrieval.py): Lucene idf, corpus-standard
    # whitespace tokens, score expression written with the same
    # association order as the Spark side, 6-rounded before the top-k
    _terms = ", ".join(f"'{t}'" for t in RT.BM25_QUERY)
    _k1, _b = RT.BM25_K1, RT.BM25_B
    sqls["bm25_topk"] = f"""
        WITH t AS (
          SELECT doc_id,
                 CASE WHEN trim(text) = '' THEN CAST([] AS VARCHAR[])
                      ELSE regexp_split_to_array(trim(text), '\\s+') END
                   AS toks
          FROM documents),
        base AS (SELECT doc_id, toks, len(toks) AS dl FROM t),
        stats AS (
          SELECT count(*) AS n_docs, sum(dl) AS sum_dl FROM base),
        tf AS (
          SELECT doc_id, dl, term, count(*) AS tf
          FROM (SELECT doc_id, dl, unnest(toks) AS term FROM base)
          WHERE term IN ({_terms})
          GROUP BY 1, 2, 3),
        dft AS (SELECT term, count(*) AS df FROM tf GROUP BY 1),
        s AS (
          SELECT tf.doc_id,
                 ln(1.0 + (stats.n_docs - dft.df + 0.5) / (dft.df + 0.5))
                 * (tf.tf * {_k1 + 1.0})
                 / (tf.tf + {_k1} * ({1.0 - _b} + {_b} * tf.dl /
                      (CAST(stats.sum_dl AS DOUBLE) / stats.n_docs)))
                   AS sc
          FROM tf JOIN dft USING (term) CROSS JOIN stats)
        SELECT doc_id, count(*) AS n_terms, round(sum(sc), 6) AS score
        FROM s GROUP BY doc_id
        ORDER BY score DESC, doc_id LIMIT {RT.BM25_TOPK}
    """
    # the materialized-postings BM25 probe must return EXACTLY what the
    # inline path returns — same oracle, different physical read path
    # (pruning-enforced at construction; parity also test-pinned)
    sqls["bm25_materialized"] = sqls["bm25_topk"]
    # SemDeDup: within-cell pairwise cosine over the seeded IVF cells,
    # transitive closure, keeper = farthest-from-centroid (d from the
    # same dists CTE the assignment argmin uses, rounded 6 like the
    # Spark side)
    sqls["semantic_dedup"] = f"""
        WITH RECURSIVE {_ivf_ctes()},
        bnd AS (
          SELECT vec_id, ed, cell FROM (
            SELECT *, count(*) OVER (PARTITION BY cell) AS _n
            FROM assigned)
          WHERE _n <= {S.SEM_MAX_CELL}),
        p AS (
          SELECT ce.vec_id AS vec_a, cq.vec_id AS vec_b,
                 round(
                   list_sum(list_transform(list_zip(ce.ed, cq.ed),
                                           z -> z[1] * z[2])) /
                   (sqrt(list_sum(list_transform(ce.ed, x -> x * x))) *
                    sqrt(list_sum(list_transform(cq.ed, x -> x * x)))),
                   6) AS cosine
          FROM bnd ce JOIN bnd cq
            ON ce.cell = cq.cell AND ce.vec_id < cq.vec_id),
        nd AS (SELECT vec_a, vec_b FROM p
               WHERE cosine >= {S.SEM_DEDUP_THRESHOLD}),
        e AS (
          SELECT vec_a AS src, vec_b AS dst FROM nd
          UNION
          SELECT vec_b, vec_a FROM nd),
        reach(src, dst) AS (
          SELECT src, dst FROM e
          UNION
          SELECT r.src, e2.dst FROM reach r JOIN e e2 ON r.dst = e2.src),
        comp AS (
          SELECT src AS vec_id, least(src, min(dst)) AS cluster_id
          FROM reach GROUP BY src),
        dc AS (
          SELECT d.vec_id, round(d.d, 6) AS d
          FROM dists d JOIN assigned a
            ON d.vec_id = a.vec_id AND d.cid = a.cell),
        mem AS (
          SELECT a.vec_id,
                 COALESCE(c.cluster_id, a.vec_id) AS cluster_id,
                 dc.d
          FROM assigned a
          LEFT JOIN comp c USING (vec_id)
          JOIN dc USING (vec_id)),
        keepr AS (
          SELECT cluster_id, vec_id AS keeper FROM (
            SELECT *, row_number() OVER (
              PARTITION BY cluster_id ORDER BY d DESC, vec_id) AS rn
            FROM mem)
          WHERE rn = 1)
        SELECT m.vec_id, m.cluster_id, m.vec_id = k.keeper AS keep
        FROM mem m JOIN keepr k USING (cluster_id)
        ORDER BY vec_id
    """
    return sqls
