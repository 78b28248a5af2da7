"""End-to-end training-corpus preparation: the composition a 100 TB text
pipeline actually runs — extraction, then quality/language signals and
dedup manifests over the EXTRACTED text (not the raw crawl).

    pages ──run_extraction──> extracted(ok)
        ├── quality signals (tokens, stopword ratio, score)
        ├── language guess (stopword votes)
        ├── exact-dup manifest (normalized-text md5)
        └── near-dup candidate pairs (MinHash bands on extracted text)
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from readability_ex_spark.pipeline import run_extraction

from readability_ex_spark.operators.tokenize import ws_tokens


def _tokens(col: str):
    return ws_tokens(col)


def with_quality_signals(extracted: DataFrame, text_col: str = "text") -> DataFrame:
    """Token counts, stopword ratio, and a composite quality score over
    the extracted text — all JVM-side expressions."""
    n_tokens = F.size(_tokens(text_col)).cast("long")
    n_stop = F.regexp_count(
        F.col(text_col), F.lit(r"\b(the|a|of|and|to)\b")
    ).cast("long")
    stop_ratio = F.when(n_tokens > 0, n_stop / n_tokens.cast("double")).otherwise(
        F.lit(0.0)
    )
    len_part = F.least(n_tokens.cast("double") / F.lit(400.0), F.lit(1.0))
    return extracted.withColumns(
        {
            "n_tokens": n_tokens,
            "stopword_ratio": F.round(stop_ratio, 6),
            "quality_score": F.round(len_part * 0.5 + stop_ratio * 0.5, 6),
        }
    )


# ---------------------------------------------------------------------------
# Gopher/C4-style quality rules (Rae et al. 2021 "Scaling Language Models",
# Raffel et al. 2020 C4): the filter set an actual corpus build runs, as
# codegen'd column expressions — no Python in the hot path, every rule
# DuckDB-expressible for the oracle. Thresholds follow the Gopher paper
# where it states one; the digit-ratio and duplicate-line rules follow
# C4/CCNet practice.
# ---------------------------------------------------------------------------
GOPHER_MIN_WORDS = 50
GOPHER_MAX_WORDS = 100_000
GOPHER_MIN_MEAN_WORD_LEN = 3.0
GOPHER_MAX_MEAN_WORD_LEN = 10.0
GOPHER_MAX_SYMBOL_RATIO = 0.1  # '#' or ellipsis per word
GOPHER_MAX_BULLET_FRAC = 0.9  # lines starting with a bullet
GOPHER_MAX_ELLIPSIS_FRAC = 0.3  # lines ending with an ellipsis
GOPHER_MIN_ALPHA_FRAC = 0.8  # words containing >= 1 alphabetic char
GOPHER_MIN_STOPWORDS = 2  # of the 8-word Gopher stop set
C4_MAX_DUP_LINE_FRAC = 0.3  # duplicate (trimmed, non-empty) lines
MAX_DIGIT_RATIO = 0.2  # digit chars per char

# the Gopher paper's stop set, verbatim
GOPHER_STOPWORDS = ("the", "be", "to", "of", "and", "that", "have", "with")

# Per-language stop sets, keyed by BCP-47 primary subtag: 8 high-frequency
# function words each, mirroring the Gopher set's role. Latin-script
# sets are ASCII-only so the \b word-boundary semantics match between
# Spark (Java regex) and the DuckDB oracle (RE2); CJK sets are counted
# as plain substrings (no \b — Java's default \w is ASCII, so \b around
# a CJK char never matches, and Chinese has no space-delimited word
# boundaries anyway — see stopword_pattern). A language with no entry
# gets NO stop-word rule (it passes vacuously — applying the English
# set to e.g. Japanese would kill every document); a NULL/unknown lang
# falls back to English, matching the rule set's documented "run after
# language routing" precondition.
STOPWORDS_BY_LANG: dict[str, tuple[str, ...]] = {
    "en": GOPHER_STOPWORDS,
    "fr": ("le", "la", "les", "de", "et", "que", "pour", "dans"),
    "de": ("der", "die", "das", "und", "ist", "nicht", "mit", "ein"),
    "es": ("el", "la", "los", "de", "que", "y", "en", "un"),
    "zh": ("的", "了", "是", "在", "和", "不", "有", "这"),
}


def stopword_pattern(words: tuple[str, ...]) -> str:
    """Counting regex for a stop set, shared verbatim by the Spark
    expression and the DuckDB oracle: ``\\b``-wrapped alternation for
    ASCII word lists, plain substring alternation for non-ASCII (CJK)
    lists, where ``\\b`` is meaningless in both engines (ASCII ``\\w``)
    and unsegmented text has no word boundaries to anchor to."""
    body = "(" + "|".join(words) + ")"
    if all(w.isascii() for w in words):
        return r"\b" + body + r"\b"
    return body


def with_quality_rules(
    df: DataFrame, text_col: str = "text", lang_col: str = "lang"
) -> DataFrame:
    """Annotate each document with the Gopher/C4 quality signals, one
    boolean per rule, and ``passes_quality`` = AND of all rules.

    Every signal is a JVM-side (codegen) column expression over the raw
    text — at 100 TB this is a free map stage fused into the scan.
    Empty/whitespace-only text fails the word-count rule and reports 0.0
    for every ratio (guarded divisions).

    The stop-word rule is LANGUAGE-ROUTED when ``lang_col`` exists in
    ``df`` (one CASE over ``STOPWORDS_BY_LANG``, still pure codegen):
    each document is scored against its own language's stop set; a
    language with no stop set passes the rule vacuously; NULL/unknown
    lang falls back to English. Without a lang column the English set
    applies to everything (the pre-routing behavior).

    Measured kill rates on the synthetic sf0.01 documents table
    (single-line word-salad text, so the line-shape rules never trigger
    there): word_count 44.6% (many synthetic docs are < 50 words),
    every other rule ~0% once stopwords are lang-routed; overall drop
    dominated by word_count.
    """
    c = F.col(text_col)
    empty_arr = F.array().cast("array<string>")
    words = ws_tokens(text_col)
    n_words = F.size(words).cast("long")
    nw = n_words.cast("double")

    def ratio(num, den):
        return F.when(den > 0, num.cast("double") / den).otherwise(F.lit(0.0))

    mean_word_len = ratio(
        F.length(F.regexp_replace(F.trim(c), r"\s+", "")), nw
    )
    symbol_ratio = ratio(F.regexp_count(c, F.lit(r"#|\.\.\.|…")), nw)
    alpha_frac = ratio(
        F.size(F.filter(words, lambda w: w.rlike("[A-Za-z]"))), nw
    )
    def _stop_count(words_tuple):
        return F.regexp_count(
            F.lower(c), F.lit(stopword_pattern(words_tuple))
        ).cast("long")

    if lang_col in df.columns:
        lp = F.lower(F.coalesce(F.col(lang_col), F.lit("en"))).substr(1, 2)
        n_stop = F.lit(None).cast("long")
        for tag, words_tuple in STOPWORDS_BY_LANG.items():
            n_stop = F.when(lp == tag, _stop_count(words_tuple)).otherwise(
                n_stop
            )
        # unknown lang: English count as an informative signal only —
        # the rule below does not bind for it
        n_stop = F.coalesce(n_stop, _stop_count(GOPHER_STOPWORDS))
        stop_rule = F.when(
            lp.isin(list(STOPWORDS_BY_LANG)),
            n_stop >= GOPHER_MIN_STOPWORDS,
        ).otherwise(F.lit(True))
    else:
        n_stop = _stop_count(GOPHER_STOPWORDS)
        stop_rule = n_stop >= GOPHER_MIN_STOPWORDS
    lines = F.when(c.isNull(), empty_arr).otherwise(
        F.filter(
            F.transform(F.split(c, "\n"), lambda l: F.trim(l)),
            lambda l: l != "",
        )
    )
    n_lines = F.size(lines).cast("double")
    bullet_frac = ratio(
        F.size(F.filter(lines, lambda l: l.rlike("^[-*•]"))), n_lines
    )
    ellipsis_frac = ratio(
        F.size(F.filter(lines, lambda l: l.rlike(r"(\.\.\.|…)$"))), n_lines
    )
    dup_line_frac = ratio(
        n_lines - F.size(F.array_distinct(lines)).cast("double"), n_lines
    )
    digit_ratio = ratio(F.regexp_count(c, F.lit("[0-9]")), F.length(c).cast("double"))

    rules = {
        "r_word_count": (n_words >= GOPHER_MIN_WORDS)
        & (n_words <= GOPHER_MAX_WORDS),
        "r_mean_word_len": (mean_word_len >= GOPHER_MIN_MEAN_WORD_LEN)
        & (mean_word_len <= GOPHER_MAX_MEAN_WORD_LEN),
        "r_symbol_ratio": symbol_ratio <= GOPHER_MAX_SYMBOL_RATIO,
        "r_bullet_frac": bullet_frac <= GOPHER_MAX_BULLET_FRAC,
        "r_ellipsis_frac": ellipsis_frac <= GOPHER_MAX_ELLIPSIS_FRAC,
        "r_alpha_frac": alpha_frac >= GOPHER_MIN_ALPHA_FRAC,
        "r_stopwords": stop_rule,
        "r_dup_lines": dup_line_frac <= C4_MAX_DUP_LINE_FRAC,
        "r_digit_ratio": digit_ratio <= MAX_DIGIT_RATIO,
    }
    passes = None
    for expr in rules.values():
        passes = expr if passes is None else (passes & expr)
    return df.withColumns(
        {
            "n_words": n_words,
            "mean_word_len": F.round(mean_word_len, 6),
            "symbol_ratio": F.round(symbol_ratio, 6),
            "bullet_frac": F.round(bullet_frac, 6),
            "ellipsis_frac": F.round(ellipsis_frac, 6),
            "alpha_frac": F.round(alpha_frac, 6),
            "n_stopwords_g": n_stop,
            "dup_line_frac": F.round(dup_line_frac, 6),
            "digit_ratio": F.round(digit_ratio, 6),
            **rules,
            "passes_quality": passes,
        }
    )


# -- Gopher repetition rules (Rae et al. 2021 table A1) --------------------
# Thresholds from the paper: top 2-gram <= 0.20, top 3-gram <= 0.18,
# duplicate 6-gram <= 0.14 of characters. "Characters of a gram" = length
# of the space-joined token window; our top-n variant scores
# max(count * chars) over grams (the paper's "most frequent n-gram" is
# tie-ambiguous; max coverage is deterministic and identical near the
# threshold where it matters).
GOPHER_MAX_TOP2GRAM_FRAC = 0.20
GOPHER_MAX_TOP3GRAM_FRAC = 0.18
GOPHER_MAX_DUP6GRAM_FRAC = 0.14
REP_NGRAM_SIZES = (2, 3, 6)


def repetition_stats(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Per-document n-gram repetition coverage (Gopher repetition rules).

    Returns ``(id_col, top2gram_frac, top3gram_frac, dup6gram_frac,
    r_top2gram, r_top3gram, r_dup6gram)`` — fractions of normalized-text
    characters covered by the dominant 2-/3-gram and by all duplicated
    6-grams.

    The stats are DOCUMENT-LOCAL (no cross-doc state), so the plan is
    one map-only Arrow pass — no shuffle at all. A first cut exploded
    all three gram sizes through two hash aggregations and measured
    23.7 s at sf0.1 (45M tagged gram STRINGS through an exchange); this
    version is ~20x faster and byte-identical: tokens factorize to int
    codes per doc, an n-gram is the void-view of n consecutive codes
    (EXACT equality — no hash collisions), counts come from np.unique,
    and per-window char counts from a cumsum of token lengths. The
    tokenization is the same JVM-side expression the DuckDB oracle
    mirrors.  Spam pages (repeated boilerplate/keyword stuffing) blow
    past the thresholds; prose sits far below.
    """
    toks = ws_tokens(text_col, lower=True)

    import numpy as np
    from pyspark.sql.functions import pandas_udf

    sizes = REP_NGRAM_SIZES

    @pandas_udf("array<double>")
    def _rep(tok_arrs: pd.Series) -> pd.Series:
        t2o, t3o, d6o = [], [], []
        for arr in tok_arrs:
            toks_np = np.asarray(arr if arr is not None else [], dtype=object)
            n_tok = len(toks_np)
            if n_tok == 0:
                t2o.append(0.0), t3o.append(0.0), d6o.append(0.0)
                continue
            lens = np.fromiter((len(t) for t in toks_np), np.int64, n_tok)
            # chars of window [i, i+n) = csum[i+n] - csum[i] - 1
            # (tokens joined by single spaces)
            csum = np.zeros(n_tok + 1, np.int64)
            np.cumsum(lens + 1, out=csum[1:])
            total = int(csum[n_tok] - 1)
            _, codes = np.unique(toks_np, return_inverse=True)
            codes = np.ascontiguousarray(codes, dtype=np.int32)
            covs = {}
            for n in sizes:
                if n_tok < n:
                    covs[n] = (0, 0)
                    continue
                wins = np.lib.stride_tricks.sliding_window_view(codes, n)
                keys = np.ascontiguousarray(wins).view(
                    [("", np.int32)] * n
                ).ravel()
                _, first, counts = np.unique(
                    keys, return_index=True, return_counts=True
                )
                chars = csum[first + n] - csum[first] - 1
                cov = counts * chars
                covs[n] = (
                    int(cov.max()) if len(cov) else 0,
                    int(cov[counts >= 2].sum()),
                )
            # rounding stays Spark-side: F.round is HALF_UP like the
            # DuckDB oracle's round(); Python's round() is HALF_EVEN
            t2o.append(covs[2][0] / total if total > 0 else 0.0)
            t3o.append(covs[3][0] / total if total > 0 else 0.0)
            d6o.append(covs[6][1] / total if total > 0 else 0.0)
        return pd.Series(
            [[a, b, c] for a, b, c in zip(t2o, t3o, d6o)]
        )

    out = df.select(id_col, _rep(toks).alias("s")).select(
        id_col,
        F.round(F.col("s")[0], 6).alias("top2gram_frac"),
        F.round(F.col("s")[1], 6).alias("top3gram_frac"),
        F.round(F.col("s")[2], 6).alias("dup6gram_frac"),
    )
    return out.withColumns(
        {
            "r_top2gram": F.col("top2gram_frac") <= GOPHER_MAX_TOP2GRAM_FRAC,
            "r_top3gram": F.col("top3gram_frac") <= GOPHER_MAX_TOP3GRAM_FRAC,
            "r_dup6gram": F.col("dup6gram_frac") <= GOPHER_MAX_DUP6GRAM_FRAC,
        }
    )


def q_repetition_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return repetition_stats(docs).orderBy("doc_id")


def q_quality_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher/C4 quality-rule signals + per-rule verdicts per document."""
    from readability_ex_spark.operators.textops import _docs

    return with_quality_rules(_docs(spark, sf_dir)).select(
        "doc_id",
        "n_words",
        "mean_word_len",
        "symbol_ratio",
        "bullet_frac",
        "ellipsis_frac",
        "alpha_frac",
        "n_stopwords_g",
        "dup_line_frac",
        "digit_ratio",
        "r_word_count",
        "r_mean_word_len",
        "r_symbol_ratio",
        "r_bullet_frac",
        "r_ellipsis_frac",
        "r_alpha_frac",
        "r_stopwords",
        "r_dup_lines",
        "r_digit_ratio",
        "passes_quality",
    ).orderBy("doc_id")


def q_lang_quality_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-language quality distribution: doc count, mean, exact p50 and
    p90 of the composite quality score — the rollup a dataset card (or a
    per-language quality floor) is cut against.  ``F.percentile`` is the
    EXACT linear-interpolation percentile (same type-7 interpolation as
    DuckDB's ``quantile_cont``), so the oracle twins it bit-for-bit on
    the 6-rounded scores; at 100 TB the approximate sketch
    (``approx_percentile``) replaces it with one config change — the
    rollup shape (one hash agg over #langs groups) is identical."""
    from readability_ex_spark.operators.textops import q_quality_score

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    scores = q_quality_score(spark, sf_dir).select("doc_id", "quality_score")
    per_doc = docs.select(
        "doc_id", F.substring(F.lower(F.coalesce("lang", F.lit("en"))), 1, 2).alias("lang2")
    ).join(scores, "doc_id")
    return (
        per_doc.groupBy("lang2")
        .agg(
            F.count("*").cast("long").alias("docs"),
            F.round(F.avg("quality_score"), 6).alias("mean_quality"),
            F.round(F.percentile("quality_score", F.lit(0.5)), 6).alias("p50_quality"),
            F.round(F.percentile("quality_score", F.lit(0.9)), 6).alias("p90_quality"),
        )
        .orderBy("lang2")
    )


def exact_dup_manifest(
    extracted: DataFrame,
    text_col: str = "text",
    id_col: str = "url",
    canonical_col: str = "canonical_url",
) -> DataFrame:
    """id -> (fingerprint, canonical id, n_copies) over normalized text."""
    norm = F.lower(F.regexp_replace(F.trim(F.col(text_col)), r"\s+", " "))
    fp = extracted.select(F.col(id_col), F.md5(norm).alias("fingerprint"))
    groups = fp.groupBy("fingerprint").agg(
        F.min(id_col).alias(canonical_col), F.count("*").alias("n_copies")
    )
    return fp.join(groups, "fingerprint")


def near_dup_pairs(
    extracted: DataFrame,
    text_col: str = "text",
    n_bands: int = 3,
    rows_per_band: int = 2,
    max_bucket: int = 1000,
) -> DataFrame:
    """b-bands × r-rows MinHash-LSH candidate pairs over extracted text.

    Delegates to ``textops.lsh_band_candidates`` (the single candidate
    path): bands OR-ed for recall 1-(1-j^r)^b, buckets capped at
    ``max_bucket`` so a degenerate boilerplate bucket (identical texts
    behind millions of urls at crawl scale) never turns quadratic.
    Members of a dropped bucket are by definition exact-ish duplicates —
    the exact-dup manifest handles them at linear cost."""
    from readability_ex_spark.operators.textops import lsh_band_candidates

    return lsh_band_candidates(
        extracted,
        id_col="url",
        text_col=text_col,
        n_bands=n_bands,
        rows_per_band=rows_per_band,
        max_bucket=max_bucket,
    ).select(F.col("id_a").alias("url_a"), F.col("id_b").alias("url_b"))


def dedup_keep_manifest(
    extracted: DataFrame,
    text_col: str = "text",
    near_dup_threshold: float = 0.8,
    n_bands: int = 3,
    rows_per_band: int = 2,
    max_bucket: int = 1000,
    id_col: str = "url",
    canonical_col: str = "canonical_url",
) -> DataFrame:
    """url -> (fingerprint, n_copies, canonical_url, keep): the complete
    dedup decision combining exact groups and near-dup clusters, with no
    document silently falling out of coverage.

    Stage order IS the dropped-bucket fallback the LSH cap relies on:

    1. exact groups collapse first (one linear md5 shuffle). Members of
       a boilerplate bucket that would exceed the LSH cap are exact-ish
       duplicates — their group already collapsed to one survivor here,
       so the bucket the LSH pass later sees is below cap (or the
       residual members genuinely differ and belong in the verify);
    2. the capped b×r LSH candidate join + token-Jaccard verify runs on
       the exact SURVIVORS only;
    3. verified pairs resolve into connected components (bounded
       min-label propagation, ``clusters.near_dup_clusters``) and each
       component keeps its min url.

    canonical_url composes both stages: url -> exact canonical ->
    near-dup cluster canonical. keep = (url == canonical_url).
    """
    from readability_ex_spark.operators.clusters import near_dup_clusters
    from readability_ex_spark.operators.textops import near_dup_verified_pairs

    exact = exact_dup_manifest(
        extracted, text_col=text_col, id_col=id_col, canonical_col=canonical_col
    # referenced twice (the survivors semi-join AND the final manifest
    # select) — checkpoint so the md5 fingerprint pass + group agg run
    # once per action (plans are trees)
    ).localCheckpoint(eager=False)
    survivors = extracted.join(
        exact.filter(F.col(id_col) == F.col(canonical_col)).select(id_col),
        id_col,
        "left_semi",
    )
    pairs = near_dup_verified_pairs(
        survivors,
        id_col=id_col,
        text_col=text_col,
        threshold=near_dup_threshold,
        n_bands=n_bands,
        rows_per_band=rows_per_band,
        max_bucket=max_bucket,
    )
    nd = near_dup_clusters(pairs, "id_a", "id_b").select(
        F.col("id").alias("_exact_canonical"),
        F.col("cluster_id").alias("_nd_canonical"),
    )
    return (
        exact.select(
            id_col,
            "fingerprint",
            "n_copies",
            F.col(canonical_col).alias("_exact_canonical"),
        )
        .join(nd, "_exact_canonical", "left")
        .select(
            id_col,
            "fingerprint",
            "n_copies",
            F.coalesce("_nd_canonical", "_exact_canonical").alias(
                canonical_col
            ),
        )
        .withColumn("keep", F.col(id_col) == F.col(canonical_col))
    )


def dedup_quality_keeper(
    manifest: DataFrame,
    scores: DataFrame,
    id_col: str = "url",
    canonical_col: str = "canonical_url",
    score_col: str = "quality_score",
) -> DataFrame:
    """Re-pick each dedup cluster's survivor by QUALITY instead of min id.

    ``dedup_keep_manifest`` keeps the min id per cluster — deterministic,
    but at crawl scale the min url of a near-dup cluster is often the
    worst member (a print/AMP mirror or paginated fragment), while the
    canonical article carries the cleanest extraction.  FineWeb /
    RefinedWeb-style builds keep the highest-quality member.  This takes
    the manifest plus ANY per-id score table and re-selects
    ``kept_id = argmax(score)`` per cluster, ties broken by min id (so
    with constant scores it degrades exactly to the manifest's own rule).
    The cluster KEY stays ``canonical_col`` (min id — stable under
    incremental growth); only the survivor choice moves.

    Scale: the argmax is ONE hash aggregation — ``min(struct(-score,
    id))`` — so map-side partial aggregation reduces a 10^6-member
    boilerplate cluster to one partial row per task; no per-cluster
    window partition ever materializes.  The keeper table (one row per
    cluster) joins back on the cluster key, AQE-eligible.  Output adds
    ``kept_id`` and rewrites ``keep`` = (id == kept_id); all other
    manifest columns pass through.
    """
    joined = manifest.join(
        scores.select(F.col(id_col), F.col(score_col)), id_col
    # referenced twice below (the keeper argmax AND the output re-join)
    # — checkpoint so the manifest/scores lineage runs once per action
    # (plans are trees; the callers' caches come later)
    ).localCheckpoint(eager=False)
    keepers = (
        joined.groupBy(canonical_col)
        .agg(
            F.min(
                F.struct(
                    (-F.col(score_col)).alias("neg_score"),
                    F.col(id_col).alias("kid"),
                )
            ).alias("_m")
        )
        .select(canonical_col, F.col("_m.kid").alias("kept_id"))
    )
    return (
        joined.drop("keep")
        .join(keepers, canonical_col)
        .withColumn("keep", F.col(id_col) == F.col("kept_id"))
    )


def embedding_dedup_drops(
    corpus: DataFrame,
    threshold: float,
    id_col: str = "url",
    text_col: str = "text",
) -> DataFrame:
    """ids to DROP by embedding-space near-dup over the corpus text:
    text_embedding (hashing-trick vectors, map-only) -> zero-norm filter
    -> LSH-bucketed cosine pairs -> connected components -> every
    non-canonical member. Catches paraphrase-level duplicates that
    token-Jaccard misses (reworded boilerplate, template rewrites)."""
    from readability_ex_spark.operators.clusters import near_dup_clusters
    from readability_ex_spark.operators.embedding import (
        TEXT_EMB_DIM,
        nonzero_embeddings,
        text_embedding,
    )
    from readability_ex_spark.operators.similarity import embedding_near_dup

    emb = nonzero_embeddings(
        text_embedding(corpus, id_col=id_col, text_col=text_col)
    )
    pairs = embedding_near_dup(
        emb.select(F.col(id_col).alias("vec_id"), "embedding"),
        threshold=threshold,
        dim=TEXT_EMB_DIM,
    )
    return (
        near_dup_clusters(pairs, "vec_a", "vec_b")
        .filter(F.col("id") != F.col("cluster_id"))
        .select(F.col("id").alias(id_col))
    )


def train_text_centroids(
    corpus: DataFrame,
    id_col: str = "url",
    text_col: str = "text",
    n_cells: int = 16,
    sample_size: int = 2048,
):
    """Deterministic k-means centroids over text embeddings of a
    bounded md5-ordered sample — the persistable model half of
    :func:`semantic_dedup_drops` (same artifact lifecycle as
    ``_lm_vocab``: estimated on a full build, persisted, reused by
    updates so every batch clusters in the SAME semantic space).

    The sample rows are picked FIRST (orderBy md5 + limit — a bounded
    TakeOrdered over the id column), then embedded; the corpus-wide
    embedding pass belongs to scoring, not training. Returns a list of
    centroid lists, or None when fewer than 2 non-zero sample vectors
    exist."""
    import numpy as np

    from readability_ex_spark.operators.embedding import text_embedding
    from readability_ex_spark.operators.similarity import train_ivf

    sampled = (
        corpus.select(id_col, text_col)
        .orderBy(F.md5(F.col(id_col).cast("string")), F.col(id_col))
        .limit(sample_size)
    )
    rows = text_embedding(sampled, id_col=id_col, text_col=text_col).select(
        "embedding"
    ).collect()
    x = np.array([list(r.embedding) for r in rows], dtype="float64")
    if len(x):
        x = x[np.linalg.norm(x, axis=1) > 0]
    if len(x) < 2:
        return None
    cents = train_ivf(
        x, n_cells=max(1, min(n_cells, len(x) // 4)), seed=42
    )
    return [[float(v) for v in c] for c in cents]


def semantic_dedup_drops(
    corpus: DataFrame,
    threshold: float,
    id_col: str = "url",
    text_col: str = "text",
    n_cells: int = 16,
    sample_size: int = 2048,
    centroids=None,
) -> DataFrame:
    """ids to DROP via SemDeDup (Abbas et al. 2023) over the corpus
    text: text_embedding -> k-means centroids trained driver-side on a
    bounded md5-ordered sample (deterministic; index training is the
    one legitimate driver-side step of an ANN build) -> within-cell
    pairwise cosine -> keep each semantic family's farthest-from-
    centroid member, drop the rest (``similarity.semantic_dedup``).

    Complements ``embedding_dedup_drops`` (LSH candidates, global
    recall dial) with the cluster-partitioned shape: candidate volume
    is bounded by cell sizes, which ``n_cells`` controls — at corpus
    scale n_cells grows with N so the within-cell quadratic never
    does.

    Pass ``centroids`` (a :func:`train_text_centroids` result, e.g.
    loaded from a persisted ``_sem_centroids`` artifact) to cluster in
    a FIXED semantic space — the incremental-update path; by default
    the model is trained from ``corpus`` itself."""
    from readability_ex_spark.operators.embedding import (
        nonzero_embeddings,
        text_embedding,
    )
    from readability_ex_spark.operators.similarity import semantic_dedup

    if centroids is None:
        centroids = train_text_centroids(
            corpus, id_col, text_col, n_cells, sample_size
        )
    if centroids is None:  # fewer than 2 usable sample vectors
        return corpus.sparkSession.createDataFrame([], f"{id_col} string")
    emb = nonzero_embeddings(
        text_embedding(corpus, id_col=id_col, text_col=text_col)
    )
    manifest = semantic_dedup(
        emb.select(F.col(id_col).alias("vec_id"), "embedding"),
        centroids,
        threshold=threshold,
    )
    return manifest.filter(~F.col("keep")).select(
        F.col("vec_id").alias(id_col)
    )


def prepare_training_corpus(
    pages: DataFrame,
    *,
    min_quality: float = 0.0,
    lang: str | None = None,
    quality_rules: bool = False,
    repetition_rules: bool = False,
    normalize_unicode: bool = False,
    scrub_pii_text: bool = False,
    drop_boilerplate_chunks: bool = False,
    eval_df: DataFrame | None = None,
    near_dup_threshold: float | None = 0.8,
    quality_keeper: bool = False,
    emb_near_dup_threshold: float | None = None,
    semantic_dedup_threshold: float | None = None,
    canonical_urls: bool = False,
    blocklist: tuple[str, ...] | None = None,
    drop_substring_dups: bool = False,
    substring_skew_safe: bool = True,
    span_decontaminate_df: DataFrame | None = None,
    min_lm_logprob: float | None = None,
    lm_vocab: DataFrame | None = None,
    mixture_weights: dict[str, float] | None = None,
    max_per_domain: int | None = None,
    shard_tokens: int | None = None,
    respect_robots: bool = False,
    robots_rules: DataFrame | None = None,
    robots_agent: str = "*",
    **extraction_kwargs,
) -> DataFrame:
    """pages -> deduped, quality-annotated text corpus.

    Keeps one url per exact-duplicate group AND one per verified
    near-dup cluster (``dedup_keep_manifest``: A–B, B–C chains keep
    exactly one of {A, B, C}), annotates quality signals, and filters by
    ``min_quality``. ``quality_keeper=True`` re-picks each cluster's
    survivor as its argmax-quality member instead of the min url
    (``dedup_quality_keeper``, FineWeb-style; ties -> min url). ``quality_rules=True`` additionally applies the
    Gopher/C4 rule set (``with_quality_rules``), keeping only documents
    that pass every rule. Pass ``near_dup_threshold=None`` to collapse
    exact duplicates only. ``emb_near_dup_threshold`` adds an OPTIONAL final
    embedding-space dedup stage (``embedding_dedup_drops``) over the
    token-level survivors — ordered last because it is the loosest
    matcher: exact and token-Jaccard dedup shrink the corpus first, so
    the embedding LSH buckets stay small. ``semantic_dedup_threshold``
    runs the SemDeDup variant instead/additionally
    (``semantic_dedup_drops``: sample-trained k-means cells, within-cell
    pairwise cosine, farthest-from-centroid keeper).

    ``eval_df`` (a frame with a ``text`` column) drops documents sharing
    any 13-token gram with it (``decontam.decontaminate``) — run on the
    dedup survivors so one leaked boilerplate family costs one check.
    ``normalize_unicode=True`` replaces ``text`` with its canonical form
    (control strip, whitespace collapse, NFC — ``textops.normalize_text``)
    before every later stage. ``scrub_pii_text=True`` replaces ``text``
    with its PII-scrubbed form BEFORE quality/repetition stats (signals
    must describe the text that ships). ``drop_boilerplate_chunks=True`` runs C4-style cross-doc
    chunk removal (``decontam.line_dedup``) on the dedup survivors,
    replacing ``text`` with the boilerplate-stripped form — ordered
    before quality/repetition so their signals score the shipping text.
    ``repetition_rules=True`` drops docs failing any Gopher n-gram
    repetition rule (``repetition_stats``).

    Crawl-filter stages (same semantics as the ``prepare_corpus.py``
    flags): ``canonical_urls`` rewrites urls before extraction so
    url-spelling duplicates collapse in the latest-fetch dedup;
    ``blocklist`` drops docs containing a listed word (C4 bad-words);
    ``drop_substring_dups`` cuts corpus-duplicated 20-token runs
    (skew-safe agg+join plan by default — ``substring_skew_safe=False``
    opts into the cheaper single-exchange window plan, whose hot-window
    partition cannot be split);
    ``respect_robots`` drops pages whose head declared
    noindex/noarchive/noai (kernel-emitted policy columns,
    ``operators/policyops.py``); ``robots_rules`` (a parsed
    ``robotstxt.parse_robots`` table) additionally drops pages an
    RFC 9309 rule disallows for ``robots_agent`` — the host-level half
    of the same policy stack;
    ``span_decontaminate_df`` cuts eval-overlapping spans (vs
    ``eval_df``'s whole-doc drop); ``min_lm_logprob`` applies the
    unigram-LM floor (pass ``lm_vocab`` to score against a persisted
    model); ``max_per_domain`` caps each host's contribution
    (quality-ordered, skew-safe); ``mixture_weights`` downsamples to
    target language shares; ``shard_tokens`` annotates per-language
    training shards."""
    if canonical_urls:
        from readability_ex_spark.operators.urlops import canonicalize_url

        pages = pages.withColumn("url", canonicalize_url(F.col("url")))
    if robots_rules is not None:
        # host-level REP rules depend only on the url, so they filter
        # the RAW pages: a disallowed page never pays extraction, and
        # the anti-join's two references to its input re-derive only
        # the cheap page scan — not the kernel (plans are trees; the
        # post-extraction placement ran the UDF stage twice)
        from readability_ex_spark.operators.robotstxt import robots_filter

        pages = robots_filter(pages, robots_rules, agent=robots_agent)
    # Spark plans are trees: the dedup manifest AND every text-replacing
    # self-join stage (boilerplate, substring dedup, span decontam)
    # re-derive their input from this frame, and without a cache each
    # one re-runs the extraction kernel — the expensive stage — once
    # more (the script caches for the same reason). MEMORY_AND_DISK by
    # default, so oversized corpora spill instead of failing; at real
    # scale the batch job materializes extraction to its output table
    # once and this composition runs over that read.
    extracted = run_extraction(pages, **extraction_kwargs).filter(
        F.col("status") == "ok"
    )
    if respect_robots:
        # kernel-emitted head signals: drop pages whose meta robots
        # declared noindex/noarchive/noai BEFORE any dedup/quality
        # work spends cycles on them (free codegen filter; an excluded
        # page must also never become a dedup group's canonical)
        from readability_ex_spark.operators.policyops import policy_filter

        extracted = policy_filter(extracted)
    extracted = extracted.cache()
    if lang is not None:
        # route by language BEFORE the English-centric stopword/quality
        # rules (their documented precondition); prefix match keeps
        # regional subtags ("en" matches "en-US")
        extracted = extracted.filter(
            F.lower(F.coalesce(F.col("lang"), F.lit(""))).startswith(
                lang.lower()
            )
        )
    if near_dup_threshold is None:
        manifest = exact_dup_manifest(extracted).withColumn(
            "keep", F.col("url") == F.col("canonical_url")
        )
    else:
        manifest = dedup_keep_manifest(
            extracted, near_dup_threshold=near_dup_threshold
        )
    if quality_keeper:
        # survivor = the cluster's argmax-quality member instead of the
        # min url (``dedup_quality_keeper``; ties fall back to min url).
        # Scores are one free codegen map over the cached extraction;
        # the manifest keeps its 5-column audit schema — only the keep
        # bit moves, the cluster key (canonical_url) is unchanged.
        scores = with_quality_signals(extracted).select(
            "url", "quality_score"
        )
        manifest = dedup_quality_keeper(manifest, scores).select(
            "url", "fingerprint", "n_copies", "canonical_url", "keep"
        )
    keep = manifest.filter(F.col("keep")).select(
        "url", "fingerprint", "n_copies"
    )
    survivors = extracted.join(keep, "url")
    if eval_df is not None:
        from readability_ex_spark.operators.decontam import decontaminate

        verdicts = decontaminate(survivors, eval_df, id_col="url")
        survivors = survivors.join(
            verdicts.filter("contaminated").select("url"), "url", "left_anti"
        )
    if span_decontaminate_df is not None:
        from readability_ex_spark.operators.decontam import (
            decontaminate_spans,
        )

        cut = decontaminate_spans(
            survivors, span_decontaminate_df, id_col="url"
        ).select("url", "text_clean", "n_dup_tokens")
        survivors = (
            survivors.drop("text")
            .join(cut, "url")
            .withColumnRenamed("text_clean", "text")
            .withColumnRenamed("n_dup_tokens", "n_decontam_tokens")
        )
    if normalize_unicode:
        # canonical text BEFORE pii/quality/repetition so every later
        # signal (and the shipping corpus) sees the normalized form;
        # runs on dedup survivors — the dedup fingerprints upstream
        # already whitespace-normalize their own input
        from readability_ex_spark.operators.textops import normalize_text

        survivors = (
            normalize_text(survivors)
            .drop("text")
            .withColumnRenamed("text_norm", "text")
        )
    if scrub_pii_text:
        from readability_ex_spark.operators.pii import scrub_pii

        survivors = (
            scrub_pii(survivors)
            .drop("text")
            .withColumnRenamed("text_scrubbed", "text")
        )
    if drop_boilerplate_chunks:
        from readability_ex_spark.operators.decontam import line_dedup

        cleaned = line_dedup(survivors, id_col="url").select(
            "url", "text_clean", "n_dropped"
        )
        survivors = (
            survivors.drop("text")
            .join(cleaned, "url")
            .withColumnRenamed("text_clean", "text")
            .withColumnRenamed("n_dropped", "n_boilerplate_chunks")
        )
    if blocklist:
        from readability_ex_spark.operators.wordlist import wordlist_hits

        flagged = wordlist_hits(survivors, words=blocklist, id_col="url")
        survivors = survivors.join(
            flagged.filter("flagged").select("url"), "url", "left_anti"
        )
    if drop_substring_dups:
        from readability_ex_spark.operators.substrdedup import (
            substring_dedup,
        )

        # skew_safe defaults True here: the composed job is exactly the
        # place a 10^6-occurrence boilerplate window shows up, and the
        # one saved exchange of the window plan is not worth an
        # unsplittable hot task (opt out via substring_skew_safe=False
        # for pre-line-deduped corpora)
        cleaned = substring_dedup(
            survivors, id_col="url", skew_safe=substring_skew_safe
        ).select("url", "text_clean", "n_dup_tokens")
        survivors = (
            survivors.drop("text")
            .join(cleaned, "url")
            .withColumnRenamed("text_clean", "text")
            .withColumnRenamed("n_dup_tokens", "n_substr_dup_tokens")
        )
    corpus = with_quality_signals(survivors)
    if repetition_rules:
        rep_ok = repetition_stats(corpus, id_col="url").filter(
            F.col("r_top2gram") & F.col("r_top3gram") & F.col("r_dup6gram")
        )
        corpus = corpus.join(rep_ok.select("url"), "url", "left_semi")
    if emb_near_dup_threshold is not None:
        # the drops derivation and the verdict anti-join both reference
        # corpus — checkpoint once so the composed upstream (dedup
        # manifest + every text stage) doesn't re-run per reference
        corpus = corpus.localCheckpoint(eager=False)
        drops = embedding_dedup_drops(corpus, emb_near_dup_threshold)
        corpus = corpus.join(drops, "url", "left_anti")
    if semantic_dedup_threshold is not None:
        # three references: the eager centroid-training collect, the
        # corpus-wide scoring scan, and the anti-join — same rule
        corpus = corpus.localCheckpoint(eager=False)
        sem_drops = semantic_dedup_drops(corpus, semantic_dedup_threshold)
        corpus = corpus.join(sem_drops, "url", "left_anti")
    if min_quality > 0:
        corpus = corpus.filter(F.col("quality_score") >= min_quality)
    if quality_rules:
        corpus = (
            with_quality_rules(corpus)
            .filter(F.col("passes_quality"))
            .select(*corpus.columns)
        )
    if min_lm_logprob is not None:
        from readability_ex_spark.operators.lmquality import unigram_logprob

        # the LM stage reads the corpus for the vocab (when none is
        # passed), the scoring pass, and the verdict join target —
        # checkpoint once so the composed upstream (dedup manifest +
        # every text stage) doesn't re-run per reference
        corpus = corpus.localCheckpoint(eager=False)
        lm = unigram_logprob(corpus, id_col="url", vocab=lm_vocab)
        corpus = corpus.join(
            lm.filter(F.col("lm_logprob") >= min_lm_logprob).select("url"),
            "url",
            "left_semi",
        )
    if max_per_domain is not None:
        from readability_ex_spark.operators.relational import top_k_per_key
        from readability_ex_spark.operators.urlops import host_expr

        corpus = top_k_per_key(
            corpus.withColumn("_domain", host_expr("url")),
            ["_domain"],
            [F.col("quality_score").desc(), F.col("url").asc()],
            max_per_domain,
        ).drop("_domain", "rk")
    if mixture_weights:
        from readability_ex_spark.operators.sampling import mixture_sample

        corpus = mixture_sample(
            corpus, mixture_weights, stratum_col="lang", id_col="url"
        )
    if shard_tokens is not None:
        from readability_ex_spark.operators.sampling import shard_assign

        corpus = shard_assign(
            corpus, shard_tokens, stratum_col="lang", id_col="url"
        )
    return corpus


def incremental_corpus_update(
    existing_corpus: DataFrame,
    new_pages: DataFrame,
    near_dup_vs_existing_threshold: float | None = None,
    existing_bands: DataFrame | None = None,
    **prepare_kwargs,
) -> DataFrame:
    """Docs from a NEW crawl batch that belong in an existing corpus:
    the incremental build a recurring 100 TB pipeline runs instead of
    re-processing the world.

    The new batch goes through the full ``prepare_training_corpus``
    composition (so batch-internal dups collapse first), then drops
    rows the existing corpus already covers:

    - same ``url`` (the existing canonical wins — corpus stability
      outranks recency for training data; a re-crawled page does not
      churn the corpus), and
    - same exact-text ``fingerprint`` (the same content under a new
      url is a cross-batch exact duplicate).

    Returns ONLY the append delta — callers append it and union the
    manifests. Both anti-joins are keyed on columns the corpus layout
    already clusters by; kept urls AND kept fingerprints are unique by
    construction (the exact collapse keeps one url per fingerprint
    group, and every appended delta is anti-joined on both), so neither
    side needs a corpus-cardinality distinct. Cross-batch NEAR-dups
    are caught when ``near_dup_vs_existing_threshold`` is set
    (``textops.cross_near_dup_matches``: batch band blocks equality-join
    the existing corpus's band blocks, shingle-Jaccard verify). Pass
    ``existing_bands`` (the persisted ``textops.band_index`` artifact —
    ``prepare_corpus.py`` writes it as ``{output}/_bands``) so the
    existing corpus is never re-banded: the update then touches existing
    text only for band-collision candidates.
    """
    batch = prepare_training_corpus(new_pages, **prepare_kwargs)
    delta = batch.join(
        existing_corpus.select("url"), "url", "left_anti"
    ).join(
        existing_corpus.select("fingerprint"),
        "fingerprint",
        "left_anti",
    )
    if near_dup_vs_existing_threshold is not None:
        from readability_ex_spark.operators.textops import (
            cross_near_dup_matches,
        )

        drops = cross_near_dup_matches(
            delta.select("url", "text"),
            existing_corpus.select("url", "text"),
            id_col="url",
            threshold=near_dup_vs_existing_threshold,
            existing_bands=existing_bands,
        )
        delta = delta.join(drops, "url", "left_anti")
    return delta
