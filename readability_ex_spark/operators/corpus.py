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

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from readability_ex_spark.pipeline import run_extraction


def _tokens(col: str):
    c = F.col(col)
    return F.when(
        F.trim(c) == "", F.array().cast("array<string>")
    ).otherwise(F.split(F.trim(c), r"\s+"))


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


def exact_dup_manifest(extracted: DataFrame, text_col: str = "text") -> DataFrame:
    """url -> (fingerprint, canonical_url, n_copies) over normalized text."""
    norm = F.lower(F.regexp_replace(F.trim(F.col(text_col)), r"\s+", " "))
    fp = extracted.select("url", F.md5(norm).alias("fingerprint"))
    groups = fp.groupBy("fingerprint").agg(
        F.min("url").alias("canonical_url"), F.count("*").alias("n_copies")
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


def prepare_training_corpus(
    pages: DataFrame,
    *,
    min_quality: float = 0.0,
    **extraction_kwargs,
) -> DataFrame:
    """pages -> deduped, quality-annotated text corpus.

    Keeps one url per exact-duplicate group, annotates quality signals,
    and filters by ``min_quality``. Near-dup pairs are left as a separate
    artifact (near_dup_pairs) since the keep-policy is application
    specific."""
    extracted = run_extraction(pages, **extraction_kwargs).filter(
        F.col("status") == "ok"
    )
    manifest = exact_dup_manifest(extracted)
    keep = manifest.filter(F.col("url") == F.col("canonical_url")).select(
        "url", "fingerprint", "n_copies"
    )
    corpus = with_quality_signals(extracted.join(keep, "url"))
    if min_quality > 0:
        corpus = corpus.filter(F.col("quality_score") >= min_quality)
    return corpus
