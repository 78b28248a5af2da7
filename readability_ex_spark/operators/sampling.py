"""Corpus-mixing operators: deterministic sampling and token-budget
packing — the stage between "deduped corpus" and "training mix".

Both are pure DataFrame plans (no RNG state, no driver loops):

- ``deterministic_sample``: hash-based per-stratum sampling. Unlike
  ``df.sample``/``sampleBy`` (engine-specific RNG streams), the keep
  decision is a pure function of the row id — reruns, resumes, and
  other engines (the DuckDB oracle) reproduce it exactly, and a
  re-crawled url keeps landing in the same split.
- ``token_budget_pack``: per-language token budgets filled best-first —
  a windowed cumulative sum over quality-ordered docs, the standard
  shape for "take the best N billion tokens per language".
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F


SAMPLE_HEX_DIGITS = 6  # rate resolution 16^-6 ≈ 6e-8


def sample_hex_threshold(rate: float, digits: int = SAMPLE_HEX_DIGITS) -> str:
    """Lexicographic keep-threshold for ``deterministic_sample``: a row
    is kept iff its md5-prefix string sorts below this. 'g' sorts above
    every hex digit, so rate >= 1 keeps everything."""
    n = int(round(max(rate, 0.0) * 16**digits))
    if n >= 16**digits:
        return "g"
    return format(n, f"0{digits}x")


def deterministic_sample(
    df: DataFrame,
    rates: dict[str, float],
    stratum_col: str = "lang",
    id_col: str = "doc_id",
    default_rate: float = 0.0,
) -> DataFrame:
    """Keep each row iff the first hex digits of md5(id) sort below the
    stratum's rate threshold (uniform draw over 16^6 buckets).

    Unlike RNG sampling the decision is a pure function of the id —
    engine-portable (string compare of md5 hex, identical in Spark and
    DuckDB), rerun/resume-stable, and a re-crawled url keeps landing in
    the same split. At 100 TB this is a codegen'd filter: no shuffle,
    no per-partition RNG seeding, and adding strata later never changes
    earlier keep decisions (each row's draw is rate-independent).
    """
    draw = F.substring(F.md5(F.col(id_col).cast("string")), 1, SAMPLE_HEX_DIGITS)
    threshold = F.lit(sample_hex_threshold(default_rate))
    for stratum, r in sorted(rates.items()):
        threshold = F.when(
            F.col(stratum_col) == stratum, F.lit(sample_hex_threshold(r))
        ).otherwise(threshold)
    return df.filter(draw < threshold)


def token_budget_pack(
    df: DataFrame,
    budget_per_stratum: int,
    stratum_col: str = "lang",
    id_col: str = "doc_id",
    tokens_col: str = "n_tokens",
    quality_col: str = "quality_score",
) -> DataFrame:
    """Fill each stratum's token budget best-first: order docs by
    (quality desc, id asc — deterministic tiebreak) and keep the longest
    PREFIX whose running token total stays within budget. This is prefix
    truncation, not knapsack packing: the cumulative sum includes every
    higher-quality doc whether or not it was kept, so the first doc that
    overflows the budget also ends the stratum — a deliberately simple,
    single-window rule (skip-and-continue packing would need a stateful
    scan; the quality ordering makes the prefix the right cut anyway:
    everything below the cut is worse than everything above it).

    One window per stratum — a single hash shuffle on the stratum key;
    at crawl scale strata are languages/domains (dozens), so pair this
    with salting only if one stratum dominates (or pack per-shard
    budgets and merge).
    """
    w = (
        Window.partitionBy(stratum_col)
        .orderBy(F.col(quality_col).desc(), F.col(id_col).asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        df.withColumn("_cum", F.sum(F.col(tokens_col)).over(w))
        .filter(F.col("_cum") <= budget_per_stratum)
        .drop("_cum")
    )


SAMPLE_RATES = {"en": 0.5, "de": 0.25, "fr": 0.1}
# 2k tokens/lang binds on every sf table (per-lang totals are 3.5k-12k),
# so the checked entry exercises the cut, not a vacuous filter
PACK_BUDGET = 2_000


def _docs_with_signals(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    toks = F.when(
        F.trim(F.col("text")) == "", F.array().cast("array<string>")
    ).otherwise(F.split(F.trim(F.col("text")), r"\s+"))
    n_tokens = F.size(toks).cast("long")
    n_stop = F.regexp_count(
        F.col("text"), F.lit(r"\b(the|a|of|and|to)\b")
    ).cast("long")
    stop_ratio = F.when(n_tokens > 0, n_stop.cast("double") / n_tokens).otherwise(
        F.lit(0.0)
    )
    len_part = F.least(n_tokens.cast("double") / F.lit(400.0), F.lit(1.0))
    return docs.select(
        "doc_id",
        "lang",
        n_tokens.alias("n_tokens"),
        F.round(len_part * 0.5 + stop_ratio * 0.5, 6).alias("quality_score"),
    )


def q_stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic per-language sample (en 50%, de 25%, fr 10%,
    others dropped) — the reproducible alternative to sampleBy."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", "lang", "n_chars"
    )
    return deterministic_sample(docs, SAMPLE_RATES).orderBy("doc_id")


def q_token_budget_pack(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Best-quality-first packing of a 2k-token budget per language."""
    return token_budget_pack(
        _docs_with_signals(spark, sf_dir), PACK_BUDGET
    ).orderBy("doc_id")
