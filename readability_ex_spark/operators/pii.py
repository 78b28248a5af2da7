"""PII scrubbing for training corpora: emails, IPv4 addresses, phone
numbers replaced by typed placeholders, with per-category counts.

All patterns are written in the common subset of Java regex (Spark,
codegen'd regexp_replace/regexp_count) and RE2 (DuckDB oracle): no
backreferences, no lookaround.  Scrubbing is a fixed chain — email,
then IPv4, then phone — each applied to the PREVIOUS stage's output so
a phone-like digit run inside an already-replaced token is never
double-matched.  Whole operation is JVM-side column expressions: one
scan, no shuffle, no Python.  No reference counterpart (training-data
layer).
"""
from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, functions as F

# ordered: (name, pattern, placeholder)
PII_RULES: tuple[tuple[str, str, str], ...] = (
    (
        "email",
        r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}",
        "<EMAIL>",
    ),
    (
        "ipv4",
        r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b",
        "<IP>",
    ),
    (
        # international-ish: +CC or leading digit, then 7+ of [digit - space],
        # ending in a digit. Anchored on \b so years/ids inside words don't
        # match; plain long digit runs DO (better to over-scrub a corpus).
        "phone",
        r"\+?\b\d[\d\- ]{7,}\d\b",
        "<PHONE>",
    ),
)


def scrub_pii(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Adds ``text_scrubbed`` plus ``n_<rule>`` match counts per row.

    Counts are taken on the stage INPUT of each rule (what that rule
    actually saw), so they sum to the number of replacements made.
    """
    out = df
    scrubbed: Column = F.col(text_col)
    for name, pat, repl in PII_RULES:
        out = out.withColumn(
            f"n_{name}", F.regexp_count(scrubbed, F.lit(pat)).cast("long")
        )
        scrubbed = F.regexp_replace(scrubbed, pat, repl)
        # re-anchor on the materialized column so each count sees the
        # previous stage's output, mirroring the sequential chain
        out = out.withColumn("text_scrubbed", scrubbed)
        scrubbed = F.col("text_scrubbed")
    return out


# -- checked query ----------------------------------------------------------
# The synthetic corpus contains no PII, so the query builds a
# deterministic PII-laden fixture column from doc_id (same expression in
# both engines) and scrubs THAT — a real dialect-equivalence check with
# non-zero counts, not a vacuous all-zeros pass.


def q_pii_scrub(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    d = F.col("doc_id")
    fixture = F.concat(
        F.substring(F.col("text"), 1, 80),
        F.lit(" contact user"), d, F.lit("@mail.example.org"),
        F.lit(" from 10."), (d % 200).cast("string"),
        F.lit("."), (d % 250).cast("string"), F.lit(".7"),
        F.lit(" call +1 555-01"), F.lpad((d % 100).cast("string"), 2, "0"),
        F.lit("-"), F.lpad((d % 10000).cast("string"), 4, "0"),
    )
    scrubbed = scrub_pii(
        docs.select("doc_id", fixture.alias("text")), "text"
    )
    return scrubbed.select(
        "doc_id",
        F.md5("text_scrubbed").alias("scrubbed_hash"),
        "n_email", "n_ipv4", "n_phone",
    ).orderBy("doc_id")
