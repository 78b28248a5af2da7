"""Policy/compliance filtering over kernel-emitted signals.

The extraction kernel harvests ``robots_noindex`` / ``robots_noarchive``
/ ``robots_noai`` and ``license_url`` from every page's pre-extraction
head (``kernel/policy.py``, surfaced through ``pipeline.EXTRACT_SCHEMA``).
This module is the corpus-side verdict: which extracted rows may ship
in a training corpus.  Pure codegen boolean algebra — no UDF, no
exchange; Catalyst fuses the filter into whatever scan or stage feeds
it, so at 100 TB the cost is zero beyond reading the three boolean
columns.

Null semantics: a NULL flag means the page's policy is UNKNOWN (e.g.
the payload was missing, so nothing was harvested).  Unknown pages are
KEPT — the flags are opt-out declarations, and absence of a
declaration is the permissive default the Robots Exclusion Protocol
itself specifies.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, functions as F


def policy_keep_expr(
    *,
    drop_noindex: bool = True,
    drop_noarchive: bool = True,
    drop_noai: bool = True,
    require_license: bool = False,
    noindex_col: str = "robots_noindex",
    noarchive_col: str = "robots_noarchive",
    noai_col: str = "robots_noai",
    license_col: str = "license_url",
) -> Column:
    """Boolean keep verdict over the kernel's policy columns.

    ``require_license=True`` additionally keeps only rows with a
    non-null ``license_url`` (a permissively-licensed-subset build).
    """
    keep = F.lit(True)
    if drop_noindex:
        keep = keep & ~F.coalesce(F.col(noindex_col), F.lit(False))
    if drop_noarchive:
        keep = keep & ~F.coalesce(F.col(noarchive_col), F.lit(False))
    if drop_noai:
        keep = keep & ~F.coalesce(F.col(noai_col), F.lit(False))
    if require_license:
        keep = keep & F.col(license_col).isNotNull()
    return keep


def policy_filter(df: DataFrame, **kwargs) -> DataFrame:
    """Rows of ``df`` that pass :func:`policy_keep_expr`."""
    return df.filter(policy_keep_expr(**kwargs))


def with_synthetic_policy(docs: DataFrame) -> DataFrame:
    """Deterministic md5-derived policy columns over the documents
    table — the engine-portable stand-in the oracle contract checks
    (the real columns come from HTML, which DuckDB cannot parse; the
    kernel-side harvest is golden-tested on crafted pages in
    ``tests/test_policy.py``).  Rates mirror a crawl: ~1/16 noindex,
    ~1/16 noarchive, ~1/8 noai, ~1/16 licensed."""
    h = F.md5(F.col("doc_id").cast("string"))
    return docs.select(
        "doc_id",
        (F.substring(h, 1, 1) == "0").alias("robots_noindex"),
        (F.substring(h, 2, 1) == "1").alias("robots_noarchive"),
        F.substring(h, 3, 1).isin("2", "3").alias("robots_noai"),
        F.when(
            F.substring(h, 4, 1) == "4",
            F.lit("https://creativecommons.org/licenses/by/4.0/"),
        ).alias("license_url"),
    )


def q_policy_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-doc policy flags + the ship/no-ship verdict of the default
    corpus policy (drop noindex/noarchive/noai, licensing optional)."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    flags = with_synthetic_policy(docs)
    return flags.select(
        "doc_id",
        "robots_noindex",
        "robots_noarchive",
        "robots_noai",
        F.col("license_url").isNotNull().alias("has_license"),
        policy_keep_expr().alias("keep"),
    ).orderBy("doc_id")
