"""Output sinks: partitioned parquet (dev) / Iceberg (scale), with
per-partition metrics and an idempotent resume manifest.

At 100 TB the output table is Iceberg (`df.writeTo(tbl).append()` with
hidden partitioning on crawl day + url-hash bucket); the dev path writes
the same layout as parquet directories. Resume reads the committed
output's urls and anti-joins them against the source (SURVEY.md §2.B).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def write_extracted(
    extracted: DataFrame,
    out_path: str,
    *,
    mode: str = "append",
    bucket_col: str = "url_bucket",
    n_buckets: int = 64,
) -> None:
    """Write extraction output partitioned by status + url-hash bucket.

    Status partitioning keeps error rows separable for reprocessing;
    bucketing by url-hash keeps per-directory file counts bounded and
    makes downstream url-keyed joins co-partitionable.
    """
    (
        extracted.withColumn(
            bucket_col, F.pmod(F.xxhash64("url"), F.lit(n_buckets)).cast("int")
        )
        .write.partitionBy("status", bucket_col)
        .mode(mode)
        .parquet(out_path)
    )


def write_metrics(metrics: DataFrame, out_path: str, run_id: str) -> None:
    """Persist the per-partition counter rollup as the _metrics artifact."""
    (
        metrics.withColumn("run_id", F.lit(run_id))
        .write.mode("append")
        .parquet(f"{out_path}/_metrics")
    )


def read_done_urls(spark: SparkSession, out_path: str) -> DataFrame | None:
    """Urls already committed to the output table (checkpoint state for
    anti-join resume). Returns None when no output exists yet."""
    try:
        return spark.read.parquet(out_path).select("url")
    except Exception:  # noqa: BLE001 — first run: nothing committed yet
        return None
