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
    table_format: str = "parquet",
) -> None:
    """Write extraction output partitioned by status + url-hash bucket.

    Status partitioning keeps error rows separable for reprocessing;
    bucketing by url-hash keeps per-directory file counts bounded and
    makes downstream url-keyed joins co-partitionable.

    ``table_format='iceberg'``: ``out_path`` is a catalog table name;
    appends via the v2 ``writeTo`` API (atomic snapshot commit — the
    scale path for concurrent writers), creating the table partitioned
    by (status, bucket) on first write. For idempotent re-runs use
    ``merge_extracted_iceberg`` instead of append. No Iceberg jars ship
    in this sandbox, so the branch is covered by call-shape tests.
    """
    bucketed = extracted.withColumn(
        bucket_col, F.pmod(F.xxhash64("url"), F.lit(n_buckets)).cast("int")
    )
    if table_format == "iceberg":
        try:
            bucketed.writeTo(out_path).append()
        except Exception:  # first write: table does not exist yet
            bucketed.writeTo(out_path).partitionedBy(
                F.col("status"), F.col(bucket_col)
            ).create()
        return
    (
        bucketed.write.partitionBy("status", bucket_col)
        .mode(mode)
        .parquet(out_path)
    )


def merge_extracted_iceberg(
    spark: SparkSession,
    extracted: DataFrame,
    table: str,
    keys: tuple[str, ...] = ("url",),
) -> None:
    """Idempotent upsert into an Iceberg output table via MERGE INTO:
    a retried batch updates its matched urls instead of appending
    duplicate rows — the Iceberg-native alternative to the anti-join
    resume for re-runs that must repair partial output."""
    view = "_readability_merge_src"
    extracted.createOrReplaceTempView(view)
    on = " AND ".join(f"t.{k} = s.{k}" for k in keys)
    spark.sql(
        f"MERGE INTO {table} t USING {view} s ON {on} "
        "WHEN MATCHED THEN UPDATE SET * "
        "WHEN NOT MATCHED THEN INSERT *"
    )


def write_extracted_batch(
    extracted: DataFrame,
    out_path: str,
    batch_id: int,
    *,
    bucket_col: str = "url_bucket",
    n_buckets: int = 64,
) -> None:
    """Idempotent per-micro-batch write for streaming foreachBatch.

    Partitions by (batch_id, status, url_bucket) and dynamically
    OVERWRITES — a micro-batch retried after a partial write replaces
    exactly its own batch_id partitions instead of appending duplicates,
    which together with the streaming checkpoint gives exactly-once
    output per batch."""
    (
        extracted.withColumn("batch_id", F.lit(int(batch_id)))
        .withColumn(
            bucket_col, F.pmod(F.xxhash64("url"), F.lit(n_buckets)).cast("int")
        )
        .write.partitionBy("batch_id", "status", bucket_col)
        .option("partitionOverwriteMode", "dynamic")
        .mode("overwrite")
        .parquet(out_path)
    )


def write_metrics(
    metrics: DataFrame,
    out_path: str,
    run_id: str,
    table_format: str = "parquet",
) -> None:
    """Persist the per-partition counter rollup as the _metrics artifact
    (iceberg: a sibling ``<table>_metrics`` catalog table)."""
    df = metrics.withColumn("run_id", F.lit(run_id))
    if table_format == "iceberg":
        try:
            df.writeTo(f"{out_path}_metrics").append()
        except Exception:  # first write: table does not exist yet
            df.writeTo(f"{out_path}_metrics").create()
        return
    df.write.mode("append").parquet(f"{out_path}/_metrics")


def read_done_urls(
    spark: SparkSession,
    out_path: str,
    *,
    done_statuses: tuple[str, ...] = ("ok", "not_readable", "empty", "too_large"),
    table_format: str = "parquet",
) -> DataFrame | None:
    """Urls already committed to the output table (checkpoint state for
    anti-join resume). Returns None when no output exists yet.

    Only ``done_statuses`` count as done: 'ok', 'not_readable', 'empty'
    (missing payload) and 'too_large' (guard trip) are deterministic
    outcomes (reprocessing cannot change them), while 'error' rows
    (unexpected kernel failures, possibly transient at cluster scale)
    are NOT done, so a resume retries them. NB the sink appends — a retried url that succeeds adds
    a new 'ok' row next to its old 'error' row; readers wanting exactly
    one row per url should prefer status='ok' / latest row
    (operators.relational.q_dedup_latest shape), or use
    merge_extracted_iceberg which upserts in place. The status filter
    partition-prunes (the output is partitioned by status)."""
    try:
        if table_format == "iceberg":
            out = spark.read.format("iceberg").load(out_path)
        else:
            out = spark.read.parquet(out_path)
        return out.filter(F.col("status").isin(list(done_statuses))).select("url")
    except Exception:  # noqa: BLE001 — first run: nothing committed yet
        return None
