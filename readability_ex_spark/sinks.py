"""Output sinks: partitioned parquet (dev) / Iceberg (scale), with
per-partition metrics and an idempotent resume manifest.

At 100 TB the output table is Iceberg (`df.writeTo(tbl).append()` with
hidden partitioning on crawl day + url-hash bucket); the dev path writes
the same layout as parquet directories. Resume reads the committed
output's urls and anti-joins them against the source (SURVEY.md §2.B).
"""

from __future__ import annotations

import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

# terminal statuses: reprocessing cannot change these outcomes; pass as
# done_statuses when error retry is wanted (everything NOT in this tuple
# — i.e. 'error' — gets re-extracted)
TERMINAL_STATUSES = ("ok", "not_readable", "empty", "too_large")

# Specific error classes / exception types only: a generic 'not found'
# substring would misclassify missing catalogs/namespaces/functions as a
# missing table and trigger a create() whose secondary failure masks the
# root cause.
_MISSING_TARGET_MARKERS = (
    "TABLE_OR_VIEW_NOT_FOUND",  # Spark errorClass (iceberg table)
    "NoSuchTableException",  # Iceberg catalog exception type
    "PATH_NOT_FOUND",  # Spark errorClass (parquet path)
)


def _is_missing_table(exc: Exception) -> bool:
    msg = f"{type(exc).__name__}: {exc}"
    return any(m in msg for m in _MISSING_TARGET_MARKERS)


# Parquet bloom filter on the url column. Corpus files are clustered by
# url-HASH bucket, so the urls inside any row group are effectively
# unordered — min/max column statistics can never prune a url point
# lookup, making the bloom filter the ONLY row-group pruner available
# to the update path's candidate-verify reads and to audit queries
# (``WHERE url = ...``). At 100 TB that's the difference between
# reading one row group and scanning a bucket. Cost: bounded by
# parquet-mr's 1 MB per-column cap per row group, paid once at write.
URL_BLOOM_OPTIONS = {
    "parquet.bloom.filter.enabled#url": "true",
    # ADAPTIVE sizing (parquet-mr picks the smallest candidate bitset
    # for the observed ndv): a fixed expected-ndv would have to be
    # sized for the biggest file and then dominates small ones —
    # measured 2.0x total corpus bytes at a 1M-ndv fixed setting vs
    # 1.06x adaptive on the same data (BENCH/BASELINE.md)
    "parquet.bloom.filter.adaptive.enabled": "true",
}


# One shared option set for every url-keyed parquet sink (extraction
# output, corpus build, compaction rewrite) so the storage contract
# stays uniform: the url bloom above, plus zstd compression — measured
# 0.62x the bytes of Spark's snappy default on the sf0.1 text corpus
# with no write/read penalty (BENCH/BASELINE.md); at 100 TB that is
# ~38% of the storage and scan IO back for free.
CORPUS_SINK_OPTIONS = {**URL_BLOOM_OPTIONS, "compression": "zstd"}


def with_url_bloom(writer):
    """Apply :data:`CORPUS_SINK_OPTIONS` (url bloom + zstd) to a
    ``DataFrameWriter``.  Presence of the bloom and the codec are
    verified through parquet metadata in the tests."""
    for k, v in CORPUS_SINK_OPTIONS.items():
        writer = writer.option(k, v)
    return writer


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
        except Exception as exc:
            # create only on a genuine missing-table error; anything
            # else (schema drift, catalog outage) must surface — a blind
            # create() would mask it behind 'table already exists'
            if not _is_missing_table(exc):
                raise
            bucketed.writeTo(out_path).partitionedBy(
                F.col("status"), F.col(bucket_col)
            ).create()
        return
    (
        with_url_bloom(bucketed.write)
        .partitionBy("status", bucket_col)
        .mode(mode)
        .parquet(out_path)
    )


JSONL_EXPORT_COLUMNS = ("url", "title", "text", "lang")


def write_jsonl(
    extracted: DataFrame,
    path: str,
    *,
    columns: tuple[str, ...] = JSONL_EXPORT_COLUMNS,
    compression: str | None = "gzip",
) -> None:
    """Training-ready JSON-lines export: one object per document, one
    ``part-*.json.gz`` file per partition — the interchange format most
    LLM data loaders consume directly.

    Plain ``DataFrameWriter.json``: serialization stays JVM-side and
    the file-per-partition layout makes each output file an independent
    unit of downstream parallelism, same contract as the WET export.
    Requested columns must exist (a silent subset would ship a
    different schema than the caller asked for).
    """
    missing = [c for c in columns if c not in extracted.columns]
    if missing:
        raise ValueError(f"jsonl export columns not in frame: {missing}")
    writer = extracted.select(*columns).write.mode("overwrite")
    if compression:
        writer = writer.option("compression", compression)
    writer.json(path)


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
    # unique view name: a fixed one would let concurrent merges in the
    # same session clobber each other's source between the
    # createOrReplaceTempView and the MERGE resolving it
    view = f"_readability_merge_src_{uuid.uuid4().hex}"
    extracted.createOrReplaceTempView(view)
    try:
        on = " AND ".join(f"t.{k} = s.{k}" for k in keys)
        spark.sql(
            f"MERGE INTO {table} t USING {view} s ON {on} "
            "WHEN MATCHED THEN UPDATE SET * "
            "WHEN NOT MATCHED THEN INSERT *"
        )
    finally:
        try:
            spark.catalog.dropTempView(view)
        except Exception:  # noqa: BLE001 — view cleanup is best-effort
            pass


def write_extracted_batch(
    extracted: DataFrame,
    out_path: str,
    batch_id: int,
    *,
    bucket_col: str = "url_bucket",
    n_buckets: int = 64,
) -> None:
    """Idempotent per-micro-batch write for streaming foreachBatch.

    Deletes the batch's entire ``batch_id=N`` subtree first, then
    appends it fresh — a micro-batch retried after a partial write
    replaces ALL of its previous rows, including ones whose
    (status, bucket) sub-partitions the retry no longer produces
    (dynamic partition overwrite alone would leave those stale).
    Together with the streaming checkpoint this gives exactly-once
    output per batch. NB on eventually-consistent object stores the
    delete-then-write pair is not atomic — use the Iceberg sink there.
    """
    df = extracted.withColumn("batch_id", F.lit(int(batch_id))).withColumn(
        bucket_col, F.pmod(F.xxhash64("url"), F.lit(n_buckets)).cast("int")
    )
    spark = df.sparkSession
    jvm = spark._jvm
    jpath = jvm.org.apache.hadoop.fs.Path(f"{out_path}/batch_id={int(batch_id)}")
    fs = jpath.getFileSystem(spark._jsc.hadoopConfiguration())
    if fs.exists(jpath):
        fs.delete(jpath, True)
    (
        df.write.partitionBy("batch_id", "status", bucket_col)
        .mode("append")
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
        except Exception as exc:
            if not _is_missing_table(exc):
                raise
            df.writeTo(f"{out_path}_metrics").create()
        return
    df.write.mode("append").parquet(f"{out_path}/_metrics")


def read_done_urls(
    spark: SparkSession,
    out_path: str,
    *,
    done_statuses: tuple[str, ...] | None = None,
    table_format: str = "parquet",
) -> DataFrame | None:
    """Urls already committed to the output table (checkpoint state for
    anti-join resume). Returns None when no output exists yet.

    By default every written url counts as done (``done_statuses=None``)
    — with the append-mode parquet sink, retrying is what must be opted
    INTO: a url that fails deterministically would otherwise gain one
    duplicate row per resume, forever. To retry the transient class,
    pass ``done_statuses=TERMINAL_STATUSES`` ('ok', 'not_readable',
    'empty' and 'too_large' are deterministic outcomes; 'error' rows get
    re-extracted), accepting the duplicate rows on the parquet sink
    (dedup at read via the q_dedup_latest shape) — or use
    merge_extracted_iceberg, which upserts in place. The status filter
    partition-prunes (the output is partitioned by status).

    Only a genuinely-missing output (first run) returns None; any other
    read failure (catalog outage, permissions, corrupt footer)
    propagates — silently treating it as a first run would disable
    resume and re-append the entire committed output as duplicates."""
    try:
        if table_format == "iceberg":
            out = spark.read.format("iceberg").load(out_path)
        else:
            out = spark.read.parquet(out_path)
        if done_statuses is not None:
            out = out.filter(F.col("status").isin(list(done_statuses)))
        return out.select("url")
    except Exception as exc:
        if _is_missing_table(exc):
            return None  # first run: nothing committed yet
        raise


def write_bucketed(
    df: DataFrame,
    table: str,
    path: str,
    n_buckets: int,
    key: str = "url",
    sort: bool = True,
) -> None:
    """Write ``df`` as a BUCKETED (and optionally bucket-sorted)
    parquet table registered in the session catalog.

    Bucketing is the mechanism for repeated co-located joins: two
    tables bucketed on the same key with the same bucket count satisfy
    each other's join distribution, so a join between them runs with
    ZERO exchange on either side (plan-asserted in
    tests/test_plans.py).  With ``sort=True`` each bucket is written
    as ONE sorted file (the repartition below guarantees the 1:1
    task-to-bucket mapping); Spark 4 no longer propagates on-disk
    order from bucketed scans (the 3.x legacy flag was removed), so a
    sort-merge join still adds a LOCAL sort — per-partition, no
    exchange, and nearly free over already-sorted runs — while the
    shuffle, the expensive part, stays eliminated.  At 100 TB this is
    the
    layout for artifact families that are re-joined on every run:
    corpus <-> manifest audits, corpus <-> eval label tables, update
    deltas <-> the stored corpus. One bucketed write amortizes the
    exchange that every later join would otherwise pay; Spark's rule
    of thumb is to size ``n_buckets`` so a bucket is 100-200 MB.

    The bucket spec lives in the catalog, not the files: this sandbox
    runs the default in-memory catalog, so the registration (and the
    exchange-free plans) lasts for the session. Production deployments
    point the session at a persistent metastore (or use Iceberg's
    bucket partition transform, sources/pages.py) and keep it across
    jobs. ``spark.table(table)`` reads it back bucket-aware;
    ``spark.read.parquet(path)`` reads the same bytes WITHOUT the
    bucket metadata (correct, but joins shuffle again).
    """
    spark = df.sparkSession
    spark.sql(f"DROP TABLE IF EXISTS {table}")
    if sort:
        # Spark only trusts a bucket's on-disk sort order when the
        # bucket is ONE file; repartitioning on the bucket key uses the
        # same hash as the bucketing spec, so each task owns exactly
        # one bucket and writes exactly one file
        df = df.repartition(n_buckets, F.col(key))
    w = df.write.format("parquet").mode("overwrite").option("path", path)
    w = w.bucketBy(n_buckets, key)
    if sort:
        w = w.sortBy(key)
    w.saveAsTable(table)
