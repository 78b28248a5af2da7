"""SparkSession factory tuned for the extraction workload.

Local-mode defaults mirror what we would set on a real cluster:
AQE on (runtime shuffle re-plan + skew-join), Arrow enabled for the
pandas-UDF path, and Arrow batches capped small because HTML rows are
megabytes (the default 10k rows/batch would blow executor memory).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

# HTML pages are MB-scale; cap rows per Arrow batch so a batch stays
# well under executor memory even at p99 page size (~5 MB * 256 ~= 1.3 GB
# would be too much; 64 rows * 5 MB = 320 MB worst case, typical ~10 MB).
ARROW_MAX_RECORDS_PER_BATCH = 64


def get_spark(
    app_name: str = "readability_ex_spark",
    cores: int | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or fetch) a SparkSession.

    ``cores`` controls local parallelism (``local[cores]``); defaults to
    ``$SPARK_GRAFT_CPUS`` or ``*``. On a real cluster the master comes from
    spark-submit and this becomes a no-op passthrough.
    """
    if cores is None:
        env = os.environ.get("SPARK_GRAFT_CPUS")
        master = f"local[{env}]" if env else "local[*]"
    else:
        master = f"local[{cores}]"
    if shuffle_partitions is None:
        shuffle_partitions = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))

    builder = (
        SparkSession.builder.master(master)
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config(
            "spark.sql.execution.arrow.maxRecordsPerBatch",
            str(ARROW_MAX_RECORDS_PER_BATCH),
        )
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "8g"))
        .config("spark.ui.enabled", "false")
        .config("spark.driver.extraJavaOptions", "-Djava.net.preferIPv4Stack=true")
    )
    if extra_conf:
        for k, v in extra_conf.items():
            builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
