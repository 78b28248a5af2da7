"""Relational pipeline operators (SURVEY.md §2.B).

Each function takes ``(spark, sf_dir)`` and returns a DataFrame; they are
the building blocks of the extraction pipeline (filter, projection+hash,
window dedup, anti-join resume, semi join, broadcast join, aggregation
counters, top-k, set ops) expressed as stock DataFrame ops so Catalyst
handles pushdown/pruning/join strategy.

All computed columns are aliased to match the DuckDB oracle SQL in
``__spark_entry__.oracle_sql`` exactly. Float aggregates are rounded to
stabilize cross-engine value hashing.

Reference parity notes cite /root/reference file:line where the operator
mirrors a pipeline need from the survey.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def q_filter_project(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scan -> filter -> projection with content hash.

    Mirrors the pipeline's pre-UDF stage: drop null/short docs, filter on
    lang, derive a deterministic content hash (md5 — portable across
    engines, unlike xxhash64 which we use for partitioning only).
    """
    docs = _t(spark, sf_dir, "documents")
    return (
        docs.filter((F.col("lang") == "en") & (F.col("n_chars") > 200))
        .select(
            F.col("doc_id"),
            F.md5(F.col("text")).alias("text_md5"),
            F.col("n_chars"),
            F.octet_length(F.col("text")).cast("long").alias("n_bytes"),
        )
        .orderBy("doc_id")
    )


def q_dedup_latest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Latest-crawl dedup pattern: one row per key by max timestamp.

    In the page pipeline this is `one row per url at max warc_ts`
    (SURVEY.md §2.B "Dedup / latest-crawl pick"); exercised here as
    latest order per customer with a deterministic tiebreak.
    """
    orders = _t(spark, sf_dir, "orders")
    w = W.partitionBy("o_custkey").orderBy(
        F.col("o_orderdate").desc(), F.col("o_orderkey").desc()
    )
    return (
        orders.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            "o_custkey",
            "o_orderkey",
            F.col("o_orderdate").cast("string").alias("latest_date"),
        )
        .orderBy("o_custkey")
    )


def q_agg_counters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hash aggregation with partial (map-side) combine — the metrics
    rollup pattern (docs in / ok / failed / bytes per partition)."""
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.count("*").alias("n_rows"),
            F.sum("l_quantity").cast("double").alias("sum_qty"),
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue"),
            F.round(F.avg("l_discount"), 6).alias("avg_disc"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


def q_anti_join_resume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Checkpoint-resume pattern: source ANTI JOIN done -> remaining work.

    Here: orders that have no lineitem rows (stand-in for `urls not yet
    in the committed output table`)."""
    orders = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem").select(
        F.col("l_orderkey").alias("o_orderkey")
    )
    return (
        orders.join(li, "o_orderkey", "left_anti")
        .select("o_orderkey", "o_custkey", "o_totalprice")
        .orderBy("o_orderkey")
    )


def q_semi_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Golden-subset restriction pattern: SEMI JOIN corpus to fixtures."""
    cust = _t(spark, sf_dir, "customer")
    orders = _t(spark, sf_dir, "orders").filter(
        F.col("o_totalprice") > 100000.0
    )
    return (
        cust.join(
            orders.select(F.col("o_custkey").alias("c_custkey")),
            "c_custkey",
            "left_semi",
        )
        .select("c_custkey", "c_name", "c_nationkey")
        .orderBy("c_custkey")
    )


def q_broadcast_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Small-dim broadcast join + rollup (customers per region)."""
    cust = _t(spark, sf_dir, "customer")
    nation = _t(spark, sf_dir, "nation")
    region = _t(spark, sf_dir, "region")
    dim = F.broadcast(
        nation.join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .select(F.col("n_nationkey"), F.col("r_name"))
    )
    return (
        cust.join(dim, cust.c_nationkey == dim.n_nationkey)
        .groupBy("r_name")
        .agg(
            F.count("*").alias("n_customers"),
            F.round(F.sum("c_acctbal"), 2).alias("sum_acctbal"),
        )
        .orderBy("r_name")
    )


def q_part_brand_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hash aggregation with a HAVING-style post-filter over part."""
    part = _t(spark, sf_dir, "part")
    return (
        part.groupBy("p_brand")
        .agg(
            F.count("*").alias("n_parts"),
            F.round(F.avg("p_retailprice"), 2).alias("avg_price"),
            F.max("p_size").alias("max_size"),
        )
        .filter(F.col("n_parts") >= 2)
        .orderBy("p_brand")
    )


def q_supplier_balance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Broadcast dim join + rollup over supplier (balance per nation)."""
    supp = _t(spark, sf_dir, "supplier")
    nation = _t(spark, sf_dir, "nation")
    return (
        supp.join(F.broadcast(nation), supp.s_nationkey == nation.n_nationkey)
        .groupBy("n_name")
        .agg(
            F.count("*").alias("n_suppliers"),
            F.round(F.sum("s_acctbal"), 2).alias("sum_acctbal"),
        )
        .orderBy("n_name")
    )


def q_topk_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sort / top-k report: largest documents (largest-page report)."""
    docs = _t(spark, sf_dir, "documents")
    return (
        docs.select("doc_id", "n_chars", "lang")
        .orderBy(F.col("n_chars").desc(), F.col("doc_id").asc())
        .limit(10)
    )


def q_set_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Set-op conformance diff pattern (extracted EXCEPT golden)."""
    docs = _t(spark, sf_dir, "documents")
    all_en = docs.filter(F.col("lang") == "en").select("doc_id")
    long_en = docs.filter(
        (F.col("lang") == "en") & (F.col("n_chars") > 300)
    ).select("doc_id")
    return all_en.exceptAll(long_en).orderBy("doc_id")


SESSION_GAP_US = 30 * 60 * 1_000_000  # 30 idle minutes end a session


def q_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-based sessionization: a session ends after >30 idle minutes;
    per-user session stats (the standard event-stream rollup the
    streaming path would run with applyInPandasWithState).

    Plan shape: one shuffle on user_id, lag + cumulative-sum windows
    over (ts, event_id), then the session aggregation reuses the same
    clustering. Boundaries compare epoch MICROsecond integers —
    Spark's unix_micros and DuckDB's epoch_us agree exactly, where
    second-truncating unix_timestamp would misclassify sub-second gaps
    at the threshold.
    """
    from pyspark.sql import Window

    ev = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    # the parquet column is TIMESTAMP_NTZ; the session is pinned to UTC,
    # so the cast to (tz-aware) timestamp is value-preserving
    us = F.unix_micros(F.col("ts").cast("timestamp"))
    prev = F.lag(us).over(w)
    is_new = F.when(
        prev.isNull() | ((us - prev) > SESSION_GAP_US), 1
    ).otherwise(0)
    cum = Window.partitionBy("user_id").orderBy("ts", "event_id").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    sess = ev.withColumn("_new", is_new).withColumn(
        "session_id", F.sum("_new").over(cum)
    )
    return (
        sess.groupBy("user_id", "session_id")
        .agg(
            F.count("*").alias("n_events"),
            F.min(us).alias("start_us"),
            F.max(us).alias("end_us"),
            F.round(F.sum("value"), 2).alias("sum_value"),
        )
        .orderBy("user_id", "session_id")
    )


def q_events_props(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON property extraction from the events props column
    (semi-structured payloads ride crawl tables as JSON strings):
    per-event_type stats of the extracted numeric field."""
    ev = _t(spark, sf_dir, "events")
    k = F.get_json_object(F.col("props"), "$.k").cast("long")
    return (
        ev.select("event_type", k.alias("k"))
        .groupBy("event_type")
        .agg(
            F.count("k").alias("n_with_k"),
            F.sum("k").alias("sum_k"),
            F.max("k").alias("max_k"),
        )
        .orderBy("event_type")
    )


def q_events_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-bucketed aggregation (hourly counters by event type) —
    the batch shape of the streaming rollup."""
    ev = _t(spark, sf_dir, "events")
    return (
        ev.groupBy(
            F.date_trunc("hour", F.col("ts")).cast("string").alias("hour"),
            F.col("event_type"),
        )
        .agg(
            F.count("*").alias("n_events"),
            F.round(F.sum("value"), 2).alias("sum_value"),
        )
        .orderBy("hour", "event_type")
    )


# -- skew-safe per-key top-k (the "cap docs per domain" stage) --------------

def top_k_per_key(
    df: DataFrame,
    key_cols: list[str],
    order_by: list,
    k: int,
    salt_expr=None,
    n_salts: int = 16,
) -> DataFrame:
    """Deterministic top-``k`` rows per key, skew-safe.

    A single ``row_number`` window over the key puts EVERY row of a key
    into one task — at crawl scale one dominant host (10^8 pages) makes
    that task the job. Two stages bound it: stage 1 ranks within
    (key, salt) sub-groups and keeps each sub-group's top ``k`` (any
    global top-k row is necessarily in its own sub-group's top-k, so no
    candidate is lost); stage 2 re-ranks the surviving
    ``<= k × n_salts`` rows per key. The largest task anywhere is
    max-key-rows / n_salts for stage 1 and k × n_salts for stage 2.

    ``order_by`` must be a TOTAL order (include a unique tiebreaker) or
    the result is nondeterministic — the same requirement the naive
    window has. The salt only spreads a key's rows across tasks; the
    RESULT is salt-independent (stage 2 re-ranks with the total order),
    so the default — the input partition id — is fine; pass
    ``salt_expr`` (e.g. a hash of a unique column) to pin stage-1 task
    shapes across runs. Output = input columns + ``rk`` (1-based rank
    within the key).
    """
    salt = (
        salt_expr
        if salt_expr is not None
        else F.pmod(F.spark_partition_id(), F.lit(n_salts))
    )
    w1 = W.partitionBy(*key_cols, "_salt").orderBy(*order_by)
    survivors = (
        df.withColumn("_salt", salt)
        .withColumn("_r1", F.row_number().over(w1))
        .filter(F.col("_r1") <= k)
        .drop("_salt", "_r1")
    )
    w2 = W.partitionBy(*key_cols).orderBy(*order_by)
    return (
        survivors.withColumn("rk", F.row_number().over(w2))
        .filter(F.col("rk") <= k)
    )


def q_source_cap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cap the corpus at 3 docs per source (domain) — largest first,
    doc_id tiebreak — via the skew-safe two-stage top-k."""
    docs = _t(spark, sf_dir, "documents").select("doc_id", "source", "n_chars")
    return top_k_per_key(
        docs,
        ["source"],
        [F.col("n_chars").desc(), F.col("doc_id").asc()],
        k=3,
        salt_expr=F.pmod(F.xxhash64("doc_id"), F.lit(16)),
    ).orderBy("source", "rk")


def q_source_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source (domain) accounting: doc count, volume, language
    spread — the rollup a crawl-domination report reads."""
    docs = _t(spark, sf_dir, "documents")
    return (
        docs.groupBy("source")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_chars").alias("total_chars"),
            F.round(F.avg("n_chars"), 6).alias("mean_chars"),
            F.count_distinct("lang").alias("n_langs"),
            F.max("n_chars").alias("max_chars"),
        )
        .orderBy("source")
    )
