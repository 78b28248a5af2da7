"""Plan-quality regression tests: the physical plans the 100 TB story
depends on, pinned so a refactor can't silently reintroduce a shuffle
or lose pushdown/pruning."""

from __future__ import annotations

import io
import re
from contextlib import redirect_stdout

import pyspark.sql.functions as F

from readability_ex_spark.pipeline import run_extraction
from readability_ex_spark.sources.pages import synthesize_pages

SF = "/root/testdata/sf0.001"


def _formatted_plan(df) -> str:
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain(mode="formatted")
    return buf.getvalue()


def _tree(plan: str) -> str:
    return plan.split("\n\n")[0]


def test_extract_pipeline_single_payload_exchange(spark):
    """Unsalted pipeline: exactly ONE Exchange moves the html payload —
    the explicit url repartition runs first and the dedup window's
    ClusteredDistribution(url) is satisfied by it (a window-first order
    re-shuffled the full corpus whenever shuffle.partitions differed
    from n_partitions)."""
    pages = synthesize_pages(spark, SF)
    tree = _tree(_formatted_plan(run_extraction(pages)))
    assert tree.count("Exchange") == 1
    # and the kernel stage sits above the window, not behind a second
    # exchange
    assert tree.index("MapInPandas") < tree.index("Exchange")


def test_extract_pipeline_salted_pays_two_exchanges(spark):
    """Salting is the documented skew escape hatch: (url, salt) layout
    cannot satisfy the url-only window, so the plan pays a second
    exchange — pinned so the cost stays a deliberate choice."""
    pages = synthesize_pages(spark, SF)
    tree = _tree(_formatted_plan(run_extraction(pages, salt_buckets=8)))
    assert tree.count("Exchange") == 2


def test_filter_project_pushdown_and_pruning(spark):
    """Filters reach the parquet scan as PushedFilters and the scan reads
    only the projected columns (no `source`)."""
    from readability_ex_spark.operators.relational import q_filter_project

    plan = _formatted_plan(q_filter_project(spark, SF))
    pushed = re.search(r"PushedFilters: \[(.*?)\]", plan).group(1)
    assert "EqualTo(lang,en)" in pushed
    assert "GreaterThan(n_chars,200)" in pushed
    schema = re.search(r"ReadSchema: (\S+)", plan).group(1)
    assert "source" not in schema


def test_broadcast_join_is_broadcast(spark):
    """The small dimension side must broadcast (no shuffle of the fact
    side on the join key)."""
    from readability_ex_spark.operators.relational import q_broadcast_join

    tree = _tree(_formatted_plan(q_broadcast_join(spark, SF)))
    assert "BroadcastHashJoin" in tree


def test_extract_plan_prunes_unused_document_columns(spark):
    """The kernel consumes url/warc_ts/html only; the page-synthesis
    scans must not read the documents table's unused columns."""
    pages = synthesize_pages(spark, SF)
    plan = _formatted_plan(run_extraction(pages))
    for schema in re.findall(r"ReadSchema: (\S+)", plan):
        assert "n_chars" not in schema and "source" not in schema


def test_resume_anti_join_plan_shape(spark):
    """Checkpoint resume (run_extraction(done_urls=...)): the anti-join
    runs BEFORE the kernel layout so resumed runs still pay exactly ONE
    payload exchange, and a small done-set broadcasts (the remaining
    work must not be shuffled against the done list)."""
    pages = synthesize_pages(spark, SF)
    done = pages.select("url").filter(F.col("url").rlike("doc/1"))
    tree = _tree(_formatted_plan(run_extraction(pages, done_urls=done)))
    # broadcast anti-join, not a shuffled one
    assert "BroadcastHashJoin" in tree and "LeftAnti" in tree
    assert "SortMergeJoin" not in tree
    # the payload still moves exactly once (BroadcastExchange of the
    # done list is not a payload move)
    n_payload_exchanges = len(re.findall(r"\+- Exchange ", tree))
    assert n_payload_exchanges == 1
    # kernel sits above that single exchange (anti-join ran below it)
    assert tree.index("MapInPandas") < tree.index("+- Exchange ")
    assert tree.index("+- Exchange ") < tree.index("BroadcastHashJoin")


def test_anti_join_resume_query_plan_shape(spark):
    """The benched anti_join_resume query: the done-side scan is pruned
    to the join key only, and the join stays a single anti-join (no
    extra exchange of the orders payload beyond the join's own
    requirement)."""
    from readability_ex_spark.operators.relational import q_anti_join_resume

    plan = _formatted_plan(q_anti_join_resume(spark, SF))
    assert "LeftAnti" in plan
    # lineitem feeds only its join key into the anti-join
    li_schema = [
        s for s in re.findall(r"ReadSchema: (\S+)", plan) if "l_orderkey" in s
    ]
    assert li_schema and all(
        "l_quantity" not in s and "l_extendedprice" not in s
        for s in li_schema
    )
    # orders scan reads exactly the three projected columns
    o_schema = [
        s for s in re.findall(r"ReadSchema: (\S+)", plan) if "o_orderkey" in s
    ]
    assert o_schema and all("o_orderdate" not in s for s in o_schema)


def test_bucketed_tables_join_with_zero_exchange(spark, tmp_path):
    """Two tables bucketed+sorted on the same key and bucket count join
    with no exchange and no sort on either side — the co-located-join
    layout write_bucketed exists for."""
    from readability_ex_spark.sinks import write_bucketed

    docs = spark.range(2000).select(
        F.concat(F.lit("http://h"), F.col("id") % 97, F.lit(".com/p"),
                 F.col("id")).alias("url"),
        (F.col("id") * 7).alias("score"),
    )
    labels = spark.range(2000).select(
        F.concat(F.lit("http://h"), F.col("id") % 97, F.lit(".com/p"),
                 F.col("id")).alias("url"),
        (F.col("id") % 3).alias("label"),
    )
    write_bucketed(docs, "bt_docs", str(tmp_path / "d"), 8)
    write_bucketed(labels, "bt_labels", str(tmp_path / "l"), 8)
    try:
        joined = (
            spark.table("bt_docs")
            .hint("merge")  # forbid broadcast: the co-location must carry it
            .join(spark.table("bt_labels"), "url")
        )
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan
        assert "SortMergeJoin" in plan
        assert joined.count() == 2000
        # Spark 4 dropped on-disk-order propagation from bucketed
        # scans, so an SMJ still sorts — but LOCALLY (global=false),
        # never through an exchange
        for m in re.finditer(r"Sort \[[^]]*\], (\w+),", plan):
            assert m.group(1) == "false"
        # a plain parquet read of the same files lacks the bucket
        # metadata and must shuffle again (the catalog is the carrier)
        raw = (
            spark.read.parquet(str(tmp_path / "d"))
            .hint("merge")
            .join(spark.read.parquet(str(tmp_path / "l")), "url")
        )
        rawplan = raw._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" in rawplan
    finally:
        spark.sql("DROP TABLE IF EXISTS bt_docs")
        spark.sql("DROP TABLE IF EXISTS bt_labels")
