"""Batch extraction job — the spark-submit entry point.

    spark-submit --py-files readability_ex_spark.zip scripts/run_job.py \
        --input  /data/pages          # parquet/Iceberg pages table
        --output /data/extracted      # output table root
        [--urls  /data/golden_urls]   # optional: restrict to these urls
        [--partitions 4096]           # repartition width before the UDF
        [--no-resume]                 # reprocess everything
        [--run-id crawl-2026-08]

Reads the Common-Crawl-style pages table (url, warc_ts, html, text,
lang), dedups to the latest crawl per url, anti-joins urls already
committed (checkpoint resume), repartitions by xxhash64(url), runs the
readability kernel in Arrow batches, writes the output partitioned by
status + url bucket, and appends a per-partition metrics rollup.
"""

from __future__ import annotations

import argparse
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
if str(REPO) not in sys.path:
    sys.path.insert(0, str(REPO))


def _committed_with_outlinks(spark, output: str):
    """Read back the whole committed output table for the link-graph
    artifacts, schema-merged: a resumed run may append onto files
    written by an older code version without the ``outlinks`` column,
    and a single-footer schema inference would then either raise
    UNRESOLVED_COLUMN or silently drop the old rows' edges depending on
    which file wins listing order.  mergeSchema makes it deterministic
    (legacy rows read outlinks as NULL and are filtered, new rows
    contribute); a table with NO outlinks anywhere fails loudly."""
    committed = spark.read.option("mergeSchema", "true").parquet(output)
    if "outlinks" not in committed.columns:
        raise SystemExit(
            "--host-rank/--inlinks/--frontier need the kernel-emitted "
            f"outlinks column, which no file under {output} carries — "
            "the output predates it; re-run extraction with this code "
            "version first"
        )
    return committed


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", required=True)
    ap.add_argument("--output", required=True)
    ap.add_argument("--urls", default=None, help="semi-join url allowlist")
    ap.add_argument("--partitions", type=int, default=None)
    ap.add_argument("--no-resume", action="store_true")
    ap.add_argument(
        "--retry-errors", action="store_true",
        help="on resume, re-extract urls whose last status was 'error' "
        "(transient failures); with the append-mode parquet sink this "
        "adds a new row per retry — dedup at read or use the iceberg "
        "MERGE path",
    )
    ap.add_argument("--no-dedup", action="store_true")
    ap.add_argument(
        "--canonical-urls", action="store_true",
        help="rewrite every url to its canonical form at read time "
        "(tracking-param/fragment/case/port normalization) so "
        "url-spelling duplicates collapse in the latest-fetch dedup "
        "BEFORE the extraction kernel runs. All url-keyed state "
        "(--urls allowlist, resume set, output) then lives in "
        "canonical space — use the flag consistently across runs",
    )
    ap.add_argument(
        "--chain-pages", type=int, default=0, metavar="MAX",
        help="also emit a multi-page chain table (url -> root_url, "
        "page_number) via next-link corpus self-joins, up to MAX pages",
    )
    ap.add_argument(
        "--assemble-chains", action="store_true",
        help="with --chain-pages: also emit merged multi-page articles "
        "(reference wrap_page semantics) to <output>/_assembled",
    )
    ap.add_argument(
        "--no-html", action="store_true",
        help="omit content_html from the output (text-only pipelines)",
    )
    ap.add_argument(
        "--table-format", choices=("parquet", "iceberg", "warc"),
        default="parquet",
        help="input/output table format; iceberg treats --input/--output "
        "as catalog table names (requires an Iceberg-enabled session); "
        "warc reads raw .warc/.warc.gz crawl segments (output stays "
        "parquet)",
    )
    ap.add_argument(
        "--export-wet", default=None, metavar="DIR",
        help="additionally export the ok-rows' extracted text as "
        "Common-Crawl WET files (conversion records) under DIR; the "
        "parquet/iceberg output stays the canonical, resumable artifact",
    )
    ap.add_argument(
        "--export-jsonl", default=None, metavar="DIR",
        help="additionally export the ok-rows as gzipped JSON-lines "
        "(url/title/text/lang per object) under DIR — the format LLM "
        "data loaders consume directly",
    )
    ap.add_argument(
        "--host-rank", action="store_true",
        help="also write a host-level PageRank artifact to "
        "<output>/_hostrank, computed over the kernel-emitted outlinks "
        "of the FULL output table (read back after this run's append, "
        "so resumed runs rank the whole corpus, not the residual); "
        "page-level edges are distinct-ed first so --retry-errors "
        "appends can't double-count a link",
    )
    ap.add_argument(
        "--anchors", action="store_true",
        help="also write the per-target anchor-text index to "
        "<output>/_anchors (how the web describes each target — a "
        "training-data signal). Needs anchor TEXT, which the kernel "
        "outlinks column drops, so this re-scans the raw pages with "
        "the codegen harvest (no second kernel parse)",
    )
    ap.add_argument(
        "--inlinks", action="store_true",
        help="also write the per-target in-degree rollup to "
        "<output>/_inlinks (link instances, distinct source pages and "
        "hosts per target url), computed over the kernel-emitted "
        "outlinks of the FULL output table like --host-rank; edges are "
        "distinct-ed so --retry-errors appends can't double-count "
        "(kernel outlinks are per-page deduped already, so n_inlinks "
        "equals n_src_pages on this artifact)",
    )
    ap.add_argument(
        "--frontier", type=int, default=None, metavar="PER_HOST",
        help="also write the next crawl batch to <output>/_frontier: "
        "the kernel-emitted outlinks of the FULL output table plus "
        "content <loc>s from the input crawl's own archived sitemap "
        "fetches, canonicalized, minus every url the table already "
        "covers, politeness-capped at PER_HOST urls per host "
        "(skew-safe two-stage top-k; urlops.crawl_frontier)",
    )
    ap.add_argument(
        "--frontier-agent", default=None, metavar="AGENT",
        help="with --frontier: apply the RFC 9309 rules governing "
        "AGENT (exact agent group else *) to the frontier — "
        "disallowed urls never enter the schedule — and annotate each "
        "surviving row with the host's Crawl-delay; both lifted from "
        "the INPUT crawl's own /robots.txt rows "
        "(robotstxt.robots_from_pages); hosts that declare no delay "
        "get NULL",
    )
    ap.add_argument(
        "--recrawl", type=int, default=None, metavar="PER_HOST",
        help="also write the refetch schedule to <output>/_recrawl: "
        "KNOWN urls from the input crawl ranked by staleness of their "
        "latest fetch (day granularity of warc_ts) weighted by host "
        "size, politeness-capped at PER_HOST urls per host — the "
        "frontier's twin for pages already crawled "
        "(urlops.recrawl_schedule)",
    )
    ap.add_argument("--run-id", default=None)
    args = ap.parse_args()

    from pyspark.sql import SparkSession

    from readability_ex_spark.pipeline import metrics_rollup, run_extraction
    from readability_ex_spark.sinks import (
        read_done_urls,
        write_extracted,
        write_metrics,
    )
    from readability_ex_spark.sources.pages import read_pages

    if args.assemble_chains and (args.no_html or args.chain_pages <= 1):
        ap.error("--assemble-chains requires --chain-pages >= 2 and html "
                 "output (incompatible with --no-html)")
    if args.chain_pages > 1 and args.table_format == "iceberg":
        ap.error("--chain-pages emits parquet artifacts under --output, "
                 "which is a catalog table name with --table-format "
                 "iceberg; run the chain pass with parquet output")
    if args.host_rank and args.table_format == "iceberg":
        ap.error("--host-rank writes a parquet artifact under --output; "
                 "run it with parquet output")
    if args.anchors and args.table_format == "iceberg":
        ap.error("--anchors writes a parquet artifact under --output; "
                 "run it with parquet output")
    if args.inlinks and args.table_format == "iceberg":
        ap.error("--inlinks writes a parquet artifact under --output; "
                 "run it with parquet output")
    if args.frontier is not None and args.table_format == "iceberg":
        ap.error("--frontier writes a parquet artifact under --output; "
                 "run it with parquet output")
    if args.frontier is not None and args.frontier < 1:
        ap.error("--frontier PER_HOST must be >= 1")
    if args.recrawl is not None and args.table_format == "iceberg":
        ap.error("--recrawl writes a parquet artifact under --output; "
                 "unsupported with --table-format iceberg")
    if args.recrawl is not None and args.recrawl < 1:
        ap.error("--recrawl PER_HOST must be >= 1")
    if args.frontier_agent is not None and args.frontier is None:
        ap.error("--frontier-agent requires --frontier")

    spark = SparkSession.builder.appName("readability_extract").getOrCreate()
    run_id = args.run_id or f"run-{int(time.time())}"

    # warc input still writes/reads parquet on the output side
    out_format = "parquet" if args.table_format == "warc" else args.table_format
    pages = read_pages(spark, args.input, table_format=args.table_format)
    if args.canonical_urls:
        from pyspark.sql import functions as F

        from readability_ex_spark.operators.urlops import canonicalize_url

        pages = pages.withColumn("url", canonicalize_url(F.col("url")))
    if args.urls:
        allow = spark.read.parquet(args.urls).select("url")
        pages = pages.join(allow, "url", "left_semi")

    from readability_ex_spark.sinks import TERMINAL_STATUSES

    done = (
        None
        if args.no_resume
        else read_done_urls(
            spark,
            args.output,
            done_statuses=TERMINAL_STATUSES if args.retry_errors else None,
            table_format=out_format,
        )
    )
    extracted = run_extraction(
        pages,
        n_partitions=args.partitions,
        dedup=not args.no_dedup,
        done_urls=done,
        emit_html=not args.no_html,
    ).cache()

    write_extracted(extracted, args.output, table_format=out_format)
    if args.export_wet:
        from pyspark.sql import functions as F

        from readability_ex_spark.sources.warc import write_wet

        write_wet(
            extracted.filter(F.col("status") == "ok"), args.export_wet
        )
    if args.export_jsonl:
        from pyspark.sql import functions as F

        from readability_ex_spark.sinks import write_jsonl

        write_jsonl(
            extracted.filter(F.col("status") == "ok"), args.export_jsonl
        )
    write_metrics(
        metrics_rollup(extracted), args.output, run_id,
        table_format=out_format,
    )

    if args.chain_pages > 1:
        from readability_ex_spark.operators.paging import (
            assemble_articles,
            chain_pages,
        )

        # fresh runs reuse the kernel-emitted next_url edges (one less
        # full-corpus parse); resumed runs re-derive from the raw pages
        # because `extracted` only covers this run's residual urls
        edges = (
            extracted.select("url", "next_url") if done is None else None
        )
        chains = chain_pages(pages, max_pages=args.chain_pages, edges=edges)
        chains.write.mode("append").parquet(f"{args.output}/_page_chains")
        if args.assemble_chains:
            assemble_articles(
                chains, extracted.filter(extracted.status == "ok")
            ).write.mode("append").parquet(f"{args.output}/_assembled")

    if args.anchors:
        from readability_ex_spark.operators.linkgraph import (
            anchor_index,
            extract_anchors,
        )
        from readability_ex_spark.pipeline import dedup_latest_crawl

        # latest fetch per url first: a crawl input carries repeated
        # (url, warc_ts) fetches, and counting each fetch's anchors
        # would skew n_anchors by REFETCH frequency, not link frequency
        # (the same collapse run_extraction and the edge .distinct()s
        # apply)
        anchor_index(extract_anchors(dedup_latest_crawl(pages))).write.mode(
            "overwrite"
        ).parquet(f"{args.output}/_anchors")

    if args.host_rank:
        from pyspark.sql import functions as F

        from readability_ex_spark.operators.linkgraph import (
            host_graph,
            host_pagerank,
        )

        # read BACK the output table: it now holds every run's rows, so
        # the graph covers the whole corpus even on a resumed run.
        # outlinks are harvested pre-parse, so not_readable/error pages
        # still contribute their edges — only empty-html rows drop out.
        committed = _committed_with_outlinks(spark, args.output)
        edges = (
            committed.filter(F.col("outlinks").isNotNull())
            .select("url", F.explode("outlinks").alias("dst"))
            .distinct()
        )
        ranks = host_pagerank(
            host_graph(edges, src_col="url", dst_col="dst"), iterations=5
        )
        ranks.write.mode("overwrite").parquet(f"{args.output}/_hostrank")

    if args.inlinks:
        from pyspark.sql import functions as F

        from readability_ex_spark.operators.linkgraph import inlink_rollup

        # same read-back discipline as --host-rank: the artifact covers
        # every committed row, resumed runs included
        committed = _committed_with_outlinks(spark, args.output)
        edges = (
            committed.filter(F.col("outlinks").isNotNull())
            .select(F.col("url").alias("src"), F.explode("outlinks").alias("dst"))
            .distinct()
        )
        inlink_rollup(edges).write.mode("overwrite").parquet(
            f"{args.output}/_inlinks"
        )

    if args.frontier is not None:
        from pyspark.sql import functions as F

        from readability_ex_spark.operators.urlops import crawl_frontier

        from readability_ex_spark.operators.robotstxt import (
            parse_sitemap_urls,
            sitemaps_from_pages,
        )

        committed = _committed_with_outlinks(spark, args.output)
        discovered = (
            committed.filter(F.col("outlinks").isNotNull())
            .select(F.explode("outlinks").alias("url"))
            .filter(F.col("url").isNotNull())
        )
        # sitemap discovery: content locs join the candidate pool
        # (index locs are MORE sitemaps, not content — they go back
        # through the fetch loop, not the frontier)
        sitemap_locs = (
            parse_sitemap_urls(sitemaps_from_pages(pages))
            .filter(~F.col("from_index"))
            .select(F.col("loc").alias("url"))
        )
        discovered = discovered.unionByName(sitemap_locs)
        delays = None
        pre_cap = None
        if args.frontier_agent:
            from readability_ex_spark.operators.robotstxt import (
                crawl_delay_for_agent,
                parse_crawl_delay,
                parse_robots,
                robots_filter,
                robots_from_pages,
            )

            # one robots lift feeds both halves of the policy: RFC 9309
            # rules drop disallowed urls as crawl_frontier's
            # pre_cap_filter — AFTER canonicalize/distinct/anti-join
            # (the verdict is computed on the CANONICAL url the crawler
            # will actually fetch, over bounded distinct NEW urls, not
            # raw edges) and BEFORE the per-host cap (a disallowed url
            # must not consume the host's quota) — and Crawl-delay
            # annotates what survives
            robots_bodies = robots_from_pages(pages).localCheckpoint(
                eager=True
            )
            rules = parse_robots(robots_bodies)

            def pre_cap(df, _rules=rules):
                return robots_filter(
                    df, _rules, agent=args.frontier_agent
                )

            delays = crawl_delay_for_agent(
                parse_crawl_delay(robots_bodies),
                agent=args.frontier_agent,
            )
        frontier = crawl_frontier(
            discovered,
            committed.select("url"),
            max_per_host=args.frontier,
            pre_cap_filter=pre_cap,
        )
        if delays is not None:
            # tiny per-host table; hosts with no declared delay -> NULL
            frontier = frontier.join(F.broadcast(delays), "host", "left")
        frontier.write.mode("overwrite").parquet(f"{args.output}/_frontier")

    if args.recrawl is not None:
        from pyspark.sql import functions as F

        from readability_ex_spark.operators.urlops import recrawl_schedule

        # the INPUT crawl holds the fetch history (the output table
        # drops warc_ts); latest fetch per url at day granularity
        history = pages.select(
            "url", F.to_date("warc_ts").alias("fetch_date")
        )
        recrawl_schedule(history, per_host=args.recrawl).write.mode(
            "overwrite"
        ).parquet(f"{args.output}/_recrawl")

    by_status = {
        r["status"]: r["count"]
        for r in extracted.groupBy("status").count().collect()
    }
    print(f"run_id={run_id} processed={sum(by_status.values())} {by_status}")
    extracted.unpersist()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
