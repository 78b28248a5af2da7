"""Multi-page article chaining as a corpus self-join.

The reference's paging (paging.ex) pulls next pages over the network per
document; at crawl scale the next pages are usually *already in the
corpus*, so paging becomes: derive a (url -> next_url) edge per page,
then iteratively join the edge list against the corpus to assemble page
chains — no network, no per-row callbacks, bounded by ``max_pages``
joins (each a url-keyed hash join that co-partitions with the url-hash
layout)."""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _next_link_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    from readability_ex_spark.kernel.paging import next_page_of

    for pdf in batches:
        nxt = []
        for url, html in zip(pdf["url"], pdf["html"]):
            try:
                nxt.append(next_page_of(bytes(html), url) if html is not None else None)
            except Exception:  # noqa: BLE001
                nxt.append(None)
        yield pd.DataFrame({"url": pdf["url"], "next_url": nxt})


def next_page_edges(pages: DataFrame) -> DataFrame:
    """(url, next_url) edge per page; next_url null when no candidate."""
    return pages.select("url", "html").mapInPandas(
        _next_link_batches, "url string, next_url string"
    )


def chain_pages(
    pages: DataFrame, max_pages: int = 3, edges: DataFrame | None = None
) -> DataFrame:
    """Assemble multi-page chains: returns (root_url, url, page_number)
    rows for every page reachable from a chain root within max_pages.

    A root is a page that no other page points to. Each iteration is one
    url-keyed join — max_pages is small and fixed, so the plan stays a
    bounded chain of hash joins rather than a graph iteration.

    ``edges``: optional pre-computed (url, next_url) table. The
    extraction kernel already emits ``next_url`` (the DOM is built
    anyway), so passing ``extracted.select('url', 'next_url')`` avoids a
    second full-corpus Python parse; when omitted, the edges are derived
    from the raw pages here."""
    # localCheckpoint (lazy) instead of cache(): the edge derivation runs
    # its Python next-link extraction once, the blocks are reused by the
    # max_pages-1 joins below, and — unlike a cache this operator could
    # never safely unpersist (its output is lazy) — the blocks are freed
    # by the ContextCleaner as soon as the DataFrame is garbage
    # collected, so repeated calls in a long-lived driver don't leak.
    if edges is None:
        edges = next_page_edges(pages)
    edges = (
        edges.select("url", "next_url")
        .filter(F.col("next_url").isNotNull() & (F.col("next_url") != F.col("url")))
        .localCheckpoint(eager=False)
    )

    targets = edges.select(F.col("next_url").alias("url")).distinct()
    roots = (
        pages.select("url")
        .join(targets, "url", "left_anti")
        .select(F.col("url").alias("root_url"), F.col("url"))
        .withColumn("page_number", F.lit(1))
    )

    out = roots
    frontier = roots
    for _ in range(max_pages - 1):
        nxt = (
            frontier.join(edges, "url")
            .join(pages.select(F.col("url").alias("next_url")), "next_url")
            .select(
                "root_url",
                F.col("next_url").alias("url"),
                (F.col("page_number") + 1).alias("page_number"),
            )
        )
        out = out.unionByName(nxt)
        frontier = nxt
    # a page may be reachable from two roots; keep the lowest page_number
    return (
        out.groupBy("root_url", "url")
        .agg(F.min("page_number").alias("page_number"))
        .orderBy("root_url", "page_number")
    )


def _page_text_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    from readability_ex_spark.kernel import dom

    for pdf in batches:
        texts = []
        for html in pdf["content_html"]:
            if html is None or not isinstance(html, str):
                texts.append("")
            else:
                try:
                    # parse_fragment bumps the recursion limit (deep pages
                    # silently truncate otherwise — see CLAUDE.md)
                    texts.append(dom.text(dom.parse_fragment(html)))
                except Exception:  # noqa: BLE001
                    texts.append("")
        yield pd.DataFrame(
            {
                "url": pdf["url"],
                "content_html": pdf["content_html"],
                "page_text": texts,
            }
        )


def assemble_articles(chains: DataFrame, extracted: DataFrame) -> DataFrame:
    """Merge multi-page chains into single articles — the reference's
    wrap_page/update_result semantics (paging.ex:119-156): page N's
    extracted content is wrapped in
    ``<div id="readability-page-N" class="page">``, pages concatenate in
    chain order, and text/length are recomputed over the assembly
    (text = raw text-node concatenation, Floki.text; length = its
    character count). Pages whose extraction produced no content are
    skipped and later pages renumber to close the gap, matching the
    reference's "successful pages only" numbering.

    Distribution shape: per-page raw text comes from one mapInPandas
    over the extracted pages (page-parallel — the only Python step; the
    wrapper divs contribute no text, so the assembly's text equals the
    ordered concat of per-page texts). The merge itself is an
    ordered-array aggregation (collect_list of (page_number, ...)
    structs + array_sort + array_join) — one shuffle on root_url, no
    driver loop, no quadratic concat.

    chains: (root_url, url, page_number) from ``chain_pages``.
    extracted: rows with url + content_html (run_extraction output).
    Returns (root_url, n_pages, content, text, length).
    """
    from pyspark.sql import Window

    pagedata = (
        extracted.filter(F.col("content_html").isNotNull())
        .select("url", "content_html")
        .mapInPandas(
            _page_text_batches,
            "url string, content_html string, page_text string",
        )
    )
    seq = F.row_number().over(
        Window.partitionBy("root_url").orderBy("page_number")
    )
    per_page = (
        chains.join(pagedata, "url")
        .withColumn("seq", seq)
        .select(
            "root_url",
            "page_number",
            "seq",
            F.concat(
                F.lit('<div id="readability-page-'),
                F.col("seq").cast("string"),
                F.lit('" class="page">'),
                F.col("content_html"),
                F.lit("</div>"),
            ).alias("wrapped"),
            F.coalesce(F.col("page_text"), F.lit("")).alias("page_text"),
        )
    )
    merged = per_page.groupBy("root_url").agg(
        F.count("*").cast("int").alias("n_pages"),
        F.min("page_number").alias("_first"),
        F.array_sort(
            F.collect_list(F.struct("seq", "wrapped", "page_text"))
        ).alias("_parts"),
    )
    text_col = F.array_join(
        F.transform("_parts", lambda s: s["page_text"]), ""
    )
    return (
        # chains whose root page produced no content have no article
        # (the reference returns nothing when page 1 fails to parse)
        merged.filter(F.col("_first") == 1)
        .select(
            "root_url",
            "n_pages",
            F.array_join(F.transform("_parts", lambda s: s["wrapped"]), "")
            .alias("content"),
            text_col.alias("text"),
            F.length(text_col).cast("long").alias("length"),
        )
    )
