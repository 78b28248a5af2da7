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


def chain_pages(pages: DataFrame, max_pages: int = 3) -> DataFrame:
    """Assemble multi-page chains: returns (root_url, url, page_number)
    rows for every page reachable from a chain root within max_pages.

    A root is a page that no other page points to. Each iteration is one
    url-keyed join — max_pages is small and fixed, so the plan stays a
    bounded chain of hash joins rather than a graph iteration."""
    edges = next_page_edges(pages).filter(
        F.col("next_url").isNotNull() & (F.col("next_url") != F.col("url"))
    ).cache()

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
