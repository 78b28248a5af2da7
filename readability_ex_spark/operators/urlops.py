"""URL canonicalization + canonical-url dedup — the crawl-side twin of
content dedup.

Common-Crawl-style corpora carry the same page under many url spellings
(case-varied host, default ports, tracking parameters, fragments,
shuffled query order).  Canonicalizing BEFORE url-keyed dedup collapses
those families without touching page bytes, which at 100 TB removes
whole fetches from the pipeline before any content work runs.  The
rules here are the widely used safe subset (RFC 3986 §6 syntax-based
normalization plus the tracking-param strip every crawl pipeline
applies); anything lossy (path case, % -decoding) is deliberately NOT
done.

Everything is pure codegen column expressions — no UDF, no shuffle; the
operator is free at scan time.  The expressions stay inside the
Java-regex ∩ RE2 ∩ DuckDB dialect (same discipline as
``operators/pii.py``) and avoid capture-group REPLACEMENTS entirely
(Spark spells them ``$1``, DuckDB ``\\1`` — a silent portability trap),
decomposing with ``regexp_extract`` + ``concat`` instead, so the DuckDB
oracle runs the byte-identical algorithm.

No reference counterpart (training-data layer; the reference's URL code
is the per-document absolutizer, ported in ``kernel/cleaner.py``).
"""
from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, functions as F

# Query parameters that never change page identity: analytics /
# click-tracking ids. Matched against the lowercased param NAME.
TRACKING_PARAM_RE = (
    r"^(utm_[a-z0-9_]*|fbclid|gclid|dclid|msclkid|mc_eid|igshid|"
    r"yclid|_hsenc|_hsmi|ref_src)$"
)

_SCHEME_AUTH_RE = r"^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*"


def canonicalize_url(url: Column | str) -> Column:
    """Canonical form of ``url`` as one codegen expression.

    Rules, in order:

    1. strip the fragment (``#...``);
    2. lowercase ``scheme://authority`` (path/query case is meaningful
       and kept);
    3. drop the scheme's default port (``:80`` for http, ``:443`` for
       https);
    4. drop tracking query params (:data:`TRACKING_PARAM_RE`), sort the
       survivors bytewise, rejoin with ``&``; a query left empty loses
       its ``?``;
    5. collapse a bare root path: ``scheme://host/`` -> ``scheme://host``
       (only when the path is exactly ``/``).

    A value with no ``scheme://authority`` prefix only gets the
    fragment strip (rule 1) — opaque ids are passed through, not
    mangled.  NULL stays NULL.
    """
    u = F.col(url) if isinstance(url, str) else url
    nofrag = F.regexp_extract(u, r"^[^#]*", 0)
    auth = F.regexp_extract(nofrag, _SCHEME_AUTH_RE, 0)
    rest = F.substring(nofrag, F.length(auth) + 1, F.lit(2_000_000_000))
    path = F.regexp_extract(rest, r"^[^?]*", 0)
    query = F.when(
        F.length(rest) > F.length(path),
        F.substring(rest, F.length(path) + 2, F.lit(2_000_000_000)),
    ).otherwise(F.lit(""))

    lauth = F.lower(auth)
    lauth = (
        F.when(
            lauth.startswith("http://") & lauth.endswith(":80"),
            F.substring(lauth, 1, F.length(lauth) - 3),
        )
        .when(
            lauth.startswith("https://") & lauth.endswith(":443"),
            F.substring(lauth, 1, F.length(lauth) - 4),
        )
        .otherwise(lauth)
    )

    params = F.filter(
        F.split(query, "&"),
        lambda p: (p != "")
        & ~F.lower(F.regexp_extract(p, r"^[^=]*", 0)).rlike(
            TRACKING_PARAM_RE
        ),
    )
    qjoin = F.array_join(F.array_sort(params), "&")

    canon_path = F.when(path == "/", F.lit("")).otherwise(path)
    canonical = F.concat(
        lauth,
        canon_path,
        F.when(qjoin != "", F.concat(F.lit("?"), qjoin)).otherwise(
            F.lit("")
        ),
    )
    return F.when(auth == "", nofrag).otherwise(canonical)


def canonical_dedup(
    pages: DataFrame, url_col: str = "url", id_col: str = "doc_id"
) -> DataFrame:
    """Collapse rows sharing a canonical url: one row per canonical
    form with the family size and the deterministic keeper (minimum
    ``id_col`` — engine-portable, unlike "first seen").

    Plan: the canonicalizer is a free map fused into the scan, then ONE
    hash aggregation keyed on the canonical url — identical shuffle
    shape (and cost) to exact content dedup, run before any content is
    read.  Skewed canonical keys (a crawl hammering one url) are
    ordinary agg skew: AQE splits them, and the partial agg has already
    collapsed per-partition duplicates before the exchange.
    """
    return (
        pages.select(
            F.col(id_col),
            canonicalize_url(url_col).alias("canonical_url"),
        )
        .groupBy("canonical_url")
        .agg(
            F.count("*").alias("n_dupes"),
            F.min(id_col).alias("keeper"),
        )
    )


def crawl_frontier(
    discovered: DataFrame,
    known: DataFrame,
    url_col: str = "url",
    max_per_host: int | None = None,
    canonicalize: bool = True,
    n_salts: int = 16,
    pre_cap_filter=None,
) -> DataFrame:
    """The next crawl batch from link discovery: http(s) candidates
    minus everything already crawled, politeness-capped per host.

    1. optional canonicalization (``canonicalize_url`` — url-spelling
       variants of an already-crawled page must not re-enter the
       frontier), http(s) only, then DISTINCT: the same target
       discovered from 10^6 pages collapses map-side before the one
       candidate exchange;
    2. LEFT ANTI against the known-url set — a key-only scan of the
       crawled table, the same resume shape as ``anti_join_resume``;
    3. optional ``pre_cap_filter`` (a ``DataFrame -> DataFrame``
       callable, e.g. a ``robots_filter`` closure): policy filters
       belong HERE — after the distinct/anti-join (so they run over
       bounded distinct NEW urls, never raw edges) and on the
       CANONICAL url (the form the crawler will actually fetch), but
       before the cap (a disallowed url must not consume the host's
       quota);
    4. optional ``max_per_host`` politeness budget via the skew-safe
       two-stage top-k (``relational.top_k_per_key``; url-ascending =
       deterministic pick), so a newly-discovered 10^7-page host cannot
       put its whole frontier in one window task.

    Output: (url, host[, rk]).  At 100 TB this is the frontier job a
    crawler runs per cycle: both inputs scan url columns only, and
    every stage is exchange-bounded by distinct urls, never raw edges.
    """
    u = F.col(url_col)
    cand_url = canonicalize_url(u) if canonicalize else u
    cand = (
        discovered.select(cand_url.alias("url"))
        .filter(F.lower("url").rlike(r"^https?://"))
        .distinct()
    )
    known_url = (
        canonicalize_url(F.col(url_col)) if canonicalize else F.col(url_col)
    )
    frontier = cand.join(
        known.select(known_url.alias("url")), "url", "left_anti"
    ).withColumn("host", host_expr(F.col("url")))
    if pre_cap_filter is not None:
        frontier = pre_cap_filter(frontier)
    if max_per_host is not None:
        from readability_ex_spark.operators.relational import top_k_per_key

        frontier = top_k_per_key(
            frontier,
            ["host"],
            [F.col("url").asc()],
            k=max_per_host,
            salt_expr=F.pmod(F.xxhash64("url"), F.lit(n_salts)),
            n_salts=n_salts,
        )
    return frontier


RECRAWL_PER_HOST = 2


def recrawl_schedule(
    pages: DataFrame,
    per_host: int = RECRAWL_PER_HOST,
    url_col: str = "url",
    date_col: str = "fetch_date",
    as_of=None,
    n_salts: int = 16,
) -> DataFrame:
    """The refetch half of the crawl cycle: rank KNOWN pages by
    staleness and pick a politeness-capped batch per host (the
    ``crawl_frontier`` twin — frontier schedules urls never fetched,
    this schedules the ones due for a refresh).

    1. collapse the fetch history to the latest fetch per url (hash
       agg — map-side combined, never a window);
    2. ``age_days`` = days between that fetch and ``as_of`` (a date
       column/literal; default = the corpus's max fetch date, computed
       as a 1-row agg broadcast into the plan — deterministic, no
       wall-clock);
    3. ``priority`` = round(age_days * ln(1 + host_pages), 6) — stale
       pages on large hosts first, a pluggable stand-in for the
       change-rate models production schedulers fit (host size is the
       classic crawl-ordering prior: big hosts churn more); rounded
       BEFORE ranking so every engine ranks identically;
    4. top ``per_host`` per host through the skew-safe two-stage
       ``top_k_per_key`` (priority desc, url asc).

    Output: (url, host, age_days, priority, rk). Scale shape: one
    url-keyed exchange (latest-fetch agg), two host-keyed exchanges
    (host sizes + the bounded cap) — all partial-agg'd; no url-side
    window ever sees a whole host.
    """
    from readability_ex_spark.operators.relational import top_k_per_key

    latest = (
        pages.select(F.col(url_col).alias("url"), F.col(date_col).alias("_d"))
        .groupBy("url")
        .agg(F.max("_d").alias("fetch_date"))
        .withColumn("host", host_expr(F.col("url")))
        # referenced up to 3x below (as-of bounds, host sizes, the
        # scored join) — checkpoint so the full-history scan + url
        # exchange run once, not per reference (plans are trees)
        .localCheckpoint(eager=False)
    )
    if as_of is None:
        bounds = latest.agg(F.max("fetch_date").alias("_as_of"))
        latest = latest.crossJoin(F.broadcast(bounds))
    else:
        latest = latest.withColumn("_as_of", F.lit(as_of).cast("date"))
    sizes = latest.groupBy("host").agg(F.count("*").alias("_n"))
    scored = (
        latest.join(sizes, "host")
        .withColumn("age_days", F.datediff(F.col("_as_of"), F.col("fetch_date")))
        .withColumn(
            "priority",
            F.round(F.col("age_days") * F.log(F.lit(1.0) + F.col("_n")), 6),
        )
        .select("url", "host", "age_days", "priority")
    )
    return top_k_per_key(
        scored,
        ["host"],
        [F.col("priority").desc(), F.col("url").asc()],
        k=per_host,
        salt_expr=F.pmod(F.xxhash64("url"), F.lit(n_salts)),
        n_salts=n_salts,
    )


def host_expr(url: Column | str) -> Column:
    """Lowercased hostname of ``url`` (no scheme, port, or path); empty
    string for values without a ``scheme://authority`` prefix.  The
    domain key for per-host caps and stats."""
    u = F.col(url) if isinstance(url, str) else url
    return F.lower(
        F.regexp_extract(u, r"^[A-Za-z][A-Za-z0-9+.-]*://([^/?#@]*@)?([^/?#:]*)", 2)
    )


# -- checked queries --------------------------------------------------------
# The testdata tables carry no url column, so the checked queries derive
# a deterministic url per doc_id — same arithmetic in both engines —
# covering every rule: cased scheme/host, default + explicit ports,
# fragments, tracking params mixed into unsorted queries, root paths,
# and schemeless opaque ids. doc_id % 40 collides families onto shared
# canonical urls so canonical_dedup has real work.


def synth_url_expr(id_col: str = "doc_id") -> Column:
    d = F.col(id_col).cast("long")
    host = F.concat(
        F.lit("WWW.Site"), (d % 40).cast("string"), F.lit(".Example.COM")
    )
    port = (
        F.when(d % 4 == 0, F.lit(":80"))
        .when(d % 4 == 1, F.lit(":8080"))
        .otherwise(F.lit(""))
    )
    path = F.when(d % 5 == 0, F.lit("/")).otherwise(
        F.concat(F.lit("/Articles/item-"), (d % 40).cast("string"))
    )
    query = (
        F.when(
            d % 3 == 0,
            F.concat(
                F.lit("?utm_source=feed&b="),
                (d % 2).cast("string"),
                F.lit("&A=1&fbclid=XYZ"),
            ),
        )
        .when(d % 3 == 1, F.lit("?UTM_CAMPAIGN=x&gclid=abc"))
        .otherwise(F.lit(""))
    )
    frag = F.when(d % 2 == 0, F.lit("#Section-2")).otherwise(F.lit(""))
    with_scheme = F.concat(
        F.lit("HTTP://"), host, port, path, query, frag
    )
    return F.when(
        d % 20 == 19, F.concat(F.lit("urn:doc:"), d.cast("string"), frag)
    ).otherwise(with_scheme)


def q_url_canonicalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-doc canonical url over the synthetic url derivation."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return (
        docs.select(
            "doc_id",
            synth_url_expr().alias("url"),
        )
        .withColumn("canonical_url", canonicalize_url("url"))
        .orderBy("doc_id")
    )


def q_canonical_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Canonical-url families (size + keeper) over the synthetic urls."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    pages = docs.select("doc_id", synth_url_expr().alias("url"))
    return canonical_dedup(pages).orderBy("canonical_url")


def q_recrawl_schedule(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recrawl batch over the synthetic urls with a deterministic fetch
    date per doc (day = doc_id * 7 mod 365 past 2024-01-01; as_of =
    the max of those, derived in-plan)."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    pages = docs.select(
        synth_url_expr().alias("url"),
        F.date_add(
            F.lit("2024-01-01").cast("date"),
            (F.col("doc_id") * 7 % 365).cast("int"),
        ).alias("fetch_date"),
    )
    return recrawl_schedule(pages).orderBy("host", "rk")


def q_crawl_frontier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frontier over the synthetic link pages: resolved outlinks minus
    a known set (the synth urls plus a deterministic md5 subset of the
    candidates, so the anti-join has real work), politeness-capped at
    2 per host.  canonicalize=False — the canonicalizer has its own
    checked query; this one verifies the distinct/anti-join/cap
    composition."""
    from readability_ex_spark.operators.linkgraph import (
        outlink_edges,
        synth_link_html_expr,
    )

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    pages = docs.select(
        "doc_id",
        synth_url_expr().alias("url"),
        synth_link_html_expr().alias("html"),
    )
    discovered = (
        outlink_edges(pages)
        .select(F.col("dst").alias("url"))
        # referenced twice (frontier candidates AND the cand_sub slice of
        # the known set): uncheckpointed, the synth-html build + regexp
        # harvest + resolve + explode ran once per reference (the r8
        # before-plan carried two full Generate subtrees)
        .localCheckpoint(eager=False)
    )
    cand_sub = (
        discovered.filter(F.lower("url").rlike(r"^https?://"))
        .filter(F.substring(F.md5("url"), 1, 1).isin("0", "1", "2", "3", "4"))
        .distinct()
    )
    known = pages.select("url").unionByName(cand_sub)
    return crawl_frontier(
        discovered, known, max_per_host=2, canonicalize=False
    ).orderBy("host", "rk")
