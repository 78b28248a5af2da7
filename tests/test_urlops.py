"""URL canonicalization: rule-by-rule edges + the dedup rollup + plan
shape (pure codegen, no exchange before the dedup agg)."""
from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from readability_ex_spark.operators.urlops import (
    canonical_dedup,
    canonicalize_url,
)

CASES = [
    # fragment stripped, scheme/host lowercased, path case kept
    ("HTTP://WWW.Example.COM/Path/Item#frag", "http://www.example.com/Path/Item"),
    # default ports dropped; explicit non-default ports kept
    ("http://example.com:80/a", "http://example.com/a"),
    ("https://Example.com:443/a", "https://example.com/a"),
    ("http://example.com:8080/a", "http://example.com:8080/a"),
    # https:80 is NOT http's default — kept
    ("https://example.com:80/a", "https://example.com:80/a"),
    # tracking params dropped, survivors sorted, '?' dropped when empty
    (
        "http://e.com/p?utm_source=x&b=2&A=1&fbclid=zz",
        "http://e.com/p?A=1&b=2",
    ),
    ("http://e.com/p?gclid=1&UTM_CAMPAIGN=x", "http://e.com/p"),
    # bare root path collapses; deeper trailing slashes kept
    ("http://e.com/", "http://e.com"),
    ("http://e.com/a/", "http://e.com/a/"),
    # query containing a second '?' stays inside the query
    ("http://e.com/p?b=1?c=2&a=3", "http://e.com/p?a=3&b=1?c=2"),
    # schemeless opaque id: only the fragment strip applies
    ("urn:doc:42#frag", "urn:doc:42"),
    ("no scheme at all", "no scheme at all"),
    # empty param segments vanish
    ("http://e.com/p?&&a=1&", "http://e.com/p?a=1"),
]


@pytest.fixture(scope="module")
def canon(spark):
    df = spark.createDataFrame(
        [(i, u) for i, (u, _) in enumerate(CASES)], "i long, url string"
    )
    out = df.select("i", canonicalize_url("url").alias("c")).collect()
    return {r.i: r.c for r in out}


@pytest.mark.parametrize("i", range(len(CASES)))
def test_canonical_cases(canon, i):
    assert canon[i] == CASES[i][1], CASES[i][0]


def test_canonicalization_is_idempotent(spark):
    """canonicalize(canonicalize(u)) == canonicalize(u) over a fuzzed
    url space — the property that makes re-running a crawl pipeline
    over already-canonical data a no-op.  Drives the whole batch
    through Spark once (hypothesis would pay a Spark job per example)."""
    import itertools
    import random

    rng = random.Random(7)
    schemes = ["http://", "HTTPS://", "HtTp://", ""]
    hosts = ["A.b.C", "x.io", "WWW.Example.COM", "host"]
    ports = ["", ":80", ":443", ":8080"]
    paths = ["", "/", "/A/b", "/x/", "/%20y"]
    queries = [
        "", "?a=1", "?b=2&a=1", "?utm_source=x", "?utm_a=1&z=", "?&",
        "?a=1?b=2", "?A=%3d&ref=r",
    ]
    frags = ["", "#f", "#A#B"]
    urls = [
        "".join(c)
        for c in itertools.product(
            schemes, hosts, ports, paths, queries, frags
        )
    ]
    urls += ["".join(rng.choice("aZ:/?#&=%.~ ") for _ in range(12)) for _ in range(200)]
    df = spark.createDataFrame(
        [(i, u) for i, u in enumerate(urls)], "i long, url string"
    )
    once = canonicalize_url("url").alias("c1")
    out = df.select(
        "url", once, canonicalize_url(canonicalize_url("url")).alias("c2")
    ).collect()
    bad = [(r.url, r.c1, r.c2) for r in out if r.c1 != r.c2]
    assert not bad, bad[:5]


def test_null_passthrough(spark):
    df = spark.createDataFrame([(1, None)], "i long, url string")
    assert df.select(canonicalize_url("url").alias("c")).first().c is None


def test_canonical_dedup_families(spark):
    pages = spark.createDataFrame(
        [
            (3, "HTTP://A.com:80/x?utm_source=1"),
            (1, "http://a.com/x"),
            (2, "http://a.com/x#frag"),
            (9, "http://b.com/y?q=1"),
        ],
        "doc_id long, url string",
    )
    rows = {r.canonical_url: r for r in canonical_dedup(pages).collect()}
    assert rows["http://a.com/x"].n_dupes == 3
    assert rows["http://a.com/x"].keeper == 1
    assert rows["http://b.com/y?q=1"].n_dupes == 1


def test_canonical_rewrite_collapses_fetches_before_kernel(spark):
    """Rewriting urls to canonical form upstream makes the existing
    latest-fetch dedup collapse url-SPELLING duplicates too — the
    kernel then runs once per page, not once per spelling."""
    import datetime

    from readability_ex_spark.pipeline import run_extraction

    def page(marker: bytes) -> bytes:
        return (
            b"<html><body><article><p>stale "
            + (marker + b" words here. ") * 30
            + b"</p></article></body></html>"
        )

    t0 = datetime.datetime(2024, 1, 1)
    t1 = datetime.datetime(2024, 6, 1)
    pages = spark.createDataFrame(
        [
            ("HTTP://E.com/p?utm_source=x", t0, page(b"january"), "", "en"),
            ("http://e.com/p", t1, page(b"june"), "", "en"),
            ("http://other.test/q", t0, page(b"other"), "", "en"),
        ],
        "url string, warc_ts timestamp, html binary, text string, lang string",
    )
    canon = pages.withColumn("url", canonicalize_url("url"))
    out = run_extraction(canon, n_partitions=2).collect()
    by_url = {}
    for r in out:
        by_url.setdefault(r.url, []).append(r)
    assert set(by_url) == {"http://e.com/p", "http://other.test/q"}
    assert len(by_url["http://e.com/p"]) == 1  # one kernel row, not two
    assert "june" in by_url["http://e.com/p"][0].text  # latest fetch won


def test_plan_is_pure_codegen(spark):
    """The canonicalizer itself must add no exchange and no Python —
    the only exchange in canonical_dedup is the final hash agg."""
    pages = spark.range(100).select(
        F.col("id").alias("doc_id"),
        F.concat(F.lit("http://h"), F.col("id") % 7, F.lit(".com/p")).alias(
            "url"
        ),
    )
    plan = canonical_dedup(pages)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" in plan  # the one dedup agg
    assert plan.count("Exchange") == 1
    for marker in ("BatchEvalPython", "ArrowEvalPython", "mapInPandas"):
        assert marker not in plan


def test_host_expr(spark):
    from readability_ex_spark.operators.urlops import host_expr

    cases = [
        ("http://WWW.Example.COM/p", "www.example.com"),
        ("https://Host.io:8443/a?b#c", "host.io"),
        ("ftp://user:pw@Files.Example.net:21/x", "files.example.net"),
        ("urn:doc:42", ""),
        ("", ""),
    ]
    df = spark.createDataFrame(
        [(i, u) for i, (u, _) in enumerate(cases)], "i long, url string"
    )
    got = {r.i: r.h for r in df.select("i", host_expr("url").alias("h")).collect()}
    for i, (_, want) in enumerate(cases):
        assert got[i] == want


def test_crawl_frontier(spark):
    """Discovered minus known, canonicalized, http(s)-only, capped and
    deterministically ranked per host."""
    from readability_ex_spark.operators.urlops import crawl_frontier

    discovered = spark.createDataFrame(
        [
            # spelling variant of a KNOWN url -> must not re-enter
            ("HTTP://Known.com:80/page?utm_source=x",),
            ("http://fresh.net/a",),
            ("http://fresh.net/b",),
            ("http://fresh.net/c",),  # capped out at k=2 (url asc)
            ("http://fresh.net/a#frag",),  # canonical dup of /a
            ("https://other.org/x",),
            ("mailto:a@b.c",),  # non-http dropped
            (None,),
        ],
        "url string",
    )
    known = spark.createDataFrame(
        [("http://known.com/page",)], "url string"
    )
    rows = {
        (r.url, r.host, r.rk)
        for r in crawl_frontier(discovered, known, max_per_host=2).collect()
    }
    assert rows == {
        ("http://fresh.net/a", "fresh.net", 1),
        ("http://fresh.net/b", "fresh.net", 2),
        ("https://other.org/x", "other.org", 1),
    }


def test_recrawl_schedule_latest_fetch_and_cap(spark):
    """Refetched urls age from their LATEST fetch; per-host cap keeps
    the stalest pages; priority favors larger hosts at equal age."""
    import datetime as dt

    from pyspark.sql import functions as F

    from readability_ex_spark.operators.urlops import recrawl_schedule

    d = dt.date
    rows = [
        # big.com: 3 pages, one refetched recently
        ("http://big.com/a", d(2024, 1, 1)),
        ("http://big.com/a", d(2024, 3, 1)),  # latest fetch wins
        ("http://big.com/b", d(2024, 1, 10)),
        ("http://big.com/c", d(2024, 2, 1)),
        # small.org: 1 page, same age as big.com/b
        ("http://small.org/x", d(2024, 1, 10)),
    ]
    df = spark.createDataFrame(rows, "url string, fetch_date date")
    out = {r.url: r for r in recrawl_schedule(df, per_host=2).collect()}
    # big.com/a aged from 2024-03-01 (the max date == as_of -> age 0),
    # so the cap keeps b and c
    assert "http://big.com/a" not in out
    assert out["http://big.com/b"].rk == 1 and out["http://big.com/c"].rk == 2
    # same age, but big.com has 3 pages vs small.org's 1 -> higher priority
    assert (
        out["http://big.com/b"].priority > out["http://small.org/x"].priority
    )
    assert out["http://small.org/x"].age_days == 51


def test_recrawl_schedule_explicit_as_of(spark):
    import datetime as dt

    from readability_ex_spark.operators.urlops import recrawl_schedule

    df = spark.createDataFrame(
        [("http://h.com/p", dt.date(2024, 1, 1))], "url string, fetch_date date"
    )
    r = recrawl_schedule(df, as_of="2024-01-31").head()
    assert r.age_days == 30


def test_recrawl_schedule_matches_naive_window(spark):
    """The two-stage cap returns exactly the naive single-window top-k
    on skewed synthetic data (one dominant host)."""
    import datetime as dt

    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from readability_ex_spark.operators.urlops import recrawl_schedule

    base = dt.date(2024, 1, 1)
    rows = [
        (f"http://dom.com/{i:03d}", base + dt.timedelta(days=i % 50))
        for i in range(200)
    ] + [(f"http://h{i}.net/x", base + dt.timedelta(days=i)) for i in range(10)]
    df = spark.createDataFrame(rows, "url string, fetch_date date")
    got = {
        (r.host, r.rk): r.url
        for r in recrawl_schedule(df, per_host=3).collect()
    }
    # naive re-derivation for comparison
    from readability_ex_spark.operators.urlops import host_expr

    latest = df.groupBy("url").agg(F.max("fetch_date").alias("fd"))
    latest = latest.withColumn("host", host_expr(F.col("url")))
    asof = latest.agg(F.max("fd")).head()[0]
    sizes = latest.groupBy("host").count()
    scored = (
        latest.join(sizes, "host")
        .withColumn("age", F.datediff(F.lit(asof), F.col("fd")))
        .withColumn(
            "pri", F.round(F.col("age") * F.log(F.lit(1.0) + F.col("count")), 6)
        )
    )
    w = Window.partitionBy("host").orderBy(F.col("pri").desc(), F.col("url"))
    naive = {
        (r.host, r.rk): r.url
        for r in scored.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= 3)
        .collect()
    }
    assert got == naive


def test_frontier_pre_cap_filter_sees_canonical_urls(spark):
    """crawl_frontier applies pre_cap_filter AFTER canonicalization and
    the anti-join, so a robots rule is evaluated against the CANONICAL
    url the crawler will fetch (a tracking-param spelling must not
    dodge a Disallow), and before the cap."""
    from readability_ex_spark.operators.robotstxt import (
        parse_robots,
        robots_filter,
    )
    from readability_ex_spark.operators.urlops import crawl_frontier

    discovered = spark.createDataFrame(
        [
            # canonicalizes to http://h.test/page?id=1 -> disallowed
            ("http://h.test/page?utm_source=x&id=1",),
            ("http://h.test/ok",),
        ],
        "url string",
    )
    known = spark.createDataFrame([("http://h.test/other",)], "url string")
    rules = parse_robots(
        spark.createDataFrame(
            [("h.test", "User-agent: *\nDisallow: /page?id=\n")],
            "host string, robots_txt string",
        )
    )
    out = crawl_frontier(
        discovered,
        known,
        max_per_host=5,
        pre_cap_filter=lambda df: robots_filter(df, rules),
    ).collect()
    assert [(r.url, r.rk) for r in out] == [("http://h.test/ok", 1)]
