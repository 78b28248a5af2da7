"""robots.txt parse + RFC 9309 matching (operators/robotstxt.py)."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from readability_ex_spark.operators.robotstxt import (
    ROBOTS_CHECK_AGENT,
    parse_robots,
    pattern_regex_expr,
    q_robots_verdict,
    robots_filter,
    robots_verdict,
    rules_for_agent,
    synth_robots_bodies,
)

BODY_A = """# comment
User-agent: GoodBot
User-Agent: OtherBot
Disallow: /private/
Allow: /private/pub*
Disallow: /tmp/*.pdf$

User-agent: *
Disallow: /all/
Disallow:
Crawl-delay: 10
"""

BODY_B = """Disallow: /orphan/
User-agent: *
Allow: /a$
Disallow: /a
"""


@pytest.fixture()
def rules(spark):
    robots = spark.createDataFrame(
        [("a.com", BODY_A), ("b.com", BODY_B), ("c.com", None)],
        "host string, robots_txt string",
    )
    return parse_robots(robots)


def test_parse_groups_comments_case_and_orphans(rules):
    rows = {
        (r.host, r.group_id, r.agent, r.rule, r.path)
        for r in rules.collect()
    }
    # group 1 of a.com: two UA lines x three rules (cross product)
    assert ("a.com", 1, "goodbot", "disallow", "/private/") in rows
    assert ("a.com", 1, "otherbot", "allow", "/private/pub*") in rows
    assert ("a.com", 1, "goodbot", "disallow", "/tmp/*.pdf$") in rows
    # blank line did NOT close group 1; group 2 is the * group
    assert ("a.com", 2, "*", "disallow", "/all/") in rows
    # empty Disallow (allow-everything idiom) and Crawl-delay dropped
    assert not any(p == "" for (_, _, _, _, p) in rows)
    assert not any(r not in ("allow", "disallow") for (_, _, _, r, _) in rows)
    # the orphan rule before b.com's first UA line is outside all groups
    assert not any(h == "b.com" and p == "/orphan/" for (h, _, _, _, p) in rows)
    # a None body parses to no rules
    assert not any(h == "c.com" for (h, _, _, _, _) in rows)


def test_rules_for_agent_exact_beats_star(rules):
    good = {
        (r.host, r.agent) for r in rules_for_agent(rules, "GoodBot").collect()
    }
    # a.com has an exact group -> only it; b.com falls back to *
    assert ("a.com", "goodbot") in good
    assert ("a.com", "*") not in good
    assert ("b.com", "*") in good


def test_pattern_escaping_and_wildcards(spark):
    pats = [
        ("/a.b", "/a.b", True),
        ("/a.b", "/aXb", False),  # '.' is literal, not regex-any
        ("/p(1)+q?[x]", "/p(1)+q?[x]suffix", True),
        ("/w*z", "/w/mid/z-tail", True),
        ("/w*z$", "/w/mid/z", True),
        ("/w*z$", "/w/mid/z-tail", False),
        ("/back\\slash", "/back\\slash/x", True),
    ]
    df = spark.createDataFrame(pats, "pat string, path string, expect boolean")
    got = df.select(
        "expect",
        F.rlike(
            F.col("path"), F.concat(F.lit("^"), pattern_regex_expr("pat"))
        ).alias("got"),
    ).collect()
    for r in got:
        assert r.got is r.expect


def _ref_parse(body: str) -> set[tuple]:
    """Driver-side reference parser implementing the module's rules:
    comment strip, trim, case-insensitive keys, UA-run group
    formation, rules-before-any-group dropped, empty values dropped."""
    import re as _re

    rows, group, prev_ua = [], 0, False
    agents: dict[int, list] = {}
    for line in (body or "").split("\n"):
        s = line.split("#", 1)[0].strip(" ")
        m = _re.match(r"^([A-Za-z][A-Za-z-]*)\s*:(.*)$", s)
        if not m:
            continue
        key, value = m.group(1).lower(), m.group(2).strip(" ")
        if key == "user-agent":
            if not prev_ua:
                group += 1
            agents.setdefault(group, []).append(value.lower())
            prev_ua = True
        else:
            if key in ("allow", "disallow") and group > 0 and value:
                rows.append((group, key, value))
            if key in ("allow", "disallow", "user-agent"):
                prev_ua = False
    return {
        (g, a, rule, path)
        for g, rule, path in rows
        for a in agents.get(g, [])
    }


def test_parse_fuzz_vs_reference(spark):
    """200 random robots bodies: the Spark window-function parser and
    the Python reference produce identical rule sets."""
    import random

    rng = random.Random(607)
    agents = ["*", "GoodBot", "other-bot", "A"]
    paths = ["/a", "/a/*", "/b$", "", "/c?x=1", "/ d "]

    def line():
        k = rng.randrange(8)
        if k <= 1:
            return f"User-Agent: {rng.choice(agents)}"
        if k == 2:
            return f"user-agent:{rng.choice(agents)}"
        if k == 3:
            return f"Allow: {rng.choice(paths)}"
        if k == 4:
            return f"disallow: {rng.choice(paths)}"
        if k == 5:
            return rng.choice(
                ["", "# comment", "Crawl-delay: 10", "junk line", ":",
                 "Sitemap: https://x/s.xml"]
            )
        if k == 6:
            return f"Disallow: {rng.choice(paths)} # trailing"
        return f"Allow: {rng.choice(paths)}"

    bodies = [
        "\n".join(line() for _ in range(rng.randint(0, 14)))
        for _ in range(200)
    ]
    df = spark.createDataFrame(
        [(f"h{i}.test", b) for i, b in enumerate(bodies)],
        "host string, robots_txt string",
    )
    got: dict[str, set] = {}
    for r in parse_robots(df).collect():
        got.setdefault(r.host, set()).add(
            (r.group_id, r.agent, r.rule, r.path)
        )
    for i, b in enumerate(bodies):
        expect = _ref_parse(b)
        assert got.get(f"h{i}.test", set()) == expect, (i, b)


def _ref_match(pattern: str, path: str) -> bool:
    """Driver-side reference REP matcher: '*' = any run, trailing '$'
    anchors, everything else literal, prefix semantics."""
    import re as _re

    anchored = pattern.endswith("$")
    body = pattern[:-1] if anchored else pattern
    rx = "".join(".*" if ch == "*" else _re.escape(ch) for ch in body)
    rx = "^" + rx + ("$" if anchored else "")
    return _re.search(rx, path) is not None


def test_pattern_matching_fuzz_three_engines(spark):
    """Random REP patterns/paths: the Spark escape chain, the DuckDB
    escape chain (the oracle's), and a Python reference matcher agree
    on every pair."""
    import random

    import duckdb

    from __spark_entry__ import _robots_rx_sql

    rng = random.Random(406)
    alphabet = list("ab/.?$*+()[]{}|^\\x-_%7~")
    pairs = []
    for _ in range(400):
        pat = "/" + "".join(rng.choice(alphabet) for _ in range(rng.randint(0, 8)))
        path = "/" + "".join(rng.choice(alphabet) for _ in range(rng.randint(0, 12)))
        pairs.append((pat, path))
    expect = [_ref_match(p, s) for p, s in pairs]

    df = spark.createDataFrame(pairs, "pat string, path string")
    got_spark = [
        r.m
        for r in df.select(
            F.rlike(
                F.col("path"),
                F.concat(F.lit("^"), pattern_regex_expr("pat")),
            ).alias("m")
        ).collect()
    ]
    assert got_spark == expect

    con = duckdb.connect()
    con.execute("CREATE TABLE t (i INT, pat VARCHAR, path VARCHAR)")
    con.executemany(
        "INSERT INTO t VALUES (?, ?, ?)",
        [(i, p, s) for i, (p, s) in enumerate(pairs)],
    )
    rx = _robots_rx_sql(
        "CASE WHEN ends_with(pat, '$') "
        "THEN substring(pat, 1, length(pat) - 1) ELSE pat END"
    )
    got_duck = [
        r[0]
        for r in con.execute(
            f"""SELECT regexp_matches(path, '^' || {rx} ||
                       CASE WHEN ends_with(pat, '$') THEN '$' ELSE '' END)
                FROM t ORDER BY i"""
        ).fetchall()
    ]
    assert got_duck == expect


def test_verdict_precedence_and_defaults(spark, rules):
    pages = spark.createDataFrame(
        [
            ("http://a.com/private/x", False),  # disallow /private/
            ("http://a.com/private/pub/ok", True),  # longer allow wins
            ("http://a.com/tmp/x.pdf", False),  # $-anchored wildcard
            ("http://a.com/tmp/x.pdfz", True),  # anchor rejects suffix
            ("http://a.com/all/x", True),  # exact group has no /all/ rule
            ("http://b.com/a", True),  # /a$ (3) beats /a (2)
            ("http://b.com/ab", False),  # only /a matches
            ("http://b.com/orphan/x", True),  # orphan rule was dropped
            ("http://c.com/x", True),  # empty robots
            ("http://d.com/x", True),  # no robots row at all
        ],
        "url string, expect boolean",
    )
    v = robots_verdict(pages, rules, agent="GoodBot")
    for r in v.collect():
        assert r.robots_allowed is r.expect, r.url
        # surfaced rule columns are NULL exactly when nothing matched
        assert (r.robots_rule is None) == (
            r.url.startswith(("http://c", "http://d"))
            or r.url.endswith(("/all/x", "x.pdfz", "orphan/x"))
        ), r.url
    # allow wins a same-length tie: b.com '/a' vs hypothetical — covered
    # by /a$ length; the synthetic-corpus tie case is in q_robots_verdict


def test_star_agent_sees_other_group(spark, rules):
    pages = spark.createDataFrame(
        [("http://a.com/all/x",), ("http://a.com/private/x",)],
        "url string",
    )
    v = {r.url: r.robots_allowed for r in robots_verdict(pages, rules).collect()}
    # the * group disallows /all/ but knows nothing of /private/
    assert v["http://a.com/all/x"] is False
    assert v["http://a.com/private/x"] is True


def test_robots_filter_matches_verdict_filter(spark):
    pages = spark.read.parquet(
        "/root/testdata/sf0.001/documents.parquet"
    ).select(
        "doc_id",
        F.concat(
            F.lit("http://www.site"),
            (F.col("doc_id") % 40).cast("string"),
            F.lit(".example.com/Articles/item-"),
            (F.col("doc_id") % 40).cast("string"),
        ).alias("url"),
    )
    rules = parse_robots(synth_robots_bodies(spark, "/root/testdata/sf0.001"))
    via_verdict = {
        r.doc_id
        for r in robots_verdict(pages, rules, agent=ROBOTS_CHECK_AGENT)
        .filter("robots_allowed")
        .select("doc_id")
        .collect()
    }
    via_filter = {
        r.doc_id
        for r in robots_filter(pages, rules, agent=ROBOTS_CHECK_AGENT)
        .select("doc_id")
        .collect()
    }
    assert via_filter == via_verdict
    assert 0 < len(via_filter) < pages.count()


def test_verdict_plan_broadcasts_rules(spark, rules):
    pages = spark.createDataFrame(
        [("http://a.com/private/x",)], "url string"
    )
    plan = (
        robots_verdict(pages, rules, agent="GoodBot")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BroadcastHashJoin" in plan or "BroadcastNestedLoopJoin" in plan


def test_robots_from_pages_latest_fetch_wins(spark):
    import datetime

    from readability_ex_spark.operators.robotstxt import robots_from_pages

    t1 = datetime.datetime(2024, 1, 1)
    t2 = datetime.datetime(2024, 6, 1)
    pages = spark.createDataFrame(
        [
            ("http://a.com/robots.txt", t1, b"User-agent: *\nDisallow: /old/\n"),
            ("http://a.com/robots.txt", t2, b"User-agent: *\nDisallow: /new/\n"),
            ("http://b.com/robots.txt?x=1", t1, b"nope"),  # query != exact path
            ("http://a.com/page", t2, b"<html>content</html>"),
            ("urn:doc:9", t2, b"opaque"),  # no host -> skipped
        ],
        "url string, warc_ts timestamp, html binary",
    )
    rows = {
        r.host: r.robots_txt
        for r in robots_from_pages(pages, ts_col="warc_ts").collect()
    }
    assert set(rows) == {"a.com"}
    assert "/new/" in rows["a.com"]


def test_robots_rules_in_composition(spark):
    """prepare_training_corpus(robots_rules=...) ships no disallowed
    page and keeps unmatched ones."""
    from readability_ex_spark.operators.corpus import prepare_training_corpus
    from readability_ex_spark.sources.pages import synthesize_pages

    pages = synthesize_pages(spark, "/root/testdata/sf0.001").limit(80)
    rules = parse_robots(
        spark.createDataFrame(
            [("synth.test", "User-agent: *\nDisallow: /doc/1*\n")],
            "host string, robots_txt string",
        )
    )
    corpus = prepare_training_corpus(
        pages,
        robots_rules=rules,
        near_dup_threshold=None,
        n_partitions=4,
    )
    ids = [
        int(r.url.rsplit("/", 1)[1]) for r in corpus.select("url").collect()
    ]
    assert ids
    assert not any(str(i).startswith("1") for i in ids)


def test_checked_query_tie_break(spark):
    """On h%4==3 hosts the synthetic body carries an identical-length
    allow/disallow pair — allow must win the tie for every item page."""
    v = q_robots_verdict(spark, "/root/testdata/sf0.001")
    ties = v.filter(F.col("robots_path") == "/Articles/item").collect()
    assert ties
    assert all(r.robots_allowed and r.robots_rule == "allow" for r in ties)


def test_parse_crawl_delay(spark):
    """Numeric-only values, MIN per (host, agent), group scoping; a
    Crawl-delay BETWEEN two User-agent lines splits their run for this
    parser (it is a recognized directive here)."""
    from readability_ex_spark.operators.robotstxt import parse_crawl_delay

    body_a = (
        "User-agent: BotA\n"
        "User-agent: BotB\n"
        "Crawl-delay: 10\n"
        "Crawl-delay: 2.5\n"   # MIN wins
        "Crawl-delay: soon\n"  # non-numeric dropped
        "\n"
        "User-agent: *\n"
        "Disallow: /\n"        # no delay in this group
    )
    body_b = (
        "User-agent: BotC\n"
        "Crawl-delay: 7\n"     # splits the run: BotD starts a new group
        "User-agent: BotD\n"
        "Crawl-delay: 3\n"
    )
    robots = spark.createDataFrame(
        [("a.com", body_a), ("b.com", body_b)],
        "host string, robots_txt string",
    )
    rows = {
        (r.host, r.agent): r.crawl_delay
        for r in parse_crawl_delay(robots).collect()
    }
    assert rows == {
        ("a.com", "bota"): 2.5,
        ("a.com", "botb"): 2.5,
        ("b.com", "botc"): 7.0,
        ("b.com", "botd"): 3.0,
    }


def test_sitemaps_from_pages_and_parse(spark):
    """Lift archived sitemap fetches off crawl rows (latest per url)
    and extract locs: entity decode, trim, index flag, dup collapse."""
    import datetime

    from readability_ex_spark.operators.robotstxt import (
        parse_sitemap_urls,
        sitemaps_from_pages,
    )

    t1 = datetime.datetime(2024, 1, 1)
    t2 = datetime.datetime(2024, 6, 1)
    old = b"<urlset><url><loc>https://h.test/old</loc></url></urlset>"
    new = (
        b"<urlset><url><loc> https://h.test/new?a=1&amp;b=2 </loc></url>"
        b"<url><loc>https://h.test/new?a=1&amp;b=2</loc></url>"
        # pretty-printed (newline/tab-padded) loc: the regexp trim must
        # strip it — SQL trim only handles 0x20 and would leave a loc
        # the frontier's ^https?:// check then drops
        b"<url><loc>\n\t https://h.test/padded \n</loc></url></urlset>"
    )
    idx = (
        b"<sitemapindex><sitemap><loc>https://h.test/sitemap-sub.xml"
        b"</loc></sitemap></sitemapindex>"
    )
    pages = spark.createDataFrame(
        [
            ("https://h.test/sitemap.xml", t1, old, "", "en"),
            ("https://h.test/sitemap.xml", t2, new, "", "en"),  # wins
            ("https://h.test/sitemap_index.xml", t2, idx, "", "en"),
            ("https://h.test/article", t2, b"<html>x</html>", "", "en"),
        ],
        "url string, warc_ts timestamp, html binary, "
        "text string, lang string",
    )
    maps = sitemaps_from_pages(pages, ts_col="warc_ts")
    assert maps.count() == 2  # the article row is not a sitemap
    rows = {
        (r.loc, r.from_index) for r in parse_sitemap_urls(maps).collect()
    }
    assert rows == {
        ("https://h.test/new?a=1&b=2", False),  # decoded, trimmed, deduped
        ("https://h.test/padded", False),  # newline-padded -> regexp trim
        ("https://h.test/sitemap-sub.xml", True),
    }


def test_verdict_keeps_null_url_rows(spark, rules):
    """A NULL-url row survives robots_verdict (left join + permissive
    default — an inner equi-join would silently drop it) and gets the
    same existence verdict as robots_filter's left_anti."""
    from readability_ex_spark.operators.robotstxt import robots_filter

    pages = spark.createDataFrame(
        [("http://a.com/private/x",), ("http://d.com/ok",), (None,)],
        "url string",
    )
    v = robots_verdict(pages, rules, agent="GoodBot")
    rows = {r.url: r for r in v.collect()}
    assert set(rows) == {"http://a.com/private/x", "http://d.com/ok", None}
    assert rows[None].robots_allowed is True
    assert rows[None].robots_rule is None
    # annotate-then-filter == the filter variant, row for row
    kept_verdict = sorted(
        r.url or "" for r in v.filter("robots_allowed").collect()
    )
    kept_filter = sorted(
        r.url or ""
        for r in robots_filter(pages, rules, agent="GoodBot").collect()
    )
    assert kept_verdict == kept_filter
