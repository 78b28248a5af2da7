"""robots.txt parsing + matching — the host-level half of the policy
stack (the page-level half is the kernel's meta-robots harvest,
``kernel/policy.py`` / ``operators/policyops.py``).

A crawl that respects the Robots Exclusion Protocol (RFC 9309) carries
one small side table of robots.txt fetches ``(host, robots_txt)``
next to billions of page rows.  This module turns those bodies into a
rules table and joins the verdict onto pages — entirely JVM-side:

- **parse** is line-oriented text processing expressed as
  ``posexplode`` + regex extraction + two window functions per host
  (group formation needs "which user-agent run does this rule follow",
  i.e. a running sum over line order — a textbook window, not a UDF).
- **match** is RFC 9309 longest-match precedence: patterns support
  ``*`` (any chars) and a trailing ``$`` (end anchor); the most
  specific match is the longest PATTERN (octet length, the rule
  Google's open-sourced matcher uses), allow winning length ties.
  Patterns are DATA, so they are escaped into regexes with a chain of
  fixed-string ``regexp_replace`` calls — no capture-group
  replacements (the Spark ``$1`` / DuckDB ``\\1`` portability trap,
  see ``operators/urlops.py``) and no UDF.

Scale shape: the rules table is tiny relative to pages (one row per
host × agent × rule), so the verdict join is a broadcast; the regex
escape runs over RULES, not pages, and matching is one codegen'd
``rlike`` per candidate (page, rule) pair within a host.  Pages from
hosts with no robots.txt (or no matching rule) are allowed — RFC 9309's
permissive default, same null semantics as the meta-robots flags.

Simplifications (documented, deliberate):

- Agent selection is exact product-token equality (lowercased), falling
  back to the ``*`` group — the common-crawler behavior; RFC's
  "longest prefix of the product token" refinement rarely differs.
- An empty ``Disallow:`` value (allow-everything idiom) is dropped at
  parse time, which is exactly its effect.
- ``Crawl-delay`` / ``Sitemap`` and unknown keys are ignored (they do
  not affect the allow/disallow verdict).

No reference counterpart (training-data layer).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from readability_ex_spark.operators.urlops import _SCHEME_AUTH_RE, host_expr


def _kv_lines(
    robots: DataFrame,
    host_col: str,
    body_col: str,
    keys: tuple[str, ...],
    with_pos: bool = True,
) -> DataFrame:
    """The fuzz-tested robots.txt line decomposition, as ONE copy shared
    by every parser (:func:`parse_robots`, :func:`parse_sitemaps`,
    :func:`parse_crawl_delay` — a fix to the comment-strip or key regex
    lands everywhere at once): split bodies on newline, strip ``#``
    comments, trim, split key/value on the first ``:``
    (case-insensitive key), keep only ``keys``.  ``with_pos`` carries
    ``line_no`` for the group-formation window."""
    line_cols = (
        F.posexplode(
            F.split(F.coalesce(F.col(body_col), F.lit("")), "\n")
        ).alias("line_no", "raw")
        if with_pos
        else F.explode(
            F.split(F.coalesce(F.col(body_col), F.lit("")), "\n")
        ).alias("raw")
    )
    lines = robots.select(F.col(host_col).alias("host"), line_cols)
    stripped = F.trim(F.regexp_extract(F.col("raw"), r"^[^#]*", 0))
    key = F.lower(F.regexp_extract(stripped, r"^([A-Za-z][A-Za-z-]*)\s*:", 1))
    value = F.trim(
        F.regexp_extract(stripped, r"^[A-Za-z][A-Za-z-]*\s*:(.*)$", 1)
    )
    cols = ["host"] + (["line_no"] if with_pos else [])
    return lines.select(
        *cols, key.alias("key"), value.alias("value")
    ).filter(F.col("key").isin(*keys))


def _agent_groups(kv: DataFrame) -> DataFrame:
    """RFC 9309 group formation over a ``_kv_lines(with_pos=True)``
    frame: a run of consecutive ``user-agent`` lines starts a group;
    rows before any group are dropped.  Adds ``group_id``."""
    w = Window.partitionBy("host").orderBy("line_no")
    is_ua = F.col("key") == "user-agent"
    group_start = is_ua & ~F.coalesce(F.lag(is_ua).over(w), F.lit(False))
    return kv.withColumn(
        "group_id",
        F.sum(group_start.cast("int")).over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ),
    ).filter(F.col("group_id") > 0)


def parse_robots(
    robots: DataFrame,
    host_col: str = "host",
    body_col: str = "robots_txt",
) -> DataFrame:
    """Rules table ``(host, group_id, agent, rule, path)`` from raw
    robots.txt bodies.

    RFC 9309 group formation: a run of consecutive ``User-agent``
    lines starts a group; the ``Allow``/``Disallow`` lines after it
    (until the next run) belong to every agent named in the run.  Rules
    before any ``User-agent`` line are outside all groups and dropped.
    Keys are case-insensitive; ``#`` starts a comment; blank lines are
    insignificant (they do NOT close a group — RFC 9309 §2.2).
    """
    kv = _kv_lines(
        robots, host_col, body_col, ("user-agent", "allow", "disallow")
    )
    grouped = _agent_groups(kv)
    is_ua = F.col("key") == "user-agent"
    agents = grouped.filter(is_ua).select(
        "host", "group_id", F.lower(F.col("value")).alias("agent")
    )
    rules = grouped.filter(~is_ua & (F.col("value") != "")).select(
        "host",
        "group_id",
        F.col("key").alias("rule"),
        F.col("value").alias("path"),
    )
    return agents.join(rules, ["host", "group_id"]).select(
        "host", "group_id", "agent", "rule", "path"
    )


def parse_sitemaps(
    robots: DataFrame,
    host_col: str = "host",
    body_col: str = "robots_txt",
) -> DataFrame:
    """``(host, sitemap_url)`` from robots.txt ``Sitemap:`` lines.

    Per RFC 9309 §2.2.4 / sitemaps.org, ``Sitemap`` is a standalone
    directive: it lives OUTSIDE user-agent groups (valid anywhere in
    the file, including before any group), so extraction is a plain
    line filter — no group window needed.  Duplicate declarations
    collapse; line order is not meaningful."""
    return (
        _kv_lines(robots, host_col, body_col, ("sitemap",), with_pos=False)
        .filter(F.col("value") != "")
        .select("host", F.col("value").alias("sitemap_url"))
        .distinct()
    )


def parse_crawl_delay(
    robots: DataFrame,
    host_col: str = "host",
    body_col: str = "robots_txt",
) -> DataFrame:
    """``(host, agent, crawl_delay)`` from ``Crawl-delay`` lines — the
    de-facto politeness extension (honored by Bing/Yandex, ignored by
    Google; not part of RFC 9309, which is why :func:`parse_robots`
    skips it).  Group formation is the same user-agent-run rule as
    :func:`parse_robots`, with ``crawl-delay`` as the recognized
    directive; non-numeric values are dropped, and multiple delays for
    one (host, agent) keep the MIN (conservative politeness).  Edge
    case: a Crawl-delay line BETWEEN two User-agent lines splits their
    run here (it is a recognized directive to this parser) while
    parse_robots — to which it is an ignorable unknown line per RFC
    9309 §2.2.2 — keeps them one run; the two parsers only ever
    disagree on files that interleave the keys that way.
    """
    kv = _kv_lines(robots, host_col, body_col, ("user-agent", "crawl-delay"))
    grouped = _agent_groups(kv)
    is_ua = F.col("key") == "user-agent"
    agents = grouped.filter(is_ua).select(
        "host", "group_id", F.lower(F.col("value")).alias("agent")
    )
    delays = grouped.filter(
        ~is_ua & F.col("value").rlike(r"^[0-9]+(\.[0-9]+)?$")
    ).select("host", "group_id", F.col("value").cast("double").alias("d"))
    return (
        agents.join(delays, ["host", "group_id"])
        .groupBy("host", "agent")
        .agg(F.min("d").alias("crawl_delay"))
    )


def sitemaps_from_pages(
    pages: DataFrame,
    url_col: str = "url",
    body_col: str = "html",
    ts_col: str | None = None,
) -> DataFrame:
    """``(host, url, sitemap_xml)`` side table lifted from a crawl's own
    archived sitemap fetches (conventional paths ``/sitemap*.xml``),
    latest-per-url like :func:`robots_from_pages`."""
    body = F.col(body_col).cast("string")
    order = (
        F.struct(F.col(ts_col), F.md5(body))
        if ts_col
        else F.struct(F.md5(body))
    )
    return (
        pages.filter(url_path_expr(url_col).rlike(r"^/sitemap[^/]*\.xml$"))
        .select(
            host_expr(url_col).alias("host"),
            F.col(url_col).alias("url"),
            body.alias("_body"),
            order.alias("_ord"),
        )
        .filter(F.col("host") != "")
        .groupBy("host", "url")
        .agg(F.max_by("_body", "_ord").alias("sitemap_xml"))
    )


def _xml_unescape(col):
    """The five predefined XML entities, as literal replaces (portable:
    no capture-group replacements, identical in Spark and DuckDB).
    ``&amp;`` goes LAST so ``&amp;lt;`` decodes to the literal ``&lt;``
    text rather than double-decoding."""
    out = col
    for ent, ch in (
        ("&lt;", "<"),
        ("&gt;", ">"),
        ("&quot;", '"'),
        ("&apos;", "'"),
        ("&amp;", "&"),
    ):
        out = F.replace(out, F.lit(ent), F.lit(ch))
    return out


def parse_sitemap_urls(
    sitemaps: DataFrame,
    host_col: str = "host",
    body_col: str = "sitemap_xml",
) -> DataFrame:
    """``(host, loc, from_index)`` from sitemap XML bodies —
    sitemaps.org ``<urlset>`` documents list page urls, ``<sitemapindex>``
    documents list MORE sitemaps (``from_index`` = true; the caller
    feeds those back through the fetch loop).  ``<loc>`` values are
    whitespace-trimmed (REGEXP trim at both ends — ``F.trim`` strips
    only 0x20 spaces, and pretty-printed sitemaps newline-pad their
    locs, which would then fail the frontier's anchored ``^https?://``
    check and silently vanish from the schedule) and
    XML-entity-decoded; extraction is one
    ``regexp_extract_all`` (locs cannot contain ``<``, so the pattern
    needs no lazy quantifier), pure codegen, duplicates collapsed.
    """
    body = F.col(body_col)
    locs = F.regexp_extract_all(body, F.lit(r"(?i)<loc[^>]*>([^<]*)</loc>"), 1)
    is_index = F.lower(body).contains("<sitemapindex")
    return (
        sitemaps.select(
            F.col(host_col).alias("host"),
            is_index.alias("from_index"),
            F.explode(locs).alias("_raw"),
        )
        .select(
            "host",
            # two anchored replaces, not one alternation: DuckDB's
            # regexp_replace is first-match-only, and each anchored
            # pattern can match at most once — portable by construction
            _xml_unescape(
                F.regexp_replace(
                    F.regexp_replace(F.col("_raw"), r"^\s+", ""),
                    r"\s+$",
                    "",
                )
            ).alias("loc"),
            "from_index",
        )
        .filter(F.col("loc") != "")
        .distinct()
    )


def crawl_delay_for_agent(delays: DataFrame, agent: str = "*") -> DataFrame:
    """``(host, crawl_delay)`` governing ``agent``: the exact agent
    token's delay where one is declared, else the host's ``*`` delay —
    the same group-selection precedence as :func:`rules_for_agent`.
    ``delays`` is :func:`parse_crawl_delay` output (already MIN-reduced
    per (host, agent), so each branch is at most one row per host)."""
    a = agent.lower()
    exact = delays.filter(F.col("agent") == a)
    fallback = delays.filter(F.col("agent") == "*").join(
        exact.select("host"), "host", "left_anti"
    )
    return exact.unionByName(fallback).select("host", "crawl_delay")


def rules_for_agent(rules: DataFrame, agent: str = "*") -> DataFrame:
    """The rule rows that govern ``agent`` on each host: the host's
    exact-token group(s) when any exist, else its ``*`` group(s).

    One small window over the RULES table (never pages)."""
    a = agent.lower()
    cand = rules.filter(F.col("agent").isin(a, "*") if a != "*" else (F.col("agent") == "*"))
    wh = Window.partitionBy("host")
    return (
        cand.withColumn(
            "_has_exact", F.max((F.col("agent") == a).cast("int")).over(wh)
        )
        .filter(
            (F.col("agent") == a)
            | ((F.col("_has_exact") == 0) & (F.col("agent") == "*"))
        )
        .drop("_has_exact")
    )


def pattern_regex_expr(pattern: Column | str) -> Column:
    """REP wildcard pattern -> anchored Java/RE2 regex, as a chain of
    fixed-string ``regexp_replace`` calls (patterns are data; no
    capture-group replacements — see module docstring).

    ``*`` -> ``.*``; a trailing ``$`` anchors the end; every other
    regex metachar is escaped.  The result is used as ``'^' || regex``
    with an unanchored search, i.e. REP prefix-match semantics.
    """
    p = F.col(pattern) if isinstance(pattern, str) else pattern
    anchored = p.endswith("$")
    body = F.when(anchored, F.substring(p, 1, F.length(p) - 1)).otherwise(p)
    esc = body
    for ch, rep, _ in PATTERN_ESCAPES:
        esc = F.regexp_replace(esc, ch, rep)
    return F.concat(esc, F.when(anchored, F.lit("$")).otherwise(F.lit("")))


# (regex, java replacement, re2 replacement) chain turning a REP
# pattern body into a regex — backslash FIRST, each metachar with a
# fixed replacement, '*' LAST (it becomes the only live metachar).
# The match patterns are valid and identical in Java regex and RE2,
# and the replacements contain no group references; every replacement
# is also spelled identically in both dialects EXCEPT the literal-'$'
# row — Java replacement strings treat '$' as a group reference and
# need it backslash-escaped, RE2 rewrites treat it literally (found by
# the three-engine fuzz test, tests/test_robotstxt.py) — so the table
# carries both spellings and the DuckDB oracle
# (``__spark_entry__._robots_rx_sql``) folds column 3.
PATTERN_ESCAPES: tuple[tuple[str, str, str], ...] = (
    ("\\\\", "\\\\\\\\", "\\\\\\\\"),  # \ -> \\
    ("\\.", "\\\\.", "\\\\."),
    ("\\+", "\\\\+", "\\\\+"),
    ("\\?", "\\\\?", "\\\\?"),
    ("\\(", "\\\\(", "\\\\("),
    ("\\)", "\\\\)", "\\\\)"),
    ("\\[", "\\\\[", "\\\\["),
    ("\\]", "\\\\]", "\\\\]"),
    ("\\{", "\\\\{", "\\\\{"),
    ("\\}", "\\\\}", "\\\\}"),
    ("\\|", "\\\\|", "\\\\|"),
    ("\\^", "\\\\^", "\\\\^"),
    ("\\$", "\\\\\\$", "\\\\$"),  # $ -> \$ (dialect-split, see above)
    ("\\*", ".*", ".*"),
)


def url_path_expr(url: Column | str) -> Column:
    """The path-and-query REP matches against: everything after the
    authority, fragment stripped, ``/`` when empty."""
    u = F.col(url) if isinstance(url, str) else url
    nofrag = F.regexp_extract(u, r"^[^#]*", 0)
    auth = F.regexp_extract(nofrag, _SCHEME_AUTH_RE, 0)
    rest = F.substring(nofrag, F.length(auth) + 1, F.lit(2_000_000_000))
    return F.when(
        (auth == "") | (rest == ""), F.lit("/")
    ).otherwise(rest)


def _rules_side(rules: DataFrame, agent: str) -> DataFrame:
    """The broadcastable rules side both :func:`robots_verdict` and
    :func:`robots_filter` join against: agent-filtered rules with the
    precompiled anchored regex and the precedence pattern length."""
    return rules_for_agent(rules, agent).select(
        "host",
        "rule",
        "path",
        F.concat(F.lit("^"), pattern_regex_expr("path")).alias("_rx"),
        F.length("path").alias("_patlen"),
    )


def _keyed_pages(pages: DataFrame, url_col: str) -> DataFrame:
    """Pages projected to the (url, host, path) join key — shared by
    the verdict and filter variants so they match the same way."""
    return pages.select(
        F.col(url_col).alias("_url"),
        host_expr(url_col).alias("_host"),
        url_path_expr(url_col).alias("_path"),
    )


def robots_verdict(
    pages: DataFrame,
    rules: DataFrame,
    agent: str = "*",
    url_col: str = "url",
) -> DataFrame:
    """``pages`` plus ``robots_allowed`` (boolean) and the deciding
    ``robots_rule``/``robots_path`` (NULL when no rule matched).

    Plan: pages derive (host, path) as free maps; the agent-filtered
    rules table gains its escaped regex (computed once, on the tiny
    side) and is BROADCAST; matches resolve per page by RFC 9309
    precedence — longest pattern wins, allow wins length ties — with
    one aggregation keyed on the page (the broadcast join's output
    never shuffles pages more than that one agg).  No rule / no
    robots.txt -> allowed (permissive default).
    """
    side = _rules_side(rules, agent)
    keyed = _keyed_pages(pages, url_col)
    is_match = F.col("host").isNotNull() & F.rlike(
        F.col("_path"), F.col("_rx")
    )
    matched = (
        keyed.join(
            F.broadcast(side), keyed["_host"] == side["host"], "left"
        )
        .groupBy("_url")
        .agg(
            # non-matching join rows contribute NULL orderings, which
            # max_by skips — a page whose host has rules but none
            # matching still yields one (allowed) row here
            F.max_by(
                F.when(
                    is_match,
                    F.struct(
                        (F.col("rule") == "allow").alias("is_allow"),
                        F.col("rule").alias("rule"),
                        F.col("path").alias("path"),
                    ),
                ),
                # precedence: longest pattern, allow on ties; the
                # bytewise-LARGEST path breaks remaining ties so the
                # surfaced rule is deterministic (same verdict either
                # way — equal length + equal rule kind)
                F.when(
                    is_match,
                    F.struct(
                        F.col("_patlen").alias("l"),
                        (F.col("rule") == "allow").cast("int").alias("a"),
                        F.col("path").alias("p"),
                    ),
                ),
            ).alias("_win"),
        )
    )
    verdict = matched.select(
        F.col("_url").alias(url_col),
        F.coalesce(F.col("_win.is_allow"), F.lit(True)).alias(
            "robots_allowed"
        ),
        F.col("_win.rule").alias("robots_rule"),
        F.col("_win.path").alias("robots_path"),
    )
    # LEFT join + permissive coalesce: an equi-join never matches a
    # NULL url, so an inner join would silently DROP such rows — the
    # annotate variant must keep every input row (robots_filter's
    # left_anti keeps them too; the two variants must agree on which
    # pages exist), with the documented no-rule -> allowed default
    return pages.join(verdict, url_col, "left").withColumn(
        "robots_allowed", F.coalesce(F.col("robots_allowed"), F.lit(True))
    )


def robots_filter(
    pages: DataFrame,
    rules: DataFrame,
    agent: str = "*",
    url_col: str = "url",
) -> DataFrame:
    """``pages`` minus robots-disallowed rows — the composed-job shape.

    Leaner plan than filtering :func:`robots_verdict`: the broadcast
    join's output is cut to MATCHED (page, rule) pairs before the
    per-url precedence agg (only urls some rule matched are ever
    aggregated — at 100 TB the vast majority of a crawl matches no
    rule and flows straight through), and the verdict comes back as a
    LEFT ANTI join against just the disallowed urls, which AQE sizes
    (usually broadcast: the disallowed set is tiny relative to pages).
    """
    side = _rules_side(rules, agent)
    keyed = _keyed_pages(pages, url_col)
    disallowed = (
        keyed.join(F.broadcast(side), keyed["_host"] == side["host"])
        .filter(F.rlike(F.col("_path"), F.col("_rx")))
        .groupBy("_url")
        .agg(
            F.max_by(
                F.col("rule") == "allow",
                F.struct(
                    F.col("_patlen").alias("l"),
                    (F.col("rule") == "allow").cast("int").alias("a"),
                    F.col("path").alias("p"),
                ),
            ).alias("_allowed"),
        )
        .filter(~F.col("_allowed"))
        .select(F.col("_url").alias(url_col))
    )
    return pages.join(disallowed, url_col, "left_anti")


def robots_from_pages(
    pages: DataFrame,
    url_col: str = "url",
    body_col: str = "html",
    ts_col: str | None = None,
) -> DataFrame:
    """``(host, robots_txt)`` side table lifted from a crawl's own page
    rows — the shape a WARC crawl delivers robots fetches in (they are
    ordinary records whose path is exactly ``/robots.txt``).

    One row per host: with ``ts_col`` the LATEST fetch wins (md5 of the
    body as the deterministic tiebreak, the same rule as the page-level
    latest-crawl dedup); without it the bytewise-largest body is the
    (deterministic) winner.  Free at scale: the filter prunes at the
    scan and the agg runs on the tiny robots subset."""
    body = F.col(body_col).cast("string")
    order = (
        F.struct(F.col(ts_col), F.md5(body))
        if ts_col
        else F.struct(F.md5(body))
    )
    return (
        pages.filter(url_path_expr(url_col) == "/robots.txt")
        .select(
            host_expr(url_col).alias("host"),
            body.alias("_body"),
            order.alias("_ord"),
        )
        .filter(F.col("host") != "")
        .groupBy("host")
        .agg(F.max_by("_body", "_ord").alias("robots_txt"))
    )


# -- checked queries ---------------------------------------------------------
# The testdata tables carry no robots.txt, so the checked queries derive
# one deterministic body per synthetic host (same host arithmetic as
# operators/urlops.synth_url_expr) — together covering group formation
# (consecutive UA lines, blank lines, rules before any UA dropped),
# comments, case-insensitive keys, empty Disallow, ignored Crawl-delay,
# exact-agent vs * group selection, '*'/'$' wildcards, metachar
# escaping ('?'), longest-match precedence, and allow-wins-ties.

ROBOTS_CHECK_AGENT = "goodbot"

ROBOTS_BODY_BY_MOD: dict[int, str] = {
    1: (
        "User-agent: *\n"
        "Disallow: /Articles/\n"
        "Sitemap: https://cdn.example.com/sitemap.xml\n"
    ),
    2: (
        "# crawl policy\n"
        "User-agent: GoodBot\n"
        "User-Agent: FriendBot\n"
        "Disallow: /Articles/item-*\n"
        "Allow: /Articles/item-*?*\n"
        "Allow: /$\n"
        "Disallow:\n"
        "Crawl-delay: 10\n"
        "\n"
        "User-agent: *\n"
        "Disallow: /\n"
    ),
    3: (
        "SITEMAP: https://cdn.example.com/a.xml\n"
        "Disallow: /orphan/\n"
        "\n"
        "user-agent: *\n"
        "ALLOW: /Articles/item\n"
        "disallow: /Articles/item\n"
        "Disallow: /?utm_*\n"
        "# Sitemap: https://cdn.example.com/commented.xml\n"
        "Sitemap: https://cdn.example.com/a.xml\n"
    ),
}


# synthetic sitemap bodies: urlset with entity + whitespace + case
# edges, a sitemapindex (locs are MORE sitemaps), and a dup/empty-loc
# body; hosts with h % 4 == 0 publish none (same no-publish arm as the
# robots bodies)
SITEMAP_BODY_BY_MOD: dict[int, str] = {
    1: (
        '<?xml version="1.0"?>\n'
        '<urlset xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">\n'
        "<url><loc>https://www.example.com/page-a</loc></url>\n"
        "<url><loc>https://www.example.com/q?a=1&amp;b=2</loc></url>\n"
        "<url><loc>\n  https://www.example.com/padded \n</loc></url>\n"
        "</urlset>\n"
    ),
    2: (
        "<sitemapindex>\n"
        "<sitemap><loc>https://cdn.example.com/maps/part1.xml</loc>"
        "</sitemap>\n"
        "<sitemap><loc>https://cdn.example.com/maps/part2.xml</loc>"
        "</sitemap>\n"
        "</sitemapindex>\n"
    ),
    3: (
        "<urlset>\n"
        "<url><LOC>https://www.example.com/upper</LOC></url>\n"
        "<url><loc>https://www.example.com/dup</loc></url>\n"
        "<url><loc>https://www.example.com/dup</loc></url>\n"
        "<url><loc></loc></url>\n"
        "</urlset>\n"
    ),
}


def synth_sitemap_bodies(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One deterministic sitemap body per synthetic host (hosts with
    ``h % 4 == 0`` publish none)."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    hosts = docs.select(
        (F.col("doc_id") % 40).cast("long").alias("h")
    ).distinct()
    h = F.col("h")
    body = (
        F.when(h % 4 == 1, F.lit(SITEMAP_BODY_BY_MOD[1]))
        .when(h % 4 == 2, F.lit(SITEMAP_BODY_BY_MOD[2]))
        .otherwise(F.lit(SITEMAP_BODY_BY_MOD[3]))
    )
    return hosts.filter(h % 4 != 0).select(
        F.concat(
            F.lit("www.site"), h.cast("string"), F.lit(".example.com")
        ).alias("host"),
        body.alias("sitemap_xml"),
    )


def synth_robots_bodies(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One deterministic robots.txt body per synthetic host (hosts with
    ``h % 4 == 0`` publish none — the no-robots default path)."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    hosts = docs.select(
        (F.col("doc_id") % 40).cast("long").alias("h")
    ).distinct()
    h = F.col("h")
    body = (
        F.when(h % 4 == 1, F.lit(ROBOTS_BODY_BY_MOD[1]))
        .when(h % 4 == 2, F.lit(ROBOTS_BODY_BY_MOD[2]))
        .otherwise(F.lit(ROBOTS_BODY_BY_MOD[3]))
    )
    return hosts.filter(h % 4 != 0).select(
        F.concat(
            F.lit("www.site"), h.cast("string"), F.lit(".example.com")
        ).alias("host"),
        body.alias("robots_txt"),
    )


def q_robots_parse(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The parsed rules table over the synthetic robots bodies."""
    return parse_robots(synth_robots_bodies(spark, sf_dir)).orderBy(
        "host", "group_id", "agent", "rule", "path"
    )


def q_robots_sitemaps(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sitemap declarations over the synthetic bodies (standalone
    directive: outside groups, before any group, case-insensitive,
    commented lines ignored, duplicates collapsed)."""
    return parse_sitemaps(synth_robots_bodies(spark, sf_dir)).orderBy(
        "host", "sitemap_url"
    )


def q_sitemap_urls(spark: SparkSession, sf_dir: str) -> DataFrame:
    """<loc> extraction over the synthetic sitemap bodies (urlset vs
    sitemapindex flag, entity decode, trim, case, dup collapse,
    empty-loc drop)."""
    return parse_sitemap_urls(synth_sitemap_bodies(spark, sf_dir)).orderBy(
        "host", "loc"
    )


def q_robots_crawl_delay(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-(host, agent) Crawl-delay over the synthetic bodies (only
    the body-2 group declares one: goodbot/friendbot at 10 s)."""
    return parse_crawl_delay(synth_robots_bodies(spark, sf_dir)).orderBy(
        "host", "agent"
    )


def q_robots_verdict(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-doc RFC 9309 verdict for :data:`ROBOTS_CHECK_AGENT` over the
    synthetic urls + robots bodies."""
    from readability_ex_spark.operators.urlops import synth_url_expr

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    pages = docs.select("doc_id", synth_url_expr().alias("url"))
    rules = parse_robots(synth_robots_bodies(spark, sf_dir))
    return (
        robots_verdict(pages, rules, agent=ROBOTS_CHECK_AGENT)
        .select(
            "doc_id",
            "url",
            "robots_allowed",
            "robots_rule",
            "robots_path",
        )
        .orderBy("doc_id")
    )
