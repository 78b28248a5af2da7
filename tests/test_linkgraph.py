"""Link-graph operator tests: href resolution rules, host graph
aggregation, PageRank vs an independent numpy reference, and the plan
shapes the 100 TB story depends on."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from readability_ex_spark.operators.linkgraph import (
    extract_outlinks,
    host_graph,
    host_pagerank,
    outlink_edges,
    synth_host_edges,
)

BASE = "https://www.example.com/a/b/page.html?x=1"

RESOLVE_CASES = [
    # (href, expected outlink or None)
    ("https://other.net/x", "https://other.net/x"),
    ("HTTP://Cased.NET/x", "HTTP://Cased.NET/x"),  # passthrough keeps case
    ("mailto:a@b.c", None),
    ("javascript:void(0)", None),
    ("tel:+1234", None),
    ("data:text/plain,hi", None),
    ("//cdn.net/lib.js", "https://cdn.net/lib.js"),  # base scheme
    ("/root/path", "https://www.example.com/root/path"),
    ("?page=2", "https://www.example.com/a/b/page.html?page=2"),
    ("rel/item.html", "https://www.example.com/a/b/rel/item.html"),
    ("../up/x", "https://www.example.com/a/b/../up/x"),  # no dot removal
    ("#frag", None),  # self-link
    ("", None),
    ("  /sp/aced  ", "https://www.example.com/sp/aced"),  # trimmed
    ("x.html#sec", "https://www.example.com/a/b/x.html"),  # frag stripped
]


def test_resolve_href_rules(spark):
    html = "".join(f'<a href="{h}">t</a>' for h, _ in RESOLVE_CASES)
    df = spark.createDataFrame([(BASE, html)], "url string, html string")
    row = extract_outlinks(df).collect()[0]
    assert row.n_hrefs == len(RESOLVE_CASES)
    assert list(row.outlinks) == [want for _, want in RESOLVE_CASES]
    assert row.n_outlinks == sum(1 for _, w in RESOLVE_CASES if w is not None)


def test_resolve_against_opaque_base(spark):
    """A urn: base resolves nothing but absolute http(s) refs."""
    html = (
        '<a href="https://abs.net/x">a</a>'
        '<a href="/rel">r</a><a href="p/q">p</a>'
    )
    df = spark.createDataFrame([("urn:doc:42", html)], "url string, html string")
    row = extract_outlinks(df).collect()[0]
    assert list(row.outlinks) == ["https://abs.net/x", None, None]


def test_single_and_double_quoted_hrefs(spark):
    """Double-quoted matches first, then single-quoted (the order the
    oracle's list_concat mirrors); case-insensitive tag/attr."""
    html = "<A HREF='/sq'>s</A><a href=\"/dq\">d</a>"
    df = spark.createDataFrame([(BASE, html)], "url string, html string")
    row = extract_outlinks(df).collect()[0]
    assert list(row.outlinks) == [
        "https://www.example.com/dq",
        "https://www.example.com/sq",
    ]


def test_base_with_no_path_slash(spark):
    """scheme://host (no path) resolves relative refs from '/'."""
    df = spark.createDataFrame(
        [("http://h.io", '<a href="x.html">x</a>')], "url string, html string"
    )
    row = extract_outlinks(df).collect()[0]
    assert list(row.outlinks) == ["http://h.io/x.html"]


def test_outlink_edges_drops_skipped(spark):
    df = spark.createDataFrame(
        [(BASE, '<a href="/a">a</a><a href="mailto:x@y">m</a>')],
        "url string, html string",
    )
    edges = outlink_edges(df).collect()
    assert [(r.src, r.dst) for r in edges] == [
        (BASE, "https://www.example.com/a")
    ]


def test_host_graph_folds_case_and_counts(spark):
    edges = spark.createDataFrame(
        [
            ("http://A.COM/1", "https://B.net/x"),
            ("http://a.com/2", "https://b.NET:443/y"),
            ("urn:doc:1", "https://b.net/z"),  # no src host -> dropped
        ],
        "src string, dst string",
    )
    rows = host_graph(edges).collect()
    assert [(r.src_host, r.dst_host, r.n_links) for r in rows] == [
        ("a.com", "b.net", 2)
    ]


def test_page_inlinks_counts(spark):
    """In-degree rollup: link instances, distinct pages, distinct
    hosts; an opaque-id source counts as a page but not a host."""
    from readability_ex_spark.operators.linkgraph import page_inlinks

    t = "https://t.example.org/target"
    pages = spark.createDataFrame(
        [
            # links the target TWICE -> 2 instances, 1 page, 1 host
            (
                "http://one.com/p",
                f'<a href="{t}">x</a><a href="{t}">y</a>',
            ),
            ("http://two.com/p", f'<a href="{t}">z</a>'),
            # opaque src: no authority -> page counted, host not
            ("urn:doc:9", f'<a href="{t}">w</a>'),
            # links something else entirely
            ("http://one.com/q", '<a href="https://other.net/o">o</a>'),
        ],
        "url string, html string",
    )
    rows = {r.target_url: r for r in page_inlinks(pages).collect()}
    assert rows[t].n_inlinks == 4
    assert rows[t].n_src_pages == 3
    assert rows[t].n_src_hosts == 2  # one.com, two.com (urn excluded)
    assert rows["https://other.net/o"].n_inlinks == 1
    assert len(rows) == 2


def _numpy_pagerank(edges, k=3, d=0.85):
    """Independent dense reference: damped update with dangling mass."""
    nodes = sorted({s for s, _ in edges} | {t for _, t in edges})
    idx = {h: i for i, h in enumerate(nodes)}
    n = len(nodes)
    out = {}
    for s, t in set(edges):
        out.setdefault(s, []).append(t)
    r = np.full(n, 1.0 / n)
    for _ in range(k):
        nxt = np.full(n, (1.0 - d) / n)
        dangling = sum(r[idx[h]] for h in nodes if h not in out)
        nxt += d * dangling / n
        for s, ts in out.items():
            share = r[idx[s]] / len(ts)
            for t in ts:
                nxt[idx[t]] += d * share
        r = nxt
    return dict(zip(nodes, r))


GRAPH = [
    ("a", "b"),
    ("a", "c"),
    ("b", "c"),
    ("c", "a"),
    ("c", "c"),  # self-loop kept
    ("a", "d"),  # d is dangling (no outlinks)
    ("a", "b"),  # duplicate edge collapsed by distinct
]


def test_pagerank_matches_numpy_reference(spark):
    edges = spark.createDataFrame(GRAPH, "src_host string, dst_host string")
    got = {
        r.host: r.rank
        for r in host_pagerank(edges, iterations=3, damping=0.85).collect()
    }
    want = _numpy_pagerank(GRAPH)
    assert set(got) == set(want)
    for h in want:
        assert got[h] == pytest.approx(want[h], abs=1e-12)


def test_pagerank_mass_conserved(spark):
    """The damped update conserves total rank mass exactly (dangling
    mass is redistributed, not lost)."""
    edges = spark.createDataFrame(GRAPH, "src_host string, dst_host string")
    ranks = host_pagerank(edges, iterations=4).agg(F.sum("rank")).collect()
    assert ranks[0][0] == pytest.approx(1.0, abs=1e-9)


def test_pagerank_empty_graph(spark):
    edges = spark.createDataFrame([], "src_host string, dst_host string")
    assert host_pagerank(edges, iterations=2).count() == 0


def test_pagerank_tol_stops_at_numpy_converged_point(spark):
    """tol turns K into a data-driven cap: with a generous iteration
    budget and a tight tol, the early-stopped ranks must agree with the
    numpy reference iterated to ITS converged fixpoint (successive
    numpy rounds change by < tol), and the stamped residual must match
    the numpy residual trajectory (< tol, > 0)."""
    # numpy fixpoint: iterate until the L1 step change drops below tol
    tol = 1e-10
    prev, k = None, 0
    while True:
        k += 1
        cur = _numpy_pagerank(GRAPH, k=k)
        if prev is not None:
            step = sum(abs(cur[h] - prev[h]) for h in cur)
            if step < tol:
                break
        prev = cur
        assert k < 200  # the 4-node graph converges in tens of rounds
    edges = spark.createDataFrame(GRAPH, "src_host string, dst_host string")
    out = host_pagerank(
        edges, iterations=500, damping=0.85, tol=tol,
        residual_col="rank_residual",
    ).collect()
    got = {r.host: r.rank for r in out}
    for h in cur:
        assert got[h] == pytest.approx(cur[h], abs=1e-9)
    res = {r.rank_residual for r in out}
    assert len(res) == 1  # broadcast scalar, identical on every row
    r = res.pop()
    assert 0.0 <= r < tol


def test_pagerank_residual_col_without_tol(spark):
    """residual_col alone (no early stop) stamps the final round's L1
    step onto every row — the 100 TB evidence channel."""
    edges = spark.createDataFrame(GRAPH, "src_host string, dst_host string")
    out = host_pagerank(edges, iterations=3, residual_col="rr").collect()
    want2 = _numpy_pagerank(GRAPH, k=2)
    want3 = _numpy_pagerank(GRAPH, k=3)
    expect = sum(abs(want3[h] - want2[h]) for h in want3)
    for r in out:
        assert r.rr == pytest.approx(expect, abs=1e-12)
    # ranks themselves are unchanged by the residual channel
    got = {r.host: r.rank for r in out}
    for h in want3:
        assert got[h] == pytest.approx(want3[h], abs=1e-12)


def test_synth_edges_have_dangling_hosts(spark):
    """The checked-query derivation must actually exercise the
    dangling-mass path: hosts 13-16 appear as dst only."""
    docs = spark.range(200).select(F.col("id").alias("doc_id"))
    hg = host_graph(synth_host_edges(docs))
    srcs = {r.src_host for r in hg.select("src_host").distinct().collect()}
    dsts = {r.dst_host for r in hg.select("dst_host").distinct().collect()}
    assert "host-16.test" in dsts - srcs


def test_extract_outlinks_plan_is_pure_codegen(spark):
    """Outlink extraction must stay a free map: no exchange, no
    Python eval — the regex harvest + resolution fuse into the scan."""
    pages = spark.range(50).select(
        F.concat(F.lit("http://h"), F.col("id") % 5, F.lit(".com/p/x")).alias(
            "url"
        ),
        F.lit('<a href="/a">a</a>').alias("html"),
    )
    plan = (
        extract_outlinks(pages)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Exchange" not in plan
    for marker in ("BatchEvalPython", "ArrowEvalPython", "mapInPandas"):
        assert marker not in plan


def test_host_graph_plan_single_exchange(spark):
    """Host aggregation is ONE hash agg: partial map-side collapse,
    one exchange on the host pair."""
    edges = spark.createDataFrame(GRAPH, "src string, dst string")
    edges = edges.select(
        F.concat(F.lit("http://"), "src", F.lit(".com/")).alias("src"),
        F.concat(F.lit("http://"), "dst", F.lit(".com/")).alias("dst"),
    )
    plan = host_graph(edges)._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange") == 1


def test_page_inlinks_plan_shape(spark):
    """In-degree rollup: Expand + two exchanges (the multi-distinct
    rewrite's honest price — partial agg on (target, distinct-key),
    then the final agg on target); no Python eval, no Window."""
    from readability_ex_spark.operators.linkgraph import page_inlinks

    pages = spark.range(50).select(
        F.concat(F.lit("http://h"), F.col("id") % 5, F.lit(".com/p/x")).alias(
            "url"
        ),
        F.lit('<a href="/a">a</a>').alias("html"),
    )
    plan = page_inlinks(pages)._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange") == 2
    for marker in (
        "BatchEvalPython",
        "ArrowEvalPython",
        "mapInPandas",
        "Window",
    ):
        assert marker not in plan


def test_kernel_collect_outlinks():
    """DOM-accurate harvest: WHATWG resolution (dot segments removed,
    unlike the bulk regex path), scheme skip, order-preserving dedup,
    cap."""
    from readability_ex_spark.kernel import dom
    from readability_ex_spark.kernel.links import collect_outlinks

    html = (
        "<html><body>"
        '<a href="https://abs.net/x#frag">a</a>'
        '<a href="/root">r</a>'
        '<a href="../up/y">u</a>'
        '<a href="rel.html">p</a>'
        '<a href="mailto:a@b.c">m</a>'
        '<a href="javascript:void(0)">j</a>'
        '<a href="#sec">f</a>'
        '<a href="https://abs.net/x">dup</a>'
        "</body></html>"
    )
    doc = dom.parse_document(html)
    got = collect_outlinks(doc, "https://h.io/a/b/page.html")
    assert got == [
        "https://abs.net/x",
        "https://h.io/root",
        "https://h.io/a/up/y",  # WHATWG removes the dot segment
        "https://h.io/a/b/rel.html",
    ]


def test_kernel_collect_outlinks_cap():
    from readability_ex_spark.kernel import dom
    from readability_ex_spark.kernel.links import collect_outlinks

    html = "".join(f'<a href="/p{i}">x</a>' for i in range(50))
    doc = dom.parse_document(f"<html><body>{html}</body></html>")
    got = collect_outlinks(doc, "http://h.io/", max_links=10)
    assert len(got) == 10
    assert got[0] == "http://h.io/p0"


def test_pipeline_emits_outlinks(spark):
    """End-to-end: the extraction UDF carries the kernel outlinks
    column; the synthetic pages' nav links resolve against the page
    url."""
    from readability_ex_spark.pipeline import run_extraction

    pages = spark.createDataFrame(
        [
            (
                "http://h.io/a/page",
                None,
                '<html><body><nav><a href="/">Home</a></nav>'
                "<article><h1>T</h1>"
                + "<p>alpha beta gamma delta epsilon zeta eta theta "
                  "iota kappa word more text here now then, commas, "
                  "yes.</p>" * 20
                + '<a href="next.html">continue</a></article>'
                "</body></html>",
            )
        ],
        "url string, warc_ts timestamp, html string",
    )
    row = run_extraction(pages, n_partitions=1).collect()[0]
    assert row.status == "ok"
    assert "http://h.io/" in row.outlinks
    assert "http://h.io/a/next.html" in row.outlinks


def test_extract_anchors_alignment_and_cleaning(spark):
    """href/text arrays index-align from one pattern; anchor text is
    tag-stripped and whitespace-collapsed."""
    from readability_ex_spark.operators.linkgraph import extract_anchors

    html = (
        '<a href="/a"><b>Bold</b>  link\n text</a>'
        '<a class="x" href="/b">plain</a>'
        '<a href="mailto:x@y">mail me</a>'
    )
    df = spark.createDataFrame([(BASE, html)], "url string, html string")
    rows = extract_anchors(df).orderBy("href").collect()
    assert [(r.href, r.anchor_text, r.outlink) for r in rows] == [
        ("/a", "Bold link text", "https://www.example.com/a"),
        ("/b", "plain", "https://www.example.com/b"),
        ("mailto:x@y", "mail me", None),  # kept, unresolved
    ]


def test_anchor_index_counts(spark):
    from readability_ex_spark.operators.linkgraph import (
        anchor_index,
        extract_anchors,
    )

    html1 = '<a href="http://t.io/p">Good Page</a>'
    html2 = (
        '<a href="http://t.io/p">Good Page</a>'
        '<a href="http://t.io/p">other words</a>'
        '<a href="http://t.io/q"></a>'  # empty text dropped
    )
    df = spark.createDataFrame(
        [("http://a.io/1", html1), ("http://b.io/1", html2)],
        "url string, html string",
    )
    rows = anchor_index(extract_anchors(df)).orderBy(
        "target", "anchor_text"
    ).collect()
    assert [(r.target, r.anchor_text, r.n_anchors) for r in rows] == [
        ("http://t.io/p", "Good Page", 2),
        ("http://t.io/p", "other words", 1),
    ]


def test_host_components_multiple_components(spark):
    from readability_ex_spark.operators.linkgraph import host_components

    edges = spark.createDataFrame(
        [
            ("a.io", "b.io"),
            ("b.io", "c.io"),
            ("x.io", "y.io"),  # second component
            ("z.io", "z.io"),  # self-loop: singleton component
        ],
        "src_host string, dst_host string",
    )
    got = {
        r.host: r.component_id for r in host_components(edges).collect()
    }
    assert got == {
        "a.io": "a.io",
        "b.io": "a.io",
        "c.io": "a.io",
        "x.io": "x.io",
        "y.io": "x.io",
        "z.io": "z.io",
    }


def test_synth_component_edges_form_four_components(spark):
    from readability_ex_spark.operators.linkgraph import (
        host_components,
        synth_component_edges,
    )

    docs = spark.range(100).select(F.col("id").alias("doc_id"))
    comps = host_components(synth_component_edges(docs))
    n = comps.select("component_id").distinct().count()
    assert n == 4


def test_base_href_overrides_resolution_base(spark):
    """An absolute <base href> becomes the resolution base; a relative
    one is ignored (safe subset — the kernel path handles it exactly)."""
    html_abs = (
        '<base href="https://cdn.base.org/a/b/">'
        '<a href="x.html">x</a><a href="/root">r</a>'
    )
    html_rel = '<base href="/only/path/"><a href="x.html">x</a>'
    df = spark.createDataFrame(
        [("http://page.io/p/q", html_abs), ("http://page.io/p/q", html_rel)],
        "url string, html string",
    )
    rows = extract_outlinks(df).collect()
    assert list(rows[0].outlinks) == [
        "https://cdn.base.org/a/b/x.html",
        "https://cdn.base.org/root",
    ]
    assert list(rows[1].outlinks) == ["http://page.io/p/x.html"]


def test_kernel_outlinks_honor_base_href():
    from readability_ex_spark.kernel import dom
    from readability_ex_spark.kernel.api import _effective_base_uri
    from readability_ex_spark.kernel.links import collect_outlinks

    doc = dom.parse_document(
        '<html><head><base href="https://b.org/dir/"></head>'
        '<body><a href="x.html">x</a></body></html>'
    )
    eff, _ = _effective_base_uri(doc, "http://page.io/p")
    assert collect_outlinks(doc, eff) == ["https://b.org/dir/x.html"]


def _py_resolve(href: str, base: str):
    """Independent Python reference of resolve_href's documented rules."""
    import re as _re

    auth_m = _re.match(r"[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*", base)
    auth = auth_m.group(0) if auth_m else ""
    scheme_m = _re.match(r"([A-Za-z][A-Za-z0-9+.-]*)://", base)
    scheme = scheme_m.group(1).lower() if scheme_m else ""
    rest = base[len(auth):]
    path_m = _re.match(r"[^?#]*", rest)
    path = path_m.group(0)
    bd_m = _re.match(r".*/", path)
    basedir = bd_m.group(0) if bd_m else "/"

    h = _re.match(r"[^#]*", href.strip()).group(0)
    if h == "":
        return None
    if _re.match(r"(?i)https?://", h):
        return h
    if _re.match(r"[A-Za-z][A-Za-z0-9+.-]*:", h):
        return None
    if auth == "":
        return None
    if h.startswith("//"):
        return scheme + ":" + h
    if h.startswith("/"):
        return auth + h
    if h.startswith("?"):
        return auth + path + h
    return auth + basedir + h


def test_resolve_href_fuzz_vs_python_reference(spark):
    """300 random (href, base) pairs: the Spark expression and the
    Python reference must agree exactly — the cross-engine discipline
    that caught the REP $-escaping bug."""
    import random

    rng = random.Random(20260817)
    schemes = ["http://", "https://", "HTTP://", "ftp://", ""]
    hosts = ["a.io", "X.Example.COM:8080", "h.test", ""]
    paths = ["", "/", "/a/b", "/a/b/", "/a/b/c.html", "/a?q=1", "/#f"]
    href_shapes = [
        "", "#f", "x.html", "./x", "../x", "/abs", "//pp.io/z",
        "?q=2", "mailto:a@b", "javascript:void(0)", "https://o.net/p",
        "HTTPS://O.NET/P#frag", "tel:+1", "a b", "  /sp  ", "x#y#z",
        "data:text/plain,x", "weird:thing", ":", "a:b/c",
    ]
    cases = []
    for _ in range(300):
        base = rng.choice(schemes) + rng.choice(hosts) + rng.choice(paths)
        if not base:
            base = "urn:doc:1"
        cases.append((rng.choice(href_shapes), base))

    from readability_ex_spark.operators.linkgraph import resolve_href

    df = spark.createDataFrame(
        [(i, h, b) for i, (h, b) in enumerate(cases)],
        "i long, href string, base string",
    )
    got = {
        r.i: r.out
        for r in df.select(
            "i", resolve_href(F.col("href"), F.col("base")).alias("out")
        ).collect()
    }
    for i, (h, b) in enumerate(cases):
        assert got[i] == _py_resolve(h, b), (h, b, got[i], _py_resolve(h, b))


def test_anchor_counts_collapse_repeated_fetches(spark):
    """The run_job --anchors composition counts LINK frequency, not
    refetch frequency: repeated (url, warc_ts) fetches of one page must
    contribute its anchors once (latest fetch wins), matching the
    .distinct() discipline of the edge artifacts."""
    import datetime

    from readability_ex_spark.operators.linkgraph import (
        anchor_index,
        extract_anchors,
    )
    from readability_ex_spark.pipeline import dedup_latest_crawl

    html = b'<html><body><a href="http://t.test/x">X</a></body></html>'
    rows = [
        ("http://s.test/p", datetime.datetime(2024, 1, d), html, "", "en")
        for d in (1, 2, 3)
    ]
    pages = spark.createDataFrame(
        rows,
        "url string, warc_ts timestamp, html binary, "
        "text string, lang string",
    )
    out = anchor_index(extract_anchors(dedup_latest_crawl(pages))).collect()
    assert [(r.target, r.anchor_text, r.n_anchors) for r in out] == [
        ("http://t.test/x", "X", 1)
    ]
