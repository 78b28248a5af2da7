"""The Spark pipeline must produce byte-identical extraction results to
direct kernel calls — on real fixture pages, through Arrow round-trips,
repartitioning, and worker-side imports."""

from __future__ import annotations

import pytest

from readability_ex_spark.kernel import conformance as C
from readability_ex_spark.kernel import parse
from readability_ex_spark.kernel.api import NotReadable
from readability_ex_spark.pipeline import run_extraction

FIXTURE_SAMPLE = [
    "001", "bbc-1", "wikipedia", "nytimes-1", "medium-1", "rtl-1",
    "qq", "videos-1", "lemonde-1", "webmd-1",
]


@pytest.mark.skipif(not C.FIXTURES_DIR.is_dir(), reason="corpus missing")
def test_pipeline_matches_kernel_on_fixtures(spark):
    rows = []
    expected = {}
    for fid in FIXTURE_SAMPLE:
        fix = C.load_fixture(fid)
        url = f"http://fakehost/test/{fid}"
        rows.append((url, None, fix["source"].encode("utf-8"), None, None))
        try:
            r = parse(fix["source"], base_uri=url)
            expected[url] = (r["text_content"], r["title"], r["byline"])
        except NotReadable:
            expected[url] = None

    df = spark.createDataFrame(
        rows,
        schema="url string, warc_ts timestamp, html binary, text string, lang string",
    )
    got = {
        r.url: r
        for r in run_extraction(df, dedup=False).collect()
    }
    assert set(got) == set(expected)
    for url, exp in expected.items():
        row = got[url]
        if exp is None:
            assert row.status == "not_readable"
        else:
            assert row.status == "ok"
            assert row.text == exp[0], f"text mismatch for {url}"
            assert row.title == exp[1]
            assert row.byline == exp[2]
