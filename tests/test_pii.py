"""PII scrub: typed placeholders, stage-input counts, JVM-only plan."""
from __future__ import annotations

import pytest

from readability_ex_spark.operators.pii import scrub_pii


@pytest.fixture(scope="module")
def rows(spark):
    docs = spark.createDataFrame(
        [
            (1, "mail a.user+tag@sub.example.co.uk and b@x.io today"),
            (2, "server at 192.168.0.1 and 10.0.0.254, port 8080"),
            (3, "call +44 20 7946 0958 or 555-0199-1234 now"),
            (4, "clean text with the year 2024 and room 101"),
            (5, None),
        ],
        "doc_id long, text string",
    )
    out = scrub_pii(docs)
    return {r.doc_id: r for r in out.collect()}, out


def test_email_scrub(rows):
    r = rows[0][1]
    assert r.n_email == 2
    assert r.text_scrubbed == "mail <EMAIL> and <EMAIL> today"


def test_ipv4_scrub(rows):
    r = rows[0][2]
    assert r.n_ipv4 == 2
    assert r.text_scrubbed == "server at <IP> and <IP>, port 8080"
    assert r.n_phone == 0  # '8080' is 4 digits, below the phone floor


def test_phone_scrub(rows):
    r = rows[0][3]
    assert r.n_phone == 2
    assert r.text_scrubbed == "call <PHONE> or <PHONE> now"


def test_clean_text_untouched(rows):
    r = rows[0][4]
    assert (r.n_email, r.n_ipv4, r.n_phone) == (0, 0, 0)
    assert r.text_scrubbed == "clean text with the year 2024 and room 101"


def test_null_text_stays_null(rows):
    r = rows[0][5]
    assert r.text_scrubbed is None


def test_plan_is_jvm_only(rows):
    plan = rows[1]._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert "Exchange" not in plan  # pure projection: one scan, no shuffle
