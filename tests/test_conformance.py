"""Golden conformance: the Mozilla readability-test-pages corpus vendored
by the reference (130 fixtures), asserted with the reference harness's
semantics (test/support/fixture_case.exs:8-45) plus the block-aware text
check (BASELINE.json's byte-identical-text invariant, modulo the golden
files' beautifier formatting — see kernel/conformance.py)."""

from __future__ import annotations

import pytest

from readability_ex_spark.kernel import conformance as C
from readability_ex_spark.kernel import parse

if C.FIXTURES_DIR.is_dir():
    FIXTURE_IDS = C.fixture_ids()
else:  # corpus not present in this environment
    FIXTURE_IDS = []


@pytest.mark.skipif(not FIXTURE_IDS, reason="fixture corpus not available")
@pytest.mark.parametrize("fixture_id", FIXTURE_IDS)
def test_fixture(fixture_id):
    fix = C.load_fixture(fixture_id)
    result = parse(fix["source"], base_uri="http://fakehost/test/")
    checks = C.compare_fixture(result, fix)
    failed = [k for k, ok in checks.items() if not ok and k != "html_strict"]
    assert not failed, f"{fixture_id}: failed {failed}"
