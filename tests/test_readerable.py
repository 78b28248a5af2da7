"""isProbablyReaderable conformance: the golden expected-metadata files
carry the flag for every fixture."""

from __future__ import annotations

import pytest

from readability_ex_spark.kernel import conformance as C
from readability_ex_spark.kernel.readerable import is_probably_readerable

IDS = C.fixture_ids() if C.FIXTURES_DIR.is_dir() else []


@pytest.mark.skipif(not IDS, reason="fixture corpus not available")
def test_readerable_matches_all_goldens():
    mismatches = []
    for fid in IDS:
        fix = C.load_fixture(fid)
        expected = fix["expected_meta"].get("readerable")
        if expected is None:
            continue
        if is_probably_readerable(fix["source"]) != expected:
            mismatches.append(fid)
    assert not mismatches, mismatches


def test_readerable_trivial_pages():
    assert not is_probably_readerable("<html><body><p>short</p></body></html>")
    long_p = "<p>" + ("lorem ipsum dolor sit amet, " * 40) + "</p>"
    assert is_probably_readerable(f"<html><body>{long_p * 3}</body></html>")
