"""Show where a fixture's extracted text/HTML diverges from golden.

Usage: python scripts/diff_fixture.py <fixture_id> [--html]
"""

from __future__ import annotations

import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

from readability_ex_spark.kernel import parse  # noqa: E402
from readability_ex_spark.kernel import conformance as C  # noqa: E402


def first_diff(a: str, b: str, ctx: int = 90):
    n = min(len(a), len(b))
    i = 0
    while i < n and a[i] == b[i]:
        i += 1
    if i == n and len(a) == len(b):
        return None
    lo = max(0, i - ctx)
    return (
        f"--- diverge at char {i} (mine len {len(a)}, golden len {len(b)})\n"
        f"MINE:   ...{a[lo:i]}[[[{a[i:i+ctx]}]]]\n"
        f"GOLDEN: ...{b[lo:i]}[[[{b[i:i+ctx]}]]]"
    )


def main() -> int:
    fid = sys.argv[1]
    fix = C.load_fixture(fid)
    result = parse(fix["source"], base_uri="http://fakehost/test/")
    checks = C.compare_fixture(result, fix)
    print({k: v for k, v in checks.items()})
    if "--html" in sys.argv:
        d = first_diff(
            C.normalize_html(result["content"]),
            C.normalize_html(fix["expected_html"]),
        )
    else:
        d = first_diff(
            C.normalize_text(C.html_to_compare_text(result["content"])),
            C.normalize_text(C.html_to_compare_text(fix["expected_html"])),
        )
    print(d if d else "no diff")
    for k in ("title", "byline", "lang", "site_name", "published_time", "excerpt"):
        if checks.get(k) is False:
            mk = {"site_name": "siteName", "published_time": "publishedTime"}.get(k, k)
            print(f"{k}: mine={result[k if k != 'site_name' else 'site_name']!r} "
                  f"golden={fix['expected_meta'].get(mk)!r}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
