"""Run the Mozilla fixture corpus through the kernel; report match rates.

Usage: python scripts/run_fixtures.py [fixture_id ...]
       python scripts/run_fixtures.py --failing   (list failing ids only)
"""

from __future__ import annotations

import sys
import traceback
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

from readability_ex_spark.kernel import parse  # noqa: E402
from readability_ex_spark.kernel import conformance as C  # noqa: E402


def main() -> int:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    flags = {a for a in sys.argv[1:] if a.startswith("--")}
    ids = args or C.fixture_ids()

    field_pass: dict[str, int] = {}
    field_total: dict[str, int] = {}
    all_pass = 0
    errors = 0
    failing = []
    for fid in ids:
        fix = C.load_fixture(fid)
        try:
            result = parse(fix["source"], base_uri="http://fakehost/test/")
        except Exception as exc:  # noqa: BLE001
            errors += 1
            failing.append(fid)
            print(f"ERROR {fid}: {type(exc).__name__}: {exc}")
            if "--trace" in flags:
                traceback.print_exc()
            continue
        checks = C.compare_fixture(result, fix)
        for k, ok in checks.items():
            field_total[k] = field_total.get(k, 0) + 1
            if ok:
                field_pass[k] = field_pass.get(k, 0) + 1
        if all(v for k, v in checks.items() if k != "html_strict"):
            all_pass += 1
        else:
            failing.append(fid)
            if "--failing" not in flags:
                bad = [k for k, ok in checks.items()
                       if not ok and k != "html_strict"]
                print(f"FAIL  {fid}: {' '.join(bad)}")

    n = len(ids)
    print(f"\n== {all_pass}/{n} fixtures fully pass ({errors} errors) ==")
    for k in sorted(field_total):
        print(f"  {k:15s} {field_pass.get(k, 0):4d}/{field_total[k]}")
    if "--failing" in flags:
        print(" ".join(failing))
    # non-zero exit when any fixture regresses or errors, so CI/scripts
    # gating on the exit code catch it (html_strict excluded as the
    # documented beautified-goldens comparator gap)
    return 0 if (all_pass == n and errors == 0) else 1


if __name__ == "__main__":
    raise SystemExit(main())
