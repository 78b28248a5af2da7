#!/usr/bin/env python
"""Single-document extraction CLI — the counterpart of the reference's
scripts/readability_url.sh (fetch + parse one url), without the network
step (this sandbox has none): html comes from a file or stdin.

    python scripts/extract_url.py page.html --url https://example.com/a
    curl -fsSL https://example.com/a | python scripts/extract_url.py - \
        --url https://example.com/a

Prints the parse result as JSON on stdout (--content-only prints just
the article HTML, matching the reference script's output); exits 1 when
the page is not readable, 2 on usage errors.
"""

from __future__ import annotations

import argparse
import json
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
if str(REPO) not in sys.path:
    sys.path.insert(0, str(REPO))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("input", help="html file path, or '-' for stdin")
    ap.add_argument("--url", default=None, help="base URI of the page")
    ap.add_argument(
        "--content-only", action="store_true",
        help="print only the article HTML (reference script behavior)",
    )
    args = ap.parse_args()

    if args.input == "-":
        raw = sys.stdin.buffer.read()
    else:
        raw = Path(args.input).read_bytes()

    from readability_ex_spark.kernel.api import parse
    from readability_ex_spark.kernel.encoding import decode_html

    result = parse(decode_html(raw), base_uri=args.url)
    if result is None or not result.get("content"):
        print("not readable", file=sys.stderr)
        return 1
    if args.content_only:
        sys.stdout.write(result["content"] or "")
        return 0
    out = {
        k: result.get(k)
        for k in (
            "title", "byline", "lang", "dir", "site_name", "published_time",
            "excerpt", "content", "text_content", "length",
        )
    }
    json.dump(out, sys.stdout, ensure_ascii=False)
    sys.stdout.write("\n")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
