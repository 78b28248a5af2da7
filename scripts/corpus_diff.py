"""Version-to-version corpus audit: what changed between two corpus
directories (a snapshot and its updated or rebuilt successor).

    spark-submit --py-files readability_ex_spark.zip scripts/corpus_diff.py \
        --old /corpora/v1 --new /corpora/v2

Prints ONE JSON line: doc/token totals per side, added/removed url
counts with a few example urls, per-language doc/token/mean-quality
deltas, and the sidecar-manifest diff.  The audit an operator reads
before promoting an incremental update — did the batch add what it
claimed, did any language's share lurch, did a sidecar vanish.

Scale: the added/removed sets are LEFT ANTI joins over column-pruned
url-only scans (the text column is never read); the per-language
rollup is one small hash agg per side.  Driver memory is bounded by
#languages + #artifacts + the example-url sample — never by corpus
size.
"""
from __future__ import annotations

import argparse
import json
import sys
from pathlib import Path

_REPO = Path(__file__).resolve().parent.parent
if str(_REPO) not in sys.path:
    sys.path.insert(0, str(_REPO))


def _lang_rollup(df):
    from pyspark.sql import functions as F

    rows = (
        df.groupBy("lang")
        .agg(
            F.count("*").alias("docs"),
            F.sum("n_tokens").alias("tokens"),
            F.round(F.avg("quality_score"), 6).alias("mean_quality"),
        )
        .collect()
    )
    return {
        (r.lang or ""): {
            "docs": r.docs,
            "tokens": int(r.tokens or 0),
            "mean_quality": r.mean_quality,
        }
        for r in rows
    }


def _artifacts(path: str) -> list[str]:
    p = Path(path) / "_sidecars.json"
    if not p.exists():
        return []
    try:
        return sorted(json.loads(p.read_text()).get("artifacts", []))
    except ValueError:
        return []


def main() -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--old", required=True, help="baseline corpus dir")
    ap.add_argument("--new", required=True, help="successor corpus dir")
    ap.add_argument(
        "--examples", type=int, default=5,
        help="max example urls listed per added/removed set",
    )
    args = ap.parse_args()

    from pyspark.sql import SparkSession

    spark = SparkSession.builder.appName("corpus_diff").getOrCreate()
    old = spark.read.parquet(args.old)
    new = spark.read.parquet(args.new)

    old_urls = old.select("url")
    new_urls = new.select("url")
    added = new_urls.join(old_urls, "url", "left_anti").cache()
    removed = old_urls.join(new_urls, "url", "left_anti").cache()

    old_langs = _lang_rollup(old)
    new_langs = _lang_rollup(new)
    langs = {}
    for lang in sorted(set(old_langs) | set(new_langs)):
        o = old_langs.get(lang, {"docs": 0, "tokens": 0, "mean_quality": None})
        n = new_langs.get(lang, {"docs": 0, "tokens": 0, "mean_quality": None})
        langs[lang] = {
            "old": o,
            "new": n,
            "delta_docs": n["docs"] - o["docs"],
            "delta_tokens": n["tokens"] - o["tokens"],
        }

    old_arts, new_arts = _artifacts(args.old), _artifacts(args.new)

    # when BOTH sides carry the _checksums sidecar, name the storage
    # buckets whose content XOR moved — the "which shards changed"
    # signal that narrows a promotion review from the whole corpus to
    # a handful of partitions
    changed_buckets = None
    old_ck = Path(args.old) / "_checksums"
    new_ck = Path(args.new) / "_checksums"
    # checksums are only comparable under ONE hash rule (see
    # textops.CONTENT_HASH_RULE): mixed-rule sides would report every
    # NULL-text-bearing bucket as phantom drift — skip the bucket diff
    # and surface the mismatch instead
    from readability_ex_spark.sidecars import read_sidecar_params

    old_rule = read_sidecar_params(args.old).get("checksum_rule")
    new_rule = read_sidecar_params(args.new).get("checksum_rule")
    checksum_rules = {"old": old_rule, "new": new_rule}
    if old_ck.exists() and new_ck.exists() and old_rule != new_rule:
        changed_buckets = "incomparable: sides use different checksum rules"
    elif old_ck.exists() and new_ck.exists():
        o = {
            r.url_bucket: (r.n_docs, r.content_xor)
            for r in spark.read.parquet(str(old_ck)).collect()
        }
        n = {
            r.url_bucket: (r.n_docs, r.content_xor)
            for r in spark.read.parquet(str(new_ck)).collect()
        }
        changed_buckets = sorted(
            b for b in set(o) | set(n) if o.get(b) != n.get(b)
        )

    report = {
        "old": {"path": args.old, "docs": old.count()},
        "new": {"path": args.new, "docs": new.count()},
        "added_docs": added.count(),
        "removed_docs": removed.count(),
        "added_examples": sorted(
            r.url for r in added.orderBy("url").take(args.examples)
        ),
        "removed_examples": sorted(
            r.url for r in removed.orderBy("url").take(args.examples)
        ),
        "languages": langs,
        "artifacts_added": sorted(set(new_arts) - set(old_arts)),
        "artifacts_removed": sorted(set(old_arts) - set(new_arts)),
        "changed_buckets": changed_buckets,
        "checksum_rules": checksum_rules,
    }
    print(json.dumps(report, sort_keys=True))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
