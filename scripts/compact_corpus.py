"""Compact a corpus directory's small files in place.

    spark-submit --py-files readability_ex_spark.zip scripts/compact_corpus.py \
        --corpus /corpora/v2 [--files-per-bucket 1] [--verify-checksums]

Every ``--update`` append adds another file set per ``url_bucket``
partition; after many increments a bucket holds dozens of KB-files and
the read path pays open/seek per file (at crawl scale: the classic
small-file problem — task scheduling and NameNode/listing overhead
dominate the scan). Compaction rewrites the data clustered by bucket —
``files-per-bucket`` output files each — WITHOUT changing a single row:

1. read the corpus, repartition by (url_bucket [, file slice]) so each
   output partition directory receives exactly the target file count;
2. write to a staging directory NEXT to the corpus (same filesystem,
   so the swap below is a metadata rename, not a copy — note: on
   object stores without atomic rename, run with a fresh --output-style
   path and flip the table pointer instead);
3. guard: the staged row count must equal the original's BEFORE the
   original is touched (a concurrent append aborts the swap cleanly);
4. swap: sidecar directories (``_manifest``, ``_bands``, ...) are
   COPIED over unchanged — they describe corpus CONTENT, which
   compaction preserves — then the old directory is replaced by the
   staged one; the original survives at ``.precompact`` until the
   post-swap recount passes.

``--verify-checksums`` recomputes the order-independent per-bucket
content checksums (``textops.corpus_checksums``) over the compacted
data and compares them against the ``_checksums`` sidecar before the
swap — the checksums are BIT_XOR aggregates, so file layout cannot
change them; a mismatch means rows were lost/duplicated and ABORTS the
swap. This is exactly why the checksum design is order-independent.

Prints ONE JSON line: files/rows before and after, per-bucket max file
count, checksum verdict.
"""
from __future__ import annotations

import argparse
import json
import shutil
import sys
from pathlib import Path

_REPO = Path(__file__).resolve().parent.parent
if str(_REPO) not in sys.path:
    sys.path.insert(0, str(_REPO))


def _data_files(root: Path) -> list[Path]:
    return [
        p
        for p in root.rglob("*.parquet")
        if not any(part.startswith("_") for part in p.relative_to(root).parts)
    ]


def _max_files_per_bucket(root: Path) -> int:
    counts = {}
    for p in _data_files(root):
        counts[p.parent] = counts.get(p.parent, 0) + 1
    return max(counts.values(), default=0)


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--corpus", required=True)
    ap.add_argument(
        "--files-per-bucket", type=int, default=1,
        help="output files per url_bucket partition (default 1)",
    )
    ap.add_argument(
        "--verify-checksums", action="store_true",
        help="recompute per-bucket content checksums over the staged "
        "rewrite and compare with the _checksums sidecar; mismatch "
        "aborts the swap",
    )
    args = ap.parse_args()
    if args.files_per_bucket < 1:
        ap.error("--files-per-bucket must be >= 1")

    from pyspark.sql import functions as F

    from readability_ex_spark.session import get_spark

    spark = get_spark("compact_corpus")
    root = Path(args.corpus)
    files_before = _data_files(root)
    max_before = _max_files_per_bucket(root)
    rows_before = spark.read.parquet(args.corpus).count()

    staging = root.with_name(root.name + ".compacting")
    shutil.rmtree(staging, ignore_errors=True)
    df = spark.read.parquet(args.corpus)
    if args.files_per_bucket == 1:
        part_cols = [F.col("url_bucket")]
    else:
        # slice each bucket into N stable sub-streams so partitionBy
        # emits N files per bucket directory
        part_cols = [
            F.col("url_bucket"),
            F.pmod(F.xxhash64("url"), F.lit(args.files_per_bucket)),
        ]
    from readability_ex_spark.sinks import with_url_bloom

    # compaction re-establishes the url bloom filters on the rewritten
    # files (see sinks.URL_BLOOM_OPTIONS — the hash-bucket layout makes
    # them the only row-group pruner for url point lookups)
    with_url_bloom(df.repartition(*part_cols).write).partitionBy(
        "url_bucket"
    ).parquet(str(staging))

    checksums = None
    if args.verify_checksums:
        from readability_ex_spark.operators.textops import (
            CONTENT_HASH_RULE,
            corpus_checksums,
        )
        from readability_ex_spark.sidecars import read_sidecar_params

        side = root / "_checksums"
        if not side.exists():
            raise SystemExit(
                "--verify-checksums: corpus has no _checksums sidecar "
                "(build with prepare_corpus.py --checksums)"
            )
        stored_rule = read_sidecar_params(args.corpus).get("checksum_rule")
        if stored_rule != CONTENT_HASH_RULE:
            # comparing across hash rules (or against a sidecar written
            # before rules were pinned) would report phantom drift on an
            # intact corpus — refuse with the remedy instead
            shutil.rmtree(staging, ignore_errors=True)
            raise SystemExit(
                "--verify-checksums: the _checksums sidecar was written "
                f"under content-hash rule {stored_rule!r}, this code "
                f"verifies rule {CONTENT_HASH_RULE} — rebuild the "
                "sidecar first (prepare_corpus.py --checksums on an "
                "unchanged corpus, or an --update run)"
            )
        stored = {
            r.url_bucket: (r.n_docs, r.content_xor)
            for r in spark.read.parquet(str(side)).collect()
        }
        fresh = {
            r.bucket: (r.n_docs, r.content_xor)
            for r in corpus_checksums(
                spark.read.parquet(str(staging)),
                id_col="url",
                text_col="text",
                bucket_expr=F.col("url_bucket"),
            ).collect()
        }
        checksums = "match" if stored == fresh else "MISMATCH"
        if checksums == "MISMATCH":
            shutil.rmtree(staging, ignore_errors=True)
            print(json.dumps({"error": "checksum mismatch — swap aborted"}))
            return 1

    # row-count guard BEFORE anything touches the original: a staged
    # rewrite that lost/duplicated rows (e.g. a concurrent --update
    # between the rows_before count and the staging read) aborts while
    # the corpus is still fully intact
    rows_staged = spark.read.parquet(str(staging)).count()
    if rows_staged != rows_before:
        shutil.rmtree(staging, ignore_errors=True)
        print(
            json.dumps(
                {
                    "error": "row count changed in staged rewrite — "
                    f"swap aborted: {rows_before} -> {rows_staged}"
                }
            )
        )
        return 1

    # swap: sidecars describe content, which is unchanged — COPY them
    # into staging (not move), so the original directory stays complete
    # until the rename pair below; the only crash window is between the
    # two renames, where the full original survives at .precompact
    for side in sorted(root.iterdir()):
        if side.name.startswith("_"):
            if side.is_dir():
                shutil.copytree(str(side), str(staging / side.name))
            else:
                shutil.copy2(str(side), str(staging / side.name))
    old = root.with_name(root.name + ".precompact")
    shutil.rmtree(old, ignore_errors=True)
    root.rename(old)
    staging.rename(root)

    rows_after = spark.read.parquet(args.corpus).count()
    if rows_after != rows_before:
        # keep the .precompact copy for recovery
        raise SystemExit(
            f"row count changed across compaction: {rows_before} -> "
            f"{rows_after} (original kept at {old})"
        )
    shutil.rmtree(old, ignore_errors=True)
    print(
        json.dumps(
            {
                "files_before": len(files_before),
                "files_after": len(_data_files(root)),
                "max_files_per_bucket_before": max_before,
                "max_files_per_bucket_after": _max_files_per_bucket(root),
                "rows": rows_after,
                "checksums": checksums,
            }
        )
    )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
