"""Quantify the substring-dedup detection floor (round-7 verdict #6).

``substring_dedup`` is window-granular: duplicated runs shorter than
``k`` tokens are below the detection floor (the published ExactSubstr
suffix array has no such floor — but uses a 50-token threshold anyway,
so only runs in [k_small, 50) are a real divergence).  This harness
measures the missed mass directly: run the SAME operator at the shipped
k and at smaller reference k values; the extra duplicated-token mass a
smaller k detects is (to edge effects) the mass living in runs of
length [k_small, k_shipped).

Usage: python scripts/measure_substr_floor.py [sf_dir] [k...]
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    ks = [int(x) for x in sys.argv[2:]] or [20, 10, 5]

    from pyspark.sql import functions as F

    from readability_ex_spark.operators.substrdedup import substring_dedup
    from readability_ex_spark.session import get_spark

    spark = get_spark("substr-floor")
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").localCheckpoint()

    out = []
    for k in ks:
        t0 = time.time()
        row = (
            substring_dedup(docs, k=k)
            .agg(
                F.sum("n_tokens").alias("tok"),
                F.sum("n_dup_tokens").alias("dup"),
                F.sum((F.col("n_dup_tokens") > 0).cast("long")).alias(
                    "docs_hit"
                ),
            )
            .collect()[0]
        )
        out.append(
            {
                "k": k,
                "total_tokens": int(row.tok),
                "dup_tokens": int(row.dup),
                "dup_pct": round(100.0 * row.dup / row.tok, 3),
                "docs_hit": int(row.docs_hit),
                "wall_sec": round(time.time() - t0, 2),
            }
        )
        print(json.dumps(out[-1]))

    base = next((r for r in out if r["k"] == max(ks)), out[0])
    for r in out:
        if r["k"] < base["k"]:
            missed = r["dup_tokens"] - base["dup_tokens"]
            print(
                json.dumps(
                    {
                        "floor_vs_k": [r["k"], base["k"]],
                        "missed_dup_tokens": missed,
                        "missed_pct_of_corpus": round(
                            100.0 * missed / base["total_tokens"], 3
                        ),
                        "missed_pct_of_k%d_dup" % base["k"]: round(
                            100.0 * missed / max(base["dup_tokens"], 1), 2
                        ),
                    }
                )
            )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
