"""Two-parallelism scaling evidence (sandbox proxy for N vs 4N executors).

Runs the extraction pipeline at local[8] and local[32] in separate
subprocesses (a JVM can't change master in-process) on the same input,
reports throughput at both plus scaling efficiency
  eff = throughput(32) / (4 * throughput(8))
per the driver instruction / BASELINE.json north rule. Writes
BENCH/BASELINE.md-ready JSON to stdout.

Usage: python scripts/bench_scaling.py [sf_dir]
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent

_CHILD = r"""
import json, sys, time
sys.path.insert(0, {repo!r})
from readability_ex_spark.session import get_spark
from readability_ex_spark.pipeline import run_extraction
from readability_ex_spark.sources.pages import synthesize_pages

cores = int(sys.argv[1])
sf_dir = sys.argv[2]
spark = get_spark("bench_scaling", cores=cores, shuffle_partitions=cores)
pages = synthesize_pages(spark, sf_dir)
# warm the input scan so parquet read doesn't skew the first measure
pages.count()
t0 = time.perf_counter()
n = run_extraction(pages, n_partitions=cores * 2).count()
sec = time.perf_counter() - t0
print("RESULT " + json.dumps({"cores": cores, "rows": n, "sec": sec,
                              "docs_per_sec": n / sec}))
"""


def run_at(cores: int, sf_dir: str) -> dict:
    env = dict(os.environ)
    env.pop("SPARK_GRAFT_CPUS", None)
    proc = subprocess.run(
        [sys.executable, "-c", _CHILD.format(repo=str(REPO)), str(cores), sf_dir],
        capture_output=True, text=True, timeout=3600, env=env,
    )
    for line in proc.stdout.splitlines():
        if line.startswith("RESULT "):
            return json.loads(line[len("RESULT "):])
    raise RuntimeError(
        f"child at {cores} cores produced no RESULT:\n{proc.stdout[-2000:]}"
        f"\n{proc.stderr[-2000:]}"
    )


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"
    )
    low = run_at(8, sf_dir)
    high = run_at(32, sf_dir)
    eff = high["docs_per_sec"] / (4 * low["docs_per_sec"])
    print(json.dumps({
        "sf": sf_dir,
        "local8_docs_per_sec": round(low["docs_per_sec"], 2),
        "local32_docs_per_sec": round(high["docs_per_sec"], 2),
        "local8_sec": round(low["sec"], 2),
        "local32_sec": round(high["sec"], 2),
        "rows": high["rows"],
        "scaling_efficiency": round(eff, 3),
        "target": ">= 0.8",
    }))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
