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
sys.path.insert(0, sys.argv[3])
from readability_ex_spark.session import get_spark
from readability_ex_spark.pipeline import run_extraction
from readability_ex_spark.sources.pages import synthesize_pages

cores = int(sys.argv[1])
sf_dir = sys.argv[2]
replicate = int(sys.argv[4])
# Arrow batches sized for the synthetic ~3 KB pages (~1.5 MB/batch —
# the same byte target the 64-row production default hits on ~100 KB
# crawl pages)
spark = get_spark(
    "bench_scaling", cores=cores, shuffle_partitions=cores,
    extra_conf={"spark.sql.execution.arrow.maxRecordsPerBatch": "512"},
)
import pyspark.sql.functions as F
pages = synthesize_pages(spark, sf_dir)
# replicate the corpus so per-task work dominates fixed overheads, the
# way it does on a real crawl (urls suffixed to stay unique)
big = pages.crossJoin(
    spark.range(replicate).select(F.col("id").alias("rep"))
).withColumn("url", F.concat("url", F.lit("#"), F.col("rep"))).drop("rep")
big = big.cache()
big.count()
# warm-up: spawn the python workers before the measured run
run_extraction(big.limit(cores * 8), dedup=False, n_partitions=cores).count()
best = None
n = 0
for _ in range(2):
    t0 = time.perf_counter()
    n = run_extraction(big, dedup=False, n_partitions=cores * 2).count()
    sec = time.perf_counter() - t0
    best = sec if best is None else min(best, sec)
print("RESULT " + json.dumps({"cores": cores, "rows": n, "sec": best,
                              "docs_per_sec": n / best}))
"""


def run_at(cores: int, sf_dir: str, replicate: int = 8) -> dict:
    env = dict(os.environ)
    env.pop("SPARK_GRAFT_CPUS", None)
    proc = subprocess.run(
        [sys.executable, "-c", _CHILD, str(cores), sf_dir, str(REPO),
         str(replicate)],
        capture_output=True, text=True, timeout=3600, env=env,
    )
    for line in proc.stdout.splitlines():
        if line.startswith("RESULT "):
            return json.loads(line[len("RESULT "):])
    raise RuntimeError(
        f"child at {cores} cores produced no RESULT:\n{proc.stdout[-2000:]}"
        f"\n{proc.stderr[-2000:]}"
    )


def _pure_python_control(procs: int) -> float:
    """Hardware ceiling control: CPU-bound multiprocessing, no Spark.
    Returns seconds for a fixed work quantum."""
    import multiprocessing as mp
    import time

    t0 = time.perf_counter()
    with mp.Pool(procs) as p:
        p.map(_burn, [1_000_000] * 256, chunksize=4)
    return time.perf_counter() - t0


def _burn(n: int) -> int:
    s = 0
    for i in range(n):
        s += i * i
    return s


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"
    )
    replicate = int(os.environ.get("BENCH_REPLICATE", "8"))
    out = {"sf": sf_dir, "target": ">= 0.8"}
    # two N-vs-4N pairs: (2,8) stays within physical cores; (8,32) spans
    # the SMT region of the 32-vCPU sandbox — report the hardware control
    # alongside so the pipeline's share of any loss is visible
    for n, n4 in ((2, 8), (8, 32)):
        low = run_at(n, sf_dir, replicate)
        high = run_at(n4, sf_dir, replicate)
        eff = high["docs_per_sec"] / (4 * low["docs_per_sec"])
        ctl = _pure_python_control(n) / _pure_python_control(n4) / 4
        out[f"local{n}_docs_per_sec"] = round(low["docs_per_sec"], 2)
        out[f"local{n4}_docs_per_sec"] = round(high["docs_per_sec"], 2)
        out[f"eff_{n}_to_{n4}"] = round(eff, 3)
        out[f"hw_control_eff_{n}_to_{n4}"] = round(ctl, 3)
        out["rows"] = high["rows"]
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
