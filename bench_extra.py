"""Per-query isolation bench (guide §1.4): times individual declared
queries with a noop sink, N repeats, labeled jobs — the measurement
harness for the round-8 optimization work.  ``bench.py`` stays frozen
(driver contract); numbers from here are cited in OPTIMIZATION_r08.md.

Usage:
  SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 python bench_extra.py q1 q2 ...
  python bench_extra.py --repeats 3 --all
  python bench_extra.py --explain q1    # capture .explain("formatted")

Prints one JSON line: {"queries": {name: [sec, ...]}, ...}.
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent
sys.path.insert(0, str(REPO))


def _noop(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def main() -> int:
    import argparse

    ap = argparse.ArgumentParser()
    ap.add_argument("names", nargs="*", help="query names (see bench.py)")
    ap.add_argument("--repeats", type=int, default=3)
    ap.add_argument("--all", action="store_true")
    ap.add_argument(
        "--explain",
        action="store_true",
        help="print explain('formatted') instead of timing",
    )
    ap.add_argument(
        "--count",
        action="store_true",
        help="time .count() like bench.py instead of the noop sink",
    )
    args = ap.parse_args()
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    from readability_ex_spark.session import get_spark

    spark = get_spark(
        "bench_extra",
        extra_conf={"spark.sql.execution.arrow.maxRecordsPerBatch": "512"},
    )

    import __spark_entry__ as entry

    registry = entry.queries()

    # non-contract bench entries (build/probe splits, update paths) are
    # reachable through bench.py only; here we expose the contract
    # queries plus the extraction pipeline
    def _extract(spark, sf_dir):
        from readability_ex_spark.pipeline import run_extraction
        from readability_ex_spark.sources.pages import synthesize_pages

        return run_extraction(synthesize_pages(spark, sf_dir))

    registry = dict(registry)
    registry["extract_pipeline"] = _extract

    names = list(registry) if args.all else args.names
    unknown = [n for n in names if n not in registry]
    if unknown:
        print(f"unknown queries: {unknown}", file=sys.stderr)
        return 2

    # warm the python workers (bench.py does the same)
    _noop(_extract(spark, sf_dir).limit(64))

    if args.explain:
        for n in names:
            df = registry[n](spark, sf_dir)
            print(f"===== {n} =====")
            print(df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"
            ))
        return 0

    timings: dict[str, list[float]] = {}
    for n in names:
        samples = []
        for _ in range(args.repeats):
            spark.sparkContext.setJobDescription(f"bench_extra:{n}")
            t0 = time.perf_counter()
            df = registry[n](spark, sf_dir)
            if args.count:
                df.count()
            else:
                _noop(df)
            samples.append(round(time.perf_counter() - t0, 3))
            spark.sparkContext.setJobDescription(None)
        timings[n] = samples

    print(
        json.dumps(
            {
                "queries": timings,
                "sf": sf_dir,
                "cores": os.environ.get("SPARK_GRAFT_CPUS", "*"),
                "loadavg": list(
                    map(float, Path("/proc/loadavg").read_text().split()[:3])
                ),
            }
        )
    )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
