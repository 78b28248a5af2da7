"""Driver-style parity check: run each __spark_entry__.queries() entry and
its oracle_sql() through DuckDB on the same parquet, compare row count,
column names, and an order-insensitive value hash.

Usage: python scripts/check_parity.py [sf_dir] [query ...]
"""

from __future__ import annotations

import hashlib
import sys
from pathlib import Path

import duckdb
import pandas as pd

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def value_hash(df: pd.DataFrame) -> str:
    """Order-insensitive hash: sort columns by name, stringify every cell
    (floats via repr of rounded value), sort rows, sha256."""
    df = df[sorted(df.columns)]

    def cell(v):
        if isinstance(v, float):
            return f"{v:.6f}"
        if isinstance(v, (list, tuple)) or type(v).__name__ == "ndarray":
            return "[" + ",".join(cell(x) for x in v) + "]"
        if v is None or v != v:  # NaN/None
            return "<null>"
        return str(v)

    rows = sorted(
        "\x1f".join(cell(v) for v in row) for row in df.itertuples(index=False)
    )
    return hashlib.sha256("\x1e".join(rows).encode()).hexdigest()


def main() -> int:
    import __spark_entry__ as E
    from readability_ex_spark.session import get_spark

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    only = set(sys.argv[2:])

    spark = get_spark("parity_check")
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if Path(p).exists():
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")

    qs, oracles = E.queries(), E.oracle_sql()
    failures = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        try:
            sdf = fn(spark, sf_dir)
            spd = sdf.toPandas()
        except Exception as exc:  # noqa: BLE001
            failures.append(name)
            print(f"FAIL  {name}: spark error: {exc}")
            continue
        if name not in oracles:
            print(f"rows  {name}: {len(spd)} rows (no oracle — rows-only)")
            continue
        try:
            opd = con.execute(oracles[name]).df()
        except Exception as exc:  # noqa: BLE001
            failures.append(name)
            print(f"FAIL  {name}: duckdb error: {exc}")
            continue
        problems = []
        if len(spd) != len(opd):
            problems.append(f"rows {len(spd)} != {len(opd)}")
        if sorted(spd.columns) != sorted(opd.columns):
            problems.append(f"cols {sorted(spd.columns)} != {sorted(opd.columns)}")
        elif value_hash(spd) != value_hash(opd):
            problems.append("value-hash mismatch")
        if problems:
            failures.append(name)
            print(f"FAIL  {name}: {'; '.join(problems)}")
            if "value-hash mismatch" in problems and len(spd) == len(opd):
                s = spd[sorted(spd.columns)].astype(str).sort_values(
                    by=sorted(spd.columns)).reset_index(drop=True)
                o = opd[sorted(opd.columns)].astype(str).sort_values(
                    by=sorted(opd.columns)).reset_index(drop=True)
                diff = (s != o).any(axis=1)
                print("  spark:\n", s[diff].head(3).to_string())
                print("  oracle:\n", o[diff].head(3).to_string())
        else:
            print(f"OK    {name}: {len(spd)} rows")
    print(f"\n{len(failures)} failures" if failures else "\nall OK")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
