"""Driver-contract parity: every queries() entry with an oracle must
match DuckDB on row count, column names, and order-insensitive value
hash at sf0.001 (the driver runs the same comparison at sf0.01)."""

from __future__ import annotations

from pathlib import Path

import duckdb
import pytest

import __spark_entry__ as E
from scripts.check_parity import TABLES, value_hash

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    for t in TABLES:
        p = f"{SF}/{t}.parquet"
        if Path(p).exists():
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    yield con


@pytest.mark.parametrize("name", sorted(E.queries()))
def test_query_parity(name, spark, duck):
    fn = E.queries()[name]
    spd = fn(spark, SF).toPandas()
    oracle = E.oracle_sql().get(name)
    if oracle is None:
        assert len(spd) >= 0  # rows-only contract
        return
    opd = duck.execute(oracle).df()
    assert len(spd) == len(opd)
    assert sorted(spd.columns) == sorted(opd.columns)
    assert value_hash(spd) == value_hash(opd)


def test_entry_smoke(spark):
    df = E.entry(spark)
    assert {"url", "status", "text"}.issubset({f.name for f in df.schema.fields})
    assert df.count() > 0


def test_window_rotation_orders_stalest_first():
    """queries() must order never/least-recently-driver-checked entries
    before recently-checked ones (the 50-entry driver window rotates by
    construction), deterministically."""
    import json
    import re

    names = list(E.queries())
    assert names == list(E.queries())  # deterministic
    last = {}
    repo = Path(E.__file__).resolve().parent
    for p in repo.glob("CORRECTNESS_r*.json"):
        rnd = int(re.search(r"r(\d+)", p.name).group(1))
        for n in json.loads(p.read_text()):
            last[n] = max(last.get(n, -1), rnd)
    ranks = [last.get(n, -1) for n in names]
    assert ranks == sorted(ranks)  # non-decreasing staleness rank
    # every entry the driver has never checked sits inside the window
    never = [n for n in names if last.get(n, -1) == -1]
    if len(never) <= 50:
        assert all(names.index(n) < 50 for n in never)
