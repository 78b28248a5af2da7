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
    # staleness cap: any entry absent from the last two committed
    # rounds' windows must sit inside the NEXT window (first 50
    # positions), so nothing can go three rounds driver-unchecked.
    # (With 102 entries and a 50-slot window, two-round absences are
    # arithmetically unavoidable for up to 2 entries; the rotation must
    # guarantee they lead the next round.)
    if last:
        max_rnd = max(last.values())
        stale = [
            n for n in names if last.get(n, -1) < max_rnd - 1
        ]
        assert all(names.index(n) < 50 for n in stale), (
            f"entries stale beyond the next driver window: "
            f"{[n for n in stale if names.index(n) >= 50]}"
        )


def test_all_queries_emit_scalar_columns_only(spark):
    """The driver's canonicalizer sorts result rows with pandas, which
    cannot hash list/dict cells — an array/map/struct output column
    turns a correct query into a red CORRECTNESS row (extract_outlinks,
    round 6).  Pin the invariant: every queries() entry's output schema
    is scalar-only."""
    from pyspark.sql.types import ArrayType, MapType, StructType

    bad = []
    for name, fn in E.queries().items():
        df = fn(spark, SF)
        for f in df.schema.fields:
            if isinstance(f.dataType, (ArrayType, MapType, StructType)):
                bad.append(f"{name}.{f.name}: {f.dataType.simpleString()}")
    assert not bad, f"non-scalar contract columns: {bad}"
