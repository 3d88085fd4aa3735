"""Local replica of the driver's correctness gate: run each queries() entry
on Spark and its oracle_sql() on DuckDB at sf0.01, compare row count, column
names, and order-insensitive values."""

from __future__ import annotations

import math

import duckdb
import pytest

import __spark_entry__ as entrymod

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


@pytest.fixture(scope="module")
def ddb(sf01):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf01}/{t}.parquet'")
    return con


def _norm(rows, cols):
    out = []
    for r in rows:
        vals = []
        for c in cols:
            v = r[c] if not isinstance(r, (tuple, list)) else r[cols.index(c)]
            if isinstance(v, float):
                # pandas renders nullable ints as float64 (NaN for NULL) —
                # canonicalize so 131.0 == 131 and NaN == None
                if math.isnan(v):
                    v = None
                else:
                    v = round(v, 6)
                    if v == int(v):
                        v = int(v)
            vals.append(v)
        out.append(tuple(vals))
    return sorted(out, key=repr)


@pytest.mark.parametrize("name", sorted(entrymod.queries()))
def test_query_matches_oracle(spark, sf01, ddb, name):
    q = entrymod.queries()[name]
    sql = entrymod.oracle_sql().get(name)
    sdf = q(spark, sf01)
    scols = sdf.columns
    srows = [r.asDict() for r in sdf.collect()]
    if sql is None:
        assert len(srows) >= 0  # rows-only check
        return
    ddf = ddb.execute(sql).fetchdf()
    dcols = list(ddf.columns)
    assert sorted(scols) == sorted(dcols), f"{name}: columns {scols} vs {dcols}"
    drows = ddf.to_dict("records")
    assert len(srows) == len(drows), f"{name}: {len(srows)} vs {len(drows)} rows"
    got = _norm(srows, sorted(scols))
    want = _norm(drows, sorted(scols))
    mism = [(g, w) for g, w in zip(got, want) if g != w]
    assert not mism, f"{name}: first mismatches {mism[:3]}"


def test_entry_smoke(spark):
    df = entrymod.entry(spark)
    rows = df.collect()
    assert len(rows) >= 0
    assert df.columns == ["doc_id", "score"]
