"""Emulates the driver's correctness gate: every queries() entry with an
oracle_sql() twin must match DuckDB on row count, column names, and
values (order-insensitive) at sf0.001."""

import math

import duckdb
import pytest

import __spark_entry__ as entry_mod

SF = "/root/testdata/sf0.001"
TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


@pytest.fixture(scope="module")
def ddb():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{SF}/{t}.parquet'"
        )
    return con


def _normalize(rows, cols):
    out = []
    for row in rows:
        vals = []
        for c in cols:
            v = row[c] if not isinstance(row, tuple) else row[cols.index(c)]
            if isinstance(v, float):
                v = round(v, 9)
            vals.append(v)
        out.append(tuple(vals))
    return sorted(out, key=lambda t: tuple(str(x) for x in t))


SQL_QUERIES = sorted(set(entry_mod.queries()) & set(entry_mod.oracle_sql()))


# g_louvain_exact's oracle is a frozen VALUES table generated for the
# driver's correctness scale (sf0.01) — compare it at that scale
_SF01_QUERIES = {"g_louvain_exact"}


@pytest.fixture(scope="module")
def ddb01():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '/root/testdata/sf0.01/{t}.parquet'"
        )
    return con


@pytest.mark.parametrize("name", SQL_QUERIES)
def test_query_matches_duckdb(spark, ddb, ddb01, name):
    q = entry_mod.queries()[name]
    sql = entry_mod.oracle_sql()[name]
    sf = "/root/testdata/sf0.01" if name in _SF01_QUERIES else SF
    sdf = q(spark, sf)
    scols = sorted(sdf.columns)
    srows = [r.asDict() for r in sdf.collect()]
    res = (ddb01 if name in _SF01_QUERIES else ddb).execute(sql)
    dcols = [d[0] for d in res.description]
    drows = res.fetchall()
    assert sorted(dcols) == scols, f"{name}: columns {dcols} vs {scols}"
    assert len(drows) == len(srows), f"{name}: rows {len(drows)} vs {len(srows)}"
    got = _normalize(srows, scols)
    want = _normalize(
        [dict(zip(dcols, r)) for r in drows], scols
    )
    if got != want:
        diffs = [(g, w) for g, w in zip(got, want) if g != w][:5]
        raise AssertionError(f"{name}: value mismatch, first diffs {diffs}")


def test_rows_only_queries_run(spark):
    """Queries without SQL oracles still must run and return rows."""
    qs = entry_mod.queries()
    for name in set(qs) - set(entry_mod.oracle_sql()):
        df = qs[name](spark, SF)
        assert df.count() >= 0, name
        assert len(df.columns) >= 1, name


def test_entry_smoke(spark):
    df = entry_mod.entry(spark)
    assert df.count() > 0
    assert set(df.columns) == {"id", "com", "size"}
