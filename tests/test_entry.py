"""Local mirror of the driver's correctness gate: run every queries() entry
on sf0.001 and compare against its oracle_sql() via DuckDB (schema-agnostic:
columns sorted by name, rows sorted, values compared with tiny float
tolerance)."""

import datetime
import math
import sys

import duckdb
import pytest

sys.path.insert(0, "/root/repo")
import __spark_entry__ as entrymod  # noqa: E402

SF_DIR = "/root/testdata/sf0.001"
TABLES = [
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
]


@pytest.fixture(scope="module")
def ddb():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'"
        )
    return con


def _norm(v):
    if isinstance(v, float):
        return round(v, 7)
    if isinstance(v, datetime.datetime):
        return v.replace(tzinfo=None).isoformat()
    return v


def _rows(recs, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(_norm(r[i]) for i in order) for r in recs]
    return sorted(out, key=repr)


def _eq(a, b):
    if len(a) != len(b):
        return False
    for ra, rb in zip(a, b):
        if len(ra) != len(rb):
            return False
        for va, vb in zip(ra, rb):
            if isinstance(va, float) and isinstance(vb, float):
                if not math.isclose(va, vb, rel_tol=1e-6, abs_tol=1e-6):
                    return False
            elif va != vb:
                return False
    return True


@pytest.mark.parametrize("name", sorted(entrymod.queries()))
def test_query_vs_oracle(spark, ddb, name):
    q = entrymod.queries()[name]
    sql = entrymod.oracle_sql().get(name)
    sdf = q(spark, SF_DIR)
    spark_rows = _rows([tuple(r) for r in sdf.collect()], sdf.columns)
    if sql is None:
        assert spark_rows is not None  # rows-only check
        return
    res = ddb.execute(sql)
    cols = [d[0] for d in res.description]
    duck_rows = _rows(res.fetchall(), cols)
    assert sorted(sdf.columns) == sorted(cols), (
        f"{name}: column names differ: {sorted(sdf.columns)} vs {sorted(cols)}"
    )
    assert _eq(spark_rows, duck_rows), (
        f"{name}: rows differ\nspark({len(spark_rows)}): {spark_rows[:5]}\n"
        f"duck({len(duck_rows)}): {duck_rows[:5]}"
    )


def test_entry_smoke(spark):
    df = entrymod.entry(spark)
    rows = df.collect()
    assert len(rows) >= 0 and df.columns
