#!/usr/bin/env python
"""Self-run of the round driver's correctness gate at sf0.01: every
__spark_entry__.queries() entry vs its oracle_sql() in DuckDB, columns
sorted by name, rows sorted, floats rounded to 7 digits — the same compare
tests/test_entry.py mirrors at sf0.001.

Usage: python bench/driver_check.py [sf_dir]   (default /root/testdata/sf0.01)
Prints one line per query and a FAIL summary; exit code 1 on any mismatch.
"""

from __future__ import annotations

import datetime
import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb  # noqa: E402

import __spark_entry__ as entrymod  # noqa: E402
from deusu_spark.session import get_spark  # noqa: E402

TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings"
).split()


def _norm(v):
    if isinstance(v, float):
        return round(v, 7)
    if isinstance(v, datetime.datetime):
        return v.replace(tzinfo=None).isoformat()
    return v


def _rows(recs, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted(
        [tuple(_norm(r[i]) for i in order) for r in recs], key=repr
    )


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


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    spark = get_spark(app="driver-check")
    spark.sparkContext.setLogLevel("ERROR")
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    fails = []
    for name in sorted(qs):
        t0 = time.time()
        try:
            sdf = qs[name](spark, sf_dir)
            srows = _rows([tuple(r) for r in sdf.collect()], sdf.columns)
            sql = oracles.get(name)
            if sql is None:
                print(f"{name}: rows_only n={len(srows)} "
                      f"({time.time() - t0:.1f}s)")
                continue
            res = con.execute(sql)
            dcols = [d[0] for d in res.description]
            drows = _rows(res.fetchall(), dcols)
            ok_cols = sorted(sdf.columns) == sorted(dcols)
            ok = ok_cols and _eq(srows, drows)
        except Exception as exc:  # noqa: BLE001 - report, keep checking
            fails.append(name)
            print(f"{name}: ERROR {exc}")
            continue
        status = "ok" if ok else "FAIL"
        if not ok:
            fails.append(name)
        print(f"{name}: {status} n={len(srows)} ({time.time() - t0:.1f}s)")
        if not ok:
            if not ok_cols:
                print(f"  cols: {sorted(sdf.columns)} vs {sorted(dcols)}")
            else:
                print(f"  spark({len(srows)}): {srows[:3]}")
                print(f"  duck ({len(drows)}): {drows[:3]}")
    print(f"\n{len(qs) - len(fails)}/{len(qs)} ok; fails: {fails}")
    return 1 if fails else 0


if __name__ == "__main__":
    raise SystemExit(main())
