#!/usr/bin/env python3
"""Local replica of the driver's t2 correctness gate.

Usage: python3 tools/check.py [sfdir] [outdir]

Reads the parquet dumps written by `sbt "runMain graft.Verify <sfdir> <outdir>"`
plus outdir/oracle_sql.json, runs each oracle in DuckDB with the testdata
tables registered as views, and compares row counts, schemas (loosely) and
values (exact for non-floats, 1e-9-relative for floats).
Dev tool only — the product library never depends on Python.
"""
import json
import math
import sys

import duckdb

SF = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
OUT = sys.argv[2] if len(sys.argv) > 2 else "/tmp/verify_out"

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

con = duckdb.connect()
for t in TABLES:
    con.sql(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF}/{t}.parquet')")

oracles = json.load(open(f"{OUT}/oracle_sql.json"))
fails = 0
for name, sql in sorted(oracles.items()):
    try:
        got = con.sql(f"SELECT * FROM read_parquet('{OUT}/{name}/*.parquet')").df()
    except Exception as ex:
        print(f"FAIL {name}: no spark output ({str(ex).splitlines()[0][:100]})")
        fails += 1
        continue
    try:
        exp = con.sql(sql).df()
    except Exception as ex:
        print(f"FAIL {name}: oracle error: {str(ex).splitlines()[0][:160]}")
        fails += 1
        continue
    if sorted(got.columns) != sorted(exp.columns):
        print(f"FAIL {name}: columns differ: spark={list(got.columns)} oracle={list(exp.columns)}")
        fails += 1
        continue
    exp = exp[got.columns]
    if len(got) != len(exp):
        print(f"FAIL {name}: rowcount spark={len(got)} oracle={len(exp)}")
        fails += 1
        continue
    # driver sorts columns by name; we compare in the (already ordered) row order
    bad = None
    for c in got.columns:
        gv, ev = got[c].tolist(), exp[c].tolist()
        for i, (a, b) in enumerate(zip(gv, ev)):
            if a is None and b is None:
                continue
            if isinstance(a, float) or isinstance(b, float):
                af = float("nan") if a is None else float(a)
                bf = float("nan") if b is None else float(b)
                if math.isnan(af) and math.isnan(bf):
                    continue
                if af != bf and abs(af - bf) > 1e-9 * max(1.0, abs(af), abs(bf)):
                    bad = (c, i, a, b)
                    break
            elif str(a) != str(b):
                bad = (c, i, a, b)
                break
        if bad:
            break
    if bad:
        c, i, a, b = bad
        print(f"FAIL {name}: value diff col={c} row={i} spark={a!r} oracle={b!r}")
        fails += 1
    else:
        print(f"OK   {name}: {len(got)} rows")

print(f"\n{len(oracles) - fails}/{len(oracles)} queries match")
sys.exit(1 if fails else 0)
