#!/usr/bin/env python3
"""Oracle output-type audit (the d16b rule, round 9).

The driver's correctness hash is REPRESENTATION-sensitive: it hashes the
pandas materialization of the DuckDB oracle result against the pandas
materialization of Spark's parquet output. A DuckDB HUGEINT (e.g. the
result of sum(BIGINT)) degrades to float64 in pandas (617.0) while Spark
emits int64 (617) — identical values, different hash → a red row that
tools/check.py's tolerant compare cannot see (round 7/8's d16b).

Rule: oracle OUTPUT columns must be BIGINT / INTEGER / DOUBLE / BOOLEAN /
VARCHAR / DATE / TIMESTAMP / lists thereof — never HUGEINT, DECIMAL, or
unsigned types. This audit DESCRIBEs every oracle (plans, doesn't execute,
so it is cheap even at sf0.1) and flags:
  1. any forbidden DuckDB output type (HUGEINT / DECIMAL / U*),
  2. any type-family mismatch vs the Spark parquet schema for the same
     column (int vs float vs bool vs str vs time vs list).

Usage: python3 tools/oracle_types.py [sfdir] [outdir]
Exit 0 = clean; exit 1 = findings printed. Dev tool only.
"""
import json
import re
import sys

import duckdb
import pyarrow.parquet as pq
import glob as g

SF = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
OUT = sys.argv[2] if len(sys.argv) > 2 else "/tmp/verify_out"

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

FORBIDDEN = re.compile(r"HUGEINT|DECIMAL|UBIGINT|UINTEGER|USMALLINT|UTINYINT")


def duck_family(t: str) -> str:
    t = t.upper()
    if t.endswith("[]") or t.startswith("STRUCT") or t.startswith("MAP"):
        return "list"
    if FORBIDDEN.search(t):
        return "FORBIDDEN"
    if t in ("TINYINT", "SMALLINT", "INTEGER", "BIGINT"):
        return "int"
    if t in ("FLOAT", "REAL", "DOUBLE"):
        return "float"
    if t == "BOOLEAN":
        return "bool"
    if t in ("VARCHAR", "BLOB"):
        return "str"
    if t == "DATE" or t.startswith("TIMESTAMP"):
        return "time"
    return f"other({t})"


def arrow_family(t) -> str:
    s = str(t)
    if s.startswith(("list", "large_list", "struct", "map")):
        return "list"
    if s.startswith(("int", "uint")):
        return "int"
    if s in ("float", "double", "halffloat", "float32", "float64"):
        return "float"
    if s == "bool":
        return "bool"
    if s in ("string", "large_string", "binary", "large_binary"):
        return "str"
    if s.startswith(("timestamp", "date")):
        return "time"
    return f"other({s})"


con = duckdb.connect()
for t in TABLES:
    con.sql(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF}/{t}.parquet')")

oracles = json.load(open(f"{OUT}/oracle_sql.json"))
findings = 0
for name, sql in sorted(oracles.items()):
    try:
        desc = con.sql(f"DESCRIBE {sql}").fetchall()
    except Exception as ex:
        print(f"FLAG {name}: DESCRIBE failed: {str(ex).splitlines()[0][:160]}")
        findings += 1
        continue
    duck = {row[0]: row[1] for row in desc}
    for col, typ in duck.items():
        if FORBIDDEN.search(typ.upper()):
            print(f"FLAG {name}.{col}: forbidden oracle output type {typ} "
                  f"(degrades in pandas; cast to BIGINT/DOUBLE)")
            findings += 1
    parts = g.glob(f"{OUT}/{name}/part-*.parquet")
    if not parts:
        continue  # spark side absent — check.py reports that; not a type issue
    spark = {f.name: f.type for f in pq.read_schema(parts[0])}
    for col in sorted(set(duck) & set(spark)):
        df, sf_ = duck_family(duck[col]), arrow_family(spark[col])
        if df != sf_ and df != "FORBIDDEN":
            print(f"FLAG {name}.{col}: family mismatch oracle={duck[col]}({df}) "
                  f"spark={spark[col]}({sf_})")
            findings += 1

print(f"\n{len(oracles)} oracles audited, {findings} finding(s)")
sys.exit(1 if findings else 0)
