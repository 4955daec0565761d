#!/usr/bin/env python3
"""Local replica of the driver's DuckDB correctness gate.

Usage: python3 tools/check_oracle.py <sfDir> <verifyOutDir>

Registers each parquet table by name, runs every oracle_sql.json entry,
and compares against the Spark-written parquet under <verifyOutDir>/<name>:
row count, column names, and value hash (columns sorted by name; rows
compared both in-order and sorted).
"""
import sys, json, glob, os
import duckdb
import pandas as pd

sf, out = sys.argv[1], sys.argv[2]
con = duckdb.connect()
for f in glob.glob(f"{sf}/*.parquet"):
    name = os.path.basename(f)[:-len(".parquet")]
    con.sql(f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{f}')")

oracle = json.load(open(f"{out}/oracle_sql.json"))
fails = 0
for name, sql in sorted(oracle.items()):
    try:
        want = con.sql(sql).df()
    except Exception as e:
        print(f"FAIL {name}: oracle error: {e}")
        fails += 1
        continue
    try:
        got = pd.concat([pd.read_parquet(p) for p in
                         sorted(glob.glob(f"{out}/{name}/*.parquet"))])
    except Exception as e:
        print(f"FAIL {name}: spark result unreadable: {e}")
        fails += 1
        continue
    w = want.reindex(sorted(want.columns), axis=1).reset_index(drop=True)
    g = got.reindex(sorted(got.columns), axis=1).reset_index(drop=True)
    if list(w.columns) != list(g.columns):
        print(f"FAIL {name}: columns want={list(w.columns)} got={list(g.columns)}")
        fails += 1
        continue
    if len(w) != len(g):
        print(f"FAIL {name}: rows want={len(w)} got={len(g)}")
        fails += 1
        continue
    def canon(df):
        return [tuple(str(x) for x in r) for r in df.itertuples(index=False)]
    cw, cg = canon(w), canon(g)
    inorder = cw == cg
    assorted = sorted(cw) == sorted(cg)
    if assorted:
        print(f"ok   {name}: {len(w)} rows" + ("" if inorder else " (order differs)"))
    else:
        diff = [i for i, (a, b) in enumerate(zip(sorted(cw), sorted(cg))) if a != b][:3]
        print(f"FAIL {name}: values differ, e.g. rows {diff}")
        for i in diff[:2]:
            print(f"   want {sorted(cw)[i]}")
            print(f"   got  {sorted(cg)[i]}")
        fails += 1
print(f"\n{len(oracle) - fails}/{len(oracle)} oracle queries match")
sys.exit(1 if fails else 0)
