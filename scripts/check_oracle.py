#!/usr/bin/env python3
"""Simulate the driver's correctness gate: run each oracle_sql.json entry
in DuckDB (tables registered from the sf dir) and compare to the Verify
parquet dump (columns sorted by name, rows sorted, values hashed)."""
import sys, json, glob, os
import duckdb

sf_dir, out_dir = sys.argv[1], sys.argv[2]
con = duckdb.connect()
for p in glob.glob(f"{sf_dir}/*.parquet"):
    name = os.path.basename(p).replace(".parquet", "")
    con.execute(f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{p}')")

oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
ok = fail = 0
for q in sorted(os.listdir(out_dir)):
    qdir = os.path.join(out_dir, q)
    if not os.path.isdir(qdir):
        continue
    got = con.sql(f"SELECT * FROM read_parquet('{qdir}/*.parquet')").df()
    got = got[sorted(got.columns)]
    if q not in oracle:
        print(f"{q}: rows-only ({len(got)} rows)")
        continue
    exp = con.sql(oracle[q]).df()
    exp = exp[sorted(exp.columns)]
    if list(exp.columns) != list(got.columns):
        print(f"{q}: SCHEMA MISMATCH got={list(got.columns)} exp={list(exp.columns)}")
        fail += 1
        continue
    g = got.sort_values(by=list(got.columns)).reset_index(drop=True)
    e = exp.sort_values(by=list(exp.columns)).reset_index(drop=True)
    if len(g) != len(e):
        print(f"{q}: ROWCOUNT MISMATCH got={len(g)} exp={len(e)}")
        fail += 1
        continue
    if g.astype(str).equals(e.astype(str)):
        print(f"{q}: OK ({len(g)} rows)")
        ok += 1
    else:
        diff = (g.astype(str) != e.astype(str)).any(axis=1)
        print(f"{q}: VALUE MISMATCH in {diff.sum()} rows; first:")
        idx = diff[diff].index[:3]
        for i in idx:
            print("  got", g.loc[i].to_dict(), "exp", e.loc[i].to_dict())
        fail += 1
print(f"\n{ok} ok, {fail} failed")
sys.exit(1 if fail else 0)
