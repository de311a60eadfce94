#!/usr/bin/env python3
"""Local stand-in for the driver's DuckDB correctness gate.

Usage: python3 tools/compare_oracle.py <sfDir> <verifyOutDir> [query ...]

Reads each <verifyOutDir>/<name> parquet dump (written by graft.Verify),
runs the matching oracle SQL from oracle_sql.json in DuckDB over the same
parquet tables, sorts columns by name, and compares row counts + stringified
values. NOT part of the engine — dev tooling only (duckdb/pandas are
driver-side packages).
"""
import duckdb, json, os, sys, glob
import pandas as pd

sf, out = sys.argv[1], sys.argv[2]
only = set(sys.argv[3:])
con = duckdb.connect()
for t in ['region','nation','customer','supplier','part','orders','lineitem',
          'events','documents','embeddings']:
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf}/{t}.parquet')")

oracle = json.load(open(f'{out}/oracle_sql.json'))
fails = 0
for name, sql in sorted(oracle.items()):
    if only and name not in only:
        continue
    d = f'{out}/{name}'
    if not os.path.isdir(d):
        print(f'{name}: MISSING spark output'); fails += 1; continue
    spark_df = pd.concat([pd.read_parquet(p) for p in glob.glob(f'{d}/*.parquet')])
    try:
        duck_df = con.execute(sql).fetchdf()
    except Exception as e:
        print(f'{name}: ORACLE SQL ERROR {e}'); fails += 1; continue
    s = spark_df[sorted(spark_df.columns)].reset_index(drop=True)
    k = duck_df[sorted(duck_df.columns)].reset_index(drop=True)
    if list(s.columns) != list(k.columns):
        print(f'{name}: SCHEMA MISMATCH {list(s.columns)} vs {list(k.columns)}')
        fails += 1; continue
    if len(s) != len(k):
        print(f'{name}: ROWCOUNT {len(s)} vs {len(k)}'); fails += 1; continue
    ss, ks = s.astype(str), k.astype(str)
    if not ss.equals(ks):
        diff = (ss != ks)
        cols = [c for c in s.columns if diff[c].any()]
        print(f'{name}: VALUE MISMATCH in cols {cols}')
        for c in cols[:3]:
            idx = diff[c].idxmax()
            print(f'  e.g. {c}: spark={ss[c][idx]} duck={ks[c][idx]} row={idx}')
        fails += 1
    else:
        print(f'{name}: OK ({len(s)} rows)')
print('FAILURES:', fails)
sys.exit(1 if fails else 0)
