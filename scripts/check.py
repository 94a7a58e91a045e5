#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate.

Usage: python3 scripts/check.py [sfDir] [outDir]

Reads outDir/<name> parquet dirs produced by `sbt "runMain graft.Verify
<sfDir> <outDir>"`, runs outDir/oracle_sql.json in DuckDB with views named
after the testdata tables, and compares: schema (column names), row count,
and values (rows sorted by all columns, floats rounded to 9 significant
digits before hashing).
"""
import sys, os, json, glob, math
import duckdb
import pyarrow.parquet as pq
import pandas as pd

sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
out = sys.argv[2] if len(sys.argv) > 2 else "/tmp/verify_out"

con = duckdb.connect()
for p in glob.glob(f"{sf}/*.parquet"):
    name = os.path.basename(p).replace(".parquet", "")
    con.execute(f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{p}')")

oracle = json.load(open(f"{out}/oracle_sql.json"))

def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype.kind == "f":
            df[c] = df[c].map(lambda v: float(f"{v:.9g}") if pd.notna(v) else None)
        elif df[c].dtype.kind == "M":
            df[c] = df[c].astype("datetime64[us]")
        elif df[c].dtype == object:
            df[c] = df[c].map(lambda v: tuple(v) if isinstance(v, (list, tuple)) or
                              (hasattr(v, "__len__") and not isinstance(v, (str, bytes, dict))) else v)
    return df.sort_values(by=list(df.columns), kind="mergesort").reset_index(drop=True)

fails = []
for name in sorted(oracle):
    path = f"{out}/{name}"
    if not os.path.isdir(path):
        fails.append((name, "missing spark output")); print(f"MISS  {name}"); continue
    got = canon(pq.read_table(path).to_pandas())
    try:
        exp = canon(con.sql(oracle[name]).df())
    except Exception as e:
        fails.append((name, f"oracle error: {e}")); print(f"ORAC  {name}: {str(e).splitlines()[0][:120]}"); continue
    if list(got.columns) != list(exp.columns):
        fails.append((name, f"schema {list(got.columns)} vs {list(exp.columns)}"))
        print(f"SCHM  {name}: spark={list(got.columns)} duck={list(exp.columns)}"); continue
    if len(got) != len(exp):
        fails.append((name, f"rows {len(got)} vs {len(exp)}"))
        print(f"ROWS  {name}: spark={len(got)} duck={len(exp)}"); continue
    eq = got.equals(exp)
    if not eq:
        diff = (got != exp) & ~(got.isna() & exp.isna())
        nbad = int(diff.any(axis=1).sum())
        fails.append((name, f"{nbad} mismatching rows"))
        print(f"VALS  {name}: {nbad}/{len(got)} rows differ")
        bad = diff.any(axis=1)
        print("  spark:", got[bad].head(3).to_dict("records"))
        print("  duck :", exp[bad].head(3).to_dict("records"))
        continue
    print(f"OK    {name} ({len(got)} rows)")

print(f"\n{len(oracle) - len(fails)}/{len(oracle)} pass")
sys.exit(1 if fails else 0)
