#!/usr/bin/env python3
"""Local stand-in for the driver's DuckDB-oracle compare.

Usage: python3 tools/check_oracle.py <sfDir> <verifyOutDir>

Reads each <verifyOutDir>/<name>/ parquet (Spark result), runs the matching
oracle SQL from <verifyOutDir>/oracle_sql.json in DuckDB over <sfDir>'s tables,
canonicalizes both (columns sorted by name, rows sorted), and diffs values.
"""
import json, sys, glob, os
import duckdb
import pandas as pd

sf_dir, out_dir = sys.argv[1], sys.argv[2]

con = duckdb.connect()
for f in glob.glob(f"{sf_dir}/*.parquet"):
    name = os.path.basename(f).split(".parquet")[0]
    con.execute(f"CREATE VIEW {name} AS SELECT * FROM '{f}'")

oracles = json.load(open(f"{out_dir}/oracle_sql.json"))

def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)]
    df = df.sort_values(by=list(df.columns), na_position="first").reset_index(drop=True)
    return df

def cell(v):
    if pd.isna(v) if not isinstance(v, (list, tuple)) else False:
        return "NULL"
    if isinstance(v, float):
        return repr(v)  # full precision
    return str(v)

skip = set(os.environ.get("ORACLE_SKIP", "").split(",")) - {""}
timing = os.environ.get("ORACLE_TIMING", "") == "1"
import time

fails = 0
for d in sorted(glob.glob(f"{out_dir}/*/")):
    name = os.path.basename(d.rstrip("/"))
    if name in skip:
        print(f"  [skipped] {name} (ORACLE_SKIP)")
        continue
    spark_df = pd.concat(
        [pd.read_parquet(p) for p in glob.glob(f"{d}/*.parquet")],
        ignore_index=True) if glob.glob(f"{d}/*.parquet") else pd.DataFrame()
    if name not in oracles:
        print(f"  [rows-only] {name}: {len(spark_df)} rows")
        continue
    t0 = time.time()
    try:
        duck_df = con.execute(oracles[name]).fetchdf()
    except Exception as e:
        print(f"✗ {name}: oracle SQL ERROR: {e}")
        fails += 1
        continue
    if timing:
        print(f"  [oracle {time.time()-t0:.1f}s] {name}", flush=True)
    s, o = canon(spark_df), canon(duck_df)
    if list(s.columns) != list(o.columns):
        print(f"✗ {name}: column mismatch spark={list(s.columns)} duck={list(o.columns)}")
        fails += 1
        continue
    if len(s) != len(o):
        print(f"✗ {name}: row count spark={len(s)} duck={len(o)}")
        fails += 1
        continue
    sv = s.map(cell) if hasattr(s, "map") else s.applymap(cell)
    ov = o.map(cell) if hasattr(o, "map") else o.applymap(cell)
    neq = (sv != ov)
    if neq.any().any():
        n_bad = int(neq.any(axis=1).sum())
        print(f"✗ {name}: {n_bad}/{len(s)} rows differ")
        bad_idx = neq.any(axis=1)
        print("  spark:", s[bad_idx].head(3).to_dict("records"))
        print("  duck :", o[bad_idx].head(3).to_dict("records"))
        fails += 1
    else:
        print(f"✓ {name}: {len(s)} rows match")

sys.exit(1 if fails else 0)
