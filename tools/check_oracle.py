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

# Above-sf0.1 resilience knobs (the g4/g11-class lesson: a temp-spill
# ENOSPC POISONS the DuckDB allocator — every later query on the same
# connection then dies with a bogus 2 KB OOM):
#   ORACLE_MEM_LIMIT   e.g. 48GB  -> SET memory_limit
#   ORACLE_TEMP_LIMIT  e.g. 60GB  -> SET max_temp_directory_size (fail the
#                                    one spilling query fast, not the disk)
#   ORACLE_FRESH_CON=1            -> a new connection per query, so one
#                                    query's death cannot poison the rest
def connect():
    c = duckdb.connect()
    if os.environ.get("ORACLE_MEM_LIMIT"):
        c.execute(f"SET memory_limit='{os.environ['ORACLE_MEM_LIMIT']}'")
    if os.environ.get("ORACLE_TEMP_LIMIT"):
        c.execute(f"SET max_temp_directory_size='{os.environ['ORACLE_TEMP_LIMIT']}'")
    for f in glob.glob(f"{sf_dir}/*.parquet"):
        name = os.path.basename(f).split(".parquet")[0]
        c.execute(f"CREATE VIEW {name} AS SELECT * FROM '{f}'")
    return c

fresh_con = os.environ.get("ORACLE_FRESH_CON", "") == "1"
con = connect()

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
produced = set()
for d in sorted(glob.glob(f"{out_dir}/*/")):
    name = os.path.basename(d.rstrip("/"))
    produced.add(name)
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
        if fresh_con:
            con.close()
            con = connect()
        duck_df = con.execute(oracles[name]).fetchdf()
    except Exception as e:
        print(f"✗ {name}: oracle SQL ERROR: {e}", flush=True)
        fails += 1
        try:  # a failed spill can poison the allocator — always reconnect
            con.close()
        except Exception:
            pass
        con = connect()
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

# Coverage vs the REQUEST, not the surviving outputs: graft.Verify writes
# <out_dir>/queries.json listing every query it was asked to run (and
# check_all.sh pipes the engine run through grep, which can swallow a
# partial failure). A requested query with no output directory is a
# FAILURE here — this is exactly how the d3i gap in the r8 1000x log went
# unnoticed. ORACLE_EXPECT=a,b,c overrides the manifest for ad-hoc runs.
expect_env = os.environ.get("ORACLE_EXPECT", "")
if expect_env:
    expected = set(expect_env.split(",")) - {""}
elif os.path.exists(f"{out_dir}/queries.json"):
    expected = set(json.load(open(f"{out_dir}/queries.json")))
else:
    expected = set()
for name in sorted(expected - produced - skip):
    print(f"✗ {name}: engine output missing (requested but not produced)")
    fails += 1

sys.exit(1 if fails else 0)
