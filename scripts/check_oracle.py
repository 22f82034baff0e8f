#!/usr/bin/env python3
"""Local replica of the driver's correctness gate: run each oracle SQL in
DuckDB over the testdata parquet tables, compare against the Verify output
parquet (columns sorted by name, rows sorted, values hashed).

Usage: check_oracle.py [verify_out_dir] [sf_dir]

Dev-only tooling (driver-side python env); not part of the shipped library.
"""
import sys, os, json, glob
import duckdb
import pandas as pd

out_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/verify_out"
sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.01"
only = set(sys.argv[3].split(",")) if len(sys.argv) > 3 else None

con = duckdb.connect()
# larger scale points (localdata/sf1) push the graph oracles past RAM
# without a spill dir; harmless at driver SFs
con.execute("SET temp_directory='/tmp/duckdb_spill'")
con.execute("SET memory_limit='40GB'")
for p in glob.glob(f"{sf_dir}/*.parquet"):
    name = os.path.basename(p)[:-8]
    # driver testdata is one file per table; locally synthesized scale
    # points (tools.ScaleUp) are Spark-written parquet directories
    src = f"{p}/*.parquet" if os.path.isdir(p) else p
    con.execute(f"CREATE VIEW {name} AS SELECT * FROM '{src}'")

oracle = json.load(open(f"{out_dir}/oracle_sql.json"))

def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)]
    # normalize timestamp-ish columns to ns for dtype-insensitive compare
    for c in df.columns:
        if str(df[c].dtype).startswith("datetime64"):
            df[c] = df[c].astype("datetime64[ns]")
    return df.sort_values(by=list(df.columns), ignore_index=True)

if only is not None:
    oracle = {k: v for k, v in oracle.items() if k in only}
n_pass = n_fail = 0
for name in sorted(oracle):
    res_path = f"{out_dir}/{name}"
    if not os.path.isdir(res_path):
        print(f"FAIL {name}: no result dir"); n_fail += 1; continue
    try:
        mine = canon(con.execute(
            f"SELECT * FROM '{res_path}/*.parquet'").fetchdf())
        orc = canon(con.execute(oracle[name]).fetchdf())
    except Exception as e:
        print(f"FAIL {name}: {e}"); n_fail += 1; continue
    if list(mine.columns) != list(orc.columns):
        print(f"FAIL {name}: columns {list(mine.columns)} vs {list(orc.columns)}")
        n_fail += 1; continue
    if len(mine) != len(orc):
        print(f"FAIL {name}: rows {len(mine)} vs {len(orc)}"); n_fail += 1; continue
    dtype_note = ""
    if [str(t) for t in mine.dtypes] != [str(t) for t in orc.dtypes]:
        dtype_note = f"  [dtype: {[str(t) for t in mine.dtypes]} vs {[str(t) for t in orc.dtypes]}]"
    if dtype_note:
        # the driver hashes raw values: an int64-vs-object (e.g. DuckDB
        # HUGEINT) difference hash-mismatches even when values print the
        # same — round 1 shipped three of these. Treat as FAIL locally.
        print(f"FAIL {name}: dtype mismatch{dtype_note}")
        n_fail += 1; continue
    try:
        eq = mine.equals(orc)
        if not eq:
            # value-level compare with position report
            bad = []
            for c in mine.columns:
                neq = ~(mine[c].eq(orc[c]) | (mine[c].isna() & orc[c].isna()))
                if neq.any():
                    i = neq.idxmax()
                    bad.append(f"{c}[{i}]: {mine[c][i]!r} vs {orc[c][i]!r} (n={neq.sum()})")
            if bad:
                print(f"FAIL {name}: " + "; ".join(bad[:3]))
                n_fail += 1; continue
        print(f"PASS {name} ({len(mine)} rows)"); n_pass += 1
    except Exception as e:
        print(f"FAIL {name}: compare error {e}"); n_fail += 1

print(f"\n{n_pass} pass / {n_fail} fail / {len(oracle)} total")
sys.exit(1 if n_fail else 0)
