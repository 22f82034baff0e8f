#!/usr/bin/env python3
"""DuckDB half of the SQL grammar-fuzz gate (SqlFuzzSpec): replay each
generated statement in DuckDB over the same parquet tables and
value-compare against the Spark result dump.

Usage: check_fuzz.py [fuzz_out_dir] [sf_dir]

Dev-only tooling (driver-side python env); not part of the shipped library.
"""
import sys, os, json, glob, re
import duckdb
import pandas as pd

out_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/sqlfuzz"
sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.01"

con = duckdb.connect()
for p in glob.glob(f"{sf_dir}/*.parquet"):
    name = os.path.basename(p)[:-8]
    src = f"{p}/*.parquet" if os.path.isdir(p) else p
    con.execute(f"CREATE VIEW {name} AS SELECT * FROM '{src}'")

stmts = json.load(open(f"{out_dir}/fuzz_sql.json"))

def canon(df: pd.DataFrame) -> pd.DataFrame:
    for c in df.columns:
        if str(df[c].dtype).startswith("datetime64"):
            df[c] = df[c].astype("datetime64[ns]")
    return df.sort_values(by=list(df.columns), ignore_index=True)

def pinned_empty_grouping_sets(sql: str, mine: pd.DataFrame,
                               orc: pd.DataFrame) -> bool:
    """PINNED dialect divergence (see SqlFuzzSpec's dedicated test):
    CUBE/ROLLUP's empty grouping set over ZERO input rows. The SQL
    standard (and DuckDB/Postgres) emits the grand-total row — COUNTs
    0, other aggregates NULL, every group key NULL, every GROUPING
    flag 1. Spark expands rows BEFORE aggregating, so zero input rows
    yield zero groups and the row is absent. Recognize exactly that
    shape (Spark empty, DuckDB exactly the fully-determined grand-total
    row) and report it as a pass with a note; anything looser stays a
    FAIL."""
    if len(mine) != 0 or len(orc) != 1:
        return False
    if not re.search(r"GROUP BY\s+(CUBE|ROLLUP|GROUPING SETS)", sql,
                     re.IGNORECASE):
        return False
    # which select-list aliases are COUNT aggregates / GROUPING flags?
    items = re.findall(r"(?:^SELECT\s+|,\s*)((?:[^,(]|\([^()]*(?:\([^()]*\)[^()]*)*\))+?)\s+AS\s+(\w+)",
                       sql.split(" FROM ")[0], re.IGNORECASE)
    kinds = {alias: ("count" if re.match(r"\s*COUNT\s*\(", expr, re.I)
                     else "grouping" if re.match(r"\s*CAST\s*\(\s*GROUPING\s*\(", expr, re.I)
                     else "agg")
             for expr, alias in items}
    row = orc.iloc[0]
    for c in orc.columns:
        v = row[c]
        kind = kinds.get(c, "key")  # unaliased columns are group keys
        if kind == "count" and not (pd.notna(v) and int(v) == 0):
            return False
        if kind == "grouping" and not (pd.notna(v) and int(v) == 1):
            return False
        if kind in ("agg", "key") and pd.notna(v):
            return False
    return True


n_pass = n_fail = n_pinned = 0
for name in sorted(stmts):
    sql = stmts[name]
    try:
        mine = canon(con.execute(
            f"SELECT * FROM '{out_dir}/{name}.parquet/*.parquet'").fetchdf())
        orc = canon(con.execute(sql).fetchdf())
    except Exception as e:
        print(f"FAIL {name}: {e}\n  SQL: {sql}"); n_fail += 1; continue
    if list(mine.columns) != list(orc.columns):
        print(f"FAIL {name}: columns {list(mine.columns)} vs {list(orc.columns)}\n  SQL: {sql}")
        n_fail += 1; continue
    if len(mine) != len(orc):
        if pinned_empty_grouping_sets(sql, mine, orc):
            print(f"PINNED {name}: empty-input grouping-sets grand-total "
                  f"row (Spark omits, standard emits)")
            n_pass += 1; n_pinned += 1; continue
        print(f"FAIL {name}: rows {len(mine)} vs {len(orc)}\n  SQL: {sql}")
        n_fail += 1; continue
    if [str(t) for t in mine.dtypes] != [str(t) for t in orc.dtypes]:
        print(f"FAIL {name}: dtype {[str(t) for t in mine.dtypes]} vs "
              f"{[str(t) for t in orc.dtypes]}\n  SQL: {sql}")
        n_fail += 1; continue
    bad = []
    for c in mine.columns:
        neq = ~(mine[c].eq(orc[c]) | (mine[c].isna() & orc[c].isna()))
        if neq.any():
            i = neq.idxmax()
            bad.append(f"{c}[{i}]: {mine[c][i]!r} vs {orc[c][i]!r} (n={neq.sum()})")
    if bad:
        print(f"FAIL {name}: " + "; ".join(bad[:3]) + f"\n  SQL: {sql}")
        n_fail += 1; continue
    n_pass += 1

print(f"\n{n_pass} pass / {n_fail} fail / {len(stmts)} total"
      + (f" ({n_pinned} pinned empty-grouping-sets)" if n_pinned else ""))
sys.exit(1 if n_fail else 0)
