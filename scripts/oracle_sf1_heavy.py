#!/usr/bin/env python3
"""sf1-scale oracle check for the three entries whose generated DuckDB SQL
OOMs at 10x data (d18, d19, d22).

The generated oracles compute FNV-1a64 character-by-character with a
WITH RECURSIVE CTE; DuckDB retains every (row, char-position) intermediate
-- ~30 GB of tuples carrying full shingle strings at sf1, and recursive
CTEs don't spill. This script runs the SAME oracle pipelines with two
mechanical, self-validating transformations:

  - d18/d22: the recursive-FNV CTE is swapped for a Python UDF that
    replays the recursion literally (two xor-multiply steps per char);
  - d19 (purely per-document): evaluated in doc_id chunks and concatenated.

Both transformations are validated 1:1 against the ORIGINAL oracle SQL at
sf0.1 before the sf1 comparison runs, so the rewrite itself is gated.

Usage: oracle_sf1_heavy.py [verify_out_dir] [sf1_dir] [validate_sf_dir]

Dev-only tooling (driver-side python env); not part of the shipped library.
"""
import sys, os, json, glob
import duckdb
import pandas as pd

out_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/verify_sf1"
sf1_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/repo/localdata/sf1"
val_dir = sys.argv[3] if len(sys.argv) > 3 else "/root/testdata/sf0.1"

MASK = (1 << 64) - 1
PRIME = 1099511628211
BASIS = 14695981039346656037


def fnv_d18(s: str) -> int:
    # replays d18's recursion: h = ((h ^ ascii(c)) * p) * p per char
    h = BASIS
    for c in s:
        h = (((h ^ ord(c)) * PRIME) & MASK) * PRIME & MASK
    return h


def fnv_d22(s: str) -> int:
    # replays d22's recursion: h = ((h ^ lo(c)) * p ^ hi(c)) * p per
    # UTF-16 code unit (the oracle's unicode() sees BMP code points)
    h = BASIS
    for c in s:
        cp = ord(c)
        h = ((h ^ (cp & 255)) * PRIME) & MASK
        h = ((h ^ ((cp >> 8) & 255)) * PRIME) & MASK
    return h


def connect(sf_dir):
    con = duckdb.connect()
    con.execute("SET temp_directory='/tmp/duckdb_spill'")
    con.execute("SET memory_limit='80GB'")
    con.create_function("fnv_d18", fnv_d18, ["VARCHAR"], "UBIGINT")
    con.create_function("fnv_d22", fnv_d22, ["VARCHAR"], "UBIGINT")
    for p in glob.glob(f"{sf_dir}/*.parquet"):
        name = os.path.basename(p)[:-8]
        src = f"{p}/*.parquet" if os.path.isdir(p) else p
        con.execute(f"CREATE VIEW {name} AS SELECT * FROM '{src}'")
    return con


def rewrite(sql: str, start_marker: str, end_marker: str, repl: str) -> str:
    a = sql.index(start_marker)
    b = sql.index(end_marker, a)
    return sql[:a] + repl + sql[b:]


def load_oracles():
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    d18 = rewrite(
        oracle["d18_neardup_clusters"],
        "fnv AS ( WITH RECURSIVE", "), mixed AS (",
        "fnv AS ( SELECT doc_id, sid, fnv_d18(s) AS h FROM sh")
    d22 = rewrite(
        oracle["d22_bloom_incremental_dedup"],
        "fnv AS ( WITH RECURSIVE", "), h2c AS (",
        "fnv AS ( SELECT doc_id, fnv_d22(key) AS h1 FROM kl")
    d19 = oracle["d19_gopher_quality"]
    return oracle, d18, d19, d22


def d19_chunked(con, sql, lo, hi, step):
    # the first CTE scans `documents` exactly once; constrain it per chunk
    marker = "FROM documents)"
    assert sql.count(marker) == 1
    frames = []
    for a in range(lo, hi, step):
        chunk = sql.replace(
            marker, f"FROM documents WHERE doc_id >= {a} AND doc_id < {a + step})")
        frames.append(con.execute(chunk).fetchdf())
    return pd.concat(frames, ignore_index=True)


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)]
    for c in df.columns:
        if str(df[c].dtype).startswith("datetime64"):
            df[c] = df[c].astype("datetime64[ns]")
    return df.sort_values(by=list(df.columns), ignore_index=True)


def compare(name, mine, orc):
    mine, orc = canon(mine), canon(orc)
    if list(mine.columns) != list(orc.columns):
        print(f"FAIL {name}: columns {list(mine.columns)} vs {list(orc.columns)}")
        return False
    if len(mine) != len(orc):
        print(f"FAIL {name}: rows {len(mine)} vs {len(orc)}")
        return False
    if [str(t) for t in mine.dtypes] != [str(t) for t in orc.dtypes]:
        print(f"FAIL {name}: dtype {[str(t) for t in mine.dtypes]} vs "
              f"{[str(t) for t in orc.dtypes]}")
        return False
    for c in mine.columns:
        neq = ~(mine[c].eq(orc[c]) | (mine[c].isna() & orc[c].isna()))
        if neq.any():
            i = neq.idxmax()
            print(f"FAIL {name}: {c}[{i}]: {mine[c][i]!r} vs {orc[c][i]!r} "
                  f"(n={neq.sum()})")
            return False
    print(f"PASS {name} ({len(mine)} rows)")
    return True


def main():
    oracle, d18, d19, d22 = load_oracles()
    ok = True

    # ── gate the rewrites against the original SQL at sf0.1 ──────────
    vcon = connect(val_dir)
    for name, rewritten in [("d18_neardup_clusters", d18),
                            ("d22_bloom_incremental_dedup", d22)]:
        orig = vcon.execute(oracle[name]).fetchdf()
        new = vcon.execute(rewritten).fetchdf()
        ok &= compare(f"rewrite-gate {name}", new, orig)
    orig19 = vcon.execute(d19).fetchdf()
    chunk19 = d19_chunked(vcon, d19, 0, 10_000, 1_000)
    ok &= compare("rewrite-gate d19_gopher_quality", chunk19, orig19)
    vcon.close()
    if not ok:
        print("rewrite gate failed; aborting sf1 check")
        sys.exit(1)

    # ── the sf1 comparison proper ────────────────────────────────────
    con = connect(sf1_dir)
    for name, sql in [("d18_neardup_clusters", d18),
                      ("d22_bloom_incremental_dedup", d22)]:
        mine = con.execute(
            f"SELECT * FROM '{out_dir}/{name}/*.parquet'").fetchdf()
        ok &= compare(name, mine, con.execute(sql).fetchdf())
    mine19 = con.execute(
        f"SELECT * FROM '{out_dir}/d19_gopher_quality/*.parquet'").fetchdf()
    # sf1 doc_ids: 10 replicas at offsets k*10M (tools.ScaleUp)
    orc19 = d19_chunked(con, d19, 0, 100_000_000, 10_000_000)
    ok &= compare("d19_gopher_quality", mine19, orc19)

    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
