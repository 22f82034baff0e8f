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


def connect(sf_dir, db=None):
    # a disk-backed database lets the staged tables (d18) run out-of-core
    if db is not None and os.path.exists(db):
        os.remove(db)
    con = duckdb.connect(db) if db is not None else duckdb.connect()
    con.execute("SET temp_directory='/tmp/duckdb_spill'")
    con.execute("SET memory_limit='60GB'")
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


def cte_body(sql: str, start_marker: str, end_marker: str) -> str:
    """Extract the text between two CTE markers of the generated SQL, so
    the staged form reuses the generator's text verbatim (no manual
    transcription to diverge)."""
    a = sql.index(start_marker) + len(start_marker)
    b = sql.index(end_marker, a)
    return sql[a:b]


def d18_staged(con, sql, log=lambda *a: None):
    """d18 evaluated stage-by-stage into disk-backed tables: even with
    the UDF, the one-shot pipeline's peak (240M mixed rows + per-doc
    shingle-set lists + candidate sigs live at once) exceeds RAM at sf1;
    staged tables let each operator run out-of-core."""
    import time
    b = lambda s, e: cte_body(sql, s, e)
    stages = [
        ("t_sh", "WITH toksrc(doc_id, t) AS ({}) {}".format(
            b("WITH toksrc(doc_id, t) AS (", "), mixers"),
            b("), sh AS (", "), fnv AS ("))),
        ("t_fnv", "SELECT doc_id, sid, fnv_d18(s) AS h FROM t_sh"),
        ("t_sig", ("WITH mixers(i, ahi, alo, bu) AS ({}), "
                   "fnv AS (SELECT * FROM t_fnv), mixed AS ({}) {}").format(
            b("mixers(i, ahi, alo, bu) AS (", "), sh AS ("),
            b("), mixed AS (", "), sig AS ("),
            b("), sig AS (", "), banded AS ("))),
        ("t_banded", "WITH sig AS (SELECT * FROM t_sig) {}".format(
            b("), banded AS (", "), keep AS ("))),
        ("t_keep", "WITH banded AS (SELECT * FROM t_banded) {}".format(
            b("), keep AS (", "), cand AS ("))),
        ("t_cand", ("WITH banded AS (SELECT * FROM t_banded), "
                    "keep AS (SELECT * FROM t_keep) {}").format(
            b("), cand AS (", "), sets AS ("))),
        ("t_sets", "WITH sh AS (SELECT * FROM t_sh) {}".format(
            b("), sets AS (", "), est AS ("))),
    ]
    for name, stage_sql in stages:
        t0 = time.time()
        con.execute(f"DROP TABLE IF EXISTS {name}")
        con.execute(f"CREATE TABLE {name} AS {stage_sql}")
        n = con.execute(f"SELECT COUNT(*) FROM {name}").fetchone()[0]
        log(f"  stage {name}: {n} rows in {time.time() - t0:.1f}s")
    final = ("WITH cand AS (SELECT * FROM t_cand), "
             "sets AS (SELECT * FROM t_sets), est AS ({}), pre AS ({}), "
             "pairs AS ({}), comp AS ( WITH RECURSIVE {} {}").format(
        b("), est AS (", "), pre AS ("),
        b("), pre AS (", "), pairs AS ("),
        b("), pairs AS (", "), comp AS ("),
        b("), comp AS ( WITH RECURSIVE", ") SELECT id AS doc_id"),
        ") SELECT id AS doc_id" + sql[sql.index(") SELECT id AS doc_id")
                                      + len(") SELECT id AS doc_id"):])
    return con.execute(final).fetchdf()


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
    vcon = connect(val_dir, db="/tmp/oracle_gate_stage.db")
    orig18 = vcon.execute(oracle["d18_neardup_clusters"]).fetchdf()
    ok &= compare("rewrite-gate d18_neardup_clusters(staged)",
                  d18_staged(vcon, d18), orig18)
    orig22 = vcon.execute(oracle["d22_bloom_incremental_dedup"]).fetchdf()
    ok &= compare("rewrite-gate d22_bloom_incremental_dedup",
                  vcon.execute(d22).fetchdf(), orig22)
    orig19 = vcon.execute(d19).fetchdf()
    chunk19 = d19_chunked(vcon, d19, 0, 10_000, 1_000)
    ok &= compare("rewrite-gate d19_gopher_quality", chunk19, orig19)
    vcon.close()
    if not ok:
        print("rewrite gate failed; aborting sf1 check")
        sys.exit(1)

    # ── the sf1 comparison proper (isolated: one OOM must not mask the
    #    other entries) ────────────────────────────────────────────────
    con = connect(sf1_dir, db="/tmp/oracle_sf1_stage.db")

    def mine(name):
        return con.execute(
            f"SELECT * FROM '{out_dir}/{name}/*.parquet'").fetchdf()

    def attempt(name, fn):
        nonlocal ok
        try:
            ok &= compare(name, mine(name), fn())
        except Exception as e:
            print(f"FAIL {name}: {e}")
            ok = False

    attempt("d22_bloom_incremental_dedup", lambda: con.execute(d22).fetchdf())
    # sf1 doc_ids: 10 replicas at offsets k*10M (tools.ScaleUp)
    attempt("d19_gopher_quality",
            lambda: d19_chunked(con, d19, 0, 100_000_000, 10_000_000))
    attempt("d18_neardup_clusters",
            lambda: d18_staged(con, d18, log=lambda m: print(m, flush=True)))

    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
