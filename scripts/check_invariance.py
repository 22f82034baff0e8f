#!/usr/bin/env python3
"""Partition-count invariance gate: compare two graft.Verify dumps of the
same catalog at the same SF but DIFFERENT parallelism / shuffle-partition
configs (graft.Verify sets spark.sql.shuffle.partitions = SPARK_GRAFT_CPUS).

Why this exists: the DuckDB oracle pins Spark == DuckDB at ONE partition
config. A 1000-executor cluster runs the same plans at a very different
partitioning; any entry whose result depends on partition count (unstable
top-k tie-breaks, order-sensitive double accumulation, per-partition rng)
is wrong at scale in a way the single-config gate cannot see. Two dumps at
coprime widths (e.g. 8 and 5) must be value-identical after the same
canonicalization the oracle gate uses.

Usage: check_invariance.py dump_a dump_b

Dev-only tooling (driver-side python env); not part of the shipped library.
"""
import sys, os, json
import duckdb
import pandas as pd

dump_a, dump_b = sys.argv[1], sys.argv[2]

# guard the two easy ways to "prove" invariance vacuously: comparing a
# dump against itself (the recipe generates the dumps in two separate
# manual steps), and a dump_b whose extra entries would be silently
# ignored by iterating only dump_a's list
assert os.path.realpath(dump_a) != os.path.realpath(dump_b), \
    "dump_a and dump_b are the same directory — nothing is being compared"

# a dump graft.Verify declared VACUOUS must never be compared, even by a
# caller that ignored Verify's nonzero exit: Verify deletes the dump and
# plants a marker AT the path (a plain file) or, if the delete partially
# failed, a VACUOUS file INSIDE the surviving directory. Refuse both.
for d in (dump_a, dump_b):
    if os.path.isfile(d):
        # bounded, decode-error-proof read: a mistakenly-passed large or
        # binary file must not turn the clear REFUSED diagnostic into a
        # MemoryError/UnicodeDecodeError (exit stays nonzero either way,
        # but the message should survive)
        with open(d, errors="replace") as f:
            marker = f.read(200).strip()
        sys.exit(f"REFUSED: {d} is a file, not a dump directory — "
                 f"graft.Verify replaced a vacuous dump with this marker: "
                 f"{marker!r}")
    if os.path.exists(os.path.join(d, "VACUOUS")):
        sys.exit(f"REFUSED: {d}/VACUOUS exists — graft.Verify declared "
                 f"this dump vacuous and its deletion partially failed; "
                 f"nothing in it may be compared")

con = duckdb.connect()
names = sorted(json.load(open(f"{dump_a}/oracle_sql.json")))
names_b = sorted(json.load(open(f"{dump_b}/oracle_sql.json")))
assert names == names_b, \
    f"entry sets differ: only_a={sorted(set(names) - set(names_b))[:5]} " \
    f"only_b={sorted(set(names_b) - set(names))[:5]}"


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)]
    for c in df.columns:
        if str(df[c].dtype).startswith("datetime64"):
            df[c] = df[c].astype("datetime64[ns]")
    return df.sort_values(by=list(df.columns), ignore_index=True)


n_pass = n_fail = 0
for name in names:
    pa, pb = f"{dump_a}/{name}", f"{dump_b}/{name}"
    if not (os.path.isdir(pa) and os.path.isdir(pb)):
        print(f"FAIL {name}: missing result dir"); n_fail += 1; continue
    try:
        a = canon(con.execute(f"SELECT * FROM '{pa}/*.parquet'").fetchdf())
        b = canon(con.execute(f"SELECT * FROM '{pb}/*.parquet'").fetchdf())
    except Exception as e:
        print(f"FAIL {name}: {e}"); n_fail += 1; continue
    if list(a.columns) != list(b.columns):
        print(f"FAIL {name}: columns {list(a.columns)} vs {list(b.columns)}")
        n_fail += 1; continue
    if len(a) != len(b):
        print(f"FAIL {name}: rows {len(a)} vs {len(b)}"); n_fail += 1; continue
    bad = []
    for c in a.columns:
        neq = ~(a[c].eq(b[c]) | (a[c].isna() & b[c].isna()))
        if neq.any():
            i = neq.idxmax()
            bad.append(f"{c}[{i}]: {a[c][i]!r} vs {b[c][i]!r} (n={neq.sum()})")
    if bad:
        print(f"FAIL {name}: " + "; ".join(bad[:3])); n_fail += 1; continue
    print(f"PASS {name} ({len(a)} rows)"); n_pass += 1

print(f"\n{n_pass} pass / {n_fail} fail / {len(names)} total")
sys.exit(1 if n_fail else 0)
