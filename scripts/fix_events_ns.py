#!/usr/bin/env python3
"""Rewrite a ScaleUp-generated events table to the driver testdata's
exact physical layout (TESTDATA.md): ONE parquet FILE named
events.parquet with TIMESTAMP(NANOS) ts.

OBSOLETE as a prerequisite since round 8: EventStream.readEvents now
sniffs the ts vintage per-footer AND special-cases a glob that names a
Spark-written DIRECTORY, so scale points stream correctly in their raw
ScaleUp layout. Kept for reproducing the round-7 measurement setup
(which flattened events through this script) and as layout tooling.
Original motivation, both halves since fixed in the reader:
 - EventStream.rawSchema read ts as raw int64 nanos — a Spark-written
   TIMESTAMP(MICROS) column failed that schema;
 - the streaming entries glob `events.parquet` as a file inside the sf
   dir; a directory of part files matched nothing (SILENTLY zero rows).
Multiple row groups keep batch scans parallelizable (Spark splits a
single file on row-group boundaries).

Usage: fix_events_ns.py localdata/sf1

Dev-only tooling (driver-side python env); not part of the shipped library.
"""
import sys, os, glob, shutil
import pyarrow as pa
import pyarrow.parquet as pq

sf = sys.argv[1]
d = f"{sf}/events.parquet"
files = ([d] if os.path.isfile(d)
         else sorted(glob.glob(f"{d}/part-*.parquet")))
assert files, f"no parquet parts under {d}"
t = pa.concat_tables(pq.read_table(f) for f in files)
i = t.schema.get_field_index("ts")
t = t.set_column(i, pa.field("ts", pa.timestamp("ns")),
                 t.column(i).cast(pa.timestamp("ns")))
# drop the Spark-written key-value metadata: its row.metadata schema
# still says TIMESTAMP(MICROS) and Spark trusts it over the physical
# NANOS type, breaking the read (pyarrow re-adds a fresh ARROW:schema)
t = t.replace_schema_metadata(None)
tmp = f"{sf}/.events.parquet.tmp"
# version>=2.6 keeps nanos instead of coercing to micros
pq.write_table(t, tmp, version="2.6", coerce_timestamps=None,
               row_group_size=131072)
shutil.rmtree(d) if os.path.isdir(d) else os.remove(d)
os.rename(tmp, d)
print(f"[fix_events_ns] {d}: {t.num_rows} rows, single file, TIMESTAMP(NANOS)")
