#!/usr/bin/env python3
"""Render the per-entry sf0.1->sf1 scaling-ratio table for OPERATORS.md.

Inputs are two Bench JSON lines (the driver-contract single-line format)
measured in the same quiet window. Data scales 10x between the points, so
an entry scaling ~linearly shows time-ratio <= ~10; constant-overhead
entries (tiny results, fixed model fits) sit far below. Ratios above the
threshold are listed separately so each gets a named cause in the doc.

Usage: scaling_table.py bench_sf01.json bench_sf1.json [threshold]

Dev-only tooling (driver-side python env); not part of the shipped library.
"""
import sys, json

lo = json.load(open(sys.argv[1]))
hi = json.load(open(sys.argv[2]))
thresh = float(sys.argv[3]) if len(sys.argv) > 3 else 12.0

qlo, qhi = lo["queries"], hi["queries"]
rows = []
for k in qlo:
    if k in qhi:
        r = qhi[k] / qlo[k] if qlo[k] > 0 else float("inf")
        rows.append((k, qlo[k], qhi[k], r))
rows.sort(key=lambda t: -t[3])

print(f"| entry | sf0.1 s | sf1 s | ratio (10x data) |")
print("|---|---|---|---|")
for k, a, b, r in rows:
    print(f"| {k} | {a:.3f} | {b:.3f} | {r:.1f}x |")

over = [t for t in rows if t[3] > thresh]
print(f"\ntotal sf0.1 {lo['value']:.1f}s -> sf1 {hi['value']:.1f}s "
      f"({hi['value']/lo['value']:.1f}x); vmed {lo.get('vmed')} -> {hi.get('vmed')}")
print(f"{len(over)} entries above {thresh:.0f}x (10x data): "
      + ", ".join(f"{k} {r:.1f}x" for k, _, _, r in over))
