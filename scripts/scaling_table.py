#!/usr/bin/env python3
"""Render the per-entry scaling-ratio table for OPERATORS.md.

Inputs are two or more Bench JSON lines (the driver-contract single-line
format) measured in the same quiet window, ordered smallest scale first.
Data scales 10x between adjacent points, so an entry scaling ~linearly
shows a per-decade time-ratio <= ~10; constant-overhead entries (tiny
results, fixed model fits) sit far below. Ratios above the threshold are
listed separately so each gets a named cause in the doc.

Usage: scaling_table.py bench_sf01.json bench_sf1.json [bench_sf10.json ...]
                        [--threshold N] [--labels a,b,c]

Dev-only tooling (driver-side python env); not part of the shipped library.
"""
import sys, json

args = [a for a in sys.argv[1:] if not a.startswith("--")]
opts = {a.split("=")[0]: a.split("=", 1)[1] for a in sys.argv[1:]
        if a.startswith("--") and "=" in a}
thresh = float(opts.get("--threshold", 12.0))
benches = [json.load(open(p)) for p in args]
labels = (opts["--labels"].split(",") if "--labels" in opts
          else [str(b.get("sf", i)) for i, b in enumerate(benches)])
assert len(benches) >= 2, "need at least two bench points"

qs = [b["queries"] for b in benches]
common = [k for k in qs[0] if all(k in q for q in qs)]
rows = []
for k in common:
    times = [q[k] for q in qs]
    ratios = [(b / a if a > 0 else float("inf"))
              for a, b in zip(times, times[1:])]
    rows.append((k, times, ratios))
# sort by the worst adjacent-decade ratio, descending
rows.sort(key=lambda t: -max(t[2]))

hdr = ["entry"] + [f"{l} s" for l in labels] + [
    f"{a}->{b}" for a, b in zip(labels, labels[1:])]
print("| " + " | ".join(hdr) + " |")
print("|" + "---|" * len(hdr))
for k, times, ratios in rows:
    cells = [k] + [f"{t:.3f}" for t in times] + [f"{r:.1f}x" for r in ratios]
    print("| " + " | ".join(cells) + " |")

over = [(k, max(r)) for k, _, r in rows if max(r) > thresh]
tot = " -> ".join(f"{l} {b['value']:.1f}s" for l, b in zip(labels, benches))
vmed = " -> ".join(str(b.get("vmed")) for b in benches)
print(f"\ntotals: {tot}; vmed {vmed}")
print(f"{len(over)} entries above {thresh:.0f}x per decade: "
      + ", ".join(f"{k} {r:.1f}x" for k, r in over))
