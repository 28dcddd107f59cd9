#!/usr/bin/env python3
"""Render BENCH_LOCAL.json as the BASELINE.md comparison table
(median + floor per entry, sorted by name) plus summary lines.
Usage: python3 tools/baseline_table.py [BENCH_LOCAL.json]
"""
import json
import sys

path = sys.argv[1] if len(sys.argv) > 1 else "BENCH_LOCAL.json"
d = json.load(open(path))
med, flo = d["medians"], d["floors"]
print(f"passes={d['passes']} sf={d['sf']} errors={d['errors']}")
print(f"total_median={sum(med.values()):.1f} total_floor={sum(flo.values()):.1f} entries={len(med)}")
print()
print("| query | sec (median of 3 interleaved passes) | floor (min) |")
print("|---|---|---|")
for k in sorted(med):
    print(f"| {k} | {med[k]:.2f} | {flo[k]:.2f} |")
