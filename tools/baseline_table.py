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


def fmt(v):
    # Bench.scala emits null for errored entries; render those as n/a
    # instead of crashing on exactly the runs one most wants to inspect.
    return "n/a" if v is None else f"{v:.2f}"


med_ok = [v for v in med.values() if v is not None]
flo_ok = [v for v in flo.values() if v is not None]
nulls = sorted(k for k, v in med.items() if v is None)
print(f"passes={d['passes']} sf={d['sf']} errors={d['errors']}")
print(
    f"total_median={sum(med_ok):.1f} total_floor={sum(flo_ok):.1f} "
    f"entries={len(med)} null_entries={len(nulls)}"
)
if nulls:
    print(f"entries with null medians (errored): {', '.join(nulls)}")
print()
print("| query | sec (median of 3 interleaved passes) | floor (min) |")
print("|---|---|---|")
for k in sorted(med):
    print(f"| {k} | {fmt(med[k])} | {fmt(flo.get(k))} |")
