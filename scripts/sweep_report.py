#!/usr/bin/env python3
"""Combine two graft.Sweep outputs (sf0.1 and sf1) into the SWEEP_sf1.md
scaling table. Exponent = log10(t_sf1 / t_sf0.1) for a 10x row-count
step: 1.0 = linear, <1 = sublinear (fixed overheads amortizing),
>1 = superlinear (a plan that would not survive 100 TB).

Usage: sweep_report.py <sweep_sf01.txt> <sweep_sf1.txt>
"""
import json
import math
import sys


def load(p):
    line = open(p).read().strip()
    return json.loads(line[line.index("{"):])


a = load(sys.argv[1])  # sf0.1
b = load(sys.argv[2])  # sf1
rows = []
for k in a:
    t0, t1 = a[k], b.get(k)
    if t1 is None:
        continue
    exp = math.log10(t1 / t0)
    rows.append((k, t0, t1, t1 / t0, exp))
rows.sort(key=lambda r: -r[4])
print("| query | sf0.1 s | sf1 s | ratio | exponent |")
print("|---|---|---|---|---|")
for k, t0, t1, r, e in rows:
    print(f"| {k} | {t0:.3f} | {t1:.3f} | {r:.2f}x | {e:.2f} |")
worst = rows[0]
print(f"\nworst exponent: {worst[0]} at {worst[4]:.2f}")
