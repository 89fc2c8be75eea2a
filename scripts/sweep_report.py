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
    # the payload is the single line starting with "SWEEP " (possibly
    # wrapped in sbt's "[info] " prefix); everything around it — sbt
    # banners, [success] footers, stray braces in log noise — is not ours
    for line in open(p):
        line = line.strip()
        if line.startswith("[info]"):
            line = line[len("[info]"):].strip()
        if line.startswith("SWEEP "):
            return json.loads(line[len("SWEEP "):])
    sys.exit(f"{p}: no SWEEP line found")


a = load(sys.argv[1])  # sf0.1
b = load(sys.argv[2])  # sf1
rows = []
for k in a:
    t0, t1 = a[k], b.get(k)
    if t1 is None or isinstance(t0, str) or isinstance(t1, str):
        print(f"SKIP {k}: sf0.1={t0!r} sf1={t1!r}", file=sys.stderr)
        continue
    if t0 <= 0:  # %.3f floors sub-ms reps to 0.000 — no exponent exists
        print(f"SKIP {k}: sf0.1 time {t0} too small to scale", file=sys.stderr)
        continue
    exp = math.log10(t1 / t0)
    rows.append((k, t0, t1, t1 / t0, exp))
if not rows:
    sys.exit("no overlapping numeric queries between the two sweeps")
rows.sort(key=lambda r: -r[4])
print("| query | sf0.1 s | sf1 s | ratio | exponent |")
print("|---|---|---|---|---|")
for k, t0, t1, r, e in rows:
    print(f"| {k} | {t0:.3f} | {t1:.3f} | {r:.2f}x | {e:.2f} |")
worst = rows[0]
print(f"\nworst exponent: {worst[0]} at {worst[4]:.2f}")
