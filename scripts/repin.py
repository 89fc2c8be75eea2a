#!/usr/bin/env python3
"""Regenerate Bench.pinnedSeconds from an idle-run bench_detail.json.

Usage: python3 scripts/repin.py [bench_detail.json]

Prints (a) a staleness report — every pin >2x off the fresh idle reading
in either direction, and every query the fresh run timed that has no pin
— and (b) a ready-to-paste Scala map literal for Bench.pinnedSeconds.

Workflow (per round, after plan changes):
  1. SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 sbt -batch "runMain graft.Bench"
     on an IDLE machine (writes bench_detail.json).
  2. python3 scripts/repin.py            # review the report
  3. Paste the map into Bench.scala; copy bench_detail.json to
     scripts/bench_pins.json (the committed snapshot BenchBudgetSpec
     checks the map against, so pins and snapshot can only move together).

Dev-only tooling; the engine itself is pure Scala/Spark.
"""
import json
import re
import sys


def main(detail_path):
    with open(detail_path) as f:
        detail = json.load(f)
    if not str(detail.get("sf", "")).rstrip("/").endswith("sf0.1"):
        sys.exit(f"refusing: {detail_path} is from {detail.get('sf')}, pins are sf0.1-only")
    fresh = detail["queries"]

    pins = {}
    with open("src/main/scala/graft/Bench.scala") as f:
        src = f.read()
    m = re.search(r"pinnedSeconds: Map\[String, Double\] = Map\((.*?)\)\n", src, re.S)
    if m:
        for name, sec in re.findall(r'"([^"]+)" -> ([0-9.]+)', m.group(1)):
            pins[name] = float(sec)

    stale, unpinned = [], []
    for name, sec in sorted(fresh.items()):
        if name not in pins:
            unpinned.append((name, sec))
        elif sec > 2 * pins[name] or sec < pins[name] / 2:
            stale.append((name, pins[name], sec))
    for name, pin, sec in stale:
        print(f"STALE    {name}: pinned {pin:.3f}s, fresh idle {sec:.3f}s")
    for name, sec in unpinned:
        print(f"UNPINNED {name}: fresh idle {sec:.3f}s (no budget until pinned)")
    ok = len(fresh) - len(stale) - len(unpinned)
    print(f"== {ok} fresh, {len(stale)} stale, {len(unpinned)} unpinned ==\n")

    # load-sentinel probe pin: the calibration probe's idle seconds ride
    # the same detail artifact (sentinel.probes) — pin the MIN reading
    # (same min-of-runs discipline as the query pins)
    sent = detail.get("sentinel", {})
    probe_secs = [sec for _, sec in sent.get("probes", [])]
    if probe_secs:
        cur = re.search(r"probePinSeconds: Double = ([0-9.]+)", src)
        print(f"PROBE pin: fresh idle min {min(probe_secs):.3f}s over "
              f"{len(probe_secs)} readings (committed: "
              f"{cur.group(1) if cur else '?'}s) — update "
              f"Bench.probePinSeconds if it moved")

    items = [f'"{n}" -> {fresh[n]:.3f}' for n in sorted(fresh)]
    body, line = [], "    "
    for i, it in enumerate(items):
        sep = "" if i == len(items) - 1 else ", "
        if len(line) + len(it) + len(sep) > 78:
            body.append(line.rstrip())
            line = "    "
        line += it + sep
    body.append(line.rstrip())
    print("  private[graft] val pinnedSeconds: Map[String, Double] = Map(")
    print("\n".join(body) + ")")


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "bench_detail.json")
