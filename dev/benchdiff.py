#!/usr/bin/env python3
"""Per-query bench regression tripwire.

Usage:
    python3 dev/benchdiff.py [old.json] [new.json]

Defaults: old = BENCH_DETAIL.json at HEAD (via git show), new = working-tree
BENCH_DETAIL.json. Flags queries whose wall time grew >2x AND whose CPU
seconds also grew >1.5x (wall growth without CPU growth is shared-box
contention, not a plan regression — BASELINE.md's methodology). Exits
non-zero when any flagged query exists so roundclose-style gates can use it.
"""
import json
import subprocess
import sys


def load(path):
    if path == "HEAD":
        out = subprocess.run(["git", "show", "HEAD:BENCH_DETAIL.json"],
                             capture_output=True, text=True, check=True).stdout
        return json.loads(out)
    with open(path) as f:
        return json.load(f)


def main():
    old = load(sys.argv[1] if len(sys.argv) > 1 else "HEAD")
    new = load(sys.argv[2] if len(sys.argv) > 2 else "BENCH_DETAIL.json")
    if old.get("sf") != new.get("sf"):
        print(f"note: different sf dirs ({old.get('sf')} vs {new.get('sf')}) "
              "— ratios are not comparable", file=sys.stderr)
    ow, nw = old["queries"], new["queries"]
    oc, nc = old.get("cpu_sec", {}), new.get("cpu_sec", {})
    flagged = []
    for q in sorted(nw):
        if q not in ow or ow[q] <= 0:
            continue
        wall_r = nw[q] / ow[q]
        cpu_r = (nc.get(q, 0) / oc[q]) if oc.get(q, 0) > 0 else float("nan")
        if wall_r > 2.0 and nw[q] > 1.0:
            kind = "PLAN-REGRESSION" if cpu_r > 1.5 else "contention?"
            flagged.append((q, ow[q], nw[q], wall_r, cpu_r, kind))
    for q, o, n, wr, cr, kind in sorted(flagged, key=lambda t: -t[3]):
        print(f"{kind:16s} {q:36s} wall {o:6.2f} -> {n:6.2f} ({wr:4.1f}x)  "
              f"cpu ratio {cr:4.1f}x")
    plan_regressions = [f for f in flagged if f[5] == "PLAN-REGRESSION"]
    print(f"\n{len(flagged)} queries >2x wall; "
          f"{len(plan_regressions)} with CPU growth (plan regressions)")
    if plan_regressions:
        sys.exit(1)


if __name__ == "__main__":
    main()
