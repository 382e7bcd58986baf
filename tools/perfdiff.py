#!/usr/bin/env python3
"""Compare two Bench JSON outputs (driver BENCH_r{N}.json or local runs):
flags per-query regressions beyond a ratio threshold and prints totals.

Usage: python3 tools/perfdiff.py <old.json> <new.json> [ratio=2.0]

Bench lines may carry an sbt "[info] " prefix — stripped automatically.
Queries only present on one side are listed as added/removed, not failed.
"""
import json, sys

def load(path):
    line = open(path).read()
    return json.loads(line[line.index("{"):])

def main(old_path, new_path, ratio=2.0):
    old, new = load(old_path), load(new_path)
    oq, nq = old["queries"], new["queries"]
    both = sorted(set(oq) & set(nq))
    regressions = [(k, oq[k], nq[k]) for k in both
                   if nq[k] > oq[k] * ratio and nq[k] - oq[k] > 0.5]
    print(f"total: {old['value']:.1f}s ({len(oq)} q) -> "
          f"{new['value']:.1f}s ({len(nq)} q)")
    for k in sorted(set(nq) - set(oq)):
        print(f"  added:   {k} {nq[k]:.2f}s")
    for k in sorted(set(oq) - set(nq)):
        print(f"  removed: {k}")
    if regressions:
        print(f"\n{len(regressions)} regressions (> {ratio}x and > 0.5s):")
        for k, a, b in sorted(regressions, key=lambda t: t[1] - t[2]):
            print(f"  {k}: {a:.2f}s -> {b:.2f}s ({b / a:.1f}x)")
        return 1
    print("no regressions")
    return 0

if __name__ == "__main__":
    args = sys.argv[1:]
    sys.exit(main(args[0], args[1], float(args[2]) if len(args) > 2 else 2.0))
