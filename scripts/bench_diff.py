#!/usr/bin/env python3
"""Round-over-round bench diff: common-query totals plus movers.

Usage: python3 scripts/bench_diff.py <old_bench.json> <new_bench.json>
       [min_ratio] [min_delta_sec]

Compares only queries present in BOTH files (battery growth between
rounds would otherwise read as a regression), prints the common-set
total ratio, and lists movers exceeding BOTH thresholds (default 1.4x
and 0.4 s) in each direction. Use this instead of eyeballing totals —
a single new expensive query or one GC-noisy reading dominates raw
total diffs.
"""
import json
import sys

old = json.load(open(sys.argv[1]))
new = json.load(open(sys.argv[2]))
min_ratio = float(sys.argv[3]) if len(sys.argv) > 3 else 1.4
min_delta = float(sys.argv[4]) if len(sys.argv) > 4 else 0.4

common = sorted(set(old["queries"]) & set(new["queries"]))
os_, ns_ = (sum(d["queries"][q] for q in common) for d in (old, new))
print(f"common {len(common)} queries: {os_:.1f}s -> {ns_:.1f}s "
      f"({ns_ / os_:.2f}x round-over-round)")

only_old = sorted(set(old["queries"]) - set(new["queries"]))
only_new = sorted(set(new["queries"]) - set(old["queries"]))
if only_old:
    print(f"dropped: {', '.join(only_old)}")
if only_new:
    t = sum(new["queries"][q] for q in only_new)
    print(f"added ({t:.1f}s): {', '.join(only_new)}")


def movers(label, grew):
    """Movers where new/old (or old/new, for `faster`) exceeds both
    thresholds; always prints old -> new in chronological order."""
    o, n = old["queries"], new["queries"]
    rows = [(q, o[q], n[q]) for q in common
            if (n[q] / max(o[q], 1e-9) if grew else o[q] / max(n[q], 1e-9))
            > min_ratio and abs(n[q] - o[q]) > min_delta]
    if rows:
        print(f"{label} (> {min_ratio}x and > {min_delta}s):")
        for q, x, y in sorted(rows, key=lambda r: -abs(r[2] - r[1])):
            print(f"  {q}: {x:.2f} -> {y:.2f} ({y / x:.2f}x)")


movers("slower", grew=True)
movers("faster", grew=False)
