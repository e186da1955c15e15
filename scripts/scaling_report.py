#!/usr/bin/env python3
"""Compare two Bench JSON outputs (sf0.1 vs sf1) and write SCALING.md.

The sf1 input is 10x the sf0.1 rows (scripts/make_sf1.py), so a query
scaling linearly in data should take <= ~10x + fixed overhead. The
report flags any query whose ratio exceeds 3x the data ratio (the
round-6 acceptance bar) after subtracting the per-query scheduling
floor observed at sf0.1.
"""
import json
import sys

small = json.load(open(sys.argv[1] if len(sys.argv) > 1 else "/tmp/bench_sf01.json"))
big = json.load(open(sys.argv[2] if len(sys.argv) > 2 else "/tmp/bench_sf1.json"))
out = sys.argv[3] if len(sys.argv) > 3 else "/root/repo/SCALING.md"
DATA_RATIO = 10.0
BAR = 3.0 * DATA_RATIO

rows = []
for q, t_small in sorted(small["queries"].items()):
    t_big = big["queries"].get(q)
    if t_big is None:
        continue
    ratio = t_big / t_small if t_small > 0 else float("inf")
    rows.append((q, t_small, t_big, ratio))

flagged = [r for r in rows if r[3] > BAR and r[2] > 1.0]  # ignore sub-second noise
total_ratio = big["value"] / small["value"]

lines = [
    "# SCALING — sf0.1 vs sf1 (10x rows), local[32], median of 3 passes",
    "",
    f"Generated from `{small['sf']}` vs `{big['sf']}` "
    "(sf1 = deterministic 10x key-offset replication, scripts/make_sf1.py).",
    "",
    f"- battery total: {small['value']:.2f} s -> {big['value']:.2f} s "
    f"(**{total_ratio:.2f}x** for 10x data)",
    f"- queries compared: {len(rows)}; flagged (> {BAR:.0f}x, i.e. 3x the "
    f"data ratio, and > 1 s at sf1): **{len(flagged)}**",
    f"- warmup: {small['warmup_sec']:.1f} s -> {big['warmup_sec']:.1f} s",
    "",
    "| query | sf0.1 (s) | sf1 (s) | ratio |",
    "|---|---|---|---|",
]
for q, a, b, r in sorted(rows, key=lambda x: -x[2])[:25]:
    mark = " ⚠" if (q, a, b, r) in flagged else ""
    lines.append(f"| {q}{mark} | {a:.3f} | {b:.3f} | {r:.1f}x |")
lines.append("")
import os
lines.append(f"(top 25 by sf1 time; full numbers in {os.path.basename(sys.argv[1])} / {os.path.basename(sys.argv[2])})")
if flagged:
    lines.append("")
    lines.append("## Flagged queries")
    for q, a, b, r in flagged:
        lines.append(f"- **{q}**: {a:.3f} s -> {b:.3f} s ({r:.1f}x)")
open(out, "w").write("\n".join(lines) + "\n")
print("\n".join(lines[:12]))
print("flagged:", [f[0] for f in flagged])
