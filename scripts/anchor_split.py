#!/usr/bin/env python3
"""Pure-vs-operational split of the DuckDB anchor comparison.

Usage: anchor_split.py [BENCH_sf01.json] [DUCKDB_ANCHOR.json] [floor_ms]

Queries whose DuckDB oracle runs in < 5 ms are operational/golden
readbacks (index builds, ingest round-trips, pinned VALUES) — the
"oracle" is a readback of state Spark actually materializes, so wall
ratios there compare an operation against a no-op. The remaining
"pure" queries compare real query work engine-to-engine. The
floor-adjusted ratio subtracts a per-query Spark scheduling floor
(default 30 ms) from the Spark side — local[32] pays it on every
query regardless of data.
"""
import json
import sys

bench = json.load(open(sys.argv[1] if len(sys.argv) > 1 else "BENCH_sf01_r12.json"))
anchor = json.load(open(sys.argv[2] if len(sys.argv) > 2 else "DUCKDB_ANCHOR.json"))
floor = float(sys.argv[3]) / 1000.0 if len(sys.argv) > 3 else 0.030

sq, dq = bench["queries"], anchor["queries"]
common = sorted(set(sq) & set(dq))
pure = [k for k in common if dq[k] >= 0.005]
ops = [k for k in common if dq[k] < 0.005]

s_pure = sum(sq[k] for k in pure)
d_pure = sum(dq[k] for k in pure)
s_adj = sum(max(sq[k] - floor, 0.0) for k in pure)
print(f"common={len(common)} pure={len(pure)} operational={len(ops)}")
print(f"pure: spark {s_pure:.1f}s vs duckdb {d_pure:.1f}s = {s_pure/d_pure:.2f}x raw, "
      f"{s_adj/d_pure:.2f}x floor-adjusted ({floor*1000:.0f} ms/query)")
wins = sorted((k for k in pure if sq[k] < dq[k]), key=lambda k: dq[k] - sq[k], reverse=True)
print(f"spark beats duckdb on {len(wins)} pure queries:")
for k in wins[:12]:
    print(f"  {k}: {sq[k]:.2f} vs {dq[k]:.2f} s")
worst = sorted(pure, key=lambda k: sq[k] / dq[k], reverse=True)[:5]
print("worst pure ratios:")
for k in worst:
    print(f"  {k}: {sq[k]:.2f} vs {dq[k]:.2f} s ({sq[k]/dq[k]:.0f}x)")

# Write-side operations: the Spark side PERFORMS the stateful operation
# (streaming micro-batch maintenance, incremental pre-agg
# materialization, file compaction, shard export) and then reads back a
# receipt; the DuckDB "oracle" replays only the receipt SQL. The < 5 ms
# latency rule catches most such readbacks, but these five receipts
# aggregate real state and cross it, so the latency rule misfiles them
# as engine-vs-engine comparisons — an operation vs a readback is not
# one. Declared by name (not tuned by latency) so the exclusion is
# auditable; both splits are printed.
WRITE_OPS = {"q_streaming_rollup", "q_incremental_refresh",
             "q_incremental_new", "q_corpus_compact_parts",
             "q_export_shards"}
pure_w = [k for k in pure if k not in WRITE_OPS]
sw = sum(sq[k] for k in pure_w)
dw = sum(dq[k] for k in pure_w)
sw_adj = sum(max(sq[k] - floor, 0.0) for k in pure_w)
print(f"write-aware pure ({len(pure_w)} queries; {len(pure) - len(pure_w)} "
      f"write-side ops reclassified): spark {sw:.1f}s vs duckdb {dw:.1f}s = "
      f"{sw/dw:.2f}x raw, {sw_adj/dw:.2f}x floor-adjusted")
