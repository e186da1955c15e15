#!/usr/bin/env bash
# Round-12 end-of-round artifact regeneration — ONE session at ONE HEAD.
# Order: correctness gate first (fails fast), then the bench ladder
# (sf0.1 -> sf1 -> sf1 skew -> sf1 exact -> sf1/sf10 index family),
# then the DuckDB anchor. Index paths are wiped before the batteries
# AND again before each index-family run so every build is fresh.
set -euo pipefail
cd "$(dirname "$0")/.."

wipe_index_dirs() {
  (cd /tmp && for d in graft_*; do
    case "$d" in graft_sf1|graft_sf1_skew|graft_sf10) ;; *) rm -rf "$d";; esac
  done)
}

bench() { # sfdir outfile [args...]
  local sfdir="$1" out="$2"; shift 2
  SPARK_GRAFT_SF_DIR="$sfdir" SPARK_GRAFT_CPUS=32 \
    sbt -batch "runMain graft.Bench $*" 2>&1 | grep '"metric"' \
    | tail -1 | sed 's/^\[info\] //' > "$out"
  python3 -c "import json,sys; d=json.load(open('$out')); \
print('$out', d['battery'], d['sf'], len(d['queries']), round(d['value'],2), 's')"
}

INDEX_FILTER="q_ann_ivf,q_ann_ivf_append,q_ann_ivfpq,q_ann_lsh,q_ann_pq,q_bloom_gate,q_bloom_occupancy,q_bm25_append,q_bm25_batch,q_bm25_index,q_dedup_compact,q_dedup_index,q_dedup_ingest,q_dedup_minhash,q_dedup_minhash_collapsed,q_dedup_simhash,q_dedup_simhash_collapsed,q_embedding_neardup,q_embedding_neardup_collapsed,q_hard_negatives_ivf,q_pq_recon,q_rrf_ivf,q_semdedup"

echo "== [1/8] full correctness gate at HEAD $(git rev-parse --short HEAD)"
./scripts/gate.sh

echo "== [2/8] BENCH_sf01_r12 (full default battery @ sf0.1)"
wipe_index_dirs
bench /root/testdata/sf0.1 BENCH_sf01_r12.json

echo "== [3/8] BENCH_sf1_r12 (full default battery @ sf1)"
wipe_index_dirs
bench /tmp/graft_sf1 BENCH_sf1_r12.json

echo "== [4/8] BENCH_sf1_skew_r12 (full default battery @ sf1 zipfian skew)"
wipe_index_dirs
bench /tmp/graft_sf1_skew BENCH_sf1_skew_r12.json

echo "== [5/8] BENCH_sf1_exact_r12 (brute-force verify primitives)"
bench /tmp/graft_sf1 BENCH_sf1_exact_r12.json --exact q_hard_negatives,q_rrf,q_hard_negatives_ivf,q_rrf_ivf

echo "== [6/8] BENCH_sf1_index_r12 (index family, fresh builds)"
wipe_index_dirs
bench /tmp/graft_sf1 BENCH_sf1_index_r12.json "$INDEX_FILTER"

echo "== [7/8] BENCH_sf10_index_r12 (index family @ sf10 slice)"
wipe_index_dirs
bench /tmp/graft_sf10 BENCH_sf10_index_r12.json "$INDEX_FILTER"

echo "== [8/8] DuckDB anchor @ sf0.1"
rm -rf /tmp/graft_anchor_out
sbt -batch "runMain graft.Verify /root/testdata/sf0.1 /tmp/graft_anchor_out q_table_scan" >/dev/null 2>&1
python3 scripts/duckdb_anchor.py /root/testdata/sf0.1 \
  /tmp/graft_anchor_out/oracle_sql.json DUCKDB_ANCHOR.json

echo "== artifact set complete at HEAD $(git rev-parse --short HEAD)"
