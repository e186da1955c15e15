#!/usr/bin/env bash
# Round-16 scale-battery re-capture at the final HEAD (the routed-path
# fixes in a776e6e change the measured code for these batteries only;
# sf0.1 + both anchors exercise sub-gate direct paths and keep their
# 64166fe capture).
set -euo pipefail
cd "$(dirname "$0")/.."
wipe_index_dirs() {
  (cd /tmp && for d in graft_*; do
    case "$d" in graft_sf1|graft_sf1_skew|graft_sf10) ;; *) rm -rf "$d";; esac
  done)
}
bench() {
  local sfdir="$1" out="$2"; shift 2
  SPARK_GRAFT_SF_DIR="$sfdir" SPARK_GRAFT_CPUS=32 \
    sbt -batch "runMain graft.Bench $*" 2>&1 | grep '"metric":"total_full"' \
    | tail -1 | sed 's/^\[info\] //' > "$out"
  python3 -c "import json,sys; d=json.load(open('$out')); \
print('$out', d['battery'], d['sf'], len(d['queries']), round(d['value'],2), 's')"
}
INDEX_FILTER="q_ann_ivf,q_ann_ivf_append,q_ann_ivfpq,q_ann_lsh,q_ann_pq,q_bloom_gate,q_bloom_occupancy,q_bm25_append,q_bm25_batch,q_bm25_index,q_dedup_compact,q_dedup_index,q_dedup_ingest,q_dedup_minhash,q_dedup_minhash_collapsed,q_dedup_simhash,q_dedup_simhash_collapsed,q_embedding_neardup,q_embedding_neardup_collapsed,q_hard_negatives_ivf,q_pq_recon,q_rrf_ivf,q_semdedup"
echo "== recapture at HEAD $(git rev-parse --short HEAD)"
python3 scripts/make_frozen.py --check
wipe_index_dirs; bench "$(pwd)/frozen" BENCH_frozen_r16.json
wipe_index_dirs; bench /tmp/graft_sf1 BENCH_sf1_r16.json
wipe_index_dirs; bench /tmp/graft_sf1_skew BENCH_sf1_skew_r16.json
bench /tmp/graft_sf1 BENCH_sf1_exact_r16.json --exact q_hard_negatives,q_rrf,q_hard_negatives_ivf,q_rrf_ivf
wipe_index_dirs; bench /tmp/graft_sf1 BENCH_sf1_index_r16.json "$INDEX_FILTER"
wipe_index_dirs; bench /tmp/graft_sf10 BENCH_sf10_index_r16.json "$INDEX_FILTER"
echo "== recapture complete at HEAD $(git rev-parse --short HEAD)"
