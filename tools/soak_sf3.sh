#!/bin/bash
# sf3 scale-rung soak gate (round 17, widened round 18): the guarded
# stateful tiers (incremental dedup, blocked ER, prefix-filter
# similarity, cross-corpus near-dup, SemDeDup — now BOTH arms: x36's
# exact verification baseline and x131's production LSH path) plus the
# remaining superlinear-risk tiers (interval-overlap join x91, quantile/
# grouped profiles x109/x122, rangejoin rewrites x100/x103, textrank
# x75) at 30x sf0.1 — one rung past the round-loop sf1 soak, probing the
# budgets/bucket caps/manifest growth that sf1 cannot.
#
# Generates the deterministic sf3 data if absent (tools/gen_sf1.py with
# K=30), runs the subset once at 32 threads / 48 GB heap, and judges the
# artifact with tools/soak_gate.py's SF3_BUDGETS: per-query ceilings,
# zero disk spill, every query must complete, host calibration stable.
#
# Usage: tools/soak_sf3.sh [outJson=target/soak_sf3.json]
set -e
cd "$(dirname "$0")/.."
SF3="${SPARK_GRAFT_SF3_DIR:-/tmp/sfdata/sf3}"
if [ ! -f "$SF3/lineitem.parquet" ]; then
  echo "[soak-sf3] generating sf3 data at $SF3"
  python3 tools/gen_sf1.py "$SF3" 30
fi
OUT="${1:-target/soak_sf3.json}"
ERR="${OUT%.json}.err"
mkdir -p "$(dirname "$OUT")"
# x36 (the exact O(n^2) SemDeDup verification arm) is DELIBERATELY not
# in the rung: it cost 65-99s of every run to exercise a
# contract-documented verification-only plan. Its exact-vs-LSH parity
# law is asserted by tools/run.sh graft.tools.SemDedupParitySf1 (sf1,
# once per round) + SimilaritySpec's planted-cluster spec; x131 carries
# the production LSH path's sf3 budget.
ONLY='^(x42_|x74_|x115_|x127_|x63_|x26_|x94_|x131_|x91_|x109_|x122_|x100_|x103_|x75_)'
echo "[soak-sf3] benching the stateful-tier subset at $SF3"
SPARK_GRAFT_SF_DIR="$SF3" SPARK_GRAFT_CPUS=32 \
SPARK_GRAFT_REPEATS="${SPARK_GRAFT_REPEATS:-2}" \
SPARK_DRIVER_MEM="${SPARK_DRIVER_MEM:-48g}" \
SPARK_GRAFT_CALIBRATE_EACH=1 \
SPARK_GRAFT_ONLY="$ONLY" SPARK_GRAFT_BENCH_OUT="$OUT" \
  tools/run.sh graft.Bench 2> "$ERR" > /dev/null || {
    echo "[soak-sf3] bench CRASHED (OOM?) — gate FAIL"; tail -5 "$ERR"; exit 1; }
python3 tools/soak_gate.py "$OUT" "$ERR" sf3
