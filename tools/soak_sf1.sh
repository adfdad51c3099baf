#!/bin/bash
# Round-loop sf1 scale soak gate (the round-14 soak, made un-skippable).
#
# Generates the deterministic sf1 data if absent (tools/gen_sf1.py: 10
# copies of sf0.1), runs the soak query set once at 32 threads / 48 GB
# heap, and judges the artifact with tools/soak_gate.py: per-query
# wall-clock ceilings, zero disk spill, every query must complete.
# This is the gate that caught the x115 candidate explosion and the x74
# blocking blowup — run it once per round and record the PASS block in
# COVERAGE.md.
#
# Usage: tools/soak_sf1.sh [outJson=target/soak_sf1.json]
set -e
cd "$(dirname "$0")/.."
SF1="${SPARK_GRAFT_SF1_DIR:-/tmp/sfdata/sf1}"
if [ ! -f "$SF1/lineitem.parquet" ]; then
  echo "[soak] generating sf1 data at $SF1"
  python3 tools/gen_sf1.py "$SF1"
fi
OUT="${1:-target/soak_sf1.json}"
ERR="${OUT%.json}.err"
mkdir -p "$(dirname "$OUT")"
# the soak set: the registry's most expensive queries (the round-14
# list) + every query added since; keep in sync with soak_gate BUDGETS.
# DELIBERATELY not soaked (no silent caps — the omission and why):
#  - x129_qgram_recall: a recall-LAW query that by design runs BOTH the
#    exact-baseline arm and an exhaustive q-gram-union arm (17 blocks
#    per record); its sf1 cost is the documented n_blocks*budget work
#    of the diagnostic, not a production operator path. As of round 20
#    its PRODUCTION arm rides the soak as x132_qgram_guarded (same
#    blocking/split keys, same 5995-pair budget, no baseline arm), so
#    a degenerate-block blowup in the guarded q-gram path is gated at
#    sf1 while the recall law stays certified at the oracle SFs.
ONLY='^(x69_|x70_|x44_|x65_|x49_|x89_|x53_|x88_|x42_|x48_|x29_|x75_|x94_|x63_|x43_|x117_|x100_|x91_|x103_|x74_|x115_|x109_|x118_|x119_|x120_|x121_|x122_|x123_|x124_|x125_|x126_|x127_|x128_|x130_|x131_|x132_)'
echo "[soak] benching $(echo "$ONLY" | tr '|' '\n' | wc -l) queries at $SF1"
# min-of-2, not single-shot: the round-19 x117 adjudication showed a
# query's FIRST run in a loaded JVM carries a nondeterministic 2-13x
# transient (x117: solo min-of-5 10.2s, spread 1.07; first-run-after-
# prefix 21-130s across identical quiet-probe runs; repeat runs 10-15s;
# not GC/spill/host/code-cache/compiler-threads — kernel counters clean,
# probes mostly quiet). A REPEATS=1 artifact records that transient as
# the query's cost; min-of-2 records steady state, which is what the
# ceilings are calibrated against.
SPARK_GRAFT_SF_DIR="$SF1" SPARK_GRAFT_CPUS=32 \
SPARK_GRAFT_REPEATS="${SPARK_GRAFT_REPEATS:-2}" \
SPARK_DRIVER_MEM="${SPARK_DRIVER_MEM:-48g}" \
SPARK_GRAFT_CALIBRATE_EACH=1 \
SPARK_GRAFT_ONLY="$ONLY" SPARK_GRAFT_BENCH_OUT="$OUT" \
  tools/run.sh graft.Bench 2> "$ERR" > /dev/null || {
    echo "[soak] bench CRASHED (OOM?) — gate FAIL"; tail -5 "$ERR"; exit 1; }
python3 tools/soak_gate.py "$OUT" "$ERR"
