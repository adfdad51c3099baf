#!/bin/bash
# Round-loop bench gate: bench the CURRENT build and fail (non-zero exit)
# on any >threshold like-for-like per-query regression vs the newest
# committed BENCH_LOCAL_r*.json artifact. Run this before ending a round
# (and after any plan-shape-touching commit) so a late change cannot land
# unbenched and undiffed — see BenchDiff's scaladoc for the comparison
# rules (sub-0.2s queries and spread-flagged numbers never fail the gate).
#
# Usage: tools/bench_gate.sh [threshold]   # default 1.5
# Env:   SPARK_GRAFT_SF_DIR (default sf0.1), SPARK_GRAFT_REPEATS (default 5),
#        SPARK_GRAFT_ONLY to gate a subset while iterating.
set -e
cd "$(dirname "$0")/.."
# numeric sort on the round number: a lexicographic (or mis-keyed) sort
# ranks r8 above r13 and silently diffs against a stale baseline
BASE=$(ls BENCH_LOCAL_r*.json 2>/dev/null \
  | sed 's/.*_r\([0-9]*\)\.json/\1 &/' | sort -n | tail -1 | cut -d' ' -f2)
if [ -z "$BASE" ]; then echo "no BENCH_LOCAL_r*.json baseline" >&2; exit 2; fi
: "${SPARK_GRAFT_SF_DIR:=/root/testdata/sf0.1}"
: "${SPARK_GRAFT_REPEATS:=5}"
export SPARK_GRAFT_SF_DIR SPARK_GRAFT_REPEATS
echo "bench gate: baseline=$BASE sf=$SPARK_GRAFT_SF_DIR repeats=$SPARK_GRAFT_REPEATS" >&2
tools/run.sh graft.Bench > /dev/null
exec tools/run.sh graft.tools.BenchDiff "$BASE" target/bench.json "${1:-1.5}"
