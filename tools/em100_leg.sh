#!/usr/bin/env bash
# x100 EM-DAG correctness leg as a per-round committed artifact.
#
# The EM model queries scale their fixture feeds with the sf marker in the
# data-dir NAME (EmModelQueries.multiplierFor: sf0.01 -> x1, sf0.1 -> x10,
# sf1 -> x100). This script builds the sf1 fixture dir (LLM tables tiled
# 10x from sf0.1, TPC-H tables symlinked — tools/gen_scale.py), replays
# every em_* board entry at the x100 fixture scale, and records the DuckDB
# compare as EM100_r<N>.json in CORRECTNESS_r<N>.json format.
#
# Usage: tools/em100_leg.sh <round>     # e.g. tools/em100_leg.sh 7
set -euo pipefail
cd "$(dirname "$0")/.."
ROUND="${1:?usage: em100_leg.sh <round>}"
SF1_DIR=/tmp/graft_sf1
OUT_DIR=/tmp/verify_em100

if [ ! -f "$SF1_DIR/events.parquet" ] && [ ! -d "$SF1_DIR/events.parquet" ]; then
  python3 tools/gen_scale.py sf1 /root/testdata/sf0.1 "$SF1_DIR"
fi

# every em_-prefixed board entry (the scalar-suite/fiscal/surrogate ones
# live outside EmModelQueries.scala; their TPC-H inputs are symlinked at
# source scale — the x100 axis is the EM fixture feeds)
EM_QUERIES=$(grep -ho '"em_[a-z_0-9]*" ->' src/main/scala/graft/queries/*.scala \
  | grep -o 'em_[a-z_0-9]*' | sort -u | paste -sd, -)
echo "[em100] queries: $EM_QUERIES"

SPARK_GRAFT_CPUS=16 sbt -batch "runMain graft.Verify $SF1_DIR $OUT_DIR $EM_QUERIES" \
  | tail -2
python3 tools/check_oracle.py "$SF1_DIR" "$OUT_DIR" --json "EM100_r${ROUND}.json"
echo "[em100] wrote EM100_r${ROUND}.json"
