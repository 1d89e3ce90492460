#!/usr/bin/env bash
# Adversarial-skew gate as a per-round committed artifact (SKEW_r<N>.json).
#
# Builds the hot-key corpus (tools/gen_scale.py skew: 20% of docs share
# one template paragraph + one hot source; 20% of embeddings collapse to
# ~0.95 cosine of one direction), runs graft.SkewBench on clean sf0.1 and
# on the skew corpus, and gates through tools/check_skew.py on the
# DETERMINISTIC candidate-pair census: the operators' default guards
# (shingle maxDf, LSH maxBucket, SemDeDup maxCell) must keep the admitted
# shuffle volume within 3x of the clean corpus, while the uncapped volume
# must still blow up >=5x (proof the fixture stayed adversarial — the
# round-4 measurement read x305 on the shingle join).
#
# Usage: tools/skew_leg.sh <round>
set -euo pipefail
cd "$(dirname "$0")/.."
ROUND="${1:?usage: skew_leg.sh <round>}"

SF01=/root/testdata/sf0.1
SKEW_DIR=/tmp/graft_skew

if [ ! -f "$SKEW_DIR/documents.parquet" ] && [ ! -d "$SKEW_DIR/documents.parquet" ]; then
  python3 tools/gen_scale.py skew "$SF01" "$SKEW_DIR"
  # SkewBench's t11/x7 legs read the full table set; non-skewed tables
  # come straight from the source dir
  for f in "$SF01"/*.parquet; do
    base=$(basename "$f")
    [ -e "$SKEW_DIR/$base" ] || ln -s "$f" "$SKEW_DIR/$base"
  done
fi

SPARK_GRAFT_CPUS=32 sbt -batch "runMain graft.SkewBench $SF01" \
  | sed 's/^\[info\] //' | grep -E '^\{' > /tmp/skew_clean.jsonl
SPARK_GRAFT_CPUS=32 sbt -batch "runMain graft.SkewBench $SKEW_DIR" \
  | sed 's/^\[info\] //' | grep -E '^\{' > /tmp/skew_skew.jsonl

set +e
python3 tools/check_skew.py /tmp/skew_clean.jsonl /tmp/skew_skew.jsonl \
  --json "SKEW_r${ROUND}.json" --round "$ROUND"
rc=$?
set -e
echo "[skew] wrote SKEW_r${ROUND}.json (rc=$rc)"
exit $rc
