#!/usr/bin/env bash
# Regenerate the per-class retry-ceiling reference for Bench.
#
# One Bench run at sf0.01 records each query's small-scale cost as a flat
# {"name": sec} map in tools/bench_ref_sf0.01.json (committed). The
# official sf0.1 run then retries a query only above
# max(flat base, 4 x its sf0.01 time) — so the ~10 legitimately-heavy
# legs (g1/g2/st22/em_snapshots/...) stop paying a wasted third pass
# every round, while map-only queries keep the tight 2 s expectation.
#
# Rerun after adding queries or materially changing a heavy leg's plan;
# Bench falls back to the flat ceiling for queries missing from the ref,
# so a stale file is safe, just slightly wasteful.
#
# Usage: tools/gen_bench_ref.sh
set -euo pipefail
cd "$(dirname "$0")/.."

SPARK_GRAFT_SF_DIR=/root/testdata/sf0.01 SPARK_GRAFT_CPUS=32 \
  sbt -batch "runMain graft.Bench" | grep '"metric":"total_full"' \
  | sed 's/^\[info\] //' > /tmp/bench_ref_raw.json

python3 - <<'EOF'
import json
with open("/tmp/bench_ref_raw.json") as f:
    full = json.loads(f.read())
# build:* entries are FrameMemo build charges (round 16), not retryable
# queries — they carry no ceiling and must not enter the ref
qs = {k: round(v, 4) for k, v in full["queries"].items()
      if v >= 0 and not k.startswith("build:")}
with open("tools/bench_ref_sf0.01.json", "w") as f:
    json.dump(qs, f, indent=0, sort_keys=True)
print(f"wrote tools/bench_ref_sf0.01.json with {len(qs)} queries")
EOF
