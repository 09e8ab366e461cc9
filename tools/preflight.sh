#!/usr/bin/env bash
# Pre-flight correctness gate: run the FULL query inventory through
# graft.Verify and the DuckDB oracle compare at every SF the driver owns.
# Catches driver-side fixture regenerations (e.g. the r05 events.parquet
# timestamp re-encoding) BEFORE the round's driver check does.
#
# Usage: tools/preflight.sh [sf ...]   (default: 0.001 0.01 0.1)
set -euo pipefail
cd "$(dirname "$0")/.."
sfs=("${@:-0.001 0.01 0.1}")
[ $# -eq 0 ] && sfs=(0.001 0.01 0.1)
for sf in "${sfs[@]}"; do
  out="/tmp/graft_preflight_sf${sf}"
  rm -rf "$out"
  echo "== Verify sf$sf -> $out"
  sbt -batch "set Compile/run/fork := true" \
    "runMain graft.Verify /root/testdata/sf$sf $out" >/dev/null
  python3 tools/compare_oracle.py "/root/testdata/sf$sf" "$out" | tail -1
done
