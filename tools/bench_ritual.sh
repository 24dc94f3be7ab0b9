#!/bin/bash
# Round-17 measurement ritual (kept from r16, VERDICT #6): N full bench
# runs, each saving its bench_out.json; the composite (per-query min over
# CLEAN runs) is folded afterwards by tools/fold_composite.py.
set -u
N="${1:-5}"
OUT="${2:-/tmp/bench_r17_runs}"
mkdir -p "$OUT"
for i in $(seq 1 "$N"); do
  echo "=== ritual run $i/$N $(date +%T) loadavg: $(cut -d' ' -f1-3 /proc/loadavg)"
  SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 sbt -batch "runMain graft.Bench" \
    > "$OUT/bench_run$i.log" 2>&1
  cp bench_out.json "$OUT/bench_out_run$i.json"
  grep -o '"value":[0-9.]*\|"contended":[a-z]*\|"probe_ref":[0-9.]*' \
    "$OUT/bench_run$i.log" | head -3
done
