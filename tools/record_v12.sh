#!/bin/bash
# BASELINE v12 recording (VERDICT r13 ask #7): three SPACED full-set
# sf0.1 bench runs (fresh JVM each; >=60 s gaps to dodge the host's
# noisy-neighbor freeze windows), from which tools/v12_table.py emits
# the med/worst per-query table that replaces the v11+delta patchwork.
set -e
set -o pipefail
cd /root/repo
mkdir -p tools/v12_runs
for i in 1 2 3; do
  echo "== v12 run $i =="
  SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 \
  SPARK_GRAFT_BENCH_PASSES=2 \
  SPARK_GRAFT_BENCH_FULL=/root/repo/tools/v12_runs/run$i.json \
    sbt -batch "runMain graft.Bench" 2>&1 | tail -1
  [ "$i" -lt 3 ] && sleep 75
done
echo "done"
