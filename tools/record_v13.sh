#!/bin/bash
# BASELINE v13 recording (VERDICT r15 ask #2): five SPACED full-set
# sf0.1 bench runs (fresh JVM each; >=75 s gaps to dodge the host's
# noisy-neighbor freeze windows), 2-pass minima — the exact v12
# protocol — from which tools/v13_table.py emits the med/worst
# per-query table and audits every query against its v12 median.
# Purpose: adjudicate BENCH_r15's uniform ~15% drift on untouched
# plans (host state vs real regression) and re-base the table on the
# r16 plans (interval_topk merge form, image_stats ASCII gate,
# ann_store_replay new).
set -e
set -o pipefail
cd /root/repo
mkdir -p tools/v13_runs
for i in 1 2 3 4 5; do
  echo "== v13 run $i =="
  SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 \
  SPARK_GRAFT_BENCH_PASSES=2 \
  SPARK_GRAFT_BENCH_FULL=/root/repo/tools/v13_runs/run$i.json \
    sbt -batch "runMain graft.Bench" 2>&1 | tail -1
  [ "$i" -lt 5 ] && sleep 75
done
echo "done"
