#!/bin/bash
# BASELINE v11 recording orchestration (VERDICT r11 ask #1 + #2).
# Three spaced fresh-JVM 4-pass full-set Bench runs at sf0.1; spacing
# between runs is the sf1/sf10 ScaleUp generation and the sf1 heavy-tail
# run — several minutes of unrelated load each, per the v10 protocol.
# Each stage appends to /root/repo/tools/v11_runs/ as its own JSON.
set -e
set -o pipefail
cd /root/repo
mkdir -p tools/v11_runs

run_bench() { # $1=outfile $2=sfdir $3=passes $4=only(optional)
  local envs=(SPARK_GRAFT_SF_DIR="$2" SPARK_GRAFT_BENCH_PASSES="$3" \
              SPARK_GRAFT_BENCH_FULL="/root/repo/tools/v11_runs/$1")
  [ -n "$4" ] && envs+=(SPARK_GRAFT_BENCH_ONLY="$4")
  env "${envs[@]}" sbt -batch "runMain graft.Bench" 2>&1 | tail -2
}

echo "== v11 run 1 (sf0.1 full set, 4 passes) =="
run_bench v11_run1.json /root/testdata/sf0.1 4

echo "== spacing: ScaleUp sf1 =="
SPARK_GRAFT_SCALE_FACTOR=10 SPARK_GRAFT_SCALE_DST=/root/repo/scale-data/sf1 \
  sbt -batch "runMain graft.ScaleUp" 2>&1 | tail -1

echo "== v11 run 2 (sf0.1 full set, 4 passes) =="
run_bench v11_run2.json /root/testdata/sf0.1 4

echo "== spacing: ScaleUp sf10 =="
SPARK_GRAFT_SCALE_FACTOR=100 SPARK_GRAFT_SCALE_DST=/root/repo/scale-data/sf10 \
  sbt -batch "runMain graft.ScaleUp" 2>&1 | tail -1

echo "== v11 run 3 (sf0.1 full set, 4 passes) =="
run_bench v11_run3.json /root/testdata/sf0.1 4

echo "done"
