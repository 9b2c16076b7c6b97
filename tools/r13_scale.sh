#!/bin/bash
# Round-13 scale campaign (VERDICT r12 asks #1-#6):
#   1. heavy-tail re-measure at sf1/sf10 for the re-planned queries
#      (ngram_jaccard 5-gram prefix plan, probe_near_dups hot-band cap)
#      plus the new scaled-cells declared queries.
#   2. FULL set at sf10 (ask #4) minus a NAMED skip list — every skip is
#      a declared-quadratic/output-bound fixture justified in BASELINE.md
#      (no-silent-caps rule): interval_join (output = 163B pairs at sf10;
#      interval_count is its linear stand-in and runs), knn_join /
#      hard_negatives / semantic_dedup (pinned 10-cell fixture,
#      Sigma|cell|^2 = n^2/10 = 4e9 pairs at sf10 — the scaled-cells
#      twins knn_join_scaled / semantic_dedup_scaled run instead),
#      embedding_near_dup (label-blocked, 10 labels fixed => n^2/10).
#   3. ETL pipeline scale exercise (ask #6): PipelineScale calendar at
#      sf0.1 / sf1 / sf10.
# All stages 2-pass min, same protocol as the r12 heavy-tail run.
set -e
set -o pipefail
cd /root/repo
mkdir -p tools/r13_runs

HEAVY13="ngram_jaccard,probe_near_dups,knn_join_scaled,semantic_dedup_scaled,semdedup_ingest_replay,quality_by_source,dup_rate_by_source,text_stats"

SKIP_SF10="interval_join,knn_join,hard_negatives,semantic_dedup,embedding_near_dup"

echo "== r13 heavy tail sf1 (2 passes) =="
SPARK_GRAFT_SF_DIR=/root/repo/scale-data/sf1 \
SPARK_GRAFT_BENCH_PASSES=2 \
SPARK_GRAFT_BENCH_ONLY="$HEAVY13" \
SPARK_GRAFT_BENCH_FULL=/root/repo/tools/r13_runs/heavy_sf1.json \
  sbt -batch "runMain graft.Bench" 2>&1 | tail -2

echo "== r13 FULL set sf10 (2 passes, named skips) =="
SPARK_GRAFT_SF_DIR=/root/repo/scale-data/sf10 \
SPARK_GRAFT_BENCH_PASSES=2 \
SPARK_GRAFT_BENCH_SKIP="$SKIP_SF10" \
SPARK_GRAFT_BENCH_FULL=/root/repo/tools/r13_runs/full_sf10.json \
  sbt -batch "runMain graft.Bench" 2>&1 | tail -2

echo "== ETL pipeline scale (PipelineScale, 5-day calendar + replay) =="
sbt -batch "runMain graft.PipelineScale" 2>&1 | grep PIPESCALE \
  | tee /root/repo/tools/r13_runs/pipescale.txt

echo "done"
