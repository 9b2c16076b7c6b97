#!/bin/bash
# Round-13 scale campaign (VERDICT r12 asks #1-#6). The r13 generator
# fix (ScaleUp suffix removal) changes the documents corpus, so ALL
# document-query scale numbers re-measure this round: stage 1 records a
# fresh full-set sf1 denominator, stage 2 the full-set sf10 numerator.
#
# Stage 0  sf0.1 re-record of the queries whose plans changed this
#          round (new BASELINE v12-delta rows), 4-pass min.
# Stage 1  FULL set at sf1, 2-pass min (includes interval_join — its
#          1.6B-pair output is feasible at sf1).
# Stage 2  FULL set at sf10, 2-pass min, minus a NAMED skip list —
#          every skip is a declared-quadratic/output-bound fixture
#          justified in BASELINE.md (no-silent-caps rule):
#            interval_join      output = 163B pairs at sf10; its linear
#                               aggregate twin interval_count runs
#            knn_join           pinned 10-cell fixture: Sigma|cell|^2 =
#            hard_negatives     n^2/10 = 4e9 pairs at sf10; the scaled
#            semantic_dedup     twins knn_join_scaled /
#                               semantic_dedup_scaled run instead
#            embedding_near_dup label-blocked (10 labels fixed) =>
#                               n^2/10 pair volume, same class
# Stage 3  ETL pipeline scale exercise: PipelineScale 5-day calendar +
#          idempotent replay at sf0.1 / sf1 / sf10.
set -e
set -o pipefail
cd /root/repo
mkdir -p tools/r13_runs

DELTA="ngram_jaccard,probe_near_dups,knn_join_scaled,semantic_dedup_scaled,semdedup_ingest_replay"
SKIP_SF10="interval_join,knn_join,hard_negatives,semantic_dedup,embedding_near_dup"

echo "== stage 0: sf0.1 v12-delta recording (4 passes) =="
SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 \
SPARK_GRAFT_BENCH_PASSES=4 \
SPARK_GRAFT_BENCH_ONLY="$DELTA" \
SPARK_GRAFT_BENCH_FULL=/root/repo/tools/r13_runs/delta_sf01.json \
  sbt -batch "runMain graft.Bench" 2>&1 | tail -2

echo "== stage 1: FULL set sf1 (2 passes) =="
SPARK_GRAFT_SF_DIR=/root/repo/scale-data/sf1 \
SPARK_GRAFT_BENCH_PASSES=2 \
SPARK_GRAFT_BENCH_FULL=/root/repo/tools/r13_runs/full_sf1.json \
  sbt -batch "runMain graft.Bench" 2>&1 | tail -2

echo "== stage 2: FULL set sf10 (2 passes, named skips) =="
SPARK_GRAFT_SF_DIR=/root/repo/scale-data/sf10 \
SPARK_GRAFT_BENCH_PASSES=2 \
SPARK_GRAFT_BENCH_SKIP="$SKIP_SF10" \
SPARK_GRAFT_BENCH_FULL=/root/repo/tools/r13_runs/full_sf10.json \
  sbt -batch "runMain graft.Bench" 2>&1 | tail -2

echo "== stage 3: ETL pipeline scale (PipelineScale) =="
sbt -batch "runMain graft.PipelineScale" 2>&1 | grep PIPESCALE \
  | tee /root/repo/tools/r13_runs/pipescale.txt

echo "done"
