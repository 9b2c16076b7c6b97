#!/bin/bash
# Round-14 scale campaign (VERDICT r13 asks #1-#7): the recurring
# full-set protocol, now SKIP-FREE at sf10 — every r13 skip's scaled
# twin is declared (hard_negatives_scaled, embedding_near_dup re-based
# on scaled cells) or its linear aggregate twin runs (interval_count),
# so the named-skip list shrinks to the three PINNED SMALL-CORPUS
# FIXTURES whose scaled twins run in the same set (knn_join /
# hard_negatives / semantic_dedup: Sigma|cell|^2 = n^2/10 by declared
# contract — their production forms are the *_scaled queries) and
# interval_join (output-bound: 163B result rows at sf10; interval_count
# is the declared linear twin).
#
# Stage 0  sf0.1 re-record of queries whose plans changed this round
#          (BASELINE v12 table), 4-pass min.
# Stage 1  FULL set at sf1, 2-pass min.
# Stage 2  FULL set at sf10, 2-pass min, named skips above.
# Stage 3  ETL pipeline scale exercise (PipelineScale calendar).
set -e
set -o pipefail
cd /root/repo
mkdir -p tools/r14_runs

DELTA="near_dup_minhash,containment_near_dup,containment_stratified,dup_groups,near_dup_retain,dup_rate_by_source,dup_size_hist,source_overlap,dedup_incremental,probe_near_dups,leakage_safe_split,corpus_manifest,embedding_near_dup,hard_negatives_scaled,q2_min_cost_supp,q9_product_profit,q11_important_stock,q16_supplier_cnt,q20_promotion_suppliers"
SKIP_SF10="interval_join,knn_join,hard_negatives,semantic_dedup"

echo "== stage 0: sf0.1 r14-delta recording (4 passes) =="
SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 \
SPARK_GRAFT_BENCH_PASSES=4 \
SPARK_GRAFT_BENCH_ONLY="$DELTA" \
SPARK_GRAFT_BENCH_FULL=/root/repo/tools/r14_runs/delta_sf01.json \
  sbt -batch "runMain graft.Bench" 2>&1 | tail -2

echo "== stage 1: FULL set sf1 (2 passes) =="
SPARK_GRAFT_SF_DIR=/root/repo/scale-data/sf1 \
SPARK_GRAFT_BENCH_PASSES=2 \
SPARK_GRAFT_BENCH_FULL=/root/repo/tools/r14_runs/full_sf1.json \
  sbt -batch "runMain graft.Bench" 2>&1 | tail -2

echo "== stage 2: FULL set sf10 (2 passes, named skips) =="
SPARK_GRAFT_SF_DIR=/root/repo/scale-data/sf10 \
SPARK_GRAFT_BENCH_PASSES=2 \
SPARK_GRAFT_BENCH_SKIP="$SKIP_SF10" \
SPARK_GRAFT_BENCH_FULL=/root/repo/tools/r14_runs/full_sf10.json \
  sbt -batch "runMain graft.Bench" 2>&1 | tail -2

echo "== stage 3: ETL pipeline scale (PipelineScale) =="
sbt -batch "runMain graft.PipelineScale" 2>&1 | grep PIPESCALE \
  | tee /root/repo/tools/r14_runs/pipescale.txt

echo "done"
