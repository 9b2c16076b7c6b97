#!/bin/bash
# Round-15 scale campaign (VERDICT r14 asks #1/#2/#4/#6/#7):
#
# Stage 0  sf0.1 delta recording (4 passes): queries whose plans changed
#          (containment_stratified now probes the sig-row store half) or
#          are new (interval_topk, image_stats), PLUS the four v12 noise
#          movers flagged for re-audit (kmv_overlap, join_maintenance,
#          assoc_rules, repeat_affinity — VERDICT r14 ask #6).
# Stage 1  FULL set at sf1, 2-pass min.
# Stage 2  FULL set at sf10, 2-pass min. Named skips unchanged from r14
#          (pinned small-corpus fixtures whose scaled twins run in-set +
#          interval_join, whose bounded enumerating twin interval_topk
#          NOW RUNS in the set).
# Stage 3  ETL pipeline scale + ONE sf10 calendar day through the JDBC
#          (Derby) DELETE+COPY sink (ask #7).
# Stage 4  (separate, long) sf100 documents campaign on the DISK-RESIDENT
#          store — see sf100 invocation at the bottom; run standalone.
set -e
set -o pipefail
cd /root/repo
mkdir -p tools/r15_runs

# Changed plans: containment_stratified (sig-row store), the whole
# kmeans-argmax family (max_by rewrite), the two new queries, plus the
# four v12 noise movers under re-audit.
DELTA="containment_stratified,interval_topk,image_stats,kmv_overlap,join_maintenance,assoc_rules,repeat_affinity,kmeans_assign,embedding_decontaminate,ann_topk_ivf,ann_topk_ivf_multiprobe,knn_join,knn_join_scaled,semantic_dedup,semantic_dedup_scaled,hard_negatives,hard_negatives_scaled,embedding_near_dup,semdedup_ingest_replay"
# interval_topk joins interval_join on the sf10 skip list: its OUTPUT is
# linear (<= k*|sessions|) but its candidate stream is the same
# density-quadratic bucket join (~135B candidate rows at sf10, hours of
# streaming); interval_count remains the linear census twin. Named in
# BASELINE.md r15 with the measured sf1 ladder (window 182s -> heap 113s
# vs 21s enumeration floor) and the global time-merge design note.
SKIP_SF10="interval_join,interval_topk,knn_join,hard_negatives,semantic_dedup"

echo "== stage 0: sf0.1 r15-delta recording (4 passes) =="
SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 \
SPARK_GRAFT_BENCH_PASSES=4 \
SPARK_GRAFT_BENCH_ONLY="$DELTA" \
SPARK_GRAFT_BENCH_FULL=/root/repo/tools/r15_runs/delta_sf01.json \
  sbt -batch "runMain graft.Bench" 2>&1 | tail -2

echo "== stage 1: FULL set sf1 (2 passes) =="
SPARK_GRAFT_SF_DIR=/root/repo/scale-data/sf1 \
SPARK_GRAFT_BENCH_PASSES=2 \
SPARK_GRAFT_BENCH_FULL=/root/repo/tools/r15_runs/full_sf1.json \
  sbt -batch "runMain graft.Bench" 2>&1 | tail -2

echo "== stage 2: FULL set sf10 (2 passes, named skips) =="
SPARK_GRAFT_SF_DIR=/root/repo/scale-data/sf10 \
SPARK_GRAFT_BENCH_PASSES=2 \
SPARK_GRAFT_BENCH_SKIP="$SKIP_SF10" \
SPARK_GRAFT_BENCH_FULL=/root/repo/tools/r15_runs/full_sf10.json \
  sbt -batch "runMain graft.Bench" 2>&1 | tail -2

echo "== stage 3: ETL pipeline scale + sf10 JDBC day =="
SPARK_GRAFT_PIPE_JDBC=1 \
  sbt -batch "runMain graft.PipelineScale" 2>&1 | grep PIPESCALE \
  | tee /root/repo/tools/r15_runs/pipescale.txt

echo "done (run the sf100 stage separately — it is hours-long):"
echo '  SPARK_GRAFT_SF_DIR=/root/repo/scale-data/sf100 \'
echo '  SPARK_GRAFT_BENCH_PASSES=2 \'
echo '  SPARK_GRAFT_BENCH_ONLY="near_dup_minhash,containment_near_dup,containment_stratified,probe_near_dups,ngram_jaccard" \'
echo '  SPARK_GRAFT_STORE_DIR=/root/repo/scale-data/stores_sf100 \'
echo '  SPARK_GRAFT_BENCH_FULL=/root/repo/tools/r15_runs/sf100_disk.json \'
echo '  sbt -batch "runMain graft.Bench"'
