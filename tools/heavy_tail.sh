#!/bin/bash
# sf1 + sf10 heavy-tail timing (VERDICT r11 ask #2): the ~19 most
# scale-exposed queries (dedup pair family, corpus prep, interval/knn
# class, map-only linear floors) measured at 10x and 100x the baseline
# corpus. 2-pass min per query, same protocol as the r11 sf1 recording.
# knn_join/hard_negatives are excluded: the declared 10-cell fixture is
# quadratic-bound at sf10 (4.0e9 pairs) and the scaled-cells knob is
# already measured in BASELINE.md "ANN cell-count knob". interval_join
# is measured at sf1 only: its OUTPUT is 1.627B pairs at sf1 growing
# exactly 100x per decade (BASELINE.md), so the sf10 run would spend
# ~an hour materializing 163B pairs the plan is provably linear in;
# interval_count is its linear stand-in at every scale.
set -e
set -o pipefail
cd /root/repo
mkdir -p tools/v11_runs

HEAVY="containment_stratified,containment_near_dup,ngram_jaccard,near_dup_minhash,near_dup_simhash,probe_near_dups,dedup_incremental,source_overlap,corpus_manifest,line_dedup,dup_spans,bigram_lm_score,quality_filter,quality_by_source,text_stats,weighted_sample,semdedup_ingest_replay,repeat_affinity,interval_count"

echo "== heavy tail sf1 (2 passes, + interval_join) =="
SPARK_GRAFT_SF_DIR=/root/repo/scale-data/sf1 \
SPARK_GRAFT_BENCH_PASSES=2 \
SPARK_GRAFT_BENCH_ONLY="$HEAVY,interval_join" \
SPARK_GRAFT_BENCH_FULL=/root/repo/tools/v11_runs/heavy_sf1.json \
  sbt -batch "runMain graft.Bench" 2>&1 | tail -2

echo "== heavy tail sf10 (2 passes) =="
SPARK_GRAFT_SF_DIR=/root/repo/scale-data/sf10 \
SPARK_GRAFT_BENCH_PASSES=2 \
SPARK_GRAFT_BENCH_ONLY="$HEAVY" \
SPARK_GRAFT_BENCH_FULL=/root/repo/tools/v11_runs/heavy_sf10.json \
  sbt -batch "runMain graft.Bench" 2>&1 | tail -2

echo "done"
