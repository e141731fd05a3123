#!/bin/bash
# Drives the 100x frontier probe ONE QUERY PER JVM.
#
# Why not one JVM for the whole panel: when the gate-derived timebox
# cancels a hot-bucket join, the generated sort-merge inner loop keeps
# evaluating candidate pairs with no kill-flag check — interrupt-immune
# zombie tasks that burn full cores for hours and poison every later
# measurement in the process (observed live at 100x). Process death is
# the only clean isolation, so each panel query runs in its own
# `sbt -error runMain` with SPARK_GRAFT_SCALE_ONLY, and the TSV sidecar
# (/tmp/graft_scale100_progress.tsv) carries completed rows across runs.
# A final consolidation run rewrites BENCH_SCALE100.json from the full
# sidecar. Re-running the script resumes: sidecar rows are skipped.
set -u
cd "$(dirname "$0")/.."

# At 100x one local JVM stands in for an entire cluster; the default 8g
# (-> 256 MB per local[32] task) is far below any realistic executor and
# OOMed the containment verify. 48g = 1.5 GB/core, ordinary executor
# sizing, on a 128 GiB box.
export SPARK_DRIVER_MEM="${SPARK_GRAFT_SCALE100_MEM:-48g}"

# Must match ScaleBench100.Panel (cheapest-first).
PANEL="cdc_merge_apply_bucketed corpus_pack_shards cdc_merge_apply
text_bpe_merges
agg_incremental_revenue dedup_incremental sim_ivf_incremental
corpus_incremental_curation sim_ivfpq_topk sim_knn_join
dedup_char_jaccard_clusters_lsh dedup_containment_report_lsh
dedup_clusters_incremental dedup_char_lsh_skewed dedup_edit_pairs
dedup_edit_clusters dedup_jaccard_pairs dedup_containment
dedup_containment_report dedup_containment_incremental
dedup_funnel_report dedup_semantic_pairs
dedup_char_jaccard_pairs dedup_char_jaccard_posting
dedup_char_jaccard_clusters dedup_clusters_chain dedup_semantic_clusters"
SIDECAR="${SPARK_GRAFT_SCALE100_PROGRESS:-/tmp/graft_scale100_progress.tsv}"

for q in $PANEL; do
  if grep -q "^$q	" "$SIDECAR" 2>/dev/null; then
    echo "[drive] $q already in sidecar, skipping" >&2
    continue
  fi
  echo "[drive] $(date +%H:%M:%S) measuring $q" >&2
  SPARK_GRAFT_SCALE_ONLY="$q" sbt -error "runMain graft.ScaleBench100" \
    || echo "[drive] $q run exited rc=$? (row recorded by the probe if it got that far)" >&2
done

echo "[drive] $(date +%H:%M:%S) consolidating artifact" >&2
sbt -error "runMain graft.ScaleBench100"
