#!/bin/bash
# x1000 streaming-admission battery (builder-side, round 14).
#
# Round 13 recorded the exact-mode x1000 point (7 247 docs/s rising);
# near and semantic stalled on the disk findings, and refresh mode (the
# quantizer lifecycle) only had the x300 swap. With zstd I/O +
# checkpoint-unpinned memos landed, this runs the three missing x1000
# rows back-to-back in one window, bs=16000 throughout (the grid's
# batch size):
#   refresh  — no pre-trained quantizer; k grows sqrt(n) with staleness
#              swaps mid-stream (expected swap ladder at ~63k/254k/1.0M
#              indexed rows -> k 252/504/1008, all tree-built past
#              FlatKMax); swap walls recorded per-event.
#   near     — MinHash/LSH band admission over 5M docs (313 batches).
#   semantic — offline IMI-tree quantizer at uncapped k = sqrt(2M) ~ 1415
#              (the cluster setting), then per-batch list-pruned cosine.
#
# Each run prints its persisted bench/admission-<mode>-<ts>.json path;
# decay flags come from tools/admission_flags.py on those records.
#
# Usage: tools/x1000_admission.sh <fixture-dir> [modes]
set -euo pipefail
cd /root/repo

FIX="${1:?fixture dir}"
MODES="${2:-refresh near semantic}"
OUT="target/x1000_admission"
mkdir -p "$OUT"

for MODE in $MODES; do
  echo "=== x1000 admission: $MODE ==="
  KCAP_ENV=()
  if [ "$MODE" = semantic ]; then KCAP_ENV=(SPARK_GRAFT_KCAP=2000000); fi
  env SPARK_DRIVER_MEM=48g \
    SPARK_GRAFT_SF_DIR="$FIX" \
    SPARK_GRAFT_MODE="$MODE" \
    SPARK_GRAFT_BATCH_SIZES=16000 \
    SPARK_GRAFT_EXTRA_JAVA_OPTS="-Dspark.network.timeout=600s" \
    "${KCAP_ENV[@]}" \
    tools/bench_direct.sh graft.AdmissionBench \
    >"$OUT/$MODE.out" 2>"$OUT/$MODE.err" || {
      echo "$MODE FAILED; stderr tail:"; tail -8 "$OUT/$MODE.err"; exit 1; }
  grep -o '\[admission\] record .*' "$OUT/$MODE.err" | tail -1
  tail -2 "$OUT/$MODE.out"
done
