#!/bin/bash
# Gram-family scaled run with a disk high-water sampler (builder-side):
# runs the gram self-join queries one JVM per query on a scaled fixture
# (spent shuffle clears at JVM exit), sampling filesystem availability
# every 5 s so the committed record carries the shuffle DISK high-water
# mark, not just the wall — the number the x1000 ENOSPC boundary is
# quoted in (SCALING.md §11).
#
# Usage: tools/gram_ladder.sh <fixture-dir> <tag> [queries...]
#   SPARK_DRIVER_MEM (default 48g), SPARK_GRAFT_MEMO_CHECKPOINT (default 1)
set -uo pipefail
cd /root/repo
FIX="$1"; TAG="$2"; shift 2
QUERIES=("${@:-dedup_ngram_jaccard dedup_winnow_pairs}")
[ $# -eq 0 ] && QUERIES=(dedup_ngram_jaccard dedup_winnow_pairs)
mkdir -p target/scaling/logs bench

for Q in "${QUERIES[@]}"; do
  SAMPLE="target/gram_${TAG}_${Q}_disk.log"
  : > "$SAMPLE"
  ( while true; do
      echo "$(date +%s) $(df --output=avail -B1M / | tail -1 | tr -d ' ')"
      sleep 5
    done >> "$SAMPLE" ) &
  SAMPLER=$!
  echo "=== $Q @ $TAG (memo_ckpt=${SPARK_GRAFT_MEMO_CHECKPOINT:-1}, codec=${SPARK_GRAFT_IO_CODEC:-zstd}) ==="
  START=$(date +%s)
  SPARK_DRIVER_MEM="${SPARK_DRIVER_MEM:-48g}" \
    SPARK_GRAFT_SF_DIR="$PWD/$FIX" \
    SPARK_GRAFT_INDEX_DIR="$PWD/target/scaling/index/$TAG" \
    SPARK_GRAFT_MEMO_CHECKPOINT="${SPARK_GRAFT_MEMO_CHECKPOINT:-1}" \
    SPARK_GRAFT_SETS=dedup SPARK_GRAFT_ONLY="$Q" \
    tools/bench_direct.sh graft.Bench \
    > "target/gram_${TAG}_${Q}.out" 2> "target/gram_${TAG}_${Q}.err"
  RC=$?
  kill "$SAMPLER" 2>/dev/null
  WALL=$(( $(date +%s) - START ))
  BASE=$(head -1 "$SAMPLE" | cut -d' ' -f2)
  MINAVAIL=$(cut -d' ' -f2 "$SAMPLE" | sort -n | head -1)
  echo "$Q rc=$RC wall=${WALL}s disk: start ${BASE}MB avail, min ${MINAVAIL}MB avail, high-water $((BASE - MINAVAIL))MB"
  grep -o "\"$Q\":[0-9.]*" "target/gram_${TAG}_${Q}.out" | head -1 || tail -3 "target/gram_${TAG}_${Q}.err"
done
