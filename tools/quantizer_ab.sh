#!/bin/bash
# Flat-vs-tree admission-quantizer BUILD A/B (builder-side, round 14).
#
# Round 13 measured the k-scaling law at k = sqrt(600k) = 775 but built
# that quantizer with flat Lloyd — O(n*k) per pass, the acknowledged
# wrong complexity class at k = sqrt(n) scale. This round the admission
# path trains through the same two-level IMI tree the batch IVF family
# uses (SemanticAdmitter.trainCoarse past FlatKMax); this script records
# the decision measurement: the offline BUILD wall, flat vs tree, at
# k>=775, interleaved A,B,A,B,A,B in one host window so drift cancels.
#
# Each arm runs BUILD_ONLY: the build wall is the compared number and
# everything after it (full-corpus list assignment, admission batches)
# is identical across arms — paying the flat arm's O(n·k) assignment
# (~25 min at k=775/600k) per run would just stretch the window the
# interleaving is trying to keep tight. Timeouts are raised because a
# 48 GB heap under the flat arm's allocation storm can pause past the
# default 120 s heartbeat window (observed: a 174 s stall killed the
# context mid-run).
#
# Usage: tools/quantizer_ab.sh <fixture-dir> [kcap] [pairs]
set -euo pipefail
cd /root/repo

FIX="${1:?fixture dir}"
KCAP="${2:-775}"
PAIRS="${3:-3}"
OUT="target/quantizer_ab"
mkdir -p "$OUT"

run_one() { # mode-label flatkmax-env -> prints "label build_sec"
  local label="$1" fkm="$2"
  local log="$OUT/${label}_$3.log"
  SPARK_DRIVER_MEM=48g \
  SPARK_GRAFT_SF_DIR="$FIX" \
  SPARK_GRAFT_MODE=semantic \
  SPARK_GRAFT_KCAP="$KCAP" \
  SPARK_GRAFT_FLATKMAX="$fkm" \
  SPARK_GRAFT_BATCH_SIZES=16000 \
  SPARK_GRAFT_BUILD_ONLY=1 \
  SPARK_GRAFT_EXTRA_JAVA_OPTS="-Dspark.network.timeout=600s" \
    tools/bench_direct.sh graft.AdmissionBench >"$log.out" 2>"$log" || {
      echo "$label run $3 FAILED; tail:" >&2; tail -5 "$log" >&2; exit 1; }
  local sec
  sec=$(grep -o 'quantizer build [0-9.]*' "$log" | head -1 | awk '{print $3}')
  echo "$label $sec"
}

echo "=== quantizer build A/B: k<=$KCAP on $FIX, $PAIRS interleaved pairs ==="
for i in $(seq 1 "$PAIRS"); do
  run_one flat 1000000 "$i"
  run_one tree 64 "$i"
done | tee "$OUT/results.txt"

python3 - "$OUT/results.txt" <<'EOF'
import statistics, sys
rows = [l.split() for l in open(sys.argv[1]) if l.strip()]
for mode in ("flat", "tree"):
    xs = sorted(float(s) for m, s in rows if m == mode)
    print(f"{mode}: runs {xs} median {statistics.median(xs):.1f}s")
EOF
