#!/bin/bash
# Multi-process shuffle-cost A/B (builder-side, round 14 stretch ask).
#
# Round 13 proved the contract CORRECT under local-cluster[4,8,8192]
# (191/191 bit-identical with executors in four separate JVMs); this
# script records the COST: the shuffle-heaviest bench set timed under
# local[32] vs local-cluster in one interleaved window, so the
# process-boundary shuffle tax (serialization + loopback fetch instead
# of in-heap block handoff) is a measured number before any
# real-cluster throughput is quoted.
#
# Usage: tools/lc_bench_ab.sh [set] [pairs]
set -euo pipefail
cd /root/repo

SET="${1:-dedup}"
PAIRS="${2:-3}"
OUT="target/lc_ab"
mkdir -p "$OUT"

run_one() { # label master run-idx -> "label total_sec shuffle_mb"
  local label="$1" master="$2" i="$3"
  local json="$OUT/${label}_$i.json"
  SPARK_DRIVER_MEM=48g \
  SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 \
  SPARK_GRAFT_SETS="$SET" \
  SPARK_GRAFT_MASTER="$master" \
  SPARK_GRAFT_INDEX_DIR="$PWD/$OUT/index_$label" \
    tools/bench_direct.sh graft.Bench 2>"$OUT/${label}_$i.err" |
    grep '"queries":' | head -1 > "$json" || {
      echo "$label run $i FAILED; tail:" >&2
      tail -5 "$OUT/${label}_$i.err" >&2; exit 1; }
  python3 - "$json" "$label" <<'EOF'
import json, sys
d = json.loads(open(sys.argv[1]).read())
print(f"{sys.argv[2]} {d['value']:.1f} {d['shuffle_total_mb']:.1f}")
EOF
}

echo "=== $SET set: local[32] vs local-cluster[4,8,8192], $PAIRS pairs ==="
for i in $(seq 1 "$PAIRS"); do
  run_one thread "local[32]" "$i"
  run_one proc "local-cluster[4,8,8192]" "$i"
done | tee "$OUT/results.txt"

python3 - "$OUT/results.txt" <<'EOF'
import statistics, sys
rows = [l.split() for l in open(sys.argv[1]) if l.strip()]
for mode in ("thread", "proc"):
    xs = sorted(float(r[1]) for r in rows if r[0] == mode)
    sh = [float(r[2]) for r in rows if r[0] == mode]
    print(f"{mode}: walls {xs} median {statistics.median(xs):.1f}s "
          f"shuffle {sh[0]:.1f} MB")
EOF
