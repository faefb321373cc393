#!/bin/bash
# Round-5 session 1: fill the unmeasured cells of the quant regime
# matrix (VERDICT r4 #5):
#   - int4 levels 4/5 at large THROUGHPUT batches (B=64, B=256) — large
#     is the weight-streaming-heaviest config, the one place int4 could
#     beat the calibrated level-3 default away from B=1
#   - q8aux at small B=1 (only large B=1 was measured in r4)
# All cells are same-process interleaved medians (tools/bench_serving_ab.py)
# because cross-process numbers on this rig drift >10%.
set -u
cd "$(dirname "$0")/.."
OUT=results/r5_measurements
mkdir -p "$OUT"

run() {  # run <name> <cmd...>
  local name="$1"; shift
  echo "== $name: $*" >&2
  timeout 7200 "$@" > "$OUT/$name.txt" 2>&1
  echo "-- $name done: $(tail -3 "$OUT/$name.txt" | head -1)" >&2
}

run "ab_large_B64_int4" \
  env BENCH_MODEL=large BENCH_BATCH=64 BENCH_ROUNDS=5 BENCH_ITERS=60 \
  python tools/bench_serving_ab.py qstatic qstatic4 qstatic5

run "ab_large_B256_int4" \
  env BENCH_MODEL=large BENCH_BATCH=256 BENCH_ROUNDS=5 BENCH_ITERS=30 \
  python tools/bench_serving_ab.py qstatic qstatic4 qstatic5

run "ab_small_B1_q8aux" \
  env BENCH_MODEL=small BENCH_BATCH=1 BENCH_ROUNDS=7 BENCH_ITERS=400 \
  python tools/bench_serving_ab.py qstatic qaux

echo "r5 quant-matrix campaign done" >&2
