#!/bin/bash
# Round-5 session 2 chip campaign:
#   1. stacked-vs-standard fused train step (VERDICT #3) at small width
#      (the 7.0-7.3K -> >=7.6K target) and at large (zoo recipe width)
#   2. sga_group sweep at the bulk-serving batches (VERDICT #2 harvest
#      attempt: G=4 is latency-tuned; larger packing may amortize the
#      per-grid-step streaming at B>=1024)
set -u
cd "$(dirname "$0")/.."
OUT=results/r5_measurements
mkdir -p "$OUT"
run() {
  local name="$1"; shift
  echo "== $name: $*" >&2
  timeout 7200 "$@" > "$OUT/$name.txt" 2>&1
  echo "-- $name done: $(tail -3 "$OUT/$name.txt" | head -1)" >&2
}

run "ab_train_stacked_small" \
  env BENCH_HIDDEN=512 BENCH_BATCH=256 BENCH_ROUNDS=5 BENCH_ITERS=20 \
  python tools/bench_train_ab.py standard stacked

run "ab_train_stacked_large" \
  env BENCH_HIDDEN=1024 BENCH_BATCH=64 BENCH_ROUNDS=5 BENCH_ITERS=20 \
  python tools/bench_train_ab.py standard stacked

run "ab_small_B1024_gsweep" \
  env BENCH_MODEL=small BENCH_BATCH=1024 BENCH_ROUNDS=5 BENCH_ITERS=20 \
  python tools/bench_serving_ab.py qstatic qstatic@g8 qstatic@g16

run "ab_small_B2048_gsweep" \
  env BENCH_MODEL=small BENCH_BATCH=2048 BENCH_ROUNDS=5 BENCH_ITERS=10 \
  python tools/bench_serving_ab.py qstatic qstatic@g8 qstatic@g16

echo "r5 session-2 campaign done" >&2
