#!/bin/bash
# Round-5 session 3: validate the auto-router's bucket boundary
# (INT4_MAX_BUCKET = Q8AUX_MAX_BUCKET = 4). Measured so far: B=1 int4
# +11-12.4% (large) / q8aux +3.2-5.2% (both widths); B=64+ int4 loses.
# The B=4 and B=8 cells around the boundary are inferred, not measured —
# these A/Bs confirm (or move) the boundary.
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

run "ab_large_B4_boundary" \
  env BENCH_MODEL=large BENCH_BATCH=4 BENCH_ROUNDS=5 BENCH_ITERS=200 \
  python tools/bench_serving_ab.py qstatic qstatic5 qaux

run "ab_large_B8_boundary" \
  env BENCH_MODEL=large BENCH_BATCH=8 BENCH_ROUNDS=5 BENCH_ITERS=150 \
  python tools/bench_serving_ab.py qstatic qstatic5 qaux

run "ab_small_B4_boundary" \
  env BENCH_MODEL=small BENCH_BATCH=4 BENCH_ROUNDS=5 BENCH_ITERS=300 \
  python tools/bench_serving_ab.py qstatic qaux

run "ab_small_B8_boundary" \
  env BENCH_MODEL=small BENCH_BATCH=8 BENCH_ROUNDS=5 BENCH_ITERS=250 \
  python tools/bench_serving_ab.py qstatic qaux

echo "r5 boundary campaign done" >&2
