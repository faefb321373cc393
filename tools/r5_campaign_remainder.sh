#!/bin/bash
# Round-5 session 2: remaining unmeasured cells (session-1 script was
# interrupted mid-B256 when the builder session died):
#   - int4 levels 4/5 at large B=256 (B=64 already measured: -12%/-17%)
#   - q8aux at small B=1
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
run "ab_large_B256_int4" \
  env BENCH_MODEL=large BENCH_BATCH=256 BENCH_ROUNDS=5 BENCH_ITERS=30 \
  python tools/bench_serving_ab.py qstatic qstatic4 qstatic5
run "ab_small_B1_q8aux" \
  env BENCH_MODEL=small BENCH_BATCH=1 BENCH_ROUNDS=7 BENCH_ITERS=400 \
  python tools/bench_serving_ab.py qstatic qaux
echo "r5 remainder campaign done" >&2
