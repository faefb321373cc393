#!/bin/bash
# Round-5 session: attribute the B>=1024 serving falloff (VERDICT r4 #2).
# Under the calibrated level-3 default, MCAN-small holds 47.5K pairs/s at
# B=256 but only 39.4K at B=1024 / 38.2K at B=2048 (-17..-20%), while the
# older all-bf16 engine held 94% of its own peak at B=1024. Interleaved
# in-process A/Bs isolate where the loss lives:
#   bf16      - the no-quant twin: if it falls off equally, the loss is
#               structural (attention/HBM residency), not quant-path
#   qffn      - dynamic per-row quant (gated off past QFFN_MAX_BATCH=512,
#               so at B>=1024 this IS the bf16 fallback + width-auto qkv)
#   qstatic   - the shipped calibrated level-3 default
#   qstatic6  - int4 weights, bf16 compute, NO activation quant at the
#               FFN sites: same weight-stream saving, zero act-quant
#               epilogues -> separates "int8 act quant VPU/epilogue cost"
#               from "weight streaming"
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

run "ab_small_B1024_falloff" \
  env BENCH_MODEL=small BENCH_BATCH=1024 BENCH_ROUNDS=5 BENCH_ITERS=20 \
  python tools/bench_serving_ab.py qstatic bf16 qffn qstatic6

run "ab_small_B2048_falloff" \
  env BENCH_MODEL=small BENCH_BATCH=2048 BENCH_ROUNDS=5 BENCH_ITERS=10 \
  python tools/bench_serving_ab.py qstatic bf16 qstatic6

# anchor: the same configs at the B=256 peak, same process protocol
run "ab_small_B256_anchor" \
  env BENCH_MODEL=small BENCH_BATCH=256 BENCH_ROUNDS=3 BENCH_ITERS=60 \
  python tools/bench_serving_ab.py qstatic bf16 qstatic6

echo "r5 bulk-falloff campaign done" >&2
