#!/bin/bash
# Round-4 session-6 on-chip campaign: post-diag decoder group-size sweep.
# The block-diagonal softmax (session 4) removed the quadratic-in-G
# softmax/dropout term that made G=8 lose pre-diag (6,412 vs 6,996);
# re-measure the group sizes under the diag kernels.
set -u
cd "$(dirname "$0")/.."
OUT=results/r4_measurements
mkdir -p "$OUT"

run() {  # run <name> <cmd...>
  local name="$1"; shift
  echo "== $name: $*" >&2
  timeout 3600 "$@" > "$OUT/$name.json" 2> "$OUT/$name.err"
  echo "-- $name: $(tail -1 "$OUT/$name.json" 2>/dev/null)" >&2
}

run "train_G8_diag"  env BENCH_FUSED_BLOCK=8  python bench_train.py
run "train_G16_diag" env BENCH_FUSED_BLOCK=16 python bench_train.py
run "train_G8_diag_bf16saves" env BENCH_FUSED_BLOCK=8 BENCH_BF16_SAVES=1 python bench_train.py
echo "s6 campaign done" >&2
