#!/bin/bash
# Round-4 session-6 on-chip campaign (sequential; the chip is shared).
# Post-diag decoder group sweep + the att-saves study + fixed-cost
# amortization. Results land in results/r4_measurements/; findings in
# docs/PERFORMANCE.md ("Round 4 training study").
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

# post-diag decoder group sweep (pre-diag G=8 lost to the quadratic
# softmax; with diag it is neutral, G=16 loses)
run "train_G8_diag"  env BENCH_FUSED_BLOCK=8  python bench_train.py
run "train_G16_diag" env BENCH_FUSED_BLOCK=16 python bench_train.py
run "train_G8_diag_bf16saves" env BENCH_FUSED_BLOCK=8 BENCH_BF16_SAVES=1 python bench_train.py

# att-saves: the FLOP-minimum decoder backward (neutral at D=512,
# +3.6% at D=1024 with bf16 saves -> the hidden>512 default)
run "train_att_saves"      env BENCH_ATT_SAVES=1 python bench_train.py
run "train_att_saves_bf16" env BENCH_ATT_SAVES=1 BENCH_BF16_SAVES=1 python bench_train.py
run "train_large_anchor" env BENCH_HIDDEN=1024 BENCH_BATCH=64 BENCH_ACCU=2 BENCH_ATT_SAVES=0 BENCH_BF16_SAVES=0 python bench_train.py
run "train_large_att_saves_bf16" env BENCH_HIDDEN=1024 BENCH_BATCH=64 BENCH_ACCU=2 python bench_train.py

# fixed-cost amortization (isolates ~3.4 ms/step optimizer+dispatch)
run "train_B512" env BENCH_BATCH=512 python bench_train.py

# gradient gate for the att-saves PRNG variant on real Mosaic
timeout 3600 python tools/validate_att_saves.py > "$OUT/validate_att_saves.txt" 2>&1 \
  && echo "-- validate_att_saves: PASS" >&2 || echo "-- validate_att_saves: FAIL" >&2
echo "s6 campaign done" >&2
