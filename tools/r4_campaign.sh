#!/bin/bash
# Round-4 on-chip measurement campaign (sequential; the chip is shared).
# Each block appends JSON lines under results/r4_measurements/.
#   bash tools/r4_campaign.sh [phase]
# phases: serve | attr | train | all (default)
set -u
cd "$(dirname "$0")/.."
OUT=results/r4_measurements
mkdir -p "$OUT"
PHASE="${1:-all}"

run() {  # run <name> <cmd...>
  local name="$1"; shift
  echo "== $name: $*" >&2
  timeout 3600 "$@" > "$OUT/$name.json" 2> "$OUT/$name.err"
  echo "-- $name: $(tail -1 "$OUT/$name.json" 2>/dev/null)" >&2
}

if [ "$PHASE" = serve ] || [ "$PHASE" = all ]; then
  # B>512 batch-cliff sweep under the calibrated (qstatic) default
  # vs the dynamic-quant engine (VERDICT r3 weakness #4/task 5)
  for B in 256 512 1024 2048; do
    run "serve_B${B}_qstatic" env BENCH_BATCH=$B BENCH_ITERS=30 python bench.py
  done
  for B in 1024 2048; do
    run "serve_B${B}_dynamic" env BENCH_BATCH=$B BENCH_ITERS=30 BENCH_QSTATIC=0 python bench.py
  done
fi

if [ "$PHASE" = attr ] || [ "$PHASE" = all ]; then
  # per-component fwd vs fwd+bwd attribution (VERDICT r4 #2)
  run "attr_small_B256" python tools/attribute_train_step.py
fi

if [ "$PHASE" = train ] || [ "$PHASE" = all ]; then
  # baseline re-measure + candidate harvests at the current layouts
  run "train_default" python bench_train.py
  run "train_flatopt" env BENCH_FLAT_OPT=1 python bench_train.py
  run "train_flatopt_mu16" env BENCH_FLAT_OPT=1 BENCH_MU_DTYPE=bfloat16 python bench_train.py
  for G in 2 8; do
    run "train_G${G}" env BENCH_FUSED_BLOCK=$G python bench_train.py
  done
  run "train_SA32" env BENCH_FUSED_SA=32 python bench_train.py
  run "train_bf16saves" env BENCH_BF16_SAVES=1 python bench_train.py
fi
echo "campaign '$PHASE' done" >&2
