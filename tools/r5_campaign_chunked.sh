#!/bin/bash
# Round-5 session 3: can in-jit chunking recover the B>=1024 falloff?
# The attribution campaign (r5_campaign_bulk_falloff.sh) showed every
# engine loses 16-20% at bulk batches vs its own B=256 peak, and pinned
# it on working-set/scheduling effects rather than quant epilogues. If
# that is right, running a B=2048 batch as a lax.scan over 8 chunks of
# 256 INSIDE one jitted program (same engine, bitwise-same logits —
# verified on CPU) should restore most of the B=256 rate: the per-chunk
# activation working set is 8x smaller while weights stay resident.
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

run "ab_small_B2048_chunked" \
  env BENCH_MODEL=small BENCH_BATCH=2048 BENCH_ROUNDS=5 BENCH_ITERS=10 \
  python tools/bench_serving_ab.py qstatic qstatic@c256 qstatic@c512

run "ab_small_B1024_chunked" \
  env BENCH_MODEL=small BENCH_BATCH=1024 BENCH_ROUNDS=5 BENCH_ITERS=20 \
  python tools/bench_serving_ab.py qstatic qstatic@c256

echo "r5 chunked campaign done" >&2
