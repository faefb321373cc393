"""Host-feed benchmark: native batcher assembly rate at serving dims.

Answers docs/PERFORMANCE.md's open question: how many host cores does a
deployment need to keep a chip fed at the serving rate? Builds a synthetic
packed fp16 cache at BUTD serving dims ([<=60, 2048] rows per item),
measures `bf_gather_pad` (fp32 out) and `bf_gather_pad_bf16` (bf16 out)
throughput vs thread count, and prints samples/s plus the implied
host-cores-per-chip for a target serving rate.

Pure host work — no TPU, no jax. Run: python tools/bench_host_feed.py
[--items 4000] [--batch 64] [--target 40000]
"""

from __future__ import annotations

import argparse
import os
import sys
import tempfile
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--items", type=int, default=4000)
    ap.add_argument("--dim", type=int, default=2048)
    ap.add_argument("--pad", type=int, default=60)
    ap.add_argument("--batch", type=int, default=64)
    ap.add_argument("--iters", type=int, default=40)
    ap.add_argument("--threads", type=int, nargs="*",
                    default=[1, 2, 4, 8])
    ap.add_argument("--target", type=float, default=40000.0,
                    help="serving rate to sustain (samples/s/chip)")
    args = ap.parse_args()

    from mcan_vqa_tpu.data.native_batcher import NativeBatcher, available
    if not available():
        raise SystemExit("native batcher unavailable (no toolchain?)")

    rng = np.random.default_rng(0)
    lens = rng.integers(10, args.pad + 1, args.items).astype(np.uint32)
    starts = np.zeros(args.items, np.uint64)
    starts[1:] = np.cumsum(lens)[:-1]
    rows = int(lens.sum())

    with tempfile.TemporaryDirectory() as tmp:
        bin_path = os.path.join(tmp, "features.bin")
        feats = rng.normal(size=(rows, args.dim)).astype(np.float16)
        feats.tofile(bin_path)

        print(f"cache: {args.items} items, {rows} rows x {args.dim} fp16 "
              f"({rows * args.dim * 2 / 1e9:.2f} GB), host cores: "
              f"{os.cpu_count()}")
        print(f"{'threads':>8} {'fp32 samp/s':>12} {'bf16 samp/s':>12} "
              f"{'bf16 GB/s out':>14}")

        results = {}
        for nt in args.threads:
            b = NativeBatcher(bin_path, rows, args.dim, n_threads=nt)
            out32 = np.empty((args.batch, args.pad, args.dim), np.float32)
            per = {}
            for name, fn in (
                ("fp32", lambda s, l: b.gather_pad(s, l, args.pad,
                                                   out=out32)),
                ("bf16", lambda s, l: b.gather_pad_bf16(s, l, args.pad)),
            ):
                # warmup
                idx = rng.integers(0, args.items, args.batch)
                fn(starts[idx], lens[idx])
                t0 = time.perf_counter()
                for _ in range(args.iters):
                    idx = rng.integers(0, args.items, args.batch)
                    fn(starts[idx], lens[idx])
                dt = time.perf_counter() - t0
                per[name] = args.iters * args.batch / dt
            bytes_out = per["bf16"] * args.pad * args.dim * 2
            print(f"{nt:>8} {per['fp32']:>12.0f} {per['bf16']:>12.0f} "
                  f"{bytes_out / 1e9:>14.2f}")
            results[nt] = per
            b.close()

        best_nt = max(results, key=lambda k: results[k]["bf16"])
        best = results[best_nt]["bf16"]
        per_core = best / best_nt
        cores_needed = args.target / per_core
        print(f"\nbest bf16: {best:.0f} samples/s at {best_nt} threads "
              f"({per_core:.0f}/core) -> ~{cores_needed:.1f} cores to "
              f"sustain {args.target:.0f} samples/s/chip")


if __name__ == "__main__":
    main()
