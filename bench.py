"""Benchmark: MCAN-small VQA-v2 val-style inference throughput on one chip.

North-star metric (BASELINE.json): VQA-v2 val QA pairs/sec/chip. The
reference publishes no throughput numbers (accuracy only), so vs_baseline is
reported against the first recorded value of this same bench (1.0 when no
prior record exists).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np


def main() -> None:
    import jax

    from mcan_vqa_tpu.configs import Config
    from mcan_vqa_tpu.models.net import build_mcan

    cfg = Config(hidden_size=512, layer=6, multi_head=8, flat_mlp_size=512,
                 flat_glimpses=1, flat_out_size=512, use_glove=False).finalize()

    B = int(os.environ.get("BENCH_BATCH", "512"))
    use_pallas = os.environ.get("BENCH_PALLAS", "1") == "1"
    model = build_mcan(cfg, token_size=20000, answer_size=3129,
                       use_pallas=use_pallas)

    rng = np.random.default_rng(0)
    img = rng.normal(size=(B, cfg.img_feat_pad_size, cfg.img_feat_size)
                     ).astype(np.float32)
    # realistic padding: 10..60 valid regions per item (reference README:52)
    n_valid = rng.integers(10, 61, size=B)
    for i, n in enumerate(n_valid):
        img[i, n:] = 0.0
    ques = rng.integers(1, 20000, size=(B, cfg.max_token)).astype(np.int32)
    rng_lens = rng.integers(3, 15, size=B)
    for i, n in enumerate(rng_lens):
        ques[i, n:] = 0

    import jax.numpy as jnp

    params = jax.jit(model.init)({"params": jax.random.PRNGKey(0)}, img, ques)

    @jax.jit
    def forward(params, img, ques):
        out = model.apply(params, img, ques, deterministic=True)
        return jax.nn.sigmoid(out["logits"].astype(jnp.float32))

    img_d = jax.device_put(img)
    ques_d = jax.device_put(ques)

    # warmup / compile
    forward(params, img_d, ques_d).block_until_ready()

    n_iters = int(os.environ.get("BENCH_ITERS", "30"))
    t0 = time.perf_counter()
    outs = [forward(params, img_d, ques_d) for _ in range(n_iters)]
    # block on every output: the iterations are independent programs, so
    # blocking only on the last one would not cover the rest.
    jax.block_until_ready(outs)
    dt = time.perf_counter() - t0

    qps = B * n_iters / dt

    record_path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                               "BENCH_BASELINE.json")
    baseline = None
    if os.path.exists(record_path):
        try:
            baseline = json.load(open(record_path)).get("value")
        except Exception:
            baseline = None
    if baseline is None:
        with open(record_path, "w") as f:
            json.dump({"value": qps, "unit": "qa_pairs/sec/chip"}, f)

    print(json.dumps({
        "metric": "mcan_small_vqa_inference_throughput",
        "value": round(qps, 2),
        "unit": "qa_pairs/sec/chip",
        "vs_baseline": round(qps / baseline, 4) if baseline else 1.0,
    }))


if __name__ == "__main__":
    main()
