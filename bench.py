"""Benchmark: MCAN-small VQA-v2 val-style inference throughput on one chip.

North-star metric (BASELINE.json): VQA-v2 val QA pairs/sec/chip. The
reference publishes no throughput numbers (accuracy only), so vs_baseline is
reported against the first recorded value of this same bench (1.0 when no
prior record exists, persisted in BENCH_BASELINE.json).

Timing methodology: this environment tunnels the TPU through a relay where
``block_until_ready`` does not reliably fence execution and host transfers
are slow, so the timed region is ONE jitted program that runs the forward
pass ``n_iters`` times inside ``lax.scan`` with a scalar loop-carried
dependency; fetching the final scalar forces completion of the whole chain.
The 1-iteration runtime (dispatch + scalar fetch overhead) is measured
separately and subtracted.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

from __future__ import annotations

import functools
import json
import os
import time

import numpy as np


def main() -> None:
    import jax

    cache_dir = os.environ.get("JAX_CACHE_DIR",
                               os.path.join(os.path.dirname(
                                   os.path.abspath(__file__)), ".jax_cache"))
    try:
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass
    import jax.numpy as jnp

    from mcan_vqa_tpu.configs import Config
    from mcan_vqa_tpu.models.net import build_mcan

    model_size = os.environ.get("BENCH_MODEL", "small")
    flat_out = {"small": 512, "large": 2048}[model_size]
    hidden = {"small": 512, "large": 1024}[model_size]
    # BENCH_REGIONS: image regions per sample (default 60 = the reference's
    # img_feat_pad_size; 100 = the upstream adaptive-BUTD setting).
    regions = int(os.environ.get("BENCH_REGIONS", "60"))
    cfg = Config(hidden_size=hidden, layer=6, multi_head=8, flat_mlp_size=512,
                 flat_glimpses=1, flat_out_size=flat_out,
                 img_feat_pad_size=regions,
                 use_glove=False).finalize()

    B = int(os.environ.get("BENCH_BATCH", "64"))
    n_iters = int(os.environ.get("BENCH_ITERS", "60"))
    pallas_env = os.environ.get("BENCH_PALLAS", "0")
    use_pallas = {"0": False, "1": True, "2": "batched",
                  "3": "packed"}[pallas_env]
    use_packing = os.environ.get("BENCH_PACK", "0") == "1"
    model = build_mcan(cfg, token_size=20000, answer_size=3129,
                       use_packing=use_packing)

    # Generate inputs ON DEVICE: host->HBM uploads ride a slow relay in this
    # environment, and a [B, 60, 2048] fp32 batch is hundreds of MB.
    @jax.jit
    def make_inputs(key):
        k1, k2, k3, k4 = jax.random.split(key, 4)
        R, F, T = cfg.img_feat_pad_size, cfg.img_feat_size, cfg.max_token
        img = jax.random.normal(k1, (B, R, F), jnp.float32)
        # realistic padding: 10..60 valid regions (reference README:52)
        n_valid = jax.random.randint(k2, (B, 1), 10, R + 1)
        img = img * (jnp.arange(R)[None, :, None] < n_valid[..., None])
        ques = jax.random.randint(k3, (B, cfg.max_token), 1, 20000,
                                  jnp.int32)
        q_len = jax.random.randint(k4, (B, 1), 3, T + 1)
        ques = ques * (jnp.arange(T)[None, :] < q_len)
        return img, ques

    img_d, ques_d = make_inputs(jax.random.PRNGKey(0))
    params = jax.jit(model.init)(
        {"params": jax.random.PRNGKey(0)}, img_d, ques_d)["params"]

    use_fused_qkv = os.environ.get("BENCH_SERVE", "1") == "1"
    use_quant = int(os.environ.get("BENCH_QUANT", "0"))
    if use_quant:
        # int8 engine (ops/quant.py): every projection/FFN matmul int8 on
        # the MXU (2x bf16 rate on v5e), attention bf16, softmax/LN f32.
        # Opt-in serving mode (Predictor(engine="int8")). 1 = XLA
        # structure; 2 = int8 SA/SGA block megakernels (weights resident).
        from mcan_vqa_tpu.ops.quant import (make_quant_serving_fn,
                                            quantize_params)
        params = jax.jit(functools.partial(
            quantize_params, num_layers=cfg.layer,
            megakernel=use_quant >= 2))(params)
        forward = make_quant_serving_fn(
            cfg.layer, cfg.multi_head, megakernel=use_quant >= 2,
            group=int(os.environ.get("BENCH_SGA_GROUP") or 4))
    elif use_fused_qkv:
        # fused-QKV engine; BENCH_PALLAS picks the attention implementation
        # INSIDE it (0=XLA, 1=per-(b,h), 2=batch-blocked, 3=block-diagonal
        # packed), so attention variants are compared like-for-like.
        from mcan_vqa_tpu.ops.serving import build_production_engine
        sga_mode = int(os.environ.get("BENCH_SGA", "2"))
        # Mixed-precision megakernels (DEFAULT here and in production —
        # Predictor "fused" + Trainer fused eval ship the same config):
        # FFN matmuls int8 on the MXU, attention/projections/stream bf16
        # (ops/quant.py qffn). Same-session A/Bs: small 43,645 vs 38,356
        # (+13.8%), large 15,890 vs 13,000 (+22%). Gated at the default
        # path's accuracy bar (tests/test_quant.py TestQffnAccuracy,
        # tests/test_full_size_parity.py TestFullSizeQffn). BENCH_QFFN=0
        # restores the all-bf16 megakernels.
        # BENCH_QFFN=2 additionally quantizes the self-attention qkv
        # projections (experimental; measured in docs/PERFORMANCE.md).
        # BENCH_QSTATIC (DEFAULT 1 since r4): qffn level 3 (every
        # projection int8) with static activation scales self-calibrated
        # on the bench's own on-device input distribution — the same
        # engine Predictor.from_checkpoint ships by default now that the
        # Trainer stores calibration scales next to the final checkpoint
        # (train/checkpoint.save_act_scales). Measured champion at every
        # width/batch (same-run A/Bs in docs/PERFORMANCE.md: small B=64
        # 47,861 vs 42,005 dynamic, large 19,762 vs 17,027, B=1 0.097 ms
        # vs 0.122). Accuracy gated at the default path's bar
        # (tests/test_quant.py::TestStaticActScales + the on-chip
        # canary). BENCH_QSTATIC=0 restores the dynamic-quant engine;
        # explicit BENCH_QFFN still overrides the level. BENCH_QFFN=4/5
        # are the int4 weight-streaming latency levels (level 3 +
        # nibble-packed int4 FFN / FFN+qkv weights; requires
        # BENCH_QSTATIC=1 for the calibration batch) — the B=1 regime's
        # engine, Predictor(engine="int4") is level 5. BENCH_QFFN=6/7
        # run the same int4 weights with bf16-dequant compute (no act
        # quant at the int4 sites, one matmul per site).
        qstatic = os.environ.get("BENCH_QSTATIC", "1") == "1"
        auto_level = "3" if qstatic else "1"
        use_qffn = int(os.environ.get("BENCH_QFFN", auto_level))
        # alllayer only for the mode-3/4/5 experiments: the shipped config
        # (and the Predictor) runs the per-block engine without the ~86 MB
        # stacked layouts, so bench == production program exactly
        alllayer = (sga_mode >= 3
                    or os.environ.get("BENCH_ALLLAYER", "0") == "1")
        # ONE construction path with the Predictor and the A/B/canary
        # tools (ops/serving.build_production_engine): pruned mode-2
        # megakernel tree (BENCH_PRUNE=0 restores the full tree), bf16
        # residual stream, int8-FFN kernels — every default gated by
        # tests/test_bf16_stream.py, test_quant.py and the full-size
        # torch-oracle bounds (test_full_size_parity.py). BENCH_QSTATIC=1
        # calibrates static activation scales on the bench input
        # distribution, exactly like Predictor(act_calibration=...).
        # BENCH_SGA picks the engine structure (2 = the shipped
        # fused-projection megakernel; 0 = per-sub-op; 3/4/5 = the
        # all-layer experiments), BENCH_PALLAS the attention variant
        # inside it.
        forward, params = build_production_engine(
            params, cfg.layer, cfg.multi_head,
            qffn=use_qffn,
            act_scale_inputs=(img_d, ques_d) if (use_qffn and qstatic)
            else None,
            prune=os.environ.get("BENCH_PRUNE", "1") == "1",
            sga_mode=sga_mode, alllayer=alllayer,
            bf16_stream=os.environ.get("BENCH_BF16_STREAM", "1") == "1",
            use_pallas_ffn=os.environ.get("BENCH_FFN", "1") == "1",
            use_pallas=use_pallas,
            # None = the shipped auto group (4, or 16 at calibrated
            # B >= 1024) so the benched program IS the served one at
            # every batch; BENCH_SGA_GROUP pins an explicit G
            sga_group=(int(os.environ["BENCH_SGA_GROUP"])
                       if os.environ.get("BENCH_SGA_GROUP") else None),
            use_pallas_attflat=os.environ.get("BENCH_ATTFLAT", "0") == "1")
    elif use_pallas:
        from mcan_vqa_tpu.ops.serving import make_serving_fn
        forward = make_serving_fn(cfg.layer, cfg.multi_head,
                                  use_pallas=use_pallas)
    else:
        def forward(params, img, ques):
            return model.apply({"params": params}, img, ques,
                               deterministic=True)["logits"]

    @functools.partial(jax.jit, static_argnames="n")
    def bench_loop(params, img, ques, n):
        def body(carry, _):
            logits = forward(params, img + carry, ques)
            probs = jax.nn.sigmoid(logits.astype(jnp.float32))
            # scalar loop-carry: forces sequential execution, ~0 numerically
            return jnp.max(probs) * jnp.float32(1e-30), None
        c, _ = jax.lax.scan(body, jnp.float32(0.0), None, length=n)
        return c

    # compile both program shapes
    float(bench_loop(params, img_d, ques_d, 1))
    float(bench_loop(params, img_d, ques_d, n_iters + 1))

    # median-of-K timed scans of the ALREADY-COMPILED program in one
    # process (BENCH_REPEATS, default 7): the builder measured a ±12%
    # cross-process variance band on single shots (docs/STATUS_r3.md
    # session 7); the median makes the driver-recorded round-over-round
    # trend reflect engineering, not relay noise. The 1-iteration
    # dispatch+fetch overhead is measured the same way and subtracted.
    repeats = max(int(os.environ.get("BENCH_REPEATS", "7")), 1)

    def timed(n):
        t0 = time.perf_counter()
        float(bench_loop(params, img_d, ques_d, n))
        return time.perf_counter() - t0

    overhead = float(np.median([timed(1) for _ in range(repeats)]))
    runs = sorted(timed(n_iters + 1) for _ in range(repeats))
    med = float(np.median(runs))

    per_iter = max((med - overhead) / n_iters, 1e-9)
    qps = B / per_iter

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
        "metric": f"mcan_{model_size}_vqa_inference_throughput",
        "value": round(qps, 2),
        "unit": "qa_pairs/sec/chip",
        "vs_baseline": round(qps / baseline, 4) if baseline else 1.0,
    }))


if __name__ == "__main__":
    main()
