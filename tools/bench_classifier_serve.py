"""A/B the classifier serving engines on the real chip.

model.apply vs the SA-block-megakernel classifier serving engine
(ops/serving.make_classifier_serving_fn) at MIMIC-CXR dims: B=64,
60 regions, img_feat 1024, hidden 512, 6 layers, 14 labels.
Scan-loop timing methodology (see bench.py docstring).

    python tools/bench_classifier_serve.py            # both engines
    BENCH_BATCH=128 python tools/bench_classifier_serve.py
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    import jax
    import jax.numpy as jnp

    cache = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), ".jax_cache")
    try:
        jax.config.update("jax_compilation_cache_dir", cache)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass

    from mcan_vqa_tpu.models.net import ClassifierNet
    from mcan_vqa_tpu.ops.serving import (make_classifier_serving_fn,
                                          prepare_classifier_params)

    B = int(os.environ.get("BENCH_BATCH", "64"))
    n_iters = int(os.environ.get("BENCH_ITERS", "60"))
    L = int(os.environ.get("BENCH_LAYERS", "6"))
    H = int(os.environ.get("BENCH_HIDDEN", "512"))
    model = ClassifierNet(answer_size=14, hidden_size=H, num_layers=L,
                          num_heads=8, ff_size=4 * H, img_feat_size=1024,
                          flat_mlp_size=512, flat_out_size=H)

    @jax.jit
    def make_inputs(key):
        k1, k2 = jax.random.split(key)
        img = jax.random.normal(k1, (B, 60, 1024), jnp.float32)
        n_valid = jax.random.randint(k2, (B, 1), 10, 61)
        return img * (jnp.arange(60)[None, :, None] < n_valid[..., None])

    img = make_inputs(jax.random.PRNGKey(0))
    params = jax.jit(model.init)({"params": jax.random.PRNGKey(0)},
                                 img)["params"]

    def plain(p, x):
        return model.apply({"params": p}, x,
                           deterministic=True)["logits"]

    # BENCH_QFFN=0 restores the all-bf16 SA megakernels (default: the
    # mixed int8-FFN kernels, same engine the Trainer's classifier eval
    # ships).
    qffn = os.environ.get("BENCH_QFFN", "1") == "1"
    prepared = jax.jit(lambda p: prepare_classifier_params(
        p, L, qffn=qffn))(params)
    # BENCH_QSTATIC=1: static calibrated activation scales for the int8
    # quant sites (ops/quant.calibrate_classifier_act_scales), calibrated
    # on the bench input distribution.
    act_scales = None
    if qffn and os.environ.get("BENCH_QSTATIC", "0") == "1":
        from mcan_vqa_tpu.ops.quant import calibrate_classifier_act_scales
        act_scales = calibrate_classifier_act_scales(prepared, img, L, 8)
    fused = make_classifier_serving_fn(L, 8, bf16_stream=True, qffn=qffn,
                                       qffn_act_scales=act_scales)

    def run(tag, fwd, p):
        import functools

        @functools.partial(jax.jit, static_argnames="n")
        def loop(p, x, n):
            def body(c, _):
                probs = jax.nn.sigmoid(fwd(p, x + c).astype(jnp.float32))
                return jnp.max(probs) * jnp.float32(1e-30), None
            c, _ = jax.lax.scan(body, jnp.float32(0.0), None,
                                length=n)
            return c

        float(loop(p, img, 1))
        float(loop(p, img, n_iters + 1))
        t0 = time.perf_counter()
        float(loop(p, img, 1))
        overhead = time.perf_counter() - t0
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            float(loop(p, img, n_iters + 1))
            best = min(best, time.perf_counter() - t0)
        per = max((best - overhead) / n_iters, 1e-9)
        print(json.dumps({"engine": tag, "samples_per_s": round(B / per, 1),
                          "ms_per_batch": round(per * 1e3, 3)}))

    run("model.apply", plain, params)
    run("fused_sa_megakernel", fused, prepared)


if __name__ == "__main__":
    main()
