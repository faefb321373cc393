"""Same-process interleaved A/B of the CLASSIFIER serving engines.

model.apply vs the SA-block-megakernel classifier serving engine
(ops/serving.make_classifier_serving_fn) at MIMIC-CXR dims: B=64,
60 regions, img_feat 1024, hidden 512, 6 layers, 14 labels.
Scan-loop timing methodology (see bench.py docstring); every named
config is timed interleaved over BENCH_ROUNDS rounds in ONE process
(cross-process numbers on this rig drift >10% — see
tools/bench_serving_ab.py).

Usage:
    python tools/bench_classifier_serve.py              # plain + qffn
    python tools/bench_classifier_serve.py bf16 qffn qstatic
    BENCH_BATCH=128 BENCH_ROUNDS=4 python tools/bench_classifier_serve.py ...

Configs:
    plain    model.apply (the XLA path)
    bf16     all-bf16 SA megakernels (qffn=0)
    qffn     the shipped default: int8-FFN SA megakernels, dynamic
             per-row quant (qffn=1)
    qffn2 / qffn3   higher dynamic int8 levels (qkv / +merge)
    qstatic  calibrated static activation scales at level 3 — the
             classifier twin of Predictor(act_calibration=...)
             (ops/quant.calibrate_classifier_act_scales, calibrated on
             the bench input distribution)
    qstatic1 / qstatic2   calibrated at an explicit level
"""

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    import functools

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
    from mcan_vqa_tpu.ops.serving import build_production_classifier_engine

    names = sys.argv[1:] or ["plain", "qffn"]
    B = int(os.environ.get("BENCH_BATCH", "64"))
    n_iters = int(os.environ.get("BENCH_ITERS", "60"))
    rounds = int(os.environ.get("BENCH_ROUNDS", "3"))
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
    raw = jax.jit(model.init)({"params": jax.random.PRNGKey(0)},
                              img)["params"]

    def build(name):
        """Every named config goes through
        ops.serving.build_production_classifier_engine — the same
        construction path the Trainer's classifier eval ships."""
        if name == "plain":
            fwd = lambda p, x: model.apply({"params": p}, x,
                                           deterministic=True)["logits"]
            return fwd, raw
        if name == "bf16":
            level = 0
        elif name == "qffn":
            level = 1
        elif name.startswith("qffn"):
            level = int(name[len("qffn"):])
        elif name == "qstatic":
            level = None  # the builder's calibrated default (level 3)
        elif name.startswith("qstatic"):
            level = int(name[len("qstatic"):])
        else:
            raise SystemExit(f"unknown config {name!r}")
        return build_production_classifier_engine(
            raw, L, 8, qffn=level,
            act_scale_inputs=img if name.startswith("qstatic") else None)

    entries = []
    for name in names:
        fwd, p = build(name)

        @functools.partial(jax.jit, static_argnames="n")
        def loop(p, x, n, fwd=fwd):
            def body(c, _):
                probs = jax.nn.sigmoid(fwd(p, x + c).astype(jnp.float32))
                return jnp.max(probs) * jnp.float32(1e-30), None
            return jax.lax.scan(body, jnp.float32(0.0), None, length=n)[0]

        float(loop(p, img, 1))            # compile
        float(loop(p, img, n_iters + 1))
        entries.append((name, loop, p))

    results = {name: [] for name, _, _ in entries}
    for r in range(rounds):
        for name, loop, p in entries:
            t0 = time.perf_counter()
            float(loop(p, img, 1))
            overhead = time.perf_counter() - t0
            t0 = time.perf_counter()
            float(loop(p, img, n_iters + 1))
            el = time.perf_counter() - t0
            sps = B / max((el - overhead) / n_iters, 1e-9)
            results[name].append(sps)
            print(f"round {r}: {name:9s} {sps:10.1f} samples/s", flush=True)

    print(f"\n== medians over {rounds} interleaved rounds (B={B}) ==")
    base = None
    out = {}
    for name, _, _ in entries:
        med = statistics.median(results[name])
        out[name] = round(med, 1)
        if base is None:
            base = med
            print(f"{name:9s} {med:10.1f} samples/s   (baseline)")
        else:
            print(f"{name:9s} {med:10.1f} samples/s   "
                  f"{(med / base - 1) * 100:+.1f}% vs {entries[0][0]}")
    print(json.dumps({"batch": B, "medians": out}))


if __name__ == "__main__":
    main()
