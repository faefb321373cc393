"""Same-process interleaved A/B of serving-engine configs on the real TPU.

Cross-PROCESS bench numbers on this rig can differ by >10% with identical
code (chip/relay state drifts between runs — observed 42.8K vs 52.8K
pairs/s for the SAME cached executable minutes apart), so engine
comparisons are only meaningful when every config is timed in ONE
process, interleaved over several rounds. bench.py stays the
single-config driver contract; this tool answers "is engine X faster
than engine Y" questions.

Usage:
    python tools/bench_serving_ab.py qffn qstatic
    BENCH_MODEL=large python tools/bench_serving_ab.py bf16 qffn qstatic
    BENCH_ROUNDS=4 BENCH_BATCH=64 python tools/bench_serving_ab.py ...

Configs (all per-block megakernel, bf16 stream, pruned tree — the
production program):
    bf16     all-bf16 megakernels (BENCH_QFFN=0 equivalent)
    qffn     the shipped default: int8 FFN, dynamic per-row quant,
             width-auto qkv (qffn=1)
    qffn2    qkv-int8 at every width, dynamic quant
    qstatic  calibrated static activation scales at level 3 (the
             Predictor's calibrated default) — Predictor(act_calibration=)
    qstatic2 / qstatic3   calibrated at an explicit level
    qstatic4 / qstatic5   the int4 weight-streaming latency levels
             (level 3 + nibble-packed int4 FFN / FFN+qkv weights,
             Predictor(engine="int4") is level 5)
    qstatic6 / qstatic7   the same int4 weights with bf16-dequant
             COMPUTE (no act quant at the int4 sites, one matmul
             instead of the per-K-group loop)
    qauxN    level N + static-int8 AUX sites (decoder cross-kv, both
             AttFlat merges, the answer head — the bf16 streams the
             megakernels don't cover); qaux = calibrated default + aux
    int8     the full-int8 engine (Predictor(engine="int8") megakernels)
    any@gN   sga_group=N override for that config (engine default 4),
             e.g. "qstatic@g8" — G sweeps stay same-process interleaved

BENCH_QFFN_MAX_BATCH overrides ops.serving.QFFN_MAX_BATCH (the compiled
batch size past which qffn falls back to the bf16 kernels) — set it huge
to force the int8-FFN kernels at B>512 for gate experiments.

Prints one line per config per round plus a median-of-rounds summary.
Timing matches bench.py: n_iters forwards inside one jitted lax.scan
with a scalar loop-carry; the 1-iteration dispatch overhead is
subtracted; inputs are generated on device.
"""

from __future__ import annotations

import functools
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))


def build_forward(name: str, raw_params, cfg, img_d, ques_d):
    """-> (forward fn, prepared params) for one named config. Every
    named config goes through ops.serving.build_production_engine — the
    SAME construction path the Predictor and bench.py use — so the A/B
    orderings measured here are orderings of the shipped programs."""
    import jax

    import mcan_vqa_tpu.ops.serving as serving_mod
    from mcan_vqa_tpu.ops.serving import build_production_engine

    if "BENCH_QFFN_MAX_BATCH" in os.environ:
        serving_mod.QFFN_MAX_BATCH = int(
            os.environ["BENCH_QFFN_MAX_BATCH"])

    # suffix modifiers, any order ("qstatic@g8@c256" == "qstatic@c256@g8"):
    #   @gN  per-config packing-group override (sga_group=N) — G sweeps
    #        stay same-process interleaved
    #   @cN  bulk-batch chunking: the SAME engine, but the forward
    #        lax.scans over B/N chunks of N rows inside one jit (tests
    #        whether the B>=1024 falloff is working-set residency)
    kw = {}
    chunk = None
    name, *mods = name.split("@")
    for mod in mods:
        if mod.startswith("c"):
            chunk = int(mod[1:])
        elif mod.startswith("g"):
            kw["sga_group"] = int(mod[1:])
        else:
            raise SystemExit(f"unknown config modifier @{mod!r}")

    def maybe_chunked(forward):
        if chunk is None:
            return forward

        def chunked(params, img, ques):
            n = img.shape[0] // chunk

            def body(_, xs):
                return None, forward(params, xs[0], xs[1])

            _, logits = jax.lax.scan(
                body, None,
                (img.reshape(n, chunk, *img.shape[1:]),
                 ques.reshape(n, chunk, *ques.shape[1:])))
            return logits.reshape(n * chunk, *logits.shape[2:])

        return chunked

    if name == "int8":
        from mcan_vqa_tpu.ops.quant import (make_quant_serving_fn,
                                            quantize_params)
        params = quantize_params(raw_params, cfg.layer, megakernel=True)
        forward = make_quant_serving_fn(cfg.layer, cfg.multi_head,
                                        megakernel=True,
                                        group=kw.get("sga_group", 4))
        return maybe_chunked(forward), jax.device_put(params)
    if name == "bf16":
        level = 0
    elif name == "qffn":
        level = 1
    elif name == "qffn2":
        level = 2
    elif name == "qstatic":
        level = None  # the builder's calibrated default (level 3 at
        #               every width — the Predictor's act_calibration)
    elif name.startswith("qstatic"):
        level = int(name[len("qstatic"):])
    elif name.startswith("qaux"):
        # level N + the static-int8 AUX sites (cross-kv / AttFlat
        # merges / head — build_production_engine(q8aux=True))
        level = int(name[len("qaux"):]) if name != "qaux" else None
    else:
        raise SystemExit(f"unknown config {name!r}")

    calibrated = name.startswith(("qstatic", "qaux"))
    forward, params = build_production_engine(
        raw_params, cfg.layer, cfg.multi_head, qffn=level,
        q8aux=name.startswith("qaux"),
        act_scale_inputs=(img_d, ques_d) if calibrated else None, **kw)
    # params live on device already (prepare_params runs jnp ops)
    return maybe_chunked(forward), jax.device_put(params)


def main() -> None:
    import jax
    import jax.numpy as jnp

    cache_dir = os.environ.get("JAX_CACHE_DIR", os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        ".jax_cache"))
    try:
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass

    from mcan_vqa_tpu.configs import Config
    from mcan_vqa_tpu.models.net import build_mcan

    names = sys.argv[1:] or ["qffn", "qstatic"]
    model_size = os.environ.get("BENCH_MODEL", "small")
    hidden = {"small": 512, "large": 1024}[model_size]
    cfg = Config(hidden_size=hidden, layer=6, multi_head=8,
                 flat_mlp_size=512, flat_glimpses=1,
                 flat_out_size={"small": 512, "large": 2048}[model_size],
                 img_feat_pad_size=int(os.environ.get("BENCH_REGIONS",
                                                      "60")),
                 use_glove=False).finalize()
    B = int(os.environ.get("BENCH_BATCH", "64"))
    n_iters = int(os.environ.get("BENCH_ITERS", "60"))
    rounds = int(os.environ.get("BENCH_ROUNDS", "3"))

    @jax.jit
    def make_inputs(key):
        k1, k2, k3, k4 = jax.random.split(key, 4)
        R, F, T = cfg.img_feat_pad_size, cfg.img_feat_size, cfg.max_token
        img = jax.random.normal(k1, (B, R, F), jnp.float32)
        n_valid = jax.random.randint(k2, (B, 1), 10, R + 1)
        img = img * (jnp.arange(R)[None, :, None] < n_valid[..., None])
        ques = jax.random.randint(k3, (B, T), 1, 20000, jnp.int32)
        q_len = jax.random.randint(k4, (B, 1), 3, T + 1)
        return img, ques * (jnp.arange(T)[None, :] < q_len)

    img_d, ques_d = make_inputs(jax.random.PRNGKey(0))
    model = build_mcan(cfg, token_size=20000, answer_size=3129)
    raw = jax.jit(model.init)({"params": jax.random.PRNGKey(0)},
                              img_d, ques_d)["params"]

    entries = []
    for name in names:
        forward, params = build_forward(name, raw, cfg, img_d, ques_d)

        @functools.partial(jax.jit, static_argnames="n")
        def loop(params, img, ques, n, forward=forward):
            def body(carry, _):
                logits = forward(params, img + carry, ques)
                probs = jax.nn.sigmoid(logits.astype(jnp.float32))
                return jnp.max(probs) * jnp.float32(1e-30), None
            return jax.lax.scan(body, jnp.float32(0.0), None, length=n)[0]

        float(loop(params, img_d, ques_d, 1))           # compile
        float(loop(params, img_d, ques_d, n_iters + 1))
        entries.append((name, loop, params))

    results = {name: [] for name, _, _ in entries}
    for r in range(rounds):
        for name, loop, params in entries:
            t0 = time.perf_counter()
            float(loop(params, img_d, ques_d, 1))
            overhead = time.perf_counter() - t0
            t0 = time.perf_counter()
            float(loop(params, img_d, ques_d, n_iters + 1))
            el = time.perf_counter() - t0
            qps = B / max((el - overhead) / n_iters, 1e-9)
            results[name].append(qps)
            print(f"round {r}: {name:9s} {qps:10.1f} pairs/s", flush=True)

    print(f"\n== medians over {rounds} interleaved rounds "
          f"({model_size}, B={B}) ==")
    base = None
    for name, _, _ in entries:
        med = statistics.median(results[name])
        if base is None:
            base = med
            print(f"{name:9s} {med:10.1f} pairs/s   (baseline)")
        else:
            print(f"{name:9s} {med:10.1f} pairs/s   "
                  f"{med / base - 1.0:+.1%} vs {entries[0][0]}")


if __name__ == "__main__":
    main()
