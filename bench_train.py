"""Secondary benchmark: MCAN-small TRAINING throughput on one chip.

(bench.py is the driver's headline serving metric; this measures the full
jitted train step — forward, backward, AdamW — samples/sec/chip.)

Same methodology as bench.py: on-device synthetic inputs, N steps chained
inside one jitted lax.scan (the TrainState carry is the dependency), scalar
fetch, 1-iter overhead subtracted.
"""

from __future__ import annotations

import functools
import json
import os
import time


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
    from mcan_vqa_tpu.train.optim import make_lr_schedule, make_optimizer
    from mcan_vqa_tpu.train.step import make_train_step
    from mcan_vqa_tpu.train.train_state import TrainState

    B = int(os.environ.get("BENCH_BATCH", "256"))
    n_iters = int(os.environ.get("BENCH_ITERS", "10"))
    hidden = int(os.environ.get("BENCH_HIDDEN", "512"))
    layers = int(os.environ.get("BENCH_LAYERS", "6"))
    use_packing = os.environ.get("BENCH_PACK", "0") == "1"
    use_fused = os.environ.get("BENCH_FUSED", "0") == "1"
    use_remat = os.environ.get("BENCH_REMAT", "0") == "1"
    accu = int(os.environ.get("BENCH_ACCU", "1"))
    # step-breakdown ablations (no on-device profiler through this relay):
    #   fwd  = forward loss only, no backward / optimizer
    #   grad = forward+backward, no optimizer update
    #   ""   = the full step
    ablate = os.environ.get("BENCH_ABLATE", "")
    mu_dtype = os.environ.get("BENCH_MU_DTYPE", "")   # e.g. bfloat16
    no_dropout = os.environ.get("BENCH_NO_DROPOUT", "0") == "1"
    dropout_bits = int(os.environ.get("BENCH_DROPOUT_BITS", "32"))
    # fused-block engine: decoder fwd+bwd through the custom-VJP SGA
    # megakernel (train/fused_engine.py); value = samples packed per grid
    # step (0 = off/plain XLA step). Measured-best (r3, in-kernel dW):
    # G=4 at hidden<=512 (6,829 samples/s), G=2 at hidden=1024 (2,408 vs
    # XLA 2,253) — docs/PERFORMANCE.md.
    fused_block = int(os.environ.get("BENCH_FUSED_BLOCK",
                                     "4" if hidden <= 512 else "2"))
    # in-kernel TPU-PRNG dropout for the fused blocks (no mask generation
    # or HBM mask traffic; measured 42.8 vs 45.9 ms). Default on.
    kernel_dropout = os.environ.get("BENCH_KERNEL_DROPOUT", "1") == "1"
    # decoder attention backward from saved qkv/qx/r1/r2 instead of the
    # 6*D^2 per-token projection recompute (ops/sga_train att_saves).
    # Measured r4 session 6: D=512 neutral-to-negative (6,899/6,925 vs
    # 6,946 — the saves' HBM traffic buys back exactly the MXU saved),
    # D=1024 +3.6% with bf16 saves (1,944 vs 1,876 — recompute scales as
    # D^2, save traffic as D). Defaults follow the measured winner.
    wide = hidden > 512
    bf16_saves = os.environ.get("BENCH_BF16_SAVES",
                                "1" if wide else "0") == "1"
    att_saves = os.environ.get("BENCH_ATT_SAVES",
                               "1" if wide else "0") == "1"
    # encoder SA stack through the fused custom-VJP blocks. r2 (emission
    # kernels): slightly slower than XLA (44.1 vs 43.4 ms). r3 (in-kernel
    # dW): WINS — same-session 6,781 (XLA) / 7,001 (G=8) / 7,129 (G=16)
    # samples/s. 0=off, 1=auto group (~128 rows), N>1 = explicit encoder
    # packing group. Default matches the shipped Trainer config
    # (G=16 at hidden<=512, off at 1024 pending measurement).
    fused_sa_raw = int(os.environ.get("BENCH_FUSED_SA",
                                      "16" if hidden <= 512 else "0"))
    fused_sa = fused_sa_raw > 0
    enc_group = fused_sa_raw if fused_sa_raw > 1 else 0
    # BENCH_TASK=classify: ClassifierNet (image-only multi-label) through
    # the fused SA train engine (fused_block = SA packing group, 0 = XLA)
    task = os.environ.get("BENCH_TASK", "vqa")
    # BENCH_FLAT_OPT=1: optax.flatten around the optimizer — one fused
    # elementwise AdamW pass over a single concatenated vector instead of
    # ~200 per-leaf kernel launches. (Measured r4: -13%, 4 full concat
    # copies of the param vector per step — recorded negative.)
    flat_opt = os.environ.get("BENCH_FLAT_OPT", "0") == "1"
    # BENCH_STACKED=1: params LIVE in the stacked [L, ...] layout
    # (ops/stacked_params.py) — no per-step qkv concat/split, optimizer
    # over ~54 leaves instead of ~260. Measured NEGATIVE r5 (-0.9%
    # small / -4.3% large, tools/bench_train_ab.py interleaved medians),
    # so default off; kept as a knob with its parity gates.
    stacked = os.environ.get("BENCH_STACKED", "0") == "1"

    cfg = Config(hidden_size=hidden, layer=layers, multi_head=8,
                 flat_mlp_size=512, flat_out_size=512, batch_size=B,
                 grad_accu_steps=accu, opt_mu_dtype=mu_dtype,
                 dropout_rate=0.0 if no_dropout else 0.1,
                 dropout_bits=dropout_bits,
                 use_glove=False, fused_qkv=use_fused, use_remat=use_remat,
                 attention_packing=use_packing).finalize()
    image_only = task == "classify"
    n_ans = 14 if image_only else 3129
    if image_only:
        from mcan_vqa_tpu.models.net import ClassifierNet
        model = ClassifierNet(
            answer_size=n_ans, hidden_size=cfg.hidden_size,
            num_layers=cfg.layer, num_heads=cfg.multi_head,
            ff_size=cfg.ff_size, img_feat_size=cfg.img_feat_size,
            flat_mlp_size=cfg.flat_mlp_size,
            flat_glimpses=cfg.flat_glimpses,
            flat_out_size=cfg.flat_out_size,
            dropout_rate=cfg.dropout_rate,
            dtype=jnp.dtype(cfg.compute_dtype),
            dropout_bits=dropout_bits)
    else:
        model = build_mcan(cfg, token_size=20000, answer_size=n_ans)

    @jax.jit
    def make_batch(key):
        k1, k2, k3 = jax.random.split(key, 3)
        R, F, T = cfg.img_feat_pad_size, cfg.img_feat_size, cfg.max_token
        img = jax.random.normal(k1, (B, R, F), jnp.float32)
        target = (jax.random.uniform(k3, (B, n_ans)) < 0.1).astype(
            jnp.float32)
        out = {"img": img, "target": target}
        if not image_only:
            out["ques"] = jax.random.randint(k2, (B, T), 1, 20000,
                                             jnp.int32)
        return out

    batch = make_batch(jax.random.PRNGKey(0))
    model_inputs = ((batch["img"],) if image_only
                    else (batch["img"], batch["ques"]))
    params = jax.jit(model.init)({"params": jax.random.PRNGKey(0)},
                                 *model_inputs)["params"]
    tx = make_optimizer(cfg, data_size=B * 100)
    if flat_opt:
        import optax
        tx = optax.flatten(tx)
    state = TrainState.create(params, tx, seed=cfg.seed)
    step_fn = make_train_step(model, tx,
                              grad_accu_steps=cfg.grad_accu_steps,
                              image_only=image_only,
                              lr_schedule=make_lr_schedule(
                                  cfg.lr_base, B * 100, B))

    if fused_block:
        import optax

        from mcan_vqa_tpu.train.fused_engine import (
            make_fused_classifier_forward, make_fused_train_forward)
        from mcan_vqa_tpu.train.step import bce_with_logits_sum

        if image_only:
            cfwd = make_fused_classifier_forward(
                cfg.layer, cfg.multi_head, dropout_rate=cfg.dropout_rate,
                dropout_bits=dropout_bits,
                in_kernel_dropout=kernel_dropout, group=fused_block)

            def fwd(params, img, ques, rng):
                return cfwd(params, img, rng)
        else:
            fwd = make_fused_train_forward(
                cfg.layer, cfg.multi_head, dropout_rate=cfg.dropout_rate,
                dropout_bits=dropout_bits, group=fused_block,
                in_kernel_dropout=kernel_dropout, fused_encoder=fused_sa,
                encoder_group=enc_group, bf16_saves=bf16_saves,
                att_saves=att_saves,
                stacked=stacked and not image_only)
            if stacked and not image_only:
                from mcan_vqa_tpu.ops import stacked_params as sp_mod
                state = sp_mod.to_stacked_state(state, cfg.layer)

        def loss_fn(params, batch, rng):
            logits = fwd(params, batch["img"], batch.get("ques"), rng)
            return bce_with_logits_sum(logits, batch["target"])

        lr_schedule = make_lr_schedule(cfg.lr_base, B * 100, B)

        def step_fn(st, batch):  # noqa: F811
            rng = jax.random.fold_in(st.dropout_rng, st.step)
            loss, grads = jax.value_and_grad(loss_fn)(st.params, batch, rng)
            updates, opt_state = tx.update(grads, st.opt_state, st.params)
            params = optax.apply_updates(st.params, updates)
            return st.replace(params=params, opt_state=opt_state,
                              step=st.step + 1), {"loss": loss}

    if ablate:
        from mcan_vqa_tpu.train.step import bce_with_logits_sum

        if fused_block:
            def loss_of(params, batch, rng):
                return bce_with_logits_sum(
                    fwd(params, batch["img"], batch.get("ques"), rng),
                    batch["target"])
        else:
            def loss_of(params, batch, rng):
                ins = ((batch["img"],) if image_only
                       else (batch["img"], batch["ques"]))
                out = model.apply({"params": params}, *ins,
                                  deterministic=False,
                                  rngs={"dropout": rng})
                return bce_with_logits_sum(out["logits"], batch["target"])

        if ablate == "fwd":
            def step_fn(st, batch):  # noqa: F811
                rng = jax.random.fold_in(st.dropout_rng, st.step)
                loss = loss_of(st.params, batch, rng)
                return st.replace(step=st.step + 1), {"loss": loss}
        elif ablate == "grad":
            def step_fn(st, batch):  # noqa: F811
                rng = jax.random.fold_in(st.dropout_rng, st.step)
                loss, grads = jax.value_and_grad(loss_of)(st.params, batch,
                                                          rng)
                # consume grads via a tiny (non-foldable) scalar so the
                # backward pass isn't DCE'd
                s = sum(jnp.sum(g[..., :1]) for g in jax.tree.leaves(grads))
                return st.replace(step=st.step + 1), {
                    "loss": loss + s * jnp.float32(1e-30)}
        else:
            raise SystemExit(f"unknown BENCH_ABLATE={ablate!r}")

    # Buffer donation (BENCH_DONATE=0 disables). Historic note: the r2
    # emission-style kernels faulted the worker under donation at D=1024;
    # the in-kernel-dW kernels run clean (r3: 2,438 samples/s donated).
    donate = (0,) if os.environ.get("BENCH_DONATE", "1") == "1" else ()

    @functools.partial(jax.jit, static_argnames="n", donate_argnums=donate)
    def bench_loop(state, batch, n):
        def body(st, _):
            st, metrics = step_fn(st, batch)
            return st, metrics["loss"]
        st, losses = jax.lax.scan(body, state, None, length=n)
        return st, losses[-1]

    s1, _ = bench_loop(state, batch, 1)           # compile n=1
    sN, _ = bench_loop(s1, batch, n_iters + 1)    # compile n=N+1

    overhead = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        sN, l = bench_loop(sN, batch, 1)
        float(l)
        overhead = min(overhead, time.perf_counter() - t0)

    dt = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        sN, l = bench_loop(sN, batch, n_iters + 1)
        float(l)
        dt = min(dt, time.perf_counter() - t0)

    per_step = max((dt - overhead) / n_iters, 1e-9)
    print(json.dumps({
        "metric": (f"mcan_h{hidden}_train_throughput" if not image_only
                   else f"classifier_h{hidden}_train_throughput"),
        "value": round(B / per_step, 2),
        "unit": "samples/sec/chip",
        "step_ms": round(per_step * 1000, 2),
        "packing": use_packing,
        "fused_qkv": use_fused,
        "remat": use_remat,
        "grad_accu": accu,
        **({"ablate": ablate} if ablate else {}),
        **({"mu_dtype": mu_dtype} if mu_dtype else {}),
        **({"no_dropout": True} if no_dropout else {}),
        **({"dropout_bits": dropout_bits} if dropout_bits != 32 else {}),
        **({"fused_block": fused_block} if fused_block else {}),
        **({"kernel_dropout": True} if kernel_dropout else {}),
        **({"fused_sa": fused_sa_raw} if fused_block and fused_sa else {}),
        **({"att_saves": True} if att_saves else {}),
        **({"bf16_saves": True} if bf16_saves else {}),
        **({"flat_opt": True} if flat_opt else {}),
        **({"diag_softmax": True}
           if os.environ.get("MCAN_DIAG_SOFTMAX", "1") == "1" else {}),
    }))


if __name__ == "__main__":
    main()
