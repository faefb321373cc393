"""Per-component attribution of the fused train step (VERDICT r4 #2).

The full MCAN-small train step runs at ~34 ms (B=256): fwd ~8.7 ms,
fwd+bwd ~34, so the backward costs ~2.9x the forward against a canonical
~2x. No on-device profiler works through this relay, so attribution is by
COMPONENT ABLATION: each stack (embed+LSTM, encoder SA, decoder SGA,
AttFlat head) is timed in isolation — forward-only and forward+backward —
with the same scan-loop methodology as bench_train.py (on-device inputs,
N iterations chained through a loop-carried scalar, 1-iter overhead
subtracted). The full fwd / grad / step are re-measured same-session so
the component slices can be compared against the whole honestly.

Components (MCAN-small geometry, B=256 default):
  embed_lstm : embedding take + LSTM over [B, 14] tokens
  encoder    : 6 fused SA train blocks over q [B, 14, 512]   (G=16)
  decoder    : 6 fused SGA train blocks over v [B, 60, 512] + per-block
               cross-KV projections from a CONSTANT q           (G=4)
  head       : 2x AttFlat + proj_norm + proj (3129-wide)
  full_*     : the real assembled forward (train/fused_engine.py)

Prints one JSON line per measurement:
  {"component", "mode", "ms_per_step", "samples_per_s"}

Env knobs: ATTR_BATCH (256), ATTR_ITERS (10), ATTR_HIDDEN (512),
ATTR_REPEATS (3, median), ATTR_ONLY (comma list of component names),
ATTR_GROUP / ATTR_SA_GROUP (decoder/encoder packing groups),
ATTR_BF16_SAVES=1, ATTR_KERNEL_DROPOUT (default 1).
"""

from __future__ import annotations

import functools
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    import jax

    cache_dir = os.environ.get("JAX_CACHE_DIR",
                               os.path.join(os.path.dirname(os.path.dirname(
                                   os.path.abspath(__file__))), ".jax_cache"))
    try:
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass
    import jax.numpy as jnp

    from mcan_vqa_tpu.configs import Config
    from mcan_vqa_tpu.models.net import build_mcan
    from mcan_vqa_tpu.ops.serving import _dense, _lstm, _std_layer_norm
    from mcan_vqa_tpu.train.fused_engine import (_attflat_train,
                                                 make_fused_train_forward)

    B = int(os.environ.get("ATTR_BATCH", "256"))
    n_iters = int(os.environ.get("ATTR_ITERS", "10"))
    hidden = int(os.environ.get("ATTR_HIDDEN", "512"))
    layers = int(os.environ.get("ATTR_LAYERS", "6"))
    repeats = int(os.environ.get("ATTR_REPEATS", "3"))
    group = int(os.environ.get("ATTR_GROUP", "4" if hidden <= 512 else "2"))
    sa_group = int(os.environ.get("ATTR_SA_GROUP", "16"))
    bf16_saves = os.environ.get("ATTR_BF16_SAVES", "0") == "1"
    kernel_dropout = os.environ.get("ATTR_KERNEL_DROPOUT", "1") == "1"
    only = set(filter(None, os.environ.get("ATTR_ONLY", "").split(",")))

    cfg = Config(hidden_size=hidden, layer=layers, multi_head=8,
                 flat_mlp_size=512, flat_out_size=512, batch_size=B,
                 dropout_rate=0.1, use_glove=False).finalize()
    model = build_mcan(cfg, token_size=20000, answer_size=3129)

    on_tpu = jax.default_backend() == "tpu"
    fused_sa = hidden <= 512

    @jax.jit
    def make_batch(key):
        k1, k2, k3 = jax.random.split(key, 3)
        R, F, T = cfg.img_feat_pad_size, cfg.img_feat_size, cfg.max_token
        img = jax.random.normal(k1, (B, R, F), jnp.float32)
        ques = jax.random.randint(k2, (B, T), 1, 20000, jnp.int32)
        target = (jax.random.uniform(k3, (B, 3129)) < 0.1).astype(
            jnp.float32)
        return {"img": img, "ques": ques, "target": target}

    batch = make_batch(jax.random.PRNGKey(0))
    params = jax.jit(model.init)({"params": jax.random.PRNGKey(0)},
                                 batch["img"], batch["ques"])["params"]

    full_fwd = make_fused_train_forward(
        cfg.layer, cfg.multi_head, dropout_rate=cfg.dropout_rate,
        group=group, in_kernel_dropout=on_tpu and kernel_dropout,
        fused_encoder=fused_sa, encoder_group=sa_group,
        interpret=not on_tpu, bf16_saves=bf16_saves)

    # ---- component losses (each a pure fn of (params, batch, rng)) ----
    # Kernel plumbing is borrowed from make_fused_train_forward by
    # zeroing out the OTHER stacks via jax.lax.stop_gradient is not
    # possible (the kernels still execute), so each component is
    # assembled from the same building blocks the real forward uses.
    from mcan_vqa_tpu.models.layers import make_mask
    from mcan_vqa_tpu.ops.sa_train import (fused_sa_block_train,
                                           prepare_sa_train_params)
    from mcan_vqa_tpu.ops.sga_train import (fused_sga_block_train_prng,
                                            prepare_sga_train_params)
    BF16 = jnp.bfloat16
    rate = cfg.dropout_rate
    H = cfg.multi_head
    D = hidden
    Dh = D // H

    def embed_lstm_loss(params, batch, rng):
        q = jnp.take(params["embedding"]["embedding"], batch["ques"],
                     axis=0)
        q = _lstm(params["lstm"], q)
        return jnp.sum(q.astype(jnp.float32) ** 2) * jnp.float32(1e-9)

    def encoder_stack(params, q, q_mask, rng):
        keys = jax.random.split(rng, layers)
        bb = params["backbone"]
        for i in range(layers):
            w = prepare_sa_train_params(bb[f"enc_{i}"])
            for name in ("wqkv", "wm", "w1", "w2"):
                w[name] = w[name].astype(BF16)
            seed = jax.random.randint(keys[i], (1,), 0,
                                      jnp.iinfo(jnp.int32).max, jnp.int32)
            q = fused_sa_block_train(q, q_mask, seed, w, num_heads=H,
                                     rate=rate, group=sa_group,
                                     interpret=not on_tpu)
        return q

    def encoder_loss(params, batch, rng):
        q_mask = make_mask(batch["ques"][..., None])
        q = jax.random.normal(jax.random.PRNGKey(1),
                              (B, cfg.max_token, D), jnp.float32)
        q = encoder_stack(params, q, q_mask, rng)
        return jnp.sum(q ** 2) * jnp.float32(1e-9)

    def decoder_loss(params, batch, rng):
        q_mask = make_mask(batch["ques"][..., None])
        v_mask = make_mask(batch["img"])
        # constant encoder output: isolates the SGA stack + cross-KV
        q = jax.random.normal(jax.random.PRNGKey(2),
                              (B, cfg.max_token, D), jnp.float32)
        v = _dense(params["img_feat_linear"], batch["img"]).astype(
            jnp.float32)
        keys = jax.random.split(rng, layers)
        bb = params["backbone"]
        Lq = cfg.max_token
        for i in range(layers):
            p = bb[f"dec_{i}"]
            kx = _dense(p["mhatt2"]["linear_k"], q)
            vx = _dense(p["mhatt2"]["linear_v"], q)
            sp = lambda t: t.reshape(B, Lq, H, Dh).transpose(0, 2, 1, 3)
            w = prepare_sga_train_params(p)
            for name in ("wqkv", "wm1", "wq2", "wm2", "w1", "w2"):
                w[name] = w[name].astype(BF16)
            seed = jax.random.randint(keys[i], (1,), 0,
                                      jnp.iinfo(jnp.int32).max, jnp.int32)
            v = fused_sga_block_train_prng(
                v, sp(kx), sp(vx), v_mask, q_mask, seed, w, num_heads=H,
                group=group, rate=rate, bf16_saves=bf16_saves)
        return jnp.sum(v ** 2) * jnp.float32(1e-9)

    def head_loss(params, batch, rng):
        q_mask = make_mask(batch["ques"][..., None])
        v_mask = make_mask(batch["img"])
        k1, k2 = jax.random.split(rng)
        q = jax.random.normal(jax.random.PRNGKey(3),
                              (B, cfg.max_token, D), jnp.float32)
        v = jax.random.normal(jax.random.PRNGKey(4),
                              (B, cfg.img_feat_pad_size, D), jnp.float32)
        lang = _attflat_train(params["attflat_lang"], q, q_mask, rate, k1,
                              32)
        img = _attflat_train(params["attflat_img"], v, v_mask, rate, k2, 32)
        fused = _std_layer_norm(params["proj_norm"], lang + img)
        logits = _dense(params["proj"], fused)
        return jnp.sum(logits.astype(jnp.float32) ** 2) * jnp.float32(1e-9)

    from mcan_vqa_tpu.train.step import bce_with_logits_sum

    def full_loss(params, batch, rng):
        logits = full_fwd(params, batch["img"], batch["ques"], rng)
        return bce_with_logits_sum(logits, batch["target"])

    losses = {"embed_lstm": embed_lstm_loss, "encoder": encoder_loss,
              "decoder": decoder_loss, "head": head_loss,
              "full": full_loss}

    def timed_loop(fn):
        @functools.partial(jax.jit, static_argnames="n")
        def loop(params, batch, n):
            def body(c, _):
                rng = jax.random.fold_in(jax.random.PRNGKey(0),
                                         c.astype(jnp.int32))
                return fn(params, batch, rng) * jnp.float32(1e-30) + c, None
            c, _ = jax.lax.scan(body, jnp.float32(0.0), None, length=n)
            return c

        float(loop(params, batch, 1))
        float(loop(params, batch, n_iters + 1))

        def t(n):
            t0 = time.perf_counter()
            float(loop(params, batch, n))
            return time.perf_counter() - t0

        ovh = float(np.median([t(1) for _ in range(repeats)]))
        med = float(np.median([t(n_iters + 1) for _ in range(repeats)]))
        return max((med - ovh) / n_iters, 1e-9)

    def report(component, mode, sec):
        print(json.dumps({"component": component, "mode": mode,
                          "ms_per_step": round(sec * 1e3, 3),
                          "samples_per_s": round(B / sec, 1)}), flush=True)

    for name, loss in losses.items():
        if only and name not in only:
            continue
        report(name, "fwd", timed_loop(loss))

        def grad_fn(params, batch, rng, loss=loss):
            l, grads = jax.value_and_grad(loss)(params, batch, rng)
            s = sum(jnp.sum(g[..., :1]) for g in jax.tree.leaves(grads))
            return l + s * jnp.float32(1e-30)

        report(name, "fwd+bwd", timed_loop(grad_fn))


if __name__ == "__main__":
    main()
