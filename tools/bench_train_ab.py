"""Same-process interleaved A/B of TRAIN-step configurations on the TPU.

bench_train.py is the single-config driver contract; engine-vs-engine
train comparisons need the same in-process interleaving discipline as
tools/bench_serving_ab.py (cross-process numbers on this rig drift >10%).

Usage:
    python tools/bench_train_ab.py standard stacked
    BENCH_HIDDEN=1024 BENCH_BATCH=256 python tools/bench_train_ab.py ...

Configs (all through the fused custom-VJP train engine at the Trainer's
shipped knobs — group, fused encoder, att/bf16 saves follow the width):
    standard  params in the standard flax tree (prepare_* concats in-step,
              per-leaf optimizer, ~260 leaves)
    stacked   params in the ops/stacked_params [L, ...] layout
              (~54 leaves, no in-step concat/split)
Timing matches bench_train.py: n steps chained in one jitted lax.scan,
1-step dispatch overhead subtracted, inputs generated on device.
"""

from __future__ import annotations

import functools
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))


def main() -> None:
    import jax
    import jax.numpy as jnp
    import optax

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
    from mcan_vqa_tpu.ops import stacked_params as sp
    from mcan_vqa_tpu.train.fused_engine import make_fused_train_forward
    from mcan_vqa_tpu.train.optim import make_lr_schedule, make_optimizer
    from mcan_vqa_tpu.train.step import bce_with_logits_sum
    from mcan_vqa_tpu.train.train_state import TrainState

    names = sys.argv[1:] or ["standard", "stacked"]
    B = int(os.environ.get("BENCH_BATCH", "256"))
    hidden = int(os.environ.get("BENCH_HIDDEN", "512"))
    layers = int(os.environ.get("BENCH_LAYERS", "6"))
    n_iters = int(os.environ.get("BENCH_ITERS", "20"))
    rounds = int(os.environ.get("BENCH_ROUNDS", "5"))
    wide = hidden > 512

    cfg = Config(hidden_size=hidden, layer=layers, multi_head=8,
                 flat_mlp_size=512, flat_out_size=512, batch_size=B,
                 dropout_rate=0.1, use_glove=False).finalize()
    model = build_mcan(cfg, token_size=20000, answer_size=3129)

    @jax.jit
    def make_batch(key):
        k1, k2, k3 = jax.random.split(key, 3)
        R, F, T = cfg.img_feat_pad_size, cfg.img_feat_size, cfg.max_token
        return {"img": jax.random.normal(k1, (B, R, F), jnp.float32),
                "ques": jax.random.randint(k2, (B, T), 1, 20000, jnp.int32),
                "target": (jax.random.uniform(k3, (B, 3129)) < 0.1
                           ).astype(jnp.float32)}

    batch = make_batch(jax.random.PRNGKey(0))
    params = jax.jit(model.init)({"params": jax.random.PRNGKey(0)},
                                 batch["img"], batch["ques"])["params"]
    tx = make_optimizer(cfg, data_size=B * 100)
    lr = make_lr_schedule(cfg.lr_base, B * 100, B)  # noqa: F841

    def build(name):
        stacked = name == "stacked"
        fwd = make_fused_train_forward(
            cfg.layer, cfg.multi_head, dropout_rate=cfg.dropout_rate,
            group=4 if hidden <= 512 else 2,
            fused_encoder=hidden <= 512, encoder_group=16,
            att_saves=wide, bf16_saves=wide,
            in_kernel_dropout=True, stacked=stacked)
        st = TrainState.create(params, tx, seed=cfg.seed)
        if stacked:
            st = sp.to_stacked_state(st, cfg.layer)

        def loss_fn(p, batch, rng):
            return bce_with_logits_sum(
                fwd(p, batch["img"], batch["ques"], rng), batch["target"])

        def step_fn(s, batch):
            rng = jax.random.fold_in(s.dropout_rng, s.step)
            loss, grads = jax.value_and_grad(loss_fn)(s.params, batch, rng)
            updates, opt_state = tx.update(grads, s.opt_state, s.params)
            p = optax.apply_updates(s.params, updates)
            return s.replace(params=p, opt_state=opt_state,
                             step=s.step + 1), loss

        @functools.partial(jax.jit, static_argnames="n")
        def loop(s, batch, n):
            def body(st_, _):
                st_, loss = step_fn(st_, batch)
                return st_, loss
            st_, losses = jax.lax.scan(body, s, None, length=n)
            return st_, losses[-1]

        st, _ = loop(st, batch, 1)                 # compile n=1
        st, _ = loop(st, batch, n_iters + 1)       # compile n=N+1
        return loop, st

    entries = [(name,) + build(name) for name in names]

    results = {name: [] for name, _, _ in entries}
    for r in range(rounds):
        for name, loop, st in entries:
            t0 = time.perf_counter()
            s1, l1 = loop(st, batch, 1)
            float(l1)
            overhead = time.perf_counter() - t0
            t0 = time.perf_counter()
            s2, l2 = loop(st, batch, n_iters + 1)
            float(l2)
            el = time.perf_counter() - t0
            sps = B / max((el - overhead) / n_iters, 1e-9)
            results[name].append(sps)
            print(f"round {r}: {name:9s} {sps:10.1f} samples/s",
                  flush=True)

    print(f"\n== medians over {rounds} interleaved rounds "
          f"(hidden={hidden}, B={B}) ==")
    base = None
    for name, _, _ in entries:
        med = statistics.median(results[name])
        if base is None:
            base = med
            print(f"{name:9s} {med:10.1f} samples/s   (baseline)")
        else:
            print(f"{name:9s} {med:10.1f} samples/s   "
                  f"{med / base - 1.0:+.1%} vs {entries[0][0]}")


if __name__ == "__main__":
    main()
