"""On-TPU validation of the att-saves backward (PRNG-dropout variant).

Interpret-mode parity of the external-mask att-saves path is covered by
tests/test_sga_train.py; THIS script checks the in-kernel-PRNG variant on
real Mosaic, where the backward regenerates the dropout masks from the
hardware PRNG: with the same seed, the att-saves and recompute paths draw
IDENTICAL masks (same site codes), so their gradients must agree to save
rounding — ~1 ulp for f32 saves, bf16-rounding-bounded for bf16 saves.

Run on a TPU host: python tools/validate_att_saves.py
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from mcan_vqa_tpu.ops import sga_train as st

B, Lv, Lq, D, H, G = 16, 60, 14, 128, 4, 4
Dh = D // H
RATE = 0.1


def make_inputs(seed):
    ks = jax.random.split(jax.random.PRNGKey(seed), 20)
    x = jax.random.normal(ks[0], (B, Lv, D), jnp.float32)
    kq = jax.random.normal(ks[1], (B, H, Lq, Dh), jnp.float32)
    vq = jax.random.normal(ks[2], (B, H, Lq, Dh), jnp.float32)
    F = 2 * D
    shapes = {
        "wqkv": (D, 3 * D), "bqkv": (3 * D,), "wm1": (D, D), "bm1": (D,),
        "ln1_s": (D,), "ln1_b": (D,), "wq2": (D, D), "bq2": (D,),
        "wm2": (D, D), "bm2": (D,), "ln2_s": (D,), "ln2_b": (D,),
        "w1": (D, F), "b1": (F,), "w2": (F, D), "b2": (D,),
        "ln3_s": (D,), "ln3_b": (D,),
    }
    w = {}
    for i, (name, shp) in enumerate(sorted(shapes.items())):
        if name.startswith("ln") and name.endswith("_s"):
            w[name] = jnp.ones(shp, jnp.float32)
        elif name.startswith(("b", "ln")):
            w[name] = jnp.zeros(shp, jnp.float32)
        else:
            w[name] = jax.random.normal(ks[3 + i], shp) * (0.5 / shp[0] ** 0.5)
    vpad = jnp.zeros((B // G, 1, G * Lv), jnp.int8)
    qpad = jnp.zeros((B // G, 1, G * Lq), jnp.int8)
    seed_arr = jnp.array([12345], jnp.int32)
    return x, kq, vq, vpad, qpad, seed_arr, w


def grads(att_saves, bf16_saves):
    x, kq, vq, vpad, qpad, seed_arr, w = make_inputs(0)
    f = st.make_sga_block_train_prng(H, G, RATE, att_saves=att_saves,
                                     bf16_saves=bf16_saves)
    probe = jax.random.normal(jax.random.PRNGKey(7), (B, Lv, D))

    def loss(x, kq, vq, w):
        return jnp.sum(f(x, kq, vq, vpad, qpad, seed_arr, w) * probe)

    return jax.jit(jax.grad(loss, argnums=(0, 1, 2, 3)))(x, kq, vq, w)


def compare(tag, ga, gb, atol):
    worst = 0.0
    for a, b in zip(jax.tree.leaves(ga), jax.tree.leaves(gb)):
        scale = max(1e-6, float(jnp.max(jnp.abs(b))))
        d = float(jnp.max(jnp.abs(a - b))) / scale
        worst = max(worst, d)
    ok = worst <= atol
    print(f"{tag}: worst scaled diff {worst:.3e} (gate {atol:g}) "
          f"{'PASS' if ok else 'FAIL'}")
    return ok


def main():
    assert jax.default_backend() == "tpu", "run on a TPU host"
    base = grads(att_saves=False, bf16_saves=False)
    sav32 = grads(att_saves=True, bf16_saves=False)
    sav16 = grads(att_saves=True, bf16_saves=True)
    ok = compare("att_saves f32 vs recompute", sav32, base, 1e-5)
    ok &= compare("att_saves bf16 vs recompute", sav16, base, 3e-2)
    raise SystemExit(0 if ok else 1)


if __name__ == "__main__":
    main()
