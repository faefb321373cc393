"""Microbench ONE fused SGA train block (fwd+bwd) on the real chip,
A/B over diag on/off in one process (interleaved, median-of-K) — isolates
the block-diagonal attention effect from the full train step.

Env: BB (batch, 256), GG (group, 4), HID (512), REPS (5), ITERS (20).
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from mcan_vqa_tpu.ops import sga_train as st

B = int(os.environ.get("BB", "256"))
G = int(os.environ.get("GG", "4"))
D = int(os.environ.get("HID", "512"))
H = 8
Lv, Lq = 100, 14
F = 4 * D
REPS = int(os.environ.get("REPS", "5"))
ITERS = int(os.environ.get("ITERS", "20"))


def build(diag):
    f = st.make_sga_block_train_prng(
        num_heads=H, group=G, rate=0.1, diag_att=diag)

    def step(x, kq, vq, vpad, qpad, seed, w):
        def loss(w):
            out = f(x, kq, vq, vpad, qpad, seed, w)
            return jnp.sum(out * out)
        l, g = jax.value_and_grad(loss)(w)
        return l, g

    def timed(n, args):
        # fence-free timing: carry a scalar through a lax.scan of n steps
        def body(c, _):
            l, g = step(*args[:-1], args[-1])
            return c + l * 1e-30, None
        c, _ = jax.lax.scan(body, jnp.float32(0.0), None, length=n)
        return c
    return jax.jit(timed, static_argnums=0), step


def main():
    rng = np.random.default_rng(0)
    key = jax.random.PRNGKey(0)
    x = jax.device_put(rng.normal(size=(B, Lv, D)).astype(np.float32))
    kq = jax.device_put(rng.normal(size=(B, H, Lq, D // H)).astype(np.float32))
    vq = jax.device_put(rng.normal(size=(B, H, Lq, D // H)).astype(np.float32))
    nb = B // G
    vpad = jnp.zeros((nb, 1, G * Lv), jnp.int8)
    qpad = jnp.zeros((nb, 1, G * Lq), jnp.int8)
    seed = jnp.zeros((1,), jnp.int32)

    def dense(din, dout):
        return {"kernel": rng.normal(size=(din, dout),
                                     scale=0.02).astype(np.float32),
                "bias": np.zeros(dout, np.float32)}

    def norm():
        return {"scale": np.ones(D, np.float32),
                "bias": np.zeros(D, np.float32)}

    p = {
        "mhatt1": {"linear_q": dense(D, D), "linear_k": dense(D, D),
                   "linear_v": dense(D, D), "linear_merge": dense(D, D)},
        "mhatt2": {"linear_q": dense(D, D), "linear_merge": dense(D, D)},
        "ffn": {"mlp": {"FCLayer_0": {"Dense_0": dense(D, F)},
                        "Dense_0": dense(F, D)}},
        "norm1": norm(), "norm2": norm(), "norm3": norm(),
    }
    w = jax.device_put(st.prepare_sga_train_params(p))

    results = {}
    fns = {}
    for diag in (False, True):
        timed, _ = build(diag)
        args = (x, kq, vq, vpad, qpad, seed, w)
        fns[diag] = (timed, args)
        float(timed(1, args))  # compile
    for diag in (False, True):   # interleaved timing
        results[diag] = []
    for _ in range(REPS):
        for diag in (False, True):
            timed, args = fns[diag]
            t0 = time.perf_counter()
            float(timed(ITERS, args))
            dt = (time.perf_counter() - t0) / ITERS * 1e3
            results[diag].append(dt)
    for diag in (False, True):
        med = float(np.median(results[diag]))
        print({"diag": diag, "ms_per_block_step": round(med, 3),
               "samples_per_s": round(B / med * 1e3, 1)}, flush=True)


if __name__ == "__main__":
    main()
