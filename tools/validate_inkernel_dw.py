"""On-TPU validation of the in-kernel weight-gradient accumulation.

The fused train kernels accumulate dW into constant-index output blocks
across the sequential grid (ops/sga_train._acc). Interpret-mode parity is
covered by tests/test_sga_train.py; THIS script checks the same contract
on real Mosaic — where output-block revisiting semantics actually matter —
by comparing the fused block's gradients against jax.grad of a pure-jnp
composition of the same math, at dropout 0.

Run on a TPU host: python tools/validate_inkernel_dw.py
"""

from __future__ import annotations

import sys
import os

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from mcan_vqa_tpu.ops import sga_train as st

B, Lv, Lq, D, H, F, G = 16, 60, 14, 128, 4, 256, 4
Dh = D // H


def reference_block(x, kq, vq, w):
    """Pure-jnp per-sample composition (dropout 0), same primitive math."""
    outs = []
    for b in range(B):
        xb = x[b].astype(jnp.float32)
        qkv = st._mm(xb, w["wqkv"]) + w["bqkv"]
        ohs = []
        for h in range(H):
            qh = qkv[:, h * Dh:(h + 1) * Dh]
            kh = qkv[:, D + h * Dh:D + (h + 1) * Dh]
            vh = qkv[:, 2 * D + h * Dh:2 * D + (h + 1) * Dh]
            p = st._softmax_fwd(st._mm_bt(qh, kh) / (Dh ** 0.5))
            ohs.append(st._mm(p, vh))
        y1 = st._mm(jnp.concatenate(ohs, 1), w["wm1"]) + w["bm1"]
        v1 = st._ln_fwd(xb + y1, w["ln1_s"], w["ln1_b"])
        qx = st._mm(v1, w["wq2"]) + w["bq2"]
        ohs = []
        for h in range(H):
            p = st._softmax_fwd(
                st._mm_bt(qx[:, h * Dh:(h + 1) * Dh], kq[b, h]) / (Dh ** 0.5))
            ohs.append(st._mm(p, vq[b, h]))
        y2 = st._mm(jnp.concatenate(ohs, 1), w["wm2"]) + w["bm2"]
        v2 = st._ln_fwd(v1 + y2, w["ln2_s"], w["ln2_b"])
        a1 = st._mm(v2, w["w1"]) + w["b1"]
        h1 = jnp.maximum(a1, 0.0)
        y3 = st._mm(h1, w["w2"]) + w["b2"]
        v3 = st._ln_fwd(v2 + y3, w["ln3_s"], w["ln3_b"])
        outs.append(v3)
    return jnp.stack(outs)


def main():
    print("backend:", jax.default_backend())
    ks = jax.random.split(jax.random.PRNGKey(0), 12)
    x = jax.random.normal(ks[0], (B, Lv, D), jnp.float32)
    kq = jax.random.normal(ks[1], (B, H, Lq, Dh), jnp.float32)
    vq = jax.random.normal(ks[2], (B, H, Lq, Dh), jnp.float32)

    def mat(k, shape, s=0.2):
        return jax.random.normal(k, shape, jnp.float32) * s

    w = {
        "wqkv": mat(ks[3], (D, 3 * D)), "bqkv": mat(ks[4], (3 * D,)),
        "wm1": mat(ks[5], (D, D)), "bm1": mat(ks[4], (D,)),
        "ln1_s": 1.0 + mat(ks[6], (D,), 0.05), "ln1_b": mat(ks[6], (D,)),
        "wq2": mat(ks[7], (D, D)), "bq2": mat(ks[7], (D,)),
        "wm2": mat(ks[8], (D, D)), "bm2": mat(ks[8], (D,)),
        "ln2_s": 1.0 + mat(ks[9], (D,), 0.05), "ln2_b": mat(ks[9], (D,)),
        "w1": mat(ks[10], (D, F)), "b1": mat(ks[10], (F,)),
        "w2": mat(ks[11], (F, D)), "b2": mat(ks[11], (D,)),
        "ln3_s": 1.0 + mat(ks[0], (D,), 0.05), "ln3_b": mat(ks[0], (D,)),
    }
    masks, inv = st.make_dropout_masks(jax.random.PRNGKey(9), 0.0,
                                       B, Lv, Lq, D, F, H, G)
    probe = jax.random.normal(jax.random.PRNGKey(5), (B, Lv, D))

    def loss_fused(x, kq, vq, w):
        out = st.fused_sga_block_train(
            x, kq, vq, None, None, masks, w, num_heads=H, group=G,
            inv_keep=inv, interpret=False)
        return jnp.sum(out * probe)

    def loss_ref(x, kq, vq, w):
        return jnp.sum(reference_block(x, kq, vq, w) * probe)

    gf = jax.jit(jax.grad(loss_fused, argnums=(0, 1, 2, 3)))(x, kq, vq, w)
    gr = jax.jit(jax.grad(loss_ref, argnums=(0, 1, 2, 3)))(x, kq, vq, w)

    worst = 0.0
    for name, a, b in [("dx", gf[0], gr[0]), ("dkq", gf[1], gr[1]),
                       ("dvq", gf[2], gr[2])] + [
                       (k, gf[3][k], gr[3][k]) for k in gr[3]]:
        a, b = np.asarray(a, np.float64), np.asarray(b, np.float64)
        scale = max(1e-6, np.abs(b).max())
        d = np.abs(a - b).max() / scale
        worst = max(worst, d)
        status = "OK " if d < 3e-2 else "FAIL"
        print(f"  {status} {name:8s} rel_max_delta={d:.5f}")
    print("PASS" if worst < 3e-2 else "FAIL", f"worst={worst:.5f}")
    sys.exit(0 if worst < 3e-2 else 1)


if __name__ == "__main__":
    main()
