"""Custom-VJP fused SGA training block (ops/sga_train.py), interpret mode.

The reference block semantics (core/model/mca.py:134-164 with dropout at
six sites) are reproduced here as a per-sample pure-jnp composition using
the SAME primitive helpers (_mm bf16 matmuls, _ln_fwd, _drop) and the SAME
externally-generated masks; the fused op must match it in forward values
AND in gradients w.r.t. the stream, the cross keys/values, and every
weight — including across packed sample boundaries (G=2 packing).
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mcan_vqa_tpu.ops import sga_train as st

B, Lv, Lq, D, H, F = 4, 10, 6, 32, 4, 64
Dh = D // H
G = 2


def _make_inputs(seed=0, rate=0.0):
    ks = jax.random.split(jax.random.PRNGKey(seed), 12)
    x = jax.random.normal(ks[0], (B, Lv, D), jnp.float32)
    kq = jax.random.normal(ks[1], (B, H, Lq, Dh), jnp.float32)
    vq = jax.random.normal(ks[2], (B, H, Lq, Dh), jnp.float32)
    # pad the tail of each sequence for two samples
    v_mask = jnp.zeros((B, 1, 1, Lv), bool).at[0, ..., -3:].set(True)
    q_mask = jnp.zeros((B, 1, 1, Lq), bool).at[1, ..., -2:].set(True)

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
    masks, inv_keep = st.make_dropout_masks(
        jax.random.PRNGKey(seed + 99), rate, B, Lv, Lq, D, F, H, G)
    return x, kq, vq, v_mask, q_mask, masks, w, inv_keep


def _unpack_mask(m, b, trailing_rows, trailing_cols=None):
    """Pull sample b's slice out of the packed [B//G, ..., G*r, (G*c)]
    layout."""
    gi, j = b // G, b % G
    rows = slice(j * trailing_rows, (j + 1) * trailing_rows)
    blockm = m[gi]
    if trailing_cols is None:
        return blockm[..., rows, :]
    cols = slice(j * trailing_cols, (j + 1) * trailing_cols)
    return blockm[..., rows, cols]


def _reference_block(x, kq, vq, v_mask, q_mask, masks, w, inv_keep):
    """Per-sample pure-jnp composition with identical primitive math."""
    outs = []
    for b in range(B):
        xb = x[b].astype(jnp.float32)                       # [Lv, D]
        vpad = v_mask[b, 0, 0].astype(jnp.float32)          # [Lv]
        qpad = q_mask[b, 0, 0].astype(jnp.float32)          # [Lq]
        self_add = vpad[None, :] * -1e9
        cross_add = qpad[None, :] * -1e9

        m1 = _unpack_mask(masks["att1"], b, Lv, Lv)          # [H, Lv, Lv]
        m2 = _unpack_mask(masks["att2"], b, Lv, Lq)
        my1 = _unpack_mask(masks["y1"], b, Lv)               # [Lv, D]
        my2 = _unpack_mask(masks["y2"], b, Lv)
        mh = _unpack_mask(masks["h1"], b, Lv)
        my3 = _unpack_mask(masks["y3"], b, Lv)

        qkv = st._mm(xb, w["wqkv"]) + w["bqkv"]
        ohs = []
        for h in range(H):
            qh = qkv[:, h * Dh:(h + 1) * Dh]
            kh = qkv[:, D + h * Dh:D + (h + 1) * Dh]
            vh = qkv[:, 2 * D + h * Dh:2 * D + (h + 1) * Dh]
            p = st._softmax_fwd(st._mm_bt(qh, kh) / (Dh ** 0.5) + self_add)
            ohs.append(st._mm(st._drop(p, m1[h], inv_keep), vh))
        y1 = st._mm(jnp.concatenate(ohs, 1), w["wm1"]) + w["bm1"]
        v1 = st._ln_fwd(xb + st._drop(y1, my1, inv_keep),
                        w["ln1_s"], w["ln1_b"])

        qx = st._mm(v1, w["wq2"]) + w["bq2"]
        ohs = []
        for h in range(H):
            p = st._softmax_fwd(
                st._mm_bt(qx[:, h * Dh:(h + 1) * Dh], kq[b, h]) / (Dh ** 0.5)
                + cross_add)
            ohs.append(st._mm(st._drop(p, m2[h], inv_keep), vq[b, h]))
        y2 = st._mm(jnp.concatenate(ohs, 1), w["wm2"]) + w["bm2"]
        v2 = st._ln_fwd(v1 + st._drop(y2, my2, inv_keep),
                        w["ln2_s"], w["ln2_b"])

        a1 = st._mm(v2, w["w1"]) + w["b1"]
        h1d = st._drop(jnp.maximum(a1, 0.0), mh, inv_keep)
        y3 = st._mm(h1d, w["w2"]) + w["b2"]
        v3 = st._ln_fwd(v2 + st._drop(y3, my3, inv_keep),
                        w["ln3_s"], w["ln3_b"])
        outs.append(v3)
    return jnp.stack(outs)


def _fused(x, kq, vq, v_mask, q_mask, masks, w, inv_keep,
           save_acts=True, bf16_saves=False, diag_att=None,
           att_saves=False):
    return st.fused_sga_block_train(
        x, kq, vq, v_mask, q_mask, masks, w,
        num_heads=H, group=G, inv_keep=inv_keep, interpret=True,
        save_acts=save_acts, bf16_saves=bf16_saves, diag_att=diag_att,
        att_saves=att_saves)


@pytest.mark.parametrize("diag", [False, True])
@pytest.mark.parametrize("rate", [0.0, 0.25])
def test_forward_matches_reference(rate, diag):
    x, kq, vq, vm, qm, masks, w, inv = _make_inputs(0, rate)
    got = _fused(x, kq, vq, vm, qm, masks, w, inv, diag_att=diag)
    want = _reference_block(x, kq, vq, vm, qm, masks, w, inv)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=0, atol=2e-4)


def test_diag_softmax_bitwise_equals_full_width():
    """The block-diagonal self-attention path is EXACTLY the full-width
    packed path (off-diagonal probabilities underflow to +0.0), forward
    and gradients, for the same external masks."""
    x, kq, vq, vm, qm, masks, w, inv = _make_inputs(3, 0.25)
    probe = jax.random.normal(jax.random.PRNGKey(7), (B, Lv, D))

    def loss(diag):
        def f(x, kq, vq, w):
            return jnp.sum(_fused(x, kq, vq, vm, qm, masks, w, inv,
                                  diag_att=diag) * probe)
        return f

    out_d = _fused(x, kq, vq, vm, qm, masks, w, inv, diag_att=True)
    out_f = _fused(x, kq, vq, vm, qm, masks, w, inv, diag_att=False)
    np.testing.assert_array_equal(np.asarray(out_d), np.asarray(out_f))
    gd = jax.grad(loss(True), argnums=(0, 1, 2, 3))(x, kq, vq, w)
    gf = jax.grad(loss(False), argnums=(0, 1, 2, 3))(x, kq, vq, w)
    for a, b in zip(jax.tree.leaves(gd), jax.tree.leaves(gf)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_att_saves_matches_recompute():
    """The att-saves backward (qkv/qx/r1/r2 saved f32 by the forward)
    reads the very values the recompute path rebuilds — gradients agree
    to f32 rounding (the two programs are compiled separately, so FMA
    contraction/reassociation differs by ~1 ulp; anything beyond ~1e-5
    would be a real math divergence)."""
    x, kq, vq, vm, qm, masks, w, inv = _make_inputs(4, 0.25)
    probe = jax.random.normal(jax.random.PRNGKey(9), (B, Lv, D))

    def loss(att_saves):
        def f(x, kq, vq, w):
            return jnp.sum(_fused(x, kq, vq, vm, qm, masks, w, inv,
                                  diag_att=True, att_saves=att_saves)
                           * probe)
        return f

    ga = jax.grad(loss(True), argnums=(0, 1, 2, 3))(x, kq, vq, w)
    gr = jax.grad(loss(False), argnums=(0, 1, 2, 3))(x, kq, vq, w)
    for a, b in zip(jax.tree.leaves(ga), jax.tree.leaves(gr)):
        scale = max(1e-6, float(jnp.max(jnp.abs(b))))
        np.testing.assert_allclose(np.asarray(a) / scale,
                                   np.asarray(b) / scale,
                                   rtol=0, atol=1e-5)


@pytest.mark.parametrize("rate,save_acts,bf16_saves,diag,att_saves",
                         [(0.0, True, False, False, False),
                          (0.25, True, False, False, False),
                          (0.25, True, False, True, False),
                          (0.25, False, False, True, False),
                          (0.25, True, True, True, False),
                          (0.25, True, True, True, True)])
def test_gradients_match_reference(rate, save_acts, bf16_saves, diag,
                                   att_saves):
    # bf16_saves quantizes the backward-only saves (v1/v2/r3, and
    # qkv/qx/r1/r2 under att_saves) and gv2 to bf16 — a ~0.4% relative
    # perturbation well inside the 3e-2 gate the bf16-matmul kernels
    # already need.
    x, kq, vq, vm, qm, masks, w, inv = _make_inputs(1, rate)
    probe = jax.random.normal(jax.random.PRNGKey(5), (B, Lv, D))

    def loss_fused(x, kq, vq, w):
        return jnp.sum(_fused(x, kq, vq, vm, qm, masks, w, inv,
                              save_acts=save_acts,
                              bf16_saves=bf16_saves,
                              diag_att=diag,
                              att_saves=att_saves) * probe)

    def loss_ref(x, kq, vq, w):
        return jnp.sum(
            _reference_block(x, kq, vq, vm, qm, masks, w, inv) * probe)

    gf = jax.grad(loss_fused, argnums=(0, 1, 2, 3))(x, kq, vq, w)
    gr = jax.grad(loss_ref, argnums=(0, 1, 2, 3))(x, kq, vq, w)

    for name, a, b in [("dx", gf[0], gr[0]), ("dkq", gf[1], gr[1]),
                       ("dvq", gf[2], gr[2])]:
        scale = max(1e-6, float(jnp.max(jnp.abs(b))))
        np.testing.assert_allclose(
            np.asarray(a) / scale, np.asarray(b) / scale,
            rtol=0, atol=3e-2, err_msg=name)
    for key in gr[3]:
        a, b = gf[3][key], gr[3][key]
        scale = max(1e-6, float(jnp.max(jnp.abs(b))))
        np.testing.assert_allclose(
            np.asarray(a) / scale, np.asarray(b) / scale,
            rtol=0, atol=3e-2, err_msg=key)


def test_prng_keep_params_quantization():
    """In-kernel PRNG keep threshold: exact quantized unbiasedness."""
    t, inv = st.prng_keep_params(0.1)
    assert t == round(0.9 * 2**32)
    assert abs(inv * (t / 2**32) - 1.0) < 1e-12
    t0, inv0 = st.prng_keep_params(0.0)
    assert t0 == 2**32 - 1 and abs(inv0 - 1.0) < 1e-9
    t5, inv5 = st.prng_keep_params(0.5)
    assert t5 == 1 << 31 and inv5 == 2.0


def test_values_finite_and_dropout_changes_output():
    x, kq, vq, vm, qm, masks, w, inv = _make_inputs(2, 0.25)
    out_d = _fused(x, kq, vq, vm, qm, masks, w, inv)
    ones = {k: jnp.ones_like(v) for k, v in masks.items()}
    out_nd = _fused(x, kq, vq, vm, qm, ones, w, 1.0)
    assert np.all(np.isfinite(np.asarray(out_d)))
    assert not np.allclose(np.asarray(out_d), np.asarray(out_nd))
