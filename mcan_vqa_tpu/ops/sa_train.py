"""Custom-VJP fused SA encoder block for TRAINING (Pallas TPU).

The decoder (SGA) train blocks are fused in ops/sga_train.py; this module
is the symmetric treatment of the ENCODER path — the reference SA block
(core/model/mca.py:105-127):

    x = LN1(x + drop(merge(self_att(x))))
    x = LN2(x + drop(FFN(x)))

with the reference's four dropout sites (attention map, attention output,
FFN mid, FFN output). One forward kernel (emits x1 = the post-LN1
intermediate alongside the output) and ONE backward kernel (the question
stream is [B, 14, D] — small enough that the full recompute-style backward
fits one launch, unlike the SGA block's two).

Dropout masks: external uint8 (CPU-testable, interpret mode) or the
in-kernel TPU hardware PRNG (site codes 0x4xx/0x5xx, disjoint from the
SGA block's 0x1xx-0x3xx — see ops/sga_train._PrngMasks for the scheme).
Weight gradients accumulate in-kernel across the sequential grid
(constant-index f32 output blocks, see ops/sga_train._acc), exactly like
the SGA block — dx is the only per-position emission of the backward.

Sequence layout matches ops/sga_block.fused_sa_block: G samples packed per
grid step with a block-diagonal mask folded into the softmax (G*Lq rows
per matmul — 14-token questions underfill the MXU one at a time).
"""

from __future__ import annotations

import functools
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from mcan_vqa_tpu.ops.sga_train import (_acc, _block_masks,
                                        _compiler_params, _drop, _flat_pad,
                                        _grid_specs, _ln_bwd_u, _ln_fwd,
                                        _mm, _mm_bt, _mm_tn, _rsum,
                                        _seed_spec, _softmax_bwd,
                                        _softmax_fwd, prng_keep_params)

BF16 = jnp.bfloat16
F32 = jnp.float32

SA_MASK_NAMES = ("att", "y1", "h1", "y2")

# PRNG site codes — disjoint from the SGA block's (0x100-0x304)
_SITE_SA_ATT = 0x400   # + head index
_SITE_SA_Y1 = 0x501
_SITE_SA_H1 = 0x502
_SITE_SA_Y2 = 0x503


class _ExtMasksSA:
    def __init__(self, m_att, my1, mh, my2, inv_keep):
        self.m_att, self.my1, self.mh, self.my2 = m_att, my1, mh, my2
        self.inv = inv_keep

    def att(self, x, h):
        return _drop(x, self.m_att[0, h], self.inv)

    def y1(self, x):
        return _drop(x, self.my1[0], self.inv)

    def h1(self, x):
        return _drop(x, self.mh[0], self.inv)

    def y2(self, x):
        return _drop(x, self.my2[0], self.inv)


class _PrngMasksSA:
    def __init__(self, seed, pid, keep_thresh, inv_keep):
        self.seed, self.pid = seed, pid
        self.thresh = jnp.uint32(keep_thresh)
        self.inv = inv_keep

    def _d(self, x, site):
        from mcan_vqa_tpu.ops.sga_train import _ABLATE
        if "dropout" in _ABLATE:   # timing-only stub (wrong math)
            return x
        from jax.experimental.pallas import tpu as pltpu
        pltpu.prng_seed(self.seed, (site << 19) | self.pid)
        bits = jax.lax.bitcast_convert_type(
            pltpu.prng_random_bits(x.shape), jnp.uint32)
        return jnp.where(bits < self.thresh, x * self.inv, 0.0)

    def att(self, x, h):
        return self._d(x, _SITE_SA_ATT + h)

    def y1(self, x):
        return self._d(x, _SITE_SA_Y1)

    def h1(self, x):
        return self._d(x, _SITE_SA_H1)

    def y2(self, x):
        return self._d(x, _SITE_SA_Y2)


def prepare_sa_train_params(p: Dict[str, Any]) -> Dict[str, Any]:
    """Re-layout one SA block's params (models.mca.SA tree) for the train
    kernels. Runs inside the differentiated step so grads flow back."""
    m = p["mhatt"]
    mlp = p["ffn"]["mlp"]
    return {
        "wqkv": jnp.concatenate([m["linear_q"]["kernel"],
                                 m["linear_k"]["kernel"],
                                 m["linear_v"]["kernel"]], axis=1),
        "bqkv": jnp.concatenate([m["linear_q"]["bias"],
                                 m["linear_k"]["bias"],
                                 m["linear_v"]["bias"]]),
        "wm": m["linear_merge"]["kernel"],
        "bm": m["linear_merge"]["bias"],
        "ln1_s": p["norm1"]["scale"], "ln1_b": p["norm1"]["bias"],
        "w1": mlp["FCLayer_0"]["Dense_0"]["kernel"],
        "b1": mlp["FCLayer_0"]["Dense_0"]["bias"],
        "w2": mlp["Dense_0"]["kernel"],
        "b2": mlp["Dense_0"]["bias"],
        "ln2_s": p["norm2"]["scale"], "ln2_b": p["norm2"]["bias"],
    }


# ---------------------------------------------------------------------------
# kernels
# ---------------------------------------------------------------------------

def _fwd_body(drop, x_ref, pad_ref,
              wqkv_ref, bqkv_ref, wm_ref, bm_ref, ln1s_ref, ln1b_ref,
              w1_ref, b1_ref, w2_ref, b2_ref, ln2s_ref, ln2b_ref,
              x2_ref, x1_ref, r2_ref=None, h1d_ref=None,
              *, heads: int, group: int, scale: float):
    G = group
    Lq, D = x_ref.shape[1], x_ref.shape[2]
    Dh = D // heads
    M = G * Lq

    x = x_ref[:].reshape(M, D).astype(F32)
    self_mask, _ = _block_masks(M, M, Lq, Lq, pad_ref[0].astype(F32),
                                pad_ref[0].astype(F32))

    qkv = _mm(x, wqkv_ref[:]) + bqkv_ref[:]
    ohs = []
    for h in range(heads):
        qh = qkv[:, h * Dh:(h + 1) * Dh]
        kh = qkv[:, D + h * Dh:D + (h + 1) * Dh]
        vh = qkv[:, 2 * D + h * Dh:2 * D + (h + 1) * Dh]
        p = _softmax_fwd(_mm_bt(qh, kh) * scale + self_mask)
        ohs.append(_mm(drop.att(p, h), vh))
    atted = jnp.concatenate(ohs, axis=1)
    y1 = _mm(atted, wm_ref[:]) + bm_ref[:]
    r1 = x + drop.y1(y1)
    x1 = _ln_fwd(r1, ln1s_ref[:], ln1b_ref[:])

    a1 = _mm(x1, w1_ref[:]) + b1_ref[:]
    h1d = drop.h1(jnp.maximum(a1, 0.0))
    y2 = _mm(h1d, w2_ref[:]) + b2_ref[:]
    r2 = x1 + drop.y2(y2)
    x2 = _ln_fwd(r2, ln2s_ref[:], ln2b_ref[:])

    x2_ref[:] = x2.reshape(G, Lq, D).astype(x2_ref.dtype)
    x1_ref[:] = x1.reshape(G, Lq, D).astype(x1_ref.dtype)
    if r2_ref is not None:
        # save-acts mode: the backward then skips the FFN recompute
        # matmuls (same trick as ops/sga_train save_acts)
        r2_ref[:] = r2.reshape(G, Lq, D).astype(r2_ref.dtype)
        h1d_ref[:] = h1d.reshape(G, Lq, -1).astype(h1d_ref.dtype)


def _fwd_kernel(x_ref, pad_ref, m_att, my1, mh, my2, *rest,
                heads, group, scale, inv_keep):
    drop = _ExtMasksSA(m_att, my1, mh, my2, inv_keep)
    _fwd_body(drop, x_ref, pad_ref, *rest,
              heads=heads, group=group, scale=scale)


def _fwd_kernel_prng(seed_ref, x_ref, pad_ref, *rest,
                     heads, group, scale, keep_thresh, inv_keep):
    from jax.experimental import pallas as pl
    drop = _PrngMasksSA(seed_ref[0], pl.program_id(0), keep_thresh,
                        inv_keep)
    _fwd_body(drop, x_ref, pad_ref, *rest,
              heads=heads, group=group, scale=scale)


def _bwd_body(drop, pid, x_ref, x1_ref, g_ref, pad_ref,
              wqkv_ref, bqkv_ref, wm_ref, bm_ref, ln1s_ref,
              w1_ref, b1_ref, w2_ref, b2_ref, ln2s_ref,
              dx_ref, dwqkv_ref, dbqkv_ref, dwm_ref, dbm_ref,
              dln1s_ref, dln1b_ref, dw1_ref, db1_ref, dw2_ref, db2_ref,
              dln2s_ref, dln2b_ref,
              *, heads: int, group: int, scale: float,
              r2h=None, inv_keep_f: float = 1.0):
    """r2h: (r2_ref, h1d_ref) saved-activation inputs — the FFN recompute
    is skipped and da1 uses the where(h1d>0, inv_keep*dh1d) identity
    (see ops/sga_train._bwd_ffn_body_sav). Weight gradients accumulate
    in-kernel across the sequential grid (see sga_train._acc) — the only
    per-position emission is dx."""
    G = group
    Lq, D = x_ref.shape[1], x_ref.shape[2]
    Dh = D // heads
    M = G * Lq

    x = x_ref[:].reshape(M, D).astype(F32)
    x1 = x1_ref[:].reshape(M, D).astype(F32)
    g = g_ref[:].reshape(M, D).astype(F32)
    self_mask, _ = _block_masks(M, M, Lq, Lq, pad_ref[0].astype(F32),
                                pad_ref[0].astype(F32))

    if r2h is None:
        # ---- recompute FFN from x1, backprop LN2 + FFN ----
        a1 = _mm(x1, w1_ref[:]) + b1_ref[:]
        h1d = drop.h1(jnp.maximum(a1, 0.0))
        y2 = _mm(h1d, w2_ref[:]) + b2_ref[:]
        r2 = x1 + drop.y2(y2)
    else:
        r2 = r2h[0][:].reshape(M, D).astype(F32)
        h1d = r2h[1][:].reshape(M, -1).astype(F32)

    gr2, u2 = _ln_bwd_u(g, r2, ln2s_ref[:])
    dy2 = drop.y2(gr2)
    dh1d = _mm_bt(dy2, w2_ref[:])
    if r2h is None:
        da1 = jnp.where(a1 > 0.0, drop.h1(dh1d), 0.0)
    else:
        da1 = jnp.where(h1d > 0.0, dh1d * inv_keep_f, 0.0)
    gx1 = gr2 + _mm_bt(da1, w1_ref[:])

    # ---- recompute self-attention from x, backprop LN1 + attention ----
    qkv = _mm(x, wqkv_ref[:]) + bqkv_ref[:]
    ps, pds, os_ = [], [], []
    for h in range(heads):
        qh = qkv[:, h * Dh:(h + 1) * Dh]
        kh = qkv[:, D + h * Dh:D + (h + 1) * Dh]
        vh = qkv[:, 2 * D + h * Dh:2 * D + (h + 1) * Dh]
        p = _softmax_fwd(_mm_bt(qh, kh) * scale + self_mask)
        pd = drop.att(p, h)
        ps.append(p)
        pds.append(pd)
        os_.append(_mm(pd, vh))
    atted = jnp.concatenate(os_, axis=1)
    y1 = _mm(atted, wm_ref[:]) + bm_ref[:]
    r1 = x + drop.y1(y1)

    gr1, u1 = _ln_bwd_u(gx1, r1, ln1s_ref[:])
    dy1 = drop.y1(gr1)
    datted = _mm_bt(dy1, wm_ref[:])
    dq_hs, dk_hs, dv_hs = [], [], []
    for h in range(heads):
        qh = qkv[:, h * Dh:(h + 1) * Dh]
        kh = qkv[:, D + h * Dh:D + (h + 1) * Dh]
        vh = qkv[:, 2 * D + h * Dh:2 * D + (h + 1) * Dh]
        do = datted[:, h * Dh:(h + 1) * Dh]
        dpd = _mm_bt(do, vh)
        dv_hs.append(jax.lax.dot_general(
            pds[h].astype(BF16), do.astype(BF16),
            dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=F32))
        ds = _softmax_bwd(ps[h], drop.att(dpd, h))
        dq_hs.append(_mm(ds, kh) * scale)
        dk_hs.append(jax.lax.dot_general(
            ds.astype(BF16), qh.astype(BF16),
            dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=F32) * scale)
    dqkv = jnp.concatenate(dq_hs + dk_hs + dv_hs, axis=1)
    dx = gr1 + _mm_bt(dqkv, wqkv_ref[:])

    dx_ref[:] = dx.reshape(G, Lq, D).astype(dx_ref.dtype)

    # ---- weight-gradient partials, accumulated in-kernel ----
    _acc(dwqkv_ref, _mm_tn(x, dqkv), pid)
    _acc(dbqkv_ref, _rsum(dqkv), pid)
    _acc(dwm_ref, _mm_tn(atted, dy1), pid)
    _acc(dbm_ref, _rsum(dy1), pid)
    _acc(dln1s_ref, _rsum(gx1 * u1), pid)
    _acc(dln1b_ref, _rsum(gx1), pid)
    _acc(dw1_ref, _mm_tn(x1, da1), pid)
    _acc(db1_ref, _rsum(da1), pid)
    _acc(dw2_ref, _mm_tn(h1d, dy2), pid)
    _acc(db2_ref, _rsum(dy2), pid)
    _acc(dln2s_ref, _rsum(g * u2), pid)
    _acc(dln2b_ref, _rsum(g), pid)


def _bwd_kernel(x_ref, x1_ref, g_ref, pad_ref, m_att, my1, mh, my2, *rest,
                heads, group, scale, inv_keep):
    from jax.experimental import pallas as pl
    drop = _ExtMasksSA(m_att, my1, mh, my2, inv_keep)
    _bwd_body(drop, pl.program_id(0), x_ref, x1_ref, g_ref, pad_ref, *rest,
              heads=heads, group=group, scale=scale)


def _bwd_kernel_prng(seed_ref, x_ref, x1_ref, g_ref, pad_ref, *rest,
                     heads, group, scale, keep_thresh, inv_keep):
    from jax.experimental import pallas as pl
    pid = pl.program_id(0)
    drop = _PrngMasksSA(seed_ref[0], pid, keep_thresh, inv_keep)
    _bwd_body(drop, pid, x_ref, x1_ref, g_ref, pad_ref, *rest,
              heads=heads, group=group, scale=scale)


def _bwd_kernel_sav(x_ref, x1_ref, g_ref, pad_ref, r2_ref, h1df_ref,
                    m_att, my1, my2, *rest,
                    heads, group, scale, inv_keep):
    from jax.experimental import pallas as pl
    drop = _ExtMasksSA(m_att, my1, None, my2, inv_keep)
    _bwd_body(drop, pl.program_id(0), x_ref, x1_ref, g_ref, pad_ref, *rest,
              heads=heads, group=group, scale=scale,
              r2h=(r2_ref, h1df_ref), inv_keep_f=inv_keep)


def _bwd_kernel_sav_prng(seed_ref, x_ref, x1_ref, g_ref, pad_ref,
                         r2_ref, h1df_ref, *rest,
                         heads, group, scale, keep_thresh, inv_keep):
    from jax.experimental import pallas as pl
    pid = pl.program_id(0)
    drop = _PrngMasksSA(seed_ref[0], pid, keep_thresh, inv_keep)
    _bwd_body(drop, pid, x_ref, x1_ref, g_ref, pad_ref, *rest,
              heads=heads, group=group, scale=scale,
              r2h=(r2_ref, h1df_ref), inv_keep_f=inv_keep)


# ---------------------------------------------------------------------------
# pallas_call wrappers
# ---------------------------------------------------------------------------

def make_sa_dropout_masks(rng, rate, B, Lq, D, F, H, group, bit_width=32):
    """Four per-block masks in packed layout (uint8) + exact inv keep."""
    from mcan_vqa_tpu.ops.dropout import random_keep_mask
    G = group
    nb = B // G
    M = G * Lq
    shapes = {"att": (nb, H, M, M), "y1": (nb, M, D),
              "h1": (nb, M, F), "y2": (nb, M, D)}
    if rate <= 0.0:
        return {n: jnp.ones(shapes[n], jnp.uint8)
                for n in SA_MASK_NAMES}, 1.0
    keys = jax.random.split(rng, len(SA_MASK_NAMES))
    masks, inv_keep = {}, 1.0
    for key, name in zip(keys, SA_MASK_NAMES):
        keep, inv_keep = random_keep_mask(key, rate, shapes[name], bit_width)
        masks[name] = keep.astype(jnp.uint8)
    return masks, inv_keep


def _mask_specs_sa(blk, H, M, D, F):
    return [
        blk((1, H, M, M), lambda b: (b, 0, 0, 0)),
        blk((1, M, D), lambda b: (b, 0, 0)),
        blk((1, M, F), lambda b: (b, 0, 0)),
        blk((1, M, D), lambda b: (b, 0, 0)),
    ]


def _fwd_call(x, pad, masks, w, *, heads, group, interpret, inv_keep,
              prng=None, save_acts=False):
    from jax.experimental import pallas as pl

    B, Lq, D = x.shape
    G = group
    M = G * Lq
    F = w["w1"].shape[1]
    scale = 1.0 / ((D // heads) ** 0.5)
    blk, rep, per_g = _grid_specs(G)
    if prng is None:
        kernel = functools.partial(_fwd_kernel, heads=heads, group=G,
                                   scale=scale, inv_keep=inv_keep)
        head_specs = [per_g(Lq, D),
                      blk((1, 1, M), lambda b: (b, 0, 0)),
                      *_mask_specs_sa(blk, heads, M, D, F)]
        head_ops = (x, pad, masks["att"], masks["y1"], masks["h1"],
                    masks["y2"])
    else:
        seed, keep_thresh = prng
        kernel = functools.partial(_fwd_kernel_prng, heads=heads, group=G,
                                   scale=scale, keep_thresh=keep_thresh,
                                   inv_keep=inv_keep)
        head_specs = [_seed_spec(), per_g(Lq, D),
                      blk((1, 1, M), lambda b: (b, 0, 0))]
        head_ops = (seed, x, pad)
    out_specs = [per_g(Lq, D)] * 2
    out_shape = [jax.ShapeDtypeStruct((B, Lq, D), F32)] * 2
    if save_acts:
        out_specs += [per_g(Lq, D), per_g(Lq, F)]
        out_shape += [jax.ShapeDtypeStruct((B, Lq, D), F32),     # r2
                      jax.ShapeDtypeStruct((B, Lq, F), BF16)]    # h1d
    outs = pl.pallas_call(
        kernel,
        grid=(B // G,),
        in_specs=head_specs + [
            rep((D, 3 * D)), rep((3 * D,)),
            rep((D, D)), rep((D,)), rep((D,)), rep((D,)),   # wm,bm,ln1
            rep((D, F)), rep((F,)), rep((F, D)), rep((D,)),
            rep((D,)), rep((D,)),                           # ffn + ln2
        ],
        out_specs=out_specs,
        out_shape=out_shape,
        compiler_params=None if interpret else _compiler_params(),
        interpret=interpret,
    )(*head_ops,
      w["wqkv"], w["bqkv"], w["wm"], w["bm"], w["ln1_s"], w["ln1_b"],
      w["w1"], w["b1"], w["w2"], w["b2"], w["ln2_s"], w["ln2_b"])
    return outs  # (x2, x1[, r2, h1d])


def _bwd_call(x, x1, g, pad, masks, w, *, heads, group, interpret,
              inv_keep, prng=None, saved=None):
    """saved: (r2, h1d) from the save_acts forward — the kernel then
    skips the FFN recompute and does not emit h1d (the caller has it)."""
    from jax.experimental import pallas as pl

    B, Lq, D = x.shape
    G = group
    M = G * Lq
    F = w["w1"].shape[1]
    scale = 1.0 / ((D // heads) ** 0.5)
    blk, rep, per_g = _grid_specs(G)
    sav_specs = [per_g(Lq, D), per_g(Lq, F)] if saved is not None else []
    if prng is None:
        if saved is not None:
            kernel = functools.partial(_bwd_kernel_sav, heads=heads,
                                       group=G, scale=scale,
                                       inv_keep=inv_keep)
            head_specs = [per_g(Lq, D), per_g(Lq, D), per_g(Lq, D),
                          blk((1, 1, M), lambda b: (b, 0, 0)),
                          *sav_specs,
                          blk((1, heads, M, M), lambda b: (b, 0, 0, 0)),
                          blk((1, M, D), lambda b: (b, 0, 0)),
                          blk((1, M, D), lambda b: (b, 0, 0))]
            head_ops = (x, x1, g, pad, saved[0], saved[1],
                        masks["att"], masks["y1"], masks["y2"])
        else:
            kernel = functools.partial(_bwd_kernel, heads=heads, group=G,
                                       scale=scale, inv_keep=inv_keep)
            head_specs = [per_g(Lq, D), per_g(Lq, D), per_g(Lq, D),
                          blk((1, 1, M), lambda b: (b, 0, 0)),
                          *_mask_specs_sa(blk, heads, M, D, F)]
            head_ops = (x, x1, g, pad, masks["att"], masks["y1"],
                        masks["h1"], masks["y2"])
    else:
        seed, keep_thresh = prng
        if saved is not None:
            kernel = functools.partial(_bwd_kernel_sav_prng, heads=heads,
                                       group=G, scale=scale,
                                       keep_thresh=keep_thresh,
                                       inv_keep=inv_keep)
            head_specs = [_seed_spec(), per_g(Lq, D), per_g(Lq, D),
                          per_g(Lq, D),
                          blk((1, 1, M), lambda b: (b, 0, 0)),
                          *sav_specs]
            head_ops = (seed, x, x1, g, pad, saved[0], saved[1])
        else:
            kernel = functools.partial(_bwd_kernel_prng, heads=heads,
                                       group=G, scale=scale,
                                       keep_thresh=keep_thresh,
                                       inv_keep=inv_keep)
            head_specs = [_seed_spec(), per_g(Lq, D), per_g(Lq, D),
                          per_g(Lq, D),
                          blk((1, 1, M), lambda b: (b, 0, 0))]
            head_ops = (seed, x, x1, g, pad)
    out_specs = [
        per_g(Lq, D),                                   # dx
        rep((D, 3 * D)), rep((1, 3 * D)),               # dwqkv, dbqkv
        rep((D, D)), rep((1, D)),                       # dwm, dbm
        rep((1, D)), rep((1, D)),                       # dln1s, dln1b
        rep((D, F)), rep((1, F)),                       # dw1, db1
        rep((F, D)), rep((1, D)),                       # dw2, db2
        rep((1, D)), rep((1, D)),                       # dln2s, dln2b
    ]
    out_shape = [
        jax.ShapeDtypeStruct((B, Lq, D), F32),
        jax.ShapeDtypeStruct((D, 3 * D), F32),
        jax.ShapeDtypeStruct((1, 3 * D), F32),
        jax.ShapeDtypeStruct((D, D), F32),
        jax.ShapeDtypeStruct((1, D), F32),
        jax.ShapeDtypeStruct((1, D), F32),
        jax.ShapeDtypeStruct((1, D), F32),
        jax.ShapeDtypeStruct((D, F), F32),
        jax.ShapeDtypeStruct((1, F), F32),
        jax.ShapeDtypeStruct((F, D), F32),
        jax.ShapeDtypeStruct((1, D), F32),
        jax.ShapeDtypeStruct((1, D), F32),
        jax.ShapeDtypeStruct((1, D), F32),
    ]
    outs = pl.pallas_call(
        kernel,
        grid=(B // G,),
        in_specs=head_specs + [
            rep((D, 3 * D)), rep((3 * D,)),
            rep((D, D)), rep((D,)), rep((D,)),              # wm,bm,ln1_s
            rep((D, F)), rep((F,)), rep((F, D)), rep((D,)),
            rep((D,)),                                      # ln2_s
        ],
        out_specs=out_specs,
        out_shape=out_shape,
        compiler_params=None if interpret else _compiler_params(),
        interpret=interpret,
    )(*head_ops,
      w["wqkv"], w["bqkv"], w["wm"], w["bm"], w["ln1_s"],
      w["w1"], w["b1"], w["w2"], w["b2"], w["ln2_s"])
    return outs  # (dx, + 12 weight-grad pieces)


# ---------------------------------------------------------------------------
# the custom-VJP op
# ---------------------------------------------------------------------------

def _assemble_sa_dw(dw_pieces):
    """Kernel-accumulated pieces -> prepare_sa_train_params key layout."""
    (dwqkv, dbqkv, dwm, dbm, dln1s, dln1b,
     dw1, db1, dw2, db2, dln2s, dln2b) = dw_pieces
    return {
        "wqkv": dwqkv, "bqkv": dbqkv[0],
        "wm": dwm, "bm": dbm[0],
        "ln1_s": dln1s[0], "ln1_b": dln1b[0],
        "w1": dw1, "b1": db1[0],
        "w2": dw2, "b2": db2[0],
        "ln2_s": dln2s[0], "ln2_b": dln2b[0],
    }


def make_sa_block_train(num_heads: int, group: int,
                        interpret: bool = False, inv_keep: float = 1.0,
                        rate: Optional[float] = None,
                        save_acts: bool = True):
    """Differentiable fused SA block. rate=None: external-mask variant
    f(x, pad, masks, w); rate set: in-kernel PRNG variant
    f(x, pad, seed, w) (TPU-only). save_acts: the forward saves r2/h1d
    so the backward skips the FFN recompute matmuls."""
    use_prng = rate is not None
    if use_prng:
        keep_thresh, inv_keep = prng_keep_params(rate)
        prng_of = lambda s: (s, keep_thresh)
    kw = dict(heads=num_heads, group=group, interpret=interpret,
              inv_keep=inv_keep)

    @jax.custom_vjp
    def f(x, pad, m_or_seed, w):
        prng = prng_of(m_or_seed) if use_prng else None
        outs = _fwd_call(x, pad, None if use_prng else m_or_seed, w,
                         prng=prng, **kw)
        return outs[0]

    def f_fwd(x, pad, m_or_seed, w):
        prng = prng_of(m_or_seed) if use_prng else None
        outs = _fwd_call(x, pad, None if use_prng else m_or_seed, w,
                         prng=prng, save_acts=save_acts, **kw)
        x2, x1 = outs[:2]
        r2, h1d = (outs[2], outs[3]) if save_acts else (None, None)
        return x2, (x, pad, m_or_seed, w, x1, r2, h1d)

    def f_bwd(res, g):
        x, pad, m_or_seed, w, x1, r2, h1d_s = res
        prng = prng_of(m_or_seed) if use_prng else None
        dx, *dw_pieces = _bwd_call(
            x, x1, g, pad, None if use_prng else m_or_seed, w,
            prng=prng, saved=(r2, h1d_s) if save_acts else None, **kw)
        dw = _assemble_sa_dw(dw_pieces)
        f0 = lambda t: np.zeros(t.shape, jax.dtypes.float0)
        dmask = (f0(m_or_seed) if use_prng
                 else jax.tree.map(f0, m_or_seed))
        return (dx, f0(pad), dmask, dw)

    f.defvjp(f_fwd, f_bwd)
    return f


def fused_sa_block_train(x, x_mask, masks_or_seed, w, *, num_heads: int,
                         group: int = 0, inv_keep: float = 1.0,
                         rate: Optional[float] = None,
                         interpret: bool = False):
    """Run one differentiable fused SA block.

    x [B, Lq, D]; x_mask bool [B,1,1,Lq] or None; masks_or_seed: the dict
    from make_sa_dropout_masks (external) or an int32 [1] seed (rate set,
    in-kernel PRNG, TPU-only); w from prepare_sa_train_params. group=0
    picks the largest divisor of B with G*Lq <= 128 (as the serving SA
    megakernel)."""
    B, Lq, _ = x.shape
    G = group if group > 0 else max(1, 128 // Lq)
    while B % G:
        G -= 1
    pad = _flat_pad(x_mask, B, G, Lq)
    f = make_sa_block_train(num_heads, G, interpret, inv_keep, rate)
    return f(x, pad, masks_or_seed, w)
