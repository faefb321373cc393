"""Custom-VJP fused SGA decoder block for TRAINING (Pallas TPU).

The serving megakernel (ops/sga_block.py) showed that fusing one whole SGA
block (reference core/model/mca.py:134-164) into a single kernel launch is
worth ~1.6x on the forward pass at MCAN-small shapes. This module brings the
same fusion to the TRAIN step, where the XLA fwd+bwd runs at ~30% of bf16
peak:

  * ``_fwd_kernel``     — the whole block forward WITH the reference's six
    dropout sites (two attention maps, three sublayer outputs, FFN mid),
    stream VMEM-resident. Also writes the post-LN intermediates v1, v2.
  * ``_bwd_ffn_kernel`` — backward of LN3+FFN(+dropouts), recomputing the
    FFN internals from the saved v2 (flash-attention-style recompute).
  * ``_bwd_att_kernel`` — backward of LN2+cross-att+LN1+self-att,
    recomputing both attentions from the saved x / v1.

Weight gradients accumulate IN-KERNEL: each bwd kernel carries its dW
pieces as constant-index f32 output blocks (VMEM-resident across the
sequential grid, ~7 MB per kernel at D=512 under the raised scoped-VMEM
cap) and adds a per-block partial every grid step — so the per-position
gradient/activation pairs (d_qkv, atted1, d_y1, da1, ...) never touch HBM
at all. LayerNorm scale grads use the normalized activation u computed
from the in-kernel residual (exact; no (v - b)/s reconstruction, no
zero-scale singularity). r1/r2 recomputed in the att backward also feed
u1/u2 directly.

Dropout masks are EXTERNAL uint8 inputs (ops/dropout.random_keep_mask
bits), generated once per step and read by both fwd and bwd kernels:
deterministic fwd/bwd consistency by construction, and the whole op is
CPU-testable in interpret mode. Kept values scale by the exact quantized
inverse keep probability (see ops/dropout.py).

Sequence layout matches the serving megakernel: G samples packed per grid
step, block-diagonal sample masks folded into the softmax.
"""

from __future__ import annotations

import functools
import os
from typing import Any, Dict

import jax
import jax.numpy as jnp
import numpy as np

# TIMING-ONLY ablation knobs (WRONG MATH — never set in production):
# MCAN_KERNEL_ABLATE=softmax,ln,dropout stubs the named VPU stages inside
# the train kernels so their cost can be attributed on-chip
# (tools/attribute_train_step.py campaign). Read once at import.
_ABLATE = frozenset(
    filter(None, os.environ.get("MCAN_KERNEL_ABLATE", "").split(",")))

_NEG_INF = -1e9
BF16 = jnp.bfloat16
F32 = jnp.float32

MASK_NAMES = ("att1", "att2", "y1", "y2", "h1", "y3")


# ---------------------------------------------------------------------------
# param relayout (slim fused-projection layout; differentiable)
# ---------------------------------------------------------------------------

def prepare_sga_train_params(p: Dict[str, Any]) -> Dict[str, Any]:
    """Re-layout one SGA block's params for the train kernels.

    Runs INSIDE the differentiated step so weight grads flow back through
    the concats to the standard param tree (models.mca.SGA layout).
    """
    m1, m2 = p["mhatt1"], p["mhatt2"]
    mlp = p["ffn"]["mlp"]
    return {
        "wqkv": jnp.concatenate([m1["linear_q"]["kernel"],
                                 m1["linear_k"]["kernel"],
                                 m1["linear_v"]["kernel"]], axis=1),
        "bqkv": jnp.concatenate([m1["linear_q"]["bias"],
                                 m1["linear_k"]["bias"],
                                 m1["linear_v"]["bias"]]),
        "wm1": m1["linear_merge"]["kernel"],
        "bm1": m1["linear_merge"]["bias"],
        "ln1_s": p["norm1"]["scale"], "ln1_b": p["norm1"]["bias"],
        "wq2": m2["linear_q"]["kernel"],
        "bq2": m2["linear_q"]["bias"],
        "wm2": m2["linear_merge"]["kernel"],
        "bm2": m2["linear_merge"]["bias"],
        "ln2_s": p["norm2"]["scale"], "ln2_b": p["norm2"]["bias"],
        "w1": mlp["FCLayer_0"]["Dense_0"]["kernel"],
        "b1": mlp["FCLayer_0"]["Dense_0"]["bias"],
        "w2": mlp["Dense_0"]["kernel"],
        "b2": mlp["Dense_0"]["bias"],
        "ln3_s": p["norm3"]["scale"], "ln3_b": p["norm3"]["bias"],
    }


# ---------------------------------------------------------------------------
# shared in-kernel math
# ---------------------------------------------------------------------------

def _ln_fwd(r, scale, bias, eps=1e-6):
    """Reference std-LayerNorm: scale * (r - mean)/(std + eps) + bias,
    Bessel-corrected std (models/layers.py StdLayerNorm)."""
    if "ln" in _ABLATE:            # timing-only stub (wrong math)
        return scale * r + bias
    d = r.shape[-1]
    mean = jnp.mean(r, axis=-1, keepdims=True)
    c = r - mean
    var = jnp.sum(c * c, axis=-1, keepdims=True) / (d - 1)
    # reciprocal-multiply: one [rows,1] divide instead of a [rows,D]-wide
    # one (VPU divides are multi-cycle; ~1 ulp vs the direct divide)
    inv = 1.0 / (jnp.sqrt(var) + eps)
    return scale * (c * inv) + bias


def _ln_bwd(g, r, scale, eps=1e-6):
    """d(LN)/dr applied to upstream g, for the std+eps form:
    out_i = s_i * c_i / (std + eps) + b_i, c = r - mean(r),
    std = sqrt(sum(c^2)/(D-1))."""
    return _ln_bwd_u(g, r, scale, eps)[0]


def _ln_bwd_u(g, r, scale, eps=1e-6):
    """(d(LN)/dr applied to g, normalized activation u = c/(std+eps)).

    u is what the LN scale gradient needs (d ln_s = sum(g * u)); computing
    it here from the residual is exact — no (v - bias)/scale
    reconstruction, no zero-scale singularity."""
    if "ln" in _ABLATE:            # timing-only stub (wrong math)
        return g * scale, r
    d = r.shape[-1]
    mean = jnp.mean(r, axis=-1, keepdims=True)
    c = r - mean
    var = jnp.sum(c * c, axis=-1, keepdims=True) / (d - 1)
    std = jnp.sqrt(var)
    inv = 1.0 / (std + eps)
    sg = scale * g
    # all divides on [rows, 1] scalars-per-row; the [rows, D]-wide work
    # is multiplies only (dc = sg/denom + dstd*c/((d-1)*std) refactored)
    dstd = -jnp.sum(sg * c, axis=-1, keepdims=True) * (inv * inv)
    k = dstd / ((d - 1) * std)
    dc = sg * inv + c * k
    return dc - jnp.mean(dc, axis=-1, keepdims=True), c * inv


def _drop(x, m_u8, inv_keep):
    """Inverted dropout / its gradient (the same masked scale)."""
    return jnp.where(m_u8 != 0, x * inv_keep, 0.0)


# Per-site seed-mix constants for the in-kernel PRNG dropout variant.
# Each dropout site reseeds the hardware PRNG with (step_seed, site_code,
# program_id), so fwd and bwd kernels regenerate IDENTICAL masks for any
# site in any order — no mask bytes ever touch HBM.
_SITE_ATT1 = 0x100   # + head index
_SITE_ATT2 = 0x200   # + head index
_SITE_Y1 = 0x301
_SITE_Y2 = 0x302
_SITE_H1 = 0x303
_SITE_Y3 = 0x304


class _ExtMasks:
    """Dropout via externally generated uint8 masks (testable on CPU).

    diag1: (G, L) when the self-attention softmax runs on the diagonal
    blocks only — att1 then receives [G*L, L] tensors and the matching
    diagonal of the packed [M, M] mask is used (off-diagonal mask entries
    are irrelevant: those probabilities are exactly 0)."""

    def __init__(self, m1, m2, my1, my2, mh, my3, inv_keep, diag1=None):
        self.m1, self.m2 = m1, m2
        self.my1, self.my2, self.mh, self.my3 = my1, my2, mh, my3
        self.inv = inv_keep
        self.diag1 = diag1

    def att1(self, x, h):
        m = self.m1[0, h]
        if self.diag1 is not None:
            m = _diag_blocks(m, *self.diag1)
        return _drop(x, m, self.inv)

    def att2(self, x, h):
        return _drop(x, self.m2[0, h], self.inv)

    def y1(self, x):
        return _drop(x, self.my1[0], self.inv)

    def y2(self, x):
        return _drop(x, self.my2[0], self.inv)

    def h1(self, x):
        return _drop(x, self.mh[0], self.inv)

    def y3(self, x):
        return _drop(x, self.my3[0], self.inv)


class _PrngMasks:
    """Dropout via the TPU hardware PRNG, regenerated in-kernel.

    keep decision: uint32 bits < keep_thresh, where keep_thresh =
    round((1-rate) * 2^32); kept values scale by the exact quantized
    inverse keep probability (2^32 / keep_thresh) so E[drop(x)] == x.
    """

    def __init__(self, seed, pid, keep_thresh, inv_keep):
        self.seed, self.pid = seed, pid
        self.thresh = jnp.uint32(keep_thresh)
        self.inv = inv_keep

    def _d(self, x, site):
        if "dropout" in _ABLATE:   # timing-only stub (wrong math)
            return x
        from jax.experimental.pallas import tpu as pltpu
        # Mosaic accepts at most 2 seed values: pack (site, program_id)
        # into one int32 — site < 2^12, grid size < 2^19.
        pltpu.prng_seed(self.seed, (site << 19) | self.pid)
        bits = jax.lax.bitcast_convert_type(
            pltpu.prng_random_bits(x.shape), jnp.uint32)
        return jnp.where(bits < self.thresh, x * self.inv, 0.0)

    def att1(self, x, h):
        return self._d(x, _SITE_ATT1 + h)

    def att2(self, x, h):
        return self._d(x, _SITE_ATT2 + h)

    def y1(self, x):
        return self._d(x, _SITE_Y1)

    def y2(self, x):
        return self._d(x, _SITE_Y2)

    def h1(self, x):
        return self._d(x, _SITE_H1)

    def y3(self, x):
        return self._d(x, _SITE_Y3)


def _softmax_fwd(s):
    if "softmax" in _ABLATE:       # timing-only stub (wrong math)
        return s * 0.001
    m = jnp.max(s, axis=-1, keepdims=True)
    e = jnp.exp(s - m)
    # reciprocal-multiply: one [rows,1] divide, row-wide multiplies
    return e * (1.0 / jnp.sum(e, axis=-1, keepdims=True))


def _softmax_bwd(p, dp):
    if "softmax" in _ABLATE:       # timing-only stub (wrong math)
        return dp * 0.001
    return p * (dp - jnp.sum(p * dp, axis=-1, keepdims=True))


def _block_masks(M, N, Lv, Lq, vpad, qpad):
    vv_off = (jax.lax.broadcasted_iota(jnp.int32, (M, M), 0) // Lv
              != jax.lax.broadcasted_iota(jnp.int32, (M, M), 1) // Lv)
    vq_off = (jax.lax.broadcasted_iota(jnp.int32, (M, N), 0) // Lv
              != jax.lax.broadcasted_iota(jnp.int32, (M, N), 1) // Lq)
    self_mask = (vv_off.astype(F32) + vpad) * _NEG_INF
    cross_mask = (vq_off.astype(F32) + qpad) * _NEG_INF
    return self_mask, cross_mask


# ---------------------------------------------------------------------------
# block-diagonal self-attention softmax
#
# The packed layout computes self-attention scores as one [M, M] matmul
# (M = G*Lv) whose off-diagonal sample-cross blocks are masked to -1e9 —
# MXU-cheap, but the softmax/dropout VPU passes then run over G× more
# columns than carry information. Since the off-diagonal probabilities are
# exactly 0 (every off-diag score is <= diag_max - 1e9, so exp underflows
# to +0 in f32 and the row max/sum come from the diagonal block alone),
# the mask+softmax+dropout pipeline can run on just the [M, Lv] diagonal
# blocks and scatter the result back for the P@V matmul — bitwise the
# same p values, ~G× less VPU work per row. MCAN_DIAG_SOFTMAX=0 restores
# the full-width softmax (A/B knob; the module default ships the winner).
# ---------------------------------------------------------------------------

_DIAG_ATT = os.environ.get("MCAN_DIAG_SOFTMAX", "1") == "1"


def _diag_blocks(s, G, L):
    """[G*L, G*L] -> [G*L, L]: stack each sample's diagonal block.

    Mosaic-safe: unaligned LANE slices (offset g*L, L=100 not a multiple
    of 128) fail to compile ("Invalid input layout",
    tools/probe_mosaic_diag.py), so columns are extracted with an
    iota-built one-hot f32 matmul — exact (each output element sums
    exactly one x*1.0 product; 1.0 has no bf16 low part, so the MXU's
    split-f32 passes reconstruct x bit-exactly). Sublane (row) slices at
    unaligned offsets DO compile and stay plain slices."""
    if G == 1:
        return s
    M = G * L
    k = jax.lax.broadcasted_iota(jnp.int32, (M, L), 0)
    j = jax.lax.broadcasted_iota(jnp.int32, (M, L), 1)
    out = []
    for g in range(G):
        sel = (k == j + g * L).astype(jnp.float32)       # [M, L] one-hot
        out.append(jax.lax.dot_general(
            s[g * L:(g + 1) * L, :].astype(jnp.float32), sel,
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32).astype(s.dtype))
    return jnp.concatenate(out, axis=0)


def _scatter_diag(p, G, L, fill=0.0):
    """[G*L, L] -> [G*L, G*L]: place row-blocks on the diagonal, `fill`
    elsewhere (0 for probabilities/gradients, 1 for keep-masks)."""
    if G == 1:
        return p
    rows = []
    for g in range(G):
        parts = []
        if g:
            parts.append(jnp.full((L, g * L), fill, p.dtype))
        parts.append(p[g * L:(g + 1) * L])
        if G - 1 - g:
            parts.append(jnp.full((L, (G - 1 - g) * L), fill, p.dtype))
        rows.append(parts[0] if len(parts) == 1
                    else jnp.concatenate(parts, axis=1))
    return jnp.concatenate(rows, axis=0)


def _diag_pad_add(pad, G, L):
    """pad [1, G*L] f32 (1 at padded key positions) -> additive [G*L, L]
    mask for the block-diagonal softmax (sample g's rows see only sample
    g's key padding).

    Mosaic-safe: sample g's pad lanes sit at offset g*L, and unaligned
    lane slices don't compile (tools/probe_mosaic_diag.py) — gather them
    with an iota-built one-hot matmul (exact: one x*1.0 product per
    output element), then broadcast from the offset-0 [1, L] result."""
    if G == 1:
        return jnp.broadcast_to(pad, (L, L)) * _NEG_INF
    M = G * L
    k = jax.lax.broadcasted_iota(jnp.int32, (M, L), 0)
    j = jax.lax.broadcasted_iota(jnp.int32, (M, L), 1)
    rows = []
    for g in range(G):
        sel = (k == j + g * L).astype(jnp.float32)       # [M, L] one-hot
        pg = jax.lax.dot_general(pad, sel, (((1,), (0,)), ((), ())),
                                 preferred_element_type=jnp.float32)
        rows.append(jnp.broadcast_to(pg, (L, L)))
    return jnp.concatenate(rows, axis=0) * _NEG_INF


def _diag_attn_fwd(qh, kh, vh, pad_add, drop_fn, h, G, L, scale):
    """One head of block-diagonal self-attention: per-sample score
    matmuls, [G*L, L] softmax+dropout, per-sample PV. Returns (p, pd, o).

    vs the full-width path this is bitwise-identical p/o values (the
    off-diagonal probabilities there are exactly +0.0) at ~G x less
    padded MXU work and ~G x fewer softmax/dropout VPU elements."""
    s = jnp.concatenate(
        [_mm_bt(qh[g * L:(g + 1) * L], kh[g * L:(g + 1) * L])
         for g in range(G)], axis=0)
    p = _softmax_fwd(s * scale + pad_add)
    pd = drop_fn(p, h)
    o = jnp.concatenate(
        [_mm(pd[g * L:(g + 1) * L], vh[g * L:(g + 1) * L])
         for g in range(G)], axis=0)
    return p, pd, o


def _mm(a, b):
    """bf16 MXU matmul with f32 accumulation."""
    return jnp.dot(a.astype(BF16), b.astype(BF16),
                   preferred_element_type=F32)


def _mm_bt(a, b):
    """a @ b^T (contract last dims) in bf16."""
    return jax.lax.dot_general(
        a.astype(BF16), b.astype(BF16),
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=F32)


def _mm_tn(a, b):
    """a^T @ b (contract rows) in bf16 — the per-block dW partial."""
    return jax.lax.dot_general(
        a.astype(BF16), b.astype(BF16),
        dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=F32)


def _acc(ref, val, pid):
    """Accumulate a per-grid-step partial into a constant-index output
    block (kept VMEM-resident across the sequential TPU grid; written back
    to HBM once). This is how the bwd kernels produce WEIGHT gradients
    without emitting per-position gradient/activation pairs to HBM."""
    from jax.experimental import pallas as pl

    @pl.when(pid == 0)
    def _init():
        ref[...] = val.astype(ref.dtype)

    @pl.when(pid != 0)
    def _add():
        ref[...] += val.astype(ref.dtype)


def _rsum(t):
    """Row-sum partial for bias/LN grads, shaped [1, D] for TPU layout."""
    return jnp.sum(t.astype(F32), axis=0, keepdims=True)


# ---------------------------------------------------------------------------
# forward kernel
# ---------------------------------------------------------------------------

def _fwd_body(drop, v_ref, kq_ref, vq_ref, vpad_ref, qpad_ref,
              wqkv_ref, bqkv_ref, wm1_ref, bm1_ref, ln1s_ref, ln1b_ref,
              wq2_ref, bq2_ref, wm2_ref, bm2_ref, ln2s_ref, ln2b_ref,
              w1_ref, b1_ref, w2_ref, b2_ref, ln3s_ref, ln3b_ref,
              v3_ref, v1_ref, v2_ref, r3_ref=None, h1d_ref=None,
              qkv_ref=None, qx_ref=None, r1_ref=None, r2_ref=None,
              *, heads: int, group: int, scale: float, diag: bool = False):
    G = group
    Lv, D = v_ref.shape[1], v_ref.shape[2]
    Lq = kq_ref.shape[2]
    Dh = D // heads
    M, N = G * Lv, G * Lq

    x = v_ref[:].reshape(M, D).astype(F32)
    if diag:
        pad_add = _diag_pad_add(vpad_ref[0].astype(F32), G, Lv)
        _, cross_mask = _block_masks(
            M, N, Lv, Lq, vpad_ref[0].astype(F32), qpad_ref[0].astype(F32))
    else:
        self_mask, cross_mask = _block_masks(
            M, N, Lv, Lq, vpad_ref[0].astype(F32), qpad_ref[0].astype(F32))

    # ---- self-attention (one qkv matmul, lane-sliced heads) ----
    qkv = _mm(x, wqkv_ref[:]) + bqkv_ref[:]
    ohs = []
    for h in range(heads):
        qh = qkv[:, h * Dh:(h + 1) * Dh]
        kh = qkv[:, D + h * Dh:D + (h + 1) * Dh]
        vh = qkv[:, 2 * D + h * Dh:2 * D + (h + 1) * Dh]
        if diag:
            _, _, o = _diag_attn_fwd(qh, kh, vh, pad_add, drop.att1, h,
                                     G, Lv, scale)
        else:
            p = _softmax_fwd(_mm_bt(qh, kh) * scale + self_mask)
            o = _mm(drop.att1(p, h), vh)
        ohs.append(o)
    atted1 = jnp.concatenate(ohs, axis=1)
    y1 = _mm(atted1, wm1_ref[:]) + bm1_ref[:]
    r1 = x + drop.y1(y1)
    v1 = _ln_fwd(r1, ln1s_ref[:], ln1b_ref[:])

    # ---- cross-attention (keys/values pre-projected outside) ----
    qx = _mm(v1, wq2_ref[:]) + bq2_ref[:]
    ohs = []
    for h in range(heads):
        kh = kq_ref[:, h].reshape(N, Dh)
        vh = vq_ref[:, h].reshape(N, Dh)
        p = _softmax_fwd(_mm_bt(qx[:, h * Dh:(h + 1) * Dh], kh) * scale
                         + cross_mask)
        pd = drop.att2(p, h)
        ohs.append(_mm(pd, vh))
    atted2 = jnp.concatenate(ohs, axis=1)
    y2 = _mm(atted2, wm2_ref[:]) + bm2_ref[:]
    r2 = v1 + drop.y2(y2)
    v2 = _ln_fwd(r2, ln2s_ref[:], ln2b_ref[:])

    # ---- FFN ----
    a1 = _mm(v2, w1_ref[:]) + b1_ref[:]
    h1d = drop.h1(jnp.maximum(a1, 0.0))
    y3 = _mm(h1d, w2_ref[:]) + b2_ref[:]
    r3 = v2 + drop.y3(y3)
    v3 = _ln_fwd(r3, ln3s_ref[:], ln3b_ref[:])

    v3_ref[:] = v3.reshape(G, Lv, D).astype(v3_ref.dtype)
    v1_ref[:] = v1.reshape(G, Lv, D).astype(v1_ref.dtype)
    v2_ref[:] = v2.reshape(G, Lv, D).astype(v2_ref.dtype)
    if r3_ref is not None:
        # save-acts mode: the FFN backward then skips BOTH recompute
        # matmuls (a1 and y3) — see _bwd_ffn_body_sav
        r3_ref[:] = r3.reshape(G, Lv, D).astype(r3_ref.dtype)
        h1d_ref[:] = h1d.reshape(G, Lv, -1).astype(h1d_ref.dtype)
    if qkv_ref is not None:
        # att-saves mode: the attention backward then skips its 6*D^2
        # per-token projection recompute (qkv, both merges, cross-q) —
        # see _bwd_att_body with sav_refs
        qkv_ref[:] = qkv.reshape(G, Lv, 3 * D).astype(qkv_ref.dtype)
        qx_ref[:] = qx.reshape(G, Lv, D).astype(qx_ref.dtype)
        r1_ref[:] = r1.reshape(G, Lv, D).astype(r1_ref.dtype)
        r2_ref[:] = r2.reshape(G, Lv, D).astype(r2_ref.dtype)


def _fwd_kernel(v_ref, kq_ref, vq_ref, vpad_ref, qpad_ref,
                m1_ref, m2_ref, my1_ref, my2_ref, mh_ref, my3_ref,
                *rest, heads: int, group: int, scale: float,
                inv_keep: float, diag: bool = False):
    G, Lv = v_ref.shape[0], v_ref.shape[1]
    drop = _ExtMasks(m1_ref, m2_ref, my1_ref, my2_ref, mh_ref, my3_ref,
                     inv_keep, diag1=(G, Lv) if diag else None)
    _fwd_body(drop, v_ref, kq_ref, vq_ref, vpad_ref, qpad_ref, *rest,
              heads=heads, group=group, scale=scale, diag=diag)


def _fwd_kernel_prng(seed_ref, v_ref, kq_ref, vq_ref, vpad_ref, qpad_ref,
                     *rest, heads: int, group: int, scale: float,
                     keep_thresh: int, inv_keep: float, diag: bool = False):
    from jax.experimental import pallas as pl
    drop = _PrngMasks(seed_ref[0], pl.program_id(0), keep_thresh, inv_keep)
    _fwd_body(drop, v_ref, kq_ref, vq_ref, vpad_ref, qpad_ref, *rest,
              heads=heads, group=group, scale=scale, diag=diag)


# ---------------------------------------------------------------------------
# backward kernel 1: LN3 + FFN (recomputes FFN internals from v2)
# ---------------------------------------------------------------------------

def _ffn_weight_grads(pid, v2, h1d, g, u3, dy3, da1,
                      dw1_ref, db1_ref, dw2_ref, db2_ref,
                      dln3s_ref, dln3b_ref):
    """Accumulate the FFN + LN3 weight-gradient partials in-kernel:
    dw1 = v2^T da1, dw2 = h1d^T dy3, biases/LN as row sums."""
    _acc(dw1_ref, _mm_tn(v2, da1), pid)
    _acc(db1_ref, _rsum(da1), pid)
    _acc(dw2_ref, _mm_tn(h1d, dy3), pid)
    _acc(db2_ref, _rsum(dy3), pid)
    _acc(dln3s_ref, _rsum(g * u3), pid)
    _acc(dln3b_ref, _rsum(g), pid)


def _bwd_ffn_body(drop, pid, v2_ref, g_ref,
                  w1_ref, b1_ref, w2_ref, b2_ref, ln3s_ref,
                  gv2_ref, dw1_ref, db1_ref, dw2_ref, db2_ref,
                  dln3s_ref, dln3b_ref, *, group: int):
    G = group
    Lv, D = v2_ref.shape[1], v2_ref.shape[2]
    M = G * Lv

    v2 = v2_ref[:].reshape(M, D).astype(F32)
    g = g_ref[:].reshape(M, D).astype(F32)

    a1 = _mm(v2, w1_ref[:]) + b1_ref[:]
    h1d = drop.h1(jnp.maximum(a1, 0.0))
    y3 = _mm(h1d, w2_ref[:]) + b2_ref[:]
    r3 = v2 + drop.y3(y3)

    gr3, u3 = _ln_bwd_u(g, r3, ln3s_ref[:])
    dy3 = drop.y3(gr3)
    dh1d = _mm_bt(dy3, w2_ref[:])                   # dy3 @ W2^T
    da1 = jnp.where(a1 > 0.0, drop.h1(dh1d), 0.0)
    gv2 = gr3 + _mm_bt(da1, w1_ref[:])              # residual + da1 @ W1^T

    gv2_ref[:] = gv2.reshape(G, Lv, D).astype(gv2_ref.dtype)
    _ffn_weight_grads(pid, v2, h1d, g, u3, dy3, da1,
                      dw1_ref, db1_ref, dw2_ref, db2_ref,
                      dln3s_ref, dln3b_ref)


def _bwd_ffn_kernel(v2_ref, g_ref, mh_ref, my3_ref, *rest,
                    group: int, inv_keep: float):
    from jax.experimental import pallas as pl
    drop = _ExtMasks(None, None, None, None, mh_ref, my3_ref, inv_keep)
    _bwd_ffn_body(drop, pl.program_id(0), v2_ref, g_ref, *rest, group=group)


def _bwd_ffn_kernel_prng(seed_ref, v2_ref, g_ref, *rest,
                         group: int, keep_thresh: int, inv_keep: float):
    from jax.experimental import pallas as pl
    pid = pl.program_id(0)
    drop = _PrngMasks(seed_ref[0], pid, keep_thresh, inv_keep)
    _bwd_ffn_body(drop, pid, v2_ref, g_ref, *rest, group=group)


def _bwd_ffn_body_sav(drop, pid, r3_ref, g_ref, h1d_ref, v2_ref,
                      w1_ref, w2_ref, ln3s_ref,
                      gv2_ref, dw1_ref, db1_ref, dw2_ref, db2_ref,
                      dln3s_ref, dln3b_ref,
                      *, group: int, inv_keep: float):
    """FFN backward from SAVED activations (r3, h1d bf16): no recompute
    matmuls. da1 uses the identity
    where(a1>0, drop_h1(dh1d)) == where(h1d>0, inv_keep*dh1d):
    h1d = drop_h1(relu(a1)) is nonzero exactly where the mask kept AND
    a1>0 — and where the mask dropped, drop_h1 zeroes dh1d anyway.
    v2 is read ONLY as the dw1 matmul input (bf16)."""
    G = group
    Lv, D = r3_ref.shape[1], r3_ref.shape[2]
    M = G * Lv

    r3 = r3_ref[:].reshape(M, D).astype(F32)
    g = g_ref[:].reshape(M, D).astype(F32)
    # f32 for the compare: Mosaic has no bf16 comparison
    h1d = h1d_ref[:].reshape(M, -1).astype(F32)

    gr3, u3 = _ln_bwd_u(g, r3, ln3s_ref[:])
    dy3 = drop.y3(gr3)
    dh1d = _mm_bt(dy3, w2_ref[:])                   # dy3 @ W2^T
    da1 = jnp.where(h1d > 0.0, dh1d * inv_keep, 0.0)
    gv2 = gr3 + _mm_bt(da1, w1_ref[:])              # residual + da1 @ W1^T

    gv2_ref[:] = gv2.reshape(G, Lv, D).astype(gv2_ref.dtype)
    v2 = v2_ref[:].reshape(M, D)
    _ffn_weight_grads(pid, v2, h1d, g, u3, dy3, da1,
                      dw1_ref, db1_ref, dw2_ref, db2_ref,
                      dln3s_ref, dln3b_ref)


def _bwd_ffn_kernel_sav(r3_ref, g_ref, h1d_ref, v2_ref, my3_ref, *rest,
                        group: int, inv_keep: float):
    from jax.experimental import pallas as pl
    drop = _ExtMasks(None, None, None, None, None, my3_ref, inv_keep)
    _bwd_ffn_body_sav(drop, pl.program_id(0), r3_ref, g_ref, h1d_ref,
                      v2_ref, *rest, group=group, inv_keep=inv_keep)


def _bwd_ffn_kernel_sav_prng(seed_ref, r3_ref, g_ref, h1d_ref, v2_ref,
                             *rest, group: int, keep_thresh: int,
                             inv_keep: float):
    from jax.experimental import pallas as pl
    pid = pl.program_id(0)
    drop = _PrngMasks(seed_ref[0], pid, keep_thresh, inv_keep)
    _bwd_ffn_body_sav(drop, pid, r3_ref, g_ref, h1d_ref, v2_ref, *rest,
                      group=group, inv_keep=inv_keep)


# ---------------------------------------------------------------------------
# backward kernel 2: LN2 + cross-att + LN1 + self-att
# ---------------------------------------------------------------------------

def _bwd_att_body(drop, pid, x_ref, v1_ref, kq_ref, vq_ref, gv2_ref,
                  vpad_ref, qpad_ref,
                  wqkv_ref, bqkv_ref, wm1_ref, bm1_ref, ln1s_ref,
                  wq2_ref, bq2_ref, wm2_ref, bm2_ref, ln2s_ref,
                  dx_ref, dkq_ref, dvq_ref,
                  dwqkv_ref, dbqkv_ref, dwm1_ref, dbm1_ref,
                  dln1s_ref, dln1b_ref,
                  dwq2_ref, dbq2_ref, dwm2_ref, dbm2_ref,
                  dln2s_ref, dln2b_ref,
                  *, heads: int, group: int, scale: float,
                  diag: bool = False, sav_refs=None):
    G = group
    Lv, D = x_ref.shape[1], x_ref.shape[2]
    Lq = kq_ref.shape[2]
    Dh = D // heads
    M, N = G * Lv, G * Lq

    x = x_ref[:].reshape(M, D).astype(F32)
    v1 = v1_ref[:].reshape(M, D).astype(F32)
    gv2 = gv2_ref[:].reshape(M, D).astype(F32)
    if sav_refs is not None:
        # att-saves mode: qkv/qx/r1/r2 were saved by the forward — the
        # 6*D^2 per-token projection recompute below is skipped; only
        # the cheap score/softmax/PV recompute remains (needed for the
        # attention-probability cotangents and the dW inputs).
        qkv_s, qx_s, r1_s, r2_s = sav_refs
    if diag:
        pad_add = _diag_pad_add(vpad_ref[0].astype(F32), G, Lv)
        _, cross_mask = _block_masks(
            M, N, Lv, Lq, vpad_ref[0].astype(F32), qpad_ref[0].astype(F32))
    else:
        self_mask, cross_mask = _block_masks(
            M, N, Lv, Lq, vpad_ref[0].astype(F32), qpad_ref[0].astype(F32))

    # ---- recompute cross-attention from v1, then backprop it ----
    if sav_refs is None:
        qx = _mm(v1, wq2_ref[:]) + bq2_ref[:]
    else:
        qx = qx_s[:].reshape(M, D).astype(F32)
    p2ds, o2s = [], []
    p2s = []
    for h in range(heads):
        kh = kq_ref[:, h].reshape(N, Dh)
        p2 = _softmax_fwd(_mm_bt(qx[:, h * Dh:(h + 1) * Dh], kh) * scale
                          + cross_mask)
        p2d = drop.att2(p2, h)
        p2s.append(p2)
        p2ds.append(p2d)
        o2s.append(_mm(p2d, vq_ref[:, h].reshape(N, Dh)))
    atted2 = jnp.concatenate(o2s, axis=1)
    if sav_refs is None:
        y2 = _mm(atted2, wm2_ref[:]) + bm2_ref[:]
        r2 = v1 + drop.y2(y2)
    else:
        r2 = r2_s[:].reshape(M, D).astype(F32)

    gr2, u2 = _ln_bwd_u(gv2, r2, ln2s_ref[:])
    dy2 = drop.y2(gr2)
    datted2 = _mm_bt(dy2, wm2_ref[:])
    dqx_hs, dkq_hs, dvq_hs = [], [], []
    for h in range(heads):
        kh = kq_ref[:, h].reshape(N, Dh)
        do2 = datted2[:, h * Dh:(h + 1) * Dh]
        dp2d = _mm_bt(do2, vq_ref[:, h].reshape(N, Dh))   # [M, N]
        dvq_hs.append(jax.lax.dot_general(                # p2d^T @ do2
            p2ds[h].astype(BF16), do2.astype(BF16),
            dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=F32))
        ds2 = _softmax_bwd(p2s[h], drop.att2(dp2d, h))
        dqx_hs.append(_mm(ds2, kh) * scale)
        dkq_hs.append(jax.lax.dot_general(                # ds2^T @ qx_h
            ds2.astype(BF16),
            qx[:, h * Dh:(h + 1) * Dh].astype(BF16),
            dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=F32) * scale)
    dqx = jnp.concatenate(dqx_hs, axis=1)
    gv1 = gr2 + _mm_bt(dqx, wq2_ref[:])

    # ---- recompute self-attention from x, then backprop it ----
    if sav_refs is None:
        qkv = _mm(x, wqkv_ref[:]) + bqkv_ref[:]
    else:
        qkv = qkv_s[:].reshape(M, 3 * D).astype(F32)
    p1s, p1ds, o1s = [], [], []
    for h in range(heads):
        qh = qkv[:, h * Dh:(h + 1) * Dh]
        kh = qkv[:, D + h * Dh:D + (h + 1) * Dh]
        vh = qkv[:, 2 * D + h * Dh:2 * D + (h + 1) * Dh]
        if diag:
            p1, p1d, o1 = _diag_attn_fwd(qh, kh, vh, pad_add, drop.att1,
                                         h, G, Lv, scale)
        else:
            p1 = _softmax_fwd(_mm_bt(qh, kh) * scale + self_mask)
            p1d = drop.att1(p1, h)
            o1 = _mm(p1d, vh)
        p1s.append(p1)
        p1ds.append(p1d)
        o1s.append(o1)
    atted1 = jnp.concatenate(o1s, axis=1)
    if sav_refs is None:
        y1 = _mm(atted1, wm1_ref[:]) + bm1_ref[:]
        r1 = x + drop.y1(y1)
    else:
        r1 = r1_s[:].reshape(M, D).astype(F32)

    gr1, u1 = _ln_bwd_u(gv1, r1, ln1s_ref[:])
    dy1 = drop.y1(gr1)
    datted1 = _mm_bt(dy1, wm1_ref[:])
    dq_hs, dk_hs, dv_hs = [], [], []
    sl = lambda t, g: t[g * Lv:(g + 1) * Lv]
    for h in range(heads):
        qh = qkv[:, h * Dh:(h + 1) * Dh]
        kh = qkv[:, D + h * Dh:D + (h + 1) * Dh]
        vh = qkv[:, 2 * D + h * Dh:2 * D + (h + 1) * Dh]
        do1 = datted1[:, h * Dh:(h + 1) * Dh]
        if diag:
            # every [M, M] intermediate shrinks to its [M, Lv] diagonal
            # blocks (the only nonzero part: p1/p1d/ds1 are block-diag)
            dp1d = jnp.concatenate(
                [_mm_bt(sl(do1, g), sl(vh, g)) for g in range(G)], axis=0)
            dv_hs.append(jnp.concatenate(
                [_mm_tn(sl(p1ds[h], g), sl(do1, g)) for g in range(G)],
                axis=0))
            ds1 = _softmax_bwd(p1s[h], drop.att1(dp1d, h))
            dq_hs.append(jnp.concatenate(
                [_mm(sl(ds1, g), sl(kh, g)) for g in range(G)],
                axis=0) * scale)
            dk_hs.append(jnp.concatenate(
                [_mm_tn(sl(ds1, g), sl(qh, g)) for g in range(G)],
                axis=0) * scale)
            continue
        dp1d = _mm_bt(do1, vh)                            # [M, M]
        dv_hs.append(jax.lax.dot_general(                 # p1d^T @ do1
            p1ds[h].astype(BF16), do1.astype(BF16),
            dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=F32))
        ds1 = _softmax_bwd(p1s[h], drop.att1(dp1d, h))
        dq_hs.append(_mm(ds1, kh) * scale)
        dk_hs.append(jax.lax.dot_general(                 # ds1^T @ qh
            ds1.astype(BF16), qh.astype(BF16),
            dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=F32) * scale)
    dqkv = jnp.concatenate(dq_hs + dk_hs + dv_hs, axis=1)  # [M, 3D]
    dx = gr1 + _mm_bt(dqkv, wqkv_ref[:])

    dx_ref[:] = dx.reshape(G, Lv, D).astype(dx_ref.dtype)
    # [H, N, Dh] -> [H, G, Lq, Dh] -> [G, H, Lq, Dh]
    dkq = jnp.stack(dkq_hs).reshape(heads, G, Lq, Dh)
    dvq = jnp.stack(dvq_hs).reshape(heads, G, Lq, Dh)
    dkq_ref[:] = dkq.transpose(1, 0, 2, 3).astype(dkq_ref.dtype)
    dvq_ref[:] = dvq.transpose(1, 0, 2, 3).astype(dvq_ref.dtype)

    # ---- weight-gradient partials, accumulated in-kernel ----
    _acc(dwqkv_ref, _mm_tn(x, dqkv), pid)
    _acc(dbqkv_ref, _rsum(dqkv), pid)
    _acc(dwm1_ref, _mm_tn(atted1, dy1), pid)
    _acc(dbm1_ref, _rsum(dy1), pid)
    _acc(dln1s_ref, _rsum(gv1 * u1), pid)
    _acc(dln1b_ref, _rsum(gv1), pid)
    _acc(dwq2_ref, _mm_tn(v1, dqx), pid)
    _acc(dbq2_ref, _rsum(dqx), pid)
    _acc(dwm2_ref, _mm_tn(atted2, dy2), pid)
    _acc(dbm2_ref, _rsum(dy2), pid)
    _acc(dln2s_ref, _rsum(gv2 * u2), pid)
    _acc(dln2b_ref, _rsum(gv2), pid)


def _bwd_att_kernel(x_ref, v1_ref, kq_ref, vq_ref, gv2_ref,
                    vpad_ref, qpad_ref,
                    m1_ref, m2_ref, my1_ref, my2_ref, *rest,
                    heads: int, group: int, scale: float, inv_keep: float,
                    diag: bool = False):
    from jax.experimental import pallas as pl
    G, Lv = x_ref.shape[0], x_ref.shape[1]
    drop = _ExtMasks(m1_ref, m2_ref, my1_ref, my2_ref, None, None, inv_keep,
                     diag1=(G, Lv) if diag else None)
    _bwd_att_body(drop, pl.program_id(0), x_ref, v1_ref, kq_ref, vq_ref,
                  gv2_ref, vpad_ref, qpad_ref, *rest,
                  heads=heads, group=group, scale=scale, diag=diag)


def _bwd_att_kernel_prng(seed_ref, x_ref, v1_ref, kq_ref, vq_ref, gv2_ref,
                         vpad_ref, qpad_ref, *rest,
                         heads: int, group: int, scale: float,
                         keep_thresh: int, inv_keep: float,
                         diag: bool = False):
    from jax.experimental import pallas as pl
    pid = pl.program_id(0)
    drop = _PrngMasks(seed_ref[0], pid, keep_thresh, inv_keep)
    _bwd_att_body(drop, pid, x_ref, v1_ref, kq_ref, vq_ref, gv2_ref,
                  vpad_ref, qpad_ref, *rest,
                  heads=heads, group=group, scale=scale, diag=diag)


# ---------------------------------------------------------------------------
# pallas_call wrappers
# ---------------------------------------------------------------------------

def _grid_specs(G):
    """Common BlockSpec builders. Only the packing group G shapes the
    per-grid-step blocks; the other dims are baked into the shapes the
    callers pass to blk/per_g directly."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    def blk(shape, index_fn):
        return pl.BlockSpec(shape, index_fn, memory_space=pltpu.VMEM)

    rep = lambda shape: blk(shape, lambda b: (0,) * len(shape))
    per_g = lambda *trail: blk((G,) + trail, lambda b: (b,) + (0,) * len(trail))
    return blk, rep, per_g


def _compiler_params():
    """Raise the scoped-VMEM cap: the default 16 MB scope rejects the
    fwd kernel at G=4 by ~180 KB, and the D=1024 FFN backward's in-kernel
    dW accumulators (dw1+dw2 f32 = 32 MB + bf16 weights) need 75 MB;
    physical VMEM is 128 MB on v5e. MCAN_VMEM_CAP_MB overrides (the
    D=1024 fused SA encoder backward needs ~101 MB at G=8)."""
    import os

    from jax.experimental.pallas import tpu as pltpu
    cap = int(os.environ.get("MCAN_VMEM_CAP_MB", "100"))
    return pltpu.CompilerParams(vmem_limit_bytes=cap * 1024 * 1024)


def _mask_specs(blk, G, H, M, N, Lv, Lq, D, F):
    """BlockSpecs for the six dropout-mask tensors (packed layout)."""
    return [
        blk((1, H, M, M), lambda b: (b, 0, 0, 0)),   # att1
        blk((1, H, M, N), lambda b: (b, 0, 0, 0)),   # att2
        blk((1, M, D), lambda b: (b, 0, 0)),         # y1
        blk((1, M, D), lambda b: (b, 0, 0)),         # y2
        blk((1, M, F), lambda b: (b, 0, 0)),         # h1
        blk((1, M, D), lambda b: (b, 0, 0)),         # y3
    ]


def _flat_pad(mask, B, G, L):
    if mask is None:
        return jnp.zeros((B // G, 1, G * L), jnp.int8)
    return mask[:, 0, 0].astype(jnp.int8).reshape(B // G, 1, G * L)


def make_dropout_masks(rng, rate, B, Lv, Lq, D, F, H, group,
                       bit_width=32):
    """The six per-block dropout masks in packed kernel layout (uint8) plus
    the exact inverse keep probability. One call per (step, layer)."""
    from mcan_vqa_tpu.ops.dropout import random_keep_mask
    G = group
    nb = B // G
    M, N = G * Lv, G * Lq
    shapes = {
        "att1": (nb, H, M, M),
        "att2": (nb, H, M, N),
        "y1": (nb, M, D),
        "y2": (nb, M, D),
        "h1": (nb, M, F),
        "y3": (nb, M, D),
    }
    if rate <= 0.0:
        return {n: jnp.ones(shapes[n], jnp.uint8) for n in MASK_NAMES}, 1.0
    keys = jax.random.split(rng, len(MASK_NAMES))
    masks = {}
    inv_keep = 1.0
    for key, name in zip(keys, MASK_NAMES):
        keep, inv_keep = random_keep_mask(key, rate, shapes[name], bit_width)
        masks[name] = keep.astype(jnp.uint8)
    return masks, inv_keep


def _seed_spec():
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu
    return pl.BlockSpec(memory_space=pltpu.SMEM)


def _fwd_call(x, kq, vq, vpad, qpad, masks, w, *, heads, group, interpret,
              inv_keep, prng=None, save_acts=False, save_dtype=F32,
              diag=False, att_saves=False):
    """prng: None for external uint8 masks, else (seed_arr[1] int32,
    keep_thresh) — masks regenerated by the TPU hardware PRNG in-kernel.
    save_acts: additionally emit r3 (f32) and h1d (bf16) so the FFN
    backward skips its recompute matmuls. att_saves (requires save_acts):
    additionally emit qkv/qx/r1/r2 so the attention backward skips its
    projection recompute matmuls. diag: block-diagonal self-attention
    (see _diag_attn_fwd)."""
    if att_saves and not save_acts:
        raise ValueError("att_saves requires save_acts (output ordering)")
    from jax.experimental import pallas as pl

    B, Lv, D = x.shape
    Lq = kq.shape[2]
    Dh = D // heads
    H = heads
    G = group
    M, N = G * Lv, G * Lq
    F = w["w1"].shape[1]
    scale = 1.0 / (Dh ** 0.5)

    blk, rep, per_g = _grid_specs(G)
    if prng is None:
        kernel = functools.partial(_fwd_kernel, heads=H, group=G,
                                   scale=scale, inv_keep=inv_keep,
                                   diag=diag)
        head_specs = [
            per_g(Lv, D),                                   # x
            per_g(H, Lq, Dh), per_g(H, Lq, Dh),             # kq, vq
            blk((1, 1, M), lambda b: (b, 0, 0)),            # vpad
            blk((1, 1, N), lambda b: (b, 0, 0)),            # qpad
            *_mask_specs(blk, G, H, M, N, Lv, Lq, D, F),
        ]
        head_ops = (x, kq, vq, vpad, qpad,
                    masks["att1"], masks["att2"], masks["y1"], masks["y2"],
                    masks["h1"], masks["y3"])
    else:
        seed, keep_thresh = prng
        kernel = functools.partial(_fwd_kernel_prng, heads=H, group=G,
                                   scale=scale, keep_thresh=keep_thresh,
                                   inv_keep=inv_keep, diag=diag)
        head_specs = [
            _seed_spec(),
            per_g(Lv, D),
            per_g(H, Lq, Dh), per_g(H, Lq, Dh),
            blk((1, 1, M), lambda b: (b, 0, 0)),
            blk((1, 1, N), lambda b: (b, 0, 0)),
        ]
        head_ops = (seed, x, kq, vq, vpad, qpad)
    out_specs = [per_g(Lv, D)] * 3
    # v3 (the block output / residual stream) stays f32; the saved
    # backward-only activations v1/v2/r3 take save_dtype (bf16 halves
    # their HBM write+read traffic; gradient effect bounded by the
    # parity tests)
    out_shape = [jax.ShapeDtypeStruct((B, Lv, D), F32),
                 jax.ShapeDtypeStruct((B, Lv, D), save_dtype),
                 jax.ShapeDtypeStruct((B, Lv, D), save_dtype)]
    if save_acts:
        out_specs += [per_g(Lv, D), per_g(Lv, F)]
        out_shape += [jax.ShapeDtypeStruct((B, Lv, D), save_dtype),  # r3
                      jax.ShapeDtypeStruct((B, Lv, F), BF16)]        # h1d
    if att_saves:
        out_specs += [per_g(Lv, 3 * D)] + [per_g(Lv, D)] * 3
        out_shape += [jax.ShapeDtypeStruct((B, Lv, 3 * D), save_dtype),
                      jax.ShapeDtypeStruct((B, Lv, D), save_dtype),  # qx
                      jax.ShapeDtypeStruct((B, Lv, D), save_dtype),  # r1
                      jax.ShapeDtypeStruct((B, Lv, D), save_dtype)]  # r2
    out = pl.pallas_call(
        kernel,
        grid=(B // G,),
        in_specs=head_specs + [
            rep((D, 3 * D)), rep((3 * D,)),
            rep((D, D)), rep((D,)), rep((D,)), rep((D,)),   # m1 + ln1
            rep((D, D)), rep((D,)),                         # q2
            rep((D, D)), rep((D,)), rep((D,)), rep((D,)),   # m2 + ln2
            rep((D, F)), rep((F,)), rep((F, D)), rep((D,)),
            rep((D,)), rep((D,)),                           # ffn + ln3
        ],
        out_specs=out_specs,
        out_shape=out_shape,
        compiler_params=None if interpret else _compiler_params(),
        interpret=interpret,
    )(*head_ops,
      w["wqkv"], w["bqkv"], w["wm1"], w["bm1"], w["ln1_s"], w["ln1_b"],
      w["wq2"], w["bq2"], w["wm2"], w["bm2"], w["ln2_s"], w["ln2_b"],
      w["w1"], w["b1"], w["w2"], w["b2"], w["ln3_s"], w["ln3_b"])
    return out  # (v3, v1, v2[, r3, h1d])


def _bwd_ffn_call(v2, g, masks, w, *, group, interpret, inv_keep,
                  prng=None, save_dtype=F32):
    from jax.experimental import pallas as pl

    B, Lv, D = v2.shape
    G = group
    M = G * Lv
    F = w["w1"].shape[1]
    blk, rep, per_g = _grid_specs(G)
    if prng is None:
        kernel = functools.partial(_bwd_ffn_kernel, group=G,
                                   inv_keep=inv_keep)
        head_specs = [
            per_g(Lv, D), per_g(Lv, D),                     # v2, g
            blk((1, M, F), lambda b: (b, 0, 0)),            # mask h1
            blk((1, M, D), lambda b: (b, 0, 0)),            # mask y3
        ]
        head_ops = (v2, g, masks["h1"], masks["y3"])
    else:
        seed, keep_thresh = prng
        kernel = functools.partial(_bwd_ffn_kernel_prng, group=G,
                                   keep_thresh=keep_thresh,
                                   inv_keep=inv_keep)
        head_specs = [_seed_spec(), per_g(Lv, D), per_g(Lv, D)]
        head_ops = (seed, v2, g)
    outs = pl.pallas_call(
        kernel,
        grid=(B // G,),
        in_specs=head_specs + [
            rep((D, F)), rep((F,)), rep((F, D)), rep((D,)),
            rep((D,)),                                      # ln3_s
        ],
        out_specs=[per_g(Lv, D)] + _ffn_dw_specs(rep, D, F),
        out_shape=[jax.ShapeDtypeStruct((B, Lv, D), save_dtype)]   # gv2
        + _ffn_dw_shapes(D, F),
        compiler_params=None if interpret else _compiler_params(),
        interpret=interpret,
    )(*head_ops,
      w["w1"], w["b1"], w["w2"], w["b2"], w["ln3_s"])
    return outs  # (gv2, dw1, db1, dw2, db2, dln3s, dln3b)


def _ffn_dw_specs(rep, D, F):
    return [rep((D, F)), rep((1, F)), rep((F, D)), rep((1, D)),
            rep((1, D)), rep((1, D))]


def _ffn_dw_shapes(D, F):
    return [jax.ShapeDtypeStruct((D, F), F32),      # dw1
            jax.ShapeDtypeStruct((1, F), F32),      # db1
            jax.ShapeDtypeStruct((F, D), F32),      # dw2
            jax.ShapeDtypeStruct((1, D), F32),      # db2
            jax.ShapeDtypeStruct((1, D), F32),      # dln3s
            jax.ShapeDtypeStruct((1, D), F32)]      # dln3b


def _bwd_ffn_call_sav(r3, g, h1d, v2, masks, w, *, group, interpret,
                      inv_keep, prng=None, save_dtype=F32):
    """FFN backward from saved r3/h1d (no recompute matmuls); v2 feeds the
    in-kernel dw1 accumulation."""
    from jax.experimental import pallas as pl

    B, Lv, D = r3.shape
    G = group
    M = G * Lv
    F = w["w1"].shape[1]
    blk, rep, per_g = _grid_specs(G)
    if prng is None:
        kernel = functools.partial(_bwd_ffn_kernel_sav, group=G,
                                   inv_keep=inv_keep)
        head_specs = [per_g(Lv, D), per_g(Lv, D), per_g(Lv, F),
                      per_g(Lv, D),
                      blk((1, M, D), lambda b: (b, 0, 0))]   # mask y3
        head_ops = (r3, g, h1d, v2, masks["y3"])
    else:
        seed, keep_thresh = prng
        kernel = functools.partial(_bwd_ffn_kernel_sav_prng, group=G,
                                   keep_thresh=keep_thresh,
                                   inv_keep=inv_keep)
        head_specs = [_seed_spec(), per_g(Lv, D), per_g(Lv, D),
                      per_g(Lv, F), per_g(Lv, D)]
        head_ops = (seed, r3, g, h1d, v2)
    outs = pl.pallas_call(
        kernel,
        grid=(B // G,),
        in_specs=head_specs + [
            rep((D, F)), rep((F, D)), rep((D,)),            # w1, w2, ln3_s
        ],
        out_specs=[per_g(Lv, D)] + _ffn_dw_specs(rep, D, F),
        out_shape=[jax.ShapeDtypeStruct((B, Lv, D), save_dtype)]   # gv2
        + _ffn_dw_shapes(D, F),
        compiler_params=None if interpret else _compiler_params(),
        interpret=interpret,
    )(*head_ops, w["w1"], w["w2"], w["ln3_s"])
    return outs  # (gv2, dw1, db1, dw2, db2, dln3s, dln3b)


def _bwd_att_call(x, v1, kq, vq, gv2, vpad, qpad, masks, w, *,
                  heads, group, interpret, inv_keep, prng=None, diag=False):
    from jax.experimental import pallas as pl

    B, Lv, D = x.shape
    Lq = kq.shape[2]
    Dh = D // heads
    H = heads
    G = group
    M, N = G * Lv, G * Lq
    scale = 1.0 / (Dh ** 0.5)
    blk, rep, per_g = _grid_specs(G)
    if prng is None:
        kernel = functools.partial(_bwd_att_kernel, heads=H, group=G,
                                   scale=scale, inv_keep=inv_keep,
                                   diag=diag)
        head_specs = [
            per_g(Lv, D), per_g(Lv, D),                     # x, v1
            per_g(H, Lq, Dh), per_g(H, Lq, Dh),             # kq, vq
            per_g(Lv, D),                                   # gv2
            blk((1, 1, M), lambda b: (b, 0, 0)),            # vpad
            blk((1, 1, N), lambda b: (b, 0, 0)),            # qpad
            blk((1, H, M, M), lambda b: (b, 0, 0, 0)),      # att1
            blk((1, H, M, N), lambda b: (b, 0, 0, 0)),      # att2
            blk((1, M, D), lambda b: (b, 0, 0)),            # y1
            blk((1, M, D), lambda b: (b, 0, 0)),            # y2
        ]
        head_ops = (x, v1, kq, vq, gv2, vpad, qpad,
                    masks["att1"], masks["att2"], masks["y1"], masks["y2"])
    else:
        seed, keep_thresh = prng
        kernel = functools.partial(_bwd_att_kernel_prng, heads=H, group=G,
                                   scale=scale, keep_thresh=keep_thresh,
                                   inv_keep=inv_keep, diag=diag)
        head_specs = [
            _seed_spec(),
            per_g(Lv, D), per_g(Lv, D),
            per_g(H, Lq, Dh), per_g(H, Lq, Dh),
            per_g(Lv, D),
            blk((1, 1, M), lambda b: (b, 0, 0)),
            blk((1, 1, N), lambda b: (b, 0, 0)),
        ]
        head_ops = (seed, x, v1, kq, vq, gv2, vpad, qpad)
    outs = pl.pallas_call(
        kernel,
        grid=(B // G,),
        in_specs=head_specs + [
            rep((D, 3 * D)), rep((3 * D,)),                 # wqkv, bqkv
            rep((D, D)), rep((D,)), rep((D,)),              # wm1, bm1, ln1_s
            rep((D, D)), rep((D,)),                         # wq2, bq2
            rep((D, D)), rep((D,)), rep((D,)),              # wm2, bm2, ln2_s
        ],
        out_specs=[
            per_g(Lv, D),                                   # dx
            per_g(H, Lq, Dh), per_g(H, Lq, Dh),             # dkq, dvq
            rep((D, 3 * D)), rep((1, 3 * D)),               # dwqkv, dbqkv
            rep((D, D)), rep((1, D)),                       # dwm1, dbm1
            rep((1, D)), rep((1, D)),                       # dln1s, dln1b
            rep((D, D)), rep((1, D)),                       # dwq2, dbq2
            rep((D, D)), rep((1, D)),                       # dwm2, dbm2
            rep((1, D)), rep((1, D)),                       # dln2s, dln2b
        ],
        out_shape=[
            jax.ShapeDtypeStruct((B, Lv, D), F32),
            jax.ShapeDtypeStruct((B, H, Lq, Dh), F32),
            jax.ShapeDtypeStruct((B, H, Lq, Dh), F32),
            jax.ShapeDtypeStruct((D, 3 * D), F32),
            jax.ShapeDtypeStruct((1, 3 * D), F32),
            jax.ShapeDtypeStruct((D, D), F32),
            jax.ShapeDtypeStruct((1, D), F32),
            jax.ShapeDtypeStruct((1, D), F32),
            jax.ShapeDtypeStruct((1, D), F32),
            jax.ShapeDtypeStruct((D, D), F32),
            jax.ShapeDtypeStruct((1, D), F32),
            jax.ShapeDtypeStruct((D, D), F32),
            jax.ShapeDtypeStruct((1, D), F32),
            jax.ShapeDtypeStruct((1, D), F32),
            jax.ShapeDtypeStruct((1, D), F32),
        ],
        compiler_params=None if interpret else _compiler_params(),
        interpret=interpret,
    )(*head_ops,
      w["wqkv"], w["bqkv"], w["wm1"], w["bm1"], w["ln1_s"],
      w["wq2"], w["bq2"], w["wm2"], w["bm2"], w["ln2_s"])
    return outs  # (dx, dkq, dvq, + 12 weight-grad pieces)


def _bwd_att_kernel_sav(x_ref, v1_ref, qkv_ref, qx_ref, r1_ref, r2_ref,
                        kq_ref, vq_ref, gv2_ref, vpad_ref, qpad_ref,
                        m1_ref, m2_ref, my1_ref, my2_ref,
                        wqkv_ref, wm1_ref, ln1s_ref,
                        wq2_ref, wm2_ref, ln2s_ref, *outs,
                        heads: int, group: int, scale: float,
                        inv_keep: float, diag: bool = False):
    from jax.experimental import pallas as pl
    G, Lv = x_ref.shape[0], x_ref.shape[1]
    drop = _ExtMasks(m1_ref, m2_ref, my1_ref, my2_ref, None, None, inv_keep,
                     diag1=(G, Lv) if diag else None)
    _bwd_att_body(drop, pl.program_id(0), x_ref, v1_ref, kq_ref, vq_ref,
                  gv2_ref, vpad_ref, qpad_ref,
                  wqkv_ref, None, wm1_ref, None, ln1s_ref,
                  wq2_ref, None, wm2_ref, None, ln2s_ref, *outs,
                  heads=heads, group=group, scale=scale, diag=diag,
                  sav_refs=(qkv_ref, qx_ref, r1_ref, r2_ref))


def _bwd_att_kernel_sav_prng(seed_ref, x_ref, v1_ref, qkv_ref, qx_ref,
                             r1_ref, r2_ref, kq_ref, vq_ref, gv2_ref,
                             vpad_ref, qpad_ref, *rest,
                             heads: int, group: int, scale: float,
                             keep_thresh: int, inv_keep: float,
                             diag: bool = False):
    from jax.experimental import pallas as pl
    pid = pl.program_id(0)
    drop = _PrngMasks(seed_ref[0], pid, keep_thresh, inv_keep)
    wqkv_ref, wm1_ref, ln1s_ref, wq2_ref, wm2_ref, ln2s_ref = rest[:6]
    _bwd_att_body(drop, pid, x_ref, v1_ref, kq_ref, vq_ref,
                  gv2_ref, vpad_ref, qpad_ref,
                  wqkv_ref, None, wm1_ref, None, ln1s_ref,
                  wq2_ref, None, wm2_ref, None, ln2s_ref, *rest[6:],
                  heads=heads, group=group, scale=scale, diag=diag,
                  sav_refs=(qkv_ref, qx_ref, r1_ref, r2_ref))


def _bwd_att_call_sav(x, v1, qkv, qx, r1, r2, kq, vq, gv2, vpad, qpad,
                      masks, w, *, heads, group, interpret, inv_keep,
                      prng=None, diag=False):
    """Attention backward from SAVED qkv/qx/r1/r2 (no projection
    recompute matmuls; biases not needed). x and v1 remain inputs as the
    dwqkv / dwq2 matmul operands."""
    from jax.experimental import pallas as pl

    B, Lv, D = x.shape
    Lq = kq.shape[2]
    Dh = D // heads
    H = heads
    G = group
    M, N = G * Lv, G * Lq
    scale = 1.0 / (Dh ** 0.5)
    blk, rep, per_g = _grid_specs(G)
    sav_specs = [per_g(Lv, 3 * D), per_g(Lv, D),
                 per_g(Lv, D), per_g(Lv, D)]          # qkv, qx, r1, r2
    if prng is None:
        kernel = functools.partial(_bwd_att_kernel_sav, heads=H, group=G,
                                   scale=scale, inv_keep=inv_keep,
                                   diag=diag)
        head_specs = [
            per_g(Lv, D), per_g(Lv, D),                     # x, v1
            *sav_specs,
            per_g(H, Lq, Dh), per_g(H, Lq, Dh),             # kq, vq
            per_g(Lv, D),                                   # gv2
            blk((1, 1, M), lambda b: (b, 0, 0)),            # vpad
            blk((1, 1, N), lambda b: (b, 0, 0)),            # qpad
            blk((1, H, M, M), lambda b: (b, 0, 0, 0)),      # att1
            blk((1, H, M, N), lambda b: (b, 0, 0, 0)),      # att2
            blk((1, M, D), lambda b: (b, 0, 0)),            # y1
            blk((1, M, D), lambda b: (b, 0, 0)),            # y2
        ]
        head_ops = (x, v1, qkv, qx, r1, r2, kq, vq, gv2, vpad, qpad,
                    masks["att1"], masks["att2"], masks["y1"], masks["y2"])
    else:
        seed, keep_thresh = prng
        kernel = functools.partial(_bwd_att_kernel_sav_prng, heads=H,
                                   group=G, scale=scale,
                                   keep_thresh=keep_thresh,
                                   inv_keep=inv_keep, diag=diag)
        head_specs = [
            _seed_spec(),
            per_g(Lv, D), per_g(Lv, D),
            *sav_specs,
            per_g(H, Lq, Dh), per_g(H, Lq, Dh),
            per_g(Lv, D),
            blk((1, 1, M), lambda b: (b, 0, 0)),
            blk((1, 1, N), lambda b: (b, 0, 0)),
        ]
        head_ops = (seed, x, v1, qkv, qx, r1, r2, kq, vq, gv2, vpad, qpad)
    outs = pl.pallas_call(
        kernel,
        grid=(B // G,),
        in_specs=head_specs + [
            rep((D, 3 * D)),                                # wqkv
            rep((D, D)), rep((D,)),                         # wm1, ln1_s
            rep((D, D)),                                    # wq2
            rep((D, D)), rep((D,)),                         # wm2, ln2_s
        ],
        out_specs=[
            per_g(Lv, D),                                   # dx
            per_g(H, Lq, Dh), per_g(H, Lq, Dh),             # dkq, dvq
            rep((D, 3 * D)), rep((1, 3 * D)),               # dwqkv, dbqkv
            rep((D, D)), rep((1, D)),                       # dwm1, dbm1
            rep((1, D)), rep((1, D)),                       # dln1s, dln1b
            rep((D, D)), rep((1, D)),                       # dwq2, dbq2
            rep((D, D)), rep((1, D)),                       # dwm2, dbm2
            rep((1, D)), rep((1, D)),                       # dln2s, dln2b
        ],
        out_shape=[
            jax.ShapeDtypeStruct((B, Lv, D), F32),
            jax.ShapeDtypeStruct((B, H, Lq, Dh), F32),
            jax.ShapeDtypeStruct((B, H, Lq, Dh), F32),
            jax.ShapeDtypeStruct((D, 3 * D), F32),
            jax.ShapeDtypeStruct((1, 3 * D), F32),
            jax.ShapeDtypeStruct((D, D), F32),
            jax.ShapeDtypeStruct((1, D), F32),
            jax.ShapeDtypeStruct((1, D), F32),
            jax.ShapeDtypeStruct((1, D), F32),
            jax.ShapeDtypeStruct((D, D), F32),
            jax.ShapeDtypeStruct((1, D), F32),
            jax.ShapeDtypeStruct((D, D), F32),
            jax.ShapeDtypeStruct((1, D), F32),
            jax.ShapeDtypeStruct((1, D), F32),
            jax.ShapeDtypeStruct((1, D), F32),
        ],
        compiler_params=None if interpret else _compiler_params(),
        interpret=interpret,
    )(*head_ops,
      w["wqkv"], w["wm1"], w["ln1_s"], w["wq2"], w["wm2"], w["ln2_s"])
    return outs  # (dx, dkq, dvq, + 12 weight-grad pieces)


# ---------------------------------------------------------------------------
# the custom-VJP op
# ---------------------------------------------------------------------------

def _resolve_diag(diag_att, group):
    """None -> module default (MCAN_DIAG_SOFTMAX env, on unless 0); G=1
    has no off-diagonal blocks so the full path IS the diag path."""
    if group <= 1:
        return False
    return _DIAG_ATT if diag_att is None else bool(diag_att)


def make_sga_block_train(num_heads: int, group: int = 2,
                         interpret: bool = False, inv_keep: float = 1.0,
                         save_acts: bool = True,
                         bf16_saves: bool = False,
                         diag_att: bool = None,
                         att_saves: bool = False):
    """Build the differentiable fused-block op for a fixed config.

    Returns f(x, kq, vq, vpad, qpad, masks, w) -> v3 where
      x     [B, Lv, D] f32 image stream,
      kq/vq [B, H, Lq, Dh] pre-projected cross keys/values,
      vpad/qpad int8 [B//G, 1, G*L] flattened pad masks (_flat_pad),
      masks the uint8 dict from make_dropout_masks,
      w     the dict from prepare_sga_train_params.
    Gradients flow to x, kq, vq, and every entry of w.
    save_acts: the forward additionally saves r3/h1d so the FFN backward
    skips its recompute matmuls (trades ~1 ms HBM for ~4 ms MXU at
    MCAN-small B=256); False restores the pure-recompute backward.
    att_saves (requires save_acts): the forward additionally saves
    qkv/qx/r1/r2 so the attention backward skips its 6*D^2 per-token
    projection recompute (only the cheap score/softmax/PV recompute
    remains).
    bf16_saves: emit the backward-only saves v1/v2/r3 and the
    inter-kernel gradient gv2 in bf16 (half their HBM traffic; the block
    output v3 and the dx/dkq/dvq cotangents stay f32).
    diag_att: block-diagonal self-attention softmax/matmuls
    (bitwise-identical math, ~G x less work; None = MCAN_DIAG_SOFTMAX
    env default).
    """
    save_dtype = BF16 if bf16_saves else F32
    kw = dict(heads=num_heads, group=group, interpret=interpret,
              inv_keep=inv_keep, diag=_resolve_diag(diag_att, group))

    @jax.custom_vjp
    def f(x, kq, vq, vpad, qpad, masks, w):
        outs = _fwd_call(x, kq, vq, vpad, qpad, masks, w, **kw)
        return outs[0]

    def f_fwd(x, kq, vq, vpad, qpad, masks, w):
        outs = _fwd_call(x, kq, vq, vpad, qpad, masks, w,
                         save_acts=save_acts, save_dtype=save_dtype,
                         att_saves=att_saves, **kw)
        v3, v1, v2 = outs[:3]
        r3, h1d = (outs[3], outs[4]) if save_acts else (None, None)
        att_sav = tuple(outs[5:9]) if att_saves else None
        return v3, (x, kq, vq, vpad, qpad, masks, w, v1, v2, r3, h1d,
                    att_sav)

    def f_bwd(res, g):
        x, kq, vq, vpad, qpad, masks, w, v1, v2, r3, h1d, att_sav = res
        if save_acts:
            gv2, *ffn_dw = _bwd_ffn_call_sav(
                r3, g, h1d, v2, masks, w, group=group, interpret=interpret,
                inv_keep=inv_keep, save_dtype=save_dtype)
        else:
            gv2, *ffn_dw = _bwd_ffn_call(
                v2, g, masks, w, group=group, interpret=interpret,
                inv_keep=inv_keep, save_dtype=save_dtype)
        if att_saves:
            qkv, qx, r1, r2 = att_sav
            dx, dkq, dvq, *att_dw = _bwd_att_call_sav(
                x, v1, qkv, qx, r1, r2, kq, vq, gv2, vpad, qpad, masks, w,
                **kw)
        else:
            dx, dkq, dvq, *att_dw = _bwd_att_call(
                x, v1, kq, vq, gv2, vpad, qpad, masks, w, **kw)
        dw = _assemble_dw(att_dw, ffn_dw)
        f0 = lambda t: np.zeros(t.shape, jax.dtypes.float0)
        return (dx, dkq, dvq, f0(vpad), f0(qpad),
                jax.tree.map(f0, masks), dw)

    f.defvjp(f_fwd, f_bwd)
    return f


def _assemble_dw(att_dw, ffn_dw):
    """Kernel-accumulated weight-grad pieces -> prepare_sga_train_params
    key layout (row-vector [1, D] sums squeezed to [D])."""
    (dwqkv, dbqkv, dwm1, dbm1, dln1s, dln1b,
     dwq2, dbq2, dwm2, dbm2, dln2s, dln2b) = att_dw
    dw1, db1, dw2, db2, dln3s, dln3b = ffn_dw
    return {
        "wqkv": dwqkv, "bqkv": dbqkv[0],
        "wm1": dwm1, "bm1": dbm1[0],
        "ln1_s": dln1s[0], "ln1_b": dln1b[0],
        "wq2": dwq2, "bq2": dbq2[0],
        "wm2": dwm2, "bm2": dbm2[0],
        "ln2_s": dln2s[0], "ln2_b": dln2b[0],
        "w1": dw1, "b1": db1[0],
        "w2": dw2, "b2": db2[0],
        "ln3_s": dln3s[0], "ln3_b": dln3b[0],
    }


def fused_sga_block_train(x, kq, vq, v_mask, q_mask, masks, w, *,
                          num_heads: int, group: int = 2,
                          inv_keep: float = 1.0,
                          interpret: bool = False,
                          save_acts: bool = True,
                          bf16_saves: bool = False,
                          diag_att: bool = None,
                          att_saves: bool = False):
    """Convenience wrapper: takes the standard bool [B,1,1,L] pad masks.

    w from prepare_sga_train_params (weights may be pre-cast to bf16 by the
    caller for VMEM headroom; grads flow through the cast).
    """
    B, Lv, _ = x.shape
    Lq = kq.shape[2]
    G = max(1, group)
    while B % G:
        G -= 1
    vpad = _flat_pad(v_mask, B, G, Lv)
    qpad = _flat_pad(q_mask, B, G, Lq)
    f = make_sga_block_train(num_heads, G, interpret, inv_keep,
                             save_acts=save_acts, bf16_saves=bf16_saves,
                             diag_att=diag_att, att_saves=att_saves)
    return f(x, kq, vq, vpad, qpad, masks, w)


# ---------------------------------------------------------------------------
# in-kernel PRNG dropout variant (TPU hardware RNG; no mask HBM traffic)
# ---------------------------------------------------------------------------

def prng_keep_params(rate: float):
    """(keep_thresh, inv_keep) for the in-kernel uint32 keep decision.

    keep iff bits < keep_thresh = round((1-rate) * 2^32); kept values
    scale by the exact quantized inverse keep probability so
    E[drop(x)] == x holds exactly (same contract as ops/dropout)."""
    q = 1 << 32
    t = int(round((1.0 - rate) * q))
    t = max(1, min(q - 1, t))
    return t, float(q) / t


def make_sga_block_train_prng(num_heads: int, group: int, rate: float,
                              save_acts: bool = True,
                              bf16_saves: bool = False,
                              diag_att: bool = None,
                              att_saves: bool = False):
    """PRNG-dropout fused block: f(x, kq, vq, vpad, qpad, seed, w) -> v3.

    seed is an int32 [1] array; each dropout site reseeds the hardware
    PRNG with (seed, site_code, program_id), so the two backward kernels
    regenerate the exact forward masks — zero mask bytes cross HBM.
    TPU-only (the Mosaic PRNG has no interpret-mode lowering); the
    external-mask path (make_sga_block_train) stays the CPU-testable
    reference. save_acts / diag_att as in make_sga_block_train. NOTE:
    under diag_att the att1 PRNG bits are drawn on the [M, Lv] diagonal
    layout, so a given seed yields a different (equally valid) dropout
    draw than the full-width path — dump_prng_masks(diag=...) matches.
    """
    keep_thresh, inv_keep = prng_keep_params(rate)
    save_dtype = BF16 if bf16_saves else F32
    kw = dict(heads=num_heads, group=group, interpret=False,
              inv_keep=inv_keep, diag=_resolve_diag(diag_att, group))

    @jax.custom_vjp
    def f(x, kq, vq, vpad, qpad, seed, w):
        outs = _fwd_call(x, kq, vq, vpad, qpad, None, w,
                         prng=(seed, keep_thresh), **kw)
        return outs[0]

    def f_fwd(x, kq, vq, vpad, qpad, seed, w):
        outs = _fwd_call(x, kq, vq, vpad, qpad, None, w,
                         prng=(seed, keep_thresh), save_acts=save_acts,
                         save_dtype=save_dtype, att_saves=att_saves, **kw)
        v3, v1, v2 = outs[:3]
        r3, h1d = (outs[3], outs[4]) if save_acts else (None, None)
        att_sav = tuple(outs[5:9]) if att_saves else None
        return v3, (x, kq, vq, vpad, qpad, seed, w, v1, v2, r3, h1d,
                    att_sav)

    def f_bwd(res, g):
        x, kq, vq, vpad, qpad, seed, w, v1, v2, r3, h1d, att_sav = res
        if save_acts:
            gv2, *ffn_dw = _bwd_ffn_call_sav(
                r3, g, h1d, v2, None, w, group=group, interpret=False,
                inv_keep=inv_keep, prng=(seed, keep_thresh),
                save_dtype=save_dtype)
        else:
            gv2, *ffn_dw = _bwd_ffn_call(
                v2, g, None, w, group=group, interpret=False,
                inv_keep=inv_keep, prng=(seed, keep_thresh),
                save_dtype=save_dtype)
        if att_saves:
            qkv, qx, r1, r2 = att_sav
            dx, dkq, dvq, *att_dw = _bwd_att_call_sav(
                x, v1, qkv, qx, r1, r2, kq, vq, gv2, vpad, qpad, None, w,
                prng=(seed, keep_thresh), **kw)
        else:
            dx, dkq, dvq, *att_dw = _bwd_att_call(
                x, v1, kq, vq, gv2, vpad, qpad, None, w,
                prng=(seed, keep_thresh), **kw)
        dw = _assemble_dw(att_dw, ffn_dw)
        f0 = lambda t: np.zeros(t.shape, jax.dtypes.float0)
        return (dx, dkq, dvq, f0(vpad), f0(qpad), f0(seed), dw)

    f.defvjp(f_fwd, f_bwd)
    return f


def _mask_dump_kernel(seed_ref, att1_ref, att2_ref, y1_ref, y2_ref,
                      h1_ref, y3_ref, *, heads: int, keep_thresh: int,
                      diag: bool = False, group: int = 1):
    """Write the exact masks the PRNG kernels generate (validation aid).

    diag: the att1 bits are drawn on the [M, Lv] diagonal layout (what
    the diag kernels consume) and scattered onto the [M, M] output's
    diagonal blocks with 1s elsewhere — the off-diagonal entries are
    never consumed (those attention probabilities are exactly 0)."""
    from jax.experimental import pallas as pl
    drop = _PrngMasks(seed_ref[0], pl.program_id(0), keep_thresh, 1.0)

    def keep(site, shape):
        from jax.experimental.pallas import tpu as pltpu
        pltpu.prng_seed(drop.seed, (site << 19) | drop.pid)
        bits = jax.lax.bitcast_convert_type(
            pltpu.prng_random_bits(shape), jnp.uint32)
        return (bits < drop.thresh).astype(jnp.int8)

    M = y1_ref.shape[1]
    N = att2_ref.shape[3]
    L = M // group
    for h in range(heads):
        if diag:
            att1_ref[0, h] = _scatter_diag(
                keep(_SITE_ATT1 + h, (M, L)).astype(F32), group, L,
                fill=1.0).astype(jnp.int8)
        else:
            att1_ref[0, h] = keep(_SITE_ATT1 + h, (M, M))
        att2_ref[0, h] = keep(_SITE_ATT2 + h, (M, N))
    y1_ref[0] = keep(_SITE_Y1, y1_ref.shape[1:])
    y2_ref[0] = keep(_SITE_Y2, y2_ref.shape[1:])
    h1_ref[0] = keep(_SITE_H1, h1_ref.shape[1:])
    y3_ref[0] = keep(_SITE_Y3, y3_ref.shape[1:])


def dump_prng_masks(seed, rate, B, Lv, Lq, D, F, H, group, diag_att=None):
    """The masks the PRNG-dropout kernels will generate for this seed, in
    make_dropout_masks packed layout (int8). TPU-only; used to validate
    the in-kernel PRNG path against the external-mask path. diag_att must
    match the kernel build being validated (None = module default)."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    G = group
    nb = B // G
    M, N = G * Lv, G * Lq
    keep_thresh, inv_keep = prng_keep_params(rate)
    blk = lambda shape: pl.BlockSpec(
        (1,) + shape, lambda b: (b,) + (0,) * len(shape),
        memory_space=pltpu.VMEM)
    outs = pl.pallas_call(
        functools.partial(_mask_dump_kernel, heads=H,
                          keep_thresh=keep_thresh,
                          diag=_resolve_diag(diag_att, G), group=G),
        grid=(nb,),
        in_specs=[_seed_spec()],
        out_specs=[blk((H, M, M)), blk((H, M, N)), blk((M, D)),
                   blk((M, D)), blk((M, F)), blk((M, D))],
        out_shape=[
            jax.ShapeDtypeStruct((nb, H, M, M), jnp.int8),
            jax.ShapeDtypeStruct((nb, H, M, N), jnp.int8),
            jax.ShapeDtypeStruct((nb, M, D), jnp.int8),
            jax.ShapeDtypeStruct((nb, M, D), jnp.int8),
            jax.ShapeDtypeStruct((nb, M, F), jnp.int8),
            jax.ShapeDtypeStruct((nb, M, D), jnp.int8),
        ],
        compiler_params=_compiler_params(),
    )(seed)
    masks = dict(zip(MASK_NAMES, (o.astype(jnp.uint8) for o in outs)))
    return masks, inv_keep


def fused_sga_block_train_prng(x, kq, vq, v_mask, q_mask, seed, w, *,
                               num_heads: int, group: int = 2,
                               rate: float = 0.1,
                               bf16_saves: bool = False,
                               diag_att: bool = None,
                               att_saves: bool = False):
    """fused_sga_block_train with in-kernel PRNG dropout (TPU only).

    seed: int32 [1] array, distinct per (step, layer)."""
    B, Lv, _ = x.shape
    Lq = kq.shape[2]
    G = max(1, group)
    while B % G:
        G -= 1
    vpad = _flat_pad(v_mask, B, G, Lv)
    qpad = _flat_pad(q_mask, B, G, Lq)
    f = make_sga_block_train_prng(num_heads, G, rate,
                                  bf16_saves=bf16_saves,
                                  diag_att=diag_att,
                                  att_saves=att_saves)
    return f(x, kq, vq, vpad, qpad, seed, w)
