"""Fused SGA decoder-block megakernel (Pallas TPU).

The serving ablation (docs/PERFORMANCE.md) shows the 6 SGA blocks are ~97%
of MCAN serving time, and round-2 measurements isolated the remaining
inefficiency to HBM round-trips of the [B, 60, 512] image stream between
the block's sub-ops (self-att -> epilogue -> cross-att -> epilogue -> FFN
-> epilogue) plus per-op dispatch. This kernel runs the ENTIRE reference
SGA block (core/model/mca.py:134-164)

    v = LN1(v + merge1(self_att(v)))
    v = LN2(v + merge2(cross_att(q=v, kv=question)))
    v = LN3(v + FFN(v))

in ONE kernel launch: grid over G-sample groups, the image stream and all
intermediates stay in VMEM for the whole block, every weight matrix is
VMEM-resident across the grid (~7 MB bf16 at MCAN-small).

Layout trick: attention is computed per head with NO lane slicing — the
q/k/v/merge projections are pre-stacked head-major ([H, D, Dh] / [H, Dh, D])
so each head's weights are a leading-dim index (free on TPU), and the merge
is accumulated as sum_h(att_out_h @ W_merge[h]), which avoids re-packing
heads into lanes. Samples are packed G-per-matmul with a block-diagonal
mask folded into the softmax (same scheme as
ops/masked_attention.masked_attention_pallas_packed).

Cross-attention keys/values over the (layer-fixed) encoder output are
pre-projected OUTSIDE the kernel ([B, H, Lq, Dh]) — they are tiny and
shared math with the unfused path.
"""

from __future__ import annotations

import functools
from typing import Any, Dict

import jax
import jax.numpy as jnp

from mcan_vqa_tpu.ops.diag_attn import diag_pad_add, diag_sdpa, use_diag

_NEG_INF = -1e9


def _compiler_params(interpret: bool):
    """Raise the scoped-VMEM cap above the 16 MB default: v5e physical
    VMEM is far larger (measured: >16.2 MB compiles fine), which admits
    MCAN-large block weights (~28.6 MB bf16) and the all-layer decoder
    (~42 MB at MCAN-small)."""
    if interpret:
        return None
    from jax.experimental.pallas import tpu as pltpu
    return pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024)


def prepare_sga_block_params(p: Dict[str, Any], num_heads: int) -> Dict[str, Any]:
    """Re-layout one decoder block's params for the megakernel.

    p: the standard param tree of models.mca.SGA (serving/backbone dec_i).
    Kernels are stacked head-major; biases likewise. FFN/LN stay as-is.
    """
    def head_cols(kernel):   # [D, D] -> [H, D, Dh]
        D = kernel.shape[0]
        return jnp.transpose(
            kernel.reshape(D, num_heads, D // num_heads), (1, 0, 2))

    def head_rows(kernel):   # [D, D] -> [H, Dh, D]
        D = kernel.shape[1]
        return kernel.reshape(num_heads, kernel.shape[0] // num_heads, D)

    def head_bias(b):        # [D] -> [H, Dh]
        return b.reshape(num_heads, -1)

    m1, m2 = p["mhatt1"], p["mhatt2"]
    mlp = p["ffn"]["mlp"]
    return {
        # fused-projection layout (variant 2: one [D,3D] matmul per block,
        # per-head lane slices inside the kernel)
        "wqkv1": jnp.concatenate([m1["linear_q"]["kernel"],
                                  m1["linear_k"]["kernel"],
                                  m1["linear_v"]["kernel"]], axis=1),
        "bqkv1": jnp.concatenate([m1["linear_q"]["bias"],
                                  m1["linear_k"]["bias"],
                                  m1["linear_v"]["bias"]]),
        "wm1_full": m1["linear_merge"]["kernel"],
        "wq2_full": m2["linear_q"]["kernel"],
        "bq2_full": m2["linear_q"]["bias"],
        "wm2_full": m2["linear_merge"]["kernel"],
        "wq1": head_cols(m1["linear_q"]["kernel"]),
        "wk1": head_cols(m1["linear_k"]["kernel"]),
        "wv1": head_cols(m1["linear_v"]["kernel"]),
        "bq1": head_bias(m1["linear_q"]["bias"]),
        "bk1": head_bias(m1["linear_k"]["bias"]),
        "bv1": head_bias(m1["linear_v"]["bias"]),
        "wm1": head_rows(m1["linear_merge"]["kernel"]),
        "bm1": m1["linear_merge"]["bias"],
        "ln1_s": p["norm1"]["scale"], "ln1_b": p["norm1"]["bias"],
        "wq2": head_cols(m2["linear_q"]["kernel"]),
        "bq2": head_bias(m2["linear_q"]["bias"]),
        "wm2": head_rows(m2["linear_merge"]["kernel"]),
        "bm2": m2["linear_merge"]["bias"],
        "ln2_s": p["norm2"]["scale"], "ln2_b": p["norm2"]["bias"],
        "w1": mlp["FCLayer_0"]["Dense_0"]["kernel"],
        "b1": mlp["FCLayer_0"]["Dense_0"]["bias"],
        "w2": mlp["Dense_0"]["kernel"],
        "b2": mlp["Dense_0"]["bias"],
        "ln3_s": p["norm3"]["scale"], "ln3_b": p["norm3"]["bias"],
    }


def prepare_sa_block_params(p: Dict[str, Any]) -> Dict[str, Any]:
    """Re-layout one ENCODER block's params (models.mca.SA: self-att + FFN,
    reference core/model/mca.py:105-127) for the fused SA block kernel."""
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


def _choose_group(B: int, group: int, auto: int = 1) -> int:
    """Effective packing group for a compiled batch: an explicit
    group > 0 wins, otherwise ``auto`` (the caller's default policy —
    1 for the SGA wrappers, ~128 sequence rows for the SA wrappers);
    always reduced to divide the batch. One implementation: five
    wrappers previously each carried their own divisor loop."""
    g = group if group > 0 else max(1, auto)
    while B % g:
        g -= 1
    return g


def _ln(r, scale, bias):
    d = r.shape[-1]
    mean = jnp.mean(r, axis=-1, keepdims=True)
    c = r - mean
    var = jnp.sum(c * c, axis=-1, keepdims=True) / (d - 1)
    return scale * c / (jnp.sqrt(var) + 1e-6) + bias


def _sga_kernel(v_ref, kq_ref, vq_ref, vpad_ref, qpad_ref,
                wq1_ref, wk1_ref, wv1_ref, bq1_ref, bk1_ref, bv1_ref,
                wm1_ref, bm1_ref, ln1s_ref, ln1b_ref,
                wq2_ref, bq2_ref, wm2_ref, bm2_ref, ln2s_ref, ln2b_ref,
                w1_ref, b1_ref, w2_ref, b2_ref, ln3s_ref, ln3b_ref,
                o_ref, *, heads: int, group: int, scale: float):
    G = group
    Lv, D = v_ref.shape[1], v_ref.shape[2]
    Lq = kq_ref.shape[2]
    M = G * Lv
    N = G * Lq

    # the stream block may arrive bf16 (half the DMA); math stays f32
    x = v_ref[:].reshape(M, D).astype(jnp.float32)

    # block-diagonal sample masks (rows: image regions; cols: keys)
    diag = use_diag(G, Lv)
    vq_off = (jax.lax.broadcasted_iota(jnp.int32, (M, N), 0) // Lv
              != jax.lax.broadcasted_iota(jnp.int32, (M, N), 1) // Lq)
    vpad = vpad_ref[0].astype(jnp.float32)          # [1, M]
    qpad = qpad_ref[0].astype(jnp.float32)          # [1, N]
    cross_mask = (vq_off.astype(jnp.float32) + qpad) * _NEG_INF
    if diag:
        pad_add = diag_pad_add(vpad, G, Lv)
    else:
        vv_off = (jax.lax.broadcasted_iota(jnp.int32, (M, M), 0) // Lv
                  != jax.lax.broadcasted_iota(jnp.int32, (M, M), 1) // Lv)
        self_mask = (vv_off.astype(jnp.float32) + vpad) * _NEG_INF

    def attend(xq, h, wq, bq, kh, vh, mask_add):
        """One head: project queries from xq, attend to (kh, vh)."""
        qh = jnp.dot(xq, wq[h].astype(jnp.bfloat16),
                     preferred_element_type=jnp.float32) + bq[h]
        if mask_add is None:        # block-diagonal self-attention
            return diag_sdpa(qh, kh, vh, pad_add, G, Lv, scale)
        s = jax.lax.dot_general(
            qh.astype(jnp.bfloat16), kh,
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32) * scale
        s = s + mask_add
        m = jnp.max(s, axis=-1, keepdims=True)
        e = jnp.exp(s - m)
        att = (e / jnp.sum(e, axis=-1, keepdims=True)).astype(jnp.bfloat16)
        return jnp.dot(att, vh, preferred_element_type=jnp.float32)

    # ---- self-attention + merge + LN1 ----
    xb = x.astype(jnp.bfloat16)
    wq1, wk1, wv1 = wq1_ref[:], wk1_ref[:], wv1_ref[:]
    bq1, bk1, bv1 = bq1_ref[:], bk1_ref[:], bv1_ref[:]
    wm1 = wm1_ref[:]
    y = jnp.zeros((M, D), jnp.float32)
    for h in range(heads):
        kh = (jnp.dot(xb, wk1[h].astype(jnp.bfloat16),
                      preferred_element_type=jnp.float32)
              + bk1[h]).astype(jnp.bfloat16)
        vh = (jnp.dot(xb, wv1[h].astype(jnp.bfloat16),
                      preferred_element_type=jnp.float32)
              + bv1[h]).astype(jnp.bfloat16)
        oh = attend(xb, h, wq1, bq1, kh, vh, None if diag else self_mask)
        y += jnp.dot(oh.astype(jnp.bfloat16), wm1[h].astype(jnp.bfloat16),
                     preferred_element_type=jnp.float32)
    v1 = _ln(x + y + bm1_ref[:], ln1s_ref[:], ln1b_ref[:])

    # ---- cross-attention (keys/values pre-projected) + merge + LN2 ----
    v1b = v1.astype(jnp.bfloat16)
    wq2, bq2, wm2 = wq2_ref[:], bq2_ref[:], wm2_ref[:]
    y = jnp.zeros((M, D), jnp.float32)
    for h in range(heads):
        kh = kq_ref[:, h].reshape(N, -1).astype(jnp.bfloat16)
        vh = vq_ref[:, h].reshape(N, -1).astype(jnp.bfloat16)
        oh = attend(v1b, h, wq2, bq2, kh, vh, cross_mask)
        y += jnp.dot(oh.astype(jnp.bfloat16), wm2[h].astype(jnp.bfloat16),
                     preferred_element_type=jnp.float32)
    v2 = _ln(v1 + y + bm2_ref[:], ln2s_ref[:], ln2b_ref[:])

    # ---- FFN + LN3 ----
    h1 = jnp.dot(v2.astype(jnp.bfloat16), w1_ref[:].astype(jnp.bfloat16),
                 preferred_element_type=jnp.float32) + b1_ref[:]
    h1 = jnp.maximum(h1, 0.0)
    y = jnp.dot(h1.astype(jnp.bfloat16), w2_ref[:].astype(jnp.bfloat16),
                preferred_element_type=jnp.float32) + b2_ref[:]
    v3 = _ln(v2 + y, ln3s_ref[:], ln3b_ref[:])

    o_ref[:] = v3.reshape(G, Lv, D).astype(o_ref.dtype)


def _sga_kernel_fusedproj(v_ref, kq_ref, vq_ref, vpad_ref, qpad_ref,
                          wqkv_ref, bqkv_ref, wm1_ref, bm1_ref,
                          ln1s_ref, ln1b_ref,
                          wq2_ref, bq2_ref, wm2_ref, bm2_ref,
                          ln2s_ref, ln2b_ref,
                          w1_ref, b1_ref, w2_ref, b2_ref,
                          ln3s_ref, ln3b_ref,
                          o_ref, *, heads: int, group: int, scale: float):
    """Variant 2: full-lane fused projections ([D,3D] / [D,D] matmuls) with
    per-head LANE slices for the score/AV matmuls and a lane concat before
    the merge. ~27 matmuls per grid step vs ~48 for the head-major variant —
    trades relayout cost for matmul-issue count."""
    G = group
    Lv, D = v_ref.shape[1], v_ref.shape[2]
    Lq = kq_ref.shape[2]
    Dh = D // heads
    M, N = G * Lv, G * Lq

    # the stream block may arrive bf16 (half the DMA); math stays f32
    x = v_ref[:].reshape(M, D).astype(jnp.float32)

    diag = use_diag(G, Lv)
    vq_off = (jax.lax.broadcasted_iota(jnp.int32, (M, N), 0) // Lv
              != jax.lax.broadcasted_iota(jnp.int32, (M, N), 1) // Lq)
    cross_mask = (vq_off.astype(jnp.float32)
                  + qpad_ref[0].astype(jnp.float32)) * _NEG_INF
    if diag:
        pad_add = diag_pad_add(vpad_ref[0].astype(jnp.float32), G, Lv)
    else:
        vv_off = (jax.lax.broadcasted_iota(jnp.int32, (M, M), 0) // Lv
                  != jax.lax.broadcasted_iota(jnp.int32, (M, M), 1) // Lv)
        self_mask = (vv_off.astype(jnp.float32)
                     + vpad_ref[0].astype(jnp.float32)) * _NEG_INF

    def sdpa(qh, kh, vh, mask_add):
        s = jax.lax.dot_general(
            qh.astype(jnp.bfloat16), kh,
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32) * scale
        s = s + mask_add
        m = jnp.max(s, axis=-1, keepdims=True)
        e = jnp.exp(s - m)
        att = (e / jnp.sum(e, axis=-1, keepdims=True)).astype(jnp.bfloat16)
        return jnp.dot(att, vh, preferred_element_type=jnp.float32)

    # ---- self-attention: ONE qkv matmul, lane-sliced heads ----
    qkv = jnp.dot(x.astype(jnp.bfloat16), wqkv_ref[:].astype(jnp.bfloat16),
                  preferred_element_type=jnp.float32) + bqkv_ref[:]
    ohs = []
    for h in range(heads):
        qh = qkv[:, h * Dh:(h + 1) * Dh]
        kh = qkv[:, D + h * Dh:D + (h + 1) * Dh].astype(jnp.bfloat16)
        vh = qkv[:, 2 * D + h * Dh:2 * D + (h + 1) * Dh].astype(jnp.bfloat16)
        ohs.append(diag_sdpa(qh, kh, vh, pad_add, G, Lv, scale)
                   if diag else sdpa(qh, kh, vh, self_mask))
    atted = jnp.concatenate(ohs, axis=1)
    y = jnp.dot(atted.astype(jnp.bfloat16), wm1_ref[:].astype(jnp.bfloat16),
                preferred_element_type=jnp.float32)
    v1 = _ln(x + y + bm1_ref[:], ln1s_ref[:], ln1b_ref[:])

    # ---- cross-attention ----
    qx = jnp.dot(v1.astype(jnp.bfloat16), wq2_ref[:].astype(jnp.bfloat16),
                 preferred_element_type=jnp.float32) + bq2_ref[:]
    ohs = []
    for h in range(heads):
        kh = kq_ref[:, h].reshape(N, Dh).astype(jnp.bfloat16)
        vh = vq_ref[:, h].reshape(N, Dh).astype(jnp.bfloat16)
        ohs.append(sdpa(qx[:, h * Dh:(h + 1) * Dh], kh, vh, cross_mask))
    atted = jnp.concatenate(ohs, axis=1)
    y = jnp.dot(atted.astype(jnp.bfloat16), wm2_ref[:].astype(jnp.bfloat16),
                preferred_element_type=jnp.float32)
    v2 = _ln(v1 + y + bm2_ref[:], ln2s_ref[:], ln2b_ref[:])

    # ---- FFN + LN3 ----
    h1 = jnp.dot(v2.astype(jnp.bfloat16), w1_ref[:].astype(jnp.bfloat16),
                 preferred_element_type=jnp.float32) + b1_ref[:]
    h1 = jnp.maximum(h1, 0.0)
    y = jnp.dot(h1.astype(jnp.bfloat16), w2_ref[:].astype(jnp.bfloat16),
                preferred_element_type=jnp.float32) + b2_ref[:]
    v3 = _ln(v2 + y, ln3s_ref[:], ln3b_ref[:])

    o_ref[:] = v3.reshape(G, Lv, D).astype(o_ref.dtype)


@functools.partial(jax.jit,
                   static_argnames=("num_heads", "group", "interpret",
                                    "fused_proj"))
def fused_sga_block(v, kq, vq, v_mask, q_mask, wp: Dict[str, Any], *,
                    num_heads: int, group: int = 2,
                    interpret: bool = False, fused_proj: bool = False):
    """Run one whole SGA block. v [B, Lv, D]; kq/vq [B, H, Lq, Dh]
    (pre-projected cross keys/values); v_mask/q_mask bool [B, 1, 1, L];
    wp from prepare_sga_block_params. Returns [B, Lv, D] in v's dtype (pass
    a bf16 stream to halve the block DMA; LN math is f32 in-kernel)."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    B, Lv, D = v.shape
    Lq = kq.shape[2]
    Dh = D // num_heads
    H = num_heads
    scale = 1.0 / (Dh ** 0.5)
    G = _choose_group(B, group)

    def flat_pad(mask, L):
        if mask is None:
            return jnp.zeros((B // G, 1, G * L), jnp.int8)
        return mask[:, 0, 0].astype(jnp.int8).reshape(B // G, 1, G * L)

    vpad = flat_pad(v_mask, Lv)
    qpad = flat_pad(q_mask, Lq)

    rep = lambda shape: pl.BlockSpec(shape, lambda b: (0,) * len(shape),
                                     memory_space=pltpu.VMEM)
    F = wp["w1"].shape[1]

    if fused_proj:
        out = pl.pallas_call(
            functools.partial(_sga_kernel_fusedproj, heads=H, group=G,
                              scale=scale),
            grid=(B // G,),
            in_specs=[
                pl.BlockSpec((G, Lv, D), lambda b: (b, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((G, H, Lq, Dh), lambda b: (b, 0, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((G, H, Lq, Dh), lambda b: (b, 0, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 1, G * Lv), lambda b: (b, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 1, G * Lq), lambda b: (b, 0, 0),
                             memory_space=pltpu.VMEM),
                rep((D, 3 * D)), rep((3 * D,)),
                rep((D, D)), rep((D,)), rep((D,)), rep((D,)),   # m1 + ln1
                rep((D, D)), rep((D,)),                         # q2
                rep((D, D)), rep((D,)), rep((D,)), rep((D,)),   # m2 + ln2
                rep((D, F)), rep((F,)), rep((F, D)), rep((D,)),
                rep((D,)), rep((D,)),
            ],
            out_specs=pl.BlockSpec((G, Lv, D), lambda b: (b, 0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((B, Lv, D), v.dtype),
            compiler_params=_compiler_params(interpret),
            interpret=interpret,
        )(v, kq, vq, vpad, qpad,
          wp["wqkv1"], wp["bqkv1"], wp["wm1_full"], wp["bm1"],
          wp["ln1_s"], wp["ln1_b"],
          wp["wq2_full"], wp["bq2_full"], wp["wm2_full"], wp["bm2"],
          wp["ln2_s"], wp["ln2_b"],
          wp["w1"], wp["b1"], wp["w2"], wp["b2"],
          wp["ln3_s"], wp["ln3_b"])
        return out

    out = pl.pallas_call(
        functools.partial(_sga_kernel, heads=H, group=G, scale=scale),
        grid=(B // G,),
        in_specs=[
            pl.BlockSpec((G, Lv, D), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((G, H, Lq, Dh), lambda b: (b, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((G, H, Lq, Dh), lambda b: (b, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, G * Lv), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, G * Lq), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            rep((H, D, Dh)), rep((H, D, Dh)), rep((H, D, Dh)),   # wq/k/v1
            rep((H, Dh)), rep((H, Dh)), rep((H, Dh)),            # bq/k/v1
            rep((H, Dh, D)), rep((D,)), rep((D,)), rep((D,)),    # wm1,bm1,ln1
            rep((H, D, Dh)), rep((H, Dh)),                       # wq2, bq2
            rep((H, Dh, D)), rep((D,)), rep((D,)), rep((D,)),    # wm2,bm2,ln2
            rep((D, F)), rep((F,)), rep((F, D)), rep((D,)),      # ffn
            rep((D,)), rep((D,)),                                # ln3
        ],
        out_specs=pl.BlockSpec((G, Lv, D), lambda b: (b, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, Lv, D), v.dtype),
        compiler_params=_compiler_params(interpret),
        interpret=interpret,
    )(v, kq, vq, vpad, qpad,
      wp["wq1"], wp["wk1"], wp["wv1"], wp["bq1"], wp["bk1"], wp["bv1"],
      wp["wm1"], wp["bm1"], wp["ln1_s"], wp["ln1_b"],
      wp["wq2"], wp["bq2"], wp["wm2"], wp["bm2"], wp["ln2_s"], wp["ln2_b"],
      wp["w1"], wp["b1"], wp["w2"], wp["b2"], wp["ln3_s"], wp["ln3_b"])
    return out


# ---------------------------------------------------------------------------
# All-layer fused decoder: every SGA block in ONE kernel launch
# ---------------------------------------------------------------------------

def decoder_vmem_ok(D: int, F: int, num_layers: int) -> bool:
    """True when ALL decoder layers' weights (incl. the cross k/v
    projections, which the all-layer kernel computes in-kernel) fit
    VMEM-resident in bf16. MCAN-small: 6*(8*512^2+2*512*2048)*2 = 50 MB —
    yes under the raised cap (v5e physical VMEM ~128 MB); MCAN-large:
    201 MB — no (falls back to the per-block megakernel)."""
    return num_layers * (8 * D * D + 2 * D * F) * 2 <= 64 * 1024 * 1024


def prepare_sga_decoder_params(bb: Dict[str, Any], num_layers: int) -> Dict[str, Any]:
    """Stack every decoder block's fused-projection layout along a leading
    layer axis for the all-layer kernel. Unlike prepare_sga_block_params,
    the cross k/v weights are included ([D, 2D] fused): the kernel projects
    keys/values from the encoder output itself, so the external _cross_kv
    launches disappear too."""
    def stack(fn):
        return jnp.stack([fn(bb[f"dec_{i}"]) for i in range(num_layers)])

    return {
        "wqkv1": stack(lambda p: jnp.concatenate(
            [p["mhatt1"]["linear_q"]["kernel"],
             p["mhatt1"]["linear_k"]["kernel"],
             p["mhatt1"]["linear_v"]["kernel"]], axis=1)),
        "bqkv1": stack(lambda p: jnp.concatenate(
            [p["mhatt1"]["linear_q"]["bias"],
             p["mhatt1"]["linear_k"]["bias"],
             p["mhatt1"]["linear_v"]["bias"]])),
        "wm1": stack(lambda p: p["mhatt1"]["linear_merge"]["kernel"]),
        "bm1": stack(lambda p: p["mhatt1"]["linear_merge"]["bias"]),
        "ln1_s": stack(lambda p: p["norm1"]["scale"]),
        "ln1_b": stack(lambda p: p["norm1"]["bias"]),
        "wkv2": stack(lambda p: jnp.concatenate(
            [p["mhatt2"]["linear_k"]["kernel"],
             p["mhatt2"]["linear_v"]["kernel"]], axis=1)),
        "bkv2": stack(lambda p: jnp.concatenate(
            [p["mhatt2"]["linear_k"]["bias"],
             p["mhatt2"]["linear_v"]["bias"]])),
        "wq2": stack(lambda p: p["mhatt2"]["linear_q"]["kernel"]),
        "bq2": stack(lambda p: p["mhatt2"]["linear_q"]["bias"]),
        "wm2": stack(lambda p: p["mhatt2"]["linear_merge"]["kernel"]),
        "bm2": stack(lambda p: p["mhatt2"]["linear_merge"]["bias"]),
        "ln2_s": stack(lambda p: p["norm2"]["scale"]),
        "ln2_b": stack(lambda p: p["norm2"]["bias"]),
        "w1": stack(lambda p: p["ffn"]["mlp"]["FCLayer_0"]["Dense_0"]["kernel"]),
        "b1": stack(lambda p: p["ffn"]["mlp"]["FCLayer_0"]["Dense_0"]["bias"]),
        "w2": stack(lambda p: p["ffn"]["mlp"]["Dense_0"]["kernel"]),
        "b2": stack(lambda p: p["ffn"]["mlp"]["Dense_0"]["bias"]),
        "ln3_s": stack(lambda p: p["norm3"]["scale"]),
        "ln3_b": stack(lambda p: p["norm3"]["bias"]),
    }


def _sga_decoder_kernel(v_ref, q_ref, vpad_ref, qpad_ref,
                        wqkv1_ref, bqkv1_ref, wm1_ref, bm1_ref,
                        ln1s_ref, ln1b_ref,
                        wkv2_ref, bkv2_ref, wq2_ref, bq2_ref,
                        wm2_ref, bm2_ref, ln2s_ref, ln2b_ref,
                        w1_ref, b1_ref, w2_ref, b2_ref,
                        ln3s_ref, ln3b_ref,
                        o_ref, *, heads: int, group: int, layers: int,
                        scale: float):
    """All decoder layers for one G-sample group; the image stream and
    every intermediate stay in VMEM for the whole decoder. Reference
    semantics: /root/reference/core/model/mca.py:171-186 (all SGA layers
    attend to the final encoder output)."""
    G = group
    Lv, D = v_ref.shape[1], v_ref.shape[2]
    Lq = q_ref.shape[1]
    Dh = D // heads
    M, N = G * Lv, G * Lq

    x = v_ref[:].reshape(M, D).astype(jnp.float32)
    qx = q_ref[:].reshape(N, D).astype(jnp.bfloat16)

    diag = use_diag(G, Lv)
    vq_off = (jax.lax.broadcasted_iota(jnp.int32, (M, N), 0) // Lv
              != jax.lax.broadcasted_iota(jnp.int32, (M, N), 1) // Lq)
    cross_mask = (vq_off.astype(jnp.float32)
                  + qpad_ref[0].astype(jnp.float32)) * _NEG_INF
    if diag:
        pad_add = diag_pad_add(vpad_ref[0].astype(jnp.float32), G, Lv)
    else:
        vv_off = (jax.lax.broadcasted_iota(jnp.int32, (M, M), 0) // Lv
                  != jax.lax.broadcasted_iota(jnp.int32, (M, M), 1) // Lv)
        self_mask = (vv_off.astype(jnp.float32)
                     + vpad_ref[0].astype(jnp.float32)) * _NEG_INF

    def sdpa(qh, kh, vh, mask_add):
        s = jax.lax.dot_general(
            qh.astype(jnp.bfloat16), kh,
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32) * scale
        s = s + mask_add
        m = jnp.max(s, axis=-1, keepdims=True)
        e = jnp.exp(s - m)
        att = (e / jnp.sum(e, axis=-1, keepdims=True)).astype(jnp.bfloat16)
        return jnp.dot(att, vh, preferred_element_type=jnp.float32)

    for l in range(layers):
        # ---- self-attention: ONE qkv matmul, lane-sliced heads ----
        qkv = jnp.dot(x.astype(jnp.bfloat16),
                      wqkv1_ref[l].astype(jnp.bfloat16),
                      preferred_element_type=jnp.float32) + bqkv1_ref[l]
        ohs = []
        for h in range(heads):
            qh = qkv[:, h * Dh:(h + 1) * Dh]
            kh = qkv[:, D + h * Dh:D + (h + 1) * Dh].astype(jnp.bfloat16)
            vh = qkv[:, 2 * D + h * Dh:
                     2 * D + (h + 1) * Dh].astype(jnp.bfloat16)
            ohs.append(diag_sdpa(qh, kh, vh, pad_add, G, Lv, scale)
                       if diag else sdpa(qh, kh, vh, self_mask))
        atted = jnp.concatenate(ohs, axis=1)
        y = jnp.dot(atted.astype(jnp.bfloat16),
                    wm1_ref[l].astype(jnp.bfloat16),
                    preferred_element_type=jnp.float32)
        v1 = _ln(x + y + bm1_ref[l], ln1s_ref[l], ln1b_ref[l])

        # ---- cross-attention: k/v projected in-kernel from encoder out ----
        kv = jnp.dot(qx, wkv2_ref[l].astype(jnp.bfloat16),
                     preferred_element_type=jnp.float32) + bkv2_ref[l]
        qp = jnp.dot(v1.astype(jnp.bfloat16),
                     wq2_ref[l].astype(jnp.bfloat16),
                     preferred_element_type=jnp.float32) + bq2_ref[l]
        ohs = []
        for h in range(heads):
            kh = kv[:, h * Dh:(h + 1) * Dh].astype(jnp.bfloat16)
            vh = kv[:, D + h * Dh:D + (h + 1) * Dh].astype(jnp.bfloat16)
            ohs.append(sdpa(qp[:, h * Dh:(h + 1) * Dh], kh, vh, cross_mask))
        atted = jnp.concatenate(ohs, axis=1)
        y = jnp.dot(atted.astype(jnp.bfloat16),
                    wm2_ref[l].astype(jnp.bfloat16),
                    preferred_element_type=jnp.float32)
        v2 = _ln(v1 + y + bm2_ref[l], ln2s_ref[l], ln2b_ref[l])

        # ---- FFN + LN3 ----
        h1 = jnp.dot(v2.astype(jnp.bfloat16), w1_ref[l].astype(jnp.bfloat16),
                     preferred_element_type=jnp.float32) + b1_ref[l]
        h1 = jnp.maximum(h1, 0.0)
        y = jnp.dot(h1.astype(jnp.bfloat16), w2_ref[l].astype(jnp.bfloat16),
                    preferred_element_type=jnp.float32) + b2_ref[l]
        x = _ln(v2 + y, ln3s_ref[l], ln3b_ref[l])

    o_ref[:] = x.reshape(G, Lv, D).astype(o_ref.dtype)


@functools.partial(jax.jit,
                   static_argnames=("num_heads", "group", "interpret"))
def fused_sga_decoder(v, q, v_mask, q_mask, wp: Dict[str, Any], *,
                      num_heads: int, group: int = 4,
                      interpret: bool = False):
    """Run the ENTIRE decoder (all SGA blocks) in one kernel launch.
    v [B, Lv, D] image stream; q [B, Lq, D] final encoder output;
    wp from prepare_sga_decoder_params (stacked along layers). Returns
    [B, Lv, D] in v's dtype."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    B, Lv, D = v.shape
    Lq = q.shape[1]
    L = wp["w1"].shape[0]
    F = wp["w1"].shape[2]
    H = num_heads
    scale = 1.0 / ((D // H) ** 0.5)
    G = _choose_group(B, group)

    def flat_pad(mask, Lx):
        if mask is None:
            return jnp.zeros((B // G, 1, G * Lx), jnp.int8)
        return mask[:, 0, 0].astype(jnp.int8).reshape(B // G, 1, G * Lx)

    vpad = flat_pad(v_mask, Lv)
    qpad = flat_pad(q_mask, Lq)

    rep = lambda shape: pl.BlockSpec(shape, lambda b: (0,) * len(shape),
                                     memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        functools.partial(_sga_decoder_kernel, heads=H, group=G,
                          layers=L, scale=scale),
        grid=(B // G,),
        in_specs=[
            pl.BlockSpec((G, Lv, D), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((G, Lq, D), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, G * Lv), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, G * Lq), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            rep((L, D, 3 * D)), rep((L, 3 * D)),
            rep((L, D, D)), rep((L, D)), rep((L, D)), rep((L, D)),
            rep((L, D, 2 * D)), rep((L, 2 * D)),
            rep((L, D, D)), rep((L, D)),
            rep((L, D, D)), rep((L, D)), rep((L, D)), rep((L, D)),
            rep((L, D, F)), rep((L, F)), rep((L, F, D)), rep((L, D)),
            rep((L, D)), rep((L, D)),
        ],
        out_specs=pl.BlockSpec((G, Lv, D), lambda b: (b, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, Lv, D), v.dtype),
        compiler_params=_compiler_params(interpret),
        interpret=interpret,
    )(v, q, vpad, qpad,
      wp["wqkv1"], wp["bqkv1"], wp["wm1"], wp["bm1"],
      wp["ln1_s"], wp["ln1_b"],
      wp["wkv2"], wp["bkv2"], wp["wq2"], wp["bq2"],
      wp["wm2"], wp["bm2"], wp["ln2_s"], wp["ln2_b"],
      wp["w1"], wp["b1"], wp["w2"], wp["b2"],
      wp["ln3_s"], wp["ln3_b"])
    return out


# ---------------------------------------------------------------------------
# All-layer fused decoder, variant B: cross k/v pre-projected OUTSIDE
# ---------------------------------------------------------------------------

def _sga_decoder_kernel_extkv(v_ref, kq_ref, vq_ref, vpad_ref, qpad_ref,
                              wqkv1_ref, bqkv1_ref, wm1_ref, bm1_ref,
                              ln1s_ref, ln1b_ref,
                              wq2_ref, bq2_ref,
                              wm2_ref, bm2_ref, ln2s_ref, ln2b_ref,
                              w1_ref, b1_ref, w2_ref, b2_ref,
                              ln3s_ref, ln3b_ref,
                              o_ref, *, heads: int, group: int, layers: int,
                              scale: float):
    """All decoder layers in one launch, but with the cross keys/values
    pre-projected OUTSIDE the kernel ([B, L*H, Lq, Dh], layer-major) —
    the external projections run as full-batch [B*Lq, D] x [D, 2D]
    matmuls (good MXU fill) where the in-kernel variant projected
    [G*Lq, D] slivers per grid step. Isolates the kv-projection
    component of the all-layer kernel's measured loss
    (docs/PERFORMANCE.md round-2 continuation)."""
    G = group
    Lv, D = v_ref.shape[1], v_ref.shape[2]
    Lq = kq_ref.shape[2]
    Dh = D // heads
    M, N = G * Lv, G * Lq

    x = v_ref[:].reshape(M, D).astype(jnp.float32)

    diag = use_diag(G, Lv)
    vq_off = (jax.lax.broadcasted_iota(jnp.int32, (M, N), 0) // Lv
              != jax.lax.broadcasted_iota(jnp.int32, (M, N), 1) // Lq)
    cross_mask = (vq_off.astype(jnp.float32)
                  + qpad_ref[0].astype(jnp.float32)) * _NEG_INF
    if diag:
        pad_add = diag_pad_add(vpad_ref[0].astype(jnp.float32), G, Lv)
    else:
        vv_off = (jax.lax.broadcasted_iota(jnp.int32, (M, M), 0) // Lv
                  != jax.lax.broadcasted_iota(jnp.int32, (M, M), 1) // Lv)
        self_mask = (vv_off.astype(jnp.float32)
                     + vpad_ref[0].astype(jnp.float32)) * _NEG_INF

    def sdpa(qh, kh, vh, mask_add):
        s = jax.lax.dot_general(
            qh.astype(jnp.bfloat16), kh,
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32) * scale
        s = s + mask_add
        m = jnp.max(s, axis=-1, keepdims=True)
        e = jnp.exp(s - m)
        att = (e / jnp.sum(e, axis=-1, keepdims=True)).astype(jnp.bfloat16)
        return jnp.dot(att, vh, preferred_element_type=jnp.float32)

    for l in range(layers):
        # ---- self-attention: ONE qkv matmul, lane-sliced heads ----
        qkv = jnp.dot(x.astype(jnp.bfloat16),
                      wqkv1_ref[l].astype(jnp.bfloat16),
                      preferred_element_type=jnp.float32) + bqkv1_ref[l]
        ohs = []
        for h in range(heads):
            qh = qkv[:, h * Dh:(h + 1) * Dh]
            kh = qkv[:, D + h * Dh:D + (h + 1) * Dh].astype(jnp.bfloat16)
            vh = qkv[:, 2 * D + h * Dh:
                     2 * D + (h + 1) * Dh].astype(jnp.bfloat16)
            ohs.append(diag_sdpa(qh, kh, vh, pad_add, G, Lv, scale)
                       if diag else sdpa(qh, kh, vh, self_mask))
        atted = jnp.concatenate(ohs, axis=1)
        y = jnp.dot(atted.astype(jnp.bfloat16),
                    wm1_ref[l].astype(jnp.bfloat16),
                    preferred_element_type=jnp.float32)
        v1 = _ln(x + y + bm1_ref[l], ln1s_ref[l], ln1b_ref[l])

        # ---- cross-attention: k/v read pre-projected, layer-major ----
        qp = jnp.dot(v1.astype(jnp.bfloat16),
                     wq2_ref[l].astype(jnp.bfloat16),
                     preferred_element_type=jnp.float32) + bq2_ref[l]
        ohs = []
        for h in range(heads):
            kh = kq_ref[:, l * heads + h].reshape(N, Dh).astype(jnp.bfloat16)
            vh = vq_ref[:, l * heads + h].reshape(N, Dh).astype(jnp.bfloat16)
            ohs.append(sdpa(qp[:, h * Dh:(h + 1) * Dh], kh, vh, cross_mask))
        atted = jnp.concatenate(ohs, axis=1)
        y = jnp.dot(atted.astype(jnp.bfloat16),
                    wm2_ref[l].astype(jnp.bfloat16),
                    preferred_element_type=jnp.float32)
        v2 = _ln(v1 + y + bm2_ref[l], ln2s_ref[l], ln2b_ref[l])

        # ---- FFN + LN3 ----
        h1 = jnp.dot(v2.astype(jnp.bfloat16), w1_ref[l].astype(jnp.bfloat16),
                     preferred_element_type=jnp.float32) + b1_ref[l]
        h1 = jnp.maximum(h1, 0.0)
        y = jnp.dot(h1.astype(jnp.bfloat16), w2_ref[l].astype(jnp.bfloat16),
                    preferred_element_type=jnp.float32) + b2_ref[l]
        x = _ln(v2 + y, ln3s_ref[l], ln3b_ref[l])

    o_ref[:] = x.reshape(G, Lv, D).astype(o_ref.dtype)


@functools.partial(jax.jit,
                   static_argnames=("num_heads", "group", "interpret"))
def fused_sga_decoder_extkv(v, kq, vq, v_mask, q_mask, wp: Dict[str, Any], *,
                            num_heads: int, group: int = 4,
                            interpret: bool = False):
    """All-layer fused decoder with EXTERNAL cross k/v projections.

    v [B, Lv, D] image stream; kq/vq [B, L*H, Lq, Dh] — every layer's
    pre-projected cross keys/values, layer-major (layer l, head h at
    index l*H + h); wp from prepare_sga_decoder_params (wkv2/bkv2 unused).
    Returns [B, Lv, D] in v's dtype."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    B, Lv, D = v.shape
    Lq = kq.shape[2]
    L = wp["w1"].shape[0]
    F = wp["w1"].shape[2]
    H = num_heads
    Dh = D // H
    scale = 1.0 / (Dh ** 0.5)
    G = _choose_group(B, group)

    def flat_pad(mask, Lx):
        if mask is None:
            return jnp.zeros((B // G, 1, G * Lx), jnp.int8)
        return mask[:, 0, 0].astype(jnp.int8).reshape(B // G, 1, G * Lx)

    vpad = flat_pad(v_mask, Lv)
    qpad = flat_pad(q_mask, Lq)

    rep = lambda shape: pl.BlockSpec(shape, lambda b: (0,) * len(shape),
                                     memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        functools.partial(_sga_decoder_kernel_extkv, heads=H, group=G,
                          layers=L, scale=scale),
        grid=(B // G,),
        in_specs=[
            pl.BlockSpec((G, Lv, D), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((G, L * H, Lq, Dh), lambda b: (b, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((G, L * H, Lq, Dh), lambda b: (b, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, G * Lv), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, G * Lq), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            rep((L, D, 3 * D)), rep((L, 3 * D)),
            rep((L, D, D)), rep((L, D)), rep((L, D)), rep((L, D)),
            rep((L, D, D)), rep((L, D)),
            rep((L, D, D)), rep((L, D)), rep((L, D)), rep((L, D)),
            rep((L, D, F)), rep((L, F)), rep((L, F, D)), rep((L, D)),
            rep((L, D)), rep((L, D)),
        ],
        out_specs=pl.BlockSpec((G, Lv, D), lambda b: (b, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, Lv, D), v.dtype),
        compiler_params=_compiler_params(interpret),
        interpret=interpret,
    )(v, kq, vq, vpad, qpad,
      wp["wqkv1"], wp["bqkv1"], wp["wm1"], wp["bm1"],
      wp["ln1_s"], wp["ln1_b"],
      wp["wq2"], wp["bq2"],
      wp["wm2"], wp["bm2"], wp["ln2_s"], wp["ln2_b"],
      wp["w1"], wp["b1"], wp["w2"], wp["b2"],
      wp["ln3_s"], wp["ln3_b"])
    return out


# ---------------------------------------------------------------------------
# All-layer fused SA encoder stack: every SA block in ONE kernel launch
# ---------------------------------------------------------------------------

def encoder_vmem_ok(D: int, F: int, num_layers: int) -> bool:
    """True when ALL encoder layers' weights fit VMEM-resident in bf16.
    MCAN-small: 6*(4*512^2+2*512*2048)*2 = 36 MB — yes; MCAN-large:
    144 MB — no (falls back to per-block fused_sa_block)."""
    return num_layers * (4 * D * D + 2 * D * F) * 2 <= 64 * 1024 * 1024


def prepare_sa_encoder_params(bb: Dict[str, Any], num_layers: int) -> Dict[str, Any]:
    """Stack every encoder block's fused-projection layout along a leading
    layer axis for the all-layer SA kernel."""
    def stack(fn):
        return jnp.stack([fn(bb[f"enc_{i}"]) for i in range(num_layers)])

    return {
        "wqkv": stack(lambda p: jnp.concatenate(
            [p["mhatt"]["linear_q"]["kernel"],
             p["mhatt"]["linear_k"]["kernel"],
             p["mhatt"]["linear_v"]["kernel"]], axis=1)),
        "bqkv": stack(lambda p: jnp.concatenate(
            [p["mhatt"]["linear_q"]["bias"],
             p["mhatt"]["linear_k"]["bias"],
             p["mhatt"]["linear_v"]["bias"]])),
        "wm": stack(lambda p: p["mhatt"]["linear_merge"]["kernel"]),
        "bm": stack(lambda p: p["mhatt"]["linear_merge"]["bias"]),
        "ln1_s": stack(lambda p: p["norm1"]["scale"]),
        "ln1_b": stack(lambda p: p["norm1"]["bias"]),
        "w1": stack(lambda p: p["ffn"]["mlp"]["FCLayer_0"]["Dense_0"]["kernel"]),
        "b1": stack(lambda p: p["ffn"]["mlp"]["FCLayer_0"]["Dense_0"]["bias"]),
        "w2": stack(lambda p: p["ffn"]["mlp"]["Dense_0"]["kernel"]),
        "b2": stack(lambda p: p["ffn"]["mlp"]["Dense_0"]["bias"]),
        "ln2_s": stack(lambda p: p["norm2"]["scale"]),
        "ln2_b": stack(lambda p: p["norm2"]["bias"]),
    }


def _sa_encoder_kernel(x_ref, pad_ref,
                       wqkv_ref, bqkv_ref, wm_ref, bm_ref,
                       ln1s_ref, ln1b_ref,
                       w1_ref, b1_ref, w2_ref, b2_ref,
                       ln2s_ref, ln2b_ref,
                       o_ref, *, heads: int, group: int, layers: int,
                       scale: float):
    """All SA encoder blocks (reference core/model/mca.py:171-178) for one
    G-sample group in one launch; the question stream stays in VMEM for
    the whole encoder. Built for the LATENCY path: at B=1 the per-block
    engine pays 6 launches on a [14, D] stream — launch overhead, not
    compute, dominates."""
    G = group
    Lq, D = x_ref.shape[1], x_ref.shape[2]
    Dh = D // heads
    M = G * Lq

    x = x_ref[:].reshape(M, D).astype(jnp.float32)

    diag = use_diag(G, Lq)   # off for 14-token questions, on for the
    if diag:                 # classifier's packed L=100 image streams
        pad_add = diag_pad_add(pad_ref[0].astype(jnp.float32), G, Lq)
    else:
        off = (jax.lax.broadcasted_iota(jnp.int32, (M, M), 0) // Lq
               != jax.lax.broadcasted_iota(jnp.int32, (M, M), 1) // Lq)
        mask_add = (off.astype(jnp.float32)
                    + pad_ref[0].astype(jnp.float32)) * _NEG_INF

    for l in range(layers):
        qkv = jnp.dot(x.astype(jnp.bfloat16),
                      wqkv_ref[l].astype(jnp.bfloat16),
                      preferred_element_type=jnp.float32) + bqkv_ref[l]
        ohs = []
        for h in range(heads):
            qh = qkv[:, h * Dh:(h + 1) * Dh].astype(jnp.bfloat16)
            kh = qkv[:, D + h * Dh:D + (h + 1) * Dh].astype(jnp.bfloat16)
            vh = qkv[:, 2 * D + h * Dh:
                     2 * D + (h + 1) * Dh].astype(jnp.bfloat16)
            if diag:
                ohs.append(diag_sdpa(qh, kh, vh, pad_add, G, Lq, scale))
                continue
            s = jax.lax.dot_general(
                qh, kh, dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32) * scale + mask_add
            m = jnp.max(s, axis=-1, keepdims=True)
            e = jnp.exp(s - m)
            att = (e / jnp.sum(e, axis=-1,
                               keepdims=True)).astype(jnp.bfloat16)
            ohs.append(jnp.dot(att, vh, preferred_element_type=jnp.float32))
        atted = jnp.concatenate(ohs, axis=1)
        y = jnp.dot(atted.astype(jnp.bfloat16),
                    wm_ref[l].astype(jnp.bfloat16),
                    preferred_element_type=jnp.float32)
        x1 = _ln(x + y + bm_ref[l], ln1s_ref[l], ln1b_ref[l])

        h1 = jnp.dot(x1.astype(jnp.bfloat16), w1_ref[l].astype(jnp.bfloat16),
                     preferred_element_type=jnp.float32) + b1_ref[l]
        h1 = jnp.maximum(h1, 0.0)
        y = jnp.dot(h1.astype(jnp.bfloat16), w2_ref[l].astype(jnp.bfloat16),
                    preferred_element_type=jnp.float32) + b2_ref[l]
        x = _ln(x1 + y, ln2s_ref[l], ln2b_ref[l])

    o_ref[:] = x.reshape(G, Lq, D).astype(o_ref.dtype)


@functools.partial(jax.jit,
                   static_argnames=("num_heads", "group", "interpret"))
def fused_sa_encoder(x, x_mask, wp: Dict[str, Any], *, num_heads: int,
                     group: int = 0, interpret: bool = False):
    """Run the ENTIRE SA encoder (all blocks) in one kernel launch.
    x [B, Lq, D]; wp from prepare_sa_encoder_params. group=0 picks the
    largest divisor of B with G*Lq <= 128. Returns [B, Lq, D] in x's
    dtype."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    B, Lq, D = x.shape
    L = wp["w1"].shape[0]
    F = wp["w1"].shape[2]
    H = num_heads
    scale = 1.0 / ((D // H) ** 0.5)
    G = _choose_group(B, group, auto=128 // Lq)

    if x_mask is None:
        pad = jnp.zeros((B // G, 1, G * Lq), jnp.int8)
    else:
        pad = x_mask[:, 0, 0].astype(jnp.int8).reshape(B // G, 1, G * Lq)

    rep = lambda shape: pl.BlockSpec(shape, lambda b: (0,) * len(shape),
                                     memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        functools.partial(_sa_encoder_kernel, heads=H, group=G, layers=L,
                          scale=scale),
        grid=(B // G,),
        in_specs=[
            pl.BlockSpec((G, Lq, D), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, G * Lq), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            rep((L, D, 3 * D)), rep((L, 3 * D)),
            rep((L, D, D)), rep((L, D)), rep((L, D)), rep((L, D)),
            rep((L, D, F)), rep((L, F)), rep((L, F, D)), rep((L, D)),
            rep((L, D)), rep((L, D)),
        ],
        out_specs=pl.BlockSpec((G, Lq, D), lambda b: (b, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, Lq, D), x.dtype),
        compiler_params=_compiler_params(interpret),
        interpret=interpret,
    )(x, pad, wp["wqkv"], wp["bqkv"], wp["wm"], wp["bm"],
      wp["ln1_s"], wp["ln1_b"], wp["w1"], wp["b1"], wp["w2"], wp["b2"],
      wp["ln2_s"], wp["ln2_b"])
    return out


# ---------------------------------------------------------------------------
# SA encoder-block megakernel (question path): self-att + FFN + 2 LNs
# ---------------------------------------------------------------------------

def _sa_kernel(x_ref, pad_ref, wqkv_ref, bqkv_ref, wm_ref, bm_ref,
               ln1s_ref, ln1b_ref, w1_ref, b1_ref, w2_ref, b2_ref,
               ln2s_ref, ln2b_ref, o_ref, *, heads: int, group: int,
               scale: float):
    """One whole reference SA block (core/model/mca.py:105-127):
    x = LN1(x + merge(self_att(x))); x = LN2(x + FFN(x)) — fused-projection
    layout (one [D,3D] qkv matmul, per-head lane slices)."""
    G = group
    Lq, D = x_ref.shape[1], x_ref.shape[2]
    Dh = D // heads
    M = G * Lq

    x = x_ref[:].reshape(M, D).astype(jnp.float32)

    diag = use_diag(G, Lq)   # off for 14-token questions, on for the
    if diag:                 # classifier's packed L=100 image streams
        pad_add = diag_pad_add(pad_ref[0].astype(jnp.float32), G, Lq)
    else:
        off = (jax.lax.broadcasted_iota(jnp.int32, (M, M), 0) // Lq
               != jax.lax.broadcasted_iota(jnp.int32, (M, M), 1) // Lq)
        mask_add = (off.astype(jnp.float32)
                    + pad_ref[0].astype(jnp.float32)) * _NEG_INF

    qkv = jnp.dot(x.astype(jnp.bfloat16), wqkv_ref[:].astype(jnp.bfloat16),
                  preferred_element_type=jnp.float32) + bqkv_ref[:]
    ohs = []
    for h in range(heads):
        qh = qkv[:, h * Dh:(h + 1) * Dh].astype(jnp.bfloat16)
        kh = qkv[:, D + h * Dh:D + (h + 1) * Dh].astype(jnp.bfloat16)
        vh = qkv[:, 2 * D + h * Dh:2 * D + (h + 1) * Dh].astype(jnp.bfloat16)
        if diag:
            ohs.append(diag_sdpa(qh, kh, vh, pad_add, G, Lq, scale))
            continue
        s = jax.lax.dot_general(
            qh, kh, dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32) * scale + mask_add
        m = jnp.max(s, axis=-1, keepdims=True)
        e = jnp.exp(s - m)
        att = (e / jnp.sum(e, axis=-1, keepdims=True)).astype(jnp.bfloat16)
        ohs.append(jnp.dot(att, vh, preferred_element_type=jnp.float32))
    atted = jnp.concatenate(ohs, axis=1)
    y = jnp.dot(atted.astype(jnp.bfloat16), wm_ref[:].astype(jnp.bfloat16),
                preferred_element_type=jnp.float32)
    x1 = _ln(x + y + bm_ref[:], ln1s_ref[:], ln1b_ref[:])

    h1 = jnp.dot(x1.astype(jnp.bfloat16), w1_ref[:].astype(jnp.bfloat16),
                 preferred_element_type=jnp.float32) + b1_ref[:]
    h1 = jnp.maximum(h1, 0.0)
    y = jnp.dot(h1.astype(jnp.bfloat16), w2_ref[:].astype(jnp.bfloat16),
                preferred_element_type=jnp.float32) + b2_ref[:]
    x2 = _ln(x1 + y, ln2s_ref[:], ln2b_ref[:])

    o_ref[:] = x2.reshape(G, Lq, D).astype(o_ref.dtype)


@functools.partial(jax.jit,
                   static_argnames=("num_heads", "group", "interpret"))
def fused_sa_block(x, x_mask, wp: Dict[str, Any], *, num_heads: int,
                   group: int = 0, interpret: bool = False):
    """Run one whole SA encoder block. x [B, Lq, D]; x_mask bool
    [B, 1, 1, Lq]; wp from prepare_sa_block_params. group=0 picks the
    largest divisor of B with G*Lq <= 128. Returns [B, Lq, D] in x's
    dtype."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    B, Lq, D = x.shape
    H = num_heads
    scale = 1.0 / ((D // H) ** 0.5)
    G = _choose_group(B, group, auto=128 // Lq)

    if x_mask is None:
        pad = jnp.zeros((B // G, 1, G * Lq), jnp.int8)
    else:
        pad = x_mask[:, 0, 0].astype(jnp.int8).reshape(B // G, 1, G * Lq)

    rep = lambda shape: pl.BlockSpec(shape, lambda b: (0,) * len(shape),
                                     memory_space=pltpu.VMEM)
    F = wp["w1"].shape[1]
    out = pl.pallas_call(
        functools.partial(_sa_kernel, heads=H, group=G, scale=scale),
        grid=(B // G,),
        in_specs=[
            pl.BlockSpec((G, Lq, D), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, G * Lq), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            rep((D, 3 * D)), rep((3 * D,)),
            rep((D, D)), rep((D,)), rep((D,)), rep((D,)),
            rep((D, F)), rep((F,)), rep((F, D)), rep((D,)),
            rep((D,)), rep((D,)),
        ],
        out_specs=pl.BlockSpec((G, Lq, D), lambda b: (b, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, Lq, D), x.dtype),
        compiler_params=_compiler_params(interpret),
        interpret=interpret,
    )(x, pad, wp["wqkv"], wp["bqkv"], wp["wm"], wp["bm"],
      wp["ln1_s"], wp["ln1_b"], wp["w1"], wp["b1"], wp["w2"], wp["b2"],
      wp["ln2_s"], wp["ln2_b"])
    return out
