"""Int8 quantized serving: weights per-out-channel, activations per-row.

TPU v5e's MXU runs int8 x int8 -> int32 at 2x the bf16 rate (394 TOPS vs
~197 TFLOP/s). MCAN-large serving is ~91% of bf16 peak in the megakernel
engine (docs/PERFORMANCE.md) — the only lever past that roofline is a
narrower matmul dtype. This module provides

  * ``quantize_params``   — one-time prep: every serving matmul kernel ->
    (int8 weight, f32 per-out-channel scale). Symmetric, round-to-nearest.
  * ``make_quant_serving_fn`` — forward(params_q, img_feat, ques_ix) ->
    logits, mirroring ops/serving.py's engine but with every Dense /
    FFN / projection matmul in int8 (dynamic per-row activation scales).
    Attention score/AV matmuls stay bf16 (they are ~3% of FLOPs at
    L=14/60 and the softmax input is precision-sensitive); softmax and
    LayerNorm stay fp32, as everywhere else in this repo.

Accuracy is gated the same way bf16_stream was: top-1 agreement + prob
delta vs the fp32 engine on the real-format slice (tests/test_quant.py)
with the measured numbers in docs/PERFORMANCE.md. Shipped strictly
OPT-IN (``Predictor(engine="int8")``) — the default serving path is
unchanged.

Reference parity anchor: core/model/net.py:299-375 (Net2 forward) — the
quantized engine computes the same function, to quantization error.
"""

from __future__ import annotations

from typing import Any, Dict

import jax
import jax.numpy as jnp

from mcan_vqa_tpu.models.layers import make_mask
from mcan_vqa_tpu.ops.diag_attn import diag_pad_add, diag_sdpa, use_diag
from mcan_vqa_tpu.ops.masked_attention import masked_attention_xla
from mcan_vqa_tpu.ops.serving import _lstm, _std_layer_norm

BF16 = jnp.bfloat16


# ---------------------------------------------------------------- weights

def _quant_w(kernel: jnp.ndarray) -> Dict[str, jnp.ndarray]:
    """[in, out] kernel -> int8 weight + f32 per-out-channel scale."""
    w32 = kernel.astype(jnp.float32)
    s = jnp.max(jnp.abs(w32), axis=0) / 127.0          # [out]
    s = jnp.where(s == 0.0, 1.0, s)
    wq = jnp.clip(jnp.round(w32 / s), -127, 127).astype(jnp.int8)
    return {"w_q": wq, "w_scale": s}


W4_GROUP = 128  # K-rows per int4 scale group (per out-channel)


def _quant_w4(kernel: jnp.ndarray, group: int = W4_GROUP
              ) -> Dict[str, jnp.ndarray]:
    """[in, out] kernel -> nibble-packed int4 weight + grouped scales.

    Symmetric int4 per (K-group, out-channel): q = round(w/s) in
    [-7, 7] with s = max|w| over each ``group``-row slab / 7
    ([K/group, out] f32 — finer than ``_quant_w``'s per-channel scale
    to hold accuracy at 4 bits). Rows j and j + K/2 pack into one byte
    ((q_lo+8) | (q_hi+8)<<4, [K/2, out] int8) so ``_unpack_w4``'s
    concat([lo, hi], axis=0) restores the ORIGINAL row order with no
    runtime interleave. Used by the weight-streaming latency engine
    (serving qffn levels 4/5): HALVES the int8 sites' HBM bytes, which
    is what bounds B=1 latency (docs/PERFORMANCE.md)."""
    w32 = kernel.astype(jnp.float32)
    K = w32.shape[0]
    g = min(group, K)
    assert K % 2 == 0 and K % g == 0, (K, g)
    s = jnp.max(jnp.abs(w32).reshape(K // g, g, -1), axis=1) / 7.0
    s = jnp.where(s == 0.0, 1.0, s)                        # [K/g, out]
    q = jnp.clip(jnp.round(w32 / jnp.repeat(s, g, axis=0)), -7, 7)
    n = (q + 8).astype(jnp.int32)                          # [1, 15]
    packed = (n[:K // 2] | (n[K // 2:] << 4)).astype(jnp.int8)
    return {"w_p": packed, "w_gscale": s}


def _unpack_w4(packed: jnp.ndarray) -> jnp.ndarray:
    """[K/2, out] packed nibbles -> [K, out] int8 in [-7, 7]."""
    p = packed.astype(jnp.int32) & 0xFF
    return jnp.concatenate([(p & 0xF) - 8, (p >> 4) - 8],
                           axis=0).astype(jnp.int8)


def quantize_params(params: Dict[str, Any], num_layers: int,
                    megakernel: bool = False) -> Dict[str, Any]:
    """One-time prep of a serving param tree for the int8 engine.

    Starts from the RAW model tree (model.init / checkpoint import, NOT
    ops.serving.prepare_params — fusion happens here). Produces, per
    attention block, fused qkv / kv int8 kernels (same fusion as
    prepare_params), int8 FFN / attflat / proj kernels, and leaves the
    embedding, LSTM and LayerNorm params untouched (LSTM stays bf16).
    megakernel: additionally attach each block's int8 megakernel layout
    (``_mk`` entries — prepare_quant_sa_params / prepare_quant_sga_params)
    for the fused int8 engine.
    """
    from mcan_vqa_tpu.ops.serving import fuse_projections as fuse

    def qd(dense_p):
        return {**_quant_w(dense_p["kernel"]),
                "bias": dense_p["bias"].astype(jnp.float32)}

    out: Dict[str, Any] = {
        "embedding": params["embedding"],
        "lstm": jax.tree.map(lambda x: x, params["lstm"]),
        "img_feat_linear": qd(params["img_feat_linear"]),
        "proj_norm": params["proj_norm"],
        "proj": qd(params["proj"]),
    }
    for head in ("attflat_lang", "attflat_img"):
        p = params[head]
        out[head] = {
            "mlp": {"FCLayer_0": {"Dense_0": qd(
                        p["mlp"]["FCLayer_0"]["Dense_0"])},
                    "Dense_0": qd(p["mlp"]["Dense_0"])},
            "linear_merge": qd(p["linear_merge"]),
        }
    bb_in = params["backbone"]
    bb: Dict[str, Any] = {}
    for i in range(num_layers):
        enc = bb_in[f"enc_{i}"]
        bb[f"enc_{i}"] = {
            "mhatt": {
                "linear_qkv": qd(fuse(enc["mhatt"],
                                      ("linear_q", "linear_k", "linear_v"))),
                "linear_merge": qd(enc["mhatt"]["linear_merge"]),
            },
            "ffn": {"mlp": {
                "FCLayer_0": {"Dense_0": qd(
                    enc["ffn"]["mlp"]["FCLayer_0"]["Dense_0"])},
                "Dense_0": qd(enc["ffn"]["mlp"]["Dense_0"]),
            }},
            "norm1": enc["norm1"], "norm2": enc["norm2"],
        }
        dec = bb_in[f"dec_{i}"]
        bb[f"dec_{i}"] = {
            "mhatt1": {
                "linear_qkv": qd(fuse(dec["mhatt1"],
                                      ("linear_q", "linear_k", "linear_v"))),
                "linear_merge": qd(dec["mhatt1"]["linear_merge"]),
            },
            "mhatt2": {
                "linear_kv": qd(fuse(dec["mhatt2"],
                                     ("linear_k", "linear_v"))),
                "linear_q": qd(dec["mhatt2"]["linear_q"]),
                "linear_merge": qd(dec["mhatt2"]["linear_merge"]),
            },
            "ffn": {"mlp": {
                "FCLayer_0": {"Dense_0": qd(
                    dec["ffn"]["mlp"]["FCLayer_0"]["Dense_0"])},
                "Dense_0": qd(dec["ffn"]["mlp"]["Dense_0"]),
            }},
            "norm1": dec["norm1"], "norm2": dec["norm2"],
            "norm3": dec["norm3"],
        }
        if megakernel:
            bb[f"enc_{i}"]["_mk"] = prepare_quant_sa_params(enc)
            bb[f"dec_{i}"]["_mk"] = prepare_quant_sga_params(dec)
    out["backbone"] = bb
    return out


# ------------------------------------------------------------ activations

def _qdense(p: Dict[str, Any], x: jnp.ndarray) -> jnp.ndarray:
    """y = x @ W + b with both sides int8 on the MXU.

    x is quantized dynamically per ROW (last-axis max-abs): finer than
    per-tensor, free of calibration, and the scale multiply fuses into
    the int32 -> f32 epilogue."""
    x32 = x.astype(jnp.float32)
    s_x = jnp.max(jnp.abs(x32), axis=-1, keepdims=True) / 127.0
    s_x = jnp.where(s_x == 0.0, 1.0, s_x)
    xq = jnp.clip(jnp.round(x32 / s_x), -127, 127).astype(jnp.int8)
    y = jax.lax.dot_general(
        xq, p["w_q"],
        dimension_numbers=(((xq.ndim - 1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32)
    return y.astype(jnp.float32) * (s_x * p["w_scale"]) + p["bias"]


def _qmlp(p, x):
    h = jax.nn.relu(_qdense(p["FCLayer_0"]["Dense_0"], x))
    return _qdense(p["Dense_0"], h)


def _qattflat(p, x, mask):
    logits = _qmlp(p["mlp"], x)
    logits = jnp.where(mask[:, 0, 0, :, None], -1e9, logits)
    att = jax.nn.softmax(logits.astype(jnp.float32), axis=1)
    pooled = jnp.einsum("blg,bld->bgd", att.astype(BF16), x.astype(BF16),
                        preferred_element_type=jnp.float32)
    return _qdense(p["linear_merge"], pooled.reshape(x.shape[0], -1))


def _split_heads(x, num_heads):
    B, L, D = x.shape
    return x.reshape(B, L, num_heads, D // num_heads).transpose(0, 2, 1, 3)


def _qmhatt_self(p, x, mask, num_heads):
    qkv = _qdense(p["linear_qkv"], x)
    qx, kx, vx = jnp.split(qkv, 3, axis=-1)
    atted = masked_attention_xla(_split_heads(qx, num_heads),
                                 _split_heads(kx, num_heads),
                                 _split_heads(vx, num_heads), mask)
    B, L, D = x.shape
    atted = atted.transpose(0, 2, 1, 3).reshape(B, L, D)
    return _qdense(p["linear_merge"], atted)


# ----------------------------------------------------- int8 megakernels
#
# The XLA int8 engine above only gains +2.7% at MCAN-large (13,466 vs
# 13,116 pairs/s): the raw MXU rate is there (microbench: int8 336 TOPS
# vs bf16 185 TF/s; Pallas int8 291 TOPS) but the unfused structure
# gives it back in fp32 HBM round-trips between sub-ops. These kernels
# are the int8 twins of ops/sga_block.py's fused-projection megakernels:
# whole block per launch, int8 weights VMEM-resident (HALF the bf16
# footprint), activations quantized in-register between sub-ops,
# attention bf16, LN f32.

_NEG_INF = -1e9


def _q_compiler_params(interpret: bool):
    if interpret:
        return None
    from jax.experimental.pallas import tpu as pltpu
    return pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024)


def _kln(r, scale, bias):
    d = r.shape[-1]
    mean = jnp.mean(r, axis=-1, keepdims=True)
    c = r - mean
    var = jnp.sum(c * c, axis=-1, keepdims=True) / (d - 1)
    return scale * c / (jnp.sqrt(var) + 1e-6) + bias


def _qrow(x):
    """f32 [M, D] -> (int8, f32 [M, 1] scale), symmetric per row."""
    s = jnp.max(jnp.abs(x), axis=-1, keepdims=True) / 127.0
    s = jnp.where(s == 0.0, 1.0, s)
    xq = jnp.clip(jnp.round(x / s), -127, 127).astype(jnp.int8)
    return xq, s


def _qdot(x, wq_ref, sw_ref, bias):
    """Quantize x per row, int8 matmul against a resident int8 weight
    block, dequantize in the epilogue."""
    xq, sx = _qrow(x)
    y = jax.lax.dot_general(xq, wq_ref[:],
                            dimension_numbers=(((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.int32)
    return y.astype(jnp.float32) * (sx * sw_ref[:]) + bias


def _qdot_static(x, a: float, wq_ref, sw_ref, bias):
    """``_qdot`` with a CALIBRATED per-tensor activation scale ``a``
    (a Python float baked into the kernel at trace time).

    Skips the per-row max-abs reduction and the per-row rescale — the
    quantize step is one multiply + round/clip/cast and the dequantize
    scale is the compile-time constant ``a * w_scale``. Sound here
    because every static-quant site in these kernels is post-LayerNorm
    (per-row norms are ~constant, so a per-tensor scale loses little
    vs per-row) or post-ReLU of such a matmul; values beyond the
    calibration max saturate at +-127 (graceful). Calibration:
    ``calibrate_qffn_act_scales``."""
    xq = jnp.clip(jnp.round(x * (1.0 / a)), -127, 127).astype(jnp.int8)
    y = jax.lax.dot_general(xq, wq_ref[:],
                            dimension_numbers=(((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.int32)
    return y.astype(jnp.float32) * (a * sw_ref[:]) + bias


def _qdot_static4(x, a: float, wp_ref, s4_ref, bias):
    """``_qdot_static`` against a nibble-packed int4 weight
    (``_quant_w4``) with per-(K-group, out-channel) scales.

    Unpacks in-register (weight-sized VPU work — amortized over the
    batch, and free in the B=1 regime where the kernel is
    weight-streaming-bound), then one int8 MXU matmul per K-group with
    a per-group dequant epilogue (the grouped scales cannot be folded
    into a single post-accumulation scale)."""
    xq = jnp.clip(jnp.round(x * (1.0 / a)), -127, 127).astype(jnp.int8)
    w = _unpack_w4(wp_ref[:])
    s4 = s4_ref[:]
    K, nG = w.shape[0], s4.shape[0]
    g = K // nG
    y = None
    for gi in range(nG):
        part = jax.lax.dot_general(
            xq[:, gi * g:(gi + 1) * g], w[gi * g:(gi + 1) * g],
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32)
        t = part.astype(jnp.float32) * (a * s4[gi])
        y = t if y is None else y + t
    return y + bias


def _qdot_w4bf16(x, a: float, wp_ref, s4_ref, bias):
    """``_qdot_static4``'s storage with bf16-dequant COMPUTE: unpack the
    nibble-packed int4 weight and fold the grouped scales into it
    in-register, then ONE bf16 MXU matmul.

    Same HBM bytes as ``_qdot_static4`` (the int4 packing is what the
    B=1 weight-streaming regime pays for) but no activation
    quantization at this site (``a`` is accepted for signature parity
    and unused) and no per-K-group matmul loop — trades the grouped
    int8 epilogues + act-quant VPU work for a weight-sized dequant.
    Strictly more accurate than the int8-compute path (the only error
    left is the int4 weight quantization itself). qffn levels 6/7."""
    del a
    w = _unpack_w4(wp_ref[:]).astype(jnp.float32)          # [K, N]
    s4 = s4_ref[:]                                         # [K/g, N]
    K, N = w.shape
    nG = s4.shape[0]
    wf = (w.reshape(nG, K // nG, N) * s4[:, None, :]
          ).reshape(K, N).astype(BF16)
    y = jnp.dot(x.astype(BF16), wf, preferred_element_type=jnp.float32)
    return y + bias


def prepare_quant_sga_params(p: Dict[str, Any]) -> Dict[str, Any]:
    """One decoder block (raw tree) -> int8 fused-projection layout."""
    def fuse_k(names, src):
        return jnp.concatenate([src[n]["kernel"] for n in names], axis=1)

    def fuse_b(names, src):
        return jnp.concatenate([src[n]["bias"] for n in names])

    m1, m2, mlp = p["mhatt1"], p["mhatt2"], p["ffn"]["mlp"]
    out = {}
    for name, k in (
        ("qkv1", fuse_k(("linear_q", "linear_k", "linear_v"), m1)),
        ("m1", m1["linear_merge"]["kernel"]),
        ("q2", m2["linear_q"]["kernel"]),
        ("m2", m2["linear_merge"]["kernel"]),
        ("w1", mlp["FCLayer_0"]["Dense_0"]["kernel"]),
        ("w2", mlp["Dense_0"]["kernel"]),
    ):
        q = _quant_w(k)
        out[f"w_{name}"], out[f"s_{name}"] = q["w_q"], q["w_scale"]
    out.update({
        "b_qkv1": fuse_b(("linear_q", "linear_k", "linear_v"), m1),
        "b_m1": m1["linear_merge"]["bias"],
        "b_q2": m2["linear_q"]["bias"],
        "b_m2": m2["linear_merge"]["bias"],
        "b_w1": mlp["FCLayer_0"]["Dense_0"]["bias"],
        "b_w2": mlp["Dense_0"]["bias"],
        "ln1_s": p["norm1"]["scale"], "ln1_b": p["norm1"]["bias"],
        "ln2_s": p["norm2"]["scale"], "ln2_b": p["norm2"]["bias"],
        "ln3_s": p["norm3"]["scale"], "ln3_b": p["norm3"]["bias"],
    })
    return out


def prepare_quant_sa_params(p: Dict[str, Any]) -> Dict[str, Any]:
    """One encoder block (raw tree) -> int8 fused-projection layout."""
    m, mlp = p["mhatt"], p["ffn"]["mlp"]
    out = {}
    for name, k in (
        ("qkv", jnp.concatenate([m["linear_q"]["kernel"],
                                 m["linear_k"]["kernel"],
                                 m["linear_v"]["kernel"]], axis=1)),
        ("m", m["linear_merge"]["kernel"]),
        ("w1", mlp["FCLayer_0"]["Dense_0"]["kernel"]),
        ("w2", mlp["Dense_0"]["kernel"]),
    ):
        q = _quant_w(k)
        out[f"w_{name}"], out[f"s_{name}"] = q["w_q"], q["w_scale"]
    out.update({
        "b_qkv": jnp.concatenate([m["linear_q"]["bias"],
                                  m["linear_k"]["bias"],
                                  m["linear_v"]["bias"]]),
        "b_m": m["linear_merge"]["bias"],
        "b_w1": mlp["FCLayer_0"]["Dense_0"]["bias"],
        "b_w2": mlp["Dense_0"]["bias"],
        "ln1_s": p["norm1"]["scale"], "ln1_b": p["norm1"]["bias"],
        "ln2_s": p["norm2"]["scale"], "ln2_b": p["norm2"]["bias"],
    })
    return out


def _qsga_kernel(v_ref, kq_ref, vq_ref, vpad_ref, qpad_ref,
                 wqkv_ref, sqkv_ref, bqkv_ref,
                 wm1_ref, sm1_ref, bm1_ref, ln1s_ref, ln1b_ref,
                 wq2_ref, sq2_ref, bq2_ref,
                 wm2_ref, sm2_ref, bm2_ref, ln2s_ref, ln2b_ref,
                 w1_ref, s1_ref, b1_ref, w2_ref, s2_ref, b2_ref,
                 ln3s_ref, ln3b_ref,
                 o_ref, *, heads: int, group: int, scale: float):
    """Int8 twin of ops/sga_block._sga_kernel_fusedproj."""
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
            qh.astype(BF16), kh,
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32) * scale
        s = s + mask_add
        m = jnp.max(s, axis=-1, keepdims=True)
        e = jnp.exp(s - m)
        att = (e / jnp.sum(e, axis=-1, keepdims=True)).astype(BF16)
        return jnp.dot(att, vh, preferred_element_type=jnp.float32)

    # ---- self-attention: ONE int8 qkv matmul, lane-sliced heads ----
    qkv = _qdot(x, wqkv_ref, sqkv_ref, bqkv_ref[:])
    ohs = []
    for h in range(heads):
        qh = qkv[:, h * Dh:(h + 1) * Dh]
        kh = qkv[:, D + h * Dh:D + (h + 1) * Dh].astype(BF16)
        vh = qkv[:, 2 * D + h * Dh:2 * D + (h + 1) * Dh].astype(BF16)
        ohs.append(diag_sdpa(qh, kh, vh, pad_add, G, Lv, scale) if diag
                   else sdpa(qh, kh, vh, self_mask))
    atted = jnp.concatenate(ohs, axis=1)
    y = _qdot(atted, wm1_ref, sm1_ref, 0.0)
    v1 = _kln(x + y + bm1_ref[:], ln1s_ref[:], ln1b_ref[:])

    # ---- cross-attention (keys/values pre-projected outside) ----
    qx = _qdot(v1, wq2_ref, sq2_ref, bq2_ref[:])
    ohs = []
    for h in range(heads):
        kh = kq_ref[:, h].reshape(N, Dh).astype(BF16)
        vh = vq_ref[:, h].reshape(N, Dh).astype(BF16)
        ohs.append(sdpa(qx[:, h * Dh:(h + 1) * Dh], kh, vh, cross_mask))
    atted = jnp.concatenate(ohs, axis=1)
    y = _qdot(atted, wm2_ref, sm2_ref, 0.0)
    v2 = _kln(v1 + y + bm2_ref[:], ln2s_ref[:], ln2b_ref[:])

    # ---- FFN ----
    h1 = jnp.maximum(_qdot(v2, w1_ref, s1_ref, b1_ref[:]), 0.0)
    y = _qdot(h1, w2_ref, s2_ref, b2_ref[:])
    v3 = _kln(v2 + y, ln3s_ref[:], ln3b_ref[:])

    o_ref[:] = v3.reshape(G, Lv, D).astype(o_ref.dtype)


def _qsa_kernel(x_ref, pad_ref,
                wqkv_ref, sqkv_ref, bqkv_ref,
                wm_ref, sm_ref, bm_ref, ln1s_ref, ln1b_ref,
                w1_ref, s1_ref, b1_ref, w2_ref, s2_ref, b2_ref,
                ln2s_ref, ln2b_ref, o_ref, *, heads: int, group: int,
                scale: float):
    """Int8 twin of ops/sga_block._sa_kernel."""
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

    qkv = _qdot(x, wqkv_ref, sqkv_ref, bqkv_ref[:])
    ohs = []
    for h in range(heads):
        qh = qkv[:, h * Dh:(h + 1) * Dh].astype(BF16)
        kh = qkv[:, D + h * Dh:D + (h + 1) * Dh].astype(BF16)
        vh = qkv[:, 2 * D + h * Dh:2 * D + (h + 1) * Dh].astype(BF16)
        if diag:
            ohs.append(diag_sdpa(qh, kh, vh, pad_add, G, Lq, scale))
            continue
        s = jax.lax.dot_general(
            qh, kh, dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32) * scale + mask_add
        m = jnp.max(s, axis=-1, keepdims=True)
        e = jnp.exp(s - m)
        att = (e / jnp.sum(e, axis=-1, keepdims=True)).astype(BF16)
        ohs.append(jnp.dot(att, vh, preferred_element_type=jnp.float32))
    atted = jnp.concatenate(ohs, axis=1)
    y = _qdot(atted, wm_ref, sm_ref, 0.0)
    x1 = _kln(x + y + bm_ref[:], ln1s_ref[:], ln1b_ref[:])

    h1 = jnp.maximum(_qdot(x1, w1_ref, s1_ref, b1_ref[:]), 0.0)
    y = _qdot(h1, w2_ref, s2_ref, b2_ref[:])
    x2 = _kln(x1 + y, ln2s_ref[:], ln2b_ref[:])

    o_ref[:] = x2.reshape(G, Lq, D).astype(o_ref.dtype)


def fused_quant_sga_block(v, kq, vq, v_mask, q_mask, wp, *, num_heads: int,
                          group: int = 4, interpret: bool = False):
    """One whole SGA block, int8 weights resident. Mirrors
    ops/sga_block.fused_sga_block (fused-projection variant)."""
    import functools

    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    B, Lv, D = v.shape
    Lq = kq.shape[2]
    Dh = D // num_heads
    H = num_heads
    scale = 1.0 / (Dh ** 0.5)
    G = max(1, group)
    while B % G:
        G -= 1

    def flat_pad(mask, L):
        if mask is None:
            return jnp.zeros((B // G, 1, G * L), jnp.int8)
        return mask[:, 0, 0].astype(jnp.int8).reshape(B // G, 1, G * L)

    rep = lambda shape: pl.BlockSpec(shape, lambda b: (0,) * len(shape),
                                     memory_space=pltpu.VMEM)
    F = wp["w_w1"].shape[1]
    return pl.pallas_call(
        functools.partial(_qsga_kernel, heads=H, group=G, scale=scale),
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
            rep((D, 3 * D)), rep((3 * D,)), rep((3 * D,)),
            rep((D, D)), rep((D,)), rep((D,)), rep((D,)), rep((D,)),
            rep((D, D)), rep((D,)), rep((D,)),
            rep((D, D)), rep((D,)), rep((D,)), rep((D,)), rep((D,)),
            rep((D, F)), rep((F,)), rep((F,)),
            rep((F, D)), rep((D,)), rep((D,)),
            rep((D,)), rep((D,)),
        ],
        out_specs=pl.BlockSpec((G, Lv, D), lambda b: (b, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, Lv, D), v.dtype),
        compiler_params=_q_compiler_params(interpret),
        interpret=interpret,
    )(v, kq, vq, flat_pad(v_mask, Lv), flat_pad(q_mask, Lq),
      wp["w_qkv1"], wp["s_qkv1"], wp["b_qkv1"],
      wp["w_m1"], wp["s_m1"], wp["b_m1"], wp["ln1_s"], wp["ln1_b"],
      wp["w_q2"], wp["s_q2"], wp["b_q2"],
      wp["w_m2"], wp["s_m2"], wp["b_m2"], wp["ln2_s"], wp["ln2_b"],
      wp["w_w1"], wp["s_w1"], wp["b_w1"],
      wp["w_w2"], wp["s_w2"], wp["b_w2"],
      wp["ln3_s"], wp["ln3_b"])


def fused_quant_sa_block(x, x_mask, wp, *, num_heads: int, group: int = 0,
                         interpret: bool = False):
    """One whole SA encoder block, int8 weights resident."""
    import functools

    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    B, Lq, D = x.shape
    H = num_heads
    scale = 1.0 / ((D // H) ** 0.5)
    G = group if group > 0 else max(1, 128 // Lq)
    while B % G:
        G -= 1

    if x_mask is None:
        pad = jnp.zeros((B // G, 1, G * Lq), jnp.int8)
    else:
        pad = x_mask[:, 0, 0].astype(jnp.int8).reshape(B // G, 1, G * Lq)

    rep = lambda shape: pl.BlockSpec(shape, lambda b: (0,) * len(shape),
                                     memory_space=pltpu.VMEM)
    F = wp["w_w1"].shape[1]
    return pl.pallas_call(
        functools.partial(_qsa_kernel, heads=H, group=G, scale=scale),
        grid=(B // G,),
        in_specs=[
            pl.BlockSpec((G, Lq, D), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, G * Lq), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            rep((D, 3 * D)), rep((3 * D,)), rep((3 * D,)),
            rep((D, D)), rep((D,)), rep((D,)), rep((D,)), rep((D,)),
            rep((D, F)), rep((F,)), rep((F,)),
            rep((F, D)), rep((D,)), rep((D,)),
            rep((D,)), rep((D,)),
        ],
        out_specs=pl.BlockSpec((G, Lq, D), lambda b: (b, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, Lq, D), x.dtype),
        compiler_params=_q_compiler_params(interpret),
        interpret=interpret,
    )(x, pad,
      wp["w_qkv"], wp["s_qkv"], wp["b_qkv"],
      wp["w_m"], wp["s_m"], wp["b_m"], wp["ln1_s"], wp["ln1_b"],
      wp["w_w1"], wp["s_w1"], wp["b_w1"],
      wp["w_w2"], wp["s_w2"], wp["b_w2"],
      wp["ln2_s"], wp["ln2_b"])


# ------------------------------------------------ mixed int8-FFN blocks
#
# The full int8 megakernels LOSE at D=512 (35.9K vs bf16 38.6K pairs/s,
# docs/PERFORMANCE.md): the per-row activation-quant VPU work around the
# [*, 512] projections costs more than the int8 MXU rate saves on their
# small-N matmuls. The FFN is the opposite regime — ~57% of block MACs,
# and its w1 quant ([M, 512] input) amortizes over F=2048 output
# columns. These kernels are the bf16 fused-projection megakernels
# (ops/sga_block._sga_kernel_fusedproj / _sa_kernel) with ONLY the FFN
# matmuls in int8: attention, projections, residual stream and LN stay
# exactly the shipped bf16 path. Opt-in via make_serving_fn(qffn=True) /
# BENCH_QFFN=1; accuracy-gated in tests/test_quant.py.

def prepare_qffn_params(p: Dict[str, Any],
                        qkv_int8: bool = False,
                        proj_int8: bool = False,
                        w4: int = 0) -> Dict[str, Any]:
    """One block's FFN (raw or bf16 tree) -> int8 weights + f32 scales.

    qkv_int8: also quantize the SELF-attention qkv projection (the
    block's second-best quant-overhead-to-MXU-gain ratio after w1) —
    the kernels then take the fused [D, 3D] kernel int8.
    proj_int8: also quantize the attention MERGE projections and the
    decoder's cross-attention q projection. Under DYNAMIC per-row quant
    these small-N matmuls were a measured loss (the full-int8 engine's
    small-model regression); they are only used with STATIC calibrated
    scales (make_serving_fn(qffn_act_scales=...) with 4-/6-tuples from
    calibrate_qffn_act_scales on a qffn=3 tree).
    w4: weight-streaming latency variant — 1 packs the FFN weights to
    nibble int4 with grouped scales (``_quant_w4``: ``w1_p``/``s1_g``
    replace ``w1_q``/``s1``), 2 additionally packs the qkv projection
    (``wqkv_p``/``sqkv_g``). int4 sites ship only with static
    calibrated activation scales (the kernels have no dynamic-quant
    int4 path); the merge/cross-q projections stay int8 — they are
    small per byte saved and sit directly on the attention inputs."""
    mlp = p["ffn"]["mlp"]
    out = {
        "b1": mlp["FCLayer_0"]["Dense_0"]["bias"].astype(jnp.float32),
        "b2": mlp["Dense_0"]["bias"].astype(jnp.float32),
    }
    if w4 >= 1:
        q1 = _quant_w4(mlp["FCLayer_0"]["Dense_0"]["kernel"])
        q2 = _quant_w4(mlp["Dense_0"]["kernel"])
        out.update({"w1_p": q1["w_p"], "s1_g": q1["w_gscale"],
                    "w2_p": q2["w_p"], "s2_g": q2["w_gscale"]})
    else:
        q1 = _quant_w(mlp["FCLayer_0"]["Dense_0"]["kernel"])
        q2 = _quant_w(mlp["Dense_0"]["kernel"])
        out.update({"w1_q": q1["w_q"], "s1": q1["w_scale"],
                    "w2_q": q2["w_q"], "s2": q2["w_scale"]})
    is_sga = "mhatt1" in p
    m = p["mhatt1"] if is_sga else p["mhatt"]
    if qkv_int8:
        kqkv = jnp.concatenate([m["linear_q"]["kernel"],
                                m["linear_k"]["kernel"],
                                m["linear_v"]["kernel"]], axis=1)
        if w4 >= 2:
            qq = _quant_w4(kqkv)
            out["wqkv_p"], out["sqkv_g"] = qq["w_p"], qq["w_gscale"]
        else:
            qq = _quant_w(kqkv)
            out["wqkv_q"], out["sqkv"] = qq["w_q"], qq["w_scale"]
    if proj_int8:
        if is_sga:
            qm1 = _quant_w(m["linear_merge"]["kernel"])
            qq2 = _quant_w(p["mhatt2"]["linear_q"]["kernel"])
            qm2 = _quant_w(p["mhatt2"]["linear_merge"]["kernel"])
            out.update({"wm1_q": qm1["w_q"], "sm1": qm1["w_scale"],
                        "wq2_q": qq2["w_q"], "sq2": qq2["w_scale"],
                        "wm2_q": qm2["w_q"], "sm2": qm2["w_scale"]})
        else:
            qm = _quant_w(m["linear_merge"]["kernel"])
            out.update({"wm_q": qm["w_q"], "sm": qm["w_scale"]})
    return out


def prepare_q8aux_params(params: Dict[str, Any],
                         num_layers: int) -> Dict[str, Any]:
    """Static-int8 AUX weight sites for the B=1 weight-streaming regime:
    the matmuls the megakernels DON'T cover — the decoder cross k/v
    projections (2*D^2 bf16 per block: the largest unquantized stream
    after qffn level 3), both AttFlat merges, and the answer head.
    ~46 MB of bf16 at MCAN-large, ~10 MB at small.

    params: a prepared (pruned ok) serving tree. Returns the `_q8aux`
    tree ({"dec_i_kv"/"lang_merge"/"img_merge"/"proj": {w_q, w_s, b}},
    per-out-channel int8 via ``_quant_w``); the serving forward uses it
    only when the calibrated act-scale dict carries an "aux" tuple
    (build_production_engine(q8aux=True)). Reference anchors:
    core/model/mca.py:151-164 (cross-att k/v), core/model/net.py:20-55
    (AttFlat merge), net.py:371-372 (proj head)."""
    def site(kernel, bias):
        q = _quant_w(kernel)
        return {"w_q": q["w_q"], "w_s": q["w_scale"],
                "b": jnp.asarray(bias, jnp.float32)}

    aux: Dict[str, Any] = {}
    for i in range(num_layers):
        kv = params["backbone"][f"dec_{i}"]["mhatt2"]["linear_kv"]
        aux[f"dec_{i}_kv"] = site(kv["kernel"], kv["bias"])
    aux["lang_merge"] = site(
        params["attflat_lang"]["linear_merge"]["kernel"],
        params["attflat_lang"]["linear_merge"]["bias"])
    aux["img_merge"] = site(
        params["attflat_img"]["linear_merge"]["kernel"],
        params["attflat_img"]["linear_merge"]["bias"])
    aux["proj"] = site(params["proj"]["kernel"], params["proj"]["bias"])
    return aux


def calibrate_qffn_act_scales(params: Dict[str, Any], img_feat, ques_ix,
                              num_layers: int, num_heads: int,
                              margin: float = 1.1,
                              w4dq: bool = False) -> Dict[str, tuple]:
    """Calibrate static per-tensor activation scales for the qffn engine.

    Replays the qffn megakernel math (bf16 attention matmuls, f32
    softmax/LN, int8 FFN) in plain XLA over a representative batch and
    records each quant site's max |activation|:

      * a1 — FFN w1 input (post-LayerNorm: per-row norms ~constant, so a
        per-tensor scale costs little vs per-row),
      * a2 — FFN w2 input (ReLU of the static-quant w1 matmul — computed
        self-consistently with the a1 just derived),
      * aqkv — the self-attention qkv input (post-LN block entry), only
        meaningful when ``_qffn`` carries ``wqkv_q``.

    params: a prepared serving tree (``prepare_params(qffn=True)``,
    pruned or not) — reads ``_mk``/``_qffn`` per block plus the decoder's
    ``mhatt2.linear_kv``. Returns {"enc_i"/"dec_i": (aqkv, a1, a2)} as
    PYTHON FLOATS (scale = max/127 * margin; values past the calibration
    max saturate at +-127): bake them into the engine via
    ``make_serving_fn(qffn_act_scales=...)``. margin: headroom for
    activations the calibration batch didn't reach. w4dq: mirror the
    bf16-dequant int4 compute (qffn levels 6/7) so the downstream int8
    sites' scales are derived self-consistently."""

    def replay(params, img_feat, ques_ix):
        q_mask = make_mask(ques_ix[..., None])
        v_mask = make_mask(img_feat)
        q = jnp.take(params["embedding"]["embedding"], ques_ix, axis=0)
        q = _lstm(params["lstm"], q).astype(BF16)
        ifl = params["img_feat_linear"]
        v = _cal_bdot(img_feat, ifl["kernel"], ifl["bias"]).astype(BF16)

        bb = params["backbone"]
        scales: Dict[str, tuple] = {}
        for i in range(num_layers):
            q, scales[f"enc_{i}"] = _cal_sa_block(
                bb[f"enc_{i}"], q, q_mask, num_heads, margin, w4dq)
        aux_w = params.get("_q8aux")
        a_kv = (_cal_scale_of(q.astype(jnp.float32), margin)
                if aux_w is not None else None)
        for i in range(num_layers):
            kv_q8 = ((a_kv, aux_w[f"dec_{i}_kv"])
                     if aux_w is not None else None)
            v, scales[f"dec_{i}"] = _cal_sga_block(
                bb[f"dec_{i}"], v, q, v_mask, q_mask, num_heads, margin,
                w4dq, kv_q8)
        if aux_w is not None:
            lang, a_lang = _cal_attflat(params["attflat_lang"],
                                        aux_w["lang_merge"], q, q_mask,
                                        margin)
            img, a_img = _cal_attflat(params["attflat_img"],
                                      aux_w["img_merge"], v, v_mask,
                                      margin)
            pn = params["proj_norm"]
            fused = _kln(lang + img, pn["scale"], pn["bias"])
            scales["aux"] = (a_kv, a_lang, a_img,
                             _cal_scale_of(fused, margin))
        return scales

    out = jax.jit(replay)(params, jnp.asarray(img_feat),
                          jnp.asarray(ques_ix))
    return _check_scales({k: tuple(float(x) for x in jax.device_get(v))
                          for k, v in out.items()})


def _check_scales(scales: Dict[str, tuple]) -> Dict[str, tuple]:
    """Scales are baked into kernels as compile-time constants: a single
    NaN/Inf (e.g. a non-finite row in the calibration sample) would
    silently poison every int8 site for the engine's whole lifetime."""
    import math
    for name, tup in scales.items():
        for s in tup:
            if not (math.isfinite(s) and s > 0.0):
                raise ValueError(
                    f"calibration produced a non-finite/non-positive "
                    f"activation scale at {name}: {tup} — check the "
                    f"calibration sample for NaN/Inf features")
    return scales


def calibrate_classifier_act_scales(params: Dict[str, Any], img_feat,
                                    num_layers: int, num_heads: int,
                                    margin: float = 1.1,
                                    w4dq: bool = False) -> Dict[str, tuple]:
    """Classifier twin of ``calibrate_qffn_act_scales`` (image-only SA
    stack; params from prepare_classifier_params(qffn=True), pruned or
    not). Bake the result into
    ``make_classifier_serving_fn(qffn_act_scales=...)``."""

    def replay(params, img_feat):
        v_mask = make_mask(img_feat)
        ifl = params["img_feat_linear"]
        v = _cal_bdot(img_feat, ifl["kernel"], ifl["bias"]).astype(BF16)
        bb = params["backbone"]
        scales: Dict[str, tuple] = {}
        for i in range(num_layers):
            v, scales[f"enc_{i}"] = _cal_sa_block(
                bb[f"enc_{i}"], v, v_mask, num_heads, margin, w4dq)
        return scales

    out = jax.jit(replay)(params, jnp.asarray(img_feat))
    return _check_scales({k: tuple(float(x) for x in jax.device_get(v))
                          for k, v in out.items()})


# --- calibration replay helpers: plain-XLA mirrors of the qffn kernel
# math (bf16 attention matmuls, f32 softmax/LN, int8 FFN) used to derive
# the static scales self-consistently (h1 is computed WITH the a1 just
# calibrated, exactly as the static kernel will).

def _cal_scale_of(x, margin):
    m = jnp.max(jnp.abs(x)) / 127.0 * margin
    return jnp.where(m == 0.0, 1.0, m).astype(jnp.float32)


def _cal_qdot(x, a, wq, sw, b):
    xq = jnp.clip(jnp.round(x * (1.0 / a)), -127, 127).astype(jnp.int8)
    y = jax.lax.dot_general(xq, wq,
                            dimension_numbers=(((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.int32)
    return y.astype(jnp.float32) * (a * sw) + b


def _cal_qdot4(x, a, wp, s4, b):
    """Plain-XLA mirror of ``_qdot_static4`` (packed int4 weight,
    grouped scales) so int4-site calibration is self-consistent."""
    xq = jnp.clip(jnp.round(x * (1.0 / a)), -127, 127).astype(jnp.int8)
    w = _unpack_w4(wp)
    K, nG = w.shape[0], s4.shape[0]
    g = K // nG
    y = None
    for gi in range(nG):
        part = jax.lax.dot_general(
            xq[:, gi * g:(gi + 1) * g], w[gi * g:(gi + 1) * g],
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32)
        t = part.astype(jnp.float32) * (a * s4[gi])
        y = t if y is None else y + t
    return y + b


def _cal_qdot4dq(x, wp, s4, b):
    """Plain-XLA mirror of ``_qdot_w4bf16`` (int4 storage, bf16-dequant
    compute — no activation quantization at the site)."""
    w = _unpack_w4(wp).astype(jnp.float32)
    K, N = w.shape
    nG = s4.shape[0]
    wf = (w.reshape(nG, K // nG, N) * s4[:, None, :]
          ).reshape(K, N).astype(BF16)
    return jnp.dot(x.astype(BF16), wf,
                   preferred_element_type=jnp.float32) + b


def _cal_bdot(x, w, b=None):
    y = jnp.dot(x.astype(BF16), jnp.asarray(w).astype(BF16),
                preferred_element_type=jnp.float32)
    return y if b is None else y + b


def _cal_sdpa(q, k, v, mask, num_heads):
    # [B, L, D] -> [B, Lq, D] f32; group packing in the kernel is
    # block-diagonal masking == per-sample attention here
    B, Lq, D = q.shape
    Dh = D // num_heads
    sh = lambda t: t.reshape(B, -1, num_heads, Dh).transpose(0, 2, 1, 3)
    qh, kh, vh = sh(q.astype(BF16)), sh(k.astype(BF16)), sh(v.astype(BF16))
    s = jnp.einsum("bhqd,bhkd->bhqk", qh, kh,
                   preferred_element_type=jnp.float32) / (Dh ** 0.5)
    s = s + mask.astype(jnp.float32) * _NEG_INF
    att = jax.nn.softmax(s, axis=-1).astype(BF16)
    o = jnp.einsum("bhqk,bhkd->bhqd", att, vh,
                   preferred_element_type=jnp.float32)
    return o.transpose(0, 2, 1, 3).reshape(B, Lq, D)


def _cal_qkv_site(flat, wp, qf, wqkv_key, bqkv, margin, w4dq=False):
    """The self-attention qkv quant site: int8/int4 (static,
    self-consistent) when the block quantizes qkv, else the bf16
    matmul; returns (qkv [M, 3D], aq). w4dq mirrors the bf16-dequant
    int4 compute (the aq returned is then unused by the engine but
    keeps the scale-tuple shape)."""
    if "wqkv_p" in qf:
        aq = _cal_scale_of(flat, margin)
        if w4dq:
            return _cal_qdot4dq(flat, qf["wqkv_p"], qf["sqkv_g"], bqkv), aq
        return _cal_qdot4(flat, aq, qf["wqkv_p"], qf["sqkv_g"], bqkv), aq
    if "wqkv_q" in qf:
        aq = _cal_scale_of(flat, margin)
        return _cal_qdot(flat, aq, qf["wqkv_q"], qf["sqkv"], bqkv), aq
    return _cal_bdot(flat, wp[wqkv_key], bqkv), jnp.float32(1.0)


def _cal_ffn_sites(qf, xin, margin, w4dq=False):
    w4 = "w1_p" in qf
    a1 = _cal_scale_of(xin, margin)
    if w4 and w4dq:
        h1 = jnp.maximum(
            _cal_qdot4dq(xin, qf["w1_p"], qf["s1_g"], qf["b1"]), 0.0)
    elif w4:
        h1 = jnp.maximum(
            _cal_qdot4(xin, a1, qf["w1_p"], qf["s1_g"], qf["b1"]), 0.0)
    else:
        h1 = jnp.maximum(
            _cal_qdot(xin, a1, qf["w1_q"], qf["s1"], qf["b1"]), 0.0)
    a2 = _cal_scale_of(h1, margin)
    if w4 and w4dq:
        y = _cal_qdot4dq(h1, qf["w2_p"], qf["s2_g"], qf["b2"])
    elif w4:
        y = _cal_qdot4(h1, a2, qf["w2_p"], qf["s2_g"], qf["b2"])
    else:
        y = _cal_qdot(h1, a2, qf["w2_q"], qf["s2"], qf["b2"])
    return a1, a2, y


def _cal_proj_site(flat, wq, sw, margin):
    """A merge/cross-q proj quant site: (output f32, site scale)."""
    a = _cal_scale_of(flat, margin)
    return _cal_qdot(flat, a, wq, sw, 0.0), a


def _cal_attflat(p, site, x, mask, margin):
    """AttFlat replay with the static-int8 merge site (_q8aux): mirrors
    ops/serving._attflat's non-pallas math. -> (pooled_out f32, a)."""
    B, L, D = x.shape
    x2 = x.astype(jnp.float32).reshape(B * L, D)
    mlp = p["mlp"]
    h = jnp.maximum(_cal_bdot(x2, mlp["FCLayer_0"]["Dense_0"]["kernel"],
                              mlp["FCLayer_0"]["Dense_0"]["bias"]), 0.0)
    logits = _cal_bdot(h, mlp["Dense_0"]["kernel"],
                       mlp["Dense_0"]["bias"]).reshape(B, L, -1)
    logits = jnp.where(mask[:, 0, 0, :, None], -1e9, logits)
    att = jax.nn.softmax(logits.astype(jnp.float32), axis=1)
    pooled = jnp.einsum("blg,bld->bgd", att.astype(BF16), x.astype(BF16),
                        preferred_element_type=jnp.float32).reshape(B, -1)
    a = _cal_scale_of(pooled, margin)
    return _cal_qdot(pooled, a, site["w_q"], site["w_s"], site["b"]), a


def _cal_sa_block(block, q, mask, num_heads, margin, w4dq=False):
    """One SA block of the replay: (stream_out bf16, (aq, a1, a2)) —
    or a 4-tuple (aq, a1, a2, am) when the block carries proj-int8
    weights (prepare_qffn_params(proj_int8=True))."""
    wp, qf = block["_mk"], block["_qffn"]
    B, Lq, D = q.shape
    x = q.astype(jnp.float32)
    flat = x.reshape(B * Lq, D)
    qkv, aq = _cal_qkv_site(flat, wp, qf, "wqkv", wp["bqkv"], margin,
                            w4dq)
    qx, kx, vx = jnp.split(qkv.reshape(B, Lq, 3 * D), 3, axis=-1)
    att = _cal_sdpa(qx, kx, vx, mask, num_heads).reshape(B * Lq, D)
    if "wm_q" in qf:
        y, am = _cal_proj_site(att, qf["wm_q"], qf["sm"], margin)
    else:
        y, am = _cal_bdot(att, wp["wm"]), None
    x1 = _kln(x + y.reshape(B, Lq, D) + wp["bm"], wp["ln1_s"], wp["ln1_b"])
    a1, a2, y = _cal_ffn_sites(qf, x1.reshape(B * Lq, D), margin, w4dq)
    x2 = _kln(x1 + y.reshape(B, Lq, D), wp["ln2_s"], wp["ln2_b"])
    scales = (aq, a1, a2) if am is None else (aq, a1, a2, am)
    return x2.astype(BF16), scales


def _cal_sga_block(dec, v, q, v_mask, q_mask, num_heads, margin,
                   w4dq=False, kv_q8=None):
    """One SGA decoder block of the replay. Returns a 3-tuple of scales,
    or a 6-tuple (aq, a1, a2, am1, aq2, am2) when the block carries
    proj-int8 weights. kv_q8: optional (a_kv, _q8aux site) — mirror the
    static-int8 cross k/v projection (prepare_q8aux_params)."""
    wp, qf = dec["_mk"], dec["_qffn"]
    B, Lv, D = v.shape
    if kv_q8 is not None:
        a_kv, site = kv_q8
        Lq = q.shape[1]
        kv = _cal_qdot(q.astype(jnp.float32).reshape(B * Lq, D), a_kv,
                       site["w_q"], site["w_s"],
                       site["b"]).reshape(B, Lq, 2 * D)
    else:
        kv = _cal_bdot(q, dec["mhatt2"]["linear_kv"]["kernel"],
                       dec["mhatt2"]["linear_kv"]["bias"])
    kq, vq = jnp.split(kv, 2, axis=-1)
    proj8 = "wm1_q" in qf

    x = v.astype(jnp.float32)
    flat = x.reshape(B * Lv, D)
    qkv, aq = _cal_qkv_site(flat, wp, qf, "wqkv1", wp["bqkv1"], margin,
                            w4dq)
    qx, kx, vx = jnp.split(qkv.reshape(B, Lv, 3 * D), 3, axis=-1)
    att = _cal_sdpa(qx, kx, vx, v_mask, num_heads).reshape(B * Lv, D)
    if proj8:
        y, am1 = _cal_proj_site(att, qf["wm1_q"], qf["sm1"], margin)
    else:
        y, am1 = _cal_bdot(att, wp["wm1_full"]), None
    v1 = _kln(x + y.reshape(B, Lv, D) + wp["bm1"],
              wp["ln1_s"], wp["ln1_b"])

    v1_flat = v1.reshape(B * Lv, D)
    if proj8:
        aq2 = _cal_scale_of(v1_flat, margin)
        qx2 = _cal_qdot(v1_flat, aq2, qf["wq2_q"], qf["sq2"],
                        wp["bq2_full"])
    else:
        aq2 = None
        qx2 = _cal_bdot(v1_flat, wp["wq2_full"], wp["bq2_full"])
    att = _cal_sdpa(qx2.reshape(B, Lv, D), kq, vq, q_mask,
                    num_heads).reshape(B * Lv, D)
    if proj8:
        y, am2 = _cal_proj_site(att, qf["wm2_q"], qf["sm2"], margin)
    else:
        y, am2 = _cal_bdot(att, wp["wm2_full"]), None
    v2 = _kln(v1 + y.reshape(B, Lv, D) + wp["bm2"],
              wp["ln2_s"], wp["ln2_b"])

    a1, a2, y = _cal_ffn_sites(qf, v2.reshape(B * Lv, D), margin, w4dq)
    v3 = _kln(v2 + y.reshape(B, Lv, D), wp["ln3_s"], wp["ln3_b"])
    scales = ((aq, a1, a2) if not proj8
              else (aq, a1, a2, am1, aq2, am2))
    return v3.astype(BF16), scales


def _sga_kernel_qffn(v_ref, kq_ref, vq_ref, vpad_ref, qpad_ref,
                     wqkv_ref, sqkv_ref, bqkv_ref,
                     wm1_ref, sm1_ref, bm1_ref,
                     ln1s_ref, ln1b_ref,
                     wq2_ref, sq2_ref, bq2_ref,
                     wm2_ref, sm2_ref, bm2_ref,
                     ln2s_ref, ln2b_ref,
                     w1q_ref, s1_ref, b1_ref, w2q_ref, s2_ref, b2_ref,
                     ln3s_ref, ln3b_ref,
                     o_ref, *, heads: int, group: int, scale: float,
                     qkv_int8: bool = False, act_scales=None,
                     w4: int = 0, w4dq: bool = False):
    """bf16 fused-projection SGA megakernel with an int8 FFN.

    act_scales: optional calibrated per-tensor activation scales
    (Python floats baked at trace time). A 3-tuple (aqkv, a1, a2)
    covers the qkv / FFN-w1 / FFN-w2 sites; a 6-tuple
    (aqkv, a1, a2, am1, aq2, am2) additionally runs the merge and
    cross-q projections int8 (wm1/wq2/wm2 refs then carry int8 weights
    with sm1/sq2/sm2 scales — proj quant ships only with static
    scales, where its per-row overhead is gone). None keeps dynamic
    per-row quant on the FFN (+ qkv when qkv_int8).
    w4: weight-streaming latency variant — 1: w1q/w2q refs carry
    nibble-packed int4 weights with grouped s1/s2 scales
    (``_qdot_static4``); 2: the qkv ref too. Requires act_scales.
    w4dq: run the int4 sites with bf16-dequant compute
    (``_qdot_w4bf16`` — qffn levels 6/7) instead of grouped int8."""
    assert w4 == 0 or act_scales is not None
    dot4 = _qdot_w4bf16 if w4dq else _qdot_static4
    proj8 = act_scales is not None and len(act_scales) >= 6
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
            qh.astype(BF16), kh,
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32) * scale
        s = s + mask_add
        m = jnp.max(s, axis=-1, keepdims=True)
        e = jnp.exp(s - m)
        att = (e / jnp.sum(e, axis=-1, keepdims=True)).astype(BF16)
        return jnp.dot(att, vh, preferred_element_type=jnp.float32)

    # ---- self-attention: ONE qkv matmul (bf16/int8/int4), lane slices ----
    if qkv_int8:
        if w4 >= 2:
            qkv = dot4(x, act_scales[0], wqkv_ref, sqkv_ref,
                                bqkv_ref[:])
        elif act_scales is not None:
            qkv = _qdot_static(x, act_scales[0], wqkv_ref, sqkv_ref,
                               bqkv_ref[:])
        else:
            qkv = _qdot(x, wqkv_ref, sqkv_ref, bqkv_ref[:])
    else:
        qkv = jnp.dot(x.astype(BF16), wqkv_ref[:].astype(BF16),
                      preferred_element_type=jnp.float32) + bqkv_ref[:]
    ohs = []
    for h in range(heads):
        qh = qkv[:, h * Dh:(h + 1) * Dh]
        kh = qkv[:, D + h * Dh:D + (h + 1) * Dh].astype(BF16)
        vh = qkv[:, 2 * D + h * Dh:2 * D + (h + 1) * Dh].astype(BF16)
        ohs.append(diag_sdpa(qh, kh, vh, pad_add, G, Lv, scale) if diag
                   else sdpa(qh, kh, vh, self_mask))
    atted = jnp.concatenate(ohs, axis=1)
    if proj8:
        y = _qdot_static(atted, act_scales[3], wm1_ref, sm1_ref, 0.0)
    else:
        y = jnp.dot(atted.astype(BF16), wm1_ref[:].astype(BF16),
                    preferred_element_type=jnp.float32)
    v1 = _kln(x + y + bm1_ref[:], ln1s_ref[:], ln1b_ref[:])

    # ---- cross-attention (keys/values pre-projected outside) ----
    if proj8:
        qx = _qdot_static(v1, act_scales[4], wq2_ref, sq2_ref, bq2_ref[:])
    else:
        qx = jnp.dot(v1.astype(BF16), wq2_ref[:].astype(BF16),
                     preferred_element_type=jnp.float32) + bq2_ref[:]
    ohs = []
    for h in range(heads):
        kh = kq_ref[:, h].reshape(N, Dh).astype(BF16)
        vh = vq_ref[:, h].reshape(N, Dh).astype(BF16)
        ohs.append(sdpa(qx[:, h * Dh:(h + 1) * Dh], kh, vh, cross_mask))
    atted = jnp.concatenate(ohs, axis=1)
    if proj8:
        y = _qdot_static(atted, act_scales[5], wm2_ref, sm2_ref, 0.0)
    else:
        y = jnp.dot(atted.astype(BF16), wm2_ref[:].astype(BF16),
                    preferred_element_type=jnp.float32)
    v2 = _kln(v1 + y + bm2_ref[:], ln2s_ref[:], ln2b_ref[:])

    # ---- FFN: int8/int4 x int8 -> int32 on the MXU ----
    if w4 >= 1:
        h1 = jnp.maximum(
            dot4(v2, act_scales[1], w1q_ref, s1_ref, b1_ref[:]),
            0.0)
        y = dot4(h1, act_scales[2], w2q_ref, s2_ref, b2_ref[:])
    elif act_scales is not None:
        h1 = jnp.maximum(
            _qdot_static(v2, act_scales[1], w1q_ref, s1_ref, b1_ref[:]), 0.0)
        y = _qdot_static(h1, act_scales[2], w2q_ref, s2_ref, b2_ref[:])
    else:
        h1 = jnp.maximum(_qdot(v2, w1q_ref, s1_ref, b1_ref[:]), 0.0)
        y = _qdot(h1, w2q_ref, s2_ref, b2_ref[:])
    v3 = _kln(v2 + y, ln3s_ref[:], ln3b_ref[:])

    o_ref[:] = v3.reshape(G, Lv, D).astype(o_ref.dtype)


def _sa_kernel_qffn(x_ref, pad_ref,
                    wqkv_ref, sqkv_ref, bqkv_ref,
                    wm_ref, sm_ref, bm_ref,
                    ln1s_ref, ln1b_ref,
                    w1q_ref, s1_ref, b1_ref, w2q_ref, s2_ref, b2_ref,
                    ln2s_ref, ln2b_ref, o_ref, *, heads: int, group: int,
                    scale: float, qkv_int8: bool = False, act_scales=None,
                    w4: int = 0, w4dq: bool = False):
    """bf16 SA-block megakernel with an int8 FFN (act_scales, w4 and
    w4dq as in ``_sga_kernel_qffn``; the SA proj tuple is
    (aqkv, a1, a2, am))."""
    assert w4 == 0 or act_scales is not None
    dot4 = _qdot_w4bf16 if w4dq else _qdot_static4
    proj8 = act_scales is not None and len(act_scales) >= 4
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

    if qkv_int8:
        if w4 >= 2:
            qkv = dot4(x, act_scales[0], wqkv_ref, sqkv_ref,
                                bqkv_ref[:])
        elif act_scales is not None:
            qkv = _qdot_static(x, act_scales[0], wqkv_ref, sqkv_ref,
                               bqkv_ref[:])
        else:
            qkv = _qdot(x, wqkv_ref, sqkv_ref, bqkv_ref[:])
    else:
        qkv = jnp.dot(x.astype(BF16), wqkv_ref[:].astype(BF16),
                      preferred_element_type=jnp.float32) + bqkv_ref[:]
    ohs = []
    for h in range(heads):
        qh = qkv[:, h * Dh:(h + 1) * Dh].astype(BF16)
        kh = qkv[:, D + h * Dh:D + (h + 1) * Dh].astype(BF16)
        vh = qkv[:, 2 * D + h * Dh:2 * D + (h + 1) * Dh].astype(BF16)
        if diag:
            ohs.append(diag_sdpa(qh, kh, vh, pad_add, G, Lq, scale))
            continue
        s = jax.lax.dot_general(
            qh, kh, dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32) * scale + mask_add
        m = jnp.max(s, axis=-1, keepdims=True)
        e = jnp.exp(s - m)
        att = (e / jnp.sum(e, axis=-1, keepdims=True)).astype(BF16)
        ohs.append(jnp.dot(att, vh, preferred_element_type=jnp.float32))
    atted = jnp.concatenate(ohs, axis=1)
    if proj8:
        y = _qdot_static(atted, act_scales[3], wm_ref, sm_ref, 0.0)
    else:
        y = jnp.dot(atted.astype(BF16), wm_ref[:].astype(BF16),
                    preferred_element_type=jnp.float32)
    x1 = _kln(x + y + bm_ref[:], ln1s_ref[:], ln1b_ref[:])

    if w4 >= 1:
        h1 = jnp.maximum(
            dot4(x1, act_scales[1], w1q_ref, s1_ref, b1_ref[:]),
            0.0)
        y = dot4(h1, act_scales[2], w2q_ref, s2_ref, b2_ref[:])
    elif act_scales is not None:
        h1 = jnp.maximum(
            _qdot_static(x1, act_scales[1], w1q_ref, s1_ref, b1_ref[:]), 0.0)
        y = _qdot_static(h1, act_scales[2], w2q_ref, s2_ref, b2_ref[:])
    else:
        h1 = jnp.maximum(_qdot(x1, w1q_ref, s1_ref, b1_ref[:]), 0.0)
        y = _qdot(h1, w2q_ref, s2_ref, b2_ref[:])
    x2 = _kln(x1 + y, ln2s_ref[:], ln2b_ref[:])

    o_ref[:] = x2.reshape(G, Lq, D).astype(o_ref.dtype)


def fused_qffn_sga_block(v, kq, vq, v_mask, q_mask, wp, qf, *,
                         num_heads: int, group: int = 4,
                         interpret: bool = False, act_scales=None,
                         w4dq: bool = False):
    """One whole SGA block: bf16 attention/projections (wp =
    prepare_sga_block_params layout), int8 FFN (qf = prepare_qffn_params).
    If qf carries ``wqkv_q`` (prepare_qffn_params(qkv_int8=True)), the
    self-attention qkv projection runs int8 too. Mirrors
    ops/sga_block.fused_sga_block(fused_proj=True).
    act_scales: optional (aqkv, a1, a2) Python floats from
    ``calibrate_qffn_act_scales`` — static per-tensor activation quant
    (no per-row max reductions); None = dynamic per-row.
    w4dq: int4 sites run bf16-dequant compute (``_qdot_w4bf16``,
    qffn levels 6/7) instead of grouped int8 matmuls."""
    import functools

    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    B, Lv, D = v.shape
    Lq = kq.shape[2]
    Dh = D // num_heads
    H = num_heads
    scale = 1.0 / (Dh ** 0.5)
    G = max(1, group)
    while B % G:
        G -= 1

    def flat_pad(mask, L):
        if mask is None:
            return jnp.zeros((B // G, 1, G * L), jnp.int8)
        return mask[:, 0, 0].astype(jnp.int8).reshape(B // G, 1, G * L)

    rep = lambda shape: pl.BlockSpec(shape, lambda b: (0,) * len(shape),
                                     memory_space=pltpu.VMEM)
    w4 = 2 if "wqkv_p" in qf else (1 if "w1_p" in qf else 0)
    assert w4 == 0 or act_scales is not None, \
        "int4 (w4) blocks ship only with calibrated static act scales"
    w1 = qf["w1_p"] if w4 else qf["w1_q"]
    s1 = qf["s1_g"] if w4 else qf["s1"]
    w2 = qf["w2_p"] if w4 else qf["w2_q"]
    s2 = qf["s2_g"] if w4 else qf["s2"]
    F = w1.shape[1]
    qkv_int8 = "wqkv_q" in qf or "wqkv_p" in qf
    wqkv = (qf["wqkv_p"] if w4 >= 2
            else qf["wqkv_q"] if "wqkv_q" in qf else wp["wqkv1"])
    sqkv = (qf["sqkv_g"] if w4 >= 2
            else qf["sqkv"] if "wqkv_q" in qf
            else jnp.ones((3 * D,), jnp.float32))
    if act_scales is not None:
        act_scales = tuple(float(a) for a in act_scales)
    proj8 = "wm1_q" in qf and act_scales is not None and len(act_scales) >= 6
    if not proj8 and act_scales is not None:
        act_scales = act_scales[:3]
    ones_d = jnp.ones((D,), jnp.float32)
    wm1 = qf["wm1_q"] if proj8 else wp["wm1_full"]
    sm1 = qf["sm1"] if proj8 else ones_d
    wq2 = qf["wq2_q"] if proj8 else wp["wq2_full"]
    sq2 = qf["sq2"] if proj8 else ones_d
    wm2 = qf["wm2_q"] if proj8 else wp["wm2_full"]
    sm2 = qf["sm2"] if proj8 else ones_d
    return pl.pallas_call(
        functools.partial(_sga_kernel_qffn, heads=H, group=G, scale=scale,
                          qkv_int8=qkv_int8, act_scales=act_scales, w4=w4,
                          w4dq=w4 > 0 and w4dq),
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
            rep(wqkv.shape), rep(sqkv.shape), rep((3 * D,)),
            rep((D, D)), rep((D,)), rep((D,)), rep((D,)), rep((D,)),
            rep((D, D)), rep((D,)), rep((D,)),
            rep((D, D)), rep((D,)), rep((D,)), rep((D,)), rep((D,)),
            rep(w1.shape), rep(s1.shape), rep((F,)),
            rep(w2.shape), rep(s2.shape), rep((D,)),
            rep((D,)), rep((D,)),
        ],
        out_specs=pl.BlockSpec((G, Lv, D), lambda b: (b, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, Lv, D), v.dtype),
        compiler_params=_q_compiler_params(interpret),
        interpret=interpret,
    )(v, kq, vq, flat_pad(v_mask, Lv), flat_pad(q_mask, Lq),
      wqkv, sqkv, wp["bqkv1"],
      wm1, sm1, wp["bm1"],
      wp["ln1_s"], wp["ln1_b"],
      wq2, sq2, wp["bq2_full"],
      wm2, sm2, wp["bm2"],
      wp["ln2_s"], wp["ln2_b"],
      w1, s1, qf["b1"], w2, s2, qf["b2"],
      wp["ln3_s"], wp["ln3_b"])


def fused_qffn_sa_block(x, x_mask, wp, qf, *, num_heads: int,
                        group: int = 0, interpret: bool = False,
                        act_scales=None, w4dq: bool = False):
    """One whole SA encoder block: bf16 attention (wp =
    prepare_sa_block_params layout), int8 FFN (qf). act_scales and
    w4dq as in ``fused_qffn_sga_block``."""
    import functools

    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    B, Lq, D = x.shape
    H = num_heads
    scale = 1.0 / ((D // H) ** 0.5)
    G = group if group > 0 else max(1, 128 // Lq)
    while B % G:
        G -= 1

    if x_mask is None:
        pad = jnp.zeros((B // G, 1, G * Lq), jnp.int8)
    else:
        pad = x_mask[:, 0, 0].astype(jnp.int8).reshape(B // G, 1, G * Lq)

    rep = lambda shape: pl.BlockSpec(shape, lambda b: (0,) * len(shape),
                                     memory_space=pltpu.VMEM)
    w4 = 2 if "wqkv_p" in qf else (1 if "w1_p" in qf else 0)
    assert w4 == 0 or act_scales is not None, \
        "int4 (w4) blocks ship only with calibrated static act scales"
    w1 = qf["w1_p"] if w4 else qf["w1_q"]
    s1 = qf["s1_g"] if w4 else qf["s1"]
    w2 = qf["w2_p"] if w4 else qf["w2_q"]
    s2 = qf["s2_g"] if w4 else qf["s2"]
    F = w1.shape[1]
    qkv_int8 = "wqkv_q" in qf or "wqkv_p" in qf
    wqkv = (qf["wqkv_p"] if w4 >= 2
            else qf["wqkv_q"] if "wqkv_q" in qf else wp["wqkv"])
    sqkv = (qf["sqkv_g"] if w4 >= 2
            else qf["sqkv"] if "wqkv_q" in qf
            else jnp.ones((3 * D,), jnp.float32))
    if act_scales is not None:
        act_scales = tuple(float(a) for a in act_scales)
    proj8 = "wm_q" in qf and act_scales is not None and len(act_scales) >= 4
    if not proj8 and act_scales is not None:
        act_scales = act_scales[:3]
    wm = qf["wm_q"] if proj8 else wp["wm"]
    sm = qf["sm"] if proj8 else jnp.ones((D,), jnp.float32)
    return pl.pallas_call(
        functools.partial(_sa_kernel_qffn, heads=H, group=G, scale=scale,
                          qkv_int8=qkv_int8, act_scales=act_scales, w4=w4,
                          w4dq=w4 > 0 and w4dq),
        grid=(B // G,),
        in_specs=[
            pl.BlockSpec((G, Lq, D), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, G * Lq), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            rep(wqkv.shape), rep(sqkv.shape), rep((3 * D,)),
            rep((D, D)), rep((D,)), rep((D,)), rep((D,)), rep((D,)),
            rep(w1.shape), rep(s1.shape), rep((F,)),
            rep(w2.shape), rep(s2.shape), rep((D,)),
            rep((D,)), rep((D,)),
        ],
        out_specs=pl.BlockSpec((G, Lq, D), lambda b: (b, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, Lq, D), x.dtype),
        compiler_params=_q_compiler_params(interpret),
        interpret=interpret,
    )(x, pad,
      wqkv, sqkv, wp["bqkv"],
      wm, sm, wp["bm"],
      wp["ln1_s"], wp["ln1_b"],
      w1, s1, qf["b1"], w2, s2, qf["b2"],
      wp["ln2_s"], wp["ln2_b"])


def make_quant_serving_fn(num_layers: int, num_heads: int,
                          megakernel: bool = False, group: int = 4,
                          interpret: bool = False):
    """Int8 serving forward over a quantize_params tree.

    megakernel=False: mirrors ops/serving.make_serving_fn's XLA path;
    every projection/FFN matmul runs int8, residual stream fp32.
    megakernel=True: every SA/SGA block runs through the fused int8
    block kernels (int8 weights VMEM-resident, in-register activation
    quant between sub-ops) — requires a quantize_params(megakernel=True)
    tree; group = samples packed per grid step (as the bf16 megakernel).
    """

    def forward(params, img_feat, ques_ix):
        q_mask = make_mask(ques_ix[..., None])
        v_mask = make_mask(img_feat)

        q = jnp.take(params["embedding"]["embedding"], ques_ix, axis=0)
        q = _lstm(params["lstm"], q)
        v = _qdense(params["img_feat_linear"], img_feat)

        bb = params["backbone"]
        if megakernel:
            for i in range(num_layers):
                q = fused_quant_sa_block(
                    q, q_mask, bb[f"enc_{i}"]["_mk"], num_heads=num_heads,
                    interpret=interpret)
            B, Lv, D = v.shape
            Lq = q.shape[1]
            Dh = D // num_heads
            for i in range(num_layers):
                p = bb[f"dec_{i}"]
                kv = _qdense(p["mhatt2"]["linear_kv"], q)
                kx, vx = jnp.split(kv, 2, axis=-1)
                sp = lambda t: t.reshape(B, Lq, num_heads, Dh).transpose(
                    0, 2, 1, 3)
                v = fused_quant_sga_block(
                    v, sp(kx), sp(vx), v_mask, q_mask, p["_mk"],
                    num_heads=num_heads, group=group, interpret=interpret)
        else:
            for i in range(num_layers):
                p = bb[f"enc_{i}"]
                att = _qmhatt_self(p["mhatt"], q, q_mask, num_heads)
                q = _std_layer_norm(p["norm1"], q + att)
                q = _std_layer_norm(p["norm2"],
                                    q + _qmlp(p["ffn"]["mlp"], q))

            # cross-attention k/v from the final encoder output, per layer
            for i in range(num_layers):
                p = bb[f"dec_{i}"]
                att = _qmhatt_self(p["mhatt1"], v, v_mask, num_heads)
                v = _std_layer_norm(p["norm1"], v + att)
                kv = _qdense(p["mhatt2"]["linear_kv"], q)
                kx, vx = jnp.split(kv, 2, axis=-1)
                qx = _qdense(p["mhatt2"]["linear_q"], v)
                atted = masked_attention_xla(
                    _split_heads(qx, num_heads),
                    _split_heads(kx, num_heads),
                    _split_heads(vx, num_heads), q_mask)
                B, Lv, D = v.shape
                atted = atted.transpose(0, 2, 1, 3).reshape(B, Lv, D)
                v = _std_layer_norm(
                    p["norm2"],
                    v + _qdense(p["mhatt2"]["linear_merge"], atted))
                v = _std_layer_norm(p["norm3"],
                                    v + _qmlp(p["ffn"]["mlp"], v))

        lang_flat = _qattflat(params["attflat_lang"], q, q_mask)
        img_flat = _qattflat(params["attflat_img"], v, v_mask)
        fused = _std_layer_norm(params["proj_norm"], lang_flat + img_flat)
        return _qdense(params["proj"], fused)

    return forward
