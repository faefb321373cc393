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
OPT-IN (``Predictor(quantize="int8")``) — the default serving path is
unchanged.

Reference parity anchor: core/model/net.py:299-375 (Net2 forward) — the
quantized engine computes the same function, to quantization error.
"""

from __future__ import annotations

from typing import Any, Dict

import jax
import jax.numpy as jnp

from mcan_vqa_tpu.models.layers import make_mask
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


def quantize_params(params: Dict[str, Any], num_layers: int) -> Dict[str, Any]:
    """One-time prep of a serving param tree for the int8 engine.

    Starts from the RAW model tree (model.init / checkpoint import, NOT
    ops.serving.prepare_params — fusion happens here). Produces, per
    attention block, fused qkv / kv int8 kernels (same fusion as
    prepare_params), int8 FFN / attflat / proj kernels, and leaves the
    embedding, LSTM and LayerNorm params untouched (LSTM stays bf16).
    """
    def fuse(block, names):
        return {
            "kernel": jnp.concatenate(
                [block[n]["kernel"] for n in names], axis=1),
            "bias": jnp.concatenate([block[n]["bias"] for n in names]),
        }

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


def make_quant_serving_fn(num_layers: int, num_heads: int):
    """Int8 serving forward over a quantize_params tree.

    Structure mirrors ops/serving.make_serving_fn's XLA path (the
    megakernel is bf16-only — int8 inside Mosaic is future work); every
    projection/FFN matmul runs int8. Residual stream fp32."""

    def forward(params, img_feat, ques_ix):
        q_mask = make_mask(ques_ix[..., None])
        v_mask = make_mask(img_feat)

        q = jnp.take(params["embedding"]["embedding"], ques_ix, axis=0)
        q = _lstm(params["lstm"], q)
        v = _qdense(params["img_feat_linear"], img_feat)

        bb = params["backbone"]
        for i in range(num_layers):
            p = bb[f"enc_{i}"]
            att = _qmhatt_self(p["mhatt"], q, q_mask, num_heads)
            q = _std_layer_norm(p["norm1"], q + att)
            q = _std_layer_norm(p["norm2"], q + _qmlp(p["ffn"]["mlp"], q))

        # cross-attention k/v from the final encoder output, per layer
        for i in range(num_layers):
            p = bb[f"dec_{i}"]
            att = _qmhatt_self(p["mhatt1"], v, v_mask, num_heads)
            v = _std_layer_norm(p["norm1"], v + att)
            kv = _qdense(p["mhatt2"]["linear_kv"], q)
            kx, vx = jnp.split(kv, 2, axis=-1)
            qx = _qdense(p["mhatt2"]["linear_q"], v)
            atted = masked_attention_xla(
                _split_heads(qx, num_heads), _split_heads(kx, num_heads),
                _split_heads(vx, num_heads), q_mask)
            B, Lv, D = v.shape
            atted = atted.transpose(0, 2, 1, 3).reshape(B, Lv, D)
            v = _std_layer_norm(
                p["norm2"], v + _qdense(p["mhatt2"]["linear_merge"], atted))
            v = _std_layer_norm(p["norm3"], v + _qmlp(p["ffn"]["mlp"], v))

        lang_flat = _qattflat(params["attflat_lang"], q, q_mask)
        img_flat = _qattflat(params["attflat_img"], v, v_mask)
        fused = _std_layer_norm(params["proj_norm"], lang_flat + img_flat)
        return _qdense(params["proj"], fused)

    return forward
