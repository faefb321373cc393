"""Fused serving engine: raw-params MCAN inference with Pallas kernels.

The linen module tree (models/net.py) is the training-time source of truth;
this module is the production *serving* path: one jitted function over the
raw parameter pytree that
  * runs every attention block through the fused masked-attention kernel
    (ops/masked_attention.py) — the [B, H, L, L] score tensors never touch
    HBM,
  * runs both AttFlat heads through the fused pooling kernel (ops/attflat.py),
  * keeps all Dense/LSTM matmuls in bf16 on the MXU.

Golden-tested against ``model.apply`` (tests/test_serving.py). bench.py
routes through here by default (fused-QKV XLA path, BENCH_SERVE=1) and for
the Pallas variants (BENCH_PALLAS=1 per-(batch,head), =2 batch-blocked).
"""

from __future__ import annotations

from typing import Any, Dict

import jax
import jax.numpy as jnp

from mcan_vqa_tpu.models.layers import make_mask
from mcan_vqa_tpu.ops.attflat import attflat_pallas
from mcan_vqa_tpu.ops.masked_attention import (
    masked_attention_pallas, masked_attention_pallas_batched,
    masked_attention_pallas_packed, masked_attention_xla)

BF16 = jnp.bfloat16

# Largest batch at which the mixed int8-FFN megakernels (qffn) with
# DYNAMIC per-row activation quant beat the all-bf16 ones. Same-session
# A/Bs at MCAN-small (docs/PERFORMANCE.md): win at B=1/8/64/256/512
# (+8.4% at 512), LOSS at B=1024 (34,964 vs 38,554; interleaved re-run
# 35,132 vs 38,419) — at very large batches the engine is
# stream-bandwidth-bound and the per-row quant VPU work only adds
# latency. STATIC calibrated scales have no per-row work, and measured
# a WIN at B=1024 (39,109 vs 38,419 interleaved same-process), so the
# gate only applies when qffn_act_scales is None. Batch size is static
# under jit, so the forward picks per compiled shape.
QFFN_MAX_BATCH = 512


def auto_sga_group(batch: int, explicit=None,
                   calibrated: bool = False,
                   hidden: int = 512) -> int:
    """Packing group (samples per megakernel grid step) for a compiled
    batch. Explicit wins; auto = 4 (latency-tuned), or 16 at
    B >= 1024 on the calibrated engines at hidden <= 512 (+1.2% at
    B=1024 AND B=2048, r5 interleaved medians). The width scoping is
    measured, not cautionary: at D=1024 g16 LOSES -3.3% (B=1024, 5
    interleaved rounds — wider rows shift the VMEM/softmax balance,
    the same reason the train-side auto group picks a smaller G at
    D=1024), and the bf16/dynamic twins were not swept, so both keep
    4. Always reduced to divide the batch."""
    g = explicit if explicit else (
        16 if batch >= 1024 and calibrated and hidden <= 512 else 4)
    while batch % g:
        g -= 1
    return g


def _dense(p: Dict[str, Any], x: jnp.ndarray) -> jnp.ndarray:
    # .astype is a no-op when prepare_params already cast the kernel
    return jnp.dot(x.astype(BF16), p["kernel"].astype(BF16),
                   preferred_element_type=jnp.float32) + p["bias"]


def _std_layer_norm(p: Dict[str, Any], x: jnp.ndarray,
                    out_dtype=jnp.float32) -> jnp.ndarray:
    x32 = x.astype(jnp.float32)
    dim = x.shape[-1]
    mean = jnp.mean(x32, axis=-1, keepdims=True)
    centered = x32 - mean
    var = jnp.sum(centered * centered, axis=-1, keepdims=True) / (dim - 1)
    out = p["scale"] * centered / (jnp.sqrt(var) + 1e-6) + p["bias"]
    return out.astype(out_dtype)


def _mlp(p: Dict[str, Any], x: jnp.ndarray) -> jnp.ndarray:
    h = jax.nn.relu(_dense(p["FCLayer_0"]["Dense_0"], x))
    return _dense(p["Dense_0"], h)


def _lstm(p: Dict[str, Any], x: jnp.ndarray) -> jnp.ndarray:
    B, L, _ = x.shape
    H = p["w_hh"].shape[0]
    x_proj = (jnp.dot(x.astype(BF16), p["w_ih"].astype(BF16),
                      preferred_element_type=jnp.float32)
              + p["b_ih"] + p["b_hh"])
    w_hh = p["w_hh"].astype(BF16)

    def step(carry, xp_t):
        h, c = carry
        gates = xp_t + jnp.dot(h.astype(BF16), w_hh,
                               preferred_element_type=jnp.float32)
        i, f, g, o = jnp.split(gates, 4, axis=-1)
        c = jax.nn.sigmoid(f) * c + jax.nn.sigmoid(i) * jnp.tanh(g)
        h = jax.nn.sigmoid(o) * jnp.tanh(c)
        return (h, c), h

    init = (jnp.zeros((B, H), jnp.float32), jnp.zeros((B, H), jnp.float32))
    _, hs = jax.lax.scan(step, init, jnp.swapaxes(x_proj, 0, 1))
    return jnp.swapaxes(hs, 0, 1)


def fuse_projections(block: Dict[str, Any], names) -> Dict[str, Any]:
    """Concat per-projection Dense params into one fused kernel/bias
    (W_q|W_k|W_v -> [D, 3D], W_k|W_v -> [D, 2D]). jnp (not np): params
    may live on device; keep the concat there. The ONE fusion layout —
    serving, classifier, and int8 param prep all call here."""
    return {
        "kernel": jnp.concatenate(
            [block[n]["kernel"] for n in names], axis=1),
        "bias": jnp.concatenate([block[n]["bias"] for n in names]),
    }


def decode_qffn_level(qffn, D: int):
    """qffn level -> (qkv_int8, proj_int8, w4) quantization set — shared
    by the main and classifier param preps so the two engines can never
    decode a level differently. Levels (docs/PERFORMANCE.md): 1/True =
    int8 FFN (+ qkv at D>=1024), 2 = +qkv everywhere, 3 = +merge/cross-q
    projections (static scales only), 4/5 = int4 FFN / FFN+qkv weight
    streaming, 6/7 = the same int4 weights with bf16-dequant compute."""
    qkv8 = int(qffn) >= 2 or D >= 1024
    proj8 = int(qffn) >= 3
    w4 = {4: 1, 5: 2, 6: 1, 7: 2}.get(int(qffn), 0)
    return qkv8, proj8, w4


def megakernel_vmem_ok(D: int, F: int) -> bool:
    """True when one decoder block's weights fit the megakernel's VMEM
    budget in bf16. The kernels raise the scoped-VMEM cap above the 16 MB
    default (ops/sga_block._compiler_params), so MCAN-large (~28.6 MB
    block weights) qualifies too; the 48 MB budget leaves room for the
    stream blocks, double-buffered I/O and scratch."""
    return (6 * D * D + 2 * D * F) * 2 <= 48 * 1024 * 1024


def prepare_params(params: Dict[str, Any], num_layers: int,
                   cast_bf16: bool = True,
                   megakernel: bool = True,
                   num_heads: int = 8,
                   alllayer: bool = True,
                   qffn: bool = False) -> Dict[str, Any]:
    """One-time param prep: fuse each attention block's projections.

    Self-attention (q=k=v source): W_q|W_k|W_v -> one [D, 3D] kernel.
    Cross-attention (k=v source): W_k|W_v -> one [D, 2D] kernel.
    Fewer, larger matmuls per block — better MXU fill and fewer dispatches.
    ``make_serving_fn``'s forward auto-detects the fused entries.

    megakernel: additionally attach each block's megakernel weight layout
    (``_mk`` entries, ops/sga_block.py) so the relayout happens ONCE here
    instead of on every forward call (~42 MB of weight concats per call at
    MCAN-small otherwise). Skipped automatically when the block exceeds
    the kernel's VMEM budget (MCAN-large).
    qffn: additionally attach per-block int8 FFN weights (``_qffn``
    entries, ops/quant.prepare_qffn_params) for the mixed int8-FFN
    megakernels (make_serving_fn(qffn=True)). qffn=True/1 picks the
    quantization set by width: FFN-only at D < 1024; at D >= 1024 the
    self-attention qkv projections join the int8 path (same-session
    A/Bs, docs/PERFORMANCE.md: qkv-int8 is neutral at D=512 — 43.4K vs
    43.6K — and +7.2% at D=1024 — 17,027 vs 15,890). qffn=2 forces
    qkv-int8 at any width; accuracy for both levels is bounded by
    tests/test_quant.py + tests/test_full_size_parity.py. qffn=3
    additionally attaches int8 merge/cross-q projection weights —
    usable ONLY with static calibrated scales
    (make_serving_fn(qffn_act_scales=...) 4-/6-tuples; without them
    the kernels keep the bf16 projections). qffn=4/5 are the
    weight-streaming LATENCY levels: level 3 with the FFN weights
    (4) / FFN+qkv weights (5) nibble-packed to int4 with grouped
    scales (ops/quant._quant_w4) — halves those sites' HBM bytes,
    which is what bounds B=1 latency; static calibrated scales are
    REQUIRED (the kernels have no dynamic-quant int4 path).
    """
    fuse = fuse_projections
    out = jax.tree.map(lambda x: x, params)  # shallow-ish copy
    bb = out["backbone"]
    for i in range(num_layers):
        enc = bb[f"enc_{i}"]["mhatt"]
        enc["linear_qkv"] = fuse(enc, ("linear_q", "linear_k", "linear_v"))
        dec1 = bb[f"dec_{i}"]["mhatt1"]
        dec1["linear_qkv"] = fuse(dec1, ("linear_q", "linear_k", "linear_v"))
        dec2 = bb[f"dec_{i}"]["mhatt2"]
        dec2["linear_kv"] = fuse(dec2, ("linear_k", "linear_v"))
    if cast_bf16:
        # pre-cast matmul weights: halves per-forward param HBM reads.
        # LayerNorm scales/biases and all biases stay fp32 (added post-MXU).
        def cast(path, leaf):
            names = [getattr(p, "key", str(p)) for p in path]
            if names[-1] == "kernel" or names[-1] in ("w_ih", "w_hh"):
                return leaf.astype(jnp.bfloat16)
            return leaf
        out = jax.tree_util.tree_map_with_path(cast, out)
    if megakernel:
        bb = out["backbone"]
        D = bb["dec_0"]["mhatt1"]["linear_q"]["kernel"].shape[0]
        F = bb["dec_0"]["ffn"]["mlp"]["FCLayer_0"]["Dense_0"][
            "kernel"].shape[1]
        if megakernel_vmem_ok(D, F):
            from mcan_vqa_tpu.ops.sga_block import (
                decoder_vmem_ok, prepare_sa_block_params,
                prepare_sga_block_params, prepare_sga_decoder_params)
            for i in range(num_layers):
                bb[f"enc_{i}"]["_mk"] = prepare_sa_block_params(
                    bb[f"enc_{i}"])
                bb[f"dec_{i}"]["_mk"] = prepare_sga_block_params(
                    bb[f"dec_{i}"], num_heads)
            # The all-layer (mode 3/4/5) stacked layouts cost ~86 MB of
            # duplicated weights; skip them (alllayer=False) when only the
            # per-block default engine will run — e.g. the Predictor, whose
            # exported artifacts would otherwise carry dead arrays.
            if alllayer and decoder_vmem_ok(D, F, num_layers):
                from mcan_vqa_tpu.ops.sga_block import (
                    prepare_sa_encoder_params)
                bb["_mk_dec"] = prepare_sga_decoder_params(bb, num_layers)
                bb["_mk_enc"] = prepare_sa_encoder_params(bb, num_layers)
            if qffn:
                from mcan_vqa_tpu.ops.quant import prepare_qffn_params
                qkv8, proj8, w4 = decode_qffn_level(qffn, D)
                for i in range(num_layers):
                    bb[f"enc_{i}"]["_qffn"] = prepare_qffn_params(
                        bb[f"enc_{i}"], qkv_int8=qkv8, proj_int8=proj8,
                        w4=w4)
                    bb[f"dec_{i}"]["_qffn"] = prepare_qffn_params(
                        bb[f"dec_{i}"], qkv_int8=qkv8, proj_int8=proj8,
                        w4=w4)
    return out


def prune_prepared_params(params: Dict[str, Any],
                          num_layers: int) -> Dict[str, Any]:
    """Drop the per-block weights the shipped (mode-2 megakernel) forward
    never reads.

    ``prepare_params`` keeps the raw per-name projections, the fused
    qkv/kv copies, AND the ``_mk``/``_qffn`` layouts side by side so one
    tree can serve every engine variant. The production engine
    (``make_serving_fn(use_sga_megakernel=2)`` — Predictor "fused",
    Trainer fused eval, bench default) reads ONLY ``_mk``/``_qffn`` per
    block plus the decoder's fused cross ``linear_kv``; everything else
    in the blocks is dead HBM and dead artifact bytes. Measured with
    tools/param_footprint.py: MCAN-small 262 -> 142 MB, MCAN-large
    1010 -> 529 MB (the bf16 FFN kernels stay: compiled shapes past
    QFFN_MAX_BATCH fall back to them).

    Only valid for mode 2: the per-sub-op fallback (mode 0) and the
    all-layer experiments (modes 3/4/5) read the raw entries — keep the
    unpruned tree for those. Raises if any block lacks its ``_mk``
    layout (dims outside the megakernel VMEM envelope)."""
    bb = params["backbone"]
    for i in range(num_layers):
        if "_mk" not in bb[f"enc_{i}"] or "_mk" not in bb[f"dec_{i}"]:
            raise ValueError(
                "prune_prepared_params needs the _mk megakernel layouts "
                "on every block (prepare_params(megakernel=True) within "
                "the VMEM envelope)")
    # Inside the decoder _mk, the per-head (variant-1) layouts duplicate
    # the fused-projection set the shipped kernel actually reads
    # (fused_sga_block(fused_proj=True) / fused_qffn_sga_block pass only
    # wqkv1/wm1_full/wq2_full/wm2_full + biases/LN/FFN) — another
    # 6*D^2 bf16 per block of dead weight.
    v1_only = ("wq1", "wk1", "wv1", "bq1", "bk1", "bv1",
               "wm1", "wq2", "bq2", "wm2")
    out = {k: v for k, v in params.items() if k != "backbone"}
    nbb: Dict[str, Any] = {}
    for i in range(num_layers):
        enc, dec = bb[f"enc_{i}"], bb[f"dec_{i}"]
        nbb[f"enc_{i}"] = {k: enc[k] for k in ("_mk", "_qffn") if k in enc}
        kept = {k: dec[k] for k in ("_qffn",) if k in dec}
        kept["_mk"] = {k: v for k, v in dec["_mk"].items()
                       if k not in v1_only}
        kept["mhatt2"] = {"linear_kv": dec["mhatt2"]["linear_kv"]}
        nbb[f"dec_{i}"] = kept
    out["backbone"] = nbb
    return out


def prepare_classifier_params(params: Dict[str, Any], num_layers: int,
                              cast_bf16: bool = True,
                              megakernel: bool = True,
                              qffn: bool = True) -> Dict[str, Any]:
    """One-time param prep for the CLASSIFIER serving engine: fuse each SA
    block's q/k/v projections and attach the SA-block megakernel layouts
    (``_mk``). ClassifierNet tree: img_feat_linear / backbone.enc_i /
    attflat_img / proj_norm / proj (models/net.py ClassifierNet;
    reference core/model/net.py:140-196)."""
    fuse = fuse_projections
    out = jax.tree.map(lambda x: x, params)
    bb = out["backbone"]
    for i in range(num_layers):
        enc = bb[f"enc_{i}"]["mhatt"]
        enc["linear_qkv"] = fuse(enc, ("linear_q", "linear_k", "linear_v"))
    if cast_bf16:
        def cast(path, leaf):
            names = [getattr(p, "key", str(p)) for p in path]
            if names[-1] == "kernel":
                return leaf.astype(jnp.bfloat16)
            return leaf
        out = jax.tree_util.tree_map_with_path(cast, out)
    if megakernel:
        bb = out["backbone"]
        D = bb["enc_0"]["mhatt"]["linear_q"]["kernel"].shape[0]
        F = bb["enc_0"]["ffn"]["mlp"]["FCLayer_0"]["Dense_0"][
            "kernel"].shape[1]
        if megakernel_vmem_ok(D, F):
            from mcan_vqa_tpu.ops.sga_block import prepare_sa_block_params
            for i in range(num_layers):
                bb[f"enc_{i}"]["_mk"] = prepare_sa_block_params(bb[f"enc_{i}"])
            if qffn:
                from mcan_vqa_tpu.ops.quant import prepare_qffn_params
                qkv8, proj8, w4 = decode_qffn_level(qffn, D)
                for i in range(num_layers):
                    bb[f"enc_{i}"]["_qffn"] = prepare_qffn_params(
                        bb[f"enc_{i}"], qkv_int8=qkv8, proj_int8=proj8,
                        w4=w4)
    return out


def prune_classifier_params(params: Dict[str, Any],
                            num_layers: int) -> Dict[str, Any]:
    """Classifier twin of ``prune_prepared_params``: the megakernel path
    of ``make_classifier_serving_fn`` reads only ``_mk``/``_qffn`` per SA
    block (no cross-attention, so nothing else survives)."""
    bb = params["backbone"]
    for i in range(num_layers):
        if "_mk" not in bb[f"enc_{i}"]:
            raise ValueError(
                "prune_classifier_params needs the _mk layouts on every "
                "block (prepare_classifier_params(megakernel=True) within "
                "the VMEM envelope)")
    out = {k: v for k, v in params.items() if k != "backbone"}
    out["backbone"] = {
        f"enc_{i}": {k: bb[f"enc_{i}"][k] for k in ("_mk", "_qffn")
                     if k in bb[f"enc_{i}"]}
        for i in range(num_layers)}
    return out


def prepare_production_classifier_params(params: Dict[str, Any],
                                         num_layers: int, *,
                                         qffn=True) -> Dict[str, Any]:
    """Classifier twin of ``prepare_production_params``."""
    prepared = prepare_classifier_params(params, num_layers, qffn=qffn)
    try:
        prepared = prune_classifier_params(prepared, num_layers)
    except ValueError:
        pass  # outside the megakernel envelope: per-sub-op fallback
    return prepared


def build_production_classifier_engine(params: Dict[str, Any],
                                       num_layers: int, num_heads: int, *,
                                       qffn=None, act_scale_inputs=None,
                                       act_scales=None,
                                       interpret=None, **serving_kwargs):
    """Classifier twin of ``build_production_engine`` — the ONE
    construction path for the image-only SA-megakernel serving engine
    (Trainer classifier eval, tools/bench_classifier_serve.py).
    act_scale_inputs: optional img_feat array for static scales.
    act_scales: optional PRECOMPUTED scales ({"enc_i": (aqkv, a1, a2)}
    python floats — calibrate_classifier_act_scales output / the
    Trainer's checkpoint side file); mutually exclusive with
    act_scale_inputs. -> (forward, prepared_params)."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    assert act_scale_inputs is None or act_scales is None, \
        "pass a calibration batch OR precomputed scales, not both"
    if qffn is None:
        qffn = 3 if (act_scale_inputs is not None
                     or act_scales is not None) else True
    if int(qffn) >= 4 and act_scale_inputs is None and act_scales is None:
        raise ValueError(
            "qffn levels 4-7 (int4 weight streaming) require a "
            "calibration batch (act_scale_inputs) or precomputed "
            "act_scales — the int4 kernels have no dynamic-quant path")
    w4dq = int(qffn) >= 6
    prepared = prepare_production_classifier_params(params, num_layers,
                                                    qffn=qffn)
    if (act_scale_inputs is not None or act_scales is not None) and qffn \
            and "_mk" not in prepared["backbone"]["enc_0"]:
        import warnings
        warnings.warn(
            "activation-scale calibration ignored: classifier dims are "
            "outside the megakernel VMEM envelope (no int8 quant sites)")
        act_scale_inputs = act_scales = None
    if act_scales is not None and qffn:
        from mcan_vqa_tpu.ops.quant import _check_scales
        act_scales = _check_scales(
            {k: tuple(float(x) for x in v) for k, v in act_scales.items()})
    elif act_scale_inputs is not None and qffn:
        from mcan_vqa_tpu.ops.quant import (
            calibrate_classifier_act_scales)
        act_scales = calibrate_classifier_act_scales(
            prepared, act_scale_inputs, num_layers, num_heads, w4dq=w4dq)
    else:
        act_scales = None
    forward = make_classifier_serving_fn(num_layers, num_heads,
                                         bf16_stream=True, qffn=bool(qffn),
                                         qffn_act_scales=act_scales,
                                         qffn_w4dq=w4dq,
                                         interpret=interpret,
                                         **serving_kwargs)
    return forward, prepared


def make_classifier_serving_fn(num_layers: int, num_heads: int,
                               bf16_stream: bool = True,
                               use_sa_megakernel: bool = True,
                               interpret: bool = False,
                               qffn: bool = True,
                               qffn_act_scales=None,
                               qffn_w4dq: bool = False):
    """Build forward(params, img_feat) -> logits [B, A] for ClassifierNet.

    The image-only twin of ``make_serving_fn``: each SA encoder block runs
    through the fused SA-block megakernel (the [B, 60, D] image-stream
    geometry the SGA megakernel engine already wins on), AttFlat/LN/proj
    in XLA. Golden-tested against ``model.apply``
    (tests/test_serving.py::TestClassifierServing). Reference parity
    anchor: core/model/net.py:140-196 (ClassifierNet forward).
    qffn_act_scales: optional {"enc_i": (aqkv, a1, a2)} static activation
    scales (see make_serving_fn)."""
    stream = jnp.bfloat16 if bf16_stream else jnp.float32

    def forward(params, img_feat):
        v_mask = make_mask(img_feat)
        v = _dense(params["img_feat_linear"], img_feat).astype(stream)
        bb = params["backbone"]
        mk = use_sa_megakernel
        if mk:
            D = v.shape[-1]
            enc0 = bb["enc_0"]
            F_ff = (enc0["_mk"]["w1"].shape[1] if "_mk" in enc0
                    else enc0["ffn"]["mlp"]["FCLayer_0"]["Dense_0"][
                        "kernel"].shape[1])
            mk = megakernel_vmem_ok(D, F_ff)
        if mk:
            from mcan_vqa_tpu.ops.sga_block import (fused_sa_block,
                                                    prepare_sa_block_params)
            for i in range(num_layers):
                p = bb[f"enc_{i}"]
                wp = p["_mk"] if "_mk" in p else prepare_sa_block_params(p)
                # the B>QFFN_MAX_BATCH lift applies only when THIS block
                # has baked scales (a partial scales dict must not run
                # dynamic quant in the regime the gate exists to avoid)
                scales_i = (qffn_act_scales or {}).get(f"enc_{i}")
                if qffn and "_qffn" in p and (
                        v.shape[0] <= QFFN_MAX_BATCH
                        or scales_i is not None):
                    from mcan_vqa_tpu.ops.quant import fused_qffn_sa_block
                    v = fused_qffn_sa_block(
                        v, v_mask, wp, p["_qffn"], num_heads=num_heads,
                        interpret=interpret, act_scales=scales_i,
                        w4dq=qffn_w4dq)
                else:
                    v = fused_sa_block(v, v_mask, wp, num_heads=num_heads,
                                       interpret=interpret)
        else:
            for i in range(num_layers):
                p = bb[f"enc_{i}"]
                att = _mhatt(p["mhatt"], v, v, v, v_mask, num_heads,
                             False, interpret)
                v = _std_layer_norm(p["norm1"], v + att.astype(stream),
                                    out_dtype=stream)
                v = _std_layer_norm(
                    p["norm2"], v + _mlp(p["ffn"]["mlp"], v).astype(stream),
                    out_dtype=stream)
        img_flat, _ = _attflat(params["attflat_img"], v, v_mask, False,
                               interpret)
        fused = _std_layer_norm(params["proj_norm"], img_flat)
        return _dense(params["proj"], fused)

    return forward


def _mhatt(p, v, k, q, mask, num_heads: int, use_pallas: bool,
           interpret: bool, merge: bool = True):
    B, Lq, D = q.shape
    Lk = k.shape[1]
    Dh = D // num_heads

    def split(x, L):
        return x.reshape(B, L, num_heads, Dh).transpose(0, 2, 1, 3)

    if "linear_qkv" in p and q is k and k is v:
        qkv = _dense(p["linear_qkv"], q)                 # [B, L, 3D]
        qx, kx, vx = jnp.split(qkv, 3, axis=-1)
        qp, kp, vp = split(qx, Lq), split(kx, Lk), split(vx, Lk)
    elif "linear_kv" in p:
        kv = _dense(p["linear_kv"], k)                   # [B, Lk, 2D]
        kx, vx = jnp.split(kv, 2, axis=-1)
        kp, vp = split(kx, Lk), split(vx, Lk)
        qp = split(_dense(p["linear_q"], q), Lq)
    else:
        vp = split(_dense(p["linear_v"], v), Lk)
        kp = split(_dense(p["linear_k"], k), Lk)
        qp = split(_dense(p["linear_q"], q), Lq)
    if use_pallas == "batched":
        atted = masked_attention_pallas_batched(qp, kp, vp, mask,
                                                interpret=interpret)
    elif use_pallas == "packed":
        atted = masked_attention_pallas_packed(qp, kp, vp, mask,
                                               interpret=interpret)
    elif use_pallas:
        atted = masked_attention_pallas(qp, kp, vp, mask, interpret=interpret)
    else:
        atted = masked_attention_xla(qp, kp, vp, mask)
    atted = atted.transpose(0, 2, 1, 3).reshape(B, Lq, D)
    if not merge:
        return atted  # caller fuses linear_merge + residual + LN
    return _dense(p["linear_merge"], atted)


def _qdense_static(site, x, a: float):
    """Static-int8 XLA matmul for a ``_q8aux`` site (the aux matmuls
    live OUTSIDE the Pallas megakernels): quantize the activation with
    the calibrated per-tensor scale, one int8 MXU matmul, per-channel
    dequant epilogue — half the weight-stream bytes of the bf16 path,
    which is what bounds B=1 latency (docs/PERFORMANCE.md)."""
    xq = jnp.clip(jnp.round(x.astype(jnp.float32) * (1.0 / a)),
                  -127, 127).astype(jnp.int8)
    y = jax.lax.dot_general(xq, site["w_q"],
                            dimension_numbers=(((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.int32)
    return y.astype(jnp.float32) * (a * site["w_s"]) + site["b"]


def _cross_kv_q8(site, q, num_heads: int, a: float):
    """``_cross_kv`` against a static-int8 ``_q8aux`` kv site."""
    B, Lq, D = q.shape
    Dh = D // num_heads
    kv = _qdense_static(site, q.reshape(B * Lq, D),
                        a).reshape(B, Lq, 2 * D)
    kx, vx = jnp.split(kv, 2, axis=-1)

    def split(x):
        return x.reshape(B, Lq, num_heads, Dh).transpose(0, 2, 1, 3)
    return split(kx), split(vx)


def _attflat(p, x, mask, use_pallas: bool, interpret: bool, q8=None):
    if use_pallas:
        out, att = attflat_pallas(
            x, mask,
            p["mlp"]["FCLayer_0"]["Dense_0"]["kernel"],
            p["mlp"]["FCLayer_0"]["Dense_0"]["bias"],
            p["mlp"]["Dense_0"]["kernel"], p["mlp"]["Dense_0"]["bias"],
            p["linear_merge"]["kernel"], p["linear_merge"]["bias"],
            interpret=interpret)
        return out, att
    logits = _mlp(p["mlp"], x)
    logits = jnp.where(mask[:, 0, 0, :, None], -1e9, logits)
    att = jax.nn.softmax(logits.astype(jnp.float32), axis=1)
    pooled = jnp.einsum("blg,bld->bgd", att.astype(BF16), x.astype(BF16),
                        preferred_element_type=jnp.float32)
    pooled = pooled.reshape(x.shape[0], -1)
    if q8 is not None:
        site, a = q8
        return _qdense_static(site, pooled, a), att
    return _dense(p["linear_merge"], pooled), att


def _cross_kv(p, q, num_heads):
    """Pre-project cross-attention keys/values -> [B, H, Lq, Dh]."""
    B, Lq, D = q.shape
    Dh = D // num_heads
    if "linear_kv" in p:
        kv = _dense(p["linear_kv"], q)
        kx, vx = jnp.split(kv, 2, axis=-1)
    else:
        kx = _dense(p["linear_k"], q)
        vx = _dense(p["linear_v"], q)
    def split(x):
        return x.reshape(B, Lq, num_heads, Dh).transpose(0, 2, 1, 3)
    return split(kx), split(vx)


def prepare_production_params(params: Dict[str, Any], num_layers: int,
                              num_heads: int, *, qffn=True,
                              alllayer: bool = False, sga_mode: int = 2,
                              prune: bool = True) -> Dict[str, Any]:
    """Param prep for the shipped serving program: megakernel layouts
    attached, raw/duplicate projections pruned (mode-2 tree). The
    engine-building half lives in ``build_production_engine``; this half
    is separate because the Trainer re-prepares params per eval call
    (mid-training weights move) while reusing one compiled engine."""
    prepared = prepare_params(params, num_layers, num_heads=num_heads,
                              alllayer=alllayer, qffn=qffn)
    if prune and sga_mode == 2 and not alllayer:
        try:
            prepared = prune_prepared_params(prepared, num_layers)
        except ValueError:
            pass  # dims outside the megakernel VMEM envelope: the
            #       forward's mode-0 fallback reads the raw entries
    return prepared


def build_production_engine(params: Dict[str, Any], num_layers: int,
                            num_heads: int, *, qffn=None,
                            act_scale_inputs=None, act_scales=None,
                            q8aux: bool = False,
                            interpret=None,
                            prune: bool = True, sga_mode: int = 2,
                            alllayer: bool = False,
                            bf16_stream: bool = True,
                            use_pallas_ffn: bool = True,
                            **serving_kwargs):
    """ONE construction path for the shipped VQA serving engine.

    The Predictor, bench.py, the interleaved A/B tool, and the on-chip
    accuracy canary all serve THIS program; hand-copying the
    prepare -> prune -> calibrate -> make_serving_fn recipe at each site
    let the benched program drift from the shipped one (the round-2
    failure mode), so they all call here instead.

    params: the raw MCANet tree. qffn: None picks the production
    default — dynamic int8-FFN (level 1/width-auto via ``True``), or
    level 3 (int8 at every projection) when a calibration batch or
    precomputed scales are given; an int forces a level, 0 the all-bf16
    kernels. Levels 4/5 (int4 FFN / int4 FFN+qkv weight streaming — the
    B=1 latency engine) REQUIRE a calibration batch or precomputed
    scales; levels 6/7 store the same int4 weights but run them with
    bf16-dequant compute (ops/quant._qdot_w4bf16 — no activation quant
    at the int4 sites, one matmul instead of the per-K-group loop).
    act_scale_inputs: optional (img_feat, ques_ix) arrays — bakes static
    activation scales (ops.quant.calibrate_qffn_act_scales).
    act_scales: optional PRECOMPUTED scales dict ({"enc_i"/"dec_i":
    (aqkv, a1, a2)} python floats — what calibrate_qffn_act_scales
    returns and the Trainer stores next to its final checkpoint); skips
    the calibration replay entirely. Mutually exclusive with
    act_scale_inputs. interpret: None = off-TPU autodetect.
    q8aux: additionally run the AUX weight sites — decoder cross k/v,
    both AttFlat merges, the answer head — with static-int8 weights
    (ops/quant.prepare_q8aux_params): the largest bf16 streams left
    outside the megakernels in the B=1 weight-bound regime. Requires a
    calibration batch, or precomputed act_scales that include the
    "aux" tuple.
    serving_kwargs pass through to ``make_serving_fn`` (experiment
    knobs: sga_group, use_pallas_attflat, ...).

    -> (forward, prepared_params)."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    assert act_scale_inputs is None or act_scales is None, \
        "pass a calibration batch OR precomputed scales, not both"
    if qffn is None:
        qffn = 3 if (act_scale_inputs is not None
                     or act_scales is not None) else True
    if int(qffn) >= 4 and act_scale_inputs is None and act_scales is None:
        raise ValueError(
            "qffn levels 4-7 (int4 weight streaming) require a "
            "calibration batch (act_scale_inputs) or precomputed "
            "act_scales — the int4 kernels have no dynamic-quant path")
    w4dq = int(qffn) >= 6
    if q8aux and act_scale_inputs is None and (
            act_scales is None or "aux" not in act_scales):
        raise ValueError(
            "q8aux requires a calibration batch (act_scale_inputs) or "
            "precomputed act_scales that include the \"aux\" tuple")
    if q8aux and not qffn:
        # every act-scales branch below is gated on a truthy qffn level:
        # with qffn=0 the scales would be dropped and the aux sites
        # silently never activate while ~10-46 MB of dead _q8aux weights
        # ride the prepared tree
        raise ValueError(
            "q8aux requires a quantized serving level (qffn >= 1, the "
            "aux sites share its static-scale machinery); got qffn=0")
    if q8aux and sga_mode not in (1, 2, True):
        # only the per-block megakernel paths consume the decoder
        # cross-kv aux site; mode 0 skips ALL aux sites and modes 3/4/5
        # run bf16 cross-kv the aux scales were not calibrated against —
        # both silently, so refuse the combination instead
        raise ValueError(
            f"q8aux applies to the per-block megakernel engines "
            f"(sga_mode 1/2), got sga_mode={sga_mode}")
    prepared = prepare_production_params(params, num_layers, num_heads,
                                         qffn=qffn, alllayer=alllayer,
                                         sga_mode=sga_mode, prune=prune)
    if q8aux:
        from mcan_vqa_tpu.ops.quant import prepare_q8aux_params
        prepared["_q8aux"] = prepare_q8aux_params(prepared, num_layers)
    if (act_scale_inputs is not None or act_scales is not None) and qffn \
            and "_mk" not in prepared["backbone"]["enc_0"]:
        import warnings
        warnings.warn(
            "activation-scale calibration ignored: model dims are outside "
            "the megakernel VMEM envelope, the engine falls back to the "
            "per-sub-op path (no int8 quant sites)")
        act_scale_inputs = act_scales = None
        prepared.pop("_q8aux", None)
    if act_scales is not None and qffn:
        from mcan_vqa_tpu.ops.quant import _check_scales
        act_scales = _check_scales(
            {k: tuple(float(x) for x in v) for k, v in act_scales.items()})
    elif act_scale_inputs is not None and qffn:
        from mcan_vqa_tpu.ops.quant import calibrate_qffn_act_scales
        img, ques = act_scale_inputs
        act_scales = calibrate_qffn_act_scales(
            prepared, img, ques, num_layers, num_heads, w4dq=w4dq)
    else:
        act_scales = None
    serving_kwargs.setdefault("use_pallas", False)
    forward = make_serving_fn(num_layers, num_heads,
                              use_pallas_ffn=use_pallas_ffn,
                              use_sga_megakernel=sga_mode,
                              bf16_stream=bf16_stream, qffn=bool(qffn),
                              qffn_act_scales=act_scales,
                              qffn_w4dq=w4dq,
                              interpret=interpret, **serving_kwargs)
    return forward, prepared


def make_serving_fn(num_layers: int, num_heads: int,
                    use_pallas=True, interpret: bool = False,
                    bf16_stream: bool = False,
                    use_pallas_ffn: bool = False,
                    use_sga_megakernel: bool = False,
                    sga_group=None,
                    use_pallas_attflat: bool = False,
                    qffn: bool = False,
                    qffn_act_scales=None,
                    qffn_w4dq: bool = False):
    """Build forward(params, img_feat, ques_ix) -> logits [B, A].

    params: the MCANet param pytree (model.init(...)['params'] or a
    checkpoint import). use_pallas: False (XLA), True (per-(batch,head)
    fused kernel), "batched" (batch-blocked), or "packed" (block-diagonal
    G-samples-per-MXU-tile kernel).
    bf16_stream: carry residuals in bf16 between blocks (LN stats stay
    fp32) — ~3% faster, ~1e-2 logit perturbation; opt-in.
    use_pallas_ffn: run each FFN block through the fused
    matmul+relu+matmul+residual+LN kernel (ops/fused_ffn.py).
    use_sga_megakernel: run each ENTIRE decoder block through the fused
    SGA megakernel (ops/sga_block.py) — the image stream never leaves
    VMEM inside a block; overrides the per-sub-op kernels for the
    decoder. 1/True = head-major stacked weights; 2 = fused-projection
    variant (fewer, larger matmuls, per-head lane slices); 3 = the
    ALL-LAYER fused decoder (every SGA block in one launch, weights
    VMEM-resident, cross k/v projected in-kernel); 4 = all-layer decoder
    with the cross k/v pre-projected OUTSIDE the kernel (full-batch
    projection matmuls); 5 = the LATENCY engine — all-layer SA encoder +
    all-layer (mode-4) decoder, TWO backbone launches total — built as
    the launch-overhead hypothesis test for tiny batches and measured
    SLOWER at B=1 than the per-block engine (weight streaming, not
    launches, bounds B=1 latency — docs/PERFORMANCE.md); the Predictor
    uses mode 2 at every bucket. 3/4/5 degrade to 2 when the stacked
    weights exceed VMEM (MCAN-large).
    sga_group = samples packed per matmul inside it (None = auto:
    4, or 16 at compiled B >= 1024 — +1.2% at B=1024/2048, r5).
    qffn: run each per-block megakernel's FFN matmuls in int8 on the MXU
    (mixed precision: attention/projections/stream stay the bf16 path) —
    requires prepare_params(qffn=True) ``_qffn`` entries (falls back to
    the bf16 FFN per block when absent) and sga_mode 2 (the shipped
    per-block engine).
    qffn_act_scales: optional {"enc_i"/"dec_i": (aqkv, a1, a2)} Python
    floats from ops.quant.calibrate_qffn_act_scales — static per-tensor
    activation quantization (skips the per-row max reductions inside
    the qffn kernels); None keeps dynamic per-row quant.
    """
    stream = jnp.bfloat16 if bf16_stream else jnp.float32

    if use_pallas_ffn:
        from mcan_vqa_tpu.ops.fused_ffn import fused_ffn_ln, fused_proj_ln

        import os as _os
        _tile = int(_os.environ.get("FFN_TILE_M", "256"))

        def ffn_block(norm_p, mlp_p, x):
            return fused_ffn_ln(
                x, mlp_p["FCLayer_0"]["Dense_0"]["kernel"],
                mlp_p["FCLayer_0"]["Dense_0"]["bias"],
                mlp_p["Dense_0"]["kernel"], mlp_p["Dense_0"]["bias"],
                norm_p["scale"], norm_p["bias"], tile_m=_tile,
                interpret=interpret).astype(stream)

        def att_block(mh_p, norm_p, v_, k_, q_, mask_):
            pre = _mhatt(mh_p, v_, k_, q_, mask_, num_heads, use_pallas,
                         interpret, merge=False)
            return fused_proj_ln(
                q_, pre, mh_p["linear_merge"]["kernel"],
                mh_p["linear_merge"]["bias"], norm_p["scale"],
                norm_p["bias"], interpret=interpret).astype(stream)
    else:
        ffn_block = None
        att_block = None

    def forward(params, img_feat, ques_ix):
        q_mask = make_mask(ques_ix[..., None])
        v_mask = make_mask(img_feat)
        # static-int8 AUX sites (cross-kv / AttFlat merges / head):
        # active only when the prepared tree carries _q8aux AND the
        # calibrated scales include the "aux" tuple (q8aux=True through
        # build_production_engine). Pallas-attflat experiments bypass
        # the aux merge site, so they are mutually exclusive.
        aux_w = params.get("_q8aux") if isinstance(params, dict) else None
        aux_s = (qffn_act_scales or {}).get("aux")
        use_aux = aux_w is not None and aux_s is not None
        assert not (use_aux and (use_pallas or use_pallas_attflat)), \
            "q8aux does not compose with the pallas AttFlat experiment"

        def ln(p, x):
            return _std_layer_norm(p, x, out_dtype=stream)

        q = jnp.take(params["embedding"]["embedding"], ques_ix, axis=0)
        q = _lstm(params["lstm"], q).astype(stream)
        v = _dense(params["img_feat_linear"], img_feat).astype(stream)

        bb = params["backbone"]
        # B is static under jit, so the packing group is chosen per
        # compiled shape (auto_sga_group; explicit sga_group wins)
        g_sga = auto_sga_group(img_feat.shape[0], sga_group,
                               calibrated=qffn_act_scales is not None,
                               hidden=v.shape[-1])
        # the bulk g16 was swept ONLY on the calibrated int8 kernels —
        # any block that falls back to the bf16 megakernel (partial
        # scales dict, B past the dynamic gate, mode 1, the mode-3/4/5
        # experiments) keeps the latency-tuned auto group instead of
        # inheriting an unmeasured bf16 g16 regime
        g_bf16 = auto_sga_group(img_feat.shape[0], sga_group,
                                calibrated=False)
        # VMEM guard: every block weight must stay resident in the
        # megakernel (bf16). MCAN-small is ~7.6 MB; MCAN-large (~27 MB)
        # falls back to the per-sub-op path.
        sga_mode = use_sga_megakernel
        if sga_mode:
            D = v.shape[-1]
            dec0 = params["backbone"]["dec_0"]
            # pruned trees (prune_prepared_params) carry the FFN width
            # only inside the megakernel layout
            F_ff = (dec0["_mk"]["w1"].shape[1] if "_mk" in dec0
                    else dec0["ffn"]["mlp"][
                        "FCLayer_0"]["Dense_0"]["kernel"].shape[1])
            if sga_mode in (3, 4, 5):
                from mcan_vqa_tpu.ops.sga_block import decoder_vmem_ok
                if not decoder_vmem_ok(D, F_ff, num_layers):
                    sga_mode = 2
            if not megakernel_vmem_ok(D, F_ff):
                sga_mode = 0

        if sga_mode == 5:
            # latency engine: the whole encoder in ONE launch
            from mcan_vqa_tpu.ops.sga_block import (fused_sa_encoder,
                                                    prepare_sa_encoder_params)
            wp = (bb["_mk_enc"] if "_mk_enc" in bb
                  else prepare_sa_encoder_params(bb, num_layers))
            q = fused_sa_encoder(q, q_mask, wp, num_heads=num_heads,
                                 interpret=interpret)
        elif sga_mode >= 2:
            # question path through the fused SA-block megakernel too
            from mcan_vqa_tpu.ops.sga_block import (fused_sa_block,
                                                    prepare_sa_block_params)
            for i in range(num_layers):
                p = bb[f"enc_{i}"]
                wp = p["_mk"] if "_mk" in p else prepare_sa_block_params(p)
                # per-block gate: see the SA-stack comment above
                scales_i = (qffn_act_scales or {}).get(f"enc_{i}")
                if qffn and "_qffn" in p and (
                        q.shape[0] <= QFFN_MAX_BATCH
                        or scales_i is not None):
                    from mcan_vqa_tpu.ops.quant import fused_qffn_sa_block
                    q = fused_qffn_sa_block(
                        q, q_mask, wp, p["_qffn"], num_heads=num_heads,
                        interpret=interpret, act_scales=scales_i,
                        w4dq=qffn_w4dq)
                else:
                    q = fused_sa_block(q, q_mask, wp, num_heads=num_heads,
                                       interpret=interpret)
        else:
            for i in range(num_layers):
                p = bb[f"enc_{i}"]
                if att_block is not None:
                    q = att_block(p["mhatt"], p["norm1"], q, q, q, q_mask)
                else:
                    att = _mhatt(p["mhatt"], q, q, q, q_mask, num_heads,
                                 use_pallas, interpret)
                    q = ln(p["norm1"], q + att.astype(stream))
                if ffn_block is not None:
                    q = ffn_block(p["norm2"], p["ffn"]["mlp"], q)
                else:
                    q = ln(p["norm2"],
                           q + _mlp(p["ffn"]["mlp"], q).astype(stream))

        if sga_mode == 3:
            from mcan_vqa_tpu.ops.sga_block import (
                fused_sga_decoder, prepare_sga_decoder_params)
            wp = (bb["_mk_dec"] if "_mk_dec" in bb
                  else prepare_sga_decoder_params(bb, num_layers))
            v = fused_sga_decoder(v, q, v_mask, q_mask, wp,
                                  num_heads=num_heads, group=g_bf16,
                                  interpret=interpret)
        elif sga_mode in (4, 5):
            # all-layer decoder, cross k/v projected OUTSIDE as full-batch
            # matmuls (the in-kernel per-group projections were a measured
            # component of mode 3's loss); layer-major [B, L*H, Lq, Dh]
            from mcan_vqa_tpu.ops.sga_block import (
                fused_sga_decoder_extkv, prepare_sga_decoder_params)
            wp = (bb["_mk_dec"] if "_mk_dec" in bb
                  else prepare_sga_decoder_params(bb, num_layers))
            kqs, vqs = [], []
            for i in range(num_layers):
                kq, vq = _cross_kv(bb[f"dec_{i}"]["mhatt2"], q, num_heads)
                kqs.append(kq)
                vqs.append(vq)
            kqs = jnp.concatenate(kqs, axis=1)   # [B, L*H, Lq, Dh]
            vqs = jnp.concatenate(vqs, axis=1)
            v = fused_sga_decoder_extkv(v, kqs, vqs, v_mask, q_mask, wp,
                                        num_heads=num_heads,
                                        group=g_bf16,
                                        interpret=interpret)
        elif sga_mode:
            from mcan_vqa_tpu.ops.sga_block import (
                fused_sga_block, prepare_sga_block_params)
            for i in range(num_layers):
                p = bb[f"dec_{i}"]
                if use_aux:
                    kq, vq = _cross_kv_q8(aux_w[f"dec_{i}_kv"], q,
                                          num_heads, aux_s[0])
                else:
                    kq, vq = _cross_kv(p["mhatt2"], q, num_heads)
                wp = (p["_mk"] if "_mk" in p
                      else prepare_sga_block_params(p, num_heads))
                scales_i = (qffn_act_scales or {}).get(f"dec_{i}")
                if (qffn and sga_mode == 2 and "_qffn" in p
                        and (v.shape[0] <= QFFN_MAX_BATCH
                             or scales_i is not None)):
                    from mcan_vqa_tpu.ops.quant import fused_qffn_sga_block
                    v = fused_qffn_sga_block(
                        v, kq, vq, v_mask, q_mask, wp, p["_qffn"],
                        num_heads=num_heads, group=g_sga,
                        interpret=interpret, act_scales=scales_i,
                        w4dq=qffn_w4dq)
                else:
                    v = fused_sga_block(
                        v, kq, vq, v_mask, q_mask, wp,
                        num_heads=num_heads, group=g_bf16,
                        fused_proj=(sga_mode == 2),
                        interpret=interpret)
        if sga_mode:
            lang_flat, _ = _attflat(
                params["attflat_lang"], q, q_mask,
                use_pallas or use_pallas_attflat, interpret,
                q8=(aux_w["lang_merge"], aux_s[1]) if use_aux else None)
            img_flat, _ = _attflat(
                params["attflat_img"], v, v_mask,
                use_pallas or use_pallas_attflat, interpret,
                q8=(aux_w["img_merge"], aux_s[2]) if use_aux else None)
            fused = _std_layer_norm(params["proj_norm"],
                                    lang_flat + img_flat)
            if use_aux:
                return _qdense_static(aux_w["proj"], fused, aux_s[3])
            return _dense(params["proj"], fused)

        for i in range(num_layers):
            p = bb[f"dec_{i}"]
            if att_block is not None:
                v = att_block(p["mhatt1"], p["norm1"], v, v, v, v_mask)
                v = att_block(p["mhatt2"], p["norm2"], q, q, v, q_mask)
            else:
                att = _mhatt(p["mhatt1"], v, v, v, v_mask, num_heads,
                             use_pallas, interpret)
                v = ln(p["norm1"], v + att.astype(stream))
                att = _mhatt(p["mhatt2"], q, q, v, q_mask, num_heads,
                             use_pallas, interpret)
                v = ln(p["norm2"], v + att.astype(stream))
            if ffn_block is not None:
                v = ffn_block(p["norm3"], p["ffn"]["mlp"], v)
            else:
                v = ln(p["norm3"],
                       v + _mlp(p["ffn"]["mlp"], v).astype(stream))

        lang_flat, _ = _attflat(params["attflat_lang"], q, q_mask,
                                use_pallas or use_pallas_attflat, interpret)
        img_flat, _ = _attflat(params["attflat_img"], v, v_mask,
                               use_pallas or use_pallas_attflat, interpret)
        fused = _std_layer_norm(params["proj_norm"], lang_flat + img_flat)
        return _dense(params["proj"], fused)

    return forward
