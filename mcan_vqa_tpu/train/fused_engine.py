"""Fused TRAINING engine: raw-params MCAN forward built for value_and_grad.

The serving engine (ops/serving.py) routes inference through the SGA
megakernel; this is its training counterpart. The full forward is a pure,
differentiable function of the standard MCANet param pytree:

  * the 6 decoder (SGA) blocks — ~80% of model FLOPs — run through the
    custom-VJP fused block (ops/sga_train.py): one kernel launch forward,
    two backward (recompute-style), dropout masks external and shared
    between fwd and bwd;
  * everything else (embedding, LSTM, encoder SA stack over 14 tokens,
    AttFlat heads, classifier proj) is plain XLA with ops.dropout masks —
    small shapes where XLA fusion is already the right tool;
  * the param relayout (qkv concat, bf16 weight casts) happens inside the
    differentiated function, so ``jax.grad`` lands in the standard tree.

Single-device training path (like the fused eval engine): the sharded
multi-chip step keeps the model.apply route. Reference semantics:
core/model/net.py:337-375 (Net2.forward), core/model/mca.py:85-207.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from mcan_vqa_tpu.models.layers import make_mask
from mcan_vqa_tpu.ops.dropout import dropout as bit_dropout
from mcan_vqa_tpu.ops.serving import _dense, _lstm, _mlp, _std_layer_norm
from mcan_vqa_tpu.ops.sa_train import (fused_sa_block_train,
                                       make_sa_dropout_masks,
                                       prepare_sa_train_params)
from mcan_vqa_tpu.ops.sga_train import (fused_sga_block_train,
                                        fused_sga_block_train_prng,
                                        make_dropout_masks,
                                        prepare_sga_train_params)

BF16 = jnp.bfloat16


def _masked_attention_train(p, v, k, q, mask, num_heads, rate, rng, bits):
    """XLA multi-head attention with attention-map dropout (encoder path)."""
    B, Lq, D = q.shape
    Lk = k.shape[1]
    Dh = D // num_heads

    def split(x, L):
        return x.reshape(B, L, num_heads, Dh).transpose(0, 2, 1, 3)

    qp = split(_dense(p["linear_q"], q), Lq)
    kp = split(_dense(p["linear_k"], k), Lk)
    vp = split(_dense(p["linear_v"], v), Lk)
    scores = jnp.einsum("bhqd,bhkd->bhqk", qp.astype(BF16), kp.astype(BF16),
                        preferred_element_type=jnp.float32) / (Dh ** 0.5)
    scores = jnp.where(mask, -1e9, scores)
    att = jax.nn.softmax(scores, axis=-1)
    if rate > 0.0:
        att = bit_dropout(att, rate, rng, bits)
    out = jnp.einsum("bhqk,bhkd->bhqd", att.astype(BF16), vp.astype(BF16),
                     preferred_element_type=jnp.float32)
    out = out.transpose(0, 2, 1, 3).reshape(B, Lq, D)
    return _dense(p["linear_merge"], out)


def _mlp_train(p, x, rate, rng, bits):
    h = jax.nn.relu(_dense(p["FCLayer_0"]["Dense_0"], x))
    if rate > 0.0:
        h = bit_dropout(h, rate, rng, bits)
    return _dense(p["Dense_0"], h)


def _attflat_train(p, x, mask, rate, rng, bits):
    logits = _mlp_train(p["mlp"], x, rate, rng, bits)
    logits = jnp.where(mask[:, 0, 0, :, None], -1e9, logits)
    att = jax.nn.softmax(logits.astype(jnp.float32), axis=1)
    pooled = jnp.einsum("blg,bld->bgd", att.astype(BF16), x.astype(BF16),
                        preferred_element_type=jnp.float32)
    return _dense(p["linear_merge"], pooled.reshape(x.shape[0], -1))


def make_fused_train_forward(num_layers: int, num_heads: int,
                             dropout_rate: float = 0.1,
                             dropout_bits: int = 32,
                             group: int = 2,
                             interpret: bool = False,
                             in_kernel_dropout: bool = False,
                             fused_encoder: bool = False,
                             encoder_group: int = 0,
                             bf16_saves: bool = False,
                             att_saves: bool = False,
                             stacked: bool = False):
    """Build forward(params, img_feat, ques_ix, rng) -> logits [B, A].

    Differentiable w.r.t. params (standard MCANet tree — or, with
    ``stacked=True``, the ops/stacked_params train layout: the per-block
    kernel dicts become free slices of [L, ...] stacks, so the per-step
    qkv concat/split copies disappear and the optimizer runs over ~54
    leaves instead of ~260; math is identical, see
    tests/test_stacked_params.py). rng drives every
    dropout site; pass rate=0 for a deterministic forward. Known cost:
    rate=0 dispatches to the external-mask kernel variants and streams
    all-ones mask tensors through them (mask operands are part of that
    kernel signature; XLA CSEs the identical jnp.ones buffers across
    layers, but the per-call DMA remains). Dropout-free fine-tuning at
    large batch would warrant a third, mask-free kernel build — not
    done: the shipped recipes all train with rate=0.1.
    in_kernel_dropout: generate the fused blocks' dropout masks with the
    TPU hardware PRNG inside the kernels (no mask generation or HBM
    mask traffic; TPU-only — the Mosaic PRNG has no CPU lowering).
    fused_encoder: run the encoder SA stack through the custom-VJP fused
    SA blocks (ops/sa_train.py) instead of the XLA composition. The r2
    emission-style kernels measured slightly slower here (44.1 vs 43.4
    ms/step); the r3 in-kernel-dW redesign REVERSED that — fused G=16 is
    7,129 vs 6,781 samples/s with the XLA encoder (same-session,
    docs/PERFORMANCE.md), and the Trainer ships fused_encoder=True with
    encoder_group=16 at hidden<=512 (at D=1024 the XLA encoder still
    wins; the Trainer's gate reflects that).
    """

    def forward(params, img_feat, ques_ix, rng):
        q_mask = make_mask(ques_ix[..., None])
        v_mask = make_mask(img_feat)
        rate = dropout_rate

        # one key per consumer site, fixed order
        n_enc_keys = 3 * num_layers
        keys = jax.random.split(rng, n_enc_keys + num_layers + 2)
        enc_keys, dec_keys = keys[:n_enc_keys], keys[n_enc_keys:-2]
        flat_keys = keys[-2:]

        q = jnp.take(params["embedding"]["embedding"], ques_ix, axis=0)
        q = _lstm(params["lstm"], q)
        v = _dense(params["img_feat_linear"], img_feat)

        if stacked:
            from mcan_vqa_tpu.ops.stacked_params import (STACKED_KEY,
                                                         enc_block,
                                                         enc_block_std)
            # fail fast: a dec-only stacked tree would otherwise surface
            # as an opaque NoneType subscript deep inside the traced
            # forward (to_stacked only adds "enc" when enc_0 exists)
            st_enc = params[STACKED_KEY]["enc"]
            st_dec = params[STACKED_KEY]["dec"]
            bb = None
        else:
            bb = params["backbone"]
        if fused_encoder:
            # ---- encoder SA stack through the fused custom-VJP blocks ----
            Bq, Lq_, D_ = q.shape
            F_ = (st_enc["w1"].shape[2] if stacked else
                  bb["enc_0"]["ffn"]["mlp"]["FCLayer_0"]["Dense_0"][
                      "kernel"].shape[1])
            q = q.astype(jnp.float32)
            for i in range(num_layers):
                w = (enc_block(st_enc, i) if stacked
                     else prepare_sa_train_params(bb[f"enc_{i}"]))
                for name in ("wqkv", "wm", "w1", "w2"):
                    w[name] = w[name].astype(BF16)
                key_i = enc_keys[3 * i]
                sa_G = encoder_group if encoder_group > 0 else max(
                    1, 128 // Lq_)
                while Bq % sa_G:
                    sa_G -= 1
                if in_kernel_dropout and rate > 0.0:
                    seed = jax.random.randint(
                        key_i, (1,), 0, jnp.iinfo(jnp.int32).max, jnp.int32)
                    q = fused_sa_block_train(
                        q, q_mask, seed, w, num_heads=num_heads, rate=rate,
                        group=sa_G, interpret=interpret)
                else:
                    masks, inv_keep = make_sa_dropout_masks(
                        key_i, rate, Bq, Lq_, D_, F_, num_heads, sa_G,
                        dropout_bits)
                    q = fused_sa_block_train(
                        q, q_mask, masks, w, num_heads=num_heads,
                        group=sa_G, inv_keep=inv_keep, interpret=interpret)
        else:
            # ---- encoder SA stack (question path, XLA) ----
            for i in range(num_layers):
                p = enc_block_std(st_enc, i) if stacked else bb[f"enc_{i}"]
                k_att, k_sub, k_ffn = enc_keys[3 * i:3 * i + 3]
                att = _masked_attention_train(
                    p["mhatt"], q, q, q, q_mask, num_heads, rate, k_att,
                    dropout_bits)
                if rate > 0.0:
                    att = bit_dropout(att, rate, k_sub, dropout_bits)
                q = _std_layer_norm(p["norm1"], q + att)
                ff = _mlp_train(p["ffn"]["mlp"], q, rate,
                                jax.random.fold_in(k_ffn, 1), dropout_bits)
                if rate > 0.0:
                    ff = bit_dropout(ff, rate, k_ffn, dropout_bits)
                q = _std_layer_norm(p["norm2"], q + ff)

        # ---- decoder SGA stack (fused custom-VJP blocks) ----
        B, Lv, D = v.shape
        Lq = q.shape[1]
        F = (st_dec["w1"].shape[2] if stacked else
             bb["dec_0"]["ffn"]["mlp"]["FCLayer_0"]["Dense_0"][
                 "kernel"].shape[1])
        Dh = D // num_heads

        def cross_kv(p, qenc):
            kx = _dense(p["linear_k"], qenc)
            vx = _dense(p["linear_v"], qenc)
            sp = lambda t: t.reshape(B, Lq, num_heads, Dh).transpose(
                0, 2, 1, 3)
            return sp(kx), sp(vx)

        v = v.astype(jnp.float32)
        # effective packing group: largest value <= group dividing B (the
        # block wrappers reduce the same way; masks must match)
        g_eff = max(1, group)
        while B % g_eff:
            g_eff -= 1
        for i in range(num_layers):
            if stacked:
                s = {k: st[i] for k, st in st_dec.items()}
                kq, vq = cross_kv(
                    {"linear_k": {"kernel": s["wk2"], "bias": s["bk2"]},
                     "linear_v": {"kernel": s["wv2"], "bias": s["bv2"]}}, q)
                # kernel dict: everything but the cross-kv leaves (those
                # matmuls run in XLA above; the custom-VJP block must not
                # see leaves it computes no gradient for)
                w = {k: v_ for k, v_ in s.items()
                     if k not in ("wk2", "bk2", "wv2", "bv2")}
            else:
                p = bb[f"dec_{i}"]
                kq, vq = cross_kv(p["mhatt2"], q)
                w = prepare_sga_train_params(p)
            # bf16 matmul weights into the kernels (VMEM + HBM halving);
            # grads flow back through the casts
            for name in ("wqkv", "wm1", "wq2", "wm2", "w1", "w2"):
                w[name] = w[name].astype(BF16)
            if in_kernel_dropout and rate > 0.0:
                seed = jax.random.randint(
                    dec_keys[i], (1,), 0, jnp.iinfo(jnp.int32).max,
                    jnp.int32)
                v = fused_sga_block_train_prng(
                    v, kq, vq, v_mask, q_mask, seed, w,
                    num_heads=num_heads, group=g_eff, rate=rate,
                    bf16_saves=bf16_saves, att_saves=att_saves)
            else:
                masks, inv_keep = make_dropout_masks(
                    dec_keys[i], rate, B, Lv, Lq, D, F, num_heads, g_eff,
                    dropout_bits)
                v = fused_sga_block_train(
                    v, kq, vq, v_mask, q_mask, masks, w,
                    num_heads=num_heads, group=g_eff, inv_keep=inv_keep,
                    interpret=interpret, bf16_saves=bf16_saves,
                    att_saves=att_saves)

        lang_flat = _attflat_train(params["attflat_lang"], q, q_mask, rate,
                                   flat_keys[0], dropout_bits)
        img_flat = _attflat_train(params["attflat_img"], v, v_mask, rate,
                                  flat_keys[1], dropout_bits)
        fused = _std_layer_norm(params["proj_norm"], lang_flat + img_flat)
        return _dense(params["proj"], fused)

    return forward


def make_fused_classifier_forward(num_layers: int, num_heads: int,
                                  dropout_rate: float = 0.1,
                                  dropout_bits: int = 32,
                                  interpret: bool = False,
                                  in_kernel_dropout: bool = False,
                                  group: int = 0):
    """Fused training forward for ClassifierNet (image-only multi-label;
    reference core/model/net.py:140-196): the SA stack runs over the
    60-region image stream — the geometry where block fusion pays — via
    the custom-VJP fused SA blocks (ops/sa_train.py).

    Returns forward(params, img_feat, rng) -> logits [B, A],
    differentiable w.r.t. the standard ClassifierNet param tree.
    """

    def forward(params, img_feat, rng):
        v_mask = make_mask(img_feat)
        rate = dropout_rate
        keys = jax.random.split(rng, num_layers + 1)

        v = _dense(params["img_feat_linear"], img_feat).astype(jnp.float32)
        bb = params["backbone"]
        B, Lv, D = v.shape
        F = bb["enc_0"]["ffn"]["mlp"]["FCLayer_0"]["Dense_0"][
            "kernel"].shape[1]
        for i in range(num_layers):
            p = bb[f"enc_{i}"]
            w = prepare_sa_train_params(p)
            for name in ("wqkv", "wm", "w1", "w2"):
                w[name] = w[name].astype(BF16)
            # auto group ~256 rows/grid-step: same-session r3 sweep with
            # in-kernel dW (B=256 h512 classify) — XLA 8,334 / G=2 11,460
            # / G=4 11,997 samples/s; bigger groups halve the dW
            # accumulation steps (docs/PERFORMANCE.md).
            sa_G = group if group > 0 else max(1, 256 // Lv)
            while B % sa_G:
                sa_G -= 1
            if in_kernel_dropout and rate > 0.0:
                seed = jax.random.randint(
                    keys[i], (1,), 0, jnp.iinfo(jnp.int32).max, jnp.int32)
                v = fused_sa_block_train(
                    v, v_mask, seed, w, num_heads=num_heads, rate=rate,
                    group=sa_G, interpret=interpret)
            else:
                masks, inv_keep = make_sa_dropout_masks(
                    keys[i], rate, B, Lv, D, F, num_heads, sa_G,
                    dropout_bits)
                v = fused_sa_block_train(
                    v, v_mask, masks, w, num_heads=num_heads, group=sa_G,
                    inv_keep=inv_keep, interpret=interpret)

        img_flat = _attflat_train(params["attflat_img"], v, v_mask, rate,
                                  keys[-1], dropout_bits)
        fused = _std_layer_norm(params["proj_norm"], img_flat)
        return _dense(params["proj"], fused)

    return forward
