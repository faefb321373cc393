"""Full MCAN networks: AttFlat pooling head and the flagship VQA model.

MCANet is the TPU rebuild of the reference's trained variant ``Net2``
(reference: core/model/net.py:295-381); it also exposes the attention weights
and masks the visualization flow needs from ``Net`` (reference:
core/model/net.py:62-137). ClassifierNet is the image-only multi-label model
(reference: core/model/net.py:140-196).

Boundary discipline: the network returns *logits*; sigmoid is applied by the
caller (serving) or folded into the BCE-with-logits loss (training). The
reference applies sigmoid in-graph and uses plain BCE
(reference: core/model/net.py:373, core/exec.py:67) — numerically inferior;
the exported probabilities are identical.
"""

from __future__ import annotations

from typing import Any, Dict, Optional

import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from mcan_vqa_tpu.models.layers import Dense, MLPBlock, StdLayerNorm, make_mask
from mcan_vqa_tpu.models.lstm import LSTMEncoder
from mcan_vqa_tpu.models.mca import MCAEncoder, MCAEncoderDecoder

_MASK_FILL = -1e9


class AttFlat(nn.Module):
    """Attention pooling: [B, L, D] -> [B, flat_out]
    (reference: core/model/net.py:20-55). Also returns the [B, L, G] weights.
    """

    hidden_size: int
    flat_mlp_size: int
    flat_glimpses: int
    flat_out_size: int
    dropout_rate: float = 0.1
    dtype: jnp.dtype = jnp.bfloat16
    dropout_bits: int = 32

    @nn.compact
    def __call__(self, x, x_mask, deterministic: bool = True):
        B, L, D = x.shape
        att = MLPBlock(
            mid_features=self.flat_mlp_size, out_features=self.flat_glimpses,
            dropout_rate=self.dropout_rate, use_relu=True, dtype=self.dtype,
            dropout_bits=self.dropout_bits, name="mlp")(x, deterministic)                       # [B, L, G]
        pad = x_mask[:, 0, 0, :, None]                          # [B, L, 1]
        att = jnp.where(pad, _MASK_FILL, att)
        att = nn.softmax(att.astype(jnp.float32), axis=1)        # over L
        # glimpse-weighted sums, concatenated glimpse-major: [B, G*D]
        pooled = jnp.einsum(
            "blg,bld->bgd", att.astype(self.dtype), x.astype(self.dtype),
            preferred_element_type=jnp.float32).reshape(B, -1)
        pooled = Dense(self.flat_out_size, dtype=self.dtype,
                       name="linear_merge")(pooled)
        return pooled, att


class MCANet(nn.Module):
    """Flagship MCAN VQA model (reference: core/model/net.py:295-381).

    forward(img_feat [B, R, img_feat_size] f32, ques_ix [B, T] int32)
      -> dict(logits [B, answer_size], plus masks/attention weights).
    """

    token_size: int
    answer_size: int
    word_embed_size: int = 300
    hidden_size: int = 512
    num_layers: int = 6
    num_heads: int = 8
    ff_size: int = 2048
    img_feat_size: int = 2048
    flat_mlp_size: int = 512
    flat_glimpses: int = 1
    flat_out_size: int = 512
    dropout_rate: float = 0.1
    dtype: jnp.dtype = jnp.bfloat16
    use_pallas: bool = False
    use_remat: bool = False
    use_packing: bool = False
    fused_qkv: bool = False
    # random bits per dropout keep decision (ops/dropout.py; 32 = exact)
    dropout_bits: int = 32
    # GloVe init: a callable (key, shape, dtype) -> array, or None for N(0,1).
    # A callable (not the raw matrix) so the module stays hashable for jit.
    emb_init_fn: Optional[Any] = None

    @nn.compact
    def __call__(self, img_feat, ques_ix, deterministic: bool = True) -> Dict[str, Any]:
        # Pad masks from all-zero rows / zero token ids
        # (reference: core/model/net.py:340-341,379-381).
        q_mask = make_mask(ques_ix[..., None])
        v_mask = make_mask(img_feat)

        emb_init = self.emb_init_fn or nn.initializers.normal(1.0)
        q = nn.Embed(self.token_size, self.word_embed_size,
                     embedding_init=emb_init, name="embedding")(ques_ix)
        q = LSTMEncoder(self.hidden_size, dtype=self.dtype, name="lstm")(q)

        v = Dense(self.hidden_size, dtype=self.dtype,
                  name="img_feat_linear")(img_feat)

        q, v = MCAEncoderDecoder(
            num_layers=self.num_layers, hidden_size=self.hidden_size,
            num_heads=self.num_heads, ff_size=self.ff_size,
            dropout_rate=self.dropout_rate, dtype=self.dtype,
            use_pallas=self.use_pallas, use_remat=self.use_remat,
            use_packing=self.use_packing, fused_qkv=self.fused_qkv,
            dropout_bits=self.dropout_bits,
            name="backbone",
        )(q, v, q_mask, v_mask, deterministic)

        flat_kw = dict(hidden_size=self.hidden_size,
                       flat_mlp_size=self.flat_mlp_size,
                       flat_glimpses=self.flat_glimpses,
                       flat_out_size=self.flat_out_size,
                       dropout_rate=self.dropout_rate, dtype=self.dtype,
                       dropout_bits=self.dropout_bits)
        lang_flat, q_w = AttFlat(name="attflat_lang", **flat_kw)(
            q, q_mask, deterministic)
        img_flat, v_w = AttFlat(name="attflat_img", **flat_kw)(
            v, v_mask, deterministic)

        fused = StdLayerNorm(name="proj_norm")(lang_flat + img_flat)
        logits = Dense(self.answer_size, dtype=self.dtype, name="proj")(fused)

        return {
            "logits": logits,          # pre-sigmoid [B, answer_size]
            "v": v, "v_mask": v_mask, "v_w": v_w,
            "q": q, "q_mask": q_mask, "q_w": q_w,
            "fused": fused,
        }


class ClassifierNet(nn.Module):
    """Image-only multi-label classifier (reference: core/model/net.py:140-196)."""

    answer_size: int
    hidden_size: int = 512
    num_layers: int = 6
    num_heads: int = 8
    ff_size: int = 2048
    img_feat_size: int = 1024
    flat_mlp_size: int = 512
    flat_glimpses: int = 1
    flat_out_size: int = 512
    dropout_rate: float = 0.1
    dtype: jnp.dtype = jnp.bfloat16
    use_pallas: bool = False
    dropout_bits: int = 32

    @nn.compact
    def __call__(self, img_feat, deterministic: bool = True) -> Dict[str, Any]:
        v_mask = make_mask(img_feat)
        v = Dense(self.hidden_size, dtype=self.dtype,
                  name="img_feat_linear")(img_feat)
        v = MCAEncoder(
            num_layers=self.num_layers, hidden_size=self.hidden_size,
            num_heads=self.num_heads, ff_size=self.ff_size,
            dropout_rate=self.dropout_rate, dtype=self.dtype,
            use_pallas=self.use_pallas, dropout_bits=self.dropout_bits,
            name="backbone",
        )(v, v_mask, deterministic)
        img_flat, v_w = AttFlat(
            hidden_size=self.hidden_size, flat_mlp_size=self.flat_mlp_size,
            flat_glimpses=self.flat_glimpses, flat_out_size=self.flat_out_size,
            dropout_rate=self.dropout_rate, dtype=self.dtype,
            dropout_bits=self.dropout_bits,
            name="attflat_img")(v, v_mask, deterministic)
        fused = StdLayerNorm(name="proj_norm")(img_flat)
        logits = Dense(self.answer_size, dtype=self.dtype, name="proj")(fused)
        return {"logits": logits, "v": v, "v_mask": v_mask, "v_w": v_w,
                "fused": fused}


def build_mcan(cfg, token_size: int, answer_size: int,
               pretrained_emb: Optional[np.ndarray] = None,
               use_pallas: bool = False,
               use_packing: Optional[bool] = None) -> MCANet:
    """Construct MCANet from a Config (mirrors reference Net2 construction,
    core/exec.py:52-58)."""
    emb_init_fn = None
    if pretrained_emb is not None and cfg.use_glove:
        emb = np.asarray(pretrained_emb, np.float32)
        # the init fn IGNORES the requested shape, and nn.Embed's gather
        # CLAMPS out-of-range ids under jit — a stale embedding matrix
        # paired with a rebuilt vocab would train/serve with silently
        # corrupted embeddings for every new token, so fail loud here
        assert emb.shape == (token_size, cfg.word_embed_size), (
            f"pretrained_emb shape {emb.shape} != "
            f"(token_size={token_size}, word_embed_size="
            f"{cfg.word_embed_size}) — stale vocab cache or mismatched "
            f"embedding matrix")
        emb_init_fn = lambda *_: jnp.asarray(emb)
    return MCANet(
        token_size=token_size,
        answer_size=answer_size,
        word_embed_size=cfg.word_embed_size,
        hidden_size=cfg.hidden_size,
        num_layers=cfg.layer,
        num_heads=cfg.multi_head,
        ff_size=cfg.ff_size,
        img_feat_size=cfg.img_feat_size,
        flat_mlp_size=cfg.flat_mlp_size,
        flat_glimpses=cfg.flat_glimpses,
        flat_out_size=cfg.flat_out_size,
        dropout_rate=cfg.dropout_rate,
        dtype=jnp.dtype(cfg.compute_dtype),
        use_pallas=use_pallas,
        use_remat=getattr(cfg, "use_remat", False),
        use_packing=(getattr(cfg, "attention_packing", False)
                     if use_packing is None else use_packing),
        fused_qkv=getattr(cfg, "fused_qkv", False),
        dropout_bits=getattr(cfg, "dropout_bits", 32),
        emb_init_fn=emb_init_fn,
    )
