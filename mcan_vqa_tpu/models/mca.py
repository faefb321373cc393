"""MCA layers: FFN, SA (self-attention), SGA (self-guided attention), and the
deep encoder-decoder backbone MCA_ED (reference: core/model/mca.py:85-207).

Architecture notes preserved from the reference:
  * post-norm residuals: norm(x + dropout(sublayer(x)))
  * the decoder (SGA stack over image regions) attends to the FINAL encoder
    output, not layer-wise pairs (reference: core/model/mca.py:178-186)
  * SGA: self-attention on x (image), then cross-attention with image queries
    over question keys/values, then FFN — three norms.
"""

from __future__ import annotations

import jax.numpy as jnp
from flax import linen as nn

from mcan_vqa_tpu.models.attention import MHAtt
from mcan_vqa_tpu.models.layers import MLPBlock, StdLayerNorm
from mcan_vqa_tpu.ops.dropout import TpuDropout


class FFN(nn.Module):
    """hidden -> 4*hidden (ReLU, dropout) -> hidden (reference: core/model/mca.py:85-98)."""

    hidden_size: int
    ff_size: int
    dropout_rate: float = 0.1
    dtype: jnp.dtype = jnp.bfloat16
    dropout_bits: int = 32

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        return MLPBlock(
            mid_features=self.ff_size, out_features=self.hidden_size,
            dropout_rate=self.dropout_rate, use_relu=True, dtype=self.dtype,
            dropout_bits=self.dropout_bits, name="mlp")(x, deterministic)


class SA(nn.Module):
    """Self-attention block (reference: core/model/mca.py:105-127)."""

    hidden_size: int
    num_heads: int
    ff_size: int
    dropout_rate: float = 0.1
    dtype: jnp.dtype = jnp.bfloat16
    use_pallas: bool = False
    use_packing: bool = False
    fused_qkv: bool = False
    dropout_bits: int = 32

    @nn.compact
    def __call__(self, x, x_mask, deterministic: bool = True):
        drop = lambda y: TpuDropout(self.dropout_rate,
                                    self.dropout_bits)(y, deterministic)
        att = MHAtt(self.hidden_size, self.num_heads, self.dropout_rate,
                    dtype=self.dtype, use_pallas=self.use_pallas,
                    use_packing=self.use_packing,
                    qkv_mode="self" if self.fused_qkv else "separate",
                    dropout_bits=self.dropout_bits,
                    name="mhatt")(x, x, x, x_mask, deterministic)
        x = StdLayerNorm(name="norm1")(x + drop(att))
        ff = FFN(self.hidden_size, self.ff_size, self.dropout_rate,
                 dtype=self.dtype, dropout_bits=self.dropout_bits,
                 name="ffn")(x, deterministic)
        x = StdLayerNorm(name="norm2")(x + drop(ff))
        return x


class SGA(nn.Module):
    """Self-guided attention block (reference: core/model/mca.py:134-164).

    x: image regions (queries), y: encoded question (keys/values).
    """

    hidden_size: int
    num_heads: int
    ff_size: int
    dropout_rate: float = 0.1
    dtype: jnp.dtype = jnp.bfloat16
    use_pallas: bool = False
    use_packing: bool = False
    fused_qkv: bool = False
    dropout_bits: int = 32

    @nn.compact
    def __call__(self, x, y, x_mask, y_mask, deterministic: bool = True):
        drop = lambda z: TpuDropout(self.dropout_rate,
                                    self.dropout_bits)(z, deterministic)
        kw = dict(dtype=self.dtype, use_pallas=self.use_pallas,
                  use_packing=self.use_packing,
                  dropout_bits=self.dropout_bits)
        self_att = MHAtt(self.hidden_size, self.num_heads, self.dropout_rate,
                         qkv_mode="self" if self.fused_qkv else "separate",
                         name="mhatt1", **kw)(x, x, x, x_mask, deterministic)
        x = StdLayerNorm(name="norm1")(x + drop(self_att))
        cross_att = MHAtt(self.hidden_size, self.num_heads, self.dropout_rate,
                          qkv_mode="kv" if self.fused_qkv else "separate",
                          name="mhatt2", **kw)(y, y, x, y_mask, deterministic)
        x = StdLayerNorm(name="norm2")(x + drop(cross_att))
        ff = FFN(self.hidden_size, self.ff_size, self.dropout_rate,
                 dtype=self.dtype, dropout_bits=self.dropout_bits,
                 name="ffn")(x, deterministic)
        x = StdLayerNorm(name="norm3")(x + drop(ff))
        return x


class MCAEncoderDecoder(nn.Module):
    """MCA_ED: L x SA over the question, then L x SGA over image regions
    guided by the final question encoding (reference: core/model/mca.py:171-186).

    use_remat trades FLOPs for HBM: each SA/SGA block's activations are
    rematerialized in the backward pass (jax.checkpoint), cutting stored
    activations per layer — relevant for MCAN-large (hidden 1024) at big
    batch sizes.
    """

    num_layers: int
    hidden_size: int
    num_heads: int
    ff_size: int
    dropout_rate: float = 0.1
    dtype: jnp.dtype = jnp.bfloat16
    use_pallas: bool = False
    use_remat: bool = False
    use_packing: bool = False
    fused_qkv: bool = False
    dropout_bits: int = 32

    @nn.compact
    def __call__(self, x, y, x_mask, y_mask, deterministic: bool = True):
        kw = dict(hidden_size=self.hidden_size, num_heads=self.num_heads,
                  ff_size=self.ff_size, dropout_rate=self.dropout_rate,
                  dtype=self.dtype, use_pallas=self.use_pallas,
                  use_packing=self.use_packing, fused_qkv=self.fused_qkv,
                  dropout_bits=self.dropout_bits)
        sa_cls, sga_cls = SA, SGA
        if self.use_remat:
            # static_argnums counts the bound module as arg 0, so
            # `deterministic` sits at 3 (SA) / 5 (SGA)
            sa_cls = nn.remat(SA, static_argnums=(3,))
            sga_cls = nn.remat(SGA, static_argnums=(5,))
        for i in range(self.num_layers):
            x = sa_cls(name=f"enc_{i}", **kw)(x, x_mask, deterministic)
        for i in range(self.num_layers):
            y = sga_cls(name=f"dec_{i}", **kw)(y, x, y_mask, x_mask,
                                               deterministic)
        return x, y


class MCAEncoder(nn.Module):
    """SA-only stack over image features for the image-only classifier
    (reference: core/model/mca.py:189-207)."""

    num_layers: int
    hidden_size: int
    num_heads: int
    ff_size: int
    dropout_rate: float = 0.1
    dtype: jnp.dtype = jnp.bfloat16
    use_pallas: bool = False
    use_packing: bool = False
    fused_qkv: bool = False
    dropout_bits: int = 32

    @nn.compact
    def __call__(self, y, y_mask, deterministic: bool = True):
        kw = dict(hidden_size=self.hidden_size, num_heads=self.num_heads,
                  ff_size=self.ff_size, dropout_rate=self.dropout_rate,
                  dtype=self.dtype, use_pallas=self.use_pallas,
                  use_packing=self.use_packing, fused_qkv=self.fused_qkv,
                  dropout_bits=self.dropout_bits)
        for i in range(self.num_layers):
            y = SA(name=f"enc_{i}", **kw)(y, y_mask, deterministic)
        return y
