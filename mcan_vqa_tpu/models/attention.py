"""Multi-head attention module (reference: core/model/mca.py:18-78).

Projects q/k/v with Dense layers, splits heads, runs the fused masked
attention op (Pallas on the serving path, XLA for training with attention-map
dropout), merges heads, and projects the output.
"""

from __future__ import annotations

import jax.numpy as jnp
from flax import linen as nn

from mcan_vqa_tpu.models.layers import Dense
from mcan_vqa_tpu.ops.masked_attention import masked_attention


class MHAtt(nn.Module):
    hidden_size: int
    num_heads: int
    dropout_rate: float = 0.1
    dtype: jnp.dtype = jnp.bfloat16
    use_pallas: bool = False
    # pack T samples along the sequence axis to fill MXU tiles
    # (ops/packed_attention.py); only valid when Lq == Lk or mask covers k
    use_packing: bool = False
    # projection layout: "separate" (reference layout, 3 Dense), "self"
    # (one [D,3D] Dense — valid when q=k=v), "kv" (one [D,2D] for k/v +
    # linear_q). Fused layouts need checkpoint.fuse_qkv_params to load
    # reference weights.
    qkv_mode: str = "separate"
    # random bits per attention-map dropout decision (ops/dropout.py)
    dropout_bits: int = 32

    @nn.compact
    def __call__(self, v, k, q, mask, deterministic: bool = True):
        B, Lq = q.shape[0], q.shape[1]
        Lk = k.shape[1]
        H, Dh = self.num_heads, self.hidden_size // self.num_heads

        def split_heads(x, L):
            return x.reshape(B, L, H, Dh).transpose(0, 2, 1, 3)

        if self.qkv_mode == "self":
            qkv = Dense(3 * self.hidden_size, dtype=self.dtype,
                        name="linear_qkv")(q)
            qx, kx, vx = jnp.split(qkv, 3, axis=-1)
            qp, kp, vp = (split_heads(qx, Lq), split_heads(kx, Lk),
                          split_heads(vx, Lk))
        elif self.qkv_mode == "kv":
            kv = Dense(2 * self.hidden_size, dtype=self.dtype,
                       name="linear_kv")(k)
            kx, vx = jnp.split(kv, 2, axis=-1)
            kp, vp = split_heads(kx, Lk), split_heads(vx, Lk)
            qp = split_heads(Dense(self.hidden_size, dtype=self.dtype,
                                   name="linear_q")(q), Lq)
        else:
            vp = split_heads(Dense(self.hidden_size, dtype=self.dtype, name="linear_v")(v), Lk)
            kp = split_heads(Dense(self.hidden_size, dtype=self.dtype, name="linear_k")(k), Lk)
            qp = split_heads(Dense(self.hidden_size, dtype=self.dtype, name="linear_q")(q), Lq)

        dropout_rng = None
        rate = self.dropout_rate if not deterministic else 0.0
        if rate > 0.0:
            dropout_rng = self.make_rng("dropout")

        if self.use_packing and not self.use_pallas:
            from mcan_vqa_tpu.ops.packed_attention import (
                choose_pack, packed_masked_attention)
            pack = choose_pack(B, max(Lq, Lk))
            atted = packed_masked_attention(
                qp, kp, vp, mask, pack=pack,
                dropout_rate=rate, dropout_rng=dropout_rng,
                dropout_bits=self.dropout_bits,
                compute_dtype=self.dtype)
        else:
            atted = masked_attention(
                qp, kp, vp, mask,
                dropout_rate=rate, dropout_rng=dropout_rng,
                dropout_bits=self.dropout_bits,
                compute_dtype=self.dtype,
                use_pallas=self.use_pallas,
            )  # [B, H, Lq, Dh] fp32

        atted = atted.transpose(0, 2, 1, 3).reshape(B, Lq, self.hidden_size)
        return Dense(self.hidden_size, dtype=self.dtype, name="linear_merge")(atted)
