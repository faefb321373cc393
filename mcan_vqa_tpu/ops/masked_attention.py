"""Masked scaled-dot-product attention: XLA reference path + Pallas TPU kernel.

Semantics (reference: core/model/mca.py:65-78): scores = QK^T / sqrt(d_k);
pad positions get -1e9 before softmax; dropout is applied to the attention
map (not the output); result = map @ V.

Two implementations with identical numerics:
  * ``masked_attention_xla`` — pure jnp; XLA fuses well at MCAN's tiny
    sequence lengths (14 question tokens / 60 regions). Used for training
    (supports attention-map dropout) and as the test oracle.
  * ``masked_attention_pallas`` — a fused Pallas kernel that keeps the
    [L, L] score matrix in VMEM, avoiding HBM round-trips of the attention
    map. Used on the inference/serving path.

``masked_attention`` dispatches between them.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp

_NEG_INF = -1e9


def masked_attention_xla(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    mask: Optional[jnp.ndarray],
    *,
    dropout_rate: float = 0.0,
    dropout_rng: Optional[jax.Array] = None,
    dropout_bits: int = 32,
    compute_dtype: jnp.dtype = jnp.bfloat16,
) -> jnp.ndarray:
    """q,k,v: [B, H, Lq, Dh] / [B, H, Lk, Dh]; mask: bool [B, 1, 1, Lk].

    Matmuls run in ``compute_dtype`` on the MXU; softmax in float32.
    dropout_bits: random bits per attention-map keep decision
    (ops/dropout.py; 32 = exact jax.random.bernoulli rate).
    """
    d_k = q.shape[-1]
    scale = 1.0 / (d_k ** 0.5)
    scores = jnp.einsum(
        "bhqd,bhkd->bhqk", q.astype(compute_dtype), k.astype(compute_dtype),
        preferred_element_type=jnp.float32) * scale
    if mask is not None:
        scores = jnp.where(mask, _NEG_INF, scores)
    att = jax.nn.softmax(scores, axis=-1)  # fp32
    if dropout_rate > 0.0 and dropout_rng is not None:
        from mcan_vqa_tpu.ops.dropout import dropout as _dropout
        att = _dropout(att, dropout_rate, dropout_rng, dropout_bits)
    out = jnp.einsum(
        "bhqk,bhkd->bhqd", att.astype(compute_dtype), v.astype(compute_dtype),
        preferred_element_type=jnp.float32)
    return out


# ---------------------------------------------------------------------------
# Pallas fused kernel
# ---------------------------------------------------------------------------
#
# Shapes here are small (L <= 128, Dh = 64..128), so the whole (head, query
# block) fits in VMEM: one grid step computes softmax(QK^T + mask) @ V for a
# (batch-tile, head) pair without materializing the attention map in HBM.

def _attn_kernel(q_ref, k_ref, v_ref, mask_ref, o_ref, *, scale: float):
    # Blocks (one batch element, one head): q [1,1,Lq,Dh], k/v [1,1,Lk,Dh],
    # mask [1,1,Lk] (int8; 1 = pad), o [1,1,Lq,Dh]
    q = q_ref[0, 0].astype(jnp.bfloat16)          # [Lq, Dh]
    k = k_ref[0, 0].astype(jnp.bfloat16)          # [Lk, Dh]
    v = v_ref[0, 0].astype(jnp.bfloat16)          # [Lk, Dh]
    scores = jax.lax.dot_general(
        q, k,
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) * scale                                      # [Lq, Lk]
    pad = mask_ref[0].astype(jnp.float32)          # [1, Lk]
    scores = scores + pad * _NEG_INF
    m = jnp.max(scores, axis=-1, keepdims=True)
    e = jnp.exp(scores - m)
    att = e / jnp.sum(e, axis=-1, keepdims=True)
    out = jnp.dot(att.astype(jnp.bfloat16), v,
                  preferred_element_type=jnp.float32)  # [Lq, Dh]
    o_ref[0, 0] = out


@functools.partial(jax.jit, static_argnames=("interpret",))
def masked_attention_pallas(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    mask: Optional[jnp.ndarray],
    interpret: bool = False,
) -> jnp.ndarray:
    """Fused attention: q,k,v [B, H, L, Dh]; mask bool [B, 1, 1, Lk] or None.

    Inference path (no attention-map dropout). Grid over (batch, head); the
    full per-head score matrix lives in VMEM.
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    B, H, Lq, Dh = q.shape
    Lk = k.shape[2]
    scale = 1.0 / (Dh ** 0.5)

    if mask is None:
        pad = jnp.zeros((B, 1, Lk), jnp.int8)
    else:
        pad = mask[:, 0].astype(jnp.int8)  # [B, 1, Lk]

    grid = (B, H)
    out = pl.pallas_call(
        functools.partial(_attn_kernel, scale=scale),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, 1, Lq, Dh), lambda b, h: (b, h, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, Lk, Dh), lambda b, h: (b, h, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, Lk, Dh), lambda b, h: (b, h, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, Lk), lambda b, h: (b, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 1, Lq, Dh), lambda b, h: (b, h, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, H, Lq, Dh), jnp.float32),
        interpret=interpret,
    )(q, k, v, pad)
    return out


# ---------------------------------------------------------------------------
# Batch-blocked variant: TB batch rows x ALL heads per grid step
# ---------------------------------------------------------------------------
#
# The per-(batch, head) kernel above launches B*H tiny programs; at MCAN
# shapes the grid overhead dominates. This variant folds (TB, H) into the
# matmul batch dimension inside one kernel invocation, cutting the grid from
# B*H to B/TB steps.

def _attn_kernel_batched(q_ref, k_ref, v_ref, mask_ref, o_ref, *,
                         scale: float, heads: int):
    TB = q_ref.shape[0]
    Lq, Dh = q_ref.shape[2], q_ref.shape[3]
    Lk = k_ref.shape[2]
    q = q_ref[:].astype(jnp.bfloat16).reshape(TB * heads, Lq, Dh)
    k = k_ref[:].astype(jnp.bfloat16).reshape(TB * heads, Lk, Dh)
    v = v_ref[:].astype(jnp.bfloat16).reshape(TB * heads, Lk, Dh)
    scores = jax.lax.dot_general(
        q, k, dimension_numbers=(((2,), (2,)), ((0,), (0,))),
        preferred_element_type=jnp.float32) * scale    # [TB*H, Lq, Lk]
    pad = mask_ref[:].astype(jnp.float32)              # [TB, 1, Lk]
    pad = jnp.repeat(pad, heads, axis=0)               # [TB*H, 1, Lk]
    scores = scores + pad * _NEG_INF
    m = jnp.max(scores, axis=-1, keepdims=True)
    e = jnp.exp(scores - m)
    att = (e / jnp.sum(e, axis=-1, keepdims=True)).astype(jnp.bfloat16)
    out = jax.lax.dot_general(
        att, v, dimension_numbers=(((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32)            # [TB*H, Lq, Dh]
    o_ref[:] = out.reshape(TB, heads, Lq, Dh)


@functools.partial(jax.jit, static_argnames=("interpret", "block_b"))
def masked_attention_pallas_batched(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    mask: Optional[jnp.ndarray],
    block_b: int = 8,
    interpret: bool = False,
) -> jnp.ndarray:
    """Fused attention, batch-blocked: q,k,v [B, H, L, Dh]; mask [B,1,1,Lk]."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    B, H, Lq, Dh = q.shape
    Lk = k.shape[2]
    scale = 1.0 / (Dh ** 0.5)
    while B % block_b:
        block_b //= 2
    block_b = max(block_b, 1)

    if mask is None:
        pad = jnp.zeros((B, 1, Lk), jnp.int8)
    else:
        pad = mask[:, 0].astype(jnp.int8)

    out = pl.pallas_call(
        functools.partial(_attn_kernel_batched, scale=scale, heads=H),
        grid=(B // block_b,),
        in_specs=[
            pl.BlockSpec((block_b, H, Lq, Dh), lambda b: (b, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block_b, H, Lk, Dh), lambda b: (b, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block_b, H, Lk, Dh), lambda b: (b, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block_b, 1, Lk), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((block_b, H, Lq, Dh), lambda b: (b, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, H, Lq, Dh), jnp.float32),
        interpret=interpret,
    )(q, k, v, pad)
    return out


# ---------------------------------------------------------------------------
# Block-diagonal packed variant: G samples per MXU tile
# ---------------------------------------------------------------------------
#
# At MCAN lengths a single sample's score matmul ([14..60, Dh] x [Dh, 14..60])
# fills at most half the MXU's 128 sublanes. This variant packs G samples'
# rows into ONE physical matmul per (group, head) grid step — 9x14=126 or
# 2x60=120 rows against a 128-row tile — with a block-diagonal mask folded
# into the softmax so sample i's queries only see sample i's keys. Numerics
# are identical to per-sample masked softmax (cross-sample scores get -1e9,
# exactly like pad positions).

def _attn_kernel_packed(q_ref, k_ref, v_ref, mask_ref, o_ref, *,
                        scale: float, group: int):
    G = group
    Lq, Dh = q_ref.shape[2], q_ref.shape[3]
    Lk = k_ref.shape[2]
    q = q_ref[:, 0].reshape(G * Lq, Dh).astype(jnp.bfloat16)
    k = k_ref[:, 0].reshape(G * Lk, Dh).astype(jnp.bfloat16)
    v = v_ref[:, 0].reshape(G * Lk, Dh).astype(jnp.bfloat16)
    scores = jax.lax.dot_general(
        q, k, dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32) * scale    # [G*Lq, G*Lk]
    # block-diagonal: query row of sample g sees only key columns of sample g
    row_blk = jax.lax.broadcasted_iota(jnp.int32, (G * Lq, G * Lk), 0) // Lq
    col_blk = jax.lax.broadcasted_iota(jnp.int32, (G * Lq, G * Lk), 1) // Lk
    off_block = (row_blk != col_blk).astype(jnp.float32)
    pad = mask_ref[0].astype(jnp.float32)         # [1, G*Lk], pre-flattened
    scores = scores + (off_block + pad) * _NEG_INF
    m = jnp.max(scores, axis=-1, keepdims=True)
    e = jnp.exp(scores - m)
    att = (e / jnp.sum(e, axis=-1, keepdims=True)).astype(jnp.bfloat16)
    out = jnp.dot(att, v, preferred_element_type=jnp.float32)  # [G*Lq, Dh]
    o_ref[:, 0] = out.reshape(G, Lq, Dh)


@functools.partial(jax.jit, static_argnames=("interpret", "group"))
def masked_attention_pallas_packed(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    mask: Optional[jnp.ndarray],
    group: int = 0,
    interpret: bool = False,
) -> jnp.ndarray:
    """Fused block-diagonal packed attention.

    q,k,v [B, H, L, Dh]; mask bool [B, 1, 1, Lk] or None. group=0 picks the
    largest G with G*max(Lq,Lk) <= 128 that divides B (the MXU-tile-filling
    choice); pass an explicit group to override.
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    B, H, Lq, Dh = q.shape
    Lk = k.shape[2]
    scale = 1.0 / (Dh ** 0.5)

    if group <= 0:
        # the ONE MXU-tile packing policy (ops/packed_attention): fill
        # ~128 rows and divide the batch
        from mcan_vqa_tpu.ops.packed_attention import choose_pack
        group = choose_pack(B, max(Lq, Lk))
    while B % group:
        group -= 1

    G = group
    # flatten the pad mask to [B/G, 1, G*Lk] at the XLA level: Mosaic cannot
    # fold a sublane dim into lanes in-kernel, and a (1, G*Lk) block of a
    # 2D array would violate the 8-sublane block rule
    if mask is None:
        pad = jnp.zeros((B // G, 1, G * Lk), jnp.int8)
    else:
        pad = mask[:, 0, 0].astype(jnp.int8).reshape(B // G, 1, G * Lk)

    out = pl.pallas_call(
        functools.partial(_attn_kernel_packed, scale=scale, group=G),
        grid=(B // G, H),
        in_specs=[
            pl.BlockSpec((G, 1, Lq, Dh), lambda b, h: (b, h, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((G, 1, Lk, Dh), lambda b, h: (b, h, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((G, 1, Lk, Dh), lambda b, h: (b, h, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, G * Lk), lambda b, h: (b, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((G, 1, Lq, Dh), lambda b, h: (b, h, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, H, Lq, Dh), jnp.float32),
        interpret=interpret,
    )(q, k, v, pad)
    return out


def masked_attention(
    q, k, v, mask, *,
    dropout_rate: float = 0.0,
    dropout_rng=None,
    dropout_bits: int = 32,
    compute_dtype=jnp.bfloat16,
    use_pallas: bool = False,
    interpret: bool = False,
):
    """Dispatch: Pallas fused kernel when no attention-map dropout is needed,
    XLA path otherwise (training with dropout)."""
    if use_pallas and (dropout_rate == 0.0 or dropout_rng is None):
        return masked_attention_pallas(q, k, v, mask, interpret=interpret)
    return masked_attention_xla(
        q, k, v, mask, dropout_rate=dropout_rate, dropout_rng=dropout_rng,
        dropout_bits=dropout_bits, compute_dtype=compute_dtype)
