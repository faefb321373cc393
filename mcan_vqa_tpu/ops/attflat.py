"""Fused AttFlat pooling kernel (Pallas TPU).

AttFlat (reference: core/model/net.py:20-55) is: MLP over tokens ->
mask-fill -> softmax over the sequence -> glimpse-weighted sums -> merge
projection. Unfused, XLA materializes the [B, L, G] attention logits and the
[B, G*D] pooled tensor in HBM between matmuls; this kernel keeps the whole
chain for a batch row in VMEM:

    h      = relu(x @ W1 + b1)          [L, M]   (MXU)
    logits = h @ W2 + b2                [L, G]
    att    = softmax(mask ? -1e9 : logits, axis=L)
    pooled = att^T @ x                  [G, D]
    out    = pooled.reshape(G*D) @ Wm + bm       [O]

Inference path (no dropout inside the MLP). Returns (out [B, O],
att [B, L, G]) matching the XLA module's outputs.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

_NEG_INF = -1e9


def _attflat_kernel(x_ref, mask_ref, w1_ref, b1_ref, w2_ref, b2_ref,
                    wm_ref, bm_ref, out_ref, att_ref):
    # Blocks: x [1,L,D]; mask [1,1,L] int8; out [1,1,O]; att [1,L,G];
    # weights replicated full. 3D shapes keep the TPU (sublane, lane)
    # tiling rule satisfied: each block's last two dims equal the array's.
    x = x_ref[0].astype(jnp.bfloat16)                    # [L, D]
    h = jnp.maximum(
        jnp.dot(x, w1_ref[:].astype(jnp.bfloat16),
                preferred_element_type=jnp.float32) + b1_ref[:], 0.0)
    logits = jnp.dot(h.astype(jnp.bfloat16),
                     w2_ref[:].astype(jnp.bfloat16),
                     preferred_element_type=jnp.float32) + b2_ref[:]  # [L, G]
    pad = mask_ref[0, 0].astype(jnp.float32)[:, None]    # [L, 1]
    logits = logits + pad * _NEG_INF
    m = jnp.max(logits, axis=0, keepdims=True)
    e = jnp.exp(logits - m)
    att = e / jnp.sum(e, axis=0, keepdims=True)          # [L, G] softmax/L
    pooled = jax.lax.dot_general(
        att.astype(jnp.bfloat16), x,
        dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)              # [G, D]
    flat = pooled.reshape(1, -1).astype(jnp.bfloat16)    # [1, G*D]
    out = jnp.dot(flat, wm_ref[:].astype(jnp.bfloat16),
                  preferred_element_type=jnp.float32) + bm_ref[:]
    out_ref[0, 0] = out[0]
    att_ref[0] = att


@functools.partial(jax.jit, static_argnames=("interpret",))
def attflat_pallas(x, mask, w1, b1, w2, b2, wm, bm, interpret: bool = False):
    """x [B, L, D]; mask bool [B, 1, 1, L]; params as in AttFlat.

    Returns (pooled [B, O] f32, att [B, L, G] f32).
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    B, L, D = x.shape
    G = w2.shape[1]
    O = wm.shape[1]
    pad = mask[:, 0, :, :].astype(jnp.int8)  # [B, 1, L]

    rep = lambda *_: (0, 0)
    out, att = pl.pallas_call(
        _attflat_kernel,
        grid=(B,),
        in_specs=[
            pl.BlockSpec((1, L, D), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, L), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((D, w1.shape[1]), rep, memory_space=pltpu.VMEM),
            pl.BlockSpec((w1.shape[1],), lambda b: (0,),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((w1.shape[1], G), rep, memory_space=pltpu.VMEM),
            pl.BlockSpec((G,), lambda b: (0,), memory_space=pltpu.VMEM),
            pl.BlockSpec((G * D, O), rep, memory_space=pltpu.VMEM),
            pl.BlockSpec((O,), lambda b: (0,), memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((1, 1, O), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, L, G), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((B, 1, O), jnp.float32),
            jax.ShapeDtypeStruct((B, L, G), jnp.float32),
        ),
        interpret=interpret,
    )(x, pad, w1, b1, w2, b2, wm, bm)
    return out[:, 0], att
