"""Sample-packed masked attention: fill the MXU at MCAN's tiny lengths.

MCAN sequences are 14 question tokens / 60 image regions — an attention
matmul of [14, 64] x [64, 14] fills ~1% of the 128x128 systolic array. This
op packs T samples along the sequence axis (T = 128 // L: 9 questions -> 126
rows, 2 images -> 120 rows) and runs ONE attention over the packed sequence
with a *segment mask* (flash-attention's multi-document trick) so samples
cannot attend across each other:

    allowed(q_i, k_j) = same_segment(i, j) AND NOT pad(k_j)

The packed result equals the unpacked one exactly (pad query rows also
attend within their own segment, matching the unpacked semantics), so this
is purely a throughput transform. Pure XLA — the batched matmul simply gets
~T x more useful rows/lanes per tile.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

_NEG_INF = -1e9


def packing_factor(seq_len: int, target: int = 128) -> int:
    """Largest T with T * seq_len <= target (>=1)."""
    return max(1, target // seq_len)


def choose_pack(batch: int, seq_len: int, target: int = 128) -> int:
    """Largest T that fills up to ``target`` rows AND divides the batch."""
    t = packing_factor(seq_len, target)
    while t > 1 and batch % t:
        t -= 1
    return t


def packed_masked_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    mask: Optional[jnp.ndarray],
    *,
    pack: int,
    dropout_rate: float = 0.0,
    dropout_rng: Optional[jax.Array] = None,
    dropout_bits: int = 32,
    compute_dtype: jnp.dtype = jnp.bfloat16,
) -> jnp.ndarray:
    """q [B, H, Lq, Dh], k/v [B, H, Lk, Dh], mask bool [B, 1, 1, Lk].

    Requires B % pack == 0 (callers pad the batch or fall back to pack=1).
    """
    B, H, Lq, Dh = q.shape
    Lk = k.shape[2]
    if pack <= 1 or B % pack != 0:
        from mcan_vqa_tpu.ops.masked_attention import masked_attention_xla
        return masked_attention_xla(
            q, k, v, mask, dropout_rate=dropout_rate,
            dropout_rng=dropout_rng, dropout_bits=dropout_bits,
            compute_dtype=compute_dtype)

    G = B // pack  # packed groups

    def pack_seq(x, L):
        # [B, H, L, Dh] -> [G, H, pack*L, Dh]
        x = x.reshape(G, pack, H, L, Dh).transpose(0, 2, 1, 3, 4)
        return x.reshape(G, H, pack * L, Dh)

    qp, kp, vp = pack_seq(q, Lq), pack_seq(k, Lk), pack_seq(v, Lk)

    # segment ids along the packed axes
    seg_q = jnp.repeat(jnp.arange(pack), Lq)            # [pack*Lq]
    seg_k = jnp.repeat(jnp.arange(pack), Lk)            # [pack*Lk]

    scale = 1.0 / (Dh ** 0.5)
    scores = jnp.einsum(
        "ghqd,ghkd->ghqk", qp.astype(compute_dtype), kp.astype(compute_dtype),
        preferred_element_type=jnp.float32) * scale
    # Two-LEVEL masking (same scheme as the Pallas packed kernel,
    # masked_attention.py:245): pad keys are REPLACED with -1e9 (exactly
    # the unpacked op's where(mask, -1e9)), cross-segment positions with
    # a strictly lower -2e9. A single collapsed mask made a
    # fully-padded sample's row softmax uniform over ALL pack*Lk keys —
    # mixing the other packed samples' values — whereas the unpacked op
    # goes uniform over that sample's OWN keys only; with -1e9 > -2e9
    # the cross contributions underflow to exactly 0 in f32 and the
    # packed result matches the unpacked one for degenerate rows too.
    if mask is not None:
        pad_k = mask[:, 0, 0, :].reshape(G, pack * Lk)   # [G, pack*Lk]
        scores = jnp.where(pad_k[:, None, None, :], _NEG_INF, scores)
    cross = seg_q[:, None] != seg_k[None, :]             # [pack*Lq, pack*Lk]
    scores = jnp.where(cross[None, None], 2.0 * _NEG_INF, scores)
    att = jax.nn.softmax(scores, axis=-1)
    if dropout_rate > 0.0 and dropout_rng is not None:
        from mcan_vqa_tpu.ops.dropout import dropout as _dropout
        att = _dropout(att, dropout_rate, dropout_rng, dropout_bits)
    out = jnp.einsum(
        "ghqk,ghkd->ghqd", att.astype(compute_dtype), vp.astype(compute_dtype),
        preferred_element_type=jnp.float32)              # [G, H, pack*Lq, Dh]

    out = out.reshape(G, H, pack, Lq, Dh).transpose(0, 2, 1, 3, 4)
    return out.reshape(B, H, Lq, Dh)
