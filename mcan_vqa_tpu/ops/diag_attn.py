"""Block-diagonal self-attention for the packed kernel layout.

Every fused MCAN kernel (serving megakernels in ops/sga_block.py and
ops/quant.py, train kernels in ops/sga_train.py) packs G samples per grid
step and computes self-attention as ONE [M, M] score matmul (M = G*L)
whose off-diagonal sample-cross blocks are masked to -1e9 — exactly the
packing the reference gets for free from its [B, L, L] batched torch
matmuls (core/model/net_utils.py att shapes). That is MXU-simple but
G x wasteful: only the [L, L] diagonal blocks carry information.

Since every off-diagonal score is <= row_max - 1e9, its exp underflows to
exactly +0.0 in f32 — the row max and row sum come from the diagonal block
alone. So the score/softmax/PV pipeline can run on just the [M, L] stacked
diagonal blocks: bitwise the SAME probabilities and outputs, ~G x less
padded MXU work and ~G x fewer softmax/dropout VPU elements.

``use_diag(G, L)`` decides when that is a win on the MXU's 128x128 tiles:
per-sample [L, Dh] x [Dh, L] matmuls each pad to full tiles, so tiny L
(the 14-token question encoder) is better off with the one big matmul,
while L = 100 image streams win at any G > 1. Note the SA wrappers'
AUTO group is ``128 // L`` — at L in (64, 128] that resolves to G=1 and
use_diag is False, so reaching the diag path for such streams takes an
explicit group (the shipped streams sit elsewhere: L=60 images auto to
G=2, L=14 questions pack without needing diag).

MCAN_DIAG_SOFTMAX=0 restores the full-width path everywhere (A/B knob;
read once at import)."""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp

_NEG_INF = -1e9

DIAG_ATT_DEFAULT = os.environ.get("MCAN_DIAG_SOFTMAX", "1") == "1"


def _tiles(n: int) -> int:
    """MXU row/col tile count (128-wide) covering n."""
    return -(-n // 128)


def use_diag(G: int, L: int, enabled: bool = None) -> bool:
    """True when per-sample diagonal attention costs fewer padded MXU
    tiles than one full-width [G*L, G*L] matmul."""
    if enabled is None:
        enabled = DIAG_ATT_DEFAULT
    if not enabled or G <= 1:
        return False
    return G * _tiles(L) ** 2 < _tiles(G * L) ** 2


def diag_pad_add(pad, G: int, L: int):
    """pad [1, G*L] f32 (1 at padded key positions) -> additive [G*L, L]
    mask for the block-diagonal softmax (sample g's rows see only sample
    g's key padding).

    Mosaic-safe: sample g's pad lanes sit at offset g*L, and unaligned
    lane slices fail the real TPU compiler ("Invalid input layout" —
    tools/probe_mosaic_diag.py), so they are gathered with an iota-built
    one-hot f32 matmul (exact: each output element sums exactly one
    x*1.0 product) and broadcast from the offset-0 [1, L] result."""
    if G == 1:
        return jnp.broadcast_to(pad, (L, L)) * _NEG_INF
    M = G * L
    k = jax.lax.broadcasted_iota(jnp.int32, (M, L), 0)
    j = jax.lax.broadcasted_iota(jnp.int32, (M, L), 1)
    rows = []
    for g in range(G):
        sel = (k == j + g * L).astype(jnp.float32)       # [M, L] one-hot
        pg = jax.lax.dot_general(pad, sel, (((1,), (0,)), ((), ())),
                                 preferred_element_type=jnp.float32)
        rows.append(jnp.broadcast_to(pg, (L, L)))
    return jnp.concatenate(rows, axis=0) * _NEG_INF


def diag_sdpa(qh, kh, vh, pad_add, G: int, L: int, scale: float,
              att_dtype=jnp.bfloat16):
    """One head of block-diagonal self-attention (inference; no dropout).

    qh/kh/vh [G*L, Dh] (kh/vh already att_dtype-cast by the caller or
    cast here); pad_add from diag_pad_add. Returns [G*L, Dh] f32 —
    bitwise what the full-width masked sdpa produces."""
    sl = lambda t, g: t[g * L:(g + 1) * L]
    s = jnp.concatenate(
        [jax.lax.dot_general(
            sl(qh, g).astype(att_dtype), sl(kh, g),
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)
         for g in range(G)], axis=0) * scale + pad_add
    m = jnp.max(s, axis=-1, keepdims=True)
    e = jnp.exp(s - m)
    att = (e / jnp.sum(e, axis=-1, keepdims=True)).astype(att_dtype)
    return jnp.concatenate(
        [jnp.dot(sl(att, g), sl(vh, g),
                 preferred_element_type=jnp.float32)
         for g in range(G)], axis=0)
