"""Fused FFN + residual + std-LayerNorm block kernel (Pallas TPU).

The serving ablation (docs/PERFORMANCE.md) shows the SGA image path is ~97%
of MCAN serving time, and its FFN sub-block — two large matmuls with
elementwise/LN breaks — runs bandwidth-bound: XLA materializes the
[B*L, 4D] hidden and the [B*L, D] residual stream in HBM between ops.

This kernel computes the reference's entire post-norm FFN block

    out = StdLayerNorm(x + (relu(x @ W1 + b1) @ W2 + b2))

for a row tile per grid step, keeping the hidden activations in VMEM. Both
weight matrices stay VMEM-resident across the grid (512x2048 bf16 = 2 MB
each). Matmuls in bf16 on the MXU; residual + LN statistics in fp32
(Bessel-corrected std + eps-on-std, matching models/layers.StdLayerNorm).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


def _std_ln(r, scale, bias):
    """Bessel-corrected std-LayerNorm epilogue (models/layers.StdLayerNorm
    parity: var/(d-1), eps on the std). The exact math the
    reference-parity tests guard, in ONE place — previously copy-pasted
    into every kernel body and XLA fallback in this file."""
    d = r.shape[-1]
    mean = jnp.mean(r, axis=-1, keepdims=True)
    c = r - mean
    var = jnp.sum(c * c, axis=-1, keepdims=True) / (d - 1)
    return scale * c / (jnp.sqrt(var) + 1e-6) + bias


def _ffn_ln_xla(xm, w1, b1, w2, b2, ln_scale, ln_bias, out_dtype):
    """Plain-XLA StdLayerNorm(x + MLP(x)) — the fallback every wrapper
    uses when its rows/hidden don't tile (a silent grid under-coverage
    would return uninitialized output rows)."""
    h = jax.nn.relu(jnp.dot(xm.astype(jnp.bfloat16),
                            w1.astype(jnp.bfloat16),
                            preferred_element_type=jnp.float32) + b1)
    r = xm.astype(jnp.float32) + (
        jnp.dot(h.astype(jnp.bfloat16), w2.astype(jnp.bfloat16),
                preferred_element_type=jnp.float32) + b2)
    return _std_ln(r, ln_scale, ln_bias).astype(out_dtype)


def _ffn_ln_kernel(x_ref, w1_ref, b1_ref, w2_ref, b2_ref,
                   scale_ref, bias_ref, o_ref):
    # x block may be bf16 (bf16 residual stream: half the DMA) or f32;
    # residual + LN statistics always run in f32
    x = x_ref[:].astype(jnp.float32)                      # [TM, D]
    h = jnp.dot(x.astype(jnp.bfloat16), w1_ref[:].astype(jnp.bfloat16),
                preferred_element_type=jnp.float32) + b1_ref[:]
    h = jnp.maximum(h, 0.0)                               # [TM, F]
    y = jnp.dot(h.astype(jnp.bfloat16), w2_ref[:].astype(jnp.bfloat16),
                preferred_element_type=jnp.float32) + b2_ref[:]
    r = x + y                                             # residual, fp32
    o_ref[:] = _std_ln(r, scale_ref[:], bias_ref[:]).astype(o_ref.dtype)


def _proj_ln_kernel(res_ref, a_ref, w_ref, b_ref, scale_ref, bias_ref,
                    o_ref):
    """out = StdLayerNorm(res + (a @ W + b)) — the attention block's
    merge-projection epilogue (same fusion family as the FFN kernel)."""
    a = a_ref[:].astype(jnp.bfloat16)
    y = jnp.dot(a, w_ref[:].astype(jnp.bfloat16),
                preferred_element_type=jnp.float32) + b_ref[:]
    r = res_ref[:].astype(jnp.float32) + y
    o_ref[:] = _std_ln(r, scale_ref[:], bias_ref[:]).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("interpret", "tile_m"))
def fused_proj_ln(residual, a, w, b, ln_scale, ln_bias,
                  tile_m: int = 256, interpret: bool = False):
    """residual [B, L, D], a [B, L, D] (pre-merge attention output),
    w [D, D] -> StdLayerNorm(residual + a @ w + b)."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    orig_shape = residual.shape
    D = residual.shape[-1]
    rm = residual.reshape(-1, D)   # stream dtype (f32 or bf16) — kept as-is
    am = a.reshape(-1, D)
    M = rm.shape[0]
    out_dtype = rm.dtype
    while tile_m > 8 and M % tile_m:
        tile_m //= 2
    if M % tile_m:
        # rows not tileable: plain XLA
        y = jnp.dot(am.astype(jnp.bfloat16), w.astype(jnp.bfloat16),
                    preferred_element_type=jnp.float32) + b
        r = rm.astype(jnp.float32) + y
        return _std_ln(r, ln_scale, ln_bias
                       ).astype(out_dtype).reshape(orig_shape)

    out = pl.pallas_call(
        _proj_ln_kernel,
        grid=(M // tile_m,),
        in_specs=[
            pl.BlockSpec((tile_m, D), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_m, D), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((D, D), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((D,), lambda i: (0,), memory_space=pltpu.VMEM),
            pl.BlockSpec((D,), lambda i: (0,), memory_space=pltpu.VMEM),
            pl.BlockSpec((D,), lambda i: (0,), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((tile_m, D), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((M, D), out_dtype),
        interpret=interpret,
    )(rm, am, w, b, ln_scale, ln_bias)
    return out.reshape(orig_shape)


def _ffn_ln_blocked_kernel(x_ref, w1_ref, b1_ref, w2_ref, b2_ref,
                           scale_ref, bias_ref, o_ref, acc_ref):
    """F-blocked variant: grid (M/TM, F/TF); the hidden dim is reduced in
    VMEM scratch (tiled-matmul accumulator pattern), residual+LN applied on
    the last F tile."""
    import jax.experimental.pallas as pl

    f = pl.program_id(1)
    nf = pl.num_programs(1)

    @pl.when(f == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    x = x_ref[:]
    h = jnp.dot(x.astype(jnp.bfloat16), w1_ref[:].astype(jnp.bfloat16),
                preferred_element_type=jnp.float32) + b1_ref[:]
    h = jnp.maximum(h, 0.0)
    acc_ref[:] += jnp.dot(h.astype(jnp.bfloat16),
                          w2_ref[:].astype(jnp.bfloat16),
                          preferred_element_type=jnp.float32)

    @pl.when(f == nf - 1)
    def _():
        r = x + acc_ref[:] + b2_ref[:]
        o_ref[:] = _std_ln(r, scale_ref[:], bias_ref[:])


@functools.partial(jax.jit, static_argnames=("interpret", "tile_m", "tile_f"))
def fused_ffn_ln_blocked(x, w1, b1, w2, b2, ln_scale, ln_bias,
                         tile_m: int = 256, tile_f: int = 1024,
                         interpret: bool = False):
    """F-blocked fused FFN+LN for weights too large to keep VMEM-resident
    (MCAN-large: D=1024, F=4096)."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    orig_shape = x.shape
    D = x.shape[-1]
    F = w1.shape[1]
    xm = x.reshape(-1, D)
    M = xm.shape[0]
    while tile_m > 8 and M % tile_m:
        tile_m //= 2
    while tile_f > 128 and F % tile_f:
        tile_f //= 2
    if M % tile_m or F % tile_f:
        # untileable rows/hidden: a grid of M//tile_m steps would UNDER-
        # cover the rows and leave the tail uninitialized — fall back
        return _ffn_ln_xla(xm.astype(jnp.float32), w1, b1, w2, b2,
                           ln_scale, ln_bias,
                           jnp.float32).reshape(orig_shape)

    out = pl.pallas_call(
        _ffn_ln_blocked_kernel,
        grid=(M // tile_m, F // tile_f),
        in_specs=[
            pl.BlockSpec((tile_m, D), lambda i, f: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((D, tile_f), lambda i, f: (0, f),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_f,), lambda i, f: (f,),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_f, D), lambda i, f: (f, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((D,), lambda i, f: (0,), memory_space=pltpu.VMEM),
            pl.BlockSpec((D,), lambda i, f: (0,), memory_space=pltpu.VMEM),
            pl.BlockSpec((D,), lambda i, f: (0,), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((tile_m, D), lambda i, f: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((M, D), jnp.float32),
        scratch_shapes=[pltpu.VMEM((tile_m, D), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary")),
        interpret=interpret,
    )(xm.astype(jnp.float32), w1, b1, w2, b2, ln_scale, ln_bias)
    return out.reshape(orig_shape)


def _ffn_ln_wstationary_kernel(x_ref, w1_ref, b1_ref, w2_ref, b2_ref,
                               scale_ref, bias_ref, o_ref):
    """Weight-STATIONARY dataflow for weights that exceed VMEM (MCAN-large
    1024x4096): grid (F/TF, M/TM) with the F axis OUTER, so each weight tile
    is fetched from HBM exactly once and reused across every row tile. The
    output block accumulates partial second-matmul products across outer
    steps; residual + LN run on the last F step.

    HBM traffic vs the M-outer blocked variant at MCAN-large B=64
    (M=3840): weights 16 MB (once) + x re-read per F step + out
    read-modify-write per F step ~= 100 MB/layer, instead of the
    (M/TM)x16 MB ~= 240 MB/layer weight re-streaming that made the
    M-outer variant lose to XLA."""
    import jax.experimental.pallas as pl

    f = pl.program_id(0)
    nf = pl.num_programs(0)

    x = x_ref[:]
    h = jnp.dot(x.astype(jnp.bfloat16), w1_ref[:].astype(jnp.bfloat16),
                preferred_element_type=jnp.float32) + b1_ref[:]
    h = jnp.maximum(h, 0.0)
    part = jnp.dot(h.astype(jnp.bfloat16), w2_ref[:].astype(jnp.bfloat16),
                   preferred_element_type=jnp.float32)

    @pl.when(f == 0)
    def _():
        o_ref[:] = part

    @pl.when(f > 0)
    def _():
        o_ref[:] += part

    @pl.when(f == nf - 1)
    def _():
        r = x + o_ref[:] + b2_ref[:]
        o_ref[:] = _std_ln(r, scale_ref[:], bias_ref[:])


@functools.partial(jax.jit,
                   static_argnames=("interpret", "tile_m", "tile_f"))
def fused_ffn_ln_weight_stationary(x, w1, b1, w2, b2, ln_scale, ln_bias,
                                   tile_m: int = 256, tile_f: int = 1024,
                                   interpret: bool = False):
    """Fused FFN+residual+LN for VMEM-exceeding weights; see kernel doc."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    orig_shape = x.shape
    D = x.shape[-1]
    F = w1.shape[1]
    xm = x.reshape(-1, D).astype(jnp.float32)
    M = xm.shape[0]
    while tile_m > 8 and M % tile_m:
        tile_m //= 2
    while tile_f > 128 and F % tile_f:
        tile_f //= 2
    if M % tile_m or F % tile_f:
        # untileable: see fused_ffn_ln_blocked — never under-cover rows
        return _ffn_ln_xla(xm, w1, b1, w2, b2, ln_scale, ln_bias,
                           jnp.float32).reshape(orig_shape)

    out = pl.pallas_call(
        _ffn_ln_wstationary_kernel,
        grid=(F // tile_f, M // tile_m),      # F OUTER: weights stationary
        in_specs=[
            pl.BlockSpec((tile_m, D), lambda f, i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((D, tile_f), lambda f, i: (0, f),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_f,), lambda f, i: (f,),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_f, D), lambda f, i: (f, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((D,), lambda f, i: (0,), memory_space=pltpu.VMEM),
            pl.BlockSpec((D,), lambda f, i: (0,), memory_space=pltpu.VMEM),
            pl.BlockSpec((D,), lambda f, i: (0,), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((tile_m, D), lambda f, i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((M, D), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary")),
        interpret=interpret,
    )(xm, w1, b1, w2, b2, ln_scale, ln_bias)
    return out.reshape(orig_shape)


@functools.partial(jax.jit, static_argnames=("interpret", "tile_m"))
def fused_ffn_ln(x, w1, b1, w2, b2, ln_scale, ln_bias,
                 tile_m: int = 256, interpret: bool = False):
    """x [B, L, D] (or [M, D]); returns StdLayerNorm(x + MLP(x)), same shape.

    Rows (B*L) must divide by a usable tile; callers fall back to XLA when
    they don't (the serving engine checks).
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    orig_shape = x.shape
    D = x.shape[-1]
    F = w1.shape[1]
    xm = x.reshape(-1, D)          # stream dtype (f32 or bf16), kept as-is
    M = xm.shape[0]
    out_dtype = xm.dtype
    while tile_m > 8 and M % tile_m:
        tile_m //= 2

    def _xla(xm):
        return _ffn_ln_xla(xm, w1, b1, w2, b2, ln_scale, ln_bias,
                           out_dtype).reshape(orig_shape)

    if M % tile_m:
        # rows not tileable (odd batch*length): plain XLA
        return _xla(xm)

    # VMEM guard: weights must stay resident; shrink the row tile first,
    # fall back to plain XLA when the weights alone exceed the budget
    # (e.g. MCAN-large: 2 x 1024x4096 matrices).
    wbytes = (D * F + F * D) * w1.dtype.itemsize
    def tile_bytes(t):
        return wbytes + t * (D * 4 * 2 + F * 4)   # x + out fp32, h fp32
    budget = 12 * 1024 * 1024
    while tile_m > 8 and tile_bytes(tile_m) > budget:
        tile_m //= 2
        while M % tile_m:
            tile_m //= 2
    if tile_bytes(tile_m) > budget:
        # Weights too large to keep fully VMEM-resident (MCAN-large
        # 1024x4096). Both streaming dataflows were measured SLOWER than
        # XLA at B=64 (M-outer blocked: 11.3K; F-outer weight-stationary:
        # 11.5K; XLA: 11.9K pairs/s) — XLA already streams each weight
        # once and fuses the relu, and the kernels pay an output-block
        # read-modify-write for the residual+LN fusion. Plain XLA it is;
        # both kernels stay exported/tested for larger-batch regimes.
        return _xla(xm)

    rep2 = lambda i: (0, 0)
    rep1 = lambda i: (0,)
    out = pl.pallas_call(
        _ffn_ln_kernel,
        grid=(M // tile_m,),
        in_specs=[
            pl.BlockSpec((tile_m, D), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((D, F), rep2, memory_space=pltpu.VMEM),
            pl.BlockSpec((F,), rep1, memory_space=pltpu.VMEM),
            pl.BlockSpec((F, D), rep2, memory_space=pltpu.VMEM),
            pl.BlockSpec((D,), rep1, memory_space=pltpu.VMEM),
            pl.BlockSpec((D,), rep1, memory_space=pltpu.VMEM),
            pl.BlockSpec((D,), rep1, memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((tile_m, D), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((M, D), out_dtype),
        interpret=interpret,
    )(xm, w1, b1, w2, b2, ln_scale, ln_bias)
    return out.reshape(orig_shape)
