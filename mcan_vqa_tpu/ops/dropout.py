"""Reduced-bit-width dropout masks (TPU-native).

The round-2 training ablation (docs/PERFORMANCE.md) measured dropout as the
largest non-matmul cost of the train step: with the default threefry PRNG it
was 42% of the MCAN-small step, and even with the hardware RngBitGenerator
(``dropout_rng_impl="rbg"``) mask generation + apply still costs ~6.7 ms of
a 48.9 ms step. The remaining cost is proportional to the number of random
BITS generated: ``jax.random.bernoulli`` draws 32 bits per element.

A dropout keep-decision needs far fewer bits in principle: this module can
draw ``bit_width`` bits per element (8 or 16) by generating packed uint32
words and bitcasting to uint8/uint16 lanes — 4x (or 2x) less
RngBitGenerator work, independent of the PRNG implementation.

MEASURED RESULT (TPU v5e, MCAN-small B=256 train step): 32 bits 49.0 ms,
16 bits 58.6 ms, 8 bits 57.3 ms — the narrow-int bitcast/compare/select
chain costs MORE on the VPU than the saved bit generation, so 32 remains
the default and the narrow widths stay opt-in. The uint8 MASK FORMAT is
still what the fused train kernels consume (ops/sga_train.py) — there the
select runs in-kernel and only the mask bytes cross HBM.

Semantics: keep probability is quantized to t / 2**bit_width, the closest
representable value to (1 - rate); the kept values are rescaled by the
EXACT quantized keep probability, so E[dropout(x)] == x holds exactly.
At bit_width=8, rate=0.1 the realized drop rate is 26/256 ~= 0.1016
(0.16% absolute skew); at bit_width=16 the skew is <2e-5. bit_width=32
is ``jax.random.bernoulli`` (exact rate, reference behavior; reference
dropout: core/model/mca.py:75-77, core/model/net_utils.py:24).
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp
from flax import linen as nn

_UINT = {8: jnp.uint8, 16: jnp.uint16}


def random_keep_mask(rng: jax.Array, rate: float, shape,
                     bit_width: int = 32):
    """Bool keep-mask of ``shape`` plus the exact inverse keep probability.

    bit_width: random bits drawn per element (8, 16, or 32).
    """
    if bit_width == 32:
        return (jax.random.bernoulli(rng, 1.0 - rate, shape),
                1.0 / (1.0 - rate))
    if bit_width not in _UINT:
        raise ValueError(f"bit_width must be 8, 16, or 32; got {bit_width}")
    q = 1 << bit_width
    t = int(round((1.0 - rate) * q))
    t = max(1, min(q - 1, t))
    n = math.prod(shape)
    per_word = 32 // bit_width
    n_words = -(-n // per_word)
    words = jax.random.bits(rng, (n_words,), jnp.uint32)
    lanes = jax.lax.bitcast_convert_type(words, _UINT[bit_width])
    r = lanes.reshape(-1)[:n].reshape(shape)
    keep = r < jnp.asarray(t, _UINT[bit_width])
    return keep, float(q) / t


def dropout(x: jnp.ndarray, rate: float, rng: jax.Array,
            bit_width: int = 32) -> jnp.ndarray:
    """Apply (inverted, unbiased) dropout to x. Caller gates on training."""
    if rate <= 0.0:
        return x
    if rate >= 1.0:
        # nn.Dropout parity: everything drops. Falling through would
        # divide by zero at bit_width=32 and keep ~1/2^bits of elements
        # scaled by 2^bits at 8/16 bits.
        return jnp.zeros_like(x)
    keep, inv_keep = random_keep_mask(rng, rate, x.shape, bit_width)
    return jnp.where(keep, x * jnp.asarray(inv_keep, x.dtype),
                     jnp.zeros((), x.dtype))


class TpuDropout(nn.Module):
    """Drop-in nn.Dropout replacement drawing ``bit_width`` bits/element."""

    rate: float
    bit_width: int = 32

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        if deterministic or self.rate <= 0.0:
            return x
        return dropout(x, self.rate, self.make_rng("dropout"),
                       self.bit_width)
