"""Single-layer LSTM question encoder, written TPU-first.

Semantics match torch.nn.LSTM(num_layers=1, batch_first=True) — gate order
(i, f, g, o), two bias vectors, U(-1/sqrt(H), 1/sqrt(H)) init — because the
reference encodes questions with exactly that module
(reference: core/model/net.py:312-318) and checkpoint import must be exact.

TPU design: the input projection for ALL timesteps is one large
[B*L, E] x [E, 4H] matmul on the MXU; only the tiny recurrent
[B, H] x [H, 4H] matmul runs inside ``lax.scan`` (L=14 steps, negligible).
No dynamic shapes, no Python loop in the traced graph.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import linen as nn


def _uniform_init(bound: float):
    def init(key, shape, dtype=jnp.float32):
        return jax.random.uniform(key, shape, dtype, minval=-bound, maxval=bound)
    return init


class LSTMEncoder(nn.Module):
    """x [B, L, E] -> hidden states [B, L, H] (returns the full sequence)."""

    hidden_size: int
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x):
        B, L, E = x.shape
        H = self.hidden_size
        bound = 1.0 / (H ** 0.5)

        # Stored in flax (in, out) layout; torch keeps [4H, in] — the
        # checkpoint importer transposes. Gate order along 4H: i, f, g, o.
        w_ih = self.param("w_ih", _uniform_init(bound), (E, 4 * H))
        w_hh = self.param("w_hh", _uniform_init(bound), (H, 4 * H))
        b_ih = self.param("b_ih", _uniform_init(bound), (4 * H,))
        b_hh = self.param("b_hh", _uniform_init(bound), (4 * H,))

        # One big MXU matmul for every timestep's input projection.
        x_proj = (
            jnp.dot(x.astype(self.dtype), w_ih.astype(self.dtype),
                    preferred_element_type=jnp.float32)
            + b_ih + b_hh
        )  # [B, L, 4H] fp32

        w_hh_c = w_hh.astype(self.dtype)

        def step(carry, xp_t):
            h, c = carry  # [B, H] fp32
            gates = xp_t + jnp.dot(h.astype(self.dtype), w_hh_c,
                                   preferred_element_type=jnp.float32)
            i, f, g, o = jnp.split(gates, 4, axis=-1)
            i = jax.nn.sigmoid(i)
            f = jax.nn.sigmoid(f)
            g = jnp.tanh(g)
            o = jax.nn.sigmoid(o)
            c = f * c + i * g
            h = o * jnp.tanh(c)
            return (h, c), h

        h0 = jnp.zeros((B, H), jnp.float32)
        c0 = jnp.zeros((B, H), jnp.float32)
        # scan over time: [L, B, 4H]
        (_, _), hs = jax.lax.scan(step, (h0, c0), jnp.swapaxes(x_proj, 0, 1))
        return jnp.swapaxes(hs, 0, 1)  # [B, L, H]
