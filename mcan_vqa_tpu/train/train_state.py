"""Training state pytree: params, optimizer state, step counter, RNG key.

A minimal flax.struct dataclass (not flax.training.train_state) so the
checkpoint layout is explicit and orbax-friendly.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
import optax
from flax import struct


@struct.dataclass
class TrainState:
    params: Any
    opt_state: Any
    step: jnp.ndarray            # optimizer step count (0-based optax count)
    dropout_rng: jax.Array

    @classmethod
    def create(cls, params, tx: optax.GradientTransformation, seed: int = 444,
               step: int = 0, rng_impl: str = "rbg") -> "TrainState":
        """rng_impl: PRNG implementation for dropout keys. "rbg" uses the
        TPU-native XLA RngBitGenerator — measured 30 ms/step cheaper than
        the default threefry at MCAN-small B=256 (dropout was 42% of the
        step); dropout masks are statistically equivalent but not
        bit-identical to threefry's. "threefry" (alias for jax's
        "threefry2x32") restores the jax default (and jax-version-stable
        mask sequences)."""
        if rng_impl == "threefry":
            rng_impl = "threefry2x32"
        return cls(
            params=params,
            opt_state=tx.init(params),
            step=jnp.asarray(step, jnp.int32),
            dropout_rng=jax.random.key(seed, impl=rng_impl),
        )
