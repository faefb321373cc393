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
               step: int = 0) -> "TrainState":
        return cls(
            params=params,
            opt_state=tx.init(params),
            step=jnp.asarray(step, jnp.int32),
            dropout_rng=jax.random.PRNGKey(seed),
        )
