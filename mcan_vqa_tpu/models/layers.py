"""Primitive NN layers: Dense with PyTorch-default init, std-LayerNorm, MLP.

Behavioral spec (reference: core/model/net_utils.py:11-60):
  * FC     = Linear -> ReLU -> Dropout
  * MLP    = FC -> Linear
  * LayerNorm normalizes by the *Bessel-corrected standard deviation* with
    eps added to the std (NOT to the variance) — this differs from standard
    flax/optax LayerNorm and matters for checkpoint parity, so it is
    implemented explicitly here.

TPU notes: Dense layers compute in ``dtype`` (bfloat16 by default, feeding
the MXU) while parameters stay float32; LayerNorm statistics are always
computed in float32 on the VPU.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import linen as nn

from mcan_vqa_tpu.ops.dropout import TpuDropout


def torch_linear_kernel_init(key, shape, dtype=jnp.float32):
    """U(-1/sqrt(fan_in), 1/sqrt(fan_in)) — PyTorch nn.Linear default.

    Matching init keeps training dynamics comparable with the reference runs.
    shape is (in_features, out_features) in flax convention.
    """
    fan_in = shape[0]
    bound = 1.0 / jnp.sqrt(jnp.asarray(fan_in, jnp.float32))
    return jax.random.uniform(key, shape, dtype, minval=-bound, maxval=bound)


def torch_linear_bias_init(fan_in: int):
    def init(key, shape, dtype=jnp.float32):
        bound = 1.0 / jnp.sqrt(jnp.asarray(fan_in, jnp.float32))
        return jax.random.uniform(key, shape, dtype, minval=-bound, maxval=bound)
    return init


class Dense(nn.Module):
    """nn.Dense with PyTorch-default initialization and bf16 compute."""

    features: int
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x):
        in_features = x.shape[-1]
        kernel = self.param(
            "kernel", torch_linear_kernel_init, (in_features, self.features))
        bias = self.param(
            "bias", torch_linear_bias_init(in_features), (self.features,))
        y = jnp.dot(x.astype(self.dtype), kernel.astype(self.dtype),
                    preferred_element_type=jnp.float32)
        return y + bias  # bias add in fp32; result fp32


class StdLayerNorm(nn.Module):
    """LayerNorm in the reference's form: (x - mean) / (std + eps) * a + b.

    std is Bessel-corrected (ddof=1) to match torch.Tensor.std
    (reference: core/model/net_utils.py:48-60). Stats in float32.
    """

    eps: float = 1e-6

    @nn.compact
    def __call__(self, x):
        dim = x.shape[-1]
        scale = self.param("scale", nn.initializers.ones, (dim,))
        bias = self.param("bias", nn.initializers.zeros, (dim,))
        x32 = x.astype(jnp.float32)
        mean = jnp.mean(x32, axis=-1, keepdims=True)
        centered = x32 - mean
        var = jnp.sum(centered * centered, axis=-1, keepdims=True) / (dim - 1)
        std = jnp.sqrt(var)
        return scale * centered / (std + self.eps) + bias


class FCLayer(nn.Module):
    """Linear -> ReLU -> Dropout (reference: core/model/net_utils.py:11-34)."""

    features: int
    dropout_rate: float = 0.0
    use_relu: bool = True
    dtype: jnp.dtype = jnp.bfloat16
    dropout_bits: int = 32

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        x = Dense(self.features, dtype=self.dtype)(x)
        if self.use_relu:
            x = jax.nn.relu(x)
        if self.dropout_rate > 0:
            x = TpuDropout(self.dropout_rate, self.dropout_bits)(
                x, deterministic)
        return x


class MLPBlock(nn.Module):
    """FC -> Linear (reference: core/model/net_utils.py:37-45)."""

    mid_features: int
    out_features: int
    dropout_rate: float = 0.0
    use_relu: bool = True
    dtype: jnp.dtype = jnp.bfloat16
    dropout_bits: int = 32

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        x = FCLayer(self.mid_features, self.dropout_rate, self.use_relu,
                    dtype=self.dtype, dropout_bits=self.dropout_bits)(
                        x, deterministic)
        return Dense(self.out_features, dtype=self.dtype)(x)


def make_mask(feature: jnp.ndarray) -> jnp.ndarray:
    """Pad mask from all-zero feature rows: [B, L, D] -> bool [B, 1, 1, L].

    True marks PAD positions (reference: core/model/net.py:379-381).
    For integer token ids pass ids[..., None] so the row-sum rule applies.
    """
    return (jnp.sum(jnp.abs(feature), axis=-1) == 0)[:, None, None, :]
