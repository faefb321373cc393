"""Reduced-bit-width dropout (ops/dropout.py).

The reference applies standard inverted dropout (rate 0.1) on attention
maps, FFN activations, and each sublayer output (core/model/mca.py:75-77,
net_utils.py:24). The TPU rebuild draws 32 random bits per keep decision by
default (exact bernoulli; set dropout_bits=8/16 for 4x/2x less
RngBitGenerator work at a quantized rate); these tests pin the statistical
contract: realized drop rate matches the quantized target, the rescale is
exactly unbiased, masks differ across RNG keys, and the model integrates
the knob end to end.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mcan_vqa_tpu.ops.dropout import TpuDropout, dropout, random_keep_mask


@pytest.mark.parametrize("bit_width", [8, 16, 32])
def test_keep_rate_matches_quantized_target(bit_width):
    rng = jax.random.PRNGKey(0)
    rate = 0.1
    keep, inv_keep = random_keep_mask(rng, rate, (200, 517), bit_width)
    q = 1 << bit_width
    t = max(1, min(q - 1, round((1.0 - rate) * q)))
    expected_keep = t / q if bit_width < 32 else 1.0 - rate
    observed = float(jnp.mean(keep.astype(jnp.float32)))
    # 103,400 samples: 4 sigma ~= 0.004
    assert abs(observed - expected_keep) < 0.005
    assert inv_keep == pytest.approx(1.0 / expected_keep, rel=1e-6)


@pytest.mark.parametrize("bit_width", [8, 16])
def test_dropout_is_exactly_unbiased(bit_width):
    """E[dropout(x)] == x: kept values are scaled by the exact quantized
    keep probability, not the nominal one."""
    rng = jax.random.PRNGKey(1)
    x = jnp.ones((400, 512), jnp.float32)
    y = dropout(x, 0.1, rng, bit_width)
    assert abs(float(jnp.mean(y)) - 1.0) < 0.01
    # kept entries carry exactly inv_keep, dropped are exactly 0
    vals = np.unique(np.asarray(y).round(6))
    assert len(vals) == 2 and vals[0] == 0.0


def test_odd_shapes_and_key_independence():
    rng1, rng2 = jax.random.PRNGKey(2), jax.random.PRNGKey(3)
    # shape whose element count is not a multiple of 4 (uint32 packing)
    x = jnp.ones((7, 13, 3), jnp.float32)
    a = dropout(x, 0.3, rng1, 8)
    b = dropout(x, 0.3, rng2, 8)
    assert a.shape == x.shape
    assert not np.array_equal(np.asarray(a), np.asarray(b))
    # same key -> same mask (deterministic given the key)
    c = dropout(x, 0.3, rng1, 8)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(c))


def test_invalid_bit_width_raises():
    with pytest.raises(ValueError):
        random_keep_mask(jax.random.PRNGKey(0), 0.1, (4, 4), 12)


def test_module_deterministic_passthrough():
    x = jnp.arange(24, dtype=jnp.float32).reshape(4, 6)
    mod = TpuDropout(0.5, 8)
    y = mod.apply({}, x, True)
    np.testing.assert_array_equal(np.asarray(y), np.asarray(x))


def test_model_threads_dropout_bits():
    """A training-mode forward with dropout_bits=8 runs and differs across
    dropout keys, matching the eval-mode forward when deterministic."""
    from mcan_vqa_tpu.configs import Config
    from mcan_vqa_tpu.models.net import build_mcan

    cfg = Config(hidden_size=64, layer=2, multi_head=4, flat_mlp_size=32,
                 flat_out_size=64, use_glove=False,
                 dropout_bits=8).finalize()
    model = build_mcan(cfg, token_size=50, answer_size=10)
    img = jnp.ones((2, 8, cfg.img_feat_size), jnp.float32)
    ques = jnp.ones((2, cfg.max_token), jnp.int32)
    params = model.init({"params": jax.random.PRNGKey(0)}, img, ques)["params"]

    out1 = model.apply({"params": params}, img, ques, deterministic=False,
                       rngs={"dropout": jax.random.PRNGKey(1)})["logits"]
    out2 = model.apply({"params": params}, img, ques, deterministic=False,
                       rngs={"dropout": jax.random.PRNGKey(2)})["logits"]
    det1 = model.apply({"params": params}, img, ques,
                       deterministic=True)["logits"]
    det2 = model.apply({"params": params}, img, ques,
                       deterministic=True)["logits"]
    assert not np.allclose(np.asarray(out1), np.asarray(out2))
    np.testing.assert_array_equal(np.asarray(det1), np.asarray(det2))


def test_rbg_key_compatible():
    """dropout works with the rbg-impl keys the TrainState uses."""
    key = jax.random.key(0, impl="rbg")
    y = dropout(jnp.ones((64, 64)), 0.1, key, 8)
    kept = float(jnp.mean((y > 0).astype(jnp.float32)))
    assert 0.85 < kept < 0.95
