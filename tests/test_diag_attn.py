"""ops/diag_attn: block-diagonal self-attention for the packed layout.

The serving megakernels and train kernels all share this helper; it must
be (a) bitwise what the full-width masked softmax produces — off-diagonal
probabilities underflow to exactly +0.0 — and (b) enabled only where the
MXU tile math says per-sample matmuls are cheaper (L=100 image streams
yes, L=14 question streams no)."""

import jax
import jax.numpy as jnp
import numpy as np

from mcan_vqa_tpu.ops.diag_attn import diag_pad_add, diag_sdpa, use_diag

_NEG_INF = -1e9


def _full_sdpa(qh, kh, vh, G, L, pad, scale):
    """The full-width packed reference: [M, M] scores with off-block +
    key-padding masked to -1e9 (the kernels' original sdpa)."""
    M = G * L
    off = (jax.lax.broadcasted_iota(jnp.int32, (M, M), 0) // L
           != jax.lax.broadcasted_iota(jnp.int32, (M, M), 1) // L)
    mask_add = (off.astype(jnp.float32) + pad) * _NEG_INF
    s = jax.lax.dot_general(
        qh.astype(jnp.bfloat16), kh,
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32) * scale + mask_add
    m = jnp.max(s, axis=-1, keepdims=True)
    e = jnp.exp(s - m)
    att = (e / jnp.sum(e, axis=-1, keepdims=True)).astype(jnp.bfloat16)
    return jnp.dot(att, vh, preferred_element_type=jnp.float32)


class TestUseDiag:
    def test_image_stream_shapes_enable(self):
        # L=100 image streams: G x 1 tile vs ceil(GL/128)^2 tiles
        assert use_diag(4, 100)
        assert use_diag(2, 100)
        assert use_diag(16, 100)

    def test_question_shapes_disable(self):
        # 14-token questions: per-sample matmuls pad each to a full tile
        assert not use_diag(16, 14)
        assert not use_diag(8, 14)
        assert not use_diag(9, 14)

    def test_g1_and_env_off(self):
        assert not use_diag(1, 100)
        assert not use_diag(4, 100, enabled=False)


class TestDiagSdpaBitwise:
    def test_matches_full_width_with_padding(self):
        G, L, Dh = 4, 20, 16
        M = G * L
        ks = jax.random.split(jax.random.PRNGKey(0), 3)
        qh = jax.random.normal(ks[0], (M, Dh), jnp.float32)
        kh = jax.random.normal(ks[1], (M, Dh), jnp.float32).astype(
            jnp.bfloat16)
        vh = jax.random.normal(ks[2], (M, Dh), jnp.float32).astype(
            jnp.bfloat16)
        # pad the tail of two samples' key ranges
        pad = np.zeros((1, M), np.float32)
        pad[0, L - 3:L] = 1.0
        pad[0, 3 * L + L - 5:] = 1.0
        pad = jnp.asarray(pad)
        scale = 1.0 / (Dh ** 0.5)

        got = diag_sdpa(qh, kh, vh, diag_pad_add(pad, G, L), G, L, scale)
        want = _full_sdpa(qh, kh, vh, G, L, pad, scale)
        np.testing.assert_array_equal(np.asarray(got), np.asarray(want))
