"""Sample-packed attention: exact parity with the unpacked path."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mcan_vqa_tpu.configs import Config
from mcan_vqa_tpu.models.net import build_mcan
from mcan_vqa_tpu.ops.masked_attention import masked_attention_xla
from mcan_vqa_tpu.ops.packed_attention import (
    choose_pack, packed_masked_attention, packing_factor)


def _case(B, H, Lq, Lk, Dh, seed=0):
    rng = np.random.default_rng(seed)
    q = rng.normal(size=(B, H, Lq, Dh)).astype(np.float32)
    k = rng.normal(size=(B, H, Lk, Dh)).astype(np.float32)
    v = rng.normal(size=(B, H, Lk, Dh)).astype(np.float32)
    mask = np.zeros((B, 1, 1, Lk), bool)
    for b in range(B):
        mask[b, ..., max(1, (b * 7) % Lk):] = True
    return map(jnp.asarray, (q, k, v, mask))


class TestPackingFactors:
    def test_factors(self):
        assert packing_factor(14) == 9
        assert packing_factor(60) == 2
        assert packing_factor(128) == 1
        assert choose_pack(512, 14) == 8   # 9 doesn't divide 512
        assert choose_pack(512, 60) == 2
        assert choose_pack(7, 14) == 7


class TestPackedParity:
    @pytest.mark.parametrize("B,Lq,Lk,pack", [
        (8, 14, 14, 8),    # question self-attention
        (8, 60, 60, 2),    # image self-attention
        (8, 60, 14, 2),    # SGA cross-attention
    ])
    def test_matches_unpacked(self, B, Lq, Lk, pack):
        q, k, v, mask = _case(B, 4, Lq, Lk, 32)
        packed = packed_masked_attention(q, k, v, mask, pack=pack,
                                         compute_dtype=jnp.float32)
        ref = masked_attention_xla(q, k, v, mask,
                                   compute_dtype=jnp.float32)
        np.testing.assert_allclose(np.asarray(packed), np.asarray(ref),
                                   atol=1e-5)

    def test_no_mask(self):
        q, k, v, _ = _case(6, 2, 14, 14, 32)
        packed = packed_masked_attention(q, k, v, None, pack=3,
                                         compute_dtype=jnp.float32)
        ref = masked_attention_xla(q, k, v, None, compute_dtype=jnp.float32)
        np.testing.assert_allclose(np.asarray(packed), np.asarray(ref),
                                   atol=1e-5)

    def test_indivisible_batch_falls_back(self):
        q, k, v, mask = _case(7, 2, 14, 14, 32)
        packed = packed_masked_attention(q, k, v, mask, pack=2,
                                         compute_dtype=jnp.float32)
        ref = masked_attention_xla(q, k, v, mask, compute_dtype=jnp.float32)
        np.testing.assert_allclose(np.asarray(packed), np.asarray(ref),
                                   atol=1e-5)

    def test_all_pad_sample_matches_unpacked(self):
        """A sample whose keys are ALL padding (the dummy rows callers
        pad the batch with) must produce the same (degenerate) output
        as the unpacked op — the previous single-level mask let such a
        row attend uniformly across the OTHER packed samples' values."""
        q, k, v, mask = _case(4, 2, 14, 14, 32)
        mask = mask.at[2].set(True)    # sample 2: every key padded
        packed = packed_masked_attention(q, k, v, mask, pack=4,
                                         compute_dtype=jnp.float32)
        ref = masked_attention_xla(q, k, v, mask,
                                   compute_dtype=jnp.float32)
        np.testing.assert_allclose(np.asarray(packed), np.asarray(ref),
                                   atol=1e-5)
        # and the degenerate sample must not leak neighbors' values:
        # the uniform mix over its OWN keys is invariant to sample 3
        v2 = v.at[3].add(50.0)
        packed2 = packed_masked_attention(q, k, v2, mask, pack=4,
                                          compute_dtype=jnp.float32)
        np.testing.assert_allclose(np.asarray(packed[2]),
                                   np.asarray(packed2[2]), atol=1e-6)

    def test_no_cross_sample_leakage(self):
        """Perturbing sample 0 must not change sample 1's output."""
        q, k, v, mask = _case(4, 2, 14, 14, 32)
        out1 = packed_masked_attention(q, k, v, mask, pack=4,
                                       compute_dtype=jnp.float32)
        q2 = q.at[0].mul(100.0)
        k2 = k.at[0].add(3.0)
        out2 = packed_masked_attention(q2, k2, v, mask, pack=4,
                                       compute_dtype=jnp.float32)
        np.testing.assert_allclose(np.asarray(out1[1:]),
                                   np.asarray(out2[1:]), atol=1e-6)


class TestFullModelWithPacking:
    def test_logits_match_unpacked_model(self):
        cfg = Config(hidden_size=32, layer=2, multi_head=4, img_feat_size=16,
                     img_feat_pad_size=12, max_token=7, flat_out_size=32,
                     flat_mlp_size=16, compute_dtype="float32",
                     use_glove=False).finalize()
        m_plain = build_mcan(cfg, 40, 12, use_packing=False)
        m_packed = build_mcan(cfg, 40, 12, use_packing=True)
        rng = np.random.default_rng(1)
        img = rng.normal(size=(8, 12, 16)).astype(np.float32)
        img[0, 6:] = 0
        ques = rng.integers(1, 40, size=(8, 7)).astype(np.int32)
        ques[2, 3:] = 0
        params = m_plain.init({"params": jax.random.PRNGKey(0)}, img,
                              ques)["params"]
        ref = m_plain.apply({"params": params}, img, ques)["logits"]
        out = m_packed.apply({"params": params}, img, ques)["logits"]
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   atol=1e-4)
