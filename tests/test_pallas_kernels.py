"""Pallas kernel parity tests (interpreter mode on CPU; the same kernels run
compiled on TPU via the bench/serving path)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mcan_vqa_tpu.ops.attflat import attflat_pallas
from mcan_vqa_tpu.ops.masked_attention import (
    masked_attention_pallas, masked_attention_xla)


class TestMaskedAttentionPallas:
    def _case(self, B=2, H=4, Lq=14, Lk=60, Dh=64, seed=0, mask_frac=0.3):
        rng = np.random.default_rng(seed)
        q = rng.normal(size=(B, H, Lq, Dh)).astype(np.float32)
        k = rng.normal(size=(B, H, Lk, Dh)).astype(np.float32)
        v = rng.normal(size=(B, H, Lk, Dh)).astype(np.float32)
        mask = np.zeros((B, 1, 1, Lk), bool)
        for b in range(B):
            n = int(Lk * (1 - mask_frac)) + b
            mask[b, ..., n:] = True
        return q, k, v, mask

    def test_matches_xla_path(self):
        q, k, v, mask = self._case()
        ours = masked_attention_pallas(q, k, v, jnp.asarray(mask),
                                       interpret=True)
        ref = masked_attention_xla(jnp.asarray(q), jnp.asarray(k),
                                   jnp.asarray(v), jnp.asarray(mask),
                                   compute_dtype=jnp.bfloat16)
        np.testing.assert_allclose(np.asarray(ours), np.asarray(ref),
                                   atol=2e-2, rtol=2e-2)

    def test_no_mask(self):
        q, k, v, _ = self._case(Lk=16)
        ours = masked_attention_pallas(q, k, v, None, interpret=True)
        ref = masked_attention_xla(jnp.asarray(q), jnp.asarray(k),
                                   jnp.asarray(v), None,
                                   compute_dtype=jnp.bfloat16)
        np.testing.assert_allclose(np.asarray(ours), np.asarray(ref),
                                   atol=2e-2, rtol=2e-2)

    def test_masked_positions_ignored(self):
        """Garbage in masked K/V rows must not leak into the output."""
        q, k, v, mask = self._case(B=1)
        k2, v2 = k.copy(), v.copy()
        k2[:, :, mask[0, 0, 0]] = 1e4
        v2[:, :, mask[0, 0, 0]] = -1e4
        a = masked_attention_pallas(q, k, v, jnp.asarray(mask), interpret=True)
        b = masked_attention_pallas(q, k2, v2, jnp.asarray(mask),
                                    interpret=True)
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-3)


class TestAttFlatPallas:
    def _params(self, D=64, M=32, G=1, O=48, seed=1):
        rng = np.random.default_rng(seed)
        return (rng.normal(size=(D, M)).astype(np.float32) * 0.1,
                rng.normal(size=(M,)).astype(np.float32) * 0.1,
                rng.normal(size=(M, G)).astype(np.float32) * 0.1,
                rng.normal(size=(G,)).astype(np.float32) * 0.1,
                rng.normal(size=(G * D, O)).astype(np.float32) * 0.1,
                rng.normal(size=(O,)).astype(np.float32) * 0.1)

    def _xla_ref(self, x, mask, w1, b1, w2, b2, wm, bm):
        h = jax.nn.relu(x @ w1 + b1)
        logits = h @ w2 + b2
        logits = jnp.where(mask[:, 0, 0, :, None], -1e9, logits)
        att = jax.nn.softmax(logits, axis=1)
        pooled = jnp.einsum("blg,bld->bgd", att, x).reshape(x.shape[0], -1)
        return pooled @ wm + bm, att

    @pytest.mark.parametrize("G", [1, 2])
    def test_matches_xla(self, G):
        rng = np.random.default_rng(0)
        B, L, D = 3, 14, 64
        x = rng.normal(size=(B, L, D)).astype(np.float32)
        mask = np.zeros((B, 1, 1, L), bool)
        mask[0, ..., 9:] = True
        mask[2, ..., 4:] = True
        params = self._params(D=D, G=G)
        out, att = attflat_pallas(x, jnp.asarray(mask), *params,
                                  interpret=True)
        ref_out, ref_att = self._xla_ref(jnp.asarray(x), jnp.asarray(mask),
                                         *map(jnp.asarray, params))
        np.testing.assert_allclose(np.asarray(att), np.asarray(ref_att),
                                   atol=1e-2)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref_out),
                                   atol=5e-2, rtol=2e-2)

    def test_pad_rows_zero_attention(self):
        rng = np.random.default_rng(2)
        B, L, D = 1, 8, 64
        x = rng.normal(size=(B, L, D)).astype(np.float32)
        mask = np.zeros((B, 1, 1, L), bool)
        mask[0, ..., 5:] = True
        _, att = attflat_pallas(x, jnp.asarray(mask), *self._params(D=D),
                                interpret=True)
        assert np.asarray(att)[0, 5:].max() < 1e-6
        np.testing.assert_allclose(np.asarray(att).sum(axis=1), 1.0,
                                   atol=1e-5)


class TestBatchedAttentionPallas:
    def test_matches_xla(self):
        from mcan_vqa_tpu.ops.masked_attention import (
            masked_attention_pallas_batched)
        rng = np.random.default_rng(0)
        B, H, Lq, Lk, Dh = 16, 4, 14, 60, 64
        q = rng.normal(size=(B, H, Lq, Dh)).astype(np.float32)
        k = rng.normal(size=(B, H, Lk, Dh)).astype(np.float32)
        v = rng.normal(size=(B, H, Lk, Dh)).astype(np.float32)
        mask = np.zeros((B, 1, 1, Lk), bool)
        for b in range(B):
            mask[b, ..., 10 + b:] = True
        ours = masked_attention_pallas_batched(q, k, v, jnp.asarray(mask),
                                               block_b=8, interpret=True)
        ref = masked_attention_xla(jnp.asarray(q), jnp.asarray(k),
                                   jnp.asarray(v), jnp.asarray(mask),
                                   compute_dtype=jnp.bfloat16)
        np.testing.assert_allclose(np.asarray(ours), np.asarray(ref),
                                   atol=2e-2, rtol=2e-2)

    def test_odd_batch_degrades_block(self):
        from mcan_vqa_tpu.ops.masked_attention import (
            masked_attention_pallas_batched)
        rng = np.random.default_rng(1)
        B, H, L, Dh = 6, 2, 8, 32
        q = rng.normal(size=(B, H, L, Dh)).astype(np.float32)
        out = masked_attention_pallas_batched(q, q, q, None, block_b=4,
                                              interpret=True)
        ref = masked_attention_xla(jnp.asarray(q), jnp.asarray(q),
                                   jnp.asarray(q), None,
                                   compute_dtype=jnp.bfloat16)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   atol=2e-2, rtol=2e-2)


class TestFusedFFNLN:
    def _ref(self, x, w1, b1, w2, b2, sc, bi):
        h = jax.nn.relu(x @ w1 + b1)
        r = x + (h @ w2 + b2)
        d = r.shape[-1]
        mean = r.mean(-1, keepdims=True)
        c = r - mean
        var = (c * c).sum(-1, keepdims=True) / (d - 1)
        return sc * c / (jnp.sqrt(var) + 1e-6) + bi

    def test_matches_xla(self):
        from mcan_vqa_tpu.ops.fused_ffn import fused_ffn_ln
        rng = np.random.default_rng(0)
        B, L, D, F = 4, 16, 64, 256
        x = rng.normal(size=(B, L, D)).astype(np.float32)
        w1 = rng.normal(size=(D, F)).astype(np.float32) * 0.05
        b1 = rng.normal(size=(F,)).astype(np.float32) * 0.05
        w2 = rng.normal(size=(F, D)).astype(np.float32) * 0.05
        b2 = rng.normal(size=(D,)).astype(np.float32) * 0.05
        sc = rng.normal(size=(D,)).astype(np.float32)
        bi = rng.normal(size=(D,)).astype(np.float32)
        out = fused_ffn_ln(x, w1, b1, w2, b2, sc, bi, tile_m=32,
                           interpret=True)
        ref = self._ref(*map(jnp.asarray, (x, w1, b1, w2, b2, sc, bi)))
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   atol=5e-2, rtol=5e-2)

    def test_tile_degrades_to_divisor(self):
        from mcan_vqa_tpu.ops.fused_ffn import fused_ffn_ln
        rng = np.random.default_rng(1)
        x = rng.normal(size=(3, 8, 32)).astype(np.float32)  # M=24
        w1 = rng.normal(size=(32, 64)).astype(np.float32) * 0.1
        w2 = rng.normal(size=(64, 32)).astype(np.float32) * 0.1
        out = fused_ffn_ln(x, w1, np.zeros(64, np.float32), w2,
                           np.zeros(32, np.float32),
                           np.ones(32, np.float32), np.zeros(32, np.float32),
                           tile_m=16, interpret=True)  # 24 % 16 != 0 -> 8
        ref = self._ref(jnp.asarray(x), jnp.asarray(w1), 0.0,
                        jnp.asarray(w2), 0.0, 1.0, 0.0)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   atol=5e-2, rtol=5e-2)

    def test_blocked_variant_matches(self):
        from mcan_vqa_tpu.ops.fused_ffn import fused_ffn_ln_blocked
        rng = np.random.default_rng(2)
        B, L, D, F = 2, 16, 64, 256
        x = rng.normal(size=(B, L, D)).astype(np.float32)
        w1 = rng.normal(size=(D, F)).astype(np.float32) * 0.05
        b1 = rng.normal(size=(F,)).astype(np.float32) * 0.05
        w2 = rng.normal(size=(F, D)).astype(np.float32) * 0.05
        b2 = rng.normal(size=(D,)).astype(np.float32) * 0.05
        sc = rng.normal(size=(D,)).astype(np.float32)
        bi = rng.normal(size=(D,)).astype(np.float32)
        out = fused_ffn_ln_blocked(x, w1, b1, w2, b2, sc, bi, tile_m=16,
                                   tile_f=64, interpret=True)
        ref = self._ref(*map(jnp.asarray, (x, w1, b1, w2, b2, sc, bi)))
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   atol=5e-2, rtol=5e-2)


class TestPackedAttentionPallas:
    """Block-diagonal packed kernel: G samples share one MXU-tile matmul;
    cross-sample scores are masked to -1e9 inside the softmax, so numerics
    must equal the per-sample XLA path exactly (up to bf16 matmul noise)."""

    def _case(self, B, H, Lq, Lk, Dh=64, seed=0):
        rng = np.random.default_rng(seed)
        q = rng.normal(size=(B, H, Lq, Dh)).astype(np.float32)
        k = rng.normal(size=(B, H, Lk, Dh)).astype(np.float32)
        v = rng.normal(size=(B, H, Lk, Dh)).astype(np.float32)
        mask = np.zeros((B, 1, 1, Lk), bool)
        for b in range(B):
            mask[b, ..., max(2, Lk - 1 - b):] = True
        return q, k, v, mask

    @pytest.mark.parametrize("shape", [
        (18, 4, 14, 14),   # SA question path, G=9 -> 126 rows
        (8, 4, 60, 60),    # SGA image self-attention, G=2 -> 120 rows
        (16, 2, 60, 14),   # SGA cross-attention (image queries, ques keys)
    ])
    def test_matches_xla(self, shape):
        from mcan_vqa_tpu.ops.masked_attention import (
            masked_attention_pallas_packed)
        B, H, Lq, Lk = shape
        q, k, v, mask = self._case(B, H, Lq, Lk)
        ours = masked_attention_pallas_packed(q, k, v, jnp.asarray(mask),
                                              interpret=True)
        ref = masked_attention_xla(jnp.asarray(q), jnp.asarray(k),
                                   jnp.asarray(v), jnp.asarray(mask),
                                   compute_dtype=jnp.bfloat16)
        np.testing.assert_allclose(np.asarray(ours), np.asarray(ref),
                                   atol=2e-2, rtol=2e-2)

    def test_no_cross_sample_leakage(self):
        """Scaling sample j's values must not change sample i's output."""
        from mcan_vqa_tpu.ops.masked_attention import (
            masked_attention_pallas_packed)
        B, H, L, Dh = 4, 2, 60, 64
        q, k, v, mask = self._case(B, H, L, L, Dh)
        base = np.asarray(masked_attention_pallas_packed(
            q, k, v, jnp.asarray(mask), group=2, interpret=True))
        v2 = v.copy()
        v2[1] *= 100.0   # same group as sample 0 (G=2)
        k2 = k.copy()
        k2[1] += 3.0
        pert = np.asarray(masked_attention_pallas_packed(
            q, k2, v2, jnp.asarray(mask), group=2, interpret=True))
        np.testing.assert_allclose(pert[0], base[0], atol=1e-6)
        np.testing.assert_allclose(pert[2:], base[2:], atol=1e-6)

    def test_group_auto_selection_and_odd_batch(self):
        from mcan_vqa_tpu.ops.masked_attention import (
            masked_attention_pallas_packed)
        # B=7 prime: group degrades to a divisor (here 1) and still matches
        q, k, v, mask = self._case(7, 2, 14, 14)
        ours = masked_attention_pallas_packed(q, k, v, jnp.asarray(mask),
                                              interpret=True)
        ref = masked_attention_xla(jnp.asarray(q), jnp.asarray(k),
                                   jnp.asarray(v), jnp.asarray(mask),
                                   compute_dtype=jnp.bfloat16)
        np.testing.assert_allclose(np.asarray(ours), np.asarray(ref),
                                   atol=2e-2, rtol=2e-2)

    def test_no_mask(self):
        from mcan_vqa_tpu.ops.masked_attention import (
            masked_attention_pallas_packed)
        q, k, v, _ = self._case(6, 2, 14, 14)
        ours = masked_attention_pallas_packed(q, k, v, None, group=3,
                                              interpret=True)
        ref = masked_attention_xla(jnp.asarray(q), jnp.asarray(k),
                                   jnp.asarray(v), None,
                                   compute_dtype=jnp.bfloat16)
        np.testing.assert_allclose(np.asarray(ours), np.asarray(ref),
                                   atol=2e-2, rtol=2e-2)


class TestWeightStationaryFFN:
    """fused_ffn_ln_weight_stationary: F-outer grid, weight tiles fetched
    once, output block accumulates partials, LN epilogue on the last F step.
    This is the MCAN-large (weights > VMEM) path."""

    def _ref(self, x, w1, b1, w2, b2, sc, bi):
        h = jax.nn.relu(x @ w1 + b1)
        r = x + (h @ w2 + b2)
        d = r.shape[-1]
        mean = r.mean(-1, keepdims=True)
        c = r - mean
        var = (c * c).sum(-1, keepdims=True) / (d - 1)
        return sc * c / (jnp.sqrt(var) + 1e-6) + bi

    def _case(self, B=2, L=16, D=64, F=256, seed=3):
        rng = np.random.default_rng(seed)
        x = rng.normal(size=(B, L, D)).astype(np.float32)
        w1 = rng.normal(size=(D, F)).astype(np.float32) * 0.05
        b1 = rng.normal(size=(F,)).astype(np.float32) * 0.05
        w2 = rng.normal(size=(F, D)).astype(np.float32) * 0.05
        b2 = rng.normal(size=(D,)).astype(np.float32) * 0.05
        sc = rng.normal(size=(D,)).astype(np.float32)
        bi = rng.normal(size=(D,)).astype(np.float32)
        return x, w1, b1, w2, b2, sc, bi

    def test_matches_xla(self):
        from mcan_vqa_tpu.ops.fused_ffn import fused_ffn_ln_weight_stationary
        args = self._case()
        out = fused_ffn_ln_weight_stationary(*args, tile_m=16, tile_f=64,
                                             interpret=True)
        ref = self._ref(*map(jnp.asarray, args))
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   atol=5e-2, rtol=5e-2)

    def test_single_f_tile_degenerates(self):
        from mcan_vqa_tpu.ops.fused_ffn import fused_ffn_ln_weight_stationary
        args = self._case(seed=4)
        out = fused_ffn_ln_weight_stationary(*args, tile_m=32, tile_f=256,
                                             interpret=True)
        ref = self._ref(*map(jnp.asarray, args))
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   atol=5e-2, rtol=5e-2)

    def test_bf16_weights(self):
        """prepare_params hands the serving path bf16 kernels."""
        from mcan_vqa_tpu.ops.fused_ffn import fused_ffn_ln_weight_stationary
        x, w1, b1, w2, b2, sc, bi = self._case(seed=5)
        out = fused_ffn_ln_weight_stationary(
            x, w1.astype(jnp.bfloat16), b1, w2.astype(jnp.bfloat16), b2,
            sc, bi, tile_m=16, tile_f=64, interpret=True)
        ref = self._ref(*map(jnp.asarray, (x, w1, b1, w2, b2, sc, bi)))
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   atol=5e-2, rtol=5e-2)

    def test_large_model_route_uses_kernel(self):
        """fused_ffn_ln auto-routes to the weight-stationary kernel when the
        weights exceed the VMEM budget, and still matches."""
        from mcan_vqa_tpu.ops.fused_ffn import fused_ffn_ln
        rng = np.random.default_rng(6)
        D, F = 1024, 4096   # MCAN-large FFN: 32 MB fp32 weights
        x = rng.normal(size=(1, 16, D)).astype(np.float32)
        w1 = (rng.normal(size=(D, F)) * 0.02).astype(np.float32)
        w2 = (rng.normal(size=(F, D)) * 0.02).astype(np.float32)
        zf, zd = np.zeros(F, np.float32), np.zeros(D, np.float32)
        out = fused_ffn_ln(x, w1, zf, w2, zd, np.ones(D, np.float32), zd,
                           interpret=True)
        ref = self._ref(jnp.asarray(x), jnp.asarray(w1), 0.0,
                        jnp.asarray(w2), 0.0, 1.0, 0.0)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   atol=5e-2, rtol=5e-2)
