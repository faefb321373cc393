"""Golden parity tests: JAX modules vs PyTorch (CPU) implementations of the
same math. PyTorch here is the *oracle* for the reference's semantics (the
reference is pure torch); weights are copied from the flax params into
freshly-constructed torch modules, then outputs are compared.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch
import torch.nn as tnn

from mcan_vqa_tpu.models.attention import MHAtt
from mcan_vqa_tpu.models.layers import Dense, MLPBlock, StdLayerNorm, make_mask
from mcan_vqa_tpu.models.lstm import LSTMEncoder
from mcan_vqa_tpu.models.net import AttFlat

F32 = dict(dtype=jnp.float32)  # fp32 compute for exact-ish parity checks


def t(x):
    return torch.from_numpy(np.asarray(x))


class TestDense:
    def test_matches_torch_linear(self):
        x = np.random.default_rng(0).normal(size=(4, 7, 16)).astype(np.float32)
        m = Dense(24, dtype=jnp.float32)
        params = m.init(jax.random.PRNGKey(0), x)
        out = m.apply(params, x)

        lin = tnn.Linear(16, 24)
        with torch.no_grad():
            lin.weight.copy_(t(params["params"]["kernel"]).T)
            lin.bias.copy_(t(params["params"]["bias"]))
            ref = lin(t(x)).numpy()
        np.testing.assert_allclose(np.asarray(out), ref, atol=1e-5)

    def test_init_bound_is_torch_default(self):
        # U(-1/sqrt(fan_in), 1/sqrt(fan_in))
        m = Dense(128, dtype=jnp.float32)
        params = m.init(jax.random.PRNGKey(1), jnp.zeros((1, 64)))
        k = np.asarray(params["params"]["kernel"])
        bound = 1 / np.sqrt(64)
        assert np.abs(k).max() <= bound
        assert np.abs(k).max() > 0.9 * bound  # actually fills the range


class TestStdLayerNorm:
    def test_matches_reference_formula(self):
        """(x - mean) / (torch_std + eps) * a + b with Bessel-corrected std
        (reference: core/model/net_utils.py:48-60)."""
        x = np.random.default_rng(1).normal(size=(3, 5, 32)).astype(np.float32)
        m = StdLayerNorm()
        params = m.init(jax.random.PRNGKey(0), x)
        # randomize affine params
        params = jax.tree.map(
            lambda p: jax.random.normal(jax.random.PRNGKey(2), p.shape), params)
        out = m.apply(params, x)

        xt = t(x)
        mean = xt.mean(-1, keepdim=True)
        std = xt.std(-1, keepdim=True)  # Bessel-corrected
        a = t(np.asarray(params["params"]["scale"]))
        b = t(np.asarray(params["params"]["bias"]))
        ref = (a * (xt - mean) / (std + 1e-6) + b).numpy()
        np.testing.assert_allclose(np.asarray(out), ref, atol=1e-5)

    def test_differs_from_variance_form(self):
        """Guard: the reference form is NOT standard LayerNorm."""
        x = np.random.default_rng(2).normal(size=(2, 8)).astype(np.float32) * 3
        m = StdLayerNorm()
        params = m.init(jax.random.PRNGKey(0), x)
        out = np.asarray(m.apply(params, x))
        standard = tnn.functional.layer_norm(t(x), (8,), eps=1e-6).numpy()
        assert np.abs(out - standard).max() > 1e-4


class TestLSTM:
    def test_matches_torch_lstm(self):
        B, L, E, H = 3, 14, 20, 32
        x = np.random.default_rng(3).normal(size=(B, L, E)).astype(np.float32)
        m = LSTMEncoder(H, dtype=jnp.float32)
        params = m.init(jax.random.PRNGKey(0), x)
        out = np.asarray(m.apply(params, x))

        lstm = tnn.LSTM(E, H, num_layers=1, batch_first=True)
        p = params["params"]
        with torch.no_grad():
            lstm.weight_ih_l0.copy_(t(p["w_ih"]).T)
            lstm.weight_hh_l0.copy_(t(p["w_hh"]).T)
            lstm.bias_ih_l0.copy_(t(p["b_ih"]))
            lstm.bias_hh_l0.copy_(t(p["b_hh"]))
            ref, _ = lstm(t(x))
        np.testing.assert_allclose(out, ref.numpy(), atol=2e-5)


class TestMaskedAttention:
    def test_matches_torch_math(self):
        """QK^T/sqrt(d) -> masked_fill(-1e9) -> softmax -> @V
        (reference: core/model/mca.py:65-78)."""
        B, Lq, Lk, D, Hn = 2, 6, 9, 32, 4
        rng = np.random.default_rng(4)
        v = rng.normal(size=(B, Lk, D)).astype(np.float32)
        k = rng.normal(size=(B, Lk, D)).astype(np.float32)
        q = rng.normal(size=(B, Lq, D)).astype(np.float32)
        mask = np.zeros((B, 1, 1, Lk), bool)
        mask[0, ..., 6:] = True
        mask[1, ..., 3:] = True

        m = MHAtt(hidden_size=D, num_heads=Hn, dropout_rate=0.0,
                  dtype=jnp.float32)
        params = m.init(jax.random.PRNGKey(0), v, k, q, jnp.asarray(mask))
        out = np.asarray(m.apply(params, v, k, q, jnp.asarray(mask)))

        p = params["params"]
        def lin(name, x):
            return x @ t(np.asarray(p[name]["kernel"])) + t(np.asarray(p[name]["bias"]))
        dh = D // Hn
        vt = lin("linear_v", t(v)).view(B, Lk, Hn, dh).transpose(1, 2)
        kt = lin("linear_k", t(k)).view(B, Lk, Hn, dh).transpose(1, 2)
        qt = lin("linear_q", t(q)).view(B, Lq, Hn, dh).transpose(1, 2)
        scores = qt @ kt.transpose(-2, -1) / np.sqrt(dh)
        scores = scores.masked_fill(t(mask), -1e9)
        att = torch.softmax(scores, dim=-1)
        merged = (att @ vt).transpose(1, 2).contiguous().view(B, Lq, D)
        ref = lin("linear_merge", merged).numpy()
        np.testing.assert_allclose(out, ref, atol=1e-4)

    def test_fully_masked_rows_uniform(self):
        """All-pad key rows must not produce NaNs."""
        B, L, D = 1, 4, 16
        x = np.random.default_rng(5).normal(size=(B, L, D)).astype(np.float32)
        mask = np.ones((B, 1, 1, L), bool)  # everything masked
        m = MHAtt(hidden_size=D, num_heads=2, dropout_rate=0.0,
                  dtype=jnp.float32)
        params = m.init(jax.random.PRNGKey(0), x, x, x, jnp.asarray(mask))
        out = np.asarray(m.apply(params, x, x, x, jnp.asarray(mask)))
        assert np.isfinite(out).all()


class TestAttFlat:
    def test_matches_torch_math(self):
        """MLP -> mask fill -> softmax over L -> glimpse sums -> merge
        (reference: core/model/net.py:38-55)."""
        B, L, D, G, FM, FO = 2, 7, 16, 2, 12, 20
        rng = np.random.default_rng(6)
        x = rng.normal(size=(B, L, D)).astype(np.float32)
        mask = np.zeros((B, 1, 1, L), bool)
        mask[0, ..., 5:] = True

        m = AttFlat(hidden_size=D, flat_mlp_size=FM, flat_glimpses=G,
                    flat_out_size=FO, dropout_rate=0.0, dtype=jnp.float32)
        params = m.init(jax.random.PRNGKey(0), x, jnp.asarray(mask))
        out, att_w = m.apply(params, x, jnp.asarray(mask))

        p = params["params"]
        def lin(pp, x):
            return x @ t(np.asarray(pp["kernel"])) + t(np.asarray(pp["bias"]))
        h = torch.relu(lin(p["mlp"]["FCLayer_0"]["Dense_0"], t(x)))
        logits = lin(p["mlp"]["Dense_0"], h)
        logits = logits.masked_fill(t(mask)[:, 0, 0, :, None], -1e9)
        att = torch.softmax(logits, dim=1)
        pooled = torch.cat(
            [(att[:, :, i:i + 1] * t(x)).sum(1) for i in range(G)], dim=1)
        ref = lin(p["linear_merge"], pooled).numpy()
        np.testing.assert_allclose(np.asarray(out), ref, atol=1e-4)
        np.testing.assert_allclose(np.asarray(att_w), att.numpy(), atol=1e-5)
        # pad rows get ~zero attention
        assert np.asarray(att_w)[0, 5:].max() < 1e-6


class TestMakeMask:
    def test_zero_rows_masked(self):
        x = np.ones((2, 5, 3), np.float32)
        x[0, 3:] = 0
        m = np.asarray(make_mask(jnp.asarray(x)))
        assert m.shape == (2, 1, 1, 5)
        assert m[0, 0, 0].tolist() == [False, False, False, True, True]
        assert not m[1].any()

    def test_token_ids(self):
        ids = jnp.asarray(np.array([[3, 5, 0, 0]], np.int32))
        m = np.asarray(make_mask(ids[..., None]))
        assert m[0, 0, 0].tolist() == [False, False, True, True]


class TestMultiGlimpse:
    def test_two_glimpse_attflat_model(self):
        """flat_glimpses=2 (the knob the reference exposes but never uses
        beyond 1) works through the full model."""
        from mcan_vqa_tpu.configs import Config
        from mcan_vqa_tpu.models.net import build_mcan
        cfg = Config(hidden_size=32, layer=1, multi_head=4, img_feat_size=16,
                     img_feat_pad_size=8, max_token=6, flat_out_size=32,
                     flat_mlp_size=16, flat_glimpses=2,
                     compute_dtype="float32", use_glove=False).finalize()
        model = build_mcan(cfg, 30, 10)
        rng = np.random.default_rng(0)
        img = rng.normal(size=(2, 8, 16)).astype(np.float32)
        ques = rng.integers(1, 30, (2, 6)).astype(np.int32)
        params = model.init({"params": jax.random.PRNGKey(0)}, img, ques)
        out = model.apply(params, img, ques)
        assert out["logits"].shape == (2, 10)
        assert out["q_w"].shape == (2, 6, 2)   # two glimpses
        np.testing.assert_allclose(np.asarray(out["q_w"]).sum(axis=1), 1.0,
                                   atol=1e-5)
