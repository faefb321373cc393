"""Fused-QKV model variant: one [D,3D] projection per self-attention block.

Parity with the standard layout through the fuse/unfuse transforms, training
step, and sharding."""

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import PartitionSpec as P

from mcan_vqa_tpu.configs import Config
from mcan_vqa_tpu.models.net import build_mcan
from mcan_vqa_tpu.train.checkpoint import (
    flatten_params, fuse_qkv_params, unfuse_qkv_params)


def _cfg(**kw):
    base = dict(hidden_size=32, layer=2, multi_head=4, img_feat_size=16,
                img_feat_pad_size=9, max_token=6, flat_out_size=32,
                flat_mlp_size=16, batch_size=8, compute_dtype="float32",
                use_glove=False)
    base.update(kw)
    return Config(**base).finalize()


def _batch(B=4):
    rng = np.random.default_rng(0)
    img = rng.normal(size=(B, 9, 16)).astype(np.float32)
    img[0, 6:] = 0
    ques = rng.integers(1, 40, (B, 6)).astype(np.int32)
    ques[1, 3:] = 0
    return img, ques


class TestFusedQKVModel:
    def test_logits_match_standard_layout(self):
        cfg = _cfg()
        m_std = build_mcan(_cfg(fused_qkv=False), 40, 10)
        m_fused = build_mcan(_cfg(fused_qkv=True), 40, 10)
        img, ques = _batch()
        p_std = m_std.init({"params": jax.random.PRNGKey(0)}, img,
                           ques)["params"]
        p_fused = fuse_qkv_params(p_std, cfg.layer)
        ref = m_std.apply({"params": p_std}, img, ques)["logits"]
        out = m_fused.apply({"params": p_fused}, img, ques)["logits"]
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   atol=1e-4)

    def test_fuse_unfuse_roundtrip(self):
        cfg = _cfg()
        m_std = build_mcan(cfg, 40, 10)
        img, ques = _batch()
        p0 = m_std.init({"params": jax.random.PRNGKey(1)}, img,
                        ques)["params"]
        p1 = unfuse_qkv_params(fuse_qkv_params(p0, cfg.layer), cfg.layer)
        f0, f1 = flatten_params(p0), flatten_params(p1)
        assert set(f0) == set(f1)
        for k in f0:
            np.testing.assert_array_equal(np.asarray(f0[k]), f1[k],
                                          err_msg=str(k))

    def test_fused_init_shapes(self):
        cfg = _cfg(fused_qkv=True)
        m = build_mcan(cfg, 40, 10)
        img, ques = _batch()
        p = m.init({"params": jax.random.PRNGKey(0)}, img, ques)["params"]
        enc = p["backbone"]["enc_0"]["mhatt"]
        assert enc["linear_qkv"]["kernel"].shape == (32, 96)
        assert "linear_q" not in enc
        dec2 = p["backbone"]["dec_0"]["mhatt2"]
        assert dec2["linear_kv"]["kernel"].shape == (32, 64)
        assert dec2["linear_q"]["kernel"].shape == (32, 32)

    def test_trains(self):
        import optax
        from mcan_vqa_tpu.train.step import make_train_step
        from mcan_vqa_tpu.train.train_state import TrainState
        cfg = _cfg(fused_qkv=True)
        m = build_mcan(cfg, 40, 10)
        img, ques = _batch(8)
        rng = np.random.default_rng(1)
        batch = {"img": img[:8] if img.shape[0] >= 8 else
                 np.repeat(img, 2, 0), "ques": ques if ques.shape[0] >= 8
                 else np.repeat(ques, 2, 0),
                 "target": (rng.random((8, 10)) < 0.2).astype(np.float32)}
        p = m.init({"params": jax.random.PRNGKey(0)}, batch["img"],
                   batch["ques"])["params"]
        tx = optax.adamw(1e-3)
        state = TrainState.create(p, tx)
        step = jax.jit(make_train_step(m, tx))
        losses = []
        for _ in range(6):
            state, met = step(state, batch)
            losses.append(float(met["loss"]))
        assert losses[-1] < losses[0]

    def test_tp_sharding_rule(self):
        from mcan_vqa_tpu.parallel import sharding as shd
        from mcan_vqa_tpu.parallel.mesh import make_mesh
        cfg = _cfg(fused_qkv=True)
        m = build_mcan(cfg, 40, 10)
        img, ques = _batch()
        p = m.init({"params": jax.random.PRNGKey(0)}, img, ques)["params"]
        mesh = make_mesh({"data": 1, "model": 4})
        sh = shd.make_param_shardings(mesh, p)
        enc = sh["backbone"]["enc_0"]["mhatt"]
        # fused [D,3D]/[D,2D] kernels REPLICATE under TP: column-sharding
        # them would split the concatenated q|k|v blocks across shard
        # boundaries (tp=2 puts all of q plus half of k on shard 0) and
        # MHAtt's jnp.split would force a cross-shard reshuffle every
        # layer. TP deployments use the standard per-projection layout.
        assert enc["linear_qkv"]["kernel"].spec == P()
        assert enc["linear_qkv"]["bias"].spec == P()
        dec2 = sh["backbone"]["dec_0"]["mhatt2"]
        assert dec2["linear_kv"]["kernel"].spec == P()
        # the separate merge/q projections keep the Megatron pattern
        assert dec2["linear_merge"]["kernel"].spec == P("model", None)
        assert dec2["linear_q"]["kernel"].spec == P(None, "model")

    def test_fused_engines_excluded(self):
        """fused_qkv builds a linear_qkv param tree the fused Pallas
        engines' prepare_*_params cannot split — the Trainer must route
        such configs to model.apply (ADVICE r2 medium)."""
        from mcan_vqa_tpu.data.vqa_dataset import SyntheticVQADataset
        from mcan_vqa_tpu.train.trainer import Trainer
        cfg = _cfg(fused_qkv=True, train_engine="fused",
                   eval_engine="fused")
        ds = SyntheticVQADataset(cfg, size=16, token_size=40, answer_size=10,
                                 run_mode="train")
        tr = Trainer(cfg, train_dataset=ds)
        assert not tr._use_fused_train()
        assert not tr._use_fused_eval()
