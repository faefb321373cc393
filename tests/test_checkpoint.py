"""Checkpoint tests: orbax save/restore roundtrip, torch-pickle import/export
name mapping, and full-model numerical parity against a torch oracle.

The torch oracle below is an independent PyTorch expression of the MCAN
forward semantics (post-norm SA/SGA stack, std-LayerNorm, AttFlat, sigmoid
head) used ONLY as a numerical reference for the import path.
"""

import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch
import torch.nn as tnn
import torch.nn.functional as tF

from mcan_vqa_tpu.configs import Config
from mcan_vqa_tpu.models.net import build_mcan
from mcan_vqa_tpu.train import checkpoint as ckpt
from mcan_vqa_tpu.train.optim import make_optimizer
from mcan_vqa_tpu.train.train_state import TrainState


# ---------------------------------------------------------------------------
# Torch oracle (test fixture)
# ---------------------------------------------------------------------------

class TLayerNorm(tnn.Module):
    def __init__(self, size, eps=1e-6):
        super().__init__()
        self.eps = eps
        self.a_2 = tnn.Parameter(torch.ones(size))
        self.b_2 = tnn.Parameter(torch.zeros(size))

    def forward(self, x):
        mean = x.mean(-1, keepdim=True)
        std = x.std(-1, keepdim=True)
        return self.a_2 * (x - mean) / (std + self.eps) + self.b_2


class TMLP(tnn.Module):
    """Linear->ReLU [->dropout] -> Linear, torch module names fc.linear/linear."""

    def __init__(self, d_in, d_mid, d_out):
        super().__init__()
        self.fc = tnn.Sequential()
        self.fc.linear = tnn.Linear(d_in, d_mid)
        self.linear = tnn.Linear(d_mid, d_out)

    def forward(self, x):
        return self.linear(torch.relu(self.fc.linear(x)))


class TMHAtt(tnn.Module):
    def __init__(self, d, h):
        super().__init__()
        self.d, self.h = d, h
        self.linear_v = tnn.Linear(d, d)
        self.linear_k = tnn.Linear(d, d)
        self.linear_q = tnn.Linear(d, d)
        self.linear_merge = tnn.Linear(d, d)

    def forward(self, v, k, q, mask):
        B = q.size(0)
        dh = self.d // self.h
        def split(x):
            return x.view(B, -1, self.h, dh).transpose(1, 2)
        v, k, q = split(self.linear_v(v)), split(self.linear_k(k)), split(self.linear_q(q))
        scores = q @ k.transpose(-2, -1) / math.sqrt(dh)
        scores = scores.masked_fill(mask, -1e9)
        att = torch.softmax(scores, dim=-1)
        out = (att @ v).transpose(1, 2).contiguous().view(B, -1, self.d)
        return self.linear_merge(out)


class TSA(tnn.Module):
    def __init__(self, d, h, ff):
        super().__init__()
        self.mhatt = TMHAtt(d, h)
        self.ffn = tnn.Module()
        self.ffn.mlp = TMLP(d, ff, d)
        self.norm1 = TLayerNorm(d)
        self.norm2 = TLayerNorm(d)

    def forward(self, x, m):
        x = self.norm1(x + self.mhatt(x, x, x, m))
        x = self.norm2(x + self.ffn.mlp(x))
        return x


class TSGA(tnn.Module):
    def __init__(self, d, h, ff):
        super().__init__()
        self.mhatt1 = TMHAtt(d, h)
        self.mhatt2 = TMHAtt(d, h)
        self.ffn = tnn.Module()
        self.ffn.mlp = TMLP(d, ff, d)
        self.norm1 = TLayerNorm(d)
        self.norm2 = TLayerNorm(d)
        self.norm3 = TLayerNorm(d)

    def forward(self, x, y, xm, ym):
        x = self.norm1(x + self.mhatt1(x, x, x, xm))
        x = self.norm2(x + self.mhatt2(y, y, x, ym))
        x = self.norm3(x + self.ffn.mlp(x))
        return x


class TAttFlat(tnn.Module):
    def __init__(self, d, d_mlp, glimpses, d_out):
        super().__init__()
        self.g = glimpses
        self.mlp = TMLP(d, d_mlp, glimpses)
        self.linear_merge = tnn.Linear(d * glimpses, d_out)

    def forward(self, x, mask):
        w = self.mlp(x)
        w = w.masked_fill(mask.squeeze(1).squeeze(1).unsqueeze(2), -1e9)
        w = torch.softmax(w, dim=1)
        pooled = torch.cat(
            [(w[:, :, i:i + 1] * x).sum(1) for i in range(self.g)], dim=1)
        return self.linear_merge(pooled)


class TorchMCAN(tnn.Module):
    def __init__(self, token_size, answer_size, d=32, h=4, ff=64, layers=2,
                 emb=300, img_feat=16, d_mlp=16, glimpses=1, d_flat=32):
        super().__init__()
        self.embedding = tnn.Embedding(token_size, emb)
        self.lstm = tnn.LSTM(emb, d, num_layers=1, batch_first=True)
        self.img_feat_linear = tnn.Linear(img_feat, d)
        self.backbone = tnn.Module()
        self.backbone.enc_list = tnn.ModuleList(TSA(d, h, ff) for _ in range(layers))
        self.backbone.dec_list = tnn.ModuleList(TSGA(d, h, ff) for _ in range(layers))
        self.attflat_lang = TAttFlat(d, d_mlp, glimpses, d_flat)
        self.attflat_img = TAttFlat(d, d_mlp, glimpses, d_flat)
        self.proj_norm = TLayerNorm(d_flat)
        self.proj = tnn.Linear(d_flat, answer_size)

    @staticmethod
    def mask(feat):
        return (feat.abs().sum(-1) == 0).unsqueeze(1).unsqueeze(2)

    def forward(self, v, q_ix):
        qm = self.mask(q_ix.unsqueeze(2))
        vm = self.mask(v)
        q = self.embedding(q_ix)
        q, _ = self.lstm(q)
        v = self.img_feat_linear(v)
        for enc in self.backbone.enc_list:
            q = enc(q, qm)
        for dec in self.backbone.dec_list:
            v = dec(v, q, vm, qm)
        fused = self.attflat_lang(q, qm) + self.attflat_img(v, vm)
        return self.proj(self.proj_norm(fused))


def _cfg():
    return Config(hidden_size=32, layer=2, img_feat_size=16, flat_out_size=32,
                  flat_mlp_size=16, multi_head=4, batch_size=4,
                  compute_dtype="float32", use_glove=False).finalize()


def _batch(rng_seed=0, B=3):
    rng = np.random.default_rng(rng_seed)
    img = rng.normal(size=(B, 9, 16)).astype(np.float32)
    img[0, 6:] = 0.0
    ques = rng.integers(1, 30, size=(B, 7)).astype(np.int64)
    ques[1, 4:] = 0
    return img, ques


class TestTorchImportParity:
    def test_full_model_logits_match(self):
        """Random torch weights -> import -> identical logits (atol 2e-4)."""
        cfg = _cfg()
        tmodel = TorchMCAN(30, 10, ff=128)
        timg, tques = _batch()
        with torch.no_grad():
            ref = tmodel(torch.from_numpy(timg),
                         torch.from_numpy(tques)).numpy()

        params = ckpt.import_torch_state_dict(tmodel.state_dict())
        model = build_mcan(cfg, token_size=30, answer_size=10)
        out = model.apply({"params": params}, jnp.asarray(timg),
                          jnp.asarray(tques.astype(np.int32)))
        np.testing.assert_allclose(np.asarray(out["logits"]), ref, atol=2e-4)

    def test_dataparallel_prefix_stripped(self):
        tmodel = TorchMCAN(30, 10, ff=128)
        sd = {f"module.{k}": v for k, v in tmodel.state_dict().items()}
        params = ckpt.import_torch_state_dict(sd)
        assert "embedding" in params and "backbone" in params

    def test_export_import_roundtrip(self):
        cfg = _cfg()
        model = build_mcan(cfg, token_size=30, answer_size=10)
        img, ques = _batch()
        p0 = model.init({"params": jax.random.PRNGKey(0)}, img,
                        ques.astype(np.int32))["params"]
        sd = ckpt.export_torch_state_dict(p0)
        p1 = ckpt.import_torch_state_dict(sd)
        f0, f1 = ckpt.flatten_params(p0), ckpt.flatten_params(p1)
        assert set(f0) == set(f1)
        for k in f0:
            np.testing.assert_allclose(np.asarray(f0[k]), f1[k], atol=1e-6,
                                       err_msg=str(k))

    def test_export_loads_into_torch_oracle(self):
        """Our export produces a state_dict torch can load strictly."""
        cfg = _cfg()
        model = build_mcan(cfg, token_size=30, answer_size=10)
        img, ques = _batch()
        p0 = model.init({"params": jax.random.PRNGKey(1)}, img,
                        ques.astype(np.int32))["params"]
        tmodel = TorchMCAN(30, 10, ff=128)
        missing, unexpected = tmodel.load_state_dict(
            ckpt.export_torch_state_dict(p0), strict=True)
        assert not missing and not unexpected


class TestOrbaxRoundtrip:
    def test_save_restore(self, tmp_path):
        cfg = _cfg()
        model = build_mcan(cfg, token_size=30, answer_size=10)
        img, ques = _batch()
        params = model.init({"params": jax.random.PRNGKey(0)}, img,
                            ques.astype(np.int32))["params"]
        tx = make_optimizer(cfg, data_size=64)
        state = TrainState.create(params, tx, seed=0, step=7)

        path = ckpt.save_checkpoint(state, str(tmp_path), "test", epoch=3)
        assert "ckpt_test" in path and path.endswith("epoch3")
        restored = ckpt.restore_checkpoint(str(tmp_path), "test", 3)
        assert int(restored["step"]) == 7
        for a, b in zip(jax.tree.leaves(params),
                        jax.tree.leaves(restored["params"])):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b))
        assert ckpt.latest_epoch(str(tmp_path), "test") == 3


class TestActScalesSideFile:
    """The end-of-train serving calibration artifact (VERDICT r3 #1):
    static int8 activation scales stored NEXT to the orbax epoch dir
    (orbax validates its directory contents) as
    ``epoch<N>.act_scales.json``; Predictor.from_checkpoint auto-loads
    it so deployments ship the calibrated level-3 engine by default."""

    SCALES = {"enc_0": (0.5, 1.25, 2.0), "dec_0": (0.75, 0.1, 3.5)}

    def test_roundtrip(self, tmp_path):
        d = str(tmp_path / "ckpt_v" / "epoch3")
        import os
        os.makedirs(d)
        path = ckpt.save_act_scales(d, self.SCALES)
        assert path == str(tmp_path / "ckpt_v" / "epoch3.act_scales.json")
        assert ckpt.load_act_scales(d) == self.SCALES

    def test_missing_returns_none(self, tmp_path):
        assert ckpt.load_act_scales(str(tmp_path / "epoch9")) is None

    def test_pruned_with_its_checkpoint(self, tmp_path):
        """prune_checkpoints removes the side file together with its
        epoch directory (no orphaned scale files from stale epochs)."""
        import os
        d = tmp_path / "ckpt_vx"
        for e in (1, 2, 3):
            os.makedirs(d / f"epoch{e}")
            ckpt.save_act_scales(str(d / f"epoch{e}"), self.SCALES)
        removed = ckpt.prune_checkpoints(str(tmp_path), "vx", keep_last=1)
        assert removed == 2
        for e in (1, 2):
            assert not os.path.exists(d / f"epoch{e}.act_scales.json")
        assert ckpt.load_act_scales(str(d / "epoch3")) == self.SCALES


class TestAsyncCheckpointSaver:
    def _state(self, cfg, seed=0, step=7):
        model = build_mcan(cfg, token_size=30, answer_size=10)
        img, ques = _batch()
        params = model.init({"params": jax.random.PRNGKey(seed)}, img,
                            ques.astype(np.int32))["params"]
        tx = make_optimizer(cfg, data_size=64)
        return TrainState.create(params, tx, seed=0, step=step)

    def test_matches_sync_save(self, tmp_path):
        """Async-saved checkpoint restores bitwise-equal to the sync path
        (same payload, same directory scheme)."""
        cfg = _cfg()
        state = self._state(cfg)
        ckpt.save_checkpoint(state, str(tmp_path), "sync", epoch=3)
        saver = ckpt.AsyncCheckpointSaver()
        path = saver.save(state, str(tmp_path), "async", epoch=3)
        saver.close()
        assert path.endswith("epoch3")
        r_sync = ckpt.restore_checkpoint(str(tmp_path), "sync", 3)
        r_async = ckpt.restore_checkpoint(str(tmp_path), "async", 3)
        assert int(r_async["step"]) == int(r_sync["step"]) == 7
        for a, b in zip(jax.tree.leaves(r_sync), jax.tree.leaves(r_async)):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    def test_snapshot_survives_donation_style_mutation(self, tmp_path):
        """save() must snapshot on device BEFORE returning: overwriting
        the live params right after save() must not leak into the
        checkpoint (the donated train step reuses those buffers)."""
        cfg = _cfg()
        state = self._state(cfg)
        want = jax.device_get(state.params)
        saver = ckpt.AsyncCheckpointSaver()
        saver.save(state, str(tmp_path), "snap", epoch=1)
        # aggressively mutate the live tree while the write is in flight
        state = state.replace(params=jax.tree.map(
            lambda x: x * 0 - 1.0, state.params))
        jax.block_until_ready(state.params)
        saver.close()
        got = ckpt.restore_checkpoint(str(tmp_path), "snap", 1)["params"]
        for (ka, a), (kb, b) in zip(
                sorted(ckpt.flatten_params(want).items()),
                sorted(ckpt.flatten_params(got).items())):
            assert ka == kb
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b),
                                          err_msg=str(ka))

    def test_prunes_on_worker(self, tmp_path):
        cfg = _cfg()
        state = self._state(cfg)
        saver = ckpt.AsyncCheckpointSaver()
        for ep in (1, 2, 3):
            saver.save(state, str(tmp_path), "pr", epoch=ep, keep_last=2)
        saver.close()
        import os
        left = sorted(os.listdir(tmp_path / "ckpt_pr"))
        assert left == ["epoch2", "epoch3"]

    def test_write_failure_surfaces_on_wait(self, tmp_path):
        cfg = _cfg()
        state = self._state(cfg)
        target = tmp_path / "blocked"
        target.write_text("a file where the ckpt dir tree must go")
        saver = ckpt.AsyncCheckpointSaver()
        saver.save(state, str(target), "x", epoch=1)
        with pytest.raises(RuntimeError, match="async checkpoint"):
            saver.wait()

    def test_queue_bounded_to_one_pending_snapshot(self, tmp_path):
        """Each queued item holds a full on-device state copy, so the
        queue must be bounded (an unbounded queue accumulates HBM without
        limit whenever writes are slower than epochs — the exact regime
        async saving targets). maxsize=1 == at most one writing + one
        queued; back-to-back saves must still all land."""
        cfg = _cfg()
        state = self._state(cfg)
        saver = ckpt.AsyncCheckpointSaver()
        assert saver._q.maxsize == 1
        for epoch in (1, 2, 3):
            saver.save(state, str(tmp_path), "bounded", epoch=epoch)
        saver.close()
        for epoch in (1, 2, 3):
            r = ckpt.restore_checkpoint(str(tmp_path), "bounded", epoch)
            assert int(r["step"]) == int(state.step)

    def test_flush_on_training_exception(self, tmp_path, monkeypatch):
        """An exception AFTER a save is enqueued must still flush the
        pending write (otherwise the daemon worker dies at interpreter
        exit, possibly mid-orbax-write) and restore the signal handlers."""
        import signal

        from mcan_vqa_tpu.data.vqa_dataset import SyntheticVQADataset
        from mcan_vqa_tpu.train.trainer import Trainer
        cfg = Config(hidden_size=32, layer=1, multi_head=4, img_feat_size=16,
                     img_feat_pad_size=8, max_token=6, flat_out_size=32,
                     flat_mlp_size=16, batch_size=8, max_epoch=1,
                     num_workers=1, compute_dtype="float32", use_glove=False,
                     verbose=False, eval_every_epoch=True, ckpt_async=True,
                     ckpts_dir=str(tmp_path / "ckpts"),
                     log_path=str(tmp_path / "log"),
                     result_path=str(tmp_path / "res")).finalize()
        ds = SyntheticVQADataset(cfg, size=16, token_size=40, answer_size=8,
                                 run_mode="train")
        tr = Trainer(cfg, train_dataset=ds, eval_datasets={"val": ds})
        monkeypatch.setattr(
            tr, "evaluate",
            lambda *a, **k: (_ for _ in ()).throw(RuntimeError("eval boom")))
        before = signal.getsignal(signal.SIGTERM)
        with pytest.raises(RuntimeError, match="eval boom"):
            tr.train()
        assert signal.getsignal(signal.SIGTERM) is before
        # the epoch-1 save enqueued before the eval raised is ON DISK
        restored = ckpt.restore_checkpoint(str(tmp_path / "ckpts"),
                                           cfg.version, 1)
        assert int(restored["step"]) == 2    # 16 examples / batch 8

    def test_trainer_end_to_end(self, tmp_path):
        """Trainer with ckpt_async=True: every epoch checkpoint is on disk
        after train() returns, and the latest restores."""
        from mcan_vqa_tpu.data.vqa_dataset import SyntheticVQADataset
        from mcan_vqa_tpu.train.trainer import Trainer
        cfg = Config(hidden_size=32, layer=1, multi_head=4, img_feat_size=16,
                     img_feat_pad_size=8, max_token=6, flat_out_size=32,
                     flat_mlp_size=16, batch_size=8, max_epoch=2,
                     num_workers=1, compute_dtype="float32", use_glove=False,
                     verbose=False, eval_every_epoch=False, ckpt_async=True,
                     ckpts_dir=str(tmp_path / "ckpts"),
                     log_path=str(tmp_path / "log"),
                     result_path=str(tmp_path / "res")).finalize()
        ds = SyntheticVQADataset(cfg, size=32, token_size=40, answer_size=8,
                                 run_mode="train")
        state = Trainer(cfg, train_dataset=ds).train()
        root = tmp_path / "ckpts" / f"ckpt_{cfg.version}"
        # epoch dirs plus the end-of-train calibration sidecar
        # (epoch<last>.act_scales.json — Trainer._save_act_scales)
        names = sorted(p.name for p in root.iterdir())
        assert [n for n in names if not n.endswith(".act_scales.json")] \
            == ["epoch1", "epoch2"]
        restored = ckpt.restore_checkpoint(str(tmp_path / "ckpts"),
                                           cfg.version, 2)
        assert int(restored["step"]) == int(state.step)


class TestTrainerTorchResume:
    def test_moments_restored_through_trainer(self, tmp_path):
        """Trainer._resume from a reference-format pickle WITH optimizer
        state transplants the AdamW moments and actual step count
        (trajectory-faithful resume; reference: core/exec.py:84-94)."""
        from mcan_vqa_tpu.data.vqa_dataset import SyntheticVQADataset
        from mcan_vqa_tpu.train.step import make_train_step
        from mcan_vqa_tpu.train.trainer import Trainer

        base = dict(hidden_size=32, layer=1, multi_head=4, img_feat_size=16,
                    img_feat_pad_size=8, max_token=6, flat_out_size=32,
                    flat_mlp_size=16, batch_size=8, compute_dtype="float32",
                    use_glove=False, verbose=False,
                    ckpts_dir=str(tmp_path / "ckpts"),
                    log_path=str(tmp_path / "log"),
                    result_path=str(tmp_path / "res"))
        cfg = Config(**base).finalize()
        ds = SyntheticVQADataset(cfg, size=16, token_size=40, answer_size=10,
                                 run_mode="train")
        tr = Trainer(cfg, train_dataset=ds)
        state = tr.ensure_state(resume=False)
        step = jax.jit(make_train_step(tr.model, tr.tx))
        rng = np.random.default_rng(0)
        batch = {"img": rng.normal(size=(8, 8, 16)).astype(np.float32),
                 "ques": rng.integers(1, 40, (8, 6)).astype(np.int32),
                 "target": (rng.random((8, 10)) < 0.2).astype(np.float32)}
        for _ in range(2):
            state, _ = step(state, batch)

        pkl = str(tmp_path / "epoch2.pkl")
        ckpt.export_torch_checkpoint(
            jax.device_get(state.params), pkl, lr_base=cfg.lr_base,
            opt_state=jax.device_get(state.opt_state), num_layers=cfg.layer)

        cfg2 = Config(**base, resume=True, ckpt_path=pkl,
                      ckpt_epoch=1).finalize()
        tr2 = Trainer(cfg2, train_dataset=ds)
        state2 = tr2.ensure_state()
        # actual optimizer step count wins over the epoch arithmetic
        assert int(state2.step) == 2
        mu0 = {}

        def grab(node):
            mu0["mu"] = node.mu
            return node

        ckpt._map_opt_state(jax.device_get(state.opt_state), grab,
                            lambda n: n)
        got = {}

        def grab2(node):
            got["mu"] = node.mu
            got["count"] = int(node.count)
            return node

        ckpt._map_opt_state(jax.device_get(state2.opt_state), grab2,
                            lambda n: n)
        assert got["count"] == 2
        for a, b in zip(jax.tree.leaves(mu0["mu"]),
                        jax.tree.leaves(got["mu"])):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       atol=1e-7)

    def test_layout_mismatch_raises(self, tmp_path):
        """Torch moments whose mapped paths have no home in the optax
        template (e.g. a fused_qkv=True model fed a standard-layout
        optimizer state) must RAISE, not silently resume with zero
        moments while the trainer logs 'restored AdamW moments'."""
        import pytest

        from mcan_vqa_tpu.models.net import build_mcan

        cfg = Config(hidden_size=32, layer=1, multi_head=4,
                     img_feat_size=16, img_feat_pad_size=8, max_token=6,
                     flat_out_size=32, flat_mlp_size=16, batch_size=8,
                     compute_dtype="float32", use_glove=False).finalize()
        model = build_mcan(cfg, token_size=40, answer_size=10)
        img = np.zeros((2, 8, 16), np.float32)
        ques = np.ones((2, 6), np.int32)
        params = model.init({"params": jax.random.PRNGKey(0)},
                            img, ques)["params"]
        tx = make_optimizer(cfg, data_size=16)
        state = TrainState.create(params, tx, seed=0)
        pkl = str(tmp_path / "std.pkl")
        ckpt.export_torch_checkpoint(
            jax.device_get(params), pkl, lr_base=cfg.lr_base,
            opt_state=jax.device_get(state.opt_state),
            num_layers=cfg.layer)
        _, meta = ckpt.import_torch_checkpoint(pkl)
        # a template whose layout can't home the attention moments:
        # fuse the qkv projections (the fused-train layout)
        fused = ckpt.fuse_qkv_params(jax.device_get(params), cfg.layer)
        fused_state = TrainState.create(fused, tx, seed=0)
        with pytest.raises(ValueError, match="no home"):
            ckpt.import_torch_opt_state(
                meta["optimizer"], meta["param_keys"],
                jax.device_get(fused_state.opt_state))
