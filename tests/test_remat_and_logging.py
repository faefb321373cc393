"""Remat equivalence and metrics-JSONL logging tests."""

import json
import os

import jax
import numpy as np

from mcan_vqa_tpu.configs import Config
from mcan_vqa_tpu.models.net import build_mcan
from mcan_vqa_tpu.train.optim import make_optimizer
from mcan_vqa_tpu.train.step import make_train_step
from mcan_vqa_tpu.train.train_state import TrainState
from mcan_vqa_tpu.utils.logging import RunLogger


def _cfg(**kw):
    base = dict(hidden_size=32, layer=2, multi_head=4, img_feat_size=16,
                flat_out_size=32, flat_mlp_size=16, batch_size=8,
                compute_dtype="float32", use_glove=False)
    base.update(kw)
    return Config(**base).finalize()


class TestRemat:
    def test_gradients_match_non_remat(self):
        rng = np.random.default_rng(0)
        batch = {"img": rng.normal(size=(8, 6, 16)).astype(np.float32),
                 "ques": rng.integers(1, 30, (8, 5)).astype(np.int32),
                 "target": (rng.random((8, 10)) < 0.2).astype(np.float32)}
        m_plain = build_mcan(_cfg(use_remat=False), 30, 10)
        m_remat = build_mcan(_cfg(use_remat=True), 30, 10)
        params = m_plain.init({"params": jax.random.PRNGKey(0)},
                              batch["img"], batch["ques"])["params"]
        import optax
        tx = optax.sgd(1.0)
        s0 = TrainState.create(params, tx)
        s1, m1 = jax.jit(make_train_step(m_plain, tx))(s0, batch)
        s2, m2 = jax.jit(make_train_step(m_remat, tx))(s0, batch)
        assert abs(float(m1["loss"]) - float(m2["loss"])) < 1e-3
        for a, b in zip(jax.tree.leaves(s1.params), jax.tree.leaves(s2.params)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       atol=5e-5)

    def test_remat_params_identical_structure(self):
        """Remat must not change parameter names (checkpoint compat)."""
        m_plain = build_mcan(_cfg(use_remat=False), 30, 10)
        m_remat = build_mcan(_cfg(use_remat=True), 30, 10)
        img = np.zeros((1, 6, 16), np.float32)
        ques = np.zeros((1, 5), np.int32)
        p1 = m_plain.init({"params": jax.random.PRNGKey(0)}, img, ques)
        p2 = m_remat.init({"params": jax.random.PRNGKey(0)}, img, ques)
        assert jax.tree_util.tree_structure(p1) == \
            jax.tree_util.tree_structure(p2)


class TestMetricsJsonl:
    def test_epoch_writes_jsonl(self, tmp_path):
        logger = RunLogger(str(tmp_path), "v1", {"seed": 1}, echo=False)
        logger.epoch(0, {"loss": 1.5, "lr": 1e-4})
        logger.epoch(1, {"loss": 1.2, "lr": 1e-4})
        lines = open(tmp_path / "log_run_v1.jsonl").read().splitlines()
        assert len(lines) == 2
        rec = json.loads(lines[1])
        assert rec["epoch"] == 1 and abs(rec["loss"] - 1.2) < 1e-9


class TestFreshRunSemantics:
    def test_fresh_train_clears_previous_version(self, tmp_path):
        """Non-resume training wipes this version's old checkpoints
        (reference: core/exec.py:96-102)."""
        from mcan_vqa_tpu.data.vqa_dataset import SyntheticVQADataset
        from mcan_vqa_tpu.train.trainer import Trainer
        cfg = _cfg(batch_size=8, max_epoch=1, num_workers=1, verbose=False,
                   eval_every_epoch=False,
                   img_feat_pad_size=8, max_token=6,
                   ckpts_dir=str(tmp_path / "ckpts"),
                   log_path=str(tmp_path / "log"),
                   result_path=str(tmp_path / "res"))
        ds = SyntheticVQADataset(cfg, size=16, token_size=40, answer_size=8,
                                 run_mode="train")
        Trainer(cfg, train_dataset=ds).train()
        stale = tmp_path / "ckpts" / f"ckpt_{cfg.version}" / "epoch99"
        stale.mkdir(parents=True)
        Trainer(cfg, train_dataset=ds).train()
        assert not stale.exists()           # wiped on fresh run
        assert (tmp_path / "ckpts" / f"ckpt_{cfg.version}" / "epoch1").exists()

    def test_fresh_logger_truncates(self, tmp_path):
        l1 = RunLogger(str(tmp_path), "v", {"a": 1}, echo=False)
        l1.write("old line")
        l2 = RunLogger(str(tmp_path), "v", {"a": 1}, echo=False, fresh=True)
        l2.write("new line")
        content = open(tmp_path / "log_run_v.txt").read()
        assert "old line" not in content and "new line" in content


class TestProfilingTrace:
    def test_trace_writes_files(self, tmp_path):
        import jax.numpy as jnp
        from mcan_vqa_tpu.utils.profiling import StepTimer, trace
        with trace(str(tmp_path)):
            (jnp.ones((32, 32)) @ jnp.ones((32, 32))).block_until_ready()
        import glob
        assert glob.glob(str(tmp_path / "**" / "*"), recursive=True)

    def test_trace_noop_without_dir(self):
        from mcan_vqa_tpu.utils.profiling import trace
        with trace(""):
            pass

    def test_step_timer_ema(self):
        from mcan_vqa_tpu.utils.profiling import StepTimer
        t = StepTimer()
        assert t.tick() is None
        assert t.tick() is not None and t.ema > 0


class TestPerParamGradNorms:
    def test_step_emits_per_leaf_norms(self):
        """per_param_norms=True adds a metrics pytree mirroring the params
        with per-leaf L2 grad norms (reference: core/exec.py:199-202)."""
        import optax

        cfg = Config(hidden_size=32, layer=1, multi_head=4, img_feat_size=16,
                     flat_out_size=32, flat_mlp_size=16, batch_size=4,
                     dropout_rate=0.0, compute_dtype="float32",
                     use_glove=False).finalize()
        model = build_mcan(cfg, token_size=30, answer_size=10)
        rng = np.random.default_rng(0)
        batch = {"img": rng.normal(size=(4, 6, 16)).astype(np.float32),
                 "ques": rng.integers(1, 30, (4, 5)).astype(np.int32),
                 "target": (rng.random((4, 10)) < 0.2).astype(np.float32)}
        params = model.init({"params": jax.random.PRNGKey(0)},
                            batch["img"], batch["ques"])["params"]
        tx = optax.sgd(1e-3)
        state = TrainState.create(params, tx, seed=0)
        step = jax.jit(make_train_step(model, tx, per_param_norms=True))
        new_state, metrics = step(state, batch)
        norms = metrics["param_grad_norms"]
        assert jax.tree_util.tree_structure(norms) == \
            jax.tree_util.tree_structure(params)
        # each leaf norm equals the actual per-leaf grad norm (grad = p0-p1
        # under SGD(lr) scaled by lr)
        lr = 1e-3
        for (kp, n), p0, p1 in zip(
                jax.tree_util.tree_flatten_with_path(norms)[0],
                jax.tree.leaves(params),
                jax.tree.leaves(jax.device_get(new_state.params))):
            g = (np.asarray(p0) - np.asarray(p1)) / lr
            np.testing.assert_allclose(float(n), np.linalg.norm(g),
                                       rtol=1e-3, atol=1e-5, err_msg=str(kp))

    def test_trainer_logs_grad_norm_sums(self, tmp_path):
        from mcan_vqa_tpu.data.vqa_dataset import SyntheticVQADataset
        from mcan_vqa_tpu.train.trainer import Trainer

        cfg = Config(hidden_size=32, layer=1, multi_head=4, img_feat_size=16,
                     img_feat_pad_size=8, max_token=6, flat_out_size=32,
                     flat_mlp_size=16, batch_size=8, max_epoch=1,
                     num_workers=0, compute_dtype="float32", use_glove=False,
                     verbose=False, eval_every_epoch=False,
                     grad_norm_log_every=1,
                     ckpts_dir=str(tmp_path / "ckpts"),
                     log_path=str(tmp_path / "log"),
                     result_path=str(tmp_path / "res")).finalize()
        ds = SyntheticVQADataset(cfg, size=16, token_size=40, answer_size=8,
                                 run_mode="train")
        Trainer(cfg, train_dataset=ds).train()
        jsonl = os.path.join(cfg.log_path, f"log_run_{cfg.version}.jsonl")
        records = [json.loads(l) for l in open(jsonl)]
        sums = [r for r in records if "grad_norm_sums" in r]
        assert sums, "no grad_norm_sums records written"
        final = [r for r in sums if r.get("final")]
        assert final and all(v >= 0.0 for v in
                             final[-1]["grad_norm_sums"].values())
        assert any("embedding" in k for k in final[-1]["grad_norm_sums"])
