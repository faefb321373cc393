"""Classifier-flow tests (ExecClassify equivalent): ClassifierNet training,
SmoothL1 penalty, in-epoch eval, CLI smoke."""

import jax
import jax.numpy as jnp
import numpy as np
import torch

from mcan_vqa_tpu.configs import Config
from mcan_vqa_tpu.data.mimic import SyntheticMIMICDataset
from mcan_vqa_tpu.train.step import smooth_l1_penalty


def _tiny_cfg(tmp_path, **kw):
    base = dict(hidden_size=32, layer=1, multi_head=4, img_feat_size=16,
                img_feat_pad_size=8, max_token=6, flat_out_size=32,
                flat_mlp_size=16, batch_size=16, lr_base=3e-3, max_epoch=1,
                num_workers=2, compute_dtype="float32", use_glove=False,
                verbose=False,
                ckpts_dir=str(tmp_path / "ckpts"),
                log_path=str(tmp_path / "log"),
                result_path=str(tmp_path / "results"))
    base.update(kw)
    return Config(**base).finalize()


class TestSmoothL1Penalty:
    def test_matches_torch(self):
        params = {"a": jnp.asarray(np.random.default_rng(0).normal(
            size=(5, 7)).astype(np.float32) * 2)}
        ours = float(smooth_l1_penalty(params))
        crit = torch.nn.SmoothL1Loss()
        t = torch.from_numpy(np.asarray(params["a"]))
        ref = float(crit(t, torch.zeros_like(t)))
        assert abs(ours - ref) / ref < 1e-6


class TestClassifierTrainer:
    def test_train_and_eval(self, tmp_path):
        from mcan_vqa_tpu.train.trainer import Trainer
        cfg = _tiny_cfg(tmp_path, reg_factor=0.001, eval_interval=2)
        train_ds = SyntheticMIMICDataset(cfg, size=64, answer_size=14,
                                         run_mode="train")
        val_ds = SyntheticMIMICDataset(cfg, size=32, answer_size=14,
                                       run_mode="val", seed=1)
        trainer = Trainer(cfg, train_dataset=train_ds,
                          eval_datasets={"val": val_ds}, task="classify")
        trainer.train()
        res = trainer.evaluate(val_ds)
        assert "roc_micro" in res
        # in-epoch eval lines logged every eval_interval steps
        log = open(f"{cfg.log_path}/log_run_{cfg.version}.txt").read()
        assert "[step 2] val:" in log

    def test_fused_train_engine(self, tmp_path):
        """train_engine="fused" routes classifier training through the
        custom-VJP fused SA blocks (interpret on CPU) and trains."""
        from mcan_vqa_tpu.train.trainer import Trainer
        cfg = _tiny_cfg(tmp_path, train_engine="fused", max_epoch=1,
                        batch_size=8)
        ds = SyntheticMIMICDataset(cfg, size=16, answer_size=14,
                                   run_mode="train")
        trainer = Trainer(cfg, train_dataset=ds, task="classify")
        assert trainer._use_fused_train()
        state = trainer.train()
        assert int(state.step) == 2
        log = open(f"{cfg.log_path}/log_run_{cfg.version}.txt").read()
        assert "train engine: fused SA blocks" in log
        assert "loss=nan" not in log


class TestClassifierCLI:
    def test_synthetic_train(self, tmp_path, capsys):
        from mcan_vqa_tpu.cli.run_classify import main
        rc = main([
            "--run=train", "--model=small", "--synthetic",
            "--synthetic_size=48", "--batch_size=16", "--max_epoch=1",
            "--layer=1", "--hidden_size=32", "--multi_head=4",
            "--img_feat_size=16", "--img_feat_pad_size=8",
            "--flat_out_size=32", "--flat_mlp_size=16", "--eval_interval=0",
            "--compute_dtype=float32", "--verbose=False",
            f"--ckpts_dir={tmp_path}/ckpts", f"--log_path={tmp_path}/log",
            f"--result_path={tmp_path}/results",
        ])
        assert rc == 0
        assert "val:" in capsys.readouterr().out
