"""Preemption safety: SIGTERM mid-training checkpoints and exits cleanly."""

import os
import signal
import threading

from mcan_vqa_tpu.configs import Config
from mcan_vqa_tpu.data.vqa_dataset import SyntheticVQADataset


class TestPreemption:
    def test_sigterm_checkpoints_and_stops(self, tmp_path):
        from mcan_vqa_tpu.train.trainer import Trainer
        cfg = Config(hidden_size=32, layer=1, multi_head=4, img_feat_size=16,
                     img_feat_pad_size=8, max_token=6, flat_out_size=32,
                     flat_mlp_size=16, batch_size=8, max_epoch=50,
                     num_workers=1, compute_dtype="float32", use_glove=False,
                     verbose=False, eval_every_epoch=False,
                     ckpts_dir=str(tmp_path / "ckpts"),
                     log_path=str(tmp_path / "log"),
                     result_path=str(tmp_path / "results")).finalize()
        ds = SyntheticVQADataset(cfg, size=512, token_size=40, answer_size=8,
                                 run_mode="train")
        trainer = Trainer(cfg, train_dataset=ds)

        # fire SIGTERM shortly after training starts (50 epochs would take
        # minutes; preemption should end it within the current epoch)
        killer = threading.Timer(8.0, lambda: os.kill(os.getpid(),
                                                      signal.SIGTERM))
        killer.start()
        try:
            state = trainer.train()
        finally:
            killer.cancel()

        # a checkpoint exists and the run ended long before 50 epochs
        ckpt_root = tmp_path / "ckpts" / f"ckpt_{cfg.version}"
        epochs = sorted(os.listdir(ckpt_root))
        assert epochs, "no checkpoint written on preemption"
        assert len(epochs) < 50
        log = open(tmp_path / "log" / f"log_run_{cfg.version}.txt").read()
        assert "checkpoint-and-exit requested" in log
        assert int(state.step) > 0

    def test_sigterm_checkpoints_classifier_task(self, tmp_path):
        """Preemption safety holds for the classifier flow too."""
        from mcan_vqa_tpu.data.mimic import SyntheticMIMICDataset
        from mcan_vqa_tpu.train.trainer import Trainer
        cfg = Config(hidden_size=32, layer=1, multi_head=4, img_feat_size=16,
                     img_feat_pad_size=8, max_token=6, flat_out_size=32,
                     flat_mlp_size=16, batch_size=8, max_epoch=50,
                     num_workers=1, compute_dtype="float32", use_glove=False,
                     verbose=False, eval_every_epoch=False, eval_interval=0,
                     ckpts_dir=str(tmp_path / "ckpts"),
                     log_path=str(tmp_path / "log"),
                     result_path=str(tmp_path / "results")).finalize()
        ds = SyntheticMIMICDataset(cfg, size=512, answer_size=14,
                                   run_mode="train")
        trainer = Trainer(cfg, train_dataset=ds, task="classify")
        killer = threading.Timer(8.0, lambda: os.kill(os.getpid(),
                                                      signal.SIGTERM))
        killer.start()
        try:
            state = trainer.train()
        finally:
            killer.cancel()
        ckpt_root = tmp_path / "ckpts" / f"ckpt_{cfg.version}"
        epochs = sorted(os.listdir(ckpt_root))
        assert epochs and len(epochs) < 50
        log = open(tmp_path / "log" / f"log_run_{cfg.version}.txt").read()
        assert "checkpoint-and-exit requested" in log
        assert int(state.step) > 0
