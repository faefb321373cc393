"""CLI flow tests: visualize-with-resume dispatch (which the reference
advertises but never dispatches, run.py:25 vs core/exec.py:412-420) and
MIMIC warm-start from an exported VQA checkpoint."""

import glob
import os

import numpy as np
import pytest

TINY = ["--batch_size=16", "--max_epoch=1", "--hidden_size=32",
        "--multi_head=4", "--img_feat_size=16", "--img_feat_pad_size=8",
        "--max_token=6", "--flat_out_size=32", "--flat_mlp_size=16",
        "--compute_dtype=float32", "--verbose=False"]


def _paths(tmp_path):
    return [f"--ckpts_dir={tmp_path}/ckpts", f"--log_path={tmp_path}/log",
            f"--result_path={tmp_path}/results"]


class TestVisualizeResume:
    def test_train_then_visualize(self, tmp_path, capsys):
        from mcan_vqa_tpu.cli.run_vqa import main
        rc = main(["--run=train", "--model=small", "--synthetic",
                   "--synthetic_size=32", "--layer=1", *TINY,
                   *_paths(tmp_path)])
        assert rc == 0
        capsys.readouterr()

        rc = main(["--run=visualize", "--model=small", "--synthetic",
                   "--synthetic_size=32", "--layer=1", *TINY,
                   "--resume=True", "--ckpt_version=444", "--ckpt_epoch=1",
                   *_paths(tmp_path)])
        assert rc == 0
        out = capsys.readouterr().out
        assert "visualizations" in out
        pngs = glob.glob(f"{tmp_path}/results/val_imgs/*.png")
        assert len(pngs) >= 1


class TestWarmStartCLI:
    def test_mimic_warm_start_from_vqa_export(self, tmp_path, capsys):
        """Train tiny VQA -> export reference-format pickle -> warm-start the
        MIMIC flow from it through the CLI (vocab/answer sizes differ, so the
        shape-compatible merge must kick in)."""
        import jax

        from mcan_vqa_tpu.cli.run_mimic import main as mimic_main
        from mcan_vqa_tpu.cli.run_vqa import main as vqa_main
        from mcan_vqa_tpu.train.checkpoint import (
            export_torch_checkpoint, restore_checkpoint)

        rc = vqa_main(["--run=train", "--model=small", "--synthetic",
                       "--synthetic_size=32", "--layer=1", *TINY,
                       *_paths(tmp_path)])
        assert rc == 0
        restored = restore_checkpoint(f"{tmp_path}/ckpts", "444", 1)
        pkl = str(tmp_path / "vqa_epoch1.pkl")
        export_torch_checkpoint(restored["params"], pkl)
        capsys.readouterr()

        rc = mimic_main(["--run=train", "--model=small", "--synthetic",
                         "--synthetic_size=32", "--layer=1",
                         f"--warm_start={pkl}", *TINY,
                         f"--ckpts_dir={tmp_path}/m_ckpts",
                         f"--log_path={tmp_path}/m_log",
                         f"--result_path={tmp_path}/m_results"])
        assert rc == 0
        out = capsys.readouterr().out
        assert "val:" in out
        # the merge logged skips for shape-mismatched leaves (vocab/answers)
        log = open(glob.glob(f"{tmp_path}/m_log/log_run_*.txt")[0]).read()
        assert "warm-start skip" in log
        assert "embedding" in log or "proj" in log
