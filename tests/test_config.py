"""Config tests: three-tier precedence (CLI > YAML > defaults), derived
values, and the sweep runner."""

import json
import os

import pytest

from mcan_vqa_tpu.configs import Config

_YAML_DIR = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "mcan_vqa_tpu", "configs")


class TestPrecedence:
    def test_yaml_overrides_defaults(self):
        cfg = Config.from_yaml(os.path.join(_YAML_DIR, "small.yml"))
        assert cfg.flat_out_size == 512     # YAML beats default 1024
        assert cfg.layer == 6
        assert cfg.max_epoch == 13          # default survives

    def test_cli_overrides_yaml(self):
        cfg = Config.from_yaml(os.path.join(_YAML_DIR, "small.yml"),
                               overrides={"layer": 2, "lr_base": 3e-3})
        assert cfg.layer == 2 and cfg.lr_base == 3e-3
        assert cfg.hidden_size == 512       # untouched YAML value survives

    def test_large_yaml(self):
        cfg = Config.from_yaml(os.path.join(_YAML_DIR, "large.yml"))
        assert cfg.hidden_size == 1024 and cfg.grad_accu_steps == 2
        assert cfg.ff_size == 4096 and cfg.hidden_size_head == 128
        assert cfg.sub_batch_size == 32

    def test_derived_values(self):
        cfg = Config(hidden_size=256, multi_head=8, batch_size=32,
                     grad_accu_steps=4).finalize()
        assert cfg.ff_size == 1024
        assert cfg.hidden_size_head == 32
        assert cfg.sub_batch_size == 8
        assert cfg.eval_batch_size == 8

    def test_version_defaults_to_seed(self):
        assert Config(seed=777).finalize().version == "777"

    def test_run_mode_validation(self):
        with pytest.raises(AssertionError):
            Config(run_mode="bogus").finalize()


class TestSweep:
    def test_grid_runs_all_points(self, tmp_path, capsys):
        from mcan_vqa_tpu.cli.sweep import main
        out = str(tmp_path / "summary.json")
        rc = main([
            "--task=vqa", "--layers", "1", "--lrs", "0.001", "0.003",
            f"--out={out}", "--",
            "--run=train", "--model=small", "--synthetic",
            "--synthetic_size=32", "--batch_size=16", "--max_epoch=1",
            "--hidden_size=32", "--multi_head=4", "--img_feat_size=16",
            "--img_feat_pad_size=8", "--max_token=6", "--flat_out_size=32",
            "--flat_mlp_size=16", "--compute_dtype=float32",
            "--verbose=False",
            f"--ckpts_dir={tmp_path}/ckpts", f"--log_path={tmp_path}/log",
            f"--result_path={tmp_path}/results",
        ])
        assert rc == 0
        summary = json.load(open(out))
        assert len(summary) == 2
        assert all(s["returncode"] == 0 for s in summary)
        assert {s["version"] for s in summary} == {
            "sweep_l1_lr0.001", "sweep_l1_lr0.003"}


class TestLegacyKnobs:
    def test_reference_yaml_knobs_ignored(self, capsys):
        cfg = Config().merge_dict({"gpu": "0,1", "pin_mem": True,
                                   "shuffle_mode": "external",
                                   "hidden_size": 256}).finalize()
        assert cfg.hidden_size == 256
        out = capsys.readouterr().out
        assert "legacy reference knob" in out

    def test_truly_unknown_still_rejected(self):
        import pytest as _pytest
        with _pytest.raises(KeyError):
            Config().merge_dict({"hiden_size": 1})
