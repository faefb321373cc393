"""The one-command real-data parity drill (docs/ACCURACY.md runbook):
``run_vqa --run=parity`` chains checkpoint load -> official val accuracy
-> test-dev EvalAI dump. Smoke-tested end-to-end on the real-format
synthetic fixture so a data-equipped host needs zero archaeology —
the exact command in the runbook is the command exercised here.
Reference sequence it compresses: run.py --RUN=val + --RUN=test
(/root/reference/README.md:198-220)."""

import json
import os
import shutil

import numpy as np
import pytest

from tests.test_vqa_end_to_end import _make_dataset_files


@pytest.fixture(scope="module")
def parity_env(tmp_path_factory):
    root = tmp_path_factory.mktemp("parity_drill")
    vqa_dir, feat_dir = _make_dataset_files(root)
    # the drill's test-dev leg needs test2015 features; the shared
    # fixture only writes train/val — mirror the val features under the
    # test naming (same images, different split prefix)
    val_dir = feat_dir / "val2014"
    test_dir = feat_dir / "test2015"
    for f in os.listdir(val_dir):
        shutil.copy(val_dir / f,
                    test_dir / f.replace("COCO_val2014_", "COCO_test2015_"))
    return root, vqa_dir, feat_dir


ARCH = ["--hidden_size=32", "--layer=1", "--multi_head=4",
        "--img_feat_size=16", "--img_feat_pad_size=10", "--max_token=8",
        "--flat_out_size=32", "--flat_mlp_size=16", "--batch_size=16",
        "--compute_dtype=float32", "--verbose=False", "--num_workers=0",
        "--split=train", "--eval_ee=False"]


def _flags(root, vqa_dir, feat_dir):
    return [f"--dataset_path={vqa_dir}/", f"--feature_path={feat_dir}/",
            f"--feature_cache_path={root}/cache/",
            f"--vocab_cache_path={root}/vocab.npz",
            f"--ckpts_dir={root}/ckpts", f"--log_path={root}/log",
            f"--result_path={root}/results", f"--pred_path={root}/pred"]


class TestParityDrill:
    def test_train_then_parity(self, parity_env, capsys):
        """Train on the learnable real-format fixture, then
        run the drill against the saved checkpoint: it must print the
        official val accuracy and write a loadable EvalAI test-dev
        dump."""
        from mcan_vqa_tpu.cli.run_vqa import main
        root, vqa_dir, feat_dir = parity_env
        rc = main(["--run=train", "--model=small", "--version=pd",
                   "--max_epoch=100", "--lr_base=0.003", "--lr_decay_list=",
                   *ARCH, *_flags(root, vqa_dir, feat_dir)])
        assert rc == 0
        capsys.readouterr()

        rc = main(["--run=parity", "--model=small", "--version=pd",
                   "--ckpt_version=pd", "--ckpt_epoch=100",
                   *ARCH, *_flags(root, vqa_dir, feat_dir)])
        assert rc == 0
        out = capsys.readouterr().out
        assert "parity val accuracy (official evaluator):" in out
        assert "EvalAI" in out

        val_dump = f"{root}/results/result_run_pd_val.json"
        test_dump = f"{root}/results/result_run_pd_testdev.json"
        for dump in (val_dump, test_dump):
            assert os.path.exists(dump), dump
            rows = json.load(open(dump))
            assert rows and {"question_id", "answer"} <= set(rows[0])
        # the learnable fixture must score far above 25% chance through
        # the checkpoint-load path too (weights really were restored)
        acc = float(out.split("(official evaluator): ")[1].split()[0])
        assert acc > 80.0, out

    def test_parity_from_torch_pickle(self, parity_env, capsys):
        """The zoo path: --ckpt_path=<reference-format .pkl> feeds the
        same drill (import_torch_checkpoint under the hood) — this is
        exactly how a data-equipped host validates the published
        epoch13.pkl."""
        import jax

        from mcan_vqa_tpu.cli.run_vqa import main
        from mcan_vqa_tpu.configs import Config
        from mcan_vqa_tpu.data import text as text_mod
        from mcan_vqa_tpu.data.vqa_dataset import VQADataset
        from mcan_vqa_tpu.models.net import build_mcan
        from mcan_vqa_tpu.train import checkpoint as ckpt_mod
        root, vqa_dir, feat_dir = parity_env
        # build params at the drill's exact arch (same vocab the CLI
        # will reconstruct from the fixture questions) and export them
        # in the reference pickle format
        cfg = Config(dataset_path=f"{vqa_dir}/",
                     feature_path=f"{feat_dir}/",
                     feature_cache_path=f"{root}/cache/",
                     vocab_cache_path=f"{root}/vocab.npz",
                     img_feat_size=16, img_feat_pad_size=10, max_token=8,
                     hidden_size=32, layer=1, multi_head=4,
                     flat_out_size=32, flat_mlp_size=16,
                     train_split="train", use_glove=False,
                     compute_dtype="float32").finalize()
        ds = VQADataset(cfg, "val")
        model = build_mcan(cfg, token_size=ds.token_size,
                           answer_size=ds.ans_size)
        img = np.zeros((1, 10, 16), np.float32)
        ques = np.zeros((1, 8), np.int32)
        params = model.init({"params": jax.random.PRNGKey(7)}, img,
                            ques)["params"]
        pkl = f"{root}/zoo_epoch13.pkl"
        ckpt_mod.export_torch_checkpoint(params, pkl)

        rc = main(["--run=parity", "--model=small", "--version=pdz",
                   f"--ckpt_path={pkl}", "--ckpt_epoch=13",
                   *ARCH, *_flags(root, vqa_dir, feat_dir)])
        assert rc == 0
        out = capsys.readouterr().out
        assert "parity val accuracy (official evaluator):" in out
        assert os.path.exists(f"{root}/results/result_run_pdz_testdev.json")
