"""Convergence A/B: the fused train engine vs the plain (model.apply) engine.

The fused custom-VJP SGA engine is the production single-TPU train path;
grad parity at dropout 0 and the PRNG mask-equivalence proof establish
per-step correctness, but VERDICT r2 asked for end-to-end evidence: the
SAME real-format training run through BOTH engines must reach the same
official VQA accuracy. Dropout trajectories differ by construction (the
engines draw masks differently), so the claim is equal final accuracy on
a learnable task, not equal parameters.

Curves land in the epoch JSONL (val/accuracy per epoch); the recorded
numbers live in docs/ACCURACY.md.
"""

import json
import os

import pytest

from mcan_vqa_tpu.configs import Config
from tests.test_vqa_end_to_end import FEAT_DIM, _make_dataset_files

EPOCHS = 100


@pytest.fixture(scope="module")
def dataset_root(tmp_path_factory):
    root = tmp_path_factory.mktemp("fused_ab")
    vqa_dir, feat_dir = _make_dataset_files(root)
    return root, vqa_dir, feat_dir


def _run(root, vqa_dir, feat_dir, engine):
    from mcan_vqa_tpu.data.vqa_dataset import VQADataset
    from mcan_vqa_tpu.train.trainer import Trainer

    tag = f"ab_{engine}"
    cfg = Config(
        dataset_path=str(vqa_dir) + "/", feature_path=str(feat_dir) + "/",
        feature_cache_path=str(root / "cache") + "/",
        vocab_cache_path=str(root / "vocab.npz"),
        img_feat_size=FEAT_DIM, img_feat_pad_size=10, max_token=8,
        hidden_size=32, layer=1, multi_head=4, flat_out_size=32,
        flat_mlp_size=16, batch_size=16, lr_base=3e-3, max_epoch=EPOCHS,
        train_split="train", use_glove=False, num_workers=2,
        eval_every_epoch=True, verbose=False, compute_dtype="float32",
        dropout_rate=0.1, train_engine=engine, eval_engine="plain",
        version=tag, lr_decay_list=[], keep_last_ckpts=1,
        ckpts_dir=str(root / tag / "ckpts"),
        log_path=str(root / tag / "log"),
        result_path=str(root / tag / "results"),
        pred_path=str(root / tag / "pred"),
        cache_path=str(root / tag / "rcache"),
    ).finalize()
    ds = VQADataset(cfg, "train")
    trainer = Trainer(cfg, train_dataset=ds, eval_datasets={"val": ds})
    if engine == "fused":
        assert trainer._use_fused_train()
    trainer.train()
    jsonl = os.path.join(cfg.log_path, f"log_run_{tag}.jsonl")
    curve = [json.loads(l)["val/accuracy"] for l in open(jsonl)
             if "val/accuracy" in l]
    assert len(curve) == EPOCHS
    return curve


class TestFusedEngineConvergence:
    def test_fused_reaches_plain_accuracy(self, dataset_root):
        root, vqa_dir, feat_dir = dataset_root
        curve_plain = _run(root, vqa_dir, feat_dir, "plain")
        curve_fused = _run(root, vqa_dir, feat_dir, "fused")
        print(f"\nplain tail: {curve_plain[-5:]}\n"
              f"fused tail: {curve_fused[-5:]}")
        # both engines solve the task...
        assert curve_plain[-1] > 90.0, curve_plain
        assert curve_fused[-1] > 90.0, curve_fused
        # ...to the same final official accuracy (different dropout draws,
        # so "within noise", not bitwise)
        assert abs(curve_plain[-1] - curve_fused[-1]) <= 2.0, (
            curve_plain[-1], curve_fused[-1])
