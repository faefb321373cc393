"""Accuracy validation for the bf16 residual stream (serving fast path).

Round 1 measured +3% throughput for carrying residuals in bf16 between
blocks but only quantified logit perturbation; VERDICT asked for an
official-accuracy delta on real-format data before defaulting it. This
trains the real-format synthetic slice, then scores BOTH streams with the
official VQA evaluator and pins the allowed disagreement."""

import numpy as np
import pytest

from mcan_vqa_tpu.configs import Config
from tests.test_vqa_end_to_end import FEAT_DIM, _make_dataset_files


@pytest.fixture(scope="module")
def trained(tmp_path_factory):
    root = tmp_path_factory.mktemp("bf16_stream")
    vqa_dir, feat_dir = _make_dataset_files(root)
    cfg = Config(
        dataset_path=str(vqa_dir) + "/", feature_path=str(feat_dir) + "/",
        feature_cache_path=str(root / "cache") + "/",
        vocab_cache_path=str(root / "vocab.npz"),
        img_feat_size=FEAT_DIM, img_feat_pad_size=10, max_token=8,
        hidden_size=32, layer=1, multi_head=4, flat_out_size=32,
        flat_mlp_size=16, batch_size=16, lr_base=3e-3, max_epoch=100,
        train_split="train", use_glove=False, num_workers=2,
        eval_every_epoch=False, verbose=False, compute_dtype="float32",
        ckpts_dir=str(root / "ckpts"), log_path=str(root / "log"),
        result_path=str(root / "results"), pred_path=str(root / "pred"),
        cache_path=str(root / "rcache"), lr_decay_list=[],
        keep_last_ckpts=1,
    ).finalize()
    from mcan_vqa_tpu.data.vqa_dataset import VQADataset
    from mcan_vqa_tpu.train.trainer import Trainer
    ds = VQADataset(cfg, "train")
    trainer = Trainer(cfg, train_dataset=ds)
    trainer.train()
    return cfg, ds, trainer


def _serve(cfg, trainer, ds, bf16_stream):
    import jax
    from mcan_vqa_tpu.ops.serving import make_serving_fn
    params = jax.device_get(trainer.state.params)
    fwd = make_serving_fn(cfg.layer, cfg.multi_head, use_pallas=False,
                          bf16_stream=bf16_stream)
    batch = {k: np.stack([ds.example(i)[k] for i in range(len(ds))])
             for k in ("img", "ques")}
    return np.asarray(fwd(params, batch["img"], batch["ques"]))


class TestBF16StreamAccuracy:
    def test_official_accuracy_delta(self, trained):
        from mcan_vqa_tpu.evals import vqa_eval
        cfg, ds, trainer = trained
        logits32 = _serve(cfg, trainer, ds, bf16_stream=False)
        logits16 = _serve(cfg, trainer, ds, bf16_stream=True)

        top32, top16 = logits32.argmax(1), logits16.argmax(1)
        agreement = float((top32 == top16).mean())

        gts = {a["question_id"]: {"answers": [x["answer"]
                                              for x in a["answers"]]}
               for a in ds.ans_list}

        def acc(top):
            res = {int(q["question_id"]): ds.ix_to_ans[str(int(t))]
                   for q, t in zip(ds.ques_list, top)}
            return vqa_eval.evaluate(gts, res)["overall"]

        acc32, acc16 = acc(top32), acc(top16)
        print(f"\nbf16_stream gate: agreement={agreement:.4f} "
              f"acc32={acc32:.2f} acc16={acc16:.2f}")
        # the learned task is solved; bf16 stream must not change that
        assert acc32 > 80.0
        # Tight gate (r3): the reference's whole margin over the paper is
        # 0.07 points (70.70 vs 70.63, BASELINE.md) — the stream must be
        # accuracy-neutral at that scale before it ships anywhere.
        assert agreement >= 0.995, (agreement, acc32, acc16)
        assert abs(acc32 - acc16) <= 0.1, (acc32, acc16)

    def test_logit_perturbation_bounded(self, trained):
        cfg, ds, trainer = trained
        l32 = _serve(cfg, trainer, ds, bf16_stream=False)
        l16 = _serve(cfg, trainer, ds, bf16_stream=True)
        denom = np.abs(l32).max()
        assert np.abs(l16 - l32).max() / denom < 0.05
