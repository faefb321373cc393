"""The SURVEY §7 'minimum end-to-end slice' on real-format data: VQA-v2 JSON
files + per-image .npz features -> VQADataset -> packed cache -> Trainer ->
official accuracy evaluator -> EvalAI dump. The synthetic task is learnable
(the answer is encoded in the image features), so official accuracy must
climb far above chance."""

import json
import os

import numpy as np
import pytest

from mcan_vqa_tpu.configs import Config

N_IMG = 60
N_ANSWERS = 4
ANSWER_WORDS = ["red", "blue", "2", "yes"]  # all in the frozen 3129 dict
FEAT_DIM = 16


def _make_dataset_files(root):
    """VQA-v2-format questions/annotations + BUTD-format npz features.

    Image i encodes class (i % 4) as a strong signature in its features.
    """
    rng = np.random.default_rng(0)
    vqa_dir = root / "vqa"; vqa_dir.mkdir()
    feat_dir = root / "coco_extract"
    for split_dir in ("train2014", "val2014", "test2015"):
        (feat_dir / split_dir).mkdir(parents=True)

    questions, annotations = [], []
    for i in range(N_IMG):
        cls = i % N_ANSWERS
        n_regions = int(rng.integers(4, 9))
        feats = rng.normal(0, 0.1, size=(n_regions, FEAT_DIM)).astype(np.float32)
        feats[:, cls] += 5.0  # class signature
        for split_dir in ("train2014", "val2014"):
            np.savez(feat_dir / split_dir /
                     f"COCO_{split_dir}_{i:012d}.jpg.npz",
                     x=feats.T, bbox=rng.uniform(0, 1, (n_regions, 4))
                     .astype(np.float32))
        questions.append({"question_id": 1000 + i, "image_id": i,
                          "question": "what is the signature class here?"})
        annotations.append({
            "question_id": 1000 + i, "image_id": i,
            "question_type": "what is", "answer_type": "other",
            "answers": [{"answer": ANSWER_WORDS[cls]}] * 10,
            "multiple_choice_answer": ANSWER_WORDS[cls],
        })

    q_payload = {"questions": questions}
    a_payload = {"annotations": annotations}
    for name in ("train2014", "val2014", "test2015"):
        (vqa_dir / f"v2_OpenEnded_mscoco_{name}_questions.json").write_text(
            json.dumps(q_payload))
    (vqa_dir / "VG_questions.json").write_text(json.dumps(q_payload))
    for name in ("train2014", "val2014"):
        (vqa_dir / f"v2_mscoco_{name}_annotations.json").write_text(
            json.dumps(a_payload))
    (vqa_dir / "VG_annotations.json").write_text(json.dumps(a_payload))
    return vqa_dir, feat_dir


@pytest.fixture(scope="module")
def vqa_env(tmp_path_factory):
    root = tmp_path_factory.mktemp("vqa_e2e")
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
    return root, cfg


class TestRealFormatEndToEnd:
    def test_dataset_semantics(self, vqa_env):
        from mcan_vqa_tpu.data.vqa_dataset import VQADataset
        _, cfg = vqa_env
        ds = VQADataset(cfg, "train")
        assert len(ds) == N_IMG            # train sizes by annotations
        assert ds.ans_size == 3129         # frozen dict
        ex = ds.example(0)
        assert ex["img"].shape == (10, FEAT_DIM)
        assert ex["target"].max() == 1.0   # 10/10 annotators agree
        # zero-padded rows after the true region count
        assert (np.abs(ex["img"]).sum(axis=1) > 0).sum() < 10

    def test_train_eval_official_accuracy(self, vqa_env):
        from mcan_vqa_tpu.data.vqa_dataset import VQADataset
        from mcan_vqa_tpu.evals import vqa_eval
        from mcan_vqa_tpu.train.trainer import Trainer
        root, cfg = vqa_env

        train_ds = VQADataset(cfg, "train")
        trainer = Trainer(cfg, train_dataset=train_ds)
        trainer.train()

        dump = os.path.join(cfg.result_path, "result_e2e.json")
        res = trainer.evaluate(train_ds, dump_path=dump)
        # official protocol accuracy, far above 25% chance
        assert res["accuracy"] > 80.0, res
        # EvalAI dump is loadable and scores identically
        loaded = vqa_eval.load_results(dump)
        assert len(loaded) == N_IMG
        gts = {a["question_id"]: {"answers": [x["answer"]
                                              for x in a["answers"]]}
               for a in train_ds.ans_list}
        rescored = vqa_eval.evaluate(gts, loaded)
        assert abs(rescored["overall"] - res["accuracy"]) < 1e-9

    def test_packed_cache_path_equivalent(self, vqa_env):
        """Packing features and re-reading through the cache (native C++
        batcher) yields the same batches as the npz path."""
        from mcan_vqa_tpu.data.features import PackedFeatureCache
        from mcan_vqa_tpu.data.vqa_dataset import VQADataset
        root, cfg = vqa_env
        ds_npz = VQADataset(cfg, "train")
        PackedFeatureCache.build(
            os.path.join(cfg.feature_path, "train2014"),
            os.path.join(cfg.feature_cache_path, "train"),
            feat_dim=FEAT_DIM, log_every=0)
        ds_packed = VQADataset(cfg, "train")
        assert ds_packed._packed, "cache not picked up"
        idx = np.arange(8)
        b1 = ds_npz.batch_examples(idx)
        b2 = ds_packed.batch_examples(idx)
        np.testing.assert_allclose(b1["img"], b2["img"], atol=2e-3)
        np.testing.assert_array_equal(b1["ques"], b2["ques"])
        # bboxes come back through the cache for visualization
        assert ds_packed.bboxes(0) is not None
