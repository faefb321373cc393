"""Tests for the offline tools: train-data filter, answer-dict builder CLI,
feature packer CLI."""

import json
import os
import pickle

import numpy as np

from mcan_vqa_tpu.data.filter_train_data import (
    dump_filtered_indices, filter_indices_by_answer_cap, load_filtered_indices)


def _qa(labels):
    return {"answer": {"labels": labels}}


class TestFilter:
    def test_caps_per_class(self):
        qa = [_qa([0])] * 100 + [_qa([1])] * 5
        kept = filter_indices_by_answer_cap(qa, cap=10, seed=0)
        labels = [qa[i]["answer"]["labels"][0] for i in kept]
        assert labels.count(0) == 10 and labels.count(1) == 5

    def test_rare_label_protected(self):
        # multi-label example with a rare label survives a frequent co-label cap
        qa = [_qa([0])] * 50 + [_qa([0, 1])] * 3
        kept = filter_indices_by_answer_cap(qa, cap=5, seed=1)
        rare = [i for i in kept if 1 in qa[i]["answer"]["labels"]]
        assert len(rare) == 3

    def test_dump_load_roundtrip(self, tmp_path):
        qa = [_qa([i % 3]) for i in range(30)]
        p = str(tmp_path / "idx.pkl")
        kept = dump_filtered_indices(qa, p, cap=4)
        assert load_filtered_indices(p) == kept
        assert len(kept) == 12


class TestBuildAnswerDictCLI:
    def test_builds_from_annotations(self, tmp_path):
        ds = tmp_path / "vqa"
        ds.mkdir()
        anns = {"annotations": [
            {"multiple_choice_answer": "yes"} for _ in range(10)
        ] + [{"multiple_choice_answer": "rare"} for _ in range(3)]}
        for split in ("train2014", "val2014"):
            (ds / f"v2_mscoco_{split}_annotations.json").write_text(
                json.dumps(anns))
        from mcan_vqa_tpu.cli.build_answer_dict import main
        out = str(tmp_path / "dict.json")
        rc = main([f"--dataset_path={ds}/", "--min_freq=8", f"--out={out}"])
        assert rc == 0
        a2i, i2a = json.load(open(out))
        assert a2i == {"yes": 0}


class TestPackFeaturesCLI:
    def test_packs_split(self, tmp_path):
        src = tmp_path / "coco_extract" / "train2014"
        src.mkdir(parents=True)
        rng = np.random.default_rng(0)
        for iid in (3, 8):
            np.savez(src / f"COCO_train2014_{iid:012d}.jpg.npz",
                     x=rng.normal(size=(16, 7)).astype(np.float32))
        from mcan_vqa_tpu.cli.pack_features import main
        rc = main(["--split=train",
                   f"--feature_path={tmp_path}/coco_extract",
                   f"--cache_path={tmp_path}/cache", "--feat_dim=16"])
        assert rc == 0
        assert os.path.exists(tmp_path / "cache" / "train" / "index.json")
        from mcan_vqa_tpu.data.features import PackedFeatureCache
        cache = PackedFeatureCache(str(tmp_path / "cache" / "train"))
        assert cache.get("3").shape == (7, 16)
