"""Tests for the VQA accuracy protocol (hand-computed + property cases) and
ROC-AUC (sklearn as oracle)."""

import json

import numpy as np
import pytest

from mcan_vqa_tpu.evals import roc_auc as ra
from mcan_vqa_tpu.evals import vqa_eval as ve


class TestQuestionAccuracy:
    def test_unanimous_match(self):
        assert ve.question_accuracy(["yes"] * 10, "yes") == 1.0

    def test_no_match(self):
        assert ve.question_accuracy(["yes"] * 10, "no") == 0.0

    def test_partial(self):
        # 3 annotators say "cat": leave-one-out -> 3 subsets see 2 matches
        # (acc 2/3), 7 subsets see 3 matches (acc 1) -> (3*2/3 + 7)/10 = 0.9
        gts = ["cat"] * 3 + ["dog"] * 7
        assert abs(ve.question_accuracy(gts, "cat") - 0.9) < 1e-9

    def test_single_annotator_variants(self):
        # 1 "cat": subsets not holding it see 1 match -> min(1, 1/3)
        gts = ["cat"] + ["dog"] * 9
        expect = (9 * (1 / 3)) / 10
        assert abs(ve.question_accuracy(gts, "cat") - expect) < 1e-9

    def test_normalization_applied_to_prediction(self):
        assert ve.question_accuracy(["2"] * 10, "two") == 1.0
        assert ve.question_accuracy(["don't"] * 10, "dont") == 1.0
        assert ve.question_accuracy(["cat"] * 10, "the cat") == 1.0

    def test_gt_normalized_only_when_disagreeing(self):
        # All-identical GT keeps raw strings (quirk of the official protocol)
        assert ve.question_accuracy(["u.s."] * 10, "us") == 0.0
        mixed = ["u.s."] * 9 + ["usa"]
        assert ve.question_accuracy(mixed, "us") > 0.9


class TestEvaluate:
    def test_aggregates(self):
        gts = {
            1: {"answers": ["yes"] * 10, "question_type": "is the",
                "answer_type": "yes/no"},
            2: {"answers": ["2"] * 10, "question_type": "how many",
                "answer_type": "number"},
            3: {"answers": ["red"] * 10, "question_type": "what color",
                "answer_type": "other"},
        }
        results = {1: "yes", 2: "3", 3: "red"}
        out = ve.evaluate(gts, results)
        assert out["overall"] == round(100 * 2 / 3, 2)
        assert out["perAnswerType"]["yes/no"] == 100.0
        assert out["perAnswerType"]["number"] == 0.0
        assert out["perQuestion"][3] == 100.0

    def test_missing_result_raises(self):
        gts = {1: {"answers": ["yes"] * 10}}
        with pytest.raises(KeyError):
            ve.evaluate(gts, {})

    def test_file_roundtrip(self, tmp_path):
        p = str(tmp_path / "res.json")
        ve.dump_results([10, 11], ["cat", "2"], p)
        res = ve.load_results(p)
        assert res == {10: "cat", 11: "2"}

    def test_load_annotations(self, tmp_path):
        ann = {"annotations": [{
            "question_id": 5, "question_type": "what", "answer_type": "other",
            "answers": [{"answer": f"a{i}"} for i in range(10)],
        }]}
        p = tmp_path / "ann.json"
        p.write_text(json.dumps(ann))
        gts = ve.load_annotations(str(p))
        assert gts[5]["answers"][3] == "a3"
        assert gts[5]["question_type"] == "what"


class TestROCAUC:
    def test_matches_sklearn_binary(self):
        from sklearn.metrics import roc_auc_score
        rng = np.random.default_rng(0)
        for _ in range(5):
            y = rng.integers(0, 2, 200)
            if y.sum() in (0, 200):
                continue
            s = rng.random(200)
            assert abs(ra.binary_roc_auc(y, s) - roc_auc_score(y, s)) < 1e-12

    def test_ties_match_sklearn(self):
        from sklearn.metrics import roc_auc_score
        rng = np.random.default_rng(1)
        y = rng.integers(0, 2, 300)
        s = rng.integers(0, 5, 300).astype(float) / 4  # heavy ties
        assert abs(ra.binary_roc_auc(y, s) - roc_auc_score(y, s)) < 1e-12

    def test_single_class_is_nan(self):
        assert np.isnan(ra.binary_roc_auc(np.ones(10), np.random.rand(10)))

    def test_multilabel_matches_sklearn(self):
        from sklearn.metrics import roc_auc_score
        rng = np.random.default_rng(2)
        y = rng.integers(0, 2, (150, 6))
        s = rng.random((150, 6))
        out = ra.multilabel_roc_auc(y, s)
        assert abs(out["macro"] - roc_auc_score(y, s, average="macro")) < 1e-12
        assert abs(out["micro"] - roc_auc_score(y, s, average="micro")) < 1e-12
        for c in range(6):
            assert abs(out["per_class"][c] -
                       roc_auc_score(y[:, c], s[:, c])) < 1e-12

    def test_multilabel_skips_degenerate_class(self):
        y = np.zeros((50, 3), int)
        y[:, 0] = np.random.default_rng(3).integers(0, 2, 50)
        s = np.random.default_rng(4).random((50, 3))
        out = ra.multilabel_roc_auc(y, s)
        assert np.isnan(out["per_class"][1]) and np.isnan(out["per_class"][2])
        assert not np.isnan(out["macro"])


class TestCompatAPI:
    """Drop-in VQA / VQAEval facade (reference utils/vqa.py usage pattern)."""

    def _files(self, tmp_path):
        ann = {"annotations": [
            {"question_id": 1, "image_id": 10, "question_type": "is the",
             "answer_type": "yes/no",
             "answers": [{"answer": "yes"}] * 10},
            {"question_id": 2, "image_id": 11, "question_type": "what color",
             "answer_type": "other",
             "answers": [{"answer": "red"}] * 7 + [{"answer": "blue"}] * 3},
        ]}
        ques = {"questions": [
            {"question_id": 1, "image_id": 10, "question": "is the sky blue?"},
            {"question_id": 2, "image_id": 11, "question": "what color?"},
        ]}
        res = [{"question_id": 1, "answer": "yes"},
               {"question_id": 2, "answer": "blue"}]
        a, q, r = (tmp_path / n for n in ("ann.json", "q.json", "res.json"))
        a.write_text(json.dumps(ann)); q.write_text(json.dumps(ques))
        r.write_text(json.dumps(res))
        return str(a), str(q), str(r)

    def test_reference_usage_pattern(self, tmp_path):
        from mcan_vqa_tpu.evals.compat import VQA, VQAEval
        ann, ques, res = self._files(tmp_path)
        vqa = VQA(ann, ques)
        vqaRes = vqa.loadRes(res, ques)
        ev = VQAEval(vqa, vqaRes, n=2)
        ev.evaluate()
        # q2: 3 "blue" among 10 -> leave-one-out: 3 subsets see 2 matches
        # (2/3), 7 subsets see 3 matches (capped 1.0) -> 0.9
        assert ev.accuracy["overall"] == 95.0
        assert ev.accuracy["perAnswerType"]["yes/no"] == 100.0
        assert ev.evalQA[2] == 90.0
        assert ev.evalQuesType["what color"][2] == 90.0

    def test_index_queries(self, tmp_path):
        from mcan_vqa_tpu.evals.compat import VQA
        ann, ques, _ = self._files(tmp_path)
        vqa = VQA(ann, ques)
        assert sorted(vqa.getQuesIds()) == [1, 2]
        assert vqa.getQuesIds(ansTypes="yes/no") == [1]
        assert vqa.getImgIds(quesIds=[2]) == [11]
        assert vqa.loadQA(1)[0]["image_id"] == 10
