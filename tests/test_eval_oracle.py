"""VQA-accuracy evaluator vs the ACTUAL reference implementation.

Feeds identical annotation/question/result files to the reference's
``VQA`` + ``VQAEval`` (imported from /root/reference/utils — the real code,
not a re-expression) and to our ``evals.vqa_eval`` functions plus the
``evals.compat`` drop-in facade, and asserts the full accuracy tables agree
exactly: overall, perQuestionType, perAnswerType, and per-question scores
(reference: utils/vqaEval.py:68-152, utils/vqa.py:24-182).

The fixture deliberately stresses every normalization rule: disagreeing GT
answers (triggering in-place GT punctuation normalization), contractions,
word->digit mapping, article stripping, the comma-in-digits punctuation
quirk, period stripping, and partial (0.3/0.6/0.9) soft scores.
"""

import json
import os
import sys

import pytest

REFERENCE = "/root/reference"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(os.path.join(REFERENCE, "utils")),
    reason="reference mount not available")


def _ann(qid, img, qtype, atype, answers):
    """Annotation record; unique answer_ids as in real VQA-v2 files (the
    reference excludes the leave-one-out annotator by full-dict equality,
    utils/vqaEval.py:97 — identical dicts would both vanish)."""
    return {
        "question_id": qid, "image_id": img,
        "question_type": qtype, "answer_type": atype,
        "multiple_choice_answer": answers[0],
        "answers": [
            {"answer": a, "answer_confidence": "yes", "answer_id": i + 1}
            for i, a in enumerate(answers)
        ],
    }


# 10-annotator GT sets + predictions covering the normalization edge cases.
CASES = [
    # unanimous GT, exact match -> 1.0
    (1, "is this", "yes/no", ["yes"] * 10, "yes"),
    # unanimous GT, miss -> 0.0
    (2, "is this", "yes/no", ["no"] * 10, "yes"),
    # disagreement: GT gets punctuation-normalized in place; the prediction
    # "don t" -> digit/article pass maps "dont"? no — contraction applies
    # to the token "dont" after punct strip
    (3, "what is", "other", ["dont know"] * 4 + ["don't know"] * 6,
     "don't know"),
    # word->digit on the prediction; GT has digits
    (4, "how many", "number", ["2"] * 7 + ["3"] * 3, "two"),
    # article stripping: "the cat" == "cat"
    (5, "what animal", "other", ["cat"] * 6 + ["kitten"] * 4, "the cat"),
    # punctuation in prediction: "yes!" -> "yes"
    (6, "is the", "yes/no", ["yes"] * 8 + ["no"] * 2, "yes!"),
    # comma-in-digits quirk: commaStrip matches "1,000" so ALL punct chars
    # are removed (not replaced by space)
    (7, "how many", "number", ["1,000"] * 5 + ["1000"] * 5, "1,000"),
    # period stripping: "u.s." -> "us" (periodStrip regex)
    (8, "where is", "other", ["us"] * 5 + ["usa"] * 5, "u.s."),
    # partial credit: 3 of 10 annotators say the answer -> some LOO subsets
    # have 2/3 matches
    (9, "what color", "other",
     ["red"] * 3 + ["blue"] * 3 + ["green"] * 2 + ["yellow"] * 2, "red"),
    # hyphen is in the punct list: "t-shirt" -> "t shirt" (space branch)
    (10, "what is the", "other", ["t shirt"] * 6 + ["shirt"] * 4,
     "t-shirt"),
    # contraction table on GT side after punct pass keeps "won't"
    (11, "will it", "yes/no", ["won't"] * 9 + ["maybe"], "wont"),
    # empty-ish prediction with whitespace/newlines
    (12, "what is", "other", ["nothing"] * 10, "  nothing\n"),
]


@pytest.fixture(scope="module")
def files(tmp_path_factory):
    d = tmp_path_factory.mktemp("vqa_eval_oracle")
    anns = {
        "info": {"description": "mini"}, "task_type": "Open-Ended",
        "data_type": "mscoco", "data_subtype": "val2014", "license": {},
        "annotations": [
            _ann(qid, 100 + qid, qt, at, gt)
            for qid, qt, at, gt, _ in [
                (q, t, a, g, p) for (q, t, a, g, p) in CASES]
        ],
    }
    ques = {
        "info": {"description": "mini"}, "task_type": "Open-Ended",
        "data_type": "mscoco", "data_subtype": "val2014", "license": {},
        "questions": [
            {"question_id": q, "image_id": 100 + q, "question": t + " ...?"}
            for (q, t, _, _, _) in CASES
        ],
    }
    res = [{"question_id": q, "answer": p} for (q, _, _, _, p) in CASES]
    ann_f, ques_f, res_f = (str(d / n) for n in
                            ("anns.json", "ques.json", "res.json"))
    for path, payload in ((ann_f, anns), (ques_f, ques), (res_f, res)):
        with open(path, "w") as f:
            json.dump(payload, f)
    return ann_f, ques_f, res_f


@pytest.fixture(scope="module")
def reference_tables(files):
    """Run the REAL reference evaluator on the fixture files."""
    ann_f, ques_f, res_f = files
    sys.path.insert(0, REFERENCE)
    try:
        from utils.vqa import VQA as RefVQA  # noqa: PLC0415
        from utils.vqaEval import VQAEval as RefVQAEval  # noqa: PLC0415
        vqa = RefVQA(ann_f, ques_f)
        vqa_res = vqa.loadRes(res_f, ques_f)
        ev = RefVQAEval(vqa, vqa_res, n=2)
        ev.evaluate()
        return {
            "overall": ev.accuracy["overall"],
            "perQuestionType": dict(ev.accuracy["perQuestionType"]),
            "perAnswerType": dict(ev.accuracy["perAnswerType"]),
            "perQuestion": dict(ev.evalQA),
        }
    finally:
        sys.path.remove(REFERENCE)


class TestEvaluatorOracle:
    def test_pure_evaluate_matches_reference(self, files, reference_tables):
        from mcan_vqa_tpu.evals import vqa_eval
        ann_f, _, res_f = files
        gts = vqa_eval.load_annotations(ann_f)
        res = vqa_eval.load_results(res_f)
        acc = vqa_eval.evaluate(gts, res, ndigits=2)

        assert abs(acc["overall"] - reference_tables["overall"]) < 1e-9
        assert acc["perQuestionType"] == reference_tables["perQuestionType"]
        assert acc["perAnswerType"] == reference_tables["perAnswerType"]
        assert acc["perQuestion"] == reference_tables["perQuestion"]

    def test_compat_facade_matches_reference(self, files, reference_tables):
        from mcan_vqa_tpu.evals.compat import VQA, VQAEval
        ann_f, ques_f, res_f = files
        vqa = VQA(ann_f, ques_f)
        vqa_res = vqa.loadRes(res_f, ques_f)
        ev = VQAEval(vqa, vqa_res, n=2)
        ev.evaluate()
        assert abs(ev.accuracy["overall"]
                   - reference_tables["overall"]) < 1e-9
        assert ev.accuracy["perQuestionType"] == \
            reference_tables["perQuestionType"]
        assert ev.accuracy["perAnswerType"] == \
            reference_tables["perAnswerType"]
        assert dict(ev.evalQA) == reference_tables["perQuestion"]

    def test_fixture_exercises_partial_credit(self, files, reference_tables):
        """Sanity: the fixture actually produces non-{0,100} scores."""
        scores = set(reference_tables["perQuestion"].values())
        assert any(0.0 < s < 100.0 for s in scores)
        assert 0.0 in scores and 100.0 in scores


# Messy answer vocabulary for the randomized sweep: contractions, digit
# words, articles, every punctuation rule, casing, multi-word phrases.
_FUZZ_ANSWERS = [
    "yes", "no", "maybe", "2", "two", "10", "1,000", "1000", "none",
    "don't know", "dont know", "doesnt matter", "doesn't matter",
    "the cat", "a cat", "cat", "an apple", "apple", "u.s.", "us", "usa",
    "t-shirt", "t shirt", "shirt", "red", "red!", "dark red", "semi-colon;",
    "semicolon", "what?", "what", "it's", "its", "youre", "you're",
    "one hundred", "100", "0", "zero", "left", "to the left", "left side",
    "  spaced  ", "newline\nanswer", "Mixed Case", "mixed case",
    "won't", "wont", "shouldnt've", "shouldn't've", ">100", "100%",
]
_FUZZ_QTYPES = ["is this", "what is", "how many", "what color", "where is"]
_FUZZ_ATYPES = ["yes/no", "number", "other"]


@pytest.fixture(scope="module")
def fuzz_files(tmp_path_factory):
    """300 seeded-random questions: random 10-annotator GT multisets over
    the messy vocabulary, random predictions (sometimes sampled from the
    GT set so every score level appears, sometimes unrelated)."""
    import random
    rng = random.Random(20260818)
    d = tmp_path_factory.mktemp("vqa_eval_fuzz")
    cases = []
    for qid in range(1, 301):
        qt = rng.choice(_FUZZ_QTYPES)
        at = rng.choice(_FUZZ_ATYPES)
        # k distinct answers spread over 10 annotators
        k = rng.randint(1, 5)
        pool = rng.sample(_FUZZ_ANSWERS, k)
        gt = [rng.choice(pool) for _ in range(10)]
        pred = (rng.choice(gt) if rng.random() < 0.6
                else rng.choice(_FUZZ_ANSWERS))
        cases.append((qid, qt, at, gt, pred))
    anns = {
        "info": {}, "task_type": "Open-Ended", "data_type": "mscoco",
        "data_subtype": "val2014", "license": {},
        "annotations": [_ann(q, 500 + q, t, a, g)
                        for (q, t, a, g, _) in cases],
    }
    ques = {
        "info": {}, "task_type": "Open-Ended", "data_type": "mscoco",
        "data_subtype": "val2014", "license": {},
        "questions": [{"question_id": q, "image_id": 500 + q,
                       "question": t + " ...?"}
                      for (q, t, _, _, _) in cases],
    }
    res = [{"question_id": q, "answer": p} for (q, _, _, _, p) in cases]
    ann_f, ques_f, res_f = (str(d / n) for n in
                            ("anns.json", "ques.json", "res.json"))
    for path, payload in ((ann_f, anns), (ques_f, ques), (res_f, res)):
        with open(path, "w") as f:
            json.dump(payload, f)
    return ann_f, ques_f, res_f


class TestEvaluatorOracleFuzz:
    def test_randomized_sweep_matches_reference(self, fuzz_files):
        """300 seeded-random messy cases: per-question scores and all
        three accuracy tables equal the reference evaluator exactly."""
        ann_f, ques_f, res_f = fuzz_files
        sys.path.insert(0, REFERENCE)
        try:
            from utils.vqa import VQA as RefVQA  # noqa: PLC0415
            from utils.vqaEval import VQAEval as RefVQAEval  # noqa: PLC0415
            vqa = RefVQA(ann_f, ques_f)
            ev = RefVQAEval(vqa, vqa.loadRes(res_f, ques_f), n=2)
            ev.evaluate()
        finally:
            sys.path.remove(REFERENCE)

        from mcan_vqa_tpu.evals import vqa_eval
        gts = vqa_eval.load_annotations(ann_f)
        res = vqa_eval.load_results(res_f)
        acc = vqa_eval.evaluate(gts, res, ndigits=2)

        assert acc["perQuestion"] == dict(ev.evalQA)
        assert abs(acc["overall"] - ev.accuracy["overall"]) < 1e-9
        assert acc["perQuestionType"] == dict(ev.accuracy["perQuestionType"])
        assert acc["perAnswerType"] == dict(ev.accuracy["perAnswerType"])
        # the sweep must actually exercise partial credit and both extremes
        scores = set(acc["perQuestion"].values())
        assert 0.0 in scores and 100.0 in scores
        assert any(0.0 < s < 100.0 for s in scores)

    def test_compat_facade_matches_on_fuzz(self, fuzz_files):
        """The drop-in VQA/VQAEval facade agrees with the reference on the
        same randomized sweep (not just the curated cases)."""
        ann_f, ques_f, res_f = fuzz_files
        sys.path.insert(0, REFERENCE)
        try:
            from utils.vqa import VQA as RefVQA  # noqa: PLC0415
            from utils.vqaEval import VQAEval as RefVQAEval  # noqa: PLC0415
            rvqa = RefVQA(ann_f, ques_f)
            rev = RefVQAEval(rvqa, rvqa.loadRes(res_f, ques_f), n=2)
            rev.evaluate()
        finally:
            sys.path.remove(REFERENCE)
        from mcan_vqa_tpu.evals.compat import VQA, VQAEval
        vqa = VQA(ann_f, ques_f)
        ev = VQAEval(vqa, vqa.loadRes(res_f, ques_f), n=2)
        ev.evaluate()
        assert dict(ev.evalQA) == dict(rev.evalQA)
        assert abs(ev.accuracy["overall"] - rev.accuracy["overall"]) < 1e-9
