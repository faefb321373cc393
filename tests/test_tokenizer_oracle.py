"""Tokenizer + answer-normalization vs the ACTUAL reference functions.

Imports the reference's ``core.data.data_utils`` (``tokenize`` /
``proc_ques``, reference: core/data/data_utils.py:53-152) and
``core.data.ans_punct.prep_ans`` (ans_punct.py:75-106) and drives them
against our ``data.text`` / ``data.answers`` on a seeded-random corpus of
messy questions and answers: vocabulary insertion order, per-question
index encodings (incl. UNK and truncation), and answer normalization must
agree exactly.

The container has no spaCy; the reference module only *calls* it under
``use_glove=True``, so a stub module satisfies the top-level import and
``use_glove=False`` keeps the oracle pure.
"""

import os
import random
import string
import sys
import types

import numpy as np
import pytest

REFERENCE = "/root/reference"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(os.path.join(REFERENCE, "core")),
    reason="reference mount not available")


@pytest.fixture(scope="module")
def ref_mods():
    if "spacy" not in sys.modules:  # reference imports it at module top
        sys.modules["spacy"] = types.ModuleType("spacy")
    sys.path.insert(0, REFERENCE)
    try:
        import core.data.ans_punct as ref_ans  # noqa: PLC0415
        import core.data.data_utils as ref_du  # noqa: PLC0415
        return ref_du, ref_ans
    finally:
        sys.path.remove(REFERENCE)


_WORDS = ["what", "color", "is", "the", "man-dog", "doing", "red/blue",
          "isn't", "it's", "u.s.", "2", "two", "1,000", "cat!", "(maybe)",
          "semi;colon", "quote\"d", "star*word", "hash#tag", "co:lon",
          "don't", "WHAT", "Mixed", "a", "an", "zebra"]


def _random_questions(rng, n):
    out = []
    for _ in range(n):
        k = rng.randint(1, 18)
        out.append(" ".join(rng.choice(_WORDS) for _ in range(k)))
    return out


class TestTokenizerOracle:
    def test_vocab_insertion_order_matches_reference(self, ref_mods):
        from mcan_vqa_tpu.data import text
        ref_du, _ = ref_mods
        rng = random.Random(1234)
        questions = _random_questions(rng, 200)
        ref_tok, _ = ref_du.tokenize(
            [{"question": q} for q in questions], use_glove=False)
        tok, _ = text.build_vocab(questions)
        assert tok == ref_tok  # same tokens AND same indices

    def test_question_encodings_match_reference(self, ref_mods):
        from mcan_vqa_tpu.data import text
        ref_du, _ = ref_mods
        rng = random.Random(777)
        corpus = _random_questions(rng, 120)
        tok, _ = text.build_vocab(corpus)
        # encode a DIFFERENT sample so UNK paths trigger, plus long ones
        # so truncation triggers (max_token=14, reference default)
        queries = _random_questions(rng, 150) + [
            " ".join(rng.choice(_WORDS) for _ in range(30))]
        for q in queries:
            ref_ix = ref_du.proc_ques({"question": q}, tok, max_token=14)
            ours = text.encode_question(q, tok, max_token=14)
            np.testing.assert_array_equal(ours, ref_ix.astype(np.int32),
                                          err_msg=repr(q))

    def test_soft_scores_match_reference_proc_ans(self, ref_mods):
        """Random 10-annotator sets -> identical soft-target vectors
        (reference: data_utils.proc_ans + get_score)."""
        from mcan_vqa_tpu.data import answers
        ref_du, _ = ref_mods
        rng = random.Random(31337)
        pool = ["yes", "no", "2", "two", "don't know", "cat", "the cat",
                "red", "1,000", "u.s.", "left", "blue", "none", "0"]
        # answer dict over the NORMALIZED forms, like the frozen dict
        from mcan_vqa_tpu.data.answers import prep_ans
        ans_to_ix = {}
        for a in pool:
            ans_to_ix.setdefault(prep_ans(a), len(ans_to_ix))
        for _ in range(100):
            ten = [{"answer": rng.choice(pool)} for _ in range(10)]
            ref_vec = ref_du.proc_ans({"answers": ten}, ans_to_ix)
            ours = answers.soft_scores(ten, ans_to_ix)
            np.testing.assert_array_equal(ours, ref_vec)

    def test_pad_img_feat_matches_reference(self, ref_mods):
        from mcan_vqa_tpu.data import features
        ref_du, _ = ref_mods
        rng = np.random.default_rng(55)
        for rows in (0, 1, 7, 60, 61, 100):
            feat = rng.standard_normal((rows, 16)).astype(np.float32)
            ref_out = ref_du.pad_img_feat(feat, 60)
            ours = features.pad_img_feat(feat, 60)
            np.testing.assert_array_equal(ours, ref_out)
            assert ours.dtype == ref_out.dtype

    def test_prep_ans_matches_reference(self, ref_mods):
        from mcan_vqa_tpu.data import answers
        _, ref_ans = ref_mods
        rng = random.Random(4242)
        fixed = ["don't know", "1,000", "u.s.", "the cat", "an apple",
                 "t-shirt", "yes!", "  spaced  ", "one hundred", "100%",
                 "semi-colon;", "shouldnt've", "won't", "It's A Cat",
                 "two", "none", ">100", "left side", "a", "the", ""]
        randoms = []
        alphabet = string.ascii_lowercase + " .,'!?\"()*#:;-/" + "0123456789"
        for _ in range(300):
            n = rng.randint(1, 24)
            randoms.append("".join(rng.choice(alphabet) for _ in range(n)))
        for a in fixed + randoms:
            assert answers.prep_ans(a) == ref_ans.prep_ans(a), repr(a)
