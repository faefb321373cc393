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
