"""Unit tests for the pure data functions (tokenize / answers / padding).

These pin the dataset semantics; expected values are hand-computed from the
reference behavioral spec (reference: core/data/data_utils.py, ans_punct.py).
"""

import numpy as np
import pytest

from mcan_vqa_tpu.data import answers, features, text


class TestCleanQuestion:
    def test_punct_strip_and_compound_split(self):
        assert text.clean_question("What's the man-dog doing, here?") == [
            "whats", "the", "man", "dog", "doing", "here"]

    def test_slash_split(self):
        assert text.clean_question("red/blue car") == ["red", "blue", "car"]

    def test_all_listed_punct_removed(self):
        assert text.clean_question('a."b,(c)!?*#:;\'d') == ["abcd"]


class TestVocab:
    def test_pad_unk_first_and_insertion_order(self):
        tok, emb = text.build_vocab(["what is this", "is that a cat"])
        assert tok["PAD"] == 0 and tok["UNK"] == 1
        assert tok["what"] == 2 and tok["is"] == 3 and tok["this"] == 4
        assert tok["that"] == 5 and tok["a"] == 6 and tok["cat"] == 7
        assert emb.shape == (8, 300) and emb.dtype == np.float32

    def test_encode_known_unknown_pad(self):
        tok, _ = text.build_vocab(["what is this"])
        ix = text.encode_question("what is zebra", tok, max_token=5)
        assert ix.tolist() == [tok["what"], tok["is"], text.UNK_IX, 0, 0]
        assert ix.dtype == np.int32

    def test_encode_truncates(self):
        tok, _ = text.build_vocab(["a b c d e f"])
        ix = text.encode_question("a b c d e f", tok, max_token=3)
        assert (ix != 0).all() and ix.shape == (3,)

    def test_vocab_cache_roundtrip(self, tmp_path):
        tok, emb = text.build_vocab(["what is this"])
        p = str(tmp_path / "vocab.npz")
        text.save_vocab(p, tok, emb)
        tok2, emb2 = text.load_vocab(p)
        assert tok2 == tok
        np.testing.assert_allclose(emb2, emb)


class TestAnswerNormalization:
    def test_digit_map(self):
        assert answers.prep_ans("two") == "2"
        assert answers.prep_ans("none") == "0"

    def test_article_strip(self):
        assert answers.prep_ans("a cat") == "cat"
        assert answers.prep_ans("the red car") == "red car"

    def test_contraction(self):
        assert answers.prep_ans("dont") == "don't"

    def test_punct_spacing_rule(self):
        # punct adjacent to space is removed entirely
        assert answers.process_punctuation("yes ;no") == "yes no"
        # embedded punct becomes a space
        assert answers.process_punctuation("yes;no") == "yes no"

    def test_period_strip(self):
        assert answers.prep_ans("u.s.") == "us"


class TestSoftScores:
    def test_annotator_score_table(self):
        assert [answers.annotator_score(i) for i in range(5)] == [
            0.0, 0.3, 0.6, 0.9, 1.0]

    def test_soft_scores_vector(self):
        ans_to_ix = {"yes": 0, "no": 1, "2": 2}
        anns = [{"answer": "yes"}] * 3 + [{"answer": "no"}] * 1 + \
               [{"answer": "two"}] * 6
        t = answers.soft_scores(anns, ans_to_ix)
        np.testing.assert_allclose(t, [0.9, 0.3, 1.0])

    def test_unknown_answers_ignored(self):
        t = answers.soft_scores([{"answer": "zebra"}] * 10, {"yes": 0})
        np.testing.assert_allclose(t, [0.0])

    def test_multi_hot(self):
        t = answers.multi_hot([0, 3], 5)
        np.testing.assert_allclose(t, [1, 0, 0, 1, 0])

    def test_topk_answers_order_and_names(self):
        row = np.array([0.1, 0.9, 0.3, 0.7], np.float32)
        i2a = {"0": "a", "1": "b", "2": "c", "3": "d"}
        assert answers.topk_answers(row, i2a, 3) == [
            ("b", pytest.approx(0.9)), ("d", pytest.approx(0.7)),
            ("c", pytest.approx(0.3))]
        # k=1 uses argmax (evaluator tie-breaking); int-keyed dicts work
        assert answers.topk_answers(row, {1: "b"}, 1) == [
            ("b", pytest.approx(0.9))]
        # k clamps to the row width; unknown ix falls back to the index
        full = answers.topk_answers(row, {"1": "b"}, 99)
        assert len(full) == 4 and full[-1] == ("0", pytest.approx(0.1))


class TestFrozenAnswerDict:
    def test_loads_3129(self):
        ans_to_ix, ix_to_ans = answers.load_answer_dict()
        assert len(ans_to_ix) == 3129 and len(ix_to_ans) == 3129
        assert ans_to_ix["net"] == 0
        assert ix_to_ans["0"] == "net"

    def test_builder_min_freq(self):
        anns = ([{"multiple_choice_answer": "yes"}] * 10 +
                [{"multiple_choice_answer": "rare"}] * 8)
        a2i, i2a = answers.build_answer_dict(anns, min_freq=8)
        assert a2i == {"yes": 0} and i2a == {"0": "yes"}


class TestFeatures:
    def test_pad_truncate(self):
        x = np.ones((70, 8), np.float32)
        y = features.pad_img_feat(x, 60)
        assert y.shape == (60, 8) and (y == 1).all()

    def test_pad_zero_fill(self):
        x = np.ones((10, 8), np.float32)
        y = features.pad_img_feat(x, 60)
        assert y.shape == (60, 8)
        assert (y[:10] == 1).all() and (y[10:] == 0).all()

    def test_iid_from_path(self):
        p = "/x/coco_extract/train2014/COCO_train2014_000000000009.jpg.npz"
        assert features.iid_from_path(p) == "9"

    def test_packed_cache_roundtrip(self, tmp_path):
        # write fake npz files in BUTD layout ('x': [2048?, n] transposed)
        d = tmp_path / "npz"; d.mkdir()
        rng = np.random.default_rng(0)
        raw = {}
        for iid in (9, 25):
            feat = rng.normal(size=(16, 5 + iid % 3)).astype(np.float32)
            np.savez(d / f"COCO_train2014_{iid:012d}.jpg.npz", x=feat)
            raw[str(iid)] = feat.T
        cache = features.PackedFeatureCache.build(
            str(d), str(tmp_path / "cache"), feat_dim=16, log_every=0)
        for iid, feat in raw.items():
            got = cache.get(iid)
            np.testing.assert_allclose(got, feat.astype(np.float16), rtol=1e-3)
            padded = cache.get_padded(iid, 12)
            assert padded.shape == (12, 16)
            assert (padded[feat.shape[0]:] == 0).all()
