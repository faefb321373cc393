"""MIMIC-CXR medical VQA dataset (HDF5-backed).

Covers the reference's MIMICDatasetBase/Split semantics
(reference: core/data/load_data.py:157-264):
  * HDF5 feature bank: image_features [N, 60, 1024], image_bb [N, 60, 4],
    spatial_features [N, 60, 6]
  * pooled anatomy features [N, 26, 1024] from ana_pool_finding_path
    (load_data.py:175-179) — selectable as the model input or as auxiliary
    rows via cfg.mimic_feat_source ("regions" | "anatomy" | "both"); the
    reference kept this hook dormant (commented swap at load_data.py:250)
  * answer dicts from ans2label/label2ans pickles; multi-hot targets
  * QA pairs from per-split pickles; vocabulary built over the TRAIN
    split's QA for every split (deviation — see __init__)
  * train-time augmentation: L2-normalize each region row, then zero a
    random 30% of the rows (load_data.py:239-247), applied to whichever
    feature source is selected

Deliberately NOT reproduced: the reference concatenates the TEST pickle into
the train split (load_data.py:204-210) — test-set leakage; splits stay
separate here (flagged in SURVEY.md quirks).
"""

from __future__ import annotations

import pickle
from typing import Dict, Optional

import numpy as np

from mcan_vqa_tpu.data import answers as ans_mod
from mcan_vqa_tpu.data import features as feat_mod
from mcan_vqa_tpu.data import text as text_mod

FEATURE_DROPOUT_FRAC = 0.3


def l2_normalize_rows(x: np.ndarray) -> np.ndarray:
    """Row-wise L2 normalization (sklearn.preprocessing.normalize(axis=1)
    semantics: zero rows stay zero)."""
    norms = np.linalg.norm(x, axis=1, keepdims=True)
    return x / np.where(norms == 0, 1.0, norms)


def feature_row_dropout(feat: np.ndarray, rng: np.random.Generator,
                        frac: float = FEATURE_DROPOUT_FRAC) -> np.ndarray:
    """Zero a random ``frac`` of region rows (train augmentation,
    reference: core/data/load_data.py:239-243)."""
    n = feat.shape[0]
    drop = rng.choice(n, size=int(n * frac), replace=False)
    out = feat.copy()
    out[drop] = 0.0
    return out


class MIMICDataset:
    def __init__(self, cfg, run_mode: Optional[str] = None, seed: int = 0,
                 vocab: Optional[tuple] = None):
        """vocab: optional (token_to_ix, pretrained_emb) to share across
        split instances (build the train split first, pass its vocab to
        val/test — one spaCy load and one build instead of three)."""
        self.cfg = cfg
        self.run_mode = run_mode or cfg.run_mode
        # example() runs concurrently in BatchLoader threads; a shared
        # Generator is not thread-safe, so guard it with a lock
        import threading
        self._rng = np.random.default_rng(seed)
        self._rng_lock = threading.Lock()

        import h5py  # lazy: only MIMIC flows need it

        f1 = h5py.File(cfg.cxr_img_feat_path, "r")
        self.image_features = f1["image_features"]
        self.image_bb = f1.get("image_bb")
        self.spatial_features = f1.get("spatial_features")

        # pooled anatomical-finding features (reference opens this bank
        # unconditionally, load_data.py:175-179; here it is optional unless
        # the selected feature source needs it)
        import os
        self.feat_source = getattr(cfg, "mimic_feat_source", "regions")
        assert self.feat_source in ("regions", "anatomy", "both"), \
            self.feat_source
        self.ana_pooled_feats = None
        ana_path = getattr(cfg, "ana_pool_finding_path", "")
        if ana_path and os.path.exists(ana_path):
            self.ana_pooled_feats = h5py.File(ana_path, "r")["image_features"]
        elif self.feat_source != "regions":
            raise FileNotFoundError(
                f"mimic_feat_source={self.feat_source!r} needs "
                f"ana_pool_finding_path, not found: {ana_path!r}")
        if self.feat_source == "both":
            # pad_img_feat TRUNCATES: with the default pad of 60, "both"
            # (60 region + 26 anatomy rows) would silently drop every
            # anatomy row and behave exactly like "regions" while paying
            # the extra HDF5 reads — the pad requirement must be a hard
            # error, not a config-comment footnote
            need = (self.image_features.shape[1]
                    + self.ana_pooled_feats.shape[1])
            assert cfg.img_feat_pad_size >= need, (
                f'mimic_feat_source="both" emits {need} rows per image '
                f"but img_feat_pad_size={cfg.img_feat_pad_size} would "
                f"truncate the anatomy rows away — raise it to >= {need}")

        with open(cfg.mimic_ans_dict_path["ans2idx"], "rb") as f:
            self.ans_to_ix = pickle.load(f)
        with open(cfg.mimic_ans_dict_path["idx2ans"], "rb") as f:
            self.ix_to_ans = pickle.load(f)
        self.ans_size = len(self.ans_to_ix)

        split_key = self.run_mode if self.run_mode in ("train", "val", "test") else "val"
        with open(cfg.mimic_qa_path[split_key], "rb") as f:
            self.qa = pickle.load(f)
        self.data_size = len(self.qa)

        # Vocabulary comes from the TRAIN split for EVERY split
        # (deliberate deviation, like the leakage fix above: the
        # reference tokenizes each split's own QA — load_data.py:216 —
        # so its val/test runs encode questions with a DIFFERENT
        # token->ix mapping than the train vocab the model's embedding
        # rows were built on, a scrambling the reference masks only via
        # the test-into-train concat it also does). One shared train
        # vocab keeps ix->embedding consistent across train/eval and
        # checkpoint reload.
        if vocab is not None:
            self.token_to_ix, self.pretrained_emb = vocab
        else:
            if split_key == "train":
                vocab_qa = self.qa
            else:
                with open(cfg.mimic_qa_path["train"], "rb") as f:
                    vocab_qa = pickle.load(f)
            self.token_to_ix, self.pretrained_emb = text_mod.build_vocab(
                [q["question"] for q in vocab_qa],
                glove_lookup=(text_mod.spacy_glove_lookup()
                              if cfg.use_glove else None),
                embed_dim=cfg.word_embed_size)
        self.token_size = len(self.token_to_ix)

    def anatomy_features(self, image_id: int) -> np.ndarray:
        """The [26, feat] pooled anatomical-finding rows for one image."""
        if self.ana_pooled_feats is None:
            raise FileNotFoundError("ana_pool_finding_path not loaded")
        return np.asarray(self.ana_pooled_feats[image_id], np.float32)

    def _raw_features(self, image_id: int) -> np.ndarray:
        if self.feat_source == "regions":
            return np.asarray(self.image_features[image_id], np.float32)
        if self.feat_source == "anatomy":
            return self.anatomy_features(image_id)
        return np.concatenate(
            [np.asarray(self.image_features[image_id], np.float32),
             self.anatomy_features(image_id)], axis=0)

    def example(self, idx: int) -> Dict[str, np.ndarray]:
        qa = self.qa[idx]
        ques = text_mod.encode_question(
            qa["question"], self.token_to_ix, self.cfg.max_token)
        target = ans_mod.multi_hot(qa["answer"]["labels"], self.ans_size)

        feat = self._raw_features(qa["image"])
        if self.run_mode == "train":
            with self._rng_lock:
                child = np.random.default_rng(self._rng.integers(2**63))
            feat = feature_row_dropout(l2_normalize_rows(feat), child)
        img = feat_mod.pad_img_feat(feat, self.cfg.img_feat_pad_size)
        return {"img": img.astype(np.float32), "ques": ques,
                "target": target, "qid": np.int64(idx)}

    def __len__(self) -> int:
        return self.data_size


class SyntheticMIMICDataset:
    """In-memory stand-in with the MIMICDataset interface (15 labels)."""

    def __init__(self, cfg, size: int = 128, answer_size: int = 15,
                 token_size: int = 120, seed: int = 0,
                 run_mode: Optional[str] = None):
        self.cfg = cfg
        self.run_mode = run_mode or cfg.run_mode
        self.data_size = size
        self.ans_size = answer_size
        self.token_size = token_size
        self.token_to_ix = {"PAD": 0, "UNK": 1}
        self.ans_to_ix = {f"label{i}": i for i in range(answer_size)}
        self.ix_to_ans = {i: f"label{i}" for i in range(answer_size)}
        self.pretrained_emb = np.random.default_rng(seed).normal(
            0, 1, (token_size, cfg.word_embed_size)).astype(np.float32)
        self._seed = seed

    def example(self, idx: int) -> Dict[str, np.ndarray]:
        rng = np.random.default_rng(self._seed * 7919 + idx)
        R, F = self.cfg.img_feat_pad_size, self.cfg.img_feat_size
        feat = rng.normal(size=(R, F)).astype(np.float32)
        if self.run_mode == "train":
            feat = feature_row_dropout(l2_normalize_rows(feat), rng)
        ques = np.zeros(self.cfg.max_token, np.int32)
        n = rng.integers(3, self.cfg.max_token + 1)
        ques[:n] = rng.integers(1, self.token_size, n)
        target = np.zeros(self.ans_size, np.float32)
        target[rng.integers(0, self.ans_size, 2)] = 1.0
        return {"img": feat, "ques": ques, "target": target,
                "qid": np.int64(idx)}

    def __len__(self) -> int:
        return self.data_size
