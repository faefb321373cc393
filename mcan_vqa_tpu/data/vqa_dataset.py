"""VQA-v2 dataset: question/annotation loading, vocab, feature access.

Covers the reference's CustomDataset semantics
(reference: core/data/load_data.py:21-154):
  * split lists 'train+val+vg' etc.; train sizes by annotations, eval by
    questions
  * vocabulary built over train+val+test+VG question union (insertion order)
  * frozen published answer dict (3129 answers)
  * features from per-image .npz (optionally preloaded to RAM)

TPU-first additions: vocab cached to disk (no spaCy at train time), features
served from the packed fp16 memmap cache when present (built once via
``PackedFeatureCache.build``), and a fully synthetic in-memory variant for
tests/smoke runs.
"""

from __future__ import annotations

import json
import os
from typing import Dict, List, Optional, Tuple

import numpy as np

from mcan_vqa_tpu.data import answers as ans_mod
from mcan_vqa_tpu.data import features as feat_mod
from mcan_vqa_tpu.data import text as text_mod


class VQADataset:
    def __init__(self, cfg, run_mode: Optional[str] = None):
        self.cfg = cfg
        self.run_mode = run_mode or cfg.run_mode
        split_key = "train" if self.run_mode == "train" else self.run_mode
        split_map = {"train": cfg.train_split, "val": "val", "test": "test",
                     "visualize": "val"}
        self.split_list = [s for s in split_map[split_key].split("+")]

        # ---- questions / annotations ----
        self.ques_list: List[dict] = []
        self.ans_list: List[dict] = []
        for split in self.split_list:
            self.ques_list += self._load_json(cfg.question_path[split])["questions"]
            if split in cfg.answer_path and os.path.exists(cfg.answer_path[split]):
                self.ans_list += self._load_json(cfg.answer_path[split])["annotations"]

        self.qid_to_ques = {str(q["question_id"]): q for q in self.ques_list}

        # train indexes by annotation, eval by question
        # (reference: core/data/load_data.py:58-61)
        self.data_size = (len(self.ans_list) if self.run_mode == "train"
                          else len(self.ques_list))

        # ---- vocabulary (cached; stat corpus = all four question files) ----
        self.token_to_ix, self.pretrained_emb = self._build_or_load_vocab()
        self.token_size = len(self.token_to_ix)

        # ---- answer dict ----
        self.ans_to_ix, self.ix_to_ans = ans_mod.load_answer_dict()
        self.ans_size = len(self.ans_to_ix)

        # ---- features ----
        self._packed: Dict[str, feat_mod.PackedFeatureCache] = {}
        self._npz_paths: Dict[str, str] = {}
        self._preloaded: Dict[str, np.ndarray] = {}
        for split in self.split_list:
            if split not in cfg.img_feat_path:
                continue
            cache_dir = os.path.join(cfg.feature_cache_path, split)
            if os.path.exists(os.path.join(cache_dir, "index.json")):
                self._packed[split] = feat_mod.PackedFeatureCache(cache_dir)
            elif os.path.isdir(cfg.img_feat_path[split]):
                self._npz_paths.update(
                    feat_mod.glob_feature_paths(cfg.img_feat_path[split]))
        if cfg.preload and self._npz_paths:
            for iid, p in self._npz_paths.items():
                self._preloaded[iid] = feat_mod.load_npz_feature(p)

    @staticmethod
    def _load_json(path: str) -> dict:
        with open(path) as f:
            return json.load(f)

    def _build_or_load_vocab(self) -> Tuple[Dict[str, int], np.ndarray]:
        cache = self.cfg.vocab_cache_path
        # fingerprint of what a cached vocab was built from: which
        # question files existed, and whether real GloVe vectors backed
        # the embeddings — width alone cannot tell a stale cache (built
        # before val/test/vg JSONs arrived, or on a host without spaCy)
        # from a fresh one, and a silently reused stale vocab scrambles
        # token indices vs reference-built checkpoints
        sources = [key for key in ("train", "val", "test", "vg")
                   if self.cfg.question_path.get(key)
                   and os.path.exists(self.cfg.question_path[key])]
        want_glove = bool(self.cfg.use_glove)
        if cache and os.path.exists(text_mod.vocab_cache_file(cache)):
            tok, emb = text_mod.load_vocab(cache)
            meta = text_mod.load_vocab_meta(cache)
            fresh = emb.shape[1] == self.cfg.word_embed_size
            if fresh and meta is not None:
                fresh = meta.get("sources") == sources
                if fresh and want_glove and not meta.get("glove", False):
                    # cache carries fallback embeddings; rebuild only if
                    # spaCy is importable NOW (otherwise the rebuild
                    # would produce the same fallback every run)
                    import importlib.util
                    fresh = importlib.util.find_spec("spacy") is None
            if fresh:
                return tok, emb
            # stale cache (width/sources/embedding provenance): rebuild
        stat_qs = []
        for key in sources:
            stat_qs += [q["question"] for q in self._load_json(
                self.cfg.question_path[key])["questions"]]
        if not stat_qs:
            stat_qs = [q["question"] for q in self.ques_list]
        lookup = text_mod.spacy_glove_lookup() if want_glove else None
        tok, emb = text_mod.build_vocab(stat_qs, glove_lookup=lookup,
                                        embed_dim=self.cfg.word_embed_size)
        if cache:
            os.makedirs(os.path.dirname(cache) or ".", exist_ok=True)
            text_mod.save_vocab(cache, tok, emb,
                                meta={"sources": sources,
                                      "glove": lookup is not None})
        return tok, emb

    # ------------------------------------------------------------------
    def image_feature(self, image_id) -> np.ndarray:
        iid = str(image_id)
        # preload holds only npz-sourced images; a mixed setup (one split
        # packed, another preloaded from npz) must fall through to the
        # packed caches rather than KeyError on a packed-only id
        feat = self._preloaded.get(iid)
        if feat is None:
            for cache in self._packed.values():
                if iid in cache:
                    return cache.get_padded(iid, self.cfg.img_feat_pad_size)
            feat = feat_mod.load_npz_feature(self._npz_paths[iid])
        return feat_mod.pad_img_feat(feat, self.cfg.img_feat_pad_size)

    def example(self, idx: int) -> Dict[str, np.ndarray]:
        """One example; train mode includes the soft-score target
        (reference: core/data/load_data.py:99-150)."""
        if self.run_mode == "train":
            ann = self.ans_list[idx]
            ques = self.qid_to_ques[str(ann["question_id"])]
            return {
                "img": self.image_feature(ann["image_id"]).astype(np.float32),
                "ques": text_mod.encode_question(
                    ques["question"], self.token_to_ix, self.cfg.max_token),
                "target": ans_mod.soft_scores(ann["answers"], self.ans_to_ix),
                "qid": np.int64(ann["question_id"]),
            }
        ques = self.ques_list[idx]
        return {
            "img": self.image_feature(ques["image_id"]).astype(np.float32),
            "ques": text_mod.encode_question(
                ques["question"], self.token_to_ix, self.cfg.max_token),
            "qid": np.int64(ques["question_id"]),
        }

    def __len__(self) -> int:
        return self.data_size

    def bboxes(self, idx: int):
        """Region boxes [R, 4] for visualization (None when unavailable)."""
        rec = (self.ans_list[idx] if self.run_mode == "train"
               else self.ques_list[idx])
        iid = str(rec["image_id"])
        for cache in self._packed.values():
            if iid in cache:
                return cache.get_bboxes(iid, self.cfg.img_feat_pad_size)
        path = self._npz_paths.get(iid)
        if path:
            with np.load(path) as z:
                if "bbox" in z.files:
                    return feat_mod.pad_img_feat(
                        z["bbox"][:, :4].astype(np.float32),
                        self.cfg.img_feat_pad_size)
        return None

    def question_tokens(self, idx: int):
        rec = (self.ans_list[idx] if self.run_mode == "train"
               else self.ques_list[idx])
        if self.run_mode == "train":
            rec = self.qid_to_ques[str(rec["question_id"])]
        return text_mod.clean_question(rec["question"])

    def image_id(self, idx: int):
        """COCO image id for example ``idx`` (visualization resolves the
        original photograph from it — reference: core/exec.py:323)."""
        rec = (self.ans_list[idx] if self.run_mode == "train"
               else self.ques_list[idx])
        return rec["image_id"]

    def batch_examples(self, indices,
                       feat_dtype=None) -> Dict[str, np.ndarray]:
        """Whole-batch assembly. When every image is served by one packed
        cache, features come from a single native C++ gather+pad call
        (mcan_vqa_tpu/native/batcher.cpp); text/targets are cheap host work.
        feat_dtype="bfloat16" emits half-width features straight from the
        native batcher (serving path; matmuls are bf16 anyway).
        """
        records = []
        for i in indices:
            i = int(i)
            if self.run_mode == "train":
                ann = self.ans_list[i]
                records.append((ann["image_id"],
                                self.qid_to_ques[str(ann["question_id"])],
                                ann))
            else:
                q = self.ques_list[i]
                records.append((q["image_id"], q, None))

        img = None
        if len(self._packed) == 1 and not self._preloaded:
            cache = next(iter(self._packed.values()))
            iids = [str(r[0]) for r in records]
            if all(iid in cache for iid in iids):
                img = cache.gather_pad_batch(iids, self.cfg.img_feat_pad_size,
                                             dtype=feat_dtype or np.float32)
        if img is None:
            img = np.stack([self.image_feature(r[0]).astype(np.float32)
                            for r in records])
            # same dtype normalization as gather_pad_batch: a dtype
            # OBJECT (ml_dtypes.bfloat16) must downcast here too, or a
            # cache miss flips the batch dtype and forces a fresh jit
            bf16 = feat_dtype is not None and str(
                np.dtype(feat_dtype) if not isinstance(feat_dtype, str)
                else feat_dtype) in ("bfloat16",)
            if bf16:
                import ml_dtypes
                img = img.astype(ml_dtypes.bfloat16)

        batch = {
            "img": img,
            "ques": np.stack([text_mod.encode_question(
                r[1]["question"], self.token_to_ix, self.cfg.max_token)
                for r in records]),
            "qid": np.asarray([r[1]["question_id"] for r in records],
                              np.int64),
        }
        if self.run_mode == "train":
            batch["target"] = np.stack(
                [ans_mod.soft_scores(r[2]["answers"], self.ans_to_ix)
                 for r in records])
        return batch


class SyntheticVQADataset:
    """Deterministic in-memory dataset with the VQADataset interface, for
    tests, smoke runs, and benchmarking without the 60GB feature dump."""

    def __init__(self, cfg, size: int = 256, token_size: int = 200,
                 answer_size: int = 64, seed: int = 0,
                 run_mode: Optional[str] = None):
        self.cfg = cfg
        self.run_mode = run_mode or cfg.run_mode
        self.data_size = size
        self.token_size = token_size
        self.ans_size = answer_size
        self.token_to_ix = {"PAD": 0, "UNK": 1}
        self.ans_to_ix = {str(i): i for i in range(answer_size)}
        self.ix_to_ans = {str(i): str(i) for i in range(answer_size)}
        self.pretrained_emb = np.random.default_rng(seed).normal(
            0, 1, (token_size, cfg.word_embed_size)).astype(np.float32)
        self._rng_seed = seed

    def example(self, idx: int) -> Dict[str, np.ndarray]:
        rng = np.random.default_rng(self._rng_seed * 100003 + idx)
        R, F = self.cfg.img_feat_pad_size, self.cfg.img_feat_size
        img = rng.normal(size=(R, F)).astype(np.float32)
        img[rng.integers(max(1, R // 2), R + 1):] = 0.0
        ques = np.zeros(self.cfg.max_token, np.int32)
        n = rng.integers(3, self.cfg.max_token + 1)
        ques[:n] = rng.integers(1, self.token_size, n)
        out = {"img": img, "ques": ques, "qid": np.int64(idx)}
        if self.run_mode == "train":
            # learnable signal: target class tied to the first token
            target = np.zeros(self.ans_size, np.float32)
            target[int(ques[0]) % self.ans_size] = 1.0
            out["target"] = target
        return out

    def image_id(self, idx: int):
        return idx

    def __len__(self) -> int:
        return self.data_size
