"""Host-side request preparation shared by live serving (api.Predictor)
and frozen-artifact serving (artifact.ArtifactPredictor).

One implementation of tokenize + ragged-feature padding + bucket padding:
the artifact loader promises to mirror the live Predictor exactly, so the
two must not each carry a copy that can drift (feature-width validation,
dtype handling, truncation policy all live here once).
"""

from __future__ import annotations

from typing import Dict, Sequence, Tuple

import numpy as np

from mcan_vqa_tpu.data import features as feat_mod
from mcan_vqa_tpu.data import text as text_mod


def prep_request_inputs(questions: Sequence[str], image_features,
                        token_to_ix: Dict[str, int], max_token: int,
                        pad_size: int) -> Tuple[np.ndarray, np.ndarray]:
    """Tokenize + pad each per-image [R_i, F] feature block to the
    model's region count. Returns (ques [N, T] int32, img [N, R, F] f32)."""
    ques = text_mod.encode_questions(questions, token_to_ix, max_token)
    img = np.stack([feat_mod.pad_img_feat(
        np.asarray(f, np.float32), pad_size) for f in image_features])
    return ques, img


def pad_to_bucket(img: np.ndarray, ques: np.ndarray,
                  target: int) -> Tuple[np.ndarray, np.ndarray]:
    """Zero-pad a prepared batch up to the compiled bucket size."""
    n = img.shape[0]
    if n < target:
        pad = target - n
        img = np.concatenate([img, np.zeros((pad,) + img.shape[1:],
                                            np.float32)])
        ques = np.concatenate([ques, np.zeros((pad,) + ques.shape[1:],
                                              np.int32)])
    return img, ques
