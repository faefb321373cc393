"""ROC-AUC for multi-label evaluation (MIMIC VQA / classifier flows).

The reference computes per-class, micro and macro ROC-AUC with sklearn at
eval time (reference: core/exec.py:399-408, 745-754, 1054-1064). Implemented
here natively in numpy (rank-statistic / Mann-Whitney form, with proper tie
handling) so the TPU eval path has no sklearn dependency; sklearn remains the
test oracle.
"""

from __future__ import annotations

from typing import Dict

import numpy as np


def binary_roc_auc(y_true: np.ndarray, y_score: np.ndarray) -> float:
    """AUC via the Mann-Whitney U statistic with midrank tie correction.

    Returns nan when only one class is present (sklearn raises; eval loops
    want a skippable value instead).
    """
    y_true = np.asarray(y_true).astype(bool).ravel()
    y_score = np.asarray(y_score, np.float64).ravel()
    n_pos = int(y_true.sum())
    n_neg = y_true.size - n_pos
    if n_pos == 0 or n_neg == 0:
        return float("nan")
    if np.isnan(y_score).any():
        # argsort ranks NaN highest — a diverged model would report a
        # plausible (even perfect) AUC. sklearn raises here; the eval
        # loop's contract is a skippable value, so return nan loudly.
        return float("nan")
    # vectorized midranks (rankdata "average" formulation): the previous
    # per-element Python loop made a 50k x few-hundred-class micro AUC
    # tens of millions of interpreter iterations per eval epoch
    order = np.argsort(y_score, kind="mergesort")
    ranks = np.empty(y_score.size, np.float64)
    _, inv, counts = np.unique(y_score[order], return_inverse=True,
                               return_counts=True)
    cum = np.cumsum(counts)
    mid = cum - (counts - 1) / 2.0   # average of ranks (cum-count+1)..cum
    ranks[order] = mid[inv]
    rank_sum_pos = ranks[y_true].sum()
    u = rank_sum_pos - n_pos * (n_pos + 1) / 2.0
    return float(u / (n_pos * n_neg))


def multilabel_roc_auc(
    y_true: np.ndarray, y_score: np.ndarray
) -> Dict[str, object]:
    """y_true [N, C] multi-hot, y_score [N, C] probabilities.

    Returns {"per_class": [C floats or nan], "macro": mean over valid
    classes, "micro": AUC over the flattened matrix} — the three variants the
    reference prints (core/exec.py:402-407).
    """
    y_true = np.asarray(y_true)
    y_score = np.asarray(y_score)
    assert y_true.shape == y_score.shape and y_true.ndim == 2
    per_class = [binary_roc_auc(y_true[:, c], y_score[:, c])
                 for c in range(y_true.shape[1])]
    valid = [a for a in per_class if not np.isnan(a)]
    return {
        "per_class": per_class,
        "macro": float(np.mean(valid)) if valid else float("nan"),
        "micro": binary_roc_auc(y_true.ravel(), y_score.ravel()),
    }
