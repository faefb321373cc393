"""Offline train-data filter: cap examples per answer class.

Behavioral equivalent of the reference's balancing script
(reference: core/data/filter_train_data.py:19-89): walk the QA list, keep at
most ``cap`` examples per answer label, dump the kept indices to a pickle
that training can load to subset the QA list.
"""

from __future__ import annotations

import pickle
from typing import Dict, List, Sequence


def filter_indices_by_answer_cap(
    qa_list: Sequence[dict], cap: int = 1500, seed: int = 0
) -> List[int]:
    """Indices of examples kept after capping each answer label at ``cap``.

    Multi-label examples count toward (and are gated by) their rarest label,
    so rare classes are never starved by caps on frequent co-labels.
    """
    import numpy as np

    counts: Dict[int, int] = {}
    order = np.random.default_rng(seed).permutation(len(qa_list))
    kept = []
    for idx in order:
        labels = qa_list[int(idx)]["answer"]["labels"]
        if not labels:
            continue
        rarest = min(labels, key=lambda l: counts.get(l, 0))
        if counts.get(rarest, 0) >= cap:
            continue
        kept.append(int(idx))
        for l in labels:
            counts[l] = counts.get(l, 0) + 1
    return sorted(kept)


def dump_filtered_indices(qa_list: Sequence[dict], path: str,
                          cap: int = 1500, seed: int = 0) -> List[int]:
    kept = filter_indices_by_answer_cap(qa_list, cap=cap, seed=seed)
    with open(path, "wb") as f:
        pickle.dump(kept, f)
    return kept


def load_filtered_indices(path: str) -> List[int]:
    with open(path, "rb") as f:
        return pickle.load(f)
