"""Attention visualization (reference: core/exec.py:256-350, 1068-1295).

The reference renders box-mask overlays, cross-modal score-matrix heatmaps
(q-q / v-v / v-q), and alpha-weighted question text from Net's returned
attention weights. This rebuild renders from MCANet's output dict:
  * AttFlat weights over question tokens and image regions (bar/heat panels)
  * score matrices computed from the returned q/v features
Box overlays require the original images + bboxes, which the feature dumps
alone do not carry; when a dataset exposes ``bbox(idx)`` the box panel is
drawn in normalized coordinates.
"""

from __future__ import annotations

import os
from typing import Optional

import numpy as np


def _score_matrix(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """Normalized dot-product similarity between two feature sets
    (reference calc_mats: core/exec.py:1243-1284)."""
    an = a / (np.linalg.norm(a, axis=-1, keepdims=True) + 1e-9)
    bn = b / (np.linalg.norm(b, axis=-1, keepdims=True) + 1e-9)
    return an @ bn.T


def visualize_example(
    out: dict,
    index: int,
    save_path: str,
    question_tokens: Optional[list] = None,
    answer: Optional[str] = None,
    bboxes: Optional[np.ndarray] = None,
    top_k: int = 7,
) -> str:
    """Render one example's attention panels to ``save_path`` (PNG).

    out: MCANet output dict (numpy-converted); index: batch row.
    """
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    q = np.asarray(out["q"])[index]
    v = np.asarray(out["v"])[index]
    q_w = np.asarray(out["q_w"])[index, :, 0]
    v_w = np.asarray(out["v_w"])[index, :, 0]
    q_mask = np.asarray(out["q_mask"])[index, 0, 0]
    v_mask = np.asarray(out["v_mask"])[index, 0, 0]
    nq = int((~q_mask).sum())
    nv = int((~v_mask).sum())

    fig, axes = plt.subplots(2, 3, figsize=(15, 8))

    # alpha-weighted question text (reference: core/exec.py:332-344)
    ax = axes[0, 0]
    ax.set_title("question attention")
    ax.axis("off")
    toks = question_tokens or [f"w{i}" for i in range(nq)]
    wmax = q_w[:nq].max() + 1e-9
    for i, tok in enumerate(toks[:nq]):
        alpha = min(1.0, max(0.0, float(0.15 + 0.85 * q_w[i] / wmax)))
        ax.text(0.02 + (i % 5) * 0.2, 0.9 - (i // 5) * 0.18, tok,
                alpha=alpha, fontsize=14)
    if answer:
        ax.text(0.02, 0.05, f"answer: {answer}", fontsize=12, color="tab:red")

    ax = axes[0, 1]
    ax.bar(np.arange(nv), v_w[:nv])
    ax.set_title("region attention (AttFlat)")

    # top-k regions (reference picks top-7 boxes, core/exec.py:300-311)
    ax = axes[0, 2]
    top = np.argsort(v_w[:nv])[::-1][:top_k]
    if bboxes is not None:
        ax.set_title(f"top-{top_k} boxes")
        for r in top:
            x0, y0, x1, y1 = bboxes[r][:4]
            ax.add_patch(plt.Rectangle((x0, y0), x1 - x0, y1 - y0,
                                       fill=False, color="tab:orange"))
        ax.set_xlim(0, max(1.0, float(np.max(bboxes[:, 2]))))
        ax.set_ylim(max(1.0, float(np.max(bboxes[:, 3]))), 0)
    else:
        ax.set_title(f"top-{top_k} region ids")
        ax.bar(range(len(top)), v_w[top])
        ax.set_xticks(range(len(top)), [str(t) for t in top])

    for ax, (m, title) in zip(
            axes[1], [(_score_matrix(q[:nq], q[:nq]), "q-q"),
                      (_score_matrix(v[:nv], v[:nv]), "v-v"),
                      (_score_matrix(v[:nv], q[:nq]), "v-q")]):
        im = ax.imshow(m, cmap="viridis")
        ax.set_title(f"{title} similarity")
        fig.colorbar(im, ax=ax, fraction=0.046)

    os.makedirs(os.path.dirname(save_path) or ".", exist_ok=True)
    fig.tight_layout()
    fig.savefig(save_path, dpi=80)
    plt.close(fig)
    return save_path


def run_visualization(trainer, dataset, out_dir: str, limit: int = 8) -> int:
    """Drive the model over the first ``limit`` examples and render panels
    (reference flow: core/exec.py:256-350)."""
    import jax
    import numpy as np

    state = trainer.ensure_state()
    n = min(limit, len(dataset))
    batch = {k: np.stack([dataset.example(i)[k] for i in range(n)])
             for k in ("img", "ques")}
    out = trainer.model.apply({"params": jax.device_get(state.params)},
                              batch["img"], batch["ques"],
                              deterministic=True)
    out = {k: np.asarray(v) for k, v in out.items()}
    probs = 1 / (1 + np.exp(-out["logits"]))
    for i in range(n):
        ans = None
        if trainer.ix_to_ans:
            ans = trainer.ix_to_ans.get(str(int(probs[i].argmax())))
        bboxes = dataset.bboxes(i) if hasattr(dataset, "bboxes") else None
        toks = (dataset.question_tokens(i)
                if hasattr(dataset, "question_tokens") else None)
        visualize_example(out, i, os.path.join(out_dir, f"example_{i}.png"),
                          question_tokens=toks, answer=ans, bboxes=bboxes)
    return n
