"""Visualization score matrices vs the ACTUAL reference calc_mats.

Runs the reference's torch ``calc_mats`` / ``calc_mats_v2``
(core/exec.py:1243-1284, imported from /root/reference with wandb
stubbed) and our numpy re-expressions (utils/visualize.py) on identical
random inputs and asserts every returned matrix agrees: qq, qa,
va_values, va_indices, vv, vq.

Padding is trailing (as in real data): the reference's va_indices index
into the mask-compacted region array, ours are original region ids —
with trailing padding the two coincide, which is the regime the
reference's own plotting relies on.
"""

import os
import sys
import types

import numpy as np
import pytest

REFERENCE = "/root/reference"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(os.path.join(REFERENCE, "core")),
    reason="reference mount not available")


@pytest.fixture(scope="module")
def ref_exec():
    import matplotlib
    matplotlib.use("Agg")
    for missing in ("wandb", "spacy"):
        if missing not in sys.modules:
            sys.modules[missing] = types.ModuleType(missing)
    sys.path.insert(0, REFERENCE)
    try:
        import core.exec as ref_exec  # noqa: PLC0415
        return ref_exec
    finally:
        sys.path.remove(REFERENCE)


def _example(rng, R=14, T=9, D=16, r_valid=10, t_valid=5):
    """One example with TRAILING padding, packaged both ways."""
    v = rng.standard_normal((R, D)).astype(np.float32)
    q = rng.standard_normal((T, D)).astype(np.float32)
    a = rng.standard_normal((D,)).astype(np.float32)
    v_w = rng.random((R, 1)).astype(np.float32)
    q_w = rng.random((T, 1)).astype(np.float32)
    v_mask = np.zeros(R, bool)
    v_mask[r_valid:] = True    # True = padded, reference convention
    q_mask = np.zeros(T, bool)
    q_mask[t_valid:] = True
    out = {
        "v": v[None], "q": q[None], "fused": a[None],
        "v_w": v_w[None], "q_w": q_w[None],
        "v_mask": v_mask[None, None, None], "q_mask": q_mask[None, None, None],
    }
    return v, q, a, v_w, q_w, v_mask, q_mask, out


class TestCalcMatsOracle:
    def test_answer_guided_matches_reference(self, ref_exec):
        import torch
        from mcan_vqa_tpu.utils import visualize
        rng = np.random.default_rng(99)
        for trial in range(20):
            v, q, a, v_w, q_w, v_mask, q_mask, out = _example(
                rng, r_valid=int(rng.integers(8, 15)),
                t_valid=int(rng.integers(2, 10)))
            t = lambda x: torch.from_numpy(np.asarray(x))
            qq, qa, vav, vai, vv, vq = ref_exec.calc_mats(
                t(v), t(v_mask)[None, None], t(v_w), t(q),
                t(q_mask)[None, None], t(q_w), t(a)[None])
            ours = visualize.calc_mats(out, 0)
            np.testing.assert_allclose(ours["qq"], qq.numpy(), atol=1e-5)
            np.testing.assert_allclose(ours["qa"], qa.numpy(), atol=1e-5)
            np.testing.assert_allclose(ours["va_values"], vav.numpy(),
                                       atol=1e-5)
            np.testing.assert_array_equal(ours["va_indices"],
                                          vai.numpy().squeeze(-1))
            np.testing.assert_allclose(ours["vv"], vv.numpy(), atol=1e-5)
            np.testing.assert_allclose(ours["vq"], vq.numpy(), atol=1e-5)

    def test_attflat_guided_matches_reference(self, ref_exec):
        import torch
        from mcan_vqa_tpu.utils import visualize
        rng = np.random.default_rng(123)
        for trial in range(20):
            v, q, a, v_w, q_w, v_mask, q_mask, out = _example(
                rng, r_valid=int(rng.integers(8, 15)),
                t_valid=int(rng.integers(2, 10)))
            t = lambda x: torch.from_numpy(np.asarray(x))
            qq, qa, vav, vai, vv, vq = ref_exec.calc_mats_v2(
                t(v), t(v_mask)[None, None], t(v_w), t(q),
                t(q_mask)[None, None], t(q_w), t(a)[None])
            ours = visualize.calc_mats_v2(out, 0)
            np.testing.assert_allclose(ours["qq"], qq.numpy(), atol=1e-5)
            np.testing.assert_allclose(ours["qa"], qa.numpy(), atol=1e-5)
            np.testing.assert_allclose(ours["va_values"], vav.numpy(),
                                       atol=1e-5)
            np.testing.assert_array_equal(ours["va_indices"],
                                          vai.numpy().squeeze(-1))
            np.testing.assert_allclose(ours["vv"], vv.numpy(), atol=1e-5)
            np.testing.assert_allclose(ours["vq"], vq.numpy(), atol=1e-5)
