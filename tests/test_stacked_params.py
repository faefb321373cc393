"""Stacked-native train parameter layout (ops/stacked_params.py):
round-trip exactness, forward/grad parity of the stacked fused engine
vs the standard-tree fused engine, and AdamW-step equivalence (the
optimizer over ~54 stacked leaves must produce the same trajectory as
over the ~260 standard leaves — elementwise arithmetic, same values)."""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from mcan_vqa_tpu.configs import Config
from mcan_vqa_tpu.models.net import build_mcan
from mcan_vqa_tpu.ops import stacked_params as sp
from mcan_vqa_tpu.train.fused_engine import make_fused_train_forward
from mcan_vqa_tpu.train.train_state import TrainState

L = 2


@pytest.fixture(scope="module")
def setup():
    cfg = Config(hidden_size=64, layer=L, multi_head=4, flat_mlp_size=32,
                 flat_out_size=64, img_feat_size=48, img_feat_pad_size=12,
                 max_token=6, compute_dtype="float32",
                 use_glove=False).finalize()
    model = build_mcan(cfg, token_size=50, answer_size=17)
    rng = np.random.default_rng(0)
    B = 4
    img = rng.normal(size=(B, 12, 48)).astype(np.float32)
    img[0, -3:] = 0.0
    ques = rng.integers(1, 50, size=(B, cfg.max_token)).astype(np.int32)
    ques[1, -2:] = 0
    params = model.init({"params": jax.random.PRNGKey(2)},
                        img, ques)["params"]
    target = (rng.random((B, 17)) < 0.2).astype(np.float32)
    return cfg, params, img, ques, target


def _trees_equal(a, b):
    la, ta = jax.tree_util.tree_flatten(a)
    lb, tb = jax.tree_util.tree_flatten(b)
    assert ta == tb
    for x, y in zip(la, lb):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))


class TestRelayout:
    def test_roundtrip_bitwise(self, setup):
        _, params, *_ = setup
        st = sp.to_stacked(params, L)
        assert sp.is_stacked(st) and not sp.is_stacked(params)
        back = sp.from_stacked(st)
        _trees_equal(back, params)

    def test_leaf_count_collapse(self, setup):
        """The point of the layout: an order-of-magnitude fewer
        optimizer leaves at 6 layers (here 2 layers, same ratio)."""
        _, params, *_ = setup
        n_std = len(jax.tree_util.tree_leaves(params))
        n_stk = len(jax.tree_util.tree_leaves(sp.to_stacked(params, L)))
        assert n_stk < n_std - 10 * L   # >=10 leaves saved per layer pair

    def test_opt_state_roundtrip(self, setup):
        cfg, params, *_ = setup
        tx = optax.chain(optax.clip_by_global_norm(1.0),
                         optax.adamw(1e-3))
        state = TrainState.create(params, tx, seed=0)
        st = sp.to_stacked_state(state, L)
        back = sp.from_stacked_state(st)
        _trees_equal(back.params, state.params)
        _trees_equal(back.opt_state, state.opt_state)


@pytest.mark.parametrize("fused_encoder", [False, True])
def test_forward_and_grad_parity(setup, fused_encoder):
    """Stacked fused forward == standard fused forward (same rng, live
    dropout, interpret kernels), and grads agree after relayout."""
    from mcan_vqa_tpu.train.step import bce_with_logits_sum
    cfg, params, img, ques, target = setup
    kw = dict(dropout_rate=0.1, group=2, interpret=True,
              fused_encoder=fused_encoder, encoder_group=2)
    fwd_std = make_fused_train_forward(L, cfg.multi_head, **kw)
    fwd_stk = make_fused_train_forward(L, cfg.multi_head, stacked=True,
                                       **kw)
    rng = jax.random.PRNGKey(3)
    st_params = sp.to_stacked(params, L)

    def loss_std(p):
        return bce_with_logits_sum(fwd_std(p, img, ques, rng), target)

    def loss_stk(p):
        return bce_with_logits_sum(fwd_stk(p, img, ques, rng), target)

    l1 = fwd_std(params, img, ques, rng)
    l2 = fwd_stk(st_params, img, ques, rng)
    np.testing.assert_allclose(np.asarray(l1), np.asarray(l2),
                               rtol=0, atol=1e-5)

    g_std = jax.grad(loss_std)(params)
    g_stk = sp.from_stacked(jax.grad(loss_stk)(st_params))
    ls, ts = jax.tree_util.tree_flatten(g_std)
    lk, tk = jax.tree_util.tree_flatten(g_stk)
    assert ts == tk
    for a, b in zip(ls, lk):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-4)


def test_trainer_stacked_on_end_to_end(tmp_path):
    """stacked_params="on" through the Trainer: the step trains in the
    stacked layout while every boundary (per-epoch checkpoint, eval,
    returned state, calibration side file) sees the standard tree —
    and a fresh standard-layout Trainer resumes the saved checkpoint."""
    from mcan_vqa_tpu.data.vqa_dataset import SyntheticVQADataset
    from mcan_vqa_tpu.train import checkpoint as ckpt_mod
    from mcan_vqa_tpu.train.trainer import Trainer
    cfg = Config(hidden_size=32, layer=1, multi_head=4, img_feat_size=16,
                 img_feat_pad_size=8, max_token=6, flat_out_size=32,
                 flat_mlp_size=16, batch_size=8, max_epoch=1,
                 num_workers=0, compute_dtype="float32", use_glove=False,
                 train_engine="fused", eval_engine="fused",
                 stacked_params="on", verbose=False,
                 ckpts_dir=str(tmp_path / "ckpts"),
                 log_path=str(tmp_path / "log"),
                 result_path=str(tmp_path / "results")).finalize()
    ds = SyntheticVQADataset(cfg, size=16, token_size=50, answer_size=16,
                             run_mode="train")
    tr = Trainer(cfg, train_dataset=ds)
    state = tr.train()
    assert tr._stacked
    # returned state and trainer.state are back in the standard layout
    assert "backbone" in state.params
    assert "backbone_stacked" not in state.params
    preds = tr.predict(ds)
    assert np.isfinite(preds["probs"]).all()
    # the on-disk checkpoint is standard: a stacked_params="off" Trainer
    # resumes it directly
    cfg2 = Config(**{**cfg.to_dict(), "stacked_params": "off",
                     "resume": True, "ckpt_version": cfg.version,
                     "ckpt_epoch": 1, "max_epoch": 2}).finalize()
    tr2 = Trainer(cfg2, train_dataset=ds)
    state2 = tr2.train()
    assert int(state2.step) >= int(state.step)


def test_adamw_step_equivalence(setup):
    """One full AdamW step over the stacked layout == the same step over
    the standard tree (elementwise optimizer: layout cannot change the
    trajectory). Uses identical grads (relayout of the same tree)."""
    cfg, params, img, ques, target = setup
    from mcan_vqa_tpu.train.step import bce_with_logits_sum
    fwd = make_fused_train_forward(L, cfg.multi_head, dropout_rate=0.0,
                                   group=2, interpret=True)
    fwd_stk = make_fused_train_forward(L, cfg.multi_head, dropout_rate=0.0,
                                       group=2, interpret=True,
                                       stacked=True)
    rng = jax.random.PRNGKey(4)
    tx = optax.adamw(1e-3, weight_decay=1e-4)

    def run(p0, forward):
        st = TrainState.create(p0, tx, seed=0)

        def loss(p):
            return bce_with_logits_sum(forward(p, img, ques, rng), target)

        for _ in range(2):
            g = jax.grad(loss)(st.params)
            up, opt_state = tx.update(g, st.opt_state, st.params)
            st = st.replace(params=optax.apply_updates(st.params, up),
                            opt_state=opt_state, step=st.step + 1)
        return st

    st_std = run(params, fwd)
    st_stk = run(sp.to_stacked(params, L), fwd_stk)
    back = sp.from_stacked(st_stk.params)
    ls = jax.tree_util.tree_leaves(st_std.params)
    lk = jax.tree_util.tree_leaves(back)
    for a, b in zip(ls, lk):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-5)
