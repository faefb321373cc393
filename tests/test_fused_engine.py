"""Fused training engine (train/fused_engine.py) vs model.apply autodiff.

With dropout off the engine must reproduce the linen model's loss AND its
gradients for every parameter (the decoder grads come from the custom-VJP
fused block, everything else from XLA autodiff through the raw-param
helpers). With dropout on it must run, stay finite, and vary with the rng.
Interpret mode; tiny dims.
"""

import jax
import jax.numpy as jnp
import numpy as np

from mcan_vqa_tpu.configs import Config
from mcan_vqa_tpu.models.net import build_mcan
from mcan_vqa_tpu.train.fused_engine import make_fused_train_forward
from mcan_vqa_tpu.train.step import bce_with_logits_sum

B, Lv = 4, 12


def _setup():
    cfg = Config(hidden_size=32, layer=2, multi_head=4, flat_mlp_size=16,
                 flat_out_size=32, img_feat_size=24, img_feat_pad_size=Lv,
                 use_glove=False).finalize()
    model = build_mcan(cfg, token_size=40, answer_size=11)
    k = jax.random.PRNGKey(0)
    img = jax.random.normal(k, (B, Lv, cfg.img_feat_size), jnp.float32)
    # pad rows/tokens to exercise masks
    img = img.at[0, -4:].set(0.0)
    ques = jax.random.randint(jax.random.PRNGKey(1), (B, cfg.max_token),
                              1, 40, jnp.int32)
    ques = ques.at[1, -3:].set(0)
    target = (jax.random.uniform(jax.random.PRNGKey(2), (B, 11)) < 0.2
              ).astype(jnp.float32)
    params = model.init({"params": jax.random.PRNGKey(3)}, img, ques)[
        "params"]
    return cfg, model, params, img, ques, target


import pytest


@pytest.mark.parametrize("fused_encoder,encoder_group",
                         [(False, 0), (True, 0), (True, 16)])
def test_engine_matches_model_grads_no_dropout(fused_encoder,
                                               encoder_group):
    """encoder_group=16 is the shipped Trainer config (trainer.py); at
    B=4 the engine reduces it to the largest divisor (4) the same way
    the TPU path would for a truncated final batch."""
    cfg, model, params, img, ques, target = _setup()
    fwd = make_fused_train_forward(cfg.layer, cfg.multi_head,
                                   dropout_rate=0.0, group=2,
                                   interpret=True,
                                   fused_encoder=fused_encoder,
                                   encoder_group=encoder_group)

    def loss_engine(p):
        return bce_with_logits_sum(fwd(p, img, ques, jax.random.PRNGKey(9)),
                                   target)

    def loss_model(p):
        out = model.apply({"params": p}, img, ques, deterministic=True)
        return bce_with_logits_sum(out["logits"], target)

    le, ge = jax.value_and_grad(loss_engine)(params)
    lm, gm = jax.value_and_grad(loss_model)(params)
    assert abs(float(le) - float(lm)) / max(1.0, abs(float(lm))) < 1e-3

    flat_e = {jax.tree_util.keystr(kp): v
              for kp, v in jax.tree_util.tree_flatten_with_path(ge)[0]}
    flat_m = {jax.tree_util.keystr(kp): v
              for kp, v in jax.tree_util.tree_flatten_with_path(gm)[0]}
    assert set(flat_e) == set(flat_m)
    # Per-tensor scale, floored at 1% of the largest gradient anywhere:
    # key-projection BIAS grads are exactly zero in exact arithmetic
    # (softmax-backward rows sum to zero), so both sides are rounding
    # noise there and pure per-tensor normalization compares noise/noise.
    global_max = max(float(jnp.max(jnp.abs(v))) for v in flat_m.values())
    for name, a in flat_e.items():
        b = flat_m[name]
        scale = max(1e-2 * global_max, float(jnp.max(jnp.abs(b))))
        np.testing.assert_allclose(
            np.asarray(a) / scale, np.asarray(b) / scale,
            rtol=0, atol=4e-2, err_msg=name)


def test_engine_dropout_runs_and_varies():
    cfg, model, params, img, ques, target = _setup()
    fwd = make_fused_train_forward(cfg.layer, cfg.multi_head,
                                   dropout_rate=0.2, group=2,
                                   interpret=True, fused_encoder=True)

    def loss(p, key):
        return bce_with_logits_sum(fwd(p, img, ques, key), target)

    l1, g1 = jax.value_and_grad(loss)(params, jax.random.PRNGKey(0))
    l2 = loss(params, jax.random.PRNGKey(1))
    assert np.isfinite(float(l1)) and np.isfinite(float(l2))
    assert float(l1) != float(l2)
    for leaf in jax.tree.leaves(g1):
        assert np.all(np.isfinite(np.asarray(leaf)))


def test_classifier_engine_matches_model_grads_no_dropout():
    """make_fused_classifier_forward vs ClassifierNet.apply autodiff."""
    from mcan_vqa_tpu.models.net import ClassifierNet
    from mcan_vqa_tpu.train.fused_engine import make_fused_classifier_forward

    model = ClassifierNet(answer_size=7, hidden_size=32, num_layers=2,
                          num_heads=4, ff_size=64, img_feat_size=24,
                          flat_mlp_size=16, flat_glimpses=1,
                          flat_out_size=32, dropout_rate=0.0,
                          dtype=jnp.float32)
    img = jax.random.normal(jax.random.PRNGKey(0), (B, Lv, 24), jnp.float32)
    img = img.at[1, -5:].set(0.0)
    target = (jax.random.uniform(jax.random.PRNGKey(2), (B, 7)) < 0.3
              ).astype(jnp.float32)
    params = model.init({"params": jax.random.PRNGKey(3)}, img)["params"]
    fwd = make_fused_classifier_forward(2, 4, dropout_rate=0.0,
                                        interpret=True)

    def loss_engine(p):
        return bce_with_logits_sum(fwd(p, img, jax.random.PRNGKey(9)),
                                   target)

    def loss_model(p):
        out = model.apply({"params": p}, img, deterministic=True)
        return bce_with_logits_sum(out["logits"], target)

    le, ge = jax.value_and_grad(loss_engine)(params)
    lm, gm = jax.value_and_grad(loss_model)(params)
    assert abs(float(le) - float(lm)) / max(1.0, abs(float(lm))) < 1e-3
    flat_e = {jax.tree_util.keystr(kp): v
              for kp, v in jax.tree_util.tree_flatten_with_path(ge)[0]}
    flat_m = {jax.tree_util.keystr(kp): v
              for kp, v in jax.tree_util.tree_flatten_with_path(gm)[0]}
    assert set(flat_e) == set(flat_m)
    global_max = max(float(jnp.max(jnp.abs(v))) for v in flat_m.values())
    for name, a in flat_e.items():
        b = flat_m[name]
        scale = max(1e-2 * global_max, float(jnp.max(jnp.abs(b))))
        np.testing.assert_allclose(
            np.asarray(a) / scale, np.asarray(b) / scale,
            rtol=0, atol=4e-2, err_msg=name)
