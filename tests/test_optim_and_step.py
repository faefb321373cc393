"""Tests for the LR schedule arithmetic, BCE loss, and the jitted train step."""

import jax
import jax.numpy as jnp
import numpy as np
import torch

from mcan_vqa_tpu.configs import Config
from mcan_vqa_tpu.models.net import build_mcan
from mcan_vqa_tpu.train.optim import make_lr_schedule, make_optimizer, steps_per_epoch
from mcan_vqa_tpu.train.step import bce_with_logits_sum, l1_l2_penalty, make_eval_step, make_train_step
from mcan_vqa_tpu.train.train_state import TrainState


def reference_rate(step, lr_base, data_size, batch_size, decays_applied):
    """Oracle: WarmupOptimizer.rate (reference: core/model/optim.py:36-49)
    with adjust_lr decays folded into lr_base (optim.py:70-71)."""
    base = lr_base * (0.2 ** decays_applied)
    if step <= int(data_size / batch_size * 1):
        return base * 0.25
    elif step <= int(data_size / batch_size * 2):
        return base * 0.5
    elif step <= int(data_size / batch_size * 3):
        return base * 0.75
    return base


class TestLRSchedule:
    def test_warmup_boundaries(self):
        ds, bs, lr = 1000, 64, 1e-4
        spe = steps_per_epoch(ds, bs)
        assert spe == 15
        sched = make_lr_schedule(lr, ds, bs, decay_epochs=(8, 12))
        # optax count c == reference step c+1; includes non-divisible ds/bs
        # boundary cases (int(1000/64*2)=31 != 2*15=30)
        for count in [0, 14, 15, 29, 30, 31, 44, 45, 46, 100]:
            step = count + 1
            epoch = (step - 1) // spe
            decays = sum(epoch >= e for e in (8, 12))
            expect = reference_rate(step, lr, ds, bs, decays)
            got = float(sched(count))
            assert abs(got - expect) / expect < 1e-6, (count, got, expect)

    def test_decay_epochs(self):
        ds, bs, lr = 1500, 100, 1e-4  # spe = 15
        sched = make_lr_schedule(lr, ds, bs, decay_epochs=(8, 12))
        spe = 15
        # last step of epoch 7 -> no decay; first step of epoch 8 -> x0.2
        assert abs(float(sched(8 * spe - 1)) - lr) / lr < 1e-6
        assert abs(float(sched(8 * spe)) - lr * 0.2) / lr < 1e-6
        assert abs(float(sched(12 * spe)) - lr * 0.04) / lr < 1e-6

    def test_jit_compatible(self):
        sched = make_lr_schedule(1e-4, 640, 64)
        vals = jax.jit(jax.vmap(sched))(jnp.arange(50))
        assert vals.shape == (50,) and bool(jnp.all(vals > 0))


class TestBCELoss:
    def test_matches_torch_bce_sum(self):
        """Our BCE-with-logits(sum) == torch BCELoss(sum) on sigmoid(logits)
        (the reference's formulation, core/exec.py:67)."""
        rng = np.random.default_rng(0)
        x = rng.normal(size=(8, 12)).astype(np.float32) * 3
        z = (rng.random((8, 12)) < 0.3).astype(np.float32) * \
            rng.choice([0.3, 0.6, 0.9, 1.0], (8, 12)).astype(np.float32)
        ours = float(bce_with_logits_sum(jnp.asarray(x), jnp.asarray(z)))
        ref = torch.nn.BCELoss(reduction="sum")(
            torch.sigmoid(torch.from_numpy(x)), torch.from_numpy(z)).item()
        assert abs(ours - ref) / abs(ref) < 1e-5

    def test_l1_l2_penalty(self):
        params = {"a": jnp.asarray([1.0, -2.0]), "b": jnp.asarray([[3.0]])}
        # l1 = 6, l2 = 1+4+9 = 14
        assert float(l1_l2_penalty(params)) == 20.0


def _tiny_setup(grad_accu_steps=1, dropout=0.0, reg_factor=0.0):
    cfg = Config(hidden_size=32, layer=1, img_feat_size=16, flat_out_size=32,
                 flat_mlp_size=16, multi_head=4, batch_size=8, lr_base=3e-3,
                 grad_accu_steps=grad_accu_steps, dropout_rate=dropout,
                 compute_dtype="float32", use_glove=False).finalize()
    model = build_mcan(cfg, token_size=30, answer_size=10)
    rng = np.random.default_rng(0)
    img = rng.normal(size=(8, 6, 16)).astype(np.float32)
    ques = rng.integers(1, 30, size=(8, 5)).astype(np.int32)
    target = (rng.random((8, 10)) < 0.2).astype(np.float32)
    batch = {"img": jnp.asarray(img), "ques": jnp.asarray(ques),
             "target": jnp.asarray(target)}
    params = model.init({"params": jax.random.PRNGKey(0)}, img, ques)["params"]
    tx = make_optimizer(cfg, data_size=640)
    state = TrainState.create(params, tx, seed=0)
    step = make_train_step(model, tx, grad_accu_steps=grad_accu_steps,
                           reg_factor=reg_factor,
                           lr_schedule=make_lr_schedule(cfg.lr_base, 640, 8))
    return model, state, jax.jit(step), batch


class TestTrainStep:
    def test_loss_decreases(self):
        _, state, step, batch = _tiny_setup(dropout=0.0)
        losses = []
        for _ in range(12):
            state, m = step(state, batch)
            losses.append(float(m["loss"]))
        assert losses[-1] < losses[0] * 0.9
        assert int(state.step) == 12

    def test_grad_accumulation_equivalent(self):
        """accu=2 over one batch == accu=1 over the same batch (no dropout).

        Compared through an SGD(1.0) transform so the param delta IS the
        gradient — Adam would amplify fp-associativity noise near zero.
        """
        import optax
        from mcan_vqa_tpu.train.step import make_train_step as mts

        model, state, _, batch = _tiny_setup(grad_accu_steps=1)
        tx = optax.sgd(1.0)
        base = TrainState.create(state.params, tx, seed=0)
        s1, m1 = jax.jit(mts(model, tx, grad_accu_steps=1))(base, batch)
        s2, m2 = jax.jit(mts(model, tx, grad_accu_steps=2))(base, batch)
        assert abs(float(m1["loss"]) - float(m2["loss"])) < 1e-3
        for a, b, p0 in zip(jax.tree.leaves(s1.params),
                            jax.tree.leaves(s2.params),
                            jax.tree.leaves(base.params)):
            g1, g2 = np.asarray(p0 - a), np.asarray(p0 - b)
            scale = max(np.abs(g1).max(), 1e-3)
            np.testing.assert_allclose(g1 / scale, g2 / scale, atol=1e-4)

    def test_reg_factor_increases_loss(self):
        _, state, step, batch = _tiny_setup(reg_factor=0.0)
        _, state_r, step_r, _ = _tiny_setup(reg_factor=0.01)
        _, m = step(state, batch)
        _, m_r = step_r(state_r, batch)
        assert float(m_r["loss"]) > float(m["loss"])

    def test_metrics_contain_lr_and_gradnorm(self):
        _, state, step, batch = _tiny_setup()
        _, m = step(state, batch)
        assert float(m["lr"]) > 0 and float(m["grad_norm"]) > 0
        # first step is warmup: 0.25 * lr_base
        assert abs(float(m["lr"]) - 0.25 * 3e-3) < 1e-8

    def test_dropout_changes_across_steps(self):
        model, state, step, batch = _tiny_setup(dropout=0.3)
        _, m1 = step(state, batch)
        state2, _ = step(state, batch)  # same state -> same rng -> same loss
        _, m_same = step(state, batch)
        assert float(m1["loss"]) == float(m_same["loss"])
        _, m2 = step(state2.replace(params=state.params,
                                    opt_state=state.opt_state), batch)
        # step counter folded into rng -> different dropout -> different loss
        assert float(m2["loss"]) != float(m1["loss"])


class TestEvalStep:
    def test_probabilities(self):
        model, state, _, batch = _tiny_setup()
        ev = jax.jit(make_eval_step(model))
        probs = ev(state.params, batch["img"], batch["ques"])
        assert probs.shape == (8, 10)
        assert float(probs.min()) >= 0.0 and float(probs.max()) <= 1.0
