"""Ultimate parity test: our MCANet vs the ACTUAL reference PyTorch model.

Imports the reference codebase (read-only mount at /root/reference) as the
oracle — not a re-expression of its math, the real thing — builds Net2 with
random weights, imports its state_dict through our checkpoint mapping, and
compares logits. Skipped when the reference mount is absent.
"""

import os
import sys
import types

import jax
import numpy as np
import pytest

REFERENCE = "/root/reference"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(os.path.join(REFERENCE, "core")),
    reason="reference mount not available")


@pytest.fixture(scope="module")
def refnet_module():
    sys.path.insert(0, REFERENCE)
    try:
        import core.model.net as refnet  # noqa: PLC0415
        yield refnet
    finally:
        sys.path.remove(REFERENCE)


def _opt(hidden=64, heads=4, layer=2, img_feat=32, flat_mlp=24, glimpses=1,
         flat_out=48, emb=300):
    o = types.SimpleNamespace()
    o.hidden_size = hidden
    o.multi_head = heads
    o.hidden_size_head = hidden // heads
    o.layer = layer
    o.img_feat_size = img_feat
    o.flat_mlp_size = flat_mlp
    o.flat_glimpses = glimpses
    o.flat_out_size = flat_out
    o.word_embed_size = emb
    o.dropout_rate = 0.0
    o.use_glove = False
    o.ff_size = hidden * 4
    return o


class TestAgainstRealReference:
    def test_net2_logits_match(self, refnet_module):
        """Random reference Net2 -> import weights -> identical probabilities."""
        import torch

        from mcan_vqa_tpu.configs import Config
        from mcan_vqa_tpu.models.net import build_mcan
        from mcan_vqa_tpu.train.checkpoint import import_torch_state_dict

        torch.manual_seed(0)
        opt = _opt()
        token_size, answer_size = 40, 12
        ref = refnet_module.Net2(opt, None, token_size, answer_size)
        ref.eval()

        rng = np.random.default_rng(0)
        img = rng.normal(size=(3, 9, 32)).astype(np.float32)
        img[1, 5:] = 0.0
        ques = rng.integers(1, 40, size=(3, 6)).astype(np.int64)
        ques[0, 4:] = 0
        with torch.no_grad():
            ref_probs = ref(torch.from_numpy(img),
                            torch.from_numpy(ques))[0].numpy()

        cfg = Config(hidden_size=64, multi_head=4, layer=2, img_feat_size=32,
                     flat_mlp_size=24, flat_glimpses=1, flat_out_size=48,
                     dropout_rate=0.0, compute_dtype="float32",
                     use_glove=False).finalize()
        model = build_mcan(cfg, token_size, answer_size)
        params = import_torch_state_dict(ref.state_dict())
        out = model.apply({"params": params}, img, ques.astype(np.int32))
        ours = np.asarray(jax.nn.sigmoid(out["logits"]))

        np.testing.assert_allclose(ours, ref_probs, atol=2e-5)

    def test_net_variant_also_matches(self, refnet_module):
        """The reference's Net (visualization variant) shares the layout."""
        import torch

        from mcan_vqa_tpu.configs import Config
        from mcan_vqa_tpu.models.net import build_mcan
        from mcan_vqa_tpu.train.checkpoint import import_torch_state_dict

        torch.manual_seed(1)
        opt = _opt()
        ref = refnet_module.Net(opt, None, 40, 12)
        ref.eval()
        rng = np.random.default_rng(2)
        img = rng.normal(size=(2, 9, 32)).astype(np.float32)
        ques = rng.integers(1, 40, size=(2, 6)).astype(np.int64)
        with torch.no_grad():
            ref_out = ref(torch.from_numpy(img), torch.from_numpy(ques))
            ref_probs = ref_out[0].numpy()
            ref_vw = ref_out[3].numpy()

        cfg = Config(hidden_size=64, multi_head=4, layer=2, img_feat_size=32,
                     flat_mlp_size=24, flat_glimpses=1, flat_out_size=48,
                     dropout_rate=0.0, compute_dtype="float32",
                     use_glove=False).finalize()
        model = build_mcan(cfg, 40, 12)
        params = import_torch_state_dict(ref.state_dict())
        out = model.apply({"params": params}, img, ques.astype(np.int32))
        np.testing.assert_allclose(np.asarray(jax.nn.sigmoid(out["logits"])),
                                   ref_probs, atol=2e-5)
        # attention weights for the visualization flow match too
        np.testing.assert_allclose(np.asarray(out["v_w"]), ref_vw, atol=2e-5)

    def test_schedule_matches_reference_optimizer(self):
        """Our schedule == the real WarmupOptimizer.rate across 3 epochs."""
        sys.path.insert(0, REFERENCE)
        try:
            from core.model.optim import WarmupOptimizer
        finally:
            sys.path.remove(REFERENCE)
        from mcan_vqa_tpu.train.optim import make_lr_schedule

        class _NoOptim:
            param_groups = []
            def step(self):
                pass

        ds, bs, lr = 1000, 64, 1e-4
        wo = WarmupOptimizer(lr, _NoOptim(), ds, bs)
        sched = make_lr_schedule(lr, ds, bs, decay_epochs=())
        for count in range(60):
            ref_rate = wo.rate(step=count + 1)
            ours = float(sched(count))
            assert abs(ours - ref_rate) / ref_rate < 1e-6, (count, ours,
                                                            ref_rate)


class TestTrainingDynamicsParity:
    def test_adamw_steps_match_reference(self, refnet_module):
        """5 AdamW steps on the REAL reference Net2 vs our jitted train step,
        identical init/batches, no dropout: parameters must stay equal.

        Validates loss gradients (sigmoid+BCE(sum) == BCE-with-logits(sum)),
        AdamW semantics (torch vs optax decoupled weight decay), and the
        whole model backward in one shot.
        """
        import optax
        import torch

        from mcan_vqa_tpu.configs import Config
        from mcan_vqa_tpu.models.net import build_mcan
        from mcan_vqa_tpu.train.checkpoint import (
            flatten_params, import_torch_state_dict)
        from mcan_vqa_tpu.train.step import make_train_step
        from mcan_vqa_tpu.train.train_state import TrainState

        torch.manual_seed(3)
        opt = _opt()
        ref = refnet_module.Net2(opt, None, 40, 12)
        ref.train()

        lr = 1e-3
        t_optim = torch.optim.AdamW(ref.parameters(), lr=lr,
                                    weight_decay=1e-4)
        t_loss_fn = torch.nn.BCELoss(reduction="sum")

        rng = np.random.default_rng(7)
        img = rng.normal(size=(4, 9, 32)).astype(np.float32)
        ques = rng.integers(1, 40, size=(4, 6)).astype(np.int64)
        target = (rng.random((4, 12)) < 0.25).astype(np.float32)

        # ---- ours: same init via the importer ----
        cfg = Config(hidden_size=64, multi_head=4, layer=2, img_feat_size=32,
                     flat_mlp_size=24, flat_glimpses=1, flat_out_size=48,
                     dropout_rate=0.0, compute_dtype="float32", batch_size=4,
                     use_glove=False).finalize()
        model = build_mcan(cfg, 40, 12)
        params = import_torch_state_dict(ref.state_dict())
        tx = optax.adamw(lr, b1=0.9, b2=0.999, eps=1e-8, weight_decay=1e-4)
        state = TrainState.create(params, tx, seed=0)
        step = jax.jit(make_train_step(model, tx))
        batch = {"img": img, "ques": ques.astype(np.int32), "target": target}

        n_steps = 5
        for _ in range(n_steps):
            t_optim.zero_grad()
            probs = ref(torch.from_numpy(img), torch.from_numpy(ques))[0]
            loss = t_loss_fn(probs, torch.from_numpy(target))
            loss.backward()
            t_optim.step()
            state, metrics = step(state, batch)

        # losses agree at the last step
        assert abs(float(metrics["loss"]) - float(loss)) / float(loss) < 1e-3

        # Kernels agree elementwise. Biases are skipped HERE only: several
        # bias directions have exactly-zero true gradients (softmax
        # invariances — e.g. the key-projection bias shifts every score in
        # a row equally; the AttFlat glimpse bias shifts all logits), and
        # Adam turns the fp-noise gradients in those null directions into
        # O(lr) drift on both frameworks independently. The SGD test below
        # covers every parameter exactly (linear updates keep null
        # directions at zero).
        theirs = import_torch_state_dict(ref.state_dict())
        ours_flat = flatten_params(jax.device_get(state.params))
        ref_flat = flatten_params(theirs)
        assert set(ours_flat) == set(ref_flat)
        for k in ours_flat:
            if k[-1] != "kernel" and k[-1] != "embedding":
                continue
            a, b = ours_flat[k], ref_flat[k]
            scale = max(np.abs(b).max(), 1e-3)
            np.testing.assert_allclose(a / scale, b / scale, atol=3e-4,
                                       err_msg=str(k))

    def test_sgd_steps_match_reference_full_tree(self, refnet_module):
        """5 plain-SGD steps: EVERY parameter matches (updates are linear in
        the gradients, so zero-gradient directions stay put on both sides)."""
        import optax
        import torch

        from mcan_vqa_tpu.configs import Config
        from mcan_vqa_tpu.models.net import build_mcan
        from mcan_vqa_tpu.train.checkpoint import (
            flatten_params, import_torch_state_dict)
        from mcan_vqa_tpu.train.step import make_train_step
        from mcan_vqa_tpu.train.train_state import TrainState

        torch.manual_seed(4)
        opt = _opt()
        ref = refnet_module.Net2(opt, None, 40, 12)
        ref.train()
        lr = 1e-4
        t_optim = torch.optim.SGD(ref.parameters(), lr=lr)
        t_loss_fn = torch.nn.BCELoss(reduction="sum")

        rng = np.random.default_rng(11)
        img = rng.normal(size=(4, 9, 32)).astype(np.float32)
        ques = rng.integers(1, 40, size=(4, 6)).astype(np.int64)
        target = (rng.random((4, 12)) < 0.25).astype(np.float32)

        cfg = Config(hidden_size=64, multi_head=4, layer=2, img_feat_size=32,
                     flat_mlp_size=24, flat_glimpses=1, flat_out_size=48,
                     dropout_rate=0.0, compute_dtype="float32", batch_size=4,
                     use_glove=False).finalize()
        model = build_mcan(cfg, 40, 12)
        params = import_torch_state_dict(ref.state_dict())
        tx = optax.sgd(lr)
        state = TrainState.create(params, tx, seed=0)
        step = jax.jit(make_train_step(model, tx))
        batch = {"img": img, "ques": ques.astype(np.int32), "target": target}

        for _ in range(5):
            t_optim.zero_grad()
            probs = ref(torch.from_numpy(img), torch.from_numpy(ques))[0]
            loss = t_loss_fn(probs, torch.from_numpy(target))
            loss.backward()
            t_optim.step()
            state, metrics = step(state, batch)

        assert abs(float(metrics["loss"]) - float(loss)) / float(loss) < 1e-4
        ours_flat = flatten_params(jax.device_get(state.params))
        ref_flat = flatten_params(import_torch_state_dict(ref.state_dict()))
        for k in ours_flat:
            a, b = ours_flat[k], ref_flat[k]
            scale = max(np.abs(b).max(), 1e-3)
            np.testing.assert_allclose(a / scale, b / scale, atol=2e-5,
                                       err_msg=str(k))


class TestOptimizerStateInterop:
    """Trajectory-faithful resume: the reference restores AdamW moments on
    resume (core/exec.py:90-92); our torch-ckpt import/export must carry
    them so a resumed run continues the SAME optimization trajectory."""

    def test_param_key_order_matches_reference(self, refnet_module):
        """reference_param_keys(L) == the actual Net2 registration order
        (the index space torch AdamW state is saved in)."""
        import torch

        from mcan_vqa_tpu.train.checkpoint import reference_param_keys

        torch.manual_seed(0)
        ref = refnet_module.Net2(_opt(), None, 40, 12)
        assert list(ref.state_dict().keys()) == reference_param_keys(2)

    @staticmethod
    def _train_setup(refnet_module, seed=5):
        import torch

        from mcan_vqa_tpu.configs import Config
        from mcan_vqa_tpu.models.net import build_mcan

        torch.manual_seed(seed)
        ref = refnet_module.Net2(_opt(), None, 40, 12)
        ref.train()
        rng = np.random.default_rng(seed)
        img = rng.normal(size=(4, 9, 32)).astype(np.float32)
        ques = rng.integers(1, 40, size=(4, 6)).astype(np.int64)
        target = (rng.random((4, 12)) < 0.25).astype(np.float32)
        cfg = Config(hidden_size=64, multi_head=4, layer=2, img_feat_size=32,
                     flat_mlp_size=24, flat_glimpses=1, flat_out_size=48,
                     dropout_rate=0.0, compute_dtype="float32", batch_size=4,
                     use_glove=False).finalize()
        model = build_mcan(cfg, 40, 12)
        batch = {"img": img, "ques": ques.astype(np.int32), "target": target}
        return ref, model, img, ques, target, batch

    @staticmethod
    def _torch_step(ref, t_optim, img, ques, target):
        import torch

        t_loss_fn = torch.nn.BCELoss(reduction="sum")
        t_optim.zero_grad()
        probs = ref(torch.from_numpy(img), torch.from_numpy(ques))[0]
        loss = t_loss_fn(probs, torch.from_numpy(target))
        loss.backward()
        t_optim.step()
        return float(loss)

    @staticmethod
    def _adam_moments(opt_state):
        found = {}

        def adam(node):
            found["mu"], found["nu"] = node.mu, node.nu
            found["count"] = int(node.count)
            return node

        from mcan_vqa_tpu.train import checkpoint as C
        C._map_opt_state(opt_state, adam, lambda n: n)
        return found

    @staticmethod
    def _compare_trees(a_tree, b_tree, atol, leaves=("kernel", "embedding")):
        from mcan_vqa_tpu.train.checkpoint import flatten_params
        fa, fb = flatten_params(a_tree), flatten_params(b_tree)
        assert set(fa) == set(fb)
        for k in fa:
            if leaves and k[-1] not in leaves:
                continue
            a, b = np.asarray(fa[k], np.float64), np.asarray(fb[k], np.float64)
            scale = max(np.abs(b).max(), 1e-6)
            np.testing.assert_allclose(a / scale, b / scale, atol=atol,
                                       err_msg=str(k))

    def test_resume_from_reference_pickle_continues_trajectory(
            self, refnet_module, tmp_path):
        """N torch AdamW steps -> reference-format save -> import -> the
        moments match bitwise; M more steps on both sides -> moments still
        agree (they are pure functions of the gradient history)."""
        import optax
        import torch

        from mcan_vqa_tpu.train import checkpoint as C
        from mcan_vqa_tpu.train.step import make_train_step
        from mcan_vqa_tpu.train.train_state import TrainState

        ref, model, img, ques, target, batch = self._train_setup(refnet_module)
        lr = 1e-3
        t_optim = torch.optim.AdamW(ref.parameters(), lr=lr,
                                    weight_decay=1e-4)
        for _ in range(3):
            self._torch_step(ref, t_optim, img, ques, target)

        # reference-format checkpoint (core/exec.py:241-245)
        pkl = str(tmp_path / "epoch3.pkl")
        torch.save({"state_dict": ref.state_dict(),
                    "optimizer": t_optim.state_dict(),
                    "lr_base": lr}, pkl)

        params, meta = C.import_torch_checkpoint(pkl)
        assert "optimizer" in meta and "param_keys" in meta
        tx = optax.adamw(lr, b1=0.9, b2=0.999, eps=1e-8, weight_decay=1e-4)
        state = TrainState.create(params, tx, seed=0)
        opt_state, tstep = C.import_torch_opt_state(
            meta["optimizer"], meta["param_keys"], state.opt_state)
        assert tstep == 3
        state = state.replace(opt_state=opt_state,
                              step=np.int32(tstep))

        # imported moments are a straight (transposed) copy
        ours0 = self._adam_moments(state.opt_state)
        assert ours0["count"] == 3
        torch_moments = {
            "mu": C.import_torch_state_dict(
                {k: s["exp_avg"] for k, s in zip(
                    meta["param_keys"],
                    (t_optim.state_dict()["state"][i]
                     for i in range(len(meta["param_keys"]))))}),
            "nu": C.import_torch_state_dict(
                {k: s["exp_avg_sq"] for k, s in zip(
                    meta["param_keys"],
                    (t_optim.state_dict()["state"][i]
                     for i in range(len(meta["param_keys"]))))}),
        }
        self._compare_trees(jax.device_get(ours0["mu"]), torch_moments["mu"],
                            atol=1e-7, leaves=())
        self._compare_trees(jax.device_get(ours0["nu"]), torch_moments["nu"],
                            atol=1e-7, leaves=())

        # M more steps on both sides: same trajectory
        step = jax.jit(make_train_step(model, tx))
        for _ in range(3):
            loss_t = self._torch_step(ref, t_optim, img, ques, target)
            state, metrics = step(state, batch)
        assert abs(float(metrics["loss"]) - loss_t) / abs(loss_t) < 1e-3

        ours1 = self._adam_moments(state.opt_state)
        assert ours1["count"] == 6
        sd = t_optim.state_dict()
        keys = meta["param_keys"]
        t_mu = C.import_torch_state_dict(
            {k: sd["state"][i]["exp_avg"] for i, k in enumerate(keys)})
        t_nu = C.import_torch_state_dict(
            {k: sd["state"][i]["exp_avg_sq"] for i, k in enumerate(keys)})
        self._compare_trees(jax.device_get(ours1["mu"]), t_mu, atol=3e-4)
        self._compare_trees(jax.device_get(ours1["nu"]), t_nu, atol=3e-4)
        # and kernels keep matching (the Adam-comparable subset)
        self._compare_trees(jax.device_get(state.params),
                            C.import_torch_state_dict(ref.state_dict()),
                            atol=3e-4)

    def test_export_optimizer_state_loads_in_reference(
            self, refnet_module, tmp_path):
        """Our TrainState -> reference-format pickle WITH optimizer ->
        torch AdamW.load_state_dict accepts it and continues identically."""
        import optax
        import torch

        from mcan_vqa_tpu.train import checkpoint as C
        from mcan_vqa_tpu.train.step import make_train_step
        from mcan_vqa_tpu.train.train_state import TrainState

        ref, model, img, ques, target, batch = self._train_setup(
            refnet_module, seed=6)
        lr = 1e-3
        params = C.import_torch_state_dict(ref.state_dict())
        tx = optax.adamw(lr, b1=0.9, b2=0.999, eps=1e-8, weight_decay=1e-4)
        state = TrainState.create(params, tx, seed=0)
        step = jax.jit(make_train_step(model, tx))
        for _ in range(3):
            state, _ = step(state, batch)

        pkl = str(tmp_path / "export.pkl")
        C.export_torch_checkpoint(jax.device_get(state.params), pkl,
                                  lr_base=lr,
                                  opt_state=jax.device_get(state.opt_state),
                                  num_layers=2)

        blob = torch.load(pkl, map_location="cpu", weights_only=False)
        ref.load_state_dict(blob["state_dict"])
        t_optim = torch.optim.AdamW(ref.parameters(), lr=lr,
                                    weight_decay=1e-4)
        t_optim.load_state_dict(blob["optimizer"])
        assert float(t_optim.state_dict()["state"][0]["step"]) == 3.0

        for _ in range(2):
            loss_t = self._torch_step(ref, t_optim, img, ques, target)
            state, metrics = step(state, batch)
        assert abs(float(metrics["loss"]) - loss_t) / abs(loss_t) < 1e-3
        self._compare_trees(jax.device_get(state.params),
                            C.import_torch_state_dict(ref.state_dict()),
                            atol=3e-4)
