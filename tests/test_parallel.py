"""Sharding tests on the virtual 8-device CPU mesh (conftest forces
xla_force_host_platform_device_count=8): dp-only, tp-only, and dp x tp
train steps must compile, run, and agree numerically with single-device."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import PartitionSpec as P

from mcan_vqa_tpu.configs import Config
from mcan_vqa_tpu.models.net import build_mcan
from mcan_vqa_tpu.parallel.mesh import make_mesh
from mcan_vqa_tpu.parallel import sharding as shd
from mcan_vqa_tpu.train.optim import make_lr_schedule, make_optimizer
from mcan_vqa_tpu.train.step import make_eval_step, make_train_step
from mcan_vqa_tpu.train.train_state import TrainState


def _setup(grad_accu_steps=1):
    cfg = Config(hidden_size=32, layer=2, img_feat_size=16, flat_out_size=32,
                 flat_mlp_size=16, multi_head=4, batch_size=16, lr_base=1e-3,
                 grad_accu_steps=grad_accu_steps, dropout_rate=0.0,
                 compute_dtype="float32", use_glove=False).finalize()
    model = build_mcan(cfg, token_size=30, answer_size=10)
    rng = np.random.default_rng(0)
    batch = {
        "img": rng.normal(size=(16, 6, 16)).astype(np.float32),
        "ques": rng.integers(1, 30, size=(16, 5)).astype(np.int32),
        "target": (rng.random((16, 10)) < 0.2).astype(np.float32),
    }
    params = model.init({"params": jax.random.PRNGKey(0)},
                        batch["img"], batch["ques"])["params"]
    tx = make_optimizer(cfg, data_size=640)
    state = TrainState.create(params, tx, seed=0)
    step = make_train_step(model, tx, grad_accu_steps=grad_accu_steps,
                           lr_schedule=make_lr_schedule(cfg.lr_base, 640, 16))
    return cfg, model, state, step, batch


def _run_mesh(mesh_shape, grad_accu_steps=1):
    """One SGD(1.0) step on the given mesh: returned param delta == gradient
    (linear in the grads, so cross-device reduction-order noise is not
    amplified the way Adam's normalization would)."""
    import optax
    cfg, model, state, step, batch = _setup(grad_accu_steps)
    tx = optax.sgd(1.0)
    state = TrainState.create(state.params, tx, seed=0)
    step = make_train_step(model, tx, grad_accu_steps=grad_accu_steps)
    mesh = make_mesh(mesh_shape)
    sstate = shd.shard_state(mesh, state)
    sbatch = shd.shard_batch(mesh, batch)
    jstep = shd.jit_train_step(step, mesh, state, donate=False)
    new_state, metrics = jstep(sstate, sbatch)
    grads = jax.tree.map(lambda p0, p1: p0 - p1, state.params,
                         jax.device_get(new_state.params))
    return grads, float(metrics["loss"])


class TestMesh:
    def test_devices_available(self):
        assert jax.device_count() == 8

    def test_mesh_shapes(self):
        m = make_mesh({"data": 4, "model": 2})
        assert m.shape == {"data": 4, "model": 2}
        m = make_mesh({"data": -1, "model": 2})
        assert m.shape == {"data": 4, "model": 2}
        with pytest.raises(AssertionError):
            make_mesh({"data": 5, "model": 2})  # 10 > 8 devices


class TestShardingRules:
    def test_tp_specs(self):
        _, _, state, _, _ = _setup()
        mesh = make_mesh({"data": 1, "model": 8})
        shardings = shd.make_param_shardings(mesh, state.params)
        flat = jax.tree_util.tree_flatten_with_path(shardings)[0]
        by_name = {"/".join(str(k) for k in path): s for path, s in flat}
        def spec(sub):
            return [s.spec for n, s in by_name.items() if sub in n]
        # qkv column-parallel
        assert all(s == P(None, "model") for s in spec("linear_q']['kernel"))
        # merge row-parallel
        assert all(s == P("model", None) for s in spec("mhatt']['linear_merge']['kernel"))
        # ffn up col, down row
        assert all(s == P(None, "model") for s in spec("ffn']['mlp']['FCLayer_0']['Dense_0']['kernel"))
        assert all(s == P("model", None) for n, s in by_name.items()
                   if "ffn']['mlp']['Dense_0']['kernel" in n)
        # attflat merge replicated
        assert all(s == P() for s in spec("attflat_img']['linear_merge']['kernel"))
        # lstm replicated
        assert all(s == P() for s in spec("w_ih"))


class TestDistributedEquivalence:
    @staticmethod
    def _compare(ga, gb):
        for a, b in zip(jax.tree.leaves(ga), jax.tree.leaves(gb)):
            a, b = np.asarray(a), np.asarray(b)
            # floor the scale: near-zero-gradient leaves (e.g. the glimpse
            # bias, whose grad vanishes by softmax shift-invariance) carry
            # only cross-device reduction noise
            scale = max(np.abs(a).max(), 1e-2)
            np.testing.assert_allclose(a / scale, b / scale, atol=2e-4)

    def test_dp8_matches_single(self):
        g_single, l_single = _run_mesh({"data": 1, "model": 1})
        g_dp, l_dp = _run_mesh({"data": 8, "model": 1})
        assert abs(l_single - l_dp) / abs(l_single) < 1e-4
        self._compare(g_single, g_dp)

    def test_tp8_matches_single(self):
        g_single, l_single = _run_mesh({"data": 1, "model": 1})
        g_tp, l_tp = _run_mesh({"data": 1, "model": 8})
        assert abs(l_single - l_tp) / abs(l_single) < 1e-4
        self._compare(g_single, g_tp)

    @pytest.mark.parametrize("grad_accu_steps", [1, 2])
    def test_fused_dp_reg_parity(self, grad_accu_steps):
        """The shard_map (fused-engine) dp path with reg_factor>0 must match
        the plain jit path: the L1+L2 penalty is computed on replicated
        params by every shard, so without the axis-size correction it would
        be multiplied by the shard count at the loss/grad psum (ADVICE r2)."""
        import optax
        cfg, model, state, _, batch = _setup(grad_accu_steps)
        tx = optax.sgd(1.0)
        state = TrainState.create(state.params, tx, seed=0)
        reg = 1e-3

        plain = make_train_step(model, tx, grad_accu_steps=grad_accu_steps,
                                reg_factor=reg)
        mesh1 = make_mesh({"data": 1, "model": 1})
        s1, m1 = shd.jit_train_step(plain, mesh1, state, donate=False)(
            shd.shard_state(mesh1, state), shd.shard_batch(mesh1, batch))

        sharded = make_train_step(model, tx, grad_accu_steps=grad_accu_steps,
                                  reg_factor=reg, data_axis="data")
        mesh4 = make_mesh({"data": 4, "model": 1})
        jstep = shd.shardmap_train_step(sharded, mesh4, donate=False)
        s4, m4 = jstep(shd.shard_state(mesh4, state),
                       shd.shard_batch(mesh4, batch))

        assert abs(float(m1["loss"]) - float(m4["loss"])) \
            / abs(float(m1["loss"])) < 1e-5
        g1 = jax.tree.map(lambda p0, p1: p0 - p1, state.params,
                          jax.device_get(s1.params))
        g4 = jax.tree.map(lambda p0, p1: p0 - p1, state.params,
                          jax.device_get(s4.params))
        self._compare(g1, g4)

    def test_dp4_tp2_with_accumulation(self):
        g_single, l_single = _run_mesh({"data": 1, "model": 1},
                                       grad_accu_steps=2)
        g_mix, l_mix = _run_mesh({"data": 4, "model": 2}, grad_accu_steps=2)
        assert abs(l_single - l_mix) / abs(l_single) < 1e-4
        self._compare(g_single, g_mix)


class TestShardedEval:
    def test_eval_sharded(self):
        cfg, model, state, _, batch = _setup()
        mesh = make_mesh({"data": 4, "model": 2})
        ev = shd.jit_eval_step(make_eval_step(model), mesh, state)
        sstate = shd.shard_state(mesh, state)
        sbatch = shd.shard_batch(mesh, {"img": batch["img"],
                                        "ques": batch["ques"]})
        probs = ev(sstate.params, sbatch["img"], sbatch["ques"])
        ref = make_eval_step(model)(state.params, batch["img"], batch["ques"])
        np.testing.assert_allclose(np.asarray(probs), np.asarray(ref),
                                   atol=1e-5)


class TestTrainerOnMesh:
    def test_trainer_dp4_tp2_end_to_end(self, tmp_path_factory):
        """Full Trainer orchestration on a dp4 x tp2 mesh from the config."""
        tmp_path = tmp_path_factory.mktemp("mesh_trainer")
        from mcan_vqa_tpu.data.vqa_dataset import SyntheticVQADataset
        from mcan_vqa_tpu.train.trainer import Trainer
        cfg = Config(hidden_size=32, layer=1, multi_head=4, img_feat_size=16,
                     img_feat_pad_size=8, max_token=6, flat_out_size=32,
                     flat_mlp_size=16, batch_size=16, lr_base=3e-3,
                     max_epoch=2, num_workers=2, compute_dtype="float32",
                     use_glove=False, verbose=False, eval_every_epoch=False,
                     mesh_shape={"data": 4, "model": 2},
                     ckpts_dir=str(tmp_path / "ckpts"),
                     log_path=str(tmp_path / "log"),
                     result_path=str(tmp_path / "res")).finalize()
        ds = SyntheticVQADataset(cfg, size=64, token_size=40, answer_size=8,
                                 run_mode="train")
        trainer = Trainer(cfg, train_dataset=ds)
        assert trainer.mesh.shape == {"data": 4, "model": 2}
        state = trainer.train()
        assert int(state.step) == 8  # 2 epochs x 4 steps
        # params are TP-sharded on the mesh
        k = state.params["backbone"]["enc_0"]["mhatt"]["linear_q"]["kernel"]
        assert k.sharding.spec == P(None, "model")
        # eval through the same mesh
        res = trainer.evaluate(ds)
        assert "roc_micro" in res
