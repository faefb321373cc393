"""Predictor API tests: checkpoint loading (both formats), fixed-shape
batching, answer decoding."""

import jax
import numpy as np
import pytest

from mcan_vqa_tpu.api import Predictor
from mcan_vqa_tpu.configs import Config
from mcan_vqa_tpu.data import text as text_mod
from mcan_vqa_tpu.models.net import build_mcan
from mcan_vqa_tpu.train import checkpoint as ckpt_mod
from mcan_vqa_tpu.train.optim import make_optimizer
from mcan_vqa_tpu.train.train_state import TrainState


@pytest.fixture(scope="module")
def setup():
    cfg = Config(hidden_size=32, layer=1, multi_head=4, img_feat_size=16,
                 img_feat_pad_size=8, max_token=6, flat_out_size=32,
                 flat_mlp_size=16, compute_dtype="float32",
                 use_glove=False).finalize()
    tok, _ = text_mod.build_vocab(["what color is the cat dog red blue"])
    ix_to_ans = {str(i): a for i, a in
                 enumerate(["yes", "no", "red", "blue", "2"])}
    model = build_mcan(cfg, token_size=len(tok), answer_size=5)
    img = np.zeros((1, 8, 16), np.float32)
    ques = np.zeros((1, 6), np.int32)
    params = model.init({"params": jax.random.PRNGKey(0)}, img,
                        ques)["params"]
    return cfg, tok, ix_to_ans, params


class TestPredictor:
    def test_answer_strings(self, setup):
        cfg, tok, i2a, params = setup
        p = Predictor(cfg, params, tok, i2a, max_batch=4)
        feats = np.random.default_rng(0).normal(
            size=(2, 5, 16)).astype(np.float32)
        out = p.answer(["what color is the cat", "is the dog red"], feats)
        assert len(out) == 2
        for ans, prob in out:
            assert ans in i2a.values()
            assert 0.0 <= prob <= 1.0

    def test_fused_params_carry_no_alllayer_layouts(self, setup):
        """Artifact hygiene: the shipped fused Predictor must not hold the
        mode-3/4/5 stacked weight layouts (~86 MB of duplicated weights
        that exported artifacts would carry as dead arrays)."""
        cfg, tok, i2a, params = setup
        p = Predictor(cfg, params, tok, i2a, max_batch=4, engine="fused")
        bb = p.params["backbone"]
        assert "_mk_dec" not in bb and "_mk_enc" not in bb
        assert "_mk" in bb["dec_0"]  # per-block layouts still attached

    def test_batch_padding_no_crosstalk(self, setup):
        """Padding rows must not change real results; variable request sizes
        reuse one compilation."""
        cfg, tok, i2a, params = setup
        p = Predictor(cfg, params, tok, i2a, max_batch=4)
        feats = np.random.default_rng(1).normal(
            size=(3, 6, 16)).astype(np.float32)
        qs = ["what is this", "is the cat red", "what color"]
        full = p.predict_probs(qs, feats)
        single = p.predict_probs(qs[:1], feats[:1])
        np.testing.assert_allclose(full[0], single[0], atol=1e-5)

    def test_ragged_region_counts(self, setup):
        """A sequence of per-image [R_i, F] features with different region
        counts batches fine (each padded to the model's region count) and
        matches the caller-padded path exactly."""
        cfg, tok, i2a, params = setup
        p = Predictor(cfg, params, tok, i2a, max_batch=4)
        rng = np.random.default_rng(3)
        ragged = [rng.normal(size=(r, 16)).astype(np.float32)
                  for r in (3, 8, 5)]
        qs = ["what is this", "is the cat red", "what color"]
        got = p.predict_probs(qs, ragged)
        padded = np.zeros((3, 8, 16), np.float32)
        for i, f in enumerate(ragged):
            padded[i, :f.shape[0]] = f
        want = p.predict_probs(qs, padded)
        np.testing.assert_allclose(got, want, atol=1e-6)

    def test_act_calibration_static_scales(self, setup):
        """Predictor(act_calibration=...) calibrates static per-tensor
        activation scales for the fused engine's int8 quant sites; the
        answers stay in agreement with the dynamic-quant engine (the
        accuracy gate proper is tests/test_quant.py TestStaticActScales
        on trained weights)."""
        cfg, tok, i2a, params = setup
        rng = np.random.default_rng(1)
        feats = rng.normal(size=(4, 8, 16)).astype(np.float32)
        qs = ["what color is the cat", "is the dog red",
              "what is blue", "is the cat 2"]
        p_dyn = Predictor(cfg, params, tok, i2a, max_batch=4,
                          engine="fused")
        p_sta = Predictor(cfg, params, tok, i2a, max_batch=4,
                          engine="fused", act_calibration=(qs, feats))
        pr_d = p_dyn.predict_probs(qs, feats)
        pr_s = p_sta.predict_probs(qs, feats)
        assert pr_s.shape == pr_d.shape
        assert np.abs(pr_s - pr_d).max() < 0.05
        assert (pr_s.argmax(1) == pr_d.argmax(1)).all()

    def test_act_calibration_rejected_on_non_fused_engines(self, setup):
        """Static scales only exist in the fused engine: an explicit
        plain/int8 engine with a calibration sample is a config error
        (silently ignoring it would fake the +12-18% calibrated engine);
        'auto' resolving to plain (CPU) downgrades to a warning."""
        cfg, tok, i2a, params = setup
        feats = np.zeros((1, 8, 16), np.float32)
        cal = (["what color"], feats)
        for engine in ("plain", "int8"):
            with pytest.raises(ValueError, match="act_calibration"):
                Predictor(cfg, params, tok, i2a, max_batch=2,
                          engine=engine, act_calibration=cal)
        if jax.default_backend() != "tpu":
            with pytest.warns(UserWarning, match="act_calibration ignored"):
                p = Predictor(cfg, params, tok, i2a, max_batch=2,
                              engine="auto", act_calibration=cal)
            assert p.engine == "plain"

    def test_act_calibration_nonfinite_sample_rejected(self, setup):
        """A NaN in the calibration sample must fail loudly at
        construction, not bake NaN scales into every int8 site."""
        cfg, tok, i2a, params = setup
        feats = np.ones((1, 8, 16), np.float32)
        feats[0, 0, 0] = np.nan
        with pytest.raises(ValueError, match="non-finite"):
            Predictor(cfg, params, tok, i2a, max_batch=2, engine="fused",
                      act_calibration=(["what color"], feats))

    def test_over_batch_rejected(self, setup):
        cfg, tok, i2a, params = setup
        p = Predictor(cfg, params, tok, i2a, max_batch=2)
        feats = np.zeros((3, 5, 16), np.float32)
        with pytest.raises(AssertionError):
            p.predict_probs(["a", "b", "c"], feats)

    def test_from_torch_checkpoint(self, setup, tmp_path):
        cfg, tok, i2a, params = setup
        pkl = str(tmp_path / "model.pkl")
        ckpt_mod.export_torch_checkpoint(params, pkl)
        p = Predictor.from_checkpoint(pkl, cfg, tok, i2a, max_batch=2)
        feats = np.random.default_rng(2).normal(
            size=(1, 5, 16)).astype(np.float32)
        ref = Predictor(cfg, params, tok, i2a, max_batch=2)
        np.testing.assert_allclose(
            p.predict_probs(["what is this"], feats),
            ref.predict_probs(["what is this"], feats), atol=1e-5)

    def test_latency_buckets(self, setup):
        """With latency_buckets, a request pads to the smallest bucket
        that fits; results must equal the max_batch-padded path exactly
        (pad rows never leak — the masks zero them out)."""
        cfg, tok, i2a, params = setup
        flat = Predictor(cfg, params, tok, i2a, max_batch=4)
        bucketed = Predictor(cfg, params, tok, i2a, max_batch=4,
                             latency_buckets=(1, 2))
        feats = np.random.default_rng(6).normal(
            size=(3, 6, 16)).astype(np.float32)
        qs = ["what is this", "is the cat red", "what color"]
        for n in (1, 2, 3):
            np.testing.assert_allclose(
                bucketed.predict_probs(qs[:n], feats[:n]),
                flat.predict_probs(qs[:n], feats[:n]), atol=1e-5)
        with pytest.raises(AssertionError):
            Predictor(cfg, params, tok, i2a, max_batch=4,
                      latency_buckets=(8,))

    def test_int8_engine(self, setup):
        """Predictor(engine="int8") (the opt-in quantized serving path,
        docs/PERFORMANCE.md) agrees with the plain engine on top-1 and
        stays within the documented logit perturbation on CPU (the XLA
        int8 structure — the megakernel twin is gated to TPU)."""
        cfg, tok, i2a, params = setup
        plain = Predictor(cfg, params, tok, i2a, max_batch=4)
        quant = Predictor(cfg, params, tok, i2a, max_batch=4,
                          engine="int8")
        feats = np.random.default_rng(4).normal(
            size=(3, 6, 16)).astype(np.float32)
        qs = ["what is this", "is the cat red", "what color"]
        a = plain.predict_probs(qs, feats)
        b = quant.predict_probs(qs, feats)
        assert a.shape == b.shape
        assert np.abs(a - b).max() < 0.05
        assert (a.argmax(-1) == b.argmax(-1)).all()

    def test_from_checkpoint_engine_passthrough(self, setup, tmp_path):
        cfg, tok, i2a, params = setup
        pkl = str(tmp_path / "model_int8.pkl")
        ckpt_mod.export_torch_checkpoint(params, pkl)
        p = Predictor.from_checkpoint(pkl, cfg, tok, i2a, max_batch=2,
                                      engine="int8")
        feats = np.random.default_rng(5).normal(
            size=(1, 5, 16)).astype(np.float32)
        ref = Predictor(cfg, params, tok, i2a, max_batch=2, engine="int8")
        np.testing.assert_allclose(
            p.predict_probs(["what is this"], feats),
            ref.predict_probs(["what is this"], feats), atol=1e-5)

    def test_from_orbax_checkpoint(self, setup, tmp_path):
        cfg, tok, i2a, params = setup
        tx = make_optimizer(cfg, data_size=64)
        state = TrainState.create(params, tx, seed=0)
        path = ckpt_mod.save_checkpoint(state, str(tmp_path), "api", epoch=1)
        p = Predictor.from_checkpoint(path, cfg, tok, i2a, max_batch=2)
        feats = np.random.default_rng(3).normal(
            size=(1, 5, 16)).astype(np.float32)
        out = p.answer(["is this a cat"], feats)
        assert len(out) == 1


class TestPredictorMesh:
    """Pod-slice serving: Predictor(mesh=...) splits every request batch
    over a pure-dp mesh (8 virtual CPU devices via conftest)."""

    def test_plain_dp8_matches_single_device(self, setup):
        from mcan_vqa_tpu.parallel.mesh import make_mesh
        cfg, tok, i2a, params = setup
        mesh = make_mesh({"data": 8, "model": 1})
        p1 = Predictor(cfg, params, tok, i2a, max_batch=8, engine="plain")
        pm = Predictor(cfg, params, tok, i2a, max_batch=8, engine="plain",
                       mesh=mesh)
        rng = np.random.default_rng(7)
        feats = rng.normal(size=(3, 6, 16)).astype(np.float32)
        qs = ["what is this", "is the cat red", "what color"]
        np.testing.assert_allclose(pm.predict_probs(qs, feats),
                                   p1.predict_probs(qs, feats), atol=1e-5)

    def test_fused_dp8_matches_single_device(self, setup):
        """The fused (megakernel) engine runs per data shard under
        shard_map — interpret-mode kernels on the CPU mesh."""
        from mcan_vqa_tpu.parallel.mesh import make_mesh
        cfg, tok, i2a, params = setup
        mesh = make_mesh({"data": 8, "model": 1})
        p1 = Predictor(cfg, params, tok, i2a, max_batch=8, engine="fused")
        pm = Predictor(cfg, params, tok, i2a, max_batch=8, engine="fused",
                       mesh=mesh)
        rng = np.random.default_rng(8)
        feats = rng.normal(size=(2, 6, 16)).astype(np.float32)
        qs = ["what is this", "is the cat red"]
        np.testing.assert_allclose(pm.predict_probs(qs, feats),
                                   p1.predict_probs(qs, feats),
                                   atol=2e-2)  # bf16 matmuls, summed per shard

    def test_calibrated_fused_dp8_matches_single_device(self, setup):
        """act_calibration composes with mesh serving: the static-scale
        engine runs per data shard under shard_map and matches the
        single-device calibrated predictor."""
        from mcan_vqa_tpu.parallel.mesh import make_mesh
        cfg, tok, i2a, params = setup
        rng = np.random.default_rng(9)
        cal_feats = rng.normal(size=(4, 6, 16)).astype(np.float32)
        cal_qs = ["what is this", "is the cat red", "what color",
                  "how many"]
        mesh = make_mesh({"data": 8, "model": 1})
        p1 = Predictor(cfg, params, tok, i2a, max_batch=8, engine="fused",
                       act_calibration=(cal_qs, cal_feats))
        pm = Predictor(cfg, params, tok, i2a, max_batch=8, engine="fused",
                       act_calibration=(cal_qs, cal_feats), mesh=mesh)
        feats = rng.normal(size=(2, 6, 16)).astype(np.float32)
        qs = ["what is this", "is the cat red"]
        np.testing.assert_allclose(pm.predict_probs(qs, feats),
                                   p1.predict_probs(qs, feats),
                                   atol=2e-2)

    def test_indivisible_bucket_rejected(self, setup):
        from mcan_vqa_tpu.parallel.mesh import make_mesh
        cfg, tok, i2a, params = setup
        mesh = make_mesh({"data": 8, "model": 1})
        with pytest.raises(AssertionError):
            Predictor(cfg, params, tok, i2a, max_batch=8, engine="plain",
                      latency_buckets=(2,), mesh=mesh)
        with pytest.raises(AssertionError):
            Predictor(cfg, params, tok, i2a, max_batch=12, engine="plain",
                      mesh=mesh)

    def test_tp_mesh_rejected(self, setup):
        from mcan_vqa_tpu.parallel.mesh import make_mesh
        cfg, tok, i2a, params = setup
        mesh = make_mesh({"data": 4, "model": 2})
        with pytest.raises(AssertionError):
            Predictor(cfg, params, tok, i2a, max_batch=8, engine="plain",
                      mesh=mesh)


def test_latency_bucket_equal_to_max_batch_is_tolerated():
    """Regression: the serve CLI's default latency_buckets (1, 8) must
    compose with --max_batch 8 — a bucket equal to max_batch is
    redundant, not an assertion failure (found by a live TPU smoke of
    cli/serve.py)."""
    import jax
    import numpy as np

    from mcan_vqa_tpu.api import Predictor
    from mcan_vqa_tpu.configs import Config
    from mcan_vqa_tpu.models.net import build_mcan

    cfg = Config(hidden_size=32, layer=1, multi_head=4, flat_mlp_size=16,
                 flat_out_size=32, img_feat_size=24, img_feat_pad_size=10,
                 max_token=8, use_glove=False).finalize()
    tok = {"PAD": 0, "UNK": 1, "cat": 2}
    model = build_mcan(cfg, token_size=len(tok), answer_size=7)
    img = np.zeros((1, 10, 24), np.float32)
    ques = np.array([[2, 0, 0, 0, 0, 0, 0, 0]], np.int32)
    params = model.init({"params": jax.random.PRNGKey(0)}, img, ques)[
        "params"]
    p = Predictor(cfg, params, tok, {str(i): str(i) for i in range(7)},
                  max_batch=8, engine="plain", latency_buckets=(1, 8))
    assert p._buckets == (1, 8)
    probs = p.predict_probs(["cat"], [img[0] + 1.0])
    assert probs.shape == (1, 7)
    # > max_batch is still a user error
    import pytest
    with pytest.raises(AssertionError):
        Predictor(cfg, params, tok, {"0": "0"}, max_batch=8,
                  engine="plain", latency_buckets=(16,))
