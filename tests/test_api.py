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

    def test_int4_latency_engine(self, setup):
        """Predictor(engine="int4"): the weight-streaming latency engine
        (qffn level 5 — int4 FFN+qkv with grouped scales). Calibrated at
        construction it serves int4 immediately; its answers agree with
        the fused engine (the accuracy gate proper is
        tests/test_quant.py::TestInt4LatencyEngine on trained weights)."""
        cfg, tok, i2a, params = setup
        rng = np.random.default_rng(2)
        feats = rng.normal(size=(4, 8, 16)).astype(np.float32)
        qs = ["what color is the cat", "is the dog red",
              "what is blue", "is the cat 2"]
        p_ref = Predictor(cfg, params, tok, i2a, max_batch=4,
                          engine="fused")
        p_i4 = Predictor(cfg, params, tok, i2a, max_batch=4,
                         engine="int4", act_calibration=(qs, feats))
        assert p_i4.engine == "int4"
        # the prepared tree actually carries packed int4 FFN weights
        qf = p_i4.params["backbone"]["dec_0"]["_qffn"]
        assert "w1_p" in qf and "wqkv_p" in qf
        pr_r = p_ref.predict_probs(qs, feats)
        pr_4 = p_i4.predict_probs(qs, feats)
        assert np.abs(pr_4 - pr_r).max() < 0.06
        assert (pr_4.argmax(1) == pr_r.argmax(1)).all()

    def test_int4_without_any_calibration_rejected(self, setup):
        """engine="int4" with calibration fully disabled cannot ever
        build its engine — must be a loud construction error."""
        cfg, tok, i2a, params = setup
        with pytest.raises(ValueError, match="int4"):
            Predictor(cfg, params, tok, i2a, max_batch=2, engine="int4",
                      auto_calibrate=0)

    def test_q8aux_without_any_calibration_rejected(self, setup):
        """q8aux=True with calibration fully disabled can never activate
        its aux sites — the dynamic engine would serve forever while the
        deployer believes the +5.2% aux sites are live. Must be a loud
        construction error, mirroring engine="int4" (ADVICE r4)."""
        cfg, tok, i2a, params = setup
        with pytest.raises(ValueError, match="q8aux"):
            Predictor(cfg, params, tok, i2a, max_batch=2, engine="fused",
                      q8aux=True, auto_calibrate=0)

    def test_q8aux_predictor(self, setup):
        """Predictor(q8aux=True) + a calibration sample attaches the
        static-int8 AUX weight sites (decoder cross-kv, AttFlat merges,
        head) to the calibrated engine; answers agree with the plain
        calibrated engine (gate proper:
        tests/test_quant.py::test_q8aux_engine_random_init). Measured
        +5.2% at MCAN-large B=1 over the calibrated level-3 engine."""
        cfg, tok, i2a, params = setup
        rng = np.random.default_rng(5)
        feats = rng.normal(size=(4, 8, 16)).astype(np.float32)
        qs = ["what color is the cat", "is the dog red",
              "what is blue", "is the cat 2"]
        p_ref = Predictor(cfg, params, tok, i2a, max_batch=4,
                          engine="fused", act_calibration=(qs, feats))
        p_aux = Predictor(cfg, params, tok, i2a, max_batch=4,
                          engine="fused", act_calibration=(qs, feats),
                          q8aux=True)
        assert "_q8aux" in p_aux.params
        assert "_q8aux" not in p_ref.params
        pr_r = p_ref.predict_probs(qs, feats)
        pr_a = p_aux.predict_probs(qs, feats)
        assert np.abs(pr_a - pr_r).max() < 0.06
        assert (pr_a.argmax(1) == pr_r.argmax(1)).all()

    def test_q8aux_composes_with_int4(self, setup):
        """q8aux composes with the int4 latency engine (measured NEUTRAL
        on top of level 5 at large B=1 — the byte savings overlap — but
        the combination must build and agree)."""
        cfg, tok, i2a, params = setup
        rng = np.random.default_rng(6)
        feats = rng.normal(size=(4, 8, 16)).astype(np.float32)
        qs = ["what color is the cat", "is the dog red",
              "what is blue", "is the cat 2"]
        p_ref = Predictor(cfg, params, tok, i2a, max_batch=4,
                          engine="fused")
        p = Predictor(cfg, params, tok, i2a, max_batch=4, engine="int4",
                      act_calibration=(qs, feats), q8aux=True)
        assert "_q8aux" in p.params
        qf = p.params["backbone"]["dec_0"]["_qffn"]
        assert "w1_p" in qf    # int4 packing still present
        pr = p.predict_probs(qs, feats)
        pr_r = p_ref.predict_probs(qs, feats)
        assert np.abs(pr - pr_r).max() < 0.08
        assert (pr.argmax(1) == pr_r.argmax(1)).all()

    def test_q8aux_rejected_on_non_fused_engines(self, setup):
        """q8aux sites exist only in the calibrated fused/int4 engines:
        explicit plain/int8 is a config error; 'auto' resolving to plain
        (CPU) downgrades to a warning."""
        cfg, tok, i2a, params = setup
        with pytest.raises(ValueError, match="q8aux"):
            Predictor(cfg, params, tok, i2a, max_batch=2, engine="plain",
                      q8aux=True)
        with pytest.warns(UserWarning, match="q8aux ignored"):
            p = Predictor(cfg, params, tok, i2a, max_batch=2,
                          engine="auto", q8aux=True)
        assert p.engine == "plain" and not p._q8aux

    def test_q8aux_stale_side_file_rejected(self, setup):
        """q8aux=True with precomputed act_scales that lack the "aux"
        tuple (a pre-r4 Trainer side file) must fail loudly, not
        silently serve without the aux sites."""
        cfg, tok, i2a, params = setup
        from mcan_vqa_tpu.ops.quant import calibrate_qffn_act_scales
        from mcan_vqa_tpu.ops.serving import prepare_production_params
        rng = np.random.default_rng(7)
        feats = rng.normal(size=(2, 8, 16)).astype(np.float32)
        qs = ["what color", "is the dog red"]
        prepared = prepare_production_params(params, cfg.layer,
                                             cfg.multi_head, qffn=3)
        ques = text_mod.encode_questions(qs, tok, cfg.max_token)
        scales = calibrate_qffn_act_scales(prepared, feats, ques,
                                           cfg.layer, cfg.multi_head)
        assert "aux" not in scales
        with pytest.raises(ValueError, match="aux"):
            Predictor(cfg, params, tok, i2a, max_batch=2, engine="fused",
                      act_scales=scales, q8aux=True)

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


class TestAutoRouting:
    """engine="auto" routes each compiled latency bucket to its measured
    champion (api.resolve_auto_routes — the docs/PERFORMANCE.md regime
    table as code). The decision table is pure; the integration tests
    pin api._default_backend to "tpu" so the TPU routing path runs on
    the CPU CI (the engines themselves build in interpret mode)."""

    def test_resolve_table(self):
        from mcan_vqa_tpu import api
        # uncalibrated: no static scales exist, everything stays dynamic
        assert api.resolve_auto_routes(1024, (1, 8, 64), False) == \
            {1: "base", 8: "base", 64: "base"}
        # large calibrated: int4 only at single-query buckets (<= 4);
        # B=64/256 measured -12..-19% (r5) stay on level 3
        assert api.resolve_auto_routes(1024, (1, 4, 8, 64, 256), True) == \
            {1: "int4", 4: "int4", 8: "base", 64: "base", 256: "base"}
        # small calibrated: q8aux (+3.2% at B=1, r5) only when the
        # calibration source can supply the "aux" tuple
        assert api.resolve_auto_routes(512, (1, 8), True,
                                       aux_available=True) == \
            {1: "q8aux", 8: "base"}
        assert api.resolve_auto_routes(512, (1, 8), True,
                                       aux_available=False) == \
            {1: "base", 8: "base"}
        # large never routes q8aux (neutral stacked on int4, 14 rounds)
        assert api.resolve_auto_routes(1024, (1,), True,
                                       aux_available=True) == {1: "int4"}

    def _tpu_auto(self, monkeypatch, min_hidden=None):
        from mcan_vqa_tpu import api
        monkeypatch.setattr(api, "_default_backend", lambda: "tpu")
        if min_hidden is not None:
            monkeypatch.setattr(api, "INT4_MIN_HIDDEN", min_hidden)

    def test_auto_routes_int4_at_large(self, setup, monkeypatch):
        """Calibrated auto at "large" width (threshold pinned below the
        test cfg's 32): tiny buckets serve the int4 engine, max_batch
        serves the level-3 base — and both agree on top-1."""
        cfg, tok, i2a, params = setup
        self._tpu_auto(monkeypatch, min_hidden=16)
        rng = np.random.default_rng(11)
        feats = rng.normal(size=(4, 8, 16)).astype(np.float32)
        qs = ["what color is the cat", "is the dog red",
              "what is blue", "is the cat 2"]
        p = Predictor(cfg, params, tok, i2a, max_batch=8,
                      latency_buckets=(1, 2), engine="auto",
                      act_calibration=(qs, feats))
        assert p.engine == "fused"
        assert p.routes == {1: "int4", 2: "int4", 8: "base"}
        live, _ = p._live
        # the routed int4 variant really is the level-5 build (packed
        # int4 FFN+qkv weights), the base really isn't
        qf = live["int4"][1]["backbone"]["dec_0"]["_qffn"]
        assert "w1_p" in qf and "wqkv_p" in qf
        assert "w1_p" not in live["base"][1]["backbone"]["dec_0"]["_qffn"]
        base_probs = p.predict_probs(qs, feats)          # bucket 4: base
        one = p.predict_probs(qs[:1], feats[:1])         # bucket 1: int4
        assert one.shape == (1, 5)
        assert one.argmax(1)[0] == base_probs.argmax(1)[0]

    def test_auto_routes_q8aux_at_small(self, setup, monkeypatch):
        """Calibrated auto below the int4 width threshold: tiny buckets
        serve the q8aux variant (its prepared tree carries the aux
        sites; the base tree does not)."""
        cfg, tok, i2a, params = setup
        self._tpu_auto(monkeypatch)          # INT4_MIN_HIDDEN stays 1024
        rng = np.random.default_rng(12)
        feats = rng.normal(size=(4, 8, 16)).astype(np.float32)
        qs = ["what color is the cat", "is the dog red",
              "what is blue", "is the cat 2"]
        p = Predictor(cfg, params, tok, i2a, max_batch=8,
                      latency_buckets=(1,), engine="auto",
                      act_calibration=(qs, feats))
        assert p.routes == {1: "q8aux", 8: "base"}
        live, _ = p._live
        assert "_q8aux" in live["q8aux"][1]
        assert "_q8aux" not in live["base"][1]
        one = p.predict_probs(qs[:1], feats[:1])
        full = p.predict_probs(qs, feats)
        assert one.argmax(1)[0] == full.argmax(1)[0]

    def test_auto_stored_scales_without_aux_fall_back(self, setup,
                                                      monkeypatch):
        """Stored act_scales lacking the "aux" tuple (a pre-r4 side
        file) cannot build the q8aux variant: small tiny buckets fall
        back to the base engine instead of crashing."""
        cfg, tok, i2a, params = setup
        self._tpu_auto(monkeypatch)
        from mcan_vqa_tpu.ops.quant import calibrate_qffn_act_scales
        from mcan_vqa_tpu.ops.serving import prepare_production_params
        rng = np.random.default_rng(13)
        feats = rng.normal(size=(2, 8, 16)).astype(np.float32)
        qs = ["what color", "is the dog red"]
        prepared = prepare_production_params(params, cfg.layer,
                                             cfg.multi_head, qffn=3)
        ques = text_mod.encode_questions(qs, tok, cfg.max_token)
        scales = calibrate_qffn_act_scales(prepared, feats, ques,
                                           cfg.layer, cfg.multi_head)
        assert "aux" not in scales
        p = Predictor(cfg, params, tok, i2a, max_batch=2,
                      latency_buckets=(1,), engine="auto",
                      act_scales=scales)
        assert p.routes == {1: "base", 2: "base"}

    def test_auto_uncalibrated_warns_and_serves_base(self, setup,
                                                     monkeypatch):
        """auto with every calibration source disabled can never reach
        the measured champions — must warn loudly (VERDICT r4) and keep
        every bucket on the dynamic base engine."""
        cfg, tok, i2a, params = setup
        self._tpu_auto(monkeypatch, min_hidden=16)
        with pytest.warns(UserWarning, match="no calibration source"):
            p = Predictor(cfg, params, tok, i2a, max_batch=2,
                          latency_buckets=(1,), engine="auto",
                          auto_calibrate=0)
        assert p.routes == {1: "base", 2: "base"}

    def test_explicit_engines_never_route(self, setup, monkeypatch):
        """Routing is an engine="auto" behavior only: an explicit
        engine="fused" with calibration keeps every bucket on its one
        engine, even at "large" width on TPU."""
        cfg, tok, i2a, params = setup
        self._tpu_auto(monkeypatch, min_hidden=16)
        feats = np.random.default_rng(14).normal(
            size=(2, 8, 16)).astype(np.float32)
        qs = ["what color", "is the dog red"]
        p = Predictor(cfg, params, tok, i2a, max_batch=2,
                      latency_buckets=(1,), engine="fused",
                      act_calibration=(qs, feats))
        assert p.routes == {1: "base", 2: "base"}

    def test_online_calibration_swap_installs_routes(self, setup,
                                                     monkeypatch):
        """The online-calibration rebuild goes through the same routed
        construction: after the swap, tiny buckets route to the measured
        champion exactly as a construction-time calibration would."""
        cfg, tok, i2a, params = setup
        self._tpu_auto(monkeypatch, min_hidden=16)
        p = Predictor(cfg, params, tok, i2a, max_batch=2,
                      latency_buckets=(1,), engine="auto",
                      auto_calibrate=2)
        assert p.routes == {1: "base", 2: "base"}
        feats = np.random.default_rng(15).normal(
            size=(2, 8, 16)).astype(np.float32)
        p.predict_probs(["what color", "is the dog red"], feats)
        assert p.wait_calibrated(timeout=120)
        assert p.calibration["state"] == "calibrated"
        assert p.routes == {1: "int4", 2: "int4"}
        out = p.predict_probs(["what color"], feats[:1])
        assert out.shape == (1, 5)


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

    def test_int4_dp8_matches_single_device(self, setup):
        """engine="int4" on a mesh: the nibble-packed weight leaves and
        grouped scales replicate like any other prepared-tree leaf; the
        sharded engine matches the single-device int4 predictor."""
        from mcan_vqa_tpu.parallel.mesh import make_mesh
        cfg, tok, i2a, params = setup
        rng = np.random.default_rng(10)
        cal_feats = rng.normal(size=(4, 8, 16)).astype(np.float32)
        cal_qs = ["what is this", "is the cat red", "what color",
                  "how many"]
        mesh = make_mesh({"data": 8, "model": 1})
        p1 = Predictor(cfg, params, tok, i2a, max_batch=8, engine="int4",
                       act_calibration=(cal_qs, cal_feats))
        pm = Predictor(cfg, params, tok, i2a, max_batch=8, engine="int4",
                       act_calibration=(cal_qs, cal_feats), mesh=mesh)
        feats = rng.normal(size=(2, 8, 16)).astype(np.float32)
        qs = ["what is this", "is the cat red"]
        np.testing.assert_allclose(pm.predict_probs(qs, feats),
                                   p1.predict_probs(qs, feats),
                                   atol=2e-2)

    def test_q8aux_dp8_matches_single_device(self, setup):
        """q8aux on a mesh: the aux int8 site weights + scale tuple
        replicate over the mesh; sharded output matches single-device."""
        from mcan_vqa_tpu.parallel.mesh import make_mesh
        cfg, tok, i2a, params = setup
        rng = np.random.default_rng(11)
        cal_feats = rng.normal(size=(4, 8, 16)).astype(np.float32)
        cal_qs = ["what is this", "is the cat red", "what color",
                  "how many"]
        mesh = make_mesh({"data": 8, "model": 1})
        p1 = Predictor(cfg, params, tok, i2a, max_batch=8, engine="fused",
                       act_calibration=(cal_qs, cal_feats), q8aux=True)
        pm = Predictor(cfg, params, tok, i2a, max_batch=8, engine="fused",
                       act_calibration=(cal_qs, cal_feats), q8aux=True,
                       mesh=mesh)
        feats = rng.normal(size=(2, 8, 16)).astype(np.float32)
        qs = ["what is this", "is the cat red"]
        np.testing.assert_allclose(pm.predict_probs(qs, feats),
                                   p1.predict_probs(qs, feats),
                                   atol=2e-2)

    def test_auto_routed_mesh(self, setup, monkeypatch):
        """Auto-routing composes with mesh serving: each routed engine
        shard_maps over the dp mesh, buckets stay mesh-divisible."""
        from mcan_vqa_tpu import api
        from mcan_vqa_tpu.parallel.mesh import make_mesh
        cfg, tok, i2a, params = setup
        monkeypatch.setattr(api, "_default_backend", lambda: "tpu")
        monkeypatch.setattr(api, "INT4_MIN_HIDDEN", 16)
        rng = np.random.default_rng(12)
        cal_feats = rng.normal(size=(4, 8, 16)).astype(np.float32)
        cal_qs = ["what is this", "is the cat red", "what color",
                  "how many"]
        mesh = make_mesh({"data": 2, "model": 1})
        pm = Predictor(cfg, params, tok, i2a, max_batch=8,
                       latency_buckets=(2, 4), engine="auto", mesh=mesh,
                       act_calibration=(cal_qs, cal_feats))
        assert pm.routes == {2: "int4", 4: "int4", 8: "base"}
        p1 = Predictor(cfg, params, tok, i2a, max_batch=8, engine="fused",
                       act_calibration=(cal_qs, cal_feats))
        feats = rng.normal(size=(2, 8, 16)).astype(np.float32)
        qs = ["what is this", "is the cat red"]
        np.testing.assert_allclose(pm.predict_probs(qs, feats),
                                   p1.predict_probs(qs, feats),
                                   atol=6e-2)

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


class TestAutoCalibration:
    """Online static-scale calibration (Predictor(auto_calibrate=N)):
    the fused engine serves dynamic-quant from request one, buffers the
    first N finite request samples, calibrates in the background, and
    swaps in the level-3 static-scale engine (the production default —
    docs/PERFORMANCE.md measured it +13.9%/+16% over dynamic quant)."""

    def _qs_feats(self, n, seed=11):
        rng = np.random.default_rng(seed)
        feats = rng.normal(size=(n, 8, 16)).astype(np.float32)
        qs = (["what color is the cat", "is the dog red",
               "what is blue", "is the cat 2"] * ((n + 3) // 4))[:n]
        return qs, feats

    def test_swap_matches_explicit_calibration(self, setup):
        """After N served samples the auto-calibrated predictor must be
        running EXACTLY the engine an explicit act_calibration on those
        same samples builds (same scales, same level — same program)."""
        cfg, tok, i2a, params = setup
        qs, feats = self._qs_feats(4)
        p = Predictor(cfg, params, tok, i2a, max_batch=4, engine="fused",
                      auto_calibrate=4)
        assert p.calibration["state"] == "collecting"
        p.predict_probs(qs[:2], feats[:2])
        assert p.calibration == {"state": "collecting", "samples": 2,
                                 "target": 4}
        p.predict_probs(qs[2:], feats[2:])
        assert p.wait_calibrated(timeout=300.0)
        assert p.calibration["state"] == "calibrated"

        ref = Predictor(cfg, params, tok, i2a, max_batch=4, engine="fused",
                        act_calibration=(qs, feats))
        check_qs, check_feats = self._qs_feats(3, seed=12)
        got = p.predict_probs(check_qs, check_feats)
        want = ref.predict_probs(check_qs, check_feats)
        np.testing.assert_array_equal(got, want)

    def test_pre_swap_serves_dynamic_engine(self, setup):
        """Until the buffer fills, requests run the dynamic-quant engine
        bit-for-bit (auto-calibration must not perturb cold traffic)."""
        cfg, tok, i2a, params = setup
        qs, feats = self._qs_feats(2)
        p = Predictor(cfg, params, tok, i2a, max_batch=4, engine="fused",
                      auto_calibrate=100)
        dyn = Predictor(cfg, params, tok, i2a, max_batch=4, engine="fused",
                        auto_calibrate=0)
        np.testing.assert_array_equal(p.predict_probs(qs, feats),
                                      dyn.predict_probs(qs, feats))
        assert p.calibration["state"] == "collecting"
        assert dyn.calibration["state"] == "off"

    def test_non_finite_samples_excluded(self, setup):
        """A NaN/Inf request must not enter the calibration buffer (it
        would bake NaN scales into every int8 site); finite traffic
        still fills the buffer and the swap succeeds."""
        cfg, tok, i2a, params = setup
        qs, feats = self._qs_feats(2)
        bad = feats.copy()
        bad[0, 0, 0] = np.inf
        bad[1, 2, 3] = np.nan
        p = Predictor(cfg, params, tok, i2a, max_batch=4, engine="fused",
                      auto_calibrate=2)
        p.predict_probs(qs, bad)  # serves fine, buffers nothing
        assert p.calibration["samples"] == 0
        p.predict_probs(qs, feats)
        assert p.wait_calibrated(timeout=300.0)
        assert p.calibration["state"] == "calibrated"

    def test_calibration_failure_keeps_serving(self, setup):
        """A calibration failure must leave the dynamic engine serving
        and is NOT terminal: the drained samples return to the buffer,
        the state returns to 'collecting' (with the error recorded and
        the auto-trigger target backed off), and a later calibrate_now
        retry can still succeed (ADVICE r3: no leaked _raw_params, no
        dead-end state)."""
        cfg, tok, i2a, params = setup
        qs, feats = self._qs_feats(2)
        p = Predictor(cfg, params, tok, i2a, max_batch=4, engine="fused",
                      auto_calibrate=50)
        before = p.predict_probs(qs, feats)

        real_build = p._build_fused

        def boom(params, act_inputs, act_scales=None):
            raise RuntimeError("synthetic calibration failure")

        p._build_fused = boom
        # calibrate_now is synchronous: surface the error to the caller
        with pytest.raises(RuntimeError, match="synthetic"):
            p.calibrate_now()
        cal = p.calibration
        assert cal["state"] == "collecting"      # retryable, not terminal
        assert "synthetic" in cal["error"]
        assert cal["samples"] == 2               # buffer restored
        assert cal["target"] > 50                # auto-retry backed off
        np.testing.assert_array_equal(p.predict_probs(qs, feats), before)
        # retry with the real builder succeeds from the restored buffer
        p._build_fused = real_build
        p.calibrate_now()
        assert p.calibration["state"] == "calibrated"
        assert "error" not in p.calibration

    def test_calibrate_now_forces_early_swap(self, setup):
        """calibrate_now() swaps synchronously from a partial buffer —
        for low-traffic deployments and pre-export freezing."""
        cfg, tok, i2a, params = setup
        qs, feats = self._qs_feats(3)
        p = Predictor(cfg, params, tok, i2a, max_batch=4, engine="fused",
                      auto_calibrate=1000)
        with pytest.raises(RuntimeError, match="no calibration samples"):
            p.calibrate_now()
        p.predict_probs(qs, feats)
        p.calibrate_now()
        assert p.calibration["state"] == "calibrated"
        ref = Predictor(cfg, params, tok, i2a, max_batch=4, engine="fused",
                        act_calibration=(qs, feats))
        np.testing.assert_array_equal(p.predict_probs(qs, feats),
                                      ref.predict_probs(qs, feats))
        with pytest.raises(RuntimeError, match="calibrated"):
            p.calibrate_now()

    def test_negative_auto_calibrate_rejected(self, setup):
        """auto_calibrate=-1 would pass the truthiness check and trigger
        a calibration from the very first request's own rows (ADVICE
        r3) — reject it at construction."""
        cfg, tok, i2a, params = setup
        with pytest.raises(ValueError, match="auto_calibrate"):
            Predictor(cfg, params, tok, i2a, max_batch=4, engine="fused",
                      auto_calibrate=-1)

    def test_act_scales_false_sentinel_direct(self, setup):
        """act_scales=False is from_checkpoint's "skip the side-file
        auto-load" sentinel; passed to Predictor() directly it must mean
        None (uncalibrated, online calibration armed), not be mistaken
        for a real scales dict by the engine builders."""
        cfg, tok, i2a, params = setup
        p = Predictor(cfg, params, tok, i2a, max_batch=4, engine="fused",
                      act_scales=False)
        assert p.calibration["state"] == "collecting"   # not "calibrated"
        assert set(p.routes.values()) == {"base"}
        qs, feats = self._qs_feats(2)
        assert p.predict_probs(qs, feats).shape[0] == 2

    def test_precomputed_act_scales_match_calibration_batch(self, setup):
        """Predictor(act_scales=<precomputed dict>) must build EXACTLY the
        engine act_calibration on the originating batch builds (the
        Trainer's checkpoint side file is just these floats persisted)."""
        cfg, tok, i2a, params = setup
        qs, feats = self._qs_feats(4)
        ref = Predictor(cfg, params, tok, i2a, max_batch=4, engine="fused",
                        act_calibration=(qs, feats))
        from mcan_vqa_tpu.ops.quant import calibrate_qffn_act_scales
        from mcan_vqa_tpu.ops.serving import prepare_production_params
        prepared = prepare_production_params(params, cfg.layer,
                                             cfg.multi_head, qffn=3)
        cques, cimg = ref._prep_inputs(qs, feats)
        scales = calibrate_qffn_act_scales(prepared, cimg, cques,
                                           cfg.layer, cfg.multi_head)
        p = Predictor(cfg, params, tok, i2a, max_batch=4, engine="fused",
                      act_scales=scales)
        assert p.calibration["state"] == "calibrated"
        check_qs, check_feats = self._qs_feats(3, seed=12)
        np.testing.assert_array_equal(p.predict_probs(check_qs, check_feats),
                                      ref.predict_probs(check_qs,
                                                        check_feats))

    def test_from_checkpoint_autoloads_side_file(self, setup, tmp_path):
        """from_checkpoint on an orbax dir with a Trainer-written
        ``.act_scales.json`` side file ships the calibrated engine with
        zero ritual; act_scales=False opts out (dynamic + collecting)."""
        from mcan_vqa_tpu.train.optim import make_optimizer
        from mcan_vqa_tpu.train.train_state import TrainState
        cfg, tok, i2a, params = setup
        tx = make_optimizer(cfg, data_size=64)
        state = TrainState.create(params, tx, seed=0, step=1)
        path = ckpt_mod.save_checkpoint(state, str(tmp_path), "v", epoch=1)

        qs, feats = self._qs_feats(4)
        from mcan_vqa_tpu.ops.quant import calibrate_qffn_act_scales
        from mcan_vqa_tpu.ops.serving import prepare_production_params
        prepared = prepare_production_params(params, cfg.layer,
                                             cfg.multi_head, qffn=3)
        ques, img = text_mod.encode_questions(qs, tok, cfg.max_token), feats
        scales = calibrate_qffn_act_scales(prepared, img, ques,
                                           cfg.layer, cfg.multi_head)
        ckpt_mod.save_act_scales(path, scales)

        p = Predictor.from_checkpoint(path, cfg, tok, i2a, max_batch=4,
                                      engine="fused")
        assert p.calibration["state"] == "calibrated"
        ref = Predictor(cfg, params, tok, i2a, max_batch=4, engine="fused",
                        act_scales=scales)
        check_qs, check_feats = self._qs_feats(3, seed=12)
        np.testing.assert_array_equal(
            p.predict_probs(check_qs, check_feats),
            ref.predict_probs(check_qs, check_feats))

        popt = Predictor.from_checkpoint(path, cfg, tok, i2a, max_batch=4,
                                         engine="fused", act_scales=False)
        assert popt.calibration["state"] == "collecting"

    def test_from_checkpoint_int4_autoloads_side_file(self, setup,
                                                      tmp_path):
        """engine="int4" gets the same zero-ritual deployment: the
        Trainer-stored ``.act_scales.json`` satisfies int4's calibration
        requirement, so from_checkpoint builds the packed-weight latency
        engine immediately (no dynamic-serving phase, no online swap)."""
        from mcan_vqa_tpu.train.optim import make_optimizer
        from mcan_vqa_tpu.train.train_state import TrainState
        cfg, tok, i2a, params = setup
        tx = make_optimizer(cfg, data_size=64)
        state = TrainState.create(params, tx, seed=0, step=1)
        path = ckpt_mod.save_checkpoint(state, str(tmp_path), "v4", epoch=1)

        qs, feats = self._qs_feats(4)
        from mcan_vqa_tpu.ops.quant import calibrate_qffn_act_scales
        from mcan_vqa_tpu.ops.serving import prepare_production_params
        prepared = prepare_production_params(params, cfg.layer,
                                             cfg.multi_head, qffn=3)
        ques = text_mod.encode_questions(qs, tok, cfg.max_token)
        scales = calibrate_qffn_act_scales(prepared, feats, ques,
                                           cfg.layer, cfg.multi_head)
        ckpt_mod.save_act_scales(path, scales)

        p4 = Predictor.from_checkpoint(path, cfg, tok, i2a, max_batch=4,
                                       engine="int4")
        assert p4.engine == "int4"
        assert p4.calibration["state"] == "calibrated"
        qf = p4.params["backbone"]["dec_0"]["_qffn"]
        assert "w1_p" in qf and "wqkv_p" in qf
        ref = Predictor(cfg, params, tok, i2a, max_batch=4, engine="fused",
                        act_scales=scales)
        check_qs, check_feats = self._qs_feats(3, seed=12)
        pr_4 = p4.predict_probs(check_qs, check_feats)
        pr_r = ref.predict_probs(check_qs, check_feats)
        assert np.abs(pr_4 - pr_r).max() < 0.06
        assert (pr_4.argmax(1) == pr_r.argmax(1)).all()

    def test_from_checkpoint_q8aux_autoloads_side_file(self, setup,
                                                       tmp_path):
        """The Trainer's side file carries the "aux" scales (it attaches
        the aux sites before calibrating — trainer._save_serving_
        calibration), so Predictor.from_checkpoint(q8aux=True) is
        zero-ritual too."""
        from mcan_vqa_tpu.train.optim import make_optimizer
        from mcan_vqa_tpu.train.train_state import TrainState
        cfg, tok, i2a, params = setup
        tx = make_optimizer(cfg, data_size=64)
        state = TrainState.create(params, tx, seed=0, step=1)
        path = ckpt_mod.save_checkpoint(state, str(tmp_path), "va", epoch=1)

        qs, feats = self._qs_feats(4)
        from mcan_vqa_tpu.ops.quant import (calibrate_qffn_act_scales,
                                            prepare_q8aux_params)
        from mcan_vqa_tpu.ops.serving import prepare_production_params
        prepared = prepare_production_params(params, cfg.layer,
                                             cfg.multi_head, qffn=3)
        prepared["_q8aux"] = prepare_q8aux_params(prepared, cfg.layer)
        ques = text_mod.encode_questions(qs, tok, cfg.max_token)
        scales = calibrate_qffn_act_scales(prepared, feats, ques,
                                           cfg.layer, cfg.multi_head)
        assert "aux" in scales and len(scales["aux"]) == 4
        ckpt_mod.save_act_scales(path, scales)

        p = Predictor.from_checkpoint(path, cfg, tok, i2a, max_batch=4,
                                      engine="fused", q8aux=True)
        assert p.calibration["state"] == "calibrated"
        assert "_q8aux" in p.params
        # the same side file serves a non-aux build unchanged (the
        # "aux" tuple is ignored when q8aux is off)
        ref = Predictor.from_checkpoint(path, cfg, tok, i2a, max_batch=4,
                                        engine="fused")
        assert "_q8aux" not in ref.params
        check_qs, check_feats = self._qs_feats(3, seed=12)
        pr_a = p.predict_probs(check_qs, check_feats)
        pr_r = ref.predict_probs(check_qs, check_feats)
        assert np.abs(pr_a - pr_r).max() < 0.06
        assert (pr_a.argmax(1) == pr_r.argmax(1)).all()

    def test_auto_calibrate_on_mesh(self, setup):
        """The online swap re-places the calibrated tree on the serving
        mesh; post-swap results match the single-device calibrated
        predictor."""
        from mcan_vqa_tpu.parallel.mesh import make_mesh
        cfg, tok, i2a, params = setup
        qs, feats = self._qs_feats(8)
        mesh = make_mesh({"data": 8, "model": 1})
        pm = Predictor(cfg, params, tok, i2a, max_batch=8, engine="fused",
                       mesh=mesh, auto_calibrate=8)
        pm.predict_probs(qs, feats)
        assert pm.wait_calibrated(timeout=600.0)
        assert pm.calibration["state"] == "calibrated"
        p1 = Predictor(cfg, params, tok, i2a, max_batch=8, engine="fused",
                       act_calibration=(qs, feats))
        np.testing.assert_allclose(pm.predict_probs(qs, feats),
                                   p1.predict_probs(qs, feats), atol=2e-2)
