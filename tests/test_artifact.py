"""AOT serving-artifact tests: jax.export roundtrip of the Predictor
forward (StableHLO blobs + params + vocab in one directory), loaded by
ArtifactPredictor without touching the model-building code."""

import io
import json
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mcan_vqa_tpu import artifact as art
from mcan_vqa_tpu.api import Predictor
from mcan_vqa_tpu.configs import Config
from mcan_vqa_tpu.data import text as text_mod
from mcan_vqa_tpu.models.net import build_mcan


@pytest.fixture(scope="module")
def setup():
    cfg = Config(hidden_size=32, layer=1, multi_head=4, img_feat_size=16,
                 img_feat_pad_size=8, max_token=6, flat_out_size=32,
                 flat_mlp_size=16, compute_dtype="float32",
                 use_glove=False).finalize()
    tok, _ = text_mod.build_vocab(["what color is the cat dog red blue"])
    i2a = {str(i): a for i, a in
           enumerate(["yes", "no", "red", "blue", "2"])}
    model = build_mcan(cfg, token_size=len(tok), answer_size=5)
    img = np.zeros((1, 8, 16), np.float32)
    ques = np.zeros((1, 6), np.int32)
    params = model.init({"params": jax.random.PRNGKey(0)}, img,
                        ques)["params"]
    return cfg, tok, i2a, params


class TestArtifact:
    def test_roundtrip_matches_predictor(self, setup, tmp_path):
        """Exported artifact reproduces the live Predictor at every
        bucket size, including the answer-string decode."""
        cfg, tok, i2a, params = setup
        p = Predictor(cfg, params, tok, i2a, max_batch=4,
                      latency_buckets=(1,), engine="plain")
        d = str(tmp_path / "art")
        # cpu-only export keeps the test fast; the multi-platform default
        # is covered by test_plain_engine_default_platforms.
        p.export_artifact(d, platforms=("cpu",))
        ap = art.load_artifact(d)
        assert ap.max_batch == 4 and ap._buckets == (1, 4)

        feats = np.random.default_rng(0).normal(
            size=(3, 6, 16)).astype(np.float32)
        qs = ["what is this", "is the cat red", "what color"]
        for n in (1, 3):
            np.testing.assert_allclose(
                ap.predict_probs(qs[:n], feats[:n]),
                p.predict_probs(qs[:n], feats[:n]), atol=1e-6)
        assert ap.answer(qs, feats) == p.answer(qs, feats)
        assert ap.topk(qs, feats, k=3) == p.topk(qs, feats, k=3)
        with pytest.raises(AssertionError):
            ap.predict_probs(qs * 2, np.concatenate([feats, feats]))

    def test_plain_engine_default_platforms(self, setup, tmp_path):
        """The plain engine exports multi-platform (cpu, tpu) by default:
        one artifact serves both; the local cpu backend can still run it."""
        cfg, tok, i2a, params = setup
        p = Predictor(cfg, params, tok, i2a, max_batch=1, engine="plain")
        d = str(tmp_path / "art")
        p.export_artifact(d)
        meta = json.load(open(os.path.join(d, "meta.json")))
        assert meta["platforms"] == ["cpu", "tpu"]
        ap = art.load_artifact(d)
        feats = np.random.default_rng(1).normal(
            size=(1, 6, 16)).astype(np.float32)
        np.testing.assert_allclose(
            ap.predict_probs(["what color"], feats),
            p.predict_probs(["what color"], feats), atol=1e-6)

    def test_leaf_serialization_dtypes(self):
        """bf16/int8/f32 leaves survive the npz view-dance bitwise."""
        leaves = [
            jnp.arange(6, dtype=jnp.float32).reshape(2, 3),
            (jnp.arange(8, dtype=jnp.float32) / 3).astype(jnp.bfloat16),
            jnp.array([-128, 0, 127], dtype=jnp.int8),
        ]
        arrays, dtypes = art._leaves_to_npz(leaves)
        assert dtypes == ["float32", "bfloat16", "int8"]
        assert arrays["p1"].dtype == np.uint16  # bf16 stored as views
        buf = io.BytesIO()
        np.savez(buf, **arrays)
        buf.seek(0)
        back = art._leaves_from_npz(np.load(buf), dtypes)
        for a, b in zip(leaves, back):
            assert a.dtype == b.dtype and a.shape == b.shape
            assert jnp.array_equal(a, b)

    def test_routed_artifact_roundtrip(self, setup, tmp_path,
                                       monkeypatch):
        """An auto-routed Predictor (different engines on different
        buckets) freezes its full bucket->engine table: format-2
        artifacts carry one param set per routed engine and the loader
        dispatches each bucket to its own engine, reproducing the live
        Predictor at every bucket."""
        from mcan_vqa_tpu import api
        cfg, tok, i2a, params = setup
        monkeypatch.setattr(api, "_default_backend", lambda: "tpu")
        monkeypatch.setattr(api, "INT4_MIN_HIDDEN", 16)
        rng = np.random.default_rng(21)
        feats = rng.normal(size=(4, 8, 16)).astype(np.float32)
        qs = ["what color is the cat", "is the dog red",
              "what is blue", "is the cat 2"]
        p = Predictor(cfg, params, tok, i2a, max_batch=8,
                      latency_buckets=(1,), engine="auto",
                      act_calibration=(qs, feats))
        assert p.routes == {1: "int4", 8: "base"}
        d = str(tmp_path / "art_routed")
        p.export_artifact(d, platforms=("cpu",))
        meta = json.load(open(os.path.join(d, "meta.json")))
        assert meta["format_version"] == 2
        assert meta["routes"] == {"1": "int4", "8": "base"}
        assert os.path.exists(os.path.join(d, "params_int4.npz"))
        ap = art.load_artifact(d)
        # introspection parity with the live Predictor (serve /stats)
        assert ap.routes == p.routes
        for n in (1, 4):   # bucket 1 -> int4 engine, bucket 8 -> base
            np.testing.assert_allclose(
                ap.predict_probs(qs[:n], feats[:n]),
                p.predict_probs(qs[:n], feats[:n]), atol=1e-6)

    def test_format_version_check(self, setup, tmp_path):
        cfg, tok, i2a, params = setup
        p = Predictor(cfg, params, tok, i2a, max_batch=1, engine="plain")
        d = str(tmp_path / "art")
        p.export_artifact(d, platforms=("cpu",))
        meta_path = os.path.join(d, "meta.json")
        meta = json.load(open(meta_path))
        meta["format_version"] = 999
        json.dump(meta, open(meta_path, "w"))
        with pytest.raises(ValueError, match="format 999"):
            art.load_artifact(d)
