"""HTTP serving entrypoint tests: routes, wire formats, batching behavior,
error isolation, and the synthetic CLI bring-up path."""

import base64
import http.client
import json
import threading

import jax
import numpy as np
import pytest

from mcan_vqa_tpu.api import Predictor
from mcan_vqa_tpu.cli import serve as serve_mod
from mcan_vqa_tpu.configs import Config
from mcan_vqa_tpu.data import text as text_mod
from mcan_vqa_tpu.models.net import build_mcan


@pytest.fixture(scope="module")
def predictor():
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
    return Predictor(cfg, params, tok, i2a, max_batch=8)


@pytest.fixture(scope="module")
def server(predictor):
    srv, frontend = serve_mod.make_server(predictor, port=0,
                                          max_wait_ms=20.0)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    yield srv.server_address[:2]
    srv.shutdown()
    srv.server_close()
    frontend.close()
    t.join(timeout=10)


def _request(addr, method, path, payload=None):
    conn = http.client.HTTPConnection(*addr, timeout=120)
    body = json.dumps(payload) if payload is not None else None
    conn.request(method, path, body=body,
                 headers={"Content-Type": "application/json"})
    resp = conn.getresponse()
    out = json.loads(resp.read())
    conn.close()
    return resp.status, out


class TestRoutes:
    def test_healthz(self, server):
        status, out = _request(server, "GET", "/healthz")
        assert status == 200 and out == {"status": "ok"}

    def test_unknown_route_404(self, server):
        status, out = _request(server, "GET", "/nope")
        assert status == 404 and "error" in out
        status, out = _request(server, "POST", "/nope", {"x": 1})
        assert status == 404 and "error" in out

    def test_stats(self, server, predictor):
        status, out = _request(server, "GET", "/stats")
        assert status == 200
        assert out["max_batch"] == predictor.max_batch
        assert out["img_feat_size"] == 16
        # plain engine (CPU 'auto'): online calibration is off
        assert out["calibration"]["state"] == "off"


class TestAnswer:
    def test_single_matches_direct(self, server, predictor):
        rng = np.random.default_rng(0)
        feat = rng.normal(size=(5, 16)).astype(np.float32)
        status, out = _request(server, "POST", "/v1/answer", {
            "question": "what color is the cat",
            "image_feature": feat.tolist()})
        assert status == 200
        (ans, prob), = predictor.answer(["what color is the cat"],
                                        feat[None])
        assert out["answer"] == ans
        assert abs(out["prob"] - prob) < 1e-5

    def test_b64_feature_matches_lists(self, server):
        rng = np.random.default_rng(1)
        feat = rng.normal(size=(6, 16)).astype(np.float32)
        q = "is the dog red"
        _, via_list = _request(server, "POST", "/v1/answer", {
            "question": q, "image_feature": feat.tolist()})
        _, via_b64 = _request(server, "POST", "/v1/answer", {
            "question": q, "image_feature": {
                "b64": base64.b64encode(feat.tobytes()).decode(),
                "shape": [6, 16]}})
        assert via_b64["answer"] == via_list["answer"]
        assert abs(via_b64["prob"] - via_list["prob"]) < 1e-6

    def test_batch_ragged_with_bad_item_isolated(self, server, predictor):
        """One POST carrying several requests: ragged region counts work,
        a malformed item errors alone, the rest match the direct path."""
        rng = np.random.default_rng(2)
        feats = [rng.normal(size=(r, 16)).astype(np.float32)
                 for r in (3, 7)]
        qs = ["what is this", "what color"]
        status, out = _request(server, "POST", "/v1/answer", {"requests": [
            {"question": qs[0], "image_feature": feats[0].tolist()},
            {"question": "bad", "image_feature": [[1.0] * 7]},  # width 7
            {"question": qs[1], "image_feature": feats[1].tolist()},
            {"question": "", "image_feature": feats[0].tolist()},
        ]})
        assert status == 200
        res = out["results"]
        assert "error" in res[1] and "width 7" in res[1]["error"]
        assert "error" in res[3] and "question" in res[3]["error"]
        direct = predictor.answer(qs, feats)
        for got, (ans, prob) in zip((res[0], res[2]), direct):
            assert got["answer"] == ans
            assert abs(got["prob"] - prob) < 1e-5

    def test_top_k_answers(self, server, predictor):
        rng = np.random.default_rng(7)
        feat = rng.normal(size=(5, 16)).astype(np.float32)
        q = "what color is the dog"
        status, out = _request(server, "POST", "/v1/answer", {
            "question": q, "image_feature": feat.tolist(), "top_k": 3})
        assert status == 200
        assert len(out["answers"]) == 3
        probs = [a["prob"] for a in out["answers"]]
        assert probs == sorted(probs, reverse=True)
        # top-1 fields stay present and agree with the list head
        assert out["answer"] == out["answers"][0]["answer"]
        assert out["prob"] == out["answers"][0]["prob"]
        (topk,) = predictor.topk([q], feat[None], k=3)
        for got, (ans, prob) in zip(out["answers"], topk):
            assert got["answer"] == ans
            assert abs(got["prob"] - prob) < 1e-5

    def test_top_k_invalid_400(self, server):
        feat = [[0.0] * 16]
        for bad in (0, -1, 33, "3", True):
            status, out = _request(server, "POST", "/v1/answer", {
                "question": "q", "image_feature": feat, "top_k": bad})
            assert status == 400 and "top_k" in out["error"]

    def test_concurrent_posts_coalesce(self, server, predictor):
        """Parallel single-question POSTs ride the micro-batcher: all
        answered correctly, in fewer device batches than requests."""
        _, before = _request(server, "GET", "/stats")
        rng = np.random.default_rng(3)
        feats = [rng.normal(size=(5, 16)).astype(np.float32)
                 for _ in range(6)]
        qs = ["what color is the cat"] * 6
        results = [None] * 6

        def post(i):
            results[i] = _request(server, "POST", "/v1/answer", {
                "question": qs[i], "image_feature": feats[i].tolist()})

        threads = [threading.Thread(target=post, args=(i,))
                   for i in range(6)]
        for t in threads:
            t.start()
        for t in threads:
            t.join(timeout=120)
        direct = predictor.answer(qs, np.stack(feats))
        for (status, out), (ans, prob) in zip(results, direct):
            assert status == 200
            assert out["answer"] == ans
            assert abs(out["prob"] - prob) < 1e-5
        _, after = _request(server, "GET", "/stats")
        served = after["requests_served"] - before["requests_served"]
        batches = after["batches_run"] - before["batches_run"]
        assert served == 6
        assert batches <= 6  # coalescing can only reduce batch count


class TestErrors:
    def test_bad_json_400(self, server):
        conn = http.client.HTTPConnection(*server, timeout=60)
        conn.request("POST", "/v1/answer", body=b"{not json",
                     headers={"Content-Type": "application/json"})
        resp = conn.getresponse()
        out = json.loads(resp.read())
        conn.close()
        assert resp.status == 400 and "bad JSON" in out["error"]

    def test_single_malformed_400(self, server):
        status, out = _request(server, "POST", "/v1/answer",
                               {"question": "hi"})
        assert status == 400 and "image_feature" in out["error"]
        status, out = _request(server, "POST", "/v1/answer", {
            "question": "hi", "image_feature": [1.0, 2.0]})  # 1-D
        assert status == 400 and "regions" in out["error"]

    def test_non_finite_features_400(self, server):
        for bad in (float("nan"), float("inf")):
            feat = [[0.0] * 16, [bad] + [0.0] * 15]
            status, out = _request(server, "POST", "/v1/answer", {
                "question": "what", "image_feature": feat})
            assert status == 400 and "non-finite" in out["error"]
        # b64 path rejects too
        raw = np.full((2, 16), np.nan, np.float32)
        status, out = _request(server, "POST", "/v1/answer", {
            "question": "what", "image_feature": {
                "b64": base64.b64encode(raw.tobytes()).decode(),
                "shape": [2, 16]}})
        assert status == 400 and "non-finite" in out["error"]

    def test_bad_b64_400(self, server):
        status, out = _request(server, "POST", "/v1/answer", {
            "question": "hi",
            "image_feature": {"b64": "!!!", "shape": [1, 16]}})
        assert status == 400 and "b64" in out["error"]
        status, out = _request(server, "POST", "/v1/answer", {
            "question": "hi",
            "image_feature": {
                "b64": base64.b64encode(b"\x00" * 8).decode(),
                "shape": [1, 16]}})  # 2 floats != 16
        assert status == 400

    def test_empty_batch_400(self, server):
        status, out = _request(server, "POST", "/v1/answer",
                               {"requests": []})
        assert status == 400


class TestOverloadAndLimits:
    def test_overload_maps_to_503(self, predictor):
        """A FrontendOverloaded from submit() becomes HTTP 503 for a
        single request (and a per-item error inside a batch)."""
        from mcan_vqa_tpu.batching import FrontendOverloaded

        srv, frontend = serve_mod.make_server(predictor, port=0,
                                              max_wait_ms=0.0)

        def always_overloaded(*a, **k):
            raise FrontendOverloaded("frontend overloaded: test")

        frontend.submit = always_overloaded
        t = threading.Thread(target=srv.serve_forever, daemon=True)
        t.start()
        try:
            addr = srv.server_address[:2]
            payload = {"question": "q", "image_feature": [[0.0] * 16]}
            status, out = _request(addr, "POST", "/v1/answer", payload)
            assert status == 503 and "overloaded" in out["error"]
            status, out = _request(addr, "POST", "/v1/answer",
                                   {"requests": [payload]})
            assert status == 200
            assert "overloaded" in out["results"][0]["error"]
        finally:
            srv.shutdown()
            srv.server_close()
            frontend.close()
            t.join(timeout=10)

    def test_body_cap_413_and_bad_content_length(self, predictor):
        srv, frontend = serve_mod.make_server(predictor, port=0,
                                              max_body_bytes=64)
        t = threading.Thread(target=srv.serve_forever, daemon=True)
        t.start()
        try:
            addr = srv.server_address[:2]
            big = {"question": "q", "image_feature": [[0.0] * 64]}
            body = json.dumps(big).encode()
            conn = http.client.HTTPConnection(*addr, timeout=60)
            conn.request("POST", "/v1/answer", body,
                         {"Content-Type": "application/json"})
            resp = conn.getresponse()
            out = json.loads(resp.read())
            assert resp.status == 413 and "64-byte limit" in out["error"]
            # the body was never consumed: the server must drop the
            # keep-alive connection (and say so) or the unread bytes
            # would desync the next request on this connection
            assert resp.getheader("Connection") == "close"
            conn.close()

            conn = http.client.HTTPConnection(*addr, timeout=60)
            conn.putrequest("POST", "/v1/answer")
            conn.putheader("Content-Type", "application/json")
            conn.putheader("Content-Length", "banana")
            conn.endheaders()
            resp = conn.getresponse()
            out = json.loads(resp.read())
            conn.close()
            assert resp.status == 400
            assert "Content-Length" in out["error"]
        finally:
            srv.shutdown()
            srv.server_close()
            frontend.close()
            t.join(timeout=10)


class TestCLI:
    def test_synthetic_build_and_serve(self):
        """The --synthetic CLI path brings up a real server end-to-end
        with tiny knobs (no dataset/checkpoint files)."""
        args = serve_mod.parse_args([
            "--synthetic", "--max_batch", "4", "--latency_buckets", "",
            "--hidden_size", "32", "--layer", "1", "--multi_head", "4",
            "--img_feat_size", "16", "--img_feat_pad_size", "8",
            "--max_token", "6", "--flat_out_size", "32",
            "--flat_mlp_size", "16", "--compute_dtype", "float32"])
        p = serve_mod.build_predictor(args)
        srv, frontend = serve_mod.make_server(p, port=0, max_wait_ms=5.0)
        t = threading.Thread(target=srv.serve_forever, daemon=True)
        t.start()
        try:
            addr = srv.server_address[:2]
            feat = np.random.default_rng(0).normal(
                size=(5, 16)).astype(np.float32)
            status, out = _request(addr, "POST", "/v1/answer", {
                "question": "what color is the cat",
                "image_feature": feat.tolist()})
            assert status == 200
            assert isinstance(out["answer"], str)
            assert 0.0 <= out["prob"] <= 1.0
        finally:
            srv.shutdown()
            srv.server_close()
            frontend.close()
            t.join(timeout=10)

    def test_calibrate_flag(self, tmp_path):
        """--calibrate NPZ bakes static activation scales into the fused
        engine via Predictor(act_calibration=...): the calibrated
        predictor stays in top-1 agreement with the dynamic-quant one
        (accuracy gate proper: tests/test_quant.py TestStaticActScales).
        Ragged object-array features exercise the per-image path."""
        rng = np.random.default_rng(3)
        feats = np.empty(3, dtype=object)
        for i, r in enumerate((8, 5, 2)):
            feats[i] = rng.normal(size=(r, 16)).astype(np.float32)
        npz = tmp_path / "cal.npz"
        np.savez(npz, questions=np.array(
            ["what color is the cat", "is the dog red", "what is blue"]),
            features=feats)

        knobs = ["--synthetic", "--engine", "fused", "--max_batch", "4",
                 "--latency_buckets", "",
                 "--hidden_size", "32", "--layer", "1", "--multi_head",
                 "4", "--img_feat_size", "16", "--img_feat_pad_size", "8",
                 "--max_token", "6", "--flat_out_size", "32",
                 "--flat_mlp_size", "16", "--compute_dtype", "float32"]
        p_cal = serve_mod.build_predictor(serve_mod.parse_args(
            knobs + ["--calibrate", str(npz)]))
        p_dyn = serve_mod.build_predictor(serve_mod.parse_args(knobs))

        qs = ["what color is the cat", "is the dog red"]
        test_feats = [rng.normal(size=(6, 16)).astype(np.float32)
                      for _ in qs]
        pr_c = p_cal.predict_probs(qs, test_feats)
        pr_d = p_dyn.predict_probs(qs, test_feats)
        assert np.isfinite(pr_c).all()
        assert (pr_c.argmax(1) == pr_d.argmax(1)).all()
        assert np.abs(pr_c - pr_d).max() < 0.05

    def test_calibrate_flag_errors(self, tmp_path):
        bad = tmp_path / "bad.npz"
        np.savez(bad, questions=np.array(["q"]))
        args = serve_mod.parse_args(
            ["--synthetic", "--calibrate", str(bad)])
        with pytest.raises(SystemExit, match="missing arrays"):
            serve_mod.build_predictor(args)
        args = serve_mod.parse_args(
            ["--artifact", "/nonexistent", "--calibrate", str(bad)])
        with pytest.raises(SystemExit, match="does not apply"):
            serve_mod.build_predictor(args)

    def test_warmup_covers_every_bucket(self):
        """warmup() runs one forward per compiled batch bucket (incl. the
        CLI's default buckets composing with max_batch — the live-TPU
        smoke found a cold first request sitting behind a 386 s XLA
        compile and timing out); after it, serving answers immediately."""
        args = serve_mod.parse_args([
            "--synthetic", "--max_batch", "4", "--latency_buckets", "1,4",
            "--hidden_size", "32", "--layer", "1", "--multi_head", "4",
            "--img_feat_size", "16", "--img_feat_pad_size", "8",
            "--max_token", "6", "--flat_out_size", "32",
            "--flat_mlp_size", "16", "--compute_dtype", "float32"])
        p = serve_mod.build_predictor(args)
        assert p._buckets == (1, 4)   # bucket == max_batch tolerated
        serve_mod.warmup(p)           # compiles both buckets, no raise
        probs = p.predict_probs(["cat"], [np.ones((8, 16), np.float32)])
        assert probs.shape[0] == 1


class TestAutoCalibrationServing:
    """Online calibration through the full HTTP stack: warmup traffic is
    excluded from the buffer, live requests fill it, the engine swaps in
    the background, and requests keep answering across the swap."""

    def _fused_predictor(self, auto_calibrate):
        cfg = Config(hidden_size=32, layer=1, multi_head=4,
                     img_feat_size=16, img_feat_pad_size=8, max_token=6,
                     flat_out_size=32, flat_mlp_size=16,
                     compute_dtype="float32", use_glove=False).finalize()
        tok, _ = text_mod.build_vocab(
            ["what color is the cat dog red blue"])
        i2a = {str(i): a for i, a in
               enumerate(["yes", "no", "red", "blue", "2"])}
        model = build_mcan(cfg, token_size=len(tok), answer_size=5)
        img = np.zeros((1, 8, 16), np.float32)
        ques = np.zeros((1, 6), np.int32)
        params = model.init({"params": jax.random.PRNGKey(0)}, img,
                            ques)["params"]
        return Predictor(cfg, params, tok, i2a, max_batch=4,
                         engine="fused", auto_calibrate=auto_calibrate)

    def test_warmup_excluded_then_live_traffic_swaps(self):
        p = self._fused_predictor(auto_calibrate=3)
        serve_mod.warmup(p)
        # warmup forwards (near-zero dummies) must not enter the buffer
        assert p.calibration == {"state": "collecting", "samples": 0,
                                 "target": 3}

        srv, frontend = serve_mod.make_server(p, port=0, max_wait_ms=5.0)
        t = threading.Thread(target=srv.serve_forever, daemon=True)
        t.start()
        try:
            addr = srv.server_address[:2]
            rng = np.random.default_rng(7)
            answers = []
            for i in range(5):
                feat = rng.normal(size=(6, 16)).astype(np.float32)
                status, out = _request(addr, "POST", "/v1/answer", {
                    "question": "what color is the cat",
                    "image_feature": feat.tolist()})
                assert status == 200, out
                answers.append(out["answer"])
                if i == 2:  # buffer full after the 3rd live request
                    assert p.wait_calibrated(timeout=300.0)
                    assert p.calibration["state"] == "calibrated"
            assert all(a in ("yes", "no", "red", "blue", "2")
                       for a in answers)
            _, stats = _request(addr, "GET", "/stats")
            assert stats["calibration"]["state"] == "calibrated"
        finally:
            srv.shutdown()
            srv.server_close()
            frontend.close()
            t.join(timeout=10)

    def test_auto_calibrate_flag_plumbed(self):
        args = serve_mod.parse_args(
            ["--synthetic", "--engine", "fused", "--max_batch", "2",
             "--latency_buckets", "", "--auto_calibrate", "7",
             "--hidden_size", "32", "--layer", "1", "--multi_head", "4",
             "--img_feat_size", "16", "--img_feat_pad_size", "8",
             "--max_token", "6", "--flat_out_size", "32",
             "--flat_mlp_size", "16", "--compute_dtype", "float32"])
        p = serve_mod.build_predictor(args)
        assert p.calibration == {"state": "collecting", "samples": 0,
                                 "target": 7}
        off = serve_mod.build_predictor(serve_mod.parse_args(
            ["--synthetic", "--engine", "fused", "--max_batch", "2",
             "--latency_buckets", "", "--auto_calibrate", "0",
             "--hidden_size", "32", "--layer", "1", "--multi_head", "4",
             "--img_feat_size", "16", "--img_feat_pad_size", "8",
             "--max_token", "6", "--flat_out_size", "32",
             "--flat_mlp_size", "16", "--compute_dtype", "float32"]))
        assert off.calibration["state"] == "off"
