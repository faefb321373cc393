"""Measure the HTTP serving stack's host-side cost: wire decode +
micro-batching frontend + dispatch, at REAL wire sizes.

On this rig host<->device transfers ride a ~1.5 MB/s relay, so an
end-to-end HTTP benchmark against the real chip would measure the relay,
not the stack (docs/PERFORMANCE.md keeps device numbers on-device for the
same reason). This tool therefore isolates what the serving host adds on
top of the on-device forward (0.122 ms at B=1, 1.55 ms at B=64): a
TINY model (hidden=32, forward ~negligible) behind the full
cli/serve.py stack, but with features at the REAL wire shape
[60, 2048] fp32 (491 KB/request; ~655 KB as b64) so parsing, decoding,
padding, and stacking cost what they cost in production.

Reported per wire format (b64 vs nested JSON lists):
  qps            steady-state requests/s through HTTP (K concurrent clients)
  p50/p99 ms     submit->resolve latency from the frontend's own clock
  occupancy      requests per device batch (coalescing effectiveness)

Clients pre-serialize one request body and reuse it, so client-side cost
is just HTTP send — but note clients and server share this host's cores;
treat qps as a lower bound on what a dedicated serving host sustains.

Usage: python tools/bench_serve_http.py [--seconds 10] [--clients 8]
       [--formats b64,list] [--regions 60] [--feat 2048]
"""

from __future__ import annotations

import argparse
import base64
import http.client
import json
import os
import sys
import threading
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))


def build_tiny_predictor(feat: int, regions: int):
    import jax
    jax.config.update("jax_platforms", "cpu")
    from mcan_vqa_tpu.api import Predictor
    from mcan_vqa_tpu.configs import Config
    from mcan_vqa_tpu.data import text as text_mod
    from mcan_vqa_tpu.models.net import build_mcan

    cfg = Config(hidden_size=32, layer=1, multi_head=4,
                 img_feat_size=feat, img_feat_pad_size=regions,
                 max_token=14, flat_out_size=32, flat_mlp_size=16,
                 compute_dtype="float32", use_glove=False).finalize()
    tok, _ = text_mod.build_vocab(["what color is the cat dog red blue"])
    i2a = {str(i): a for i, a in enumerate(["yes", "no", "red", "blue"])}
    model = build_mcan(cfg, token_size=len(tok), answer_size=4)
    img = np.zeros((1, regions, feat), np.float32)
    ques = np.zeros((1, 14), np.int32)
    params = model.init({"params": jax.random.PRNGKey(0)}, img,
                        ques)["params"]
    return Predictor(cfg, params, tok, i2a, max_batch=64,
                     latency_buckets=(1, 8))


def one_body(fmt: str, feat: np.ndarray) -> bytes:
    if fmt == "b64":
        payload = {"b64": base64.b64encode(feat.tobytes()).decode(),
                   "shape": list(feat.shape)}
    else:
        payload = feat.tolist()
    return json.dumps({"question": "what color is the cat",
                       "image_feature": payload}).encode()


def run_format(addr, fmt: str, feat: np.ndarray, seconds: float,
               clients: int, frontend) -> dict:
    body = one_body(fmt, feat)
    stop = time.monotonic() + seconds
    counts = [0] * clients
    errors = [0] * clients

    def client(i: int) -> None:
        conn = http.client.HTTPConnection(*addr, timeout=120)
        while time.monotonic() < stop:
            conn.request("POST", "/v1/answer", body=body,
                         headers={"Content-Type": "application/json"})
            resp = conn.getresponse()
            resp.read()
            if resp.status == 200:
                counts[i] += 1
            else:
                errors[i] += 1
        conn.close()

    served0 = frontend.requests_served
    batches0 = frontend.batches_run
    t0 = time.monotonic()
    threads = [threading.Thread(target=client, args=(i,))
               for i in range(clients)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    dt = time.monotonic() - t0
    served = frontend.requests_served - served0
    batches = frontend.batches_run - batches0
    lat = frontend.latency_ms()
    return {"format": fmt, "qps": sum(counts) / dt,
            "errors": sum(errors),
            "p50_ms": lat["p50"], "p99_ms": lat["p99"],
            "occupancy": served / batches if batches else 0.0,
            "wire_kb": len(body) / 1024.0}


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--seconds", type=float, default=10.0)
    ap.add_argument("--clients", type=int, default=8)
    ap.add_argument("--formats", default="b64,list")
    ap.add_argument("--regions", type=int, default=60)
    ap.add_argument("--feat", type=int, default=2048)
    ap.add_argument("--max_wait_ms", type=float, default=2.0)
    args = ap.parse_args()

    from mcan_vqa_tpu.cli import serve as serve_mod
    predictor = build_tiny_predictor(args.feat, args.regions)
    srv, frontend = serve_mod.make_server(predictor, port=0,
                                          max_wait_ms=args.max_wait_ms)
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    addr = srv.server_address[:2]
    feat = np.random.default_rng(0).normal(
        size=(args.regions, args.feat)).astype(np.float32)

    # warm every jit bucket (1, 8, 64) before timing
    for b in predictor._buckets:
        predictor.predict_probs(["warm"] * b, np.zeros(
            (b, args.regions, args.feat), np.float32))
    run_format(addr, "b64", feat, 1.0, args.clients, frontend)

    results = []
    for fmt in args.formats.split(","):
        frontend.reset_stats()
        r = run_format(addr, fmt, feat, args.seconds, args.clients,
                       frontend)
        results.append(r)
        print(json.dumps(r))

    srv.shutdown()
    srv.server_close()
    frontend.close()


if __name__ == "__main__":
    main()
