"""Per-engine on-device weight footprint (exact bytes).

Single-query serving latency is weight-streaming-bound
(docs/PERFORMANCE.md: collapsing 12 launches to 2 did NOT help B=1; int8
weights cut it 24%), so the bytes each engine actually streams per
forward are the first-order latency model. This prints them exactly, per
engine, from the real prepared param trees:

    plain   model.init tree as-is (fp32)
    fused   ops.serving.prepare_params(qffn=True) — the SHIPPED engine
            (bf16 matmul weights + int8 FFN + megakernel layouts)
    int8    ops.quant.quantize_params(megakernel=True)

Runs fine on CPU (pure host math). One JSON line per model size.
"""

from __future__ import annotations

import json
import os
import sys


def tree_bytes(tree) -> int:
    import jax
    import numpy as np
    return int(sum(np.asarray(x).nbytes for x in jax.tree.leaves(tree)))


def main() -> None:
    import jax

    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    from mcan_vqa_tpu.configs import Config
    from mcan_vqa_tpu.models.net import build_mcan
    from mcan_vqa_tpu.ops.quant import quantize_params
    from mcan_vqa_tpu.ops.serving import (prepare_params,
                                          prune_prepared_params)

    for size, hidden, flat_out in (("small", 512, 512),
                                   ("large", 1024, 2048)):
        cfg = Config(hidden_size=hidden, layer=6, multi_head=8,
                     flat_mlp_size=512, flat_glimpses=1,
                     flat_out_size=flat_out, use_glove=False).finalize()
        model = build_mcan(cfg, token_size=20000, answer_size=3129)
        import numpy as np
        img = np.zeros((1, cfg.img_feat_pad_size, cfg.img_feat_size),
                       np.float32)
        ques = np.zeros((1, cfg.max_token), np.int32)
        params = jax.jit(model.init)({"params": jax.random.PRNGKey(0)},
                                     img, ques)["params"]
        plain = tree_bytes(params)
        prepared = prepare_params(params, cfg.layer,
                                  num_heads=cfg.multi_head, alllayer=False,
                                  qffn=True)
        fused = tree_bytes(prepared)
        pruned = tree_bytes(prune_prepared_params(prepared, cfg.layer))
        int8 = tree_bytes(quantize_params(params, cfg.layer,
                                          megakernel=True))
        mb = 1024 * 1024
        print(json.dumps({
            "model": size,
            "plain_fp32_mb": round(plain / mb, 1),
            "fused_prepared_mb": round(fused / mb, 1),
            "fused_pruned_mb": round(pruned / mb, 1),   # what ships
            "int8_mb": round(int8 / mb, 1),
        }), flush=True)


if __name__ == "__main__":
    main()
