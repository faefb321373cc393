"""High-level serving API: checkpoint in, answer strings out.

The reference has no serving story (inference happens inside eval loops);
production deployments need one. ``Predictor`` wraps: checkpoint loading
(orbax or reference torch pickle), vocabulary encoding, the jitted forward,
fixed-shape batching, and answer-string decoding.

    from mcan_vqa_tpu.api import Predictor
    p = Predictor.from_checkpoint("ckpts/small/epoch13.pkl", cfg, vocab)
    answers = p.answer(["what color is the cat?"], image_features)
"""

from __future__ import annotations

from typing import Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from mcan_vqa_tpu.data import answers as ans_mod
from mcan_vqa_tpu.data import features as feat_mod
from mcan_vqa_tpu.data import text as text_mod
from mcan_vqa_tpu.models.net import build_mcan


class Predictor:
    def __init__(self, cfg, params, token_to_ix: Dict[str, int],
                 ix_to_ans: Optional[Dict[str, str]] = None,
                 max_batch: int = 64, engine: str = "auto",
                 latency_buckets: Optional[Sequence[int]] = None,
                 mesh=None, act_calibration=None):
        """max_batch: compiled batch shape; inputs are padded up to it
        (one compilation, any request size <= max_batch).

        latency_buckets: optional ascending batch sizes (e.g. ``(1, 8)``)
        compiled IN ADDITION to max_batch; a request pads to the smallest
        bucket that fits instead of always paying the max_batch forward.
        Measured on v5e (docs/PERFORMANCE.md): a single query runs in
        0.122 ms at B=1 vs 1.55 ms padded to B=64 — 12.7x lower latency
        for interactive serving. Each bucket is one extra (lazily cached)
        compilation of the same jitted forward.

        engine: "fused" routes through the production serving engine
        (fused QKV projections, bf16 weights, fused FFN/epilogue Pallas
        kernels — the bench.py default path, golden-tested against
        model.apply); "plain" uses model.apply directly; "int8" uses the
        quantized engine (ops/quant.py: per-channel int8 weights +
        dynamic per-row activation quant; opt-in, gate documented in
        tests/test_quant.py: top-1 agreement >= 99%, |d_acc| <= 0.5pt);
        "auto" picks fused on TPU, plain elsewhere (the Pallas kernels
        only compile for TPU).

        act_calibration: optional ``(questions, image_features)`` batch
        (same formats as ``predict_probs``) for the "fused" engine:
        calibrates STATIC per-tensor activation scales for the int8
        quant sites (ops/quant.calibrate_qffn_act_scales) and bakes them
        into the engine — skips the per-row activation-max reductions,
        measured +5% serving at MCAN-small same-session
        (docs/PERFORMANCE.md). Accuracy is gated at the default path's
        bar (tests/test_quant.py::TestStaticActScales); values beyond
        the calibration max saturate gracefully, but the batch should
        reflect production traffic. None (default) keeps dynamic
        per-row quantization.

        mesh: optional pure-data-parallel ``jax.sharding.Mesh`` (every
        non-"data" axis size 1). Params are replicated, every request
        batch is split evenly over the chips (fused/int8 engines run
        per shard under shard_map; plain lets GSPMD partition
        model.apply), so one Predictor serves a whole pod slice. Each
        compiled bucket (latency_buckets + max_batch) must be divisible
        by the mesh size."""
        self.cfg = cfg
        self.token_to_ix = token_to_ix
        if ix_to_ans is None:
            _, ix_to_ans = ans_mod.load_answer_dict()
        self.ix_to_ans = ix_to_ans
        self.max_batch = max_batch
        buckets = sorted(set(latency_buckets or ()))
        assert all(0 < b <= max_batch for b in buckets), \
            f"latency_buckets must be in (0, max_batch]: {buckets}"
        # a bucket equal to max_batch is redundant, not an error (the CLI
        # default (1, 8) must compose with any --max_batch >= 8)
        self._buckets = tuple(b for b in buckets if b < max_batch) \
            + (max_batch,)

        requested_engine = engine
        if engine == "auto":
            engine = "fused" if jax.default_backend() == "tpu" else "plain"
        self.engine = engine
        if act_calibration is not None and engine != "fused":
            # static activation scales only exist in the fused engine's
            # int8 quant sites — silently ignoring the sample would let a
            # deployer believe the calibrated (+12-18%) engine is active
            if requested_engine == "auto":
                import warnings
                warnings.warn(
                    f"act_calibration ignored: engine='auto' resolved to "
                    f"'{engine}' on this backend; calibration applies "
                    f"only to the fused engine")
                act_calibration = None
            else:
                raise ValueError(
                    f"act_calibration requires engine='fused' (or 'auto' "
                    f"on TPU), got engine='{engine}'")
        if engine == "int8":
            from mcan_vqa_tpu.ops.quant import (make_quant_serving_fn,
                                                quantize_params)
            # On TPU, run the int8 SA/SGA block megakernels (weights
            # VMEM-resident in int8): measured 14,250 pairs/s at
            # MCAN-large vs 13,466 for the int8 XLA structure and 13,116
            # for the bf16 megakernel (docs/PERFORMANCE.md). CPU keeps
            # the XLA structure (interpret-mode kernels are test-only).
            mk = jax.default_backend() == "tpu"
            self.params = quantize_params(params, cfg.layer, megakernel=mk)
            serve = make_quant_serving_fn(cfg.layer, cfg.multi_head,
                                          megakernel=mk)

            def forward(params, img, ques):
                return jax.nn.sigmoid(
                    serve(params, img, ques).astype(jnp.float32))
        elif engine == "fused":
            from mcan_vqa_tpu.ops.serving import build_production_engine
            # ONE construction path, shared with bench.py and the
            # A/B/canary tools: pruned mode-2 megakernel tree, bf16
            # stream, dynamic int8-FFN (qffn) — or, with a calibration
            # batch, static scales + int8 at every projection (level 3:
            # decisive at D>=1024, batch-neutral at D=512, B=1 champion
            # at both widths — docs/PERFORMANCE.md). Accuracy gated by
            # tests/test_bf16_stream.py, test_quant.py (TestQffnAccuracy,
            # TestStaticActScales) + the full-size torch-oracle bounds
            # (test_full_size_parity.py), all zero top-1 flips.
            act_inputs = None
            if act_calibration is not None:
                cal_q, cal_f = act_calibration
                cques, cimg = self._prep_inputs(cal_q, cal_f)
                act_inputs = (cimg, cques)
            serve, self.params = build_production_engine(
                params, cfg.layer, cfg.multi_head,
                act_scale_inputs=act_inputs)

            def forward(params, img, ques):
                return jax.nn.sigmoid(
                    serve(params, img, ques).astype(jnp.float32))
        else:
            model = build_mcan(cfg, token_size=len(token_to_ix),
                               answer_size=len(ix_to_ans))
            self.params = params

            def forward(params, img, ques):
                out = model.apply({"params": params}, img, ques,
                                  deterministic=True)
                return jax.nn.sigmoid(out["logits"].astype(jnp.float32))

        self.mesh = mesh
        if mesh is None or mesh.devices.size == 1:
            self._forward = jax.jit(forward)
        else:
            from jax.sharding import NamedSharding
            from jax.sharding import PartitionSpec as P

            from mcan_vqa_tpu.parallel.mesh import DATA_AXIS
            shape = dict(mesh.shape)
            assert DATA_AXIS in shape, \
                f'serving mesh needs a "{DATA_AXIS}" axis: {shape}'
            assert all(v == 1 for k, v in shape.items() if k != DATA_AXIS), \
                f"serving mesh must be pure data-parallel: {shape}"
            n = mesh.devices.size
            bad = [b for b in self._buckets if b % n]
            assert not bad, (f"every compiled bucket must divide over the "
                             f"{n}-device mesh: {bad}")
            rep = NamedSharding(mesh, P())
            dat = NamedSharding(mesh, P(DATA_AXIS))
            self.params = jax.device_put(self.params, rep)
            if self.engine == "plain":
                # GSPMD partitions model.apply itself (batch sharded,
                # params replicated — same scheme as the Trainer's eval).
                self._forward = jax.jit(forward, in_shardings=(rep, dat, dat),
                                        out_shardings=dat)
            else:
                # Pallas megakernels are single-device programs: run the
                # engine per data shard (same wiring as Trainer.predict
                # on dp>1 meshes, train/trainer.py).
                from jax import shard_map
                self._forward = jax.jit(shard_map(
                    forward, mesh=mesh,
                    in_specs=(P(), P(DATA_AXIS), P(DATA_AXIS)),
                    out_specs=P(DATA_AXIS), check_vma=False))

    @property
    def img_feat_size(self) -> int:
        """Per-region feature width F a request row must have."""
        return int(self.cfg.img_feat_size)

    def _prep_inputs(self, questions: Sequence[str], image_features):
        """Host prep shared by serving and calibration: tokenize + pad
        each per-image [R_i, F] feature block to the model's region
        count. Returns (ques [N, T] int32, img [N, R, F] f32)."""
        ques = text_mod.encode_questions(
            questions, self.token_to_ix, self.cfg.max_token)
        img = np.stack([feat_mod.pad_img_feat(
            np.asarray(f, np.float32), self.cfg.img_feat_pad_size)
            for f in image_features])
        return ques, img

    # ------------------------------------------------------------------
    @classmethod
    def from_checkpoint(cls, path: str, cfg, token_to_ix: Dict[str, int],
                        ix_to_ans: Optional[Dict[str, str]] = None,
                        epoch: Optional[int] = None,
                        max_batch: int = 64,
                        engine: str = "auto",
                        latency_buckets: Optional[Sequence[int]] = None,
                        mesh=None, act_calibration=None) -> "Predictor":
        """path: a reference .pkl/.pt, or an orbax checkpoint directory."""
        from mcan_vqa_tpu.train import checkpoint as ckpt_mod

        if path.endswith((".pkl", ".pt", ".pth")):
            params, _ = ckpt_mod.import_torch_checkpoint(path)
        else:
            import orbax.checkpoint as ocp
            with ocp.PyTreeCheckpointer() as ckptr:
                restored = ckptr.restore(path)
            params = restored["params"] if "params" in restored else restored
        return cls(cfg, params, token_to_ix, ix_to_ans, max_batch, engine,
                   latency_buckets=latency_buckets, mesh=mesh,
                   act_calibration=act_calibration)

    # ------------------------------------------------------------------
    def predict_probs(self, questions: Sequence[str],
                      image_features) -> np.ndarray:
        """questions: N strings; image_features: [N, R<=pad, F] array or a
        sequence of N per-image [R_i, F] arrays with ragged region counts
        (each padded to ``img_feat_pad_size``; zero rows are padding).
        Returns probabilities [N, answer_size]."""
        probs, n = self.predict_probs_async(questions, image_features)
        return np.asarray(probs)[:n]

    def predict_probs_async(self, questions: Sequence[str],
                            image_features):
        """Host prep + DISPATCH only: returns ``(device_probs, n)``
        without materializing the result. JAX dispatch is asynchronous,
        so the caller can prepare/dispatch the next batch while the chip
        computes this one (the batching frontend pipelines on this);
        ``np.asarray(device_probs)[:n]`` blocks and yields what
        ``predict_probs`` returns."""
        n = len(questions)
        assert len(image_features) == n
        assert n <= self.max_batch, (n, self.max_batch)

        ques, img = self._prep_inputs(questions, image_features)

        target = next(b for b in self._buckets if b >= n)
        if n < target:
            pad = target - n
            img = np.concatenate([img, np.zeros((pad,) + img.shape[1:],
                                                np.float32)])
            ques = np.concatenate([ques, np.zeros((pad,) + ques.shape[1:],
                                                  np.int32)])
        return self._forward(self.params, img, ques), n

    def export_artifact(self, path: str,
                        platforms: Optional[Sequence[str]] = None) -> None:
        """Freeze this predictor to an AOT serving artifact directory
        (StableHLO via jax.export + params + vocab; see
        mcan_vqa_tpu.artifact). Load with artifact.load_artifact(path) —
        no model code or flax needed on the serving host."""
        from mcan_vqa_tpu.artifact import save_artifact
        save_artifact(self, path, platforms=platforms)

    def answer(self, questions: Sequence[str],
               image_features: np.ndarray) -> List[Tuple[str, float]]:
        """Top-1 answer string and its probability per question."""
        probs = self.predict_probs(questions, image_features)
        return [ans_mod.topk_answers(row, self.ix_to_ans, 1)[0]
                for row in probs]

    def topk(self, questions: Sequence[str], image_features,
             k: int = 5) -> List[List[Tuple[str, float]]]:
        """Top-k (answer, probability) pairs per question, highest first
        (k clamped to the answer-dict size)."""
        probs = self.predict_probs(questions, image_features)
        return [ans_mod.topk_answers(row, self.ix_to_ans, k)
                for row in probs]
