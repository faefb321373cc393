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

import threading
import warnings
from typing import Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from mcan_vqa_tpu.data import answers as ans_mod
from mcan_vqa_tpu.models.net import build_mcan


_UNSET = object()   # "use the instance flag" sentinel for _build_fused


def _default_backend() -> str:
    """The backend ``engine="auto"`` resolves against (factored out so
    routing tests can exercise the TPU decision table on the CPU CI)."""
    return jax.default_backend()


# Measured regime boundary for the auto router (docs/PERFORMANCE.md):
# at MCAN-large the int4 level-5 engine wins B=1 by +11-12.4% (r4, 8/9
# rounds) but LOSES every measured throughput batch (r5 interleaved
# medians: B=8 -7.4%, B=64 level 4 -12.1% / level 5 -17.4%, B=256
# -13.9%/-19.0% vs calibrated level 3). The crossover is bracketed in
# (1, 8): buckets <= 4 (single-query latency territory) take the int4
# engine, the measured-champion boundary on both sides.
INT4_MAX_BUCKET = 4
INT4_MIN_HIDDEN = 1024
# q8aux (static-int8 AUX weight sites) at B=1 on the calibrated level-3
# engine: +5.2% at MCAN-large (r4), +3.2% at MCAN-small (r5, 7
# interleaved rounds) — but NEUTRAL stacked on int4 (14 paired rounds),
# so it routes only where the base engine is the B<=4 champion
# (small widths; large tiny buckets go to int4 instead). Like int4, it
# INVERTS past B=1 (small B=8: -9.7%, B=64: -5.1%, r5 session 3), so
# the (1, 8) crossover is bracketed from both sides.
Q8AUX_MAX_BUCKET = 4


def resolve_auto_routes(hidden_size: int, buckets: Sequence[int],
                        calibrated: bool,
                        aux_available: bool = False) -> Dict[int, str]:
    """The measured serving regime table as code: which engine each
    compiled latency bucket should run under ``engine="auto"``.

    Encodes docs/PERFORMANCE.md (rounds 3-5, on-chip interleaved A/Bs):
      - calibrated level 3 is the champion at every width for
        throughput batches (int4 at large B=64/256: -12..-19%, r5);
      - at MCAN-large (D>=1024) single-query buckets (<= 4) the int4
        level-5 weight-streaming engine wins +11-12.4%;
      - at MCAN-small single-query buckets the q8aux aux-site engine
        wins +3.2% (r5) — routed only when the calibration source can
        supply the "aux" scale tuple (``aux_available``);
      - uncalibrated builds have no static scales, so every bucket
        stays on the dynamic base engine until calibration arrives.

    Returns {bucket: "base" | "int4" | "q8aux"}. Pure and
    side-effect-free so the decision table is unit-testable without a
    TPU (tests/test_api.py::TestAutoRouting).
    """
    if not calibrated:
        return {int(b): "base" for b in buckets}
    out = {}
    for b in buckets:
        if hidden_size >= INT4_MIN_HIDDEN and b <= INT4_MAX_BUCKET:
            out[int(b)] = "int4"
        elif (hidden_size < INT4_MIN_HIDDEN and aux_available
              and b <= Q8AUX_MAX_BUCKET):
            out[int(b)] = "q8aux"
        else:
            out[int(b)] = "base"
    return out


class Predictor:
    def __init__(self, cfg, params, token_to_ix: Dict[str, int],
                 ix_to_ans: Optional[Dict[str, str]] = None,
                 max_batch: int = 64, engine: str = "auto",
                 latency_buckets: Optional[Sequence[int]] = None,
                 mesh=None, act_calibration=None, act_scales=None,
                 auto_calibrate: int = 256,
                 q8aux: bool = False):
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
        only compile for TPU) — and, once calibrated, ROUTES each
        compiled latency bucket to its measured champion
        (resolve_auto_routes; docs/PERFORMANCE.md regime table):
        calibrated level 3 everywhere, int4 level 5 for single-query
        buckets (<= 4) at MCAN-large, q8aux for single-query buckets at
        MCAN-small when the calibration source carries the "aux" tuple.
        Explicit engine names never route; "int4" is the weight-streaming LATENCY
        engine — the fused engine with FFN+qkv weights nibble-packed to
        int4 with grouped scales (qffn level 5, ops/quant._quant_w4),
        halving those sites' HBM bytes (what bounds B=1 latency). int4
        requires calibration: it serves the dynamic fused engine until
        act_calibration/act_scales or online auto-calibration provides
        static scales (gate: tests/test_quant.py::TestInt4LatencyEngine,
        top-1 agreement >= 99%, |d_acc| <= 0.5pt).

        act_calibration: optional ``(questions, image_features)`` batch
        (same formats as ``predict_probs``) for the "fused" engine:
        calibrates STATIC per-tensor activation scales for the int8
        quant sites (ops/quant.calibrate_qffn_act_scales) and bakes them
        into the engine — skips the per-row activation-max reductions,
        measured +13.9% serving at MCAN-small / +16% at MCAN-large
        same-session (docs/PERFORMANCE.md). Accuracy is gated at the
        default path's bar (tests/test_quant.py::TestStaticActScales);
        values beyond the calibration max saturate gracefully, but the
        batch should reflect production traffic. None (default) starts
        on dynamic per-row quantization and self-calibrates from live
        traffic (see auto_calibrate).

        act_scales: optional PRECOMPUTED static activation scales
        ({"enc_i"/"dec_i": (aqkv, a1, a2)} python floats — what the
        Trainer's end-of-train calibration stores next to the final
        checkpoint, train/checkpoint.save_act_scales). Builds the
        calibrated level-3 engine directly, no calibration replay.
        ``from_checkpoint`` auto-loads the side file when present, so
        deployments of a trained checkpoint get the calibrated engine
        by default. Mutually exclusive with act_calibration.

        auto_calibrate: ONLINE calibration for the fused engine (the
        production default — the static-scale engine is faster at every
        width but needs representative activations, which offline
        deployments rarely have on hand; live traffic IS the
        representative sample). The predictor serves with dynamic
        per-row quantization from the first request, buffers the first
        ``auto_calibrate`` finite request samples on the host, then a
        background thread calibrates static scales on them, builds the
        calibrated (level-3) engine through the same
        ``build_production_engine`` recipe, PRE-WARMS every latency
        bucket (so live traffic never waits on the new engine's
        compiles), and atomically swaps it in. Both engines are
        accuracy-gated at the same bar (>=99.5% top-1 agreement,
        |dAcc| <= 0.1pt, full-size torch-oracle bounds, on-chip canary —
        docs/ACCURACY.md "Serving precision"). 0 disables; ignored when
        act_calibration already supplies a sample or the engine is not
        "fused". Non-finite request features are excluded from the
        buffer; a calibration failure logs a warning and leaves the
        dynamic engine serving. ``calibration`` reports progress;
        ``wait_calibrated()`` blocks until the swap (tests/CI);
        ``export_artifact`` after the swap freezes the calibrated
        engine.

        q8aux: additionally run the static-int8 AUX weight sites —
        decoder cross k/v, both AttFlat merges, the answer head — the
        largest bf16 weight streams OUTSIDE the megakernels
        (ops/serving.build_production_engine(q8aux=True)). Applies to
        the calibrated fused/int4 engines only (the sites need static
        activation scales); like ``engine="int4"`` it activates once
        calibration arrives (sample, stored scales with an "aux" tuple,
        or online auto-calibration). Measured at MCAN-large B=1
        (interleaved medians): **+5.2% on top of the calibrated level-3
        engine** (4/5 paired-round wins); NEUTRAL on top of the int4
        level-5 engine (14 paired rounds across two campaigns — the aux
        byte saving overlaps the int4 one), which is why it is opt-in
        rather than folded into engine="int4". Accuracy gate:
        tests/test_quant.py::TestQ8AuxSites (zero top-1 flips at levels
        3/5). Stored side files from Trainer runs after r4 carry the
        "aux" tuple; passing q8aux=True with an older side file (no
        "aux") raises.

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

        if act_scales is False:
            # the documented from_checkpoint sentinel ("disable the side
            # -file auto-load"); normalize here so a direct Predictor(...)
            # call can't leak False into the engine builders as if it
            # were a real scales dict
            act_scales = None
        if auto_calibrate < 0:
            # a negative target passes the truthiness check and
            # `_cal_n < negative` is immediately false — the first
            # request would trigger a calibration from only its own rows
            raise ValueError(
                f"auto_calibrate must be >= 0, got {auto_calibrate}")
        assert act_calibration is None or act_scales is None, \
            "pass a calibration batch OR precomputed scales, not both"
        requested_engine = engine
        if engine == "auto":
            engine = "fused" if _default_backend() == "tpu" else "plain"
        self.engine = engine
        # engine="auto" additionally ROUTES buckets to the measured
        # per-regime champions (resolve_auto_routes): calibrated level 3
        # as the base everywhere, int4 level 5 for single-query buckets
        # at MCAN-large. Explicit engine names keep their exact single-
        # engine behavior — routing never overrides a deployer's choice.
        self._auto_routing = requested_engine == "auto" and engine == "fused"
        # "int4" = the weight-streaming latency engine: the fused engine
        # with the FFN+qkv weights nibble-packed to int4 (qffn level 5,
        # ops/quant._quant_w4) once calibrated — halves those sites' HBM
        # bytes, which bounds B=1 latency. Serves the dynamic fused
        # engine until calibration (sample, stored scales, or online
        # auto-calibration) provides the required static scales.
        self._qffn_level = 5 if engine == "int4" else None
        # q8aux rides the same "activates once calibrated" lifecycle as
        # engine="int4": the dynamic engine serves until static scales
        # exist, then the aux sites go int8 in the calibrated rebuild
        self._q8aux = bool(q8aux)
        if q8aux and engine not in ("fused", "int4"):
            if requested_engine == "auto":
                warnings.warn(
                    f"q8aux ignored: engine='auto' resolved to "
                    f"'{engine}' on this backend; the aux int8 sites "
                    f"exist only in the fused engine")
                self._q8aux = False
            else:
                raise ValueError(
                    f"q8aux applies to the fused/int4 engines (their "
                    f"calibrated int8 sites), got engine='{engine}'")
        if engine == "int4":
            engine = "fused"
            self.engine = "int4"
            if (act_calibration is None and act_scales is None
                    and not auto_calibrate):
                raise ValueError(
                    'engine="int4" needs calibration: pass '
                    "act_calibration/act_scales or leave auto_calibrate on")
        if (self._q8aux and act_calibration is None and act_scales is None
                and not auto_calibrate):
            # mirror the int4 guard: without any calibration source the
            # aux int8 sites would never activate — the dynamic engine
            # would serve forever while the deployer believes the +5.2%
            # aux sites are live (ADVICE r4, medium)
            raise ValueError(
                "q8aux needs calibration: pass act_calibration/act_scales "
                '(with an "aux" tuple) or leave auto_calibrate on')
        if (act_calibration is not None or act_scales is not None) \
                and engine != "fused":
            # static activation scales only exist in the fused engine's
            # int8 quant sites — silently ignoring the sample would let a
            # deployer believe the calibrated (+12-18%) engine is active
            what = ("act_calibration" if act_calibration is not None
                    else "act_scales")
            if requested_engine == "auto":
                warnings.warn(
                    f"{what} ignored: engine='auto' resolved to "
                    f"'{engine}' on this backend; calibration applies "
                    f"only to the fused engine")
                act_calibration = act_scales = None
            else:
                raise ValueError(
                    f"{what} requires engine='fused' (or 'auto' "
                    f"on TPU), got engine='{engine}'")

        # mesh validation/shardings first: engine installs need them
        self.mesh = mesh
        self._mesh_live = mesh is not None and mesh.devices.size > 1
        if self._mesh_live:
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
            self._rep = NamedSharding(mesh, P())
            self._dat = NamedSharding(mesh, P(DATA_AXIS))

        if engine == "int8":
            built = {"base": self._build_int8(params)}
            routes = {b: "base" for b in self._buckets}
        elif engine == "fused":
            act_inputs = None
            if act_calibration is not None:
                cal_q, cal_f = act_calibration
                cques, cimg = self._prep_inputs(cal_q, cal_f)
                act_inputs = (cimg, cques)
            if (self._auto_routing and act_inputs is None
                    and act_scales is None and not auto_calibrate):
                # the loud fallback VERDICT r4 asked for: with every
                # calibration source disabled, auto can never reach the
                # measured champions (calibrated level 3 / int4) — say
                # so instead of silently serving dynamic-quant forever
                warnings.warn(
                    "engine='auto' has no calibration source "
                    "(act_calibration/act_scales absent, auto_calibrate "
                    "off): serving stays on the dynamic fused engine, "
                    "not the measured calibrated champions")
            built, routes = self._build_engines(params, act_inputs,
                                                act_scales)
        else:
            built = {"base": self._build_plain(params)}
            routes = {b: "base" for b in self._buckets}
        self._install(built, routes)

        # --- online calibration state -------------------------------
        self._cal_error: Optional[BaseException] = None
        self._cal_thread: Optional[threading.Thread] = None
        self._cal_lock = threading.Lock()
        self._cal_imgs: Optional[list] = []
        self._cal_ques: Optional[list] = []
        self._cal_n = 0
        pre_calibrated = (act_calibration is not None
                          or act_scales is not None)
        if engine == "fused" and not pre_calibrated and auto_calibrate:
            self._auto_cal = int(auto_calibrate)
            self._raw_params = params          # needed for the rebuild
            self._cal_state = "collecting"
        else:
            self._auto_cal = 0
            self._raw_params = None
            self._cal_state = "calibrated" if pre_calibrated else "off"

    # ------------------------------------------------------------------
    # engine construction (one path per engine; the fused path is ALSO
    # the online-recalibration path, so it must stay a pure function of
    # (raw params, calibration inputs))
    def _build_int8(self, params):
        from mcan_vqa_tpu.ops.quant import (make_quant_serving_fn,
                                            quantize_params)
        # On TPU, run the int8 SA/SGA block megakernels (weights
        # VMEM-resident in int8): measured 14,250 pairs/s at
        # MCAN-large vs 13,466 for the int8 XLA structure and 13,116
        # for the bf16 megakernel (docs/PERFORMANCE.md). CPU keeps
        # the XLA structure (interpret-mode kernels are test-only).
        mk = jax.default_backend() == "tpu"
        prepared = quantize_params(params, self.cfg.layer, megakernel=mk)
        serve = make_quant_serving_fn(self.cfg.layer, self.cfg.multi_head,
                                      megakernel=mk)

        def forward(params, img, ques):
            return jax.nn.sigmoid(
                serve(params, img, ques).astype(jnp.float32))

        return forward, prepared

    def _build_fused(self, params, act_inputs, act_scales=None,
                     qffn_level=_UNSET, q8aux=_UNSET):
        from mcan_vqa_tpu.ops.serving import build_production_engine
        # ONE construction path, shared with bench.py and the
        # A/B/canary tools: pruned mode-2 megakernel tree, bf16
        # stream, dynamic int8-FFN (qffn) — or, with a calibration
        # batch or precomputed scales, static scales + int8 at every
        # projection (level 3:
        # decisive at D>=1024, batch-neutral at D=512, B=1 champion
        # at both widths — docs/PERFORMANCE.md). Accuracy gated by
        # tests/test_bf16_stream.py, test_quant.py (TestQffnAccuracy,
        # TestStaticActScales) + the full-size torch-oracle bounds
        # (test_full_size_parity.py), all zero top-1 flips.
        # engine="int4": once calibration inputs/scales exist, build the
        # weight-streaming latency level instead of the default level 3.
        # qffn_level/q8aux override the instance flags so the auto
        # router (_build_engines) can build the per-bucket variants from
        # the same recipe.
        calibrated = act_inputs is not None or act_scales is not None
        if qffn_level is _UNSET:
            qffn_level = getattr(self, "_qffn_level", None)
        if q8aux is _UNSET:
            q8aux = getattr(self, "_q8aux", False)
        # q8aux needs static scales too: active only in the calibrated
        # build (with stored scales, the side file must carry "aux" —
        # the builder raises otherwise, by design: silent fallback would
        # hide a stale pre-r4 side file from the deployer)
        serve, prepared = build_production_engine(
            params, self.cfg.layer, self.cfg.multi_head,
            qffn=qffn_level if calibrated else None,
            q8aux=q8aux and calibrated,
            act_scale_inputs=act_inputs, act_scales=act_scales)

        def forward(params, img, ques):
            return jax.nn.sigmoid(
                serve(params, img, ques).astype(jnp.float32))

        return forward, prepared

    def _build_engines(self, params, act_inputs, act_scales):
        """Build the engine set + per-bucket routes for the fused path.

        Non-routed builds (explicit ``engine=...``, uncalibrated auto)
        get exactly one engine from the instance flags — routing never
        overrides a deployer's choice. Calibrated ``engine="auto"``
        builds the measured per-regime champions (resolve_auto_routes)
        and maps each compiled latency bucket to its winner; every
        variant shares the level-3 base's calibration replay/scales, so
        the extra engines cost only their (lazily compiled) builds.
        Returns ``({name: (forward, prepared)}, {bucket: name})``.
        """
        calibrated = act_inputs is not None or act_scales is not None
        if not (self._auto_routing and calibrated):
            built = {"base": self._build_fused(params, act_inputs,
                                               act_scales=act_scales)}
            return built, {int(b): "base" for b in self._buckets}
        # a calibration sample can always derive the "aux" scale tuple;
        # stored side files must already carry it (pre-r4 files don't)
        aux_ok = act_inputs is not None or (
            isinstance(act_scales, dict) and "aux" in act_scales)
        routes = resolve_auto_routes(self.cfg.hidden_size, self._buckets,
                                     True, aux_available=aux_ok)
        if self._q8aux:
            # explicit q8aux=True already puts the aux sites in the base
            # engine — a separate q8aux variant would be the same build
            routes = {b: ("base" if r == "q8aux" else r)
                      for b, r in routes.items()}
        variants = set(routes.values()) - {"base"}
        if act_inputs is not None and (variants or self._q8aux):
            # derive the scales ONCE from the sample (the Trainer's
            # stored-side-file recipe) so every engine variant consumes
            # the same precomputed dict instead of re-running the
            # calibration replay per build — each replay is a fresh jit
            # at the sample shape (minutes on a remote-compile rig), and
            # the shared dict keeps the enc/dec scales on the bf16-kv
            # path the default engine serves (the ADVICE r4 convention)
            shared = self._calibrate_scales(
                params, act_inputs,
                need_aux=self._q8aux or "q8aux" in variants)
            if shared is not None:
                act_scales, act_inputs = shared, None
        built = {"base": self._build_fused(params, act_inputs,
                                           act_scales=act_scales)}
        if "int4" in variants:
            built["int4"] = self._build_fused(
                params, act_inputs, act_scales=act_scales,
                qffn_level=5, q8aux=self._q8aux)
        if "q8aux" in variants:
            built["q8aux"] = self._build_fused(
                params, act_inputs, act_scales=act_scales,
                qffn_level=None, q8aux=True)
        return built, routes

    def _calibrate_scales(self, params, act_inputs, need_aux: bool):
        """One calibration replay shared by every routed engine variant
        (the same two-pass recipe the Trainer uses for the checkpoint
        side file, train/trainer.py: enc/dec scales calibrated on the
        bf16-kv path the default engine serves; the "aux" tuple, when
        needed, from a second replay with the aux sites attached so its
        scales are self-consistent with the q8aux decoder stream).
        Returns None when the model dims are outside the megakernel
        envelope — the caller then falls back to per-build calibration,
        which warns and serves uncalibrated."""
        from mcan_vqa_tpu.ops import serving as serving_mod
        from mcan_vqa_tpu.ops.quant import (calibrate_qffn_act_scales,
                                            prepare_q8aux_params)
        img, ques = act_inputs
        prepared = serving_mod.prepare_production_params(
            params, self.cfg.layer, self.cfg.multi_head, qffn=3)
        if "_mk" not in prepared["backbone"]["enc_0"]:
            return None
        scales = calibrate_qffn_act_scales(
            prepared, img, ques, self.cfg.layer, self.cfg.multi_head)
        if need_aux:
            prepared["_q8aux"] = prepare_q8aux_params(prepared,
                                                      self.cfg.layer)
            scales["aux"] = calibrate_qffn_act_scales(
                prepared, img, ques, self.cfg.layer,
                self.cfg.multi_head)["aux"]
        return scales

    def _build_plain(self, params):
        model = build_mcan(self.cfg, token_size=len(self.token_to_ix),
                           answer_size=len(self.ix_to_ans))

        def forward(params, img, ques):
            out = model.apply({"params": params}, img, ques,
                              deterministic=True)
            return jax.nn.sigmoid(out["logits"].astype(jnp.float32))

        return forward, params

    def _wrap(self, forward, params):
        """jit (+ mesh placement) -> (compiled_forward, placed_params)."""
        if not self._mesh_live:
            return jax.jit(forward), params
        from jax.sharding import PartitionSpec as P

        from mcan_vqa_tpu.parallel.mesh import DATA_AXIS
        params = jax.device_put(params, self._rep)
        if self.engine == "plain":
            # GSPMD partitions model.apply itself (batch sharded,
            # params replicated — same scheme as the Trainer's eval).
            fwd = jax.jit(forward,
                          in_shardings=(self._rep, self._dat, self._dat),
                          out_shardings=self._dat)
        else:
            # Pallas megakernels are single-device programs: run the
            # engine per data shard (same wiring as Trainer.predict
            # on dp>1 meshes, train/trainer.py).
            from jax import shard_map
            fwd = jax.jit(shard_map(
                forward, mesh=self.mesh,
                in_specs=(P(), P(DATA_AXIS), P(DATA_AXIS)),
                out_specs=P(DATA_AXIS), check_vma=False))
        return fwd, params

    def _install(self, built, routes):
        """Wrap + place every engine and swap the set live atomically.

        built: {name: (forward, prepared)}; routes: {bucket: name}.
        ``self.params``/``self._forward`` stay the base engine's views
        (what single-engine callers and tests inspect); dispatch reads
        ``self._live`` — one atomic handle holding wrapped engines AND
        routes together, so an online-calibration swap can never pair a
        new engine with an old tree (or tear routes across two engine
        sets) under concurrent callers."""
        live = {name: self._wrap(fwd, prep)
                for name, (fwd, prep) in built.items()}
        assert set(routes.values()) <= set(live), (routes, set(live))
        self._forward, self.params = live["base"]
        self._live = (live, {int(b): r for b, r in routes.items()})

    @property
    def routes(self) -> Dict[int, str]:
        """The live bucket->engine routing table (single-engine builds
        map every bucket to "base")."""
        return dict(self._live[1])

    # ------------------------------------------------------------------
    # online calibration
    @property
    def calibration(self) -> Dict[str, object]:
        """Progress of the online static-scale calibration:
        state in {"off", "collecting", "paused", "calibrating",
        "calibrated"}, samples buffered so far, and the trigger target.
        A FAILED attempt re-enters "collecting" for retry (with a
        doubled target) and records the failure under "error" — so
        state=="collecting" with an "error" key means "failed, will
        retry", not "never tried"."""
        out = {"state": self._cal_state,
               "samples": self._cal_n,
               "target": self._auto_cal}
        if self._cal_error is not None:
            out["error"] = str(self._cal_error)
        return out

    def calibration_paused(self):
        """Context manager suspending online-calibration sample
        collection. For traffic that is not representative of
        production — the serve CLI wraps its warmup forwards in this so
        near-zero dummy batches never skew (or, all-zero, poison) the
        static activation scales."""
        import contextlib

        @contextlib.contextmanager
        def _pause():
            with self._cal_lock:
                resume = self._cal_state == "collecting"
                if resume:
                    self._cal_state = "paused"
            try:
                yield
            finally:
                if resume:
                    with self._cal_lock:
                        if self._cal_state == "paused":
                            self._cal_state = "collecting"
        return _pause()

    def wait_calibrated(self, timeout: Optional[float] = None) -> bool:
        """Block until a pending background calibration swap ATTEMPT
        finishes (True) or `timeout` seconds pass (False). True means
        the background thread is done, not that it succeeded: a failed
        attempt re-enters "collecting" for retry — distinguish via
        ``calibration`` (state "calibrated" = swapped; an "error" key =
        the attempt failed and will retry). Only meaningful once enough
        samples have been buffered to start one."""
        t = self._cal_thread
        if t is not None:
            t.join(timeout)
            if t.is_alive():
                return False
            # the thread ran to completion: either it swapped
            # ("calibrated") or its failure path already restored the
            # buffer and recorded _cal_error — both are "finished", and
            # returning False here would be indistinguishable from a
            # still-running swap (the caller would block/poll forever
            # on an attempt that ended long ago)
            return True
        return self._cal_state == "calibrated"

    def calibrate_now(self) -> None:
        """Force the online calibration swap from whatever samples are
        buffered (>= 1 required), synchronously. For deployments whose
        traffic won't reach ``auto_calibrate`` samples, and for
        exporting a calibrated artifact right after warmup."""
        with self._cal_lock:
            if self._cal_state != "collecting":
                raise RuntimeError(
                    f"calibration is {self._cal_state!r}, not collecting")
            if not self._cal_n:
                raise RuntimeError("no calibration samples buffered yet")
            img, ques = self._drain_buffer_locked()
        self._recalibrate(img, ques, reraise=True)

    def _drain_buffer_locked(self):
        img = np.concatenate(self._cal_imgs)[:self._auto_cal]
        ques = np.concatenate(self._cal_ques)[:self._auto_cal]
        self._cal_imgs = self._cal_ques = None
        self._cal_state = "calibrating"
        return img, ques

    def _collect_calibration(self, ques: np.ndarray, img: np.ndarray):
        """Buffer the REAL (unpadded, finite) rows of a request; kick
        off the background rebuild once the target is reached. A
        non-finite feature row would bake NaN into every int8 site's
        static scale (ops/quant._check_scales), so such samples are
        excluded here rather than trusted to upstream validation."""
        finite = np.isfinite(img).all(axis=tuple(range(1, img.ndim)))
        if not finite.all():
            ques, img = ques[finite], img[finite]
        if not len(img):
            return
        with self._cal_lock:
            if self._cal_state != "collecting":
                return
            # no defensive copy: both arrays are freshly allocated per
            # request by _prep_inputs (np.stack / encode_questions), and
            # the bucket padding downstream concatenates into NEW arrays
            # — an extra copy here (~0.8 MB/row-set at MCAN-large) would
            # be pure allocation under the lock
            self._cal_imgs.append(np.asarray(img))
            self._cal_ques.append(np.asarray(ques))
            self._cal_n += len(img)
            if self._cal_n < self._auto_cal:
                return
            img_cal, ques_cal = self._drain_buffer_locked()
            # assigned under the SAME lock as the 'calibrating' state
            # flip: a concurrent wait_calibrated must never observe
            # state='calibrating' with _cal_thread still None (it would
            # return immediately instead of blocking on the swap)
            self._cal_thread = threading.Thread(
                target=self._recalibrate, args=(img_cal, ques_cal),
                name="predictor-calibration", daemon=True)
        self._cal_thread.start()

    def _recalibrate(self, img_cal: np.ndarray, ques_cal: np.ndarray,
                     reraise: bool = False):
        """Build the calibrated engine, pre-warm every compiled bucket,
        then swap it live. Runs off the serving thread: traffic keeps
        flowing through the dynamic-quant engine until the new one is
        compiled and warm, so the swap adds zero request latency."""
        try:
            built, routes = self._build_engines(
                self._raw_params, (img_cal, ques_cal), None)
            live = {name: self._wrap(fwd, prep)
                    for name, (fwd, prep) in built.items()}
            r = int(self.cfg.img_feat_pad_size)
            f = int(self.cfg.img_feat_size)
            t = int(self.cfg.max_token)
            for b in self._buckets:
                fwd, placed = live[routes[int(b)]]
                np.asarray(fwd(placed, np.zeros((b, r, f), np.float32),
                               np.zeros((b, t), np.int32)))
            self._forward, self.params = live["base"]
            self._live = (live, {int(b): r_ for b, r_ in routes.items()})
            self._cal_state = "calibrated"
            self._cal_error = None   # a retried-then-successful run
            self._raw_params = None
        except Exception as e:  # noqa: BLE001 — serving must survive
            # NOT terminal: the drained samples go back in the buffer and
            # the state returns to 'collecting' so a later calibrate_now
            # (or more traffic) can retry. The auto-trigger target doubles
            # each failure — a persistent fault backs off instead of
            # re-failing on every request that crosses the threshold.
            with self._cal_lock:
                self._cal_error = e
                self._cal_imgs = [img_cal]
                self._cal_ques = [ques_cal]
                self._cal_n = len(img_cal)
                self._auto_cal = max(self._auto_cal * 2, self._cal_n + 1)
                self._cal_state = "collecting"
            if reraise:  # calibrate_now is synchronous: caller sees it
                raise
            warnings.warn(f"online calibration failed; serving stays on "
                          f"the dynamic-quant engine (will retry at "
                          f"{self._auto_cal} samples): {e!r}")

    # ------------------------------------------------------------------
    @property
    def img_feat_size(self) -> int:
        """Per-region feature width F a request row must have."""
        return int(self.cfg.img_feat_size)

    def _prep_inputs(self, questions: Sequence[str], image_features):
        """Host prep shared by serving and calibration — and, via
        request_prep, with the frozen-artifact loader (one
        implementation, no live/artifact drift). Returns
        (ques [N, T] int32, img [N, R, F] f32)."""
        from mcan_vqa_tpu.request_prep import prep_request_inputs
        return prep_request_inputs(
            questions, image_features, self.token_to_ix,
            self.cfg.max_token, self.cfg.img_feat_pad_size)

    # ------------------------------------------------------------------
    @classmethod
    def from_checkpoint(cls, path: str, cfg, token_to_ix: Dict[str, int],
                        ix_to_ans: Optional[Dict[str, str]] = None,
                        epoch: Optional[int] = None,
                        max_batch: int = 64,
                        engine: str = "auto",
                        latency_buckets: Optional[Sequence[int]] = None,
                        mesh=None, act_calibration=None,
                        act_scales=None,
                        auto_calibrate: int = 256,
                        q8aux: bool = False) -> "Predictor":
        """path: a reference .pkl/.pt, or an orbax checkpoint directory.

        act_scales: None (default) AUTO-LOADS the static activation
        scales the Trainer calibrated at end-of-train and stored next to
        the orbax checkpoint (``<path>.act_scales.json`` —
        checkpoint.save_act_scales), shipping the calibrated level-3
        engine with zero ritual; False disables the auto-load; a dict is
        used as-is."""
        from mcan_vqa_tpu.train import checkpoint as ckpt_mod

        if path.endswith((".pkl", ".pt", ".pth")):
            params, _ = ckpt_mod.import_torch_checkpoint(path)
        else:
            import orbax.checkpoint as ocp
            with ocp.PyTreeCheckpointer() as ckptr:
                restored = ckptr.restore(path)
            params = restored["params"] if "params" in restored else restored
            if act_scales is None and act_calibration is None:
                # _default_backend, not jax.default_backend: the hook is
                # how tests/__graft_entry__ pin the TPU decision table on
                # CPU — bypassing it here would auto-load scales under a
                # different rule than the engine resolution uses
                on_tpu = _default_backend() == "tpu"
                # "int4" consumes the same stored scales (the packed
                # weights are derived from params at build time), so the
                # zero-ritual promise extends to the latency engine too
                if engine in ("fused", "int4") \
                        or (engine == "auto" and on_tpu):
                    act_scales = ckpt_mod.load_act_scales(path)
        # a remaining act_scales=False (auto-load declined) is normalized
        # to None by Predictor.__init__ — one source of truth
        return cls(cfg, params, token_to_ix, ix_to_ans, max_batch, engine,
                   latency_buckets=latency_buckets, mesh=mesh,
                   act_calibration=act_calibration, act_scales=act_scales,
                   auto_calibrate=auto_calibrate, q8aux=q8aux)

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

        live, routes = self._live
        ques, img = self._prep_inputs(questions, image_features)
        if self._cal_state == "collecting":
            self._collect_calibration(ques, img)

        target = next(b for b in self._buckets if b >= n)
        fwd, params = live[routes[target]]
        from mcan_vqa_tpu.request_prep import pad_to_bucket
        img, ques = pad_to_bucket(img, ques, target)
        return fwd(params, img, ques), n

    def export_artifact(self, path: str,
                        platforms: Optional[Sequence[str]] = None) -> None:
        """Freeze this predictor to an AOT serving artifact directory
        (StableHLO via jax.export + params + vocab; see
        mcan_vqa_tpu.artifact). Load with artifact.load_artifact(path) —
        no model code or flax needed on the serving host. The CURRENT
        engine is what freezes: export after the online calibration swap
        (``wait_calibrated()`` / ``calibrate_now()``) to ship the
        calibrated engine."""
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
