"""Training/eval orchestration — the reference's Execution layer rebuilt
(reference: core/exec.py:27-426 Execution, 429-754 ExecuteMIMIC).

Differences by design (TPU-first; quirks NOT reproduced, see SURVEY.md §2):
  * checkpoints are written EVERY epoch (the reference only saves after the
    final epoch, core/exec.py:240-253, contradicting its own README)
  * evaluation never shuffles or drops examples (the reference reuses its
    always-shuffling, drop_last loader for eval, core/exec.py:375)
  * one jitted, mesh-sharded train step; gradient accumulation runs inside
    the step (lax.scan), not as a host loop
"""

from __future__ import annotations

import os
import time
from typing import Any, Dict, Optional

import jax
import numpy as np

from mcan_vqa_tpu.data.pipeline import BatchLoader
from mcan_vqa_tpu.evals import vqa_eval
from mcan_vqa_tpu.evals.roc_auc import multilabel_roc_auc
from mcan_vqa_tpu.models.net import ClassifierNet, build_mcan
from mcan_vqa_tpu.parallel import sharding as shd
from mcan_vqa_tpu.parallel.mesh import batch_sharding, make_mesh
from mcan_vqa_tpu.train import checkpoint as ckpt_mod
from mcan_vqa_tpu.train.optim import make_lr_schedule, make_optimizer
from mcan_vqa_tpu.train.step import make_eval_step, make_train_step
from mcan_vqa_tpu.train.train_state import TrainState
from mcan_vqa_tpu.utils.logging import RunLogger, StepMeter
from mcan_vqa_tpu.utils.profiling import StepTimer, trace


class Trainer:
    def __init__(self, cfg, train_dataset=None, eval_datasets: Optional[Dict] = None,
                 use_pallas: bool = False, task: str = "vqa",
                 eval_cadence: Optional[Dict[str, int]] = None):
        """task: "vqa" (MCANet, img+ques) or "classify" (ClassifierNet,
        image-only multi-label; reference: core/exec.py:757-1066).

        eval_cadence: optional {eval_datasets name: every N epochs} —
        datasets absent from the map evaluate every epoch. Reproduces the
        reference's MIMIC loop, which scores the TRAIN split only every
        2nd epoch while the test split runs each epoch
        (core/exec.py:664-679: ``if epoch % 2 == 0``)."""
        self.cfg = cfg
        self.task = task
        self.image_only = task == "classify"
        if cfg.debug_nans:
            # TPU-native analogue of the reference's cudnn.deterministic
            # debugging posture (cfgs/base_cfgs.py:202)
            jax.config.update("jax_debug_nans", True)
        self.train_dataset = train_dataset
        self.eval_datasets = eval_datasets or {}
        self.eval_cadence = dict(eval_cadence or {})

        ref = train_dataset or next(iter(self.eval_datasets.values()))
        self.token_size = getattr(ref, "token_size", 2)
        self.ans_size = ref.ans_size
        self.ix_to_ans = getattr(ref, "ix_to_ans", None)
        if self.image_only:
            import jax.numpy as jnp
            self.model = ClassifierNet(
                answer_size=self.ans_size, hidden_size=cfg.hidden_size,
                num_layers=cfg.layer, num_heads=cfg.multi_head,
                ff_size=cfg.ff_size, img_feat_size=cfg.img_feat_size,
                flat_mlp_size=cfg.flat_mlp_size,
                flat_glimpses=cfg.flat_glimpses,
                flat_out_size=cfg.flat_out_size,
                dropout_rate=cfg.dropout_rate,
                dtype=jnp.dtype(cfg.compute_dtype), use_pallas=use_pallas,
                dropout_bits=getattr(cfg, "dropout_bits", 32))
        else:
            self.model = build_mcan(
                cfg, self.token_size, self.ans_size,
                pretrained_emb=getattr(ref, "pretrained_emb", None),
                use_pallas=use_pallas)

        self.mesh = make_mesh(dict(cfg.mesh_shape))
        data_size = len(train_dataset) if train_dataset else cfg.batch_size
        self.lr_schedule = make_lr_schedule(
            cfg.lr_base, data_size, cfg.batch_size,
            decay_epochs=tuple(cfg.lr_decay_list),
            decay_rate=cfg.lr_decay_rate)
        self.tx = make_optimizer(cfg, data_size)
        self.state: Optional[TrainState] = None
        self._jit_train = None
        self._jit_eval = None
        self._stacked = False   # set with _jit_train (train loop layout)
        self.logger = RunLogger(cfg.log_path, cfg.version, cfg.to_dict(),
                                echo=cfg.verbose)

    # ------------------------------------------------------------------
    def _rng_impl(self) -> str:
        return getattr(self.cfg, "dropout_rng_impl", "rbg")

    def _init_params(self):
        ds = self.train_dataset or next(iter(self.eval_datasets.values()))
        ex = ds.example(0)
        img = np.zeros((1,) + ex["img"].shape, np.float32)
        inputs = (img,) if self.image_only else \
            (img, np.zeros((1,) + ex["ques"].shape, np.int32))
        return jax.jit(self.model.init)(
            {"params": jax.random.PRNGKey(self.cfg.seed)}, *inputs)["params"]

    def ensure_state(self, resume: Optional[bool] = None) -> TrainState:
        if self.state is not None:
            return self.state
        cfg = self.cfg
        params = self._init_params()
        state = TrainState.create(params, self.tx, seed=cfg.seed,
                                  rng_impl=self._rng_impl())

        do_resume = cfg.resume if resume is None else resume
        if do_resume:
            state = self._resume(state)
        self.state = shd.shard_state(self.mesh, state)
        return self.state

    def _resume(self, state: TrainState) -> TrainState:
        cfg = self.cfg
        if cfg.ckpt_path:
            if cfg.ckpt_path.endswith((".pkl", ".pt", ".pth")):
                params, meta = ckpt_mod.import_torch_checkpoint(cfg.ckpt_path)
                params = _merge_compatible(state.params, params, self.logger)
                # reference replays the warmup counter from the epoch
                # (core/exec.py:90-94); epoch arithmetic is the fallback
                # when the pickle carries no optimizer state.
                step = int(len(self.train_dataset or []) / cfg.batch_size
                           * cfg.ckpt_epoch)
                new = TrainState.create(params, self.tx, seed=cfg.seed,
                                        step=step,
                                        rng_impl=self._rng_impl())
                if "optimizer" in meta:
                    # trajectory-faithful resume: transplant the AdamW
                    # moments + actual step count (core/exec.py:90-92)
                    opt_state, tstep = ckpt_mod.import_torch_opt_state(
                        meta["optimizer"], meta["param_keys"],
                        new.opt_state)
                    self.logger.write(
                        f"resume: restored AdamW moments @ step {tstep}")
                    new = new.replace(opt_state=opt_state,
                                      step=np.int32(tstep))
                return new
            template = {"params": jax.device_get(state.params),
                        "opt_state": jax.device_get(state.opt_state),
                        "step": 0}
            # explicit orbax checkpoint directory
            restored = ckpt_mod.restore_checkpoint_path(
                cfg.ckpt_path, template=template)
        else:
            # restore with a template so optax state keeps its NamedTuple
            # structure (orbax would otherwise return plain dicts)
            template = {"params": jax.device_get(state.params),
                        "opt_state": jax.device_get(state.opt_state),
                        "step": 0}
            restored = ckpt_mod.restore_checkpoint(
                cfg.ckpts_dir, cfg.ckpt_version, cfg.ckpt_epoch,
                template=template)
        return TrainState(
            params=restored["params"], opt_state=restored["opt_state"],
            step=np.int32(restored["step"]),
            dropout_rng=jax.random.key(cfg.seed, impl=self._rng_impl()))

    def warm_start(self, path: str) -> None:
        """Load shape-compatible params from a checkpoint (MIMIC warm-start
        from the VQA zoo, reference: core/exec.py:468-475)."""
        state = self.ensure_state(resume=False)
        if path.endswith((".pkl", ".pt", ".pth")):
            params, _ = ckpt_mod.import_torch_checkpoint(path)
        else:
            params = ckpt_mod.restore_checkpoint_path(path)["params"]
        merged = _merge_compatible(jax.device_get(state.params), params,
                                   self.logger)
        self.state = shd.shard_state(
            self.mesh, TrainState.create(merged, self.tx, seed=self.cfg.seed,
                                         rng_impl=self._rng_impl()))

    # ------------------------------------------------------------------
    def train(self, start_epoch: int = 0) -> TrainState:
        """Epoch loop. Preemption-safe: SIGTERM/SIGINT request a checkpoint
        at the next step boundary and a clean return (TPU pods get
        preempted; the reference had no story beyond losing the run —
        SURVEY.md §5 failure handling)."""
        import signal

        cfg = self.cfg
        # fresh (non-resume) runs clear this version's previous checkpoints
        # and logs (reference: core/exec.py:96-102 + empty_log)
        if not cfg.resume and start_epoch == 0 and self.state is None:
            import shutil
            d = os.path.join(cfg.ckpts_dir, f"ckpt_{cfg.version}")
            if os.path.isdir(d):
                self.logger.write(f"fresh run: clearing {d}")
                shutil.rmtree(d, ignore_errors=True)
            # logs too (the reference's empty_log): without this the new
            # run's epoch records append after the old run's in the
            # JSONL mirror — duplicate epoch keys. Re-seed the header
            # the constructor wrote (timestamp + config dump).
            self.logger.clear()
            import json as _json
            import time as _time
            self.logger.write(
                f"NOW TIME: {_time.strftime('%Y-%m-%d %H:%M:%S')}")
            self.logger.write(_json.dumps(cfg.to_dict(), default=str))
        state = self.ensure_state()

        stop_requested = {"flag": False}

        def _request_stop(signum, frame):
            stop_requested["flag"] = True
            self.logger.write(f"signal {signum}: checkpoint-and-exit "
                              f"requested")

        old_handlers = {}
        try:
            for sig in (signal.SIGTERM, signal.SIGINT):
                old_handlers[sig] = signal.signal(sig, _request_stop)
        except ValueError:
            old_handlers = {}  # non-main thread: run without handlers
        # background checkpoint writer: the chip trains through the
        # device->host fetch + orbax write instead of idling on it
        saver = ckpt_mod.AsyncCheckpointSaver() if cfg.ckpt_async else None
        if self._jit_train is None:
            forward_fn = None
            if self._use_fused_train():
                # single-TPU VQA training through the custom-VJP fused SGA
                # blocks with in-kernel PRNG dropout + in-kernel dW
                # (docs/PERFORMANCE.md: 37.5 vs 48.9 ms/step at MCAN-small
                # B=256). CPU (forced
                # via train_engine="fused") runs interpret mode with
                # external masks — the testable reference path.
                from mcan_vqa_tpu.train.fused_engine import (
                    make_fused_classifier_forward, make_fused_train_forward)
                on_tpu = jax.default_backend() == "tpu"
                if self.image_only:
                    forward_fn = make_fused_classifier_forward(
                        cfg.layer, cfg.multi_head,
                        dropout_rate=cfg.dropout_rate,
                        dropout_bits=cfg.dropout_bits,
                        interpret=not on_tpu, in_kernel_dropout=on_tpu)
                    self.logger.write("train engine: fused SA blocks "
                                      f"(classifier, "
                                      f"in_kernel_dropout={on_tpu})")
                else:
                    # groups: same-session r3 sweeps with in-kernel dW
                    # accumulation — decoder D=512: G=2 6,483 / G=4 6,829
                    # / G=8 6,304 samples/s (B=256); bigger groups halve
                    # the dW accumulate steps until VMEM/softmax width
                    # bites. D=1024 runs G=2 (VMEM headroom). Encoder SA
                    # stack through the fused SA blocks too (r3: XLA
                    # encoder 6,781 / fused G=8 7,001 / fused G=16 7,129
                    # samples/s — the r2 "slightly slower" verdict was an
                    # artifact of the old emission-heavy kernels).
                    # att_saves/bf16_saves at hidden>512 only: the
                    # attention backward's 6*D^2 projection recompute
                    # scales as D^2 while the saved-activation HBM
                    # traffic scales as D — measured r4 session 6
                    # (tools/validate_att_saves.py gates the grads):
                    # D=1024 1,944 vs 1,876 samples/s (+3.6%); at D=512
                    # the same trade is neutral-to-negative.
                    wide = cfg.hidden_size > 512
                    # stacked-native param layout (ops/stacked_params):
                    # measured NEGATIVE r5 (-0.9% small / -4.3% large interleaved
                    # medians — see configs/config.py stacked_params), so
                    # "auto" resolves off; "on" forces the layout (its
                    # correctness gates stay green)
                    self._stacked = getattr(cfg, "stacked_params",
                                            "auto") in ("on", True)
                    forward_fn = make_fused_train_forward(
                        cfg.layer, cfg.multi_head,
                        dropout_rate=cfg.dropout_rate,
                        dropout_bits=cfg.dropout_bits,
                        group=4 if cfg.hidden_size <= 512 else 2,
                        fused_encoder=cfg.hidden_size <= 512,
                        encoder_group=16,
                        att_saves=wide, bf16_saves=wide,
                        interpret=not on_tpu, in_kernel_dropout=on_tpu,
                        stacked=self._stacked)
                    self.logger.write("train engine: fused SGA blocks + "
                                      f"fused SA encoder "
                                      f"(in_kernel_dropout={on_tpu}, "
                                      f"stacked_params={self._stacked})")
            fused_dp = (forward_fn is not None
                        and self.mesh.devices.size > 1)
            # The r2 donate+Pallas D=1024 worker fault is GONE with the
            # in-kernel-dW kernels (the per-position emission outputs
            # whose aliasing triggered it no longer exist): measured r3
            # fused D=1024 WITH donation 2,438 samples/s, clean.
            donate = cfg.donate_buffers
            if forward_fn is None or self.image_only:
                if getattr(cfg, "stacked_params", "auto") in ("on", True):
                    # say so: the layout rides the fused VQA train engine
                    # only, and "the log line is missing" is not a signal
                    self.logger.write(
                        "stacked_params='on' ignored: the stacked layout "
                        "applies only to the fused VQA train engine "
                        "(not plain/classifier paths)")
                self._stacked = False
            if self._stacked:
                from mcan_vqa_tpu.ops import stacked_params as sp_mod
                state = sp_mod.to_stacked_state(state, cfg.layer)
            step_fn = make_train_step(
                self.model, self.tx, grad_accu_steps=cfg.grad_accu_steps,
                reg_factor=cfg.reg_factor, lr_schedule=self.lr_schedule,
                image_only=self.image_only,
                reg_mode="smooth_l1" if self.image_only else "l1l2",
                forward_fn=forward_fn,
                data_axis="data" if fused_dp else None,
                per_param_norms=cfg.grad_norm_log_every > 0,
                grad_norm_clip=cfg.grad_norm_clip)
            if fused_dp:
                # XLA's SPMD partitioner cannot split a pallas_call, so
                # the fused step runs per data shard under shard_map
                # (explicit in-step grad psum)
                self._jit_train = shd.shardmap_train_step(
                    step_fn, self.mesh, donate=donate)
            else:
                self._jit_train = shd.jit_train_step(
                    step_fn, self.mesh, jax.device_get(state),
                    donate=donate)

        if self._stacked:
            # cached-_jit_train path (a second train() on this Trainer):
            # the fresh state from ensure_state is standard-layout
            from mcan_vqa_tpu.ops import stacked_params as sp_mod
            if not sp_mod.is_stacked(state.params):
                state = sp_mod.to_stacked_state(state, cfg.layer)
            unstack = sp_mod.from_stacked_state
        else:
            unstack = lambda s: s  # noqa: E731

        loader = BatchLoader(
            self.train_dataset, cfg.batch_size, shuffle=True, drop_last=True,
            seed=cfg.seed, num_workers=cfg.num_workers,
            sharding=batch_sharding(self.mesh), **self._process_kwargs())

        if cfg.resume:
            start_epoch = max(start_epoch, cfg.ckpt_epoch)

        last_inputs = None
        last_saved_epoch = None
        try:
            with trace(cfg.profile_dir):
                for epoch in range(start_epoch, cfg.max_epoch):
                    loader.set_epoch(epoch)
                    t0 = time.time()
                    meter = StepMeter(len(loader), enabled=cfg.verbose)
                    timer = StepTimer()
                    keys = ("img", "target") if self.image_only else \
                        ("img", "ques", "target")
                    loss_sum, n_steps = 0.0, 0
                    metrics = {"loss": 0.0, "lr": 0.0}
                    norm_sums: Dict[str, float] = {}
                    for batch in loader:
                        if stop_requested["flag"]:
                            break
                        batch = {k: batch[k] for k in keys}
                        # held for end-of-train serving calibration (the
                        # train step donates only the state, never the
                        # batch buffers — parallel/sharding.py)
                        last_inputs = tuple(batch[k] for k in keys
                                            if k != "target")
                        state, metrics = self._jit_train(state, batch)
                        loss_sum += float(metrics["loss"])
                        n_steps += 1
                        if "param_grad_norms" in metrics:
                            # per-param grad-norm bookkeeping (reference
                            # accumulates these every step, core/exec.py:199-202)
                            flat, _ = jax.tree_util.tree_flatten_with_path(
                                jax.device_get(metrics["param_grad_norms"]))
                            for path, v in flat:
                                name = "/".join(
                                    getattr(p, "key", str(p)) for p in path)
                                norm_sums[name] = norm_sums.get(name, 0.0) \
                                    + float(v)
                            if n_steps % cfg.grad_norm_log_every == 0:
                                self.logger.jsonl({"epoch": epoch,
                                                   "step": n_steps,
                                                   "grad_norm_sums": norm_sums})
                        timer.tick()
                        meter.update({"loss": metrics["loss"], "lr": metrics["lr"]})
                        # classifier flow: periodic in-epoch eval
                        # (reference: core/exec.py:940-951)
                        if (self.image_only and cfg.eval_interval > 0
                                and n_steps % cfg.eval_interval == 0
                                and self.eval_datasets):
                            self.state = state
                            for name, ds in self.eval_datasets.items():
                                r = self.evaluate(ds)
                                self.logger.write(
                                    f"  [step {n_steps}] {name}: {r}")
                    # boundary layout: everything outside the step sees
                    # the standard tree (eval engines, checkpoints,
                    # calibration, callers inspecting trainer.state)
                    std_state = unstack(state)
                    self.state = std_state

                    epoch_metrics = {
                        "loss": loss_sum / max(n_steps, 1),
                        "lr": float(metrics["lr"]),
                        "wall_s": time.time() - t0,
                        "step_ema_s": timer.ema or 0.0,
                    }
                    if norm_sums:
                        self.logger.jsonl({"epoch": epoch, "step": n_steps,
                                           "grad_norm_sums": norm_sums,
                                           "final": True})
                    if saver is not None:
                        saver.save(std_state, cfg.ckpts_dir, cfg.version,
                                   epoch + 1,
                                   keep_last=cfg.keep_last_ckpts)
                    else:
                        ckpt_mod.save_checkpoint(std_state, cfg.ckpts_dir,
                                                 cfg.version, epoch + 1)
                        if cfg.keep_last_ckpts > 0:
                            ckpt_mod.prune_checkpoints(cfg.ckpts_dir, cfg.version,
                                                       cfg.keep_last_ckpts)
                    last_saved_epoch = epoch + 1
                    if stop_requested["flag"]:
                        self.logger.epoch(epoch, {**epoch_metrics,
                                                  "preempted_at_step": n_steps})
                        break
                    if cfg.eval_every_epoch:
                        for name, ds in self.eval_datasets.items():
                            every = max(int(self.eval_cadence.get(name, 1)),
                                        1)
                            if epoch % every:   # reference cadence phase:
                                continue        # epochs 0, N, 2N, ...
                            res = self.evaluate(ds)
                            for k, v in res.items():
                                if isinstance(v, float):
                                    epoch_metrics[f"{name}/{k}"] = v
                    self.logger.epoch(epoch, epoch_metrics)
        finally:
            # always restore the signal handlers and flush the async
            # checkpoint writer, even when training/eval raises mid-epoch
            # (otherwise queued snapshots die with the daemon thread,
            # possibly mid-orbax-write, and a stored worker error is
            # never surfaced)
            import signal as _sig
            for sig, h in old_handlers.items():
                _sig.signal(sig, h)
            if saver is not None:
                import sys as _sys
                # capture BEFORE close(): inside the except block below,
                # exc_info() would be the close() failure itself, never
                # None — checking there silently swallowed a failed
                # final-checkpoint flush on a CLEAN training exit
                unwinding = _sys.exc_info()[0] is not None
                try:
                    saver.close()   # flush pending writes
                except Exception:
                    if not unwinding:
                        raise       # no outer exception: surface it
                    self.logger.write(
                        "async checkpoint flush failed during error "
                        "unwind (original exception propagates)")
        state = unstack(state)
        self.state = state
        if (getattr(cfg, "ckpt_calibrate", True)
                and last_inputs is not None
                and last_saved_epoch is not None
                and dict(cfg.mesh_shape).get("model", 1) == 1
                and jax.process_count() == 1
                and not getattr(cfg, "fused_qkv", False)):
            # end-of-train serving calibration (VERDICT r3 #1): static
            # int8 activation scales from the last REAL training batch,
            # stored next to the final checkpoint so Predictor ships the
            # calibrated level-3 engine with no per-process ritual.
            # Best-effort: a failure here must never lose a finished
            # training run. Scoped to the fused engine's own envelope
            # (1-process, no TP, split q/k/v tree); multi-host deployers
            # calibrate at serving time via Predictor(auto_calibrate=...).
            try:
                self._save_serving_calibration(state, last_inputs,
                                               last_saved_epoch)
            except Exception as e:  # noqa: BLE001
                self.logger.write(
                    f"end-of-train serving calibration failed (the "
                    f"training run itself is unaffected): {e!r}")
        return state

    def _save_serving_calibration(self, state, inputs, epoch: int) -> None:
        """Calibrate static int8 activation scales for the production
        serving engine on the last training batch and persist them next
        to the epoch checkpoint (``epoch<N>.act_scales.json`` —
        checkpoint.save_act_scales). Measured engine gain on v5e:
        +13.9% pairs/s at MCAN-small B=64, +25.5% at B=1, +16% at
        MCAN-large over the dynamic-quant default (docs/PERFORMANCE.md).
        Costs one jit of the plain-XLA calibration replay at the train
        batch shape."""
        cfg = self.cfg
        from mcan_vqa_tpu.ops import serving as serving_mod
        if self.image_only:
            prepared = serving_mod.prepare_production_classifier_params(
                state.params, cfg.layer, qffn=3)
            if "_mk" not in prepared["backbone"]["enc_0"]:
                self.logger.write(
                    "serving calibration skipped: model dims are outside "
                    "the megakernel VMEM envelope (no int8 quant sites)")
                return
            from mcan_vqa_tpu.ops.quant import (
                calibrate_classifier_act_scales)
            scales = calibrate_classifier_act_scales(
                prepared, inputs[0], cfg.layer, cfg.multi_head)
        else:
            prepared = serving_mod.prepare_production_params(
                state.params, cfg.layer, cfg.multi_head, qffn=3)
            if "_mk" not in prepared["backbone"]["enc_0"]:
                self.logger.write(
                    "serving calibration skipped: model dims are outside "
                    "the megakernel VMEM envelope (no int8 quant sites)")
                return
            from mcan_vqa_tpu.ops.quant import (calibrate_qffn_act_scales,
                                                prepare_q8aux_params)
            img, ques = inputs
            # Two replay passes (ADVICE r4): the enc/dec scales must be
            # calibrated on the path the DEFAULT engine actually runs
            # (bf16 decoder cross-kv) — attaching the aux sites first
            # would put int8 kv into the replay and drift every stored
            # scale for the majority (non-aux) deployments. The second
            # pass attaches the aux sites and contributes ONLY the
            # "aux" tuple, whose a_lang/a_img are then self-consistent
            # with the decoder stream the q8aux engine serves.
            # Predictor(q8aux=True) works with zero ritual on this
            # checkpoint; builds that don't request q8aux ignore "aux".
            scales = calibrate_qffn_act_scales(
                prepared, img, ques, cfg.layer, cfg.multi_head)
            prepared["_q8aux"] = prepare_q8aux_params(prepared, cfg.layer)
            scales["aux"] = calibrate_qffn_act_scales(
                prepared, img, ques, cfg.layer, cfg.multi_head)["aux"]
        path = ckpt_mod.save_act_scales(
            ckpt_mod._ckpt_dir(cfg.ckpts_dir, cfg.version, epoch), scales)
        self.logger.write(f"serving calibration scales -> {path}")

    # ------------------------------------------------------------------
    def _use_fused_train(self) -> bool:
        """Fused train engine: VQA task on a trivial (1-device, 1-process)
        mesh. "auto" additionally requires a TPU backend and the validated
        dimension envelope (hidden<=1024, lane-aligned); "fused" forces it
        (CPU: interpret mode, test-only). r3: the in-kernel-dW kernels
        beat XLA at D=1024 too (2,438 vs 2,253 samples/s) and no longer
        trigger the r2 donate+Pallas worker fault."""
        mode = getattr(self.cfg, "train_engine", "auto")
        if mode == "plain":
            return False
        if dict(self.cfg.mesh_shape).get("model", 1) != 1:
            return False          # fused engine has no TP wiring
        if jax.process_count() != 1:
            return False
        if getattr(self.cfg, "fused_qkv", False):
            # fused_qkv builds a linear_qkv param tree the fused engines'
            # prepare_*_params (which expect linear_q/k/v) cannot split
            return False
        if mode == "fused":
            return True
        # auto: VQA via the fused SGA decoder + SA encoder blocks with
        # in-kernel dW accumulation (35.9 vs 48.9 ms/step at MCAN-small
        # B=256, +36% over XLA autodiff, r3 same-session); classifier via the
        # fused SA blocks over the 60-region image stream — measured on
        # TPU v5e, docs/PERFORMANCE.md
        return (jax.default_backend() == "tpu"
                and self.cfg.hidden_size % 128 == 0
                and self.cfg.hidden_size <= 1024)

    def _use_fused_eval(self) -> bool:
        """Fused-engine eval on a pure-DP mesh (the fused engines have no
        TP wiring): VQA via the megakernel serving engine, classifier via
        the SA-block megakernel twin. "auto" requires a TPU backend and
        one process; "fused" forces it (CPU: kernels in interpret mode,
        test-only). dp>1 runs the engine per data shard under shard_map."""
        mode = getattr(self.cfg, "eval_engine", "auto")
        if mode == "plain":
            return False
        if dict(self.cfg.mesh_shape).get("model", 1) != 1:
            return False
        if getattr(self.cfg, "fused_qkv", False):
            return False          # see _use_fused_train
        if mode == "fused":
            return True
        return (jax.default_backend() == "tpu"
                and jax.process_count() == 1)

    def _process_kwargs(self) -> Dict[str, int]:
        """Multi-host identity for the data loaders: each host assembles only
        its 1/process_count slice of every global batch (generalizes the
        reference's single-process DataParallel split, core/exec.py:62-63)."""
        return {"process_index": jax.process_index(),
                "process_count": jax.process_count()}

    def predict(self, dataset) -> Dict[str, np.ndarray]:
        """Run inference: returns {'probs': [N, A], 'qids': [N]}.

        Multi-host: every host returns the FULL result set (per-batch
        process_allgather of probs/qids/valid), so downstream evaluation is
        identical on 1 or N hosts."""
        cfg = self.cfg
        state = self.ensure_state()
        eval_params = state.params
        if self._use_fused_eval():
            # production eval: route through the fused serving engine
            # (megakernel decoder) — ~1.6x the model.apply path; logits
            # are golden-tested against model.apply. Params are
            # re-prepared per call (on-device concat/cast, cheap) so
            # mid-training evals see the current weights. dp>1: the
            # engine runs per data shard under shard_map (params
            # replicated, batch sharded over "data").
            from mcan_vqa_tpu.ops.serving import (
                build_production_classifier_engine, build_production_engine)
            if self._jit_eval is None:
                on_tpu = jax.default_backend() == "tpu"
                if self.image_only:
                    # classifier: SA-block megakernel twin of the engine
                    serve, _ = build_production_classifier_engine(
                        state.params, cfg.layer, cfg.multi_head,
                        interpret=not on_tpu)
                else:
                    # same construction path as the Predictor/bench
                    # (the prepared tree it returns is discarded: params
                    # are re-prepared per call below so mid-training
                    # evals see the current weights)
                    serve, _ = build_production_engine(
                        state.params, cfg.layer, cfg.multi_head,
                        interpret=not on_tpu)
                # bf16_stream + int8-FFN megakernels (qffn) ship by
                # default — accuracy-gated by tests/test_bf16_stream.py,
                # test_quant.py::TestQffnAccuracy + the full-size oracle
                # bounds (test_full_size_parity.py); bench.py reports
                # this same config. Static calibrated scales (the
                # Predictor's act_calibration) are deliberately NOT
                # offered here: they are compile-time kernel constants,
                # and mid-training weights move — refreshing scales per
                # eval would recompile (minutes on TPU) while frozen
                # scales would drift out of range as training proceeds.
                # Calibration is a deployment-time optimization
                # (Predictor / artifact export / serve --calibrate).
                import jax.numpy as jnp

                def _fused_eval(p, *inputs):
                    return jax.nn.sigmoid(
                        serve(p, *inputs).astype(jnp.float32))

                if self.mesh.devices.size == 1:
                    self._jit_eval = jax.jit(_fused_eval)
                else:
                    from jax import shard_map
                    from jax.sharding import PartitionSpec as P
                    n_in = 1 if self.image_only else 2
                    self._jit_eval = jax.jit(shard_map(
                        _fused_eval, mesh=self.mesh,
                        in_specs=(P(),) + (P("data"),) * n_in,
                        out_specs=P("data"), check_vma=False))
            if self.image_only:
                from mcan_vqa_tpu.ops.serving import (
                    prepare_production_classifier_params)
                eval_params = prepare_production_classifier_params(
                    state.params, cfg.layer)
            else:
                # pruned mode-2 tree (only _mk/_qffn + cross linear_kv
                # per block): halves the transient prepared-tree HBM per
                # eval; same prep the Predictor ships
                from mcan_vqa_tpu.ops.serving import (
                    prepare_production_params)
                eval_params = prepare_production_params(
                    state.params, cfg.layer, cfg.multi_head)
        elif self._jit_eval is None:
            self._jit_eval = shd.jit_eval_step(
                make_eval_step(self.model, image_only=self.image_only),
                self.mesh, jax.device_get(state),
                image_only=self.image_only)
        loader = BatchLoader(
            dataset, cfg.eval_batch_size, shuffle=False, drop_last=False,
            seed=cfg.seed, num_workers=cfg.num_workers, pad_final=True,
            sharding=batch_sharding(self.mesh),
            # fused (bf16-matmul) serving engine: request bf16 features
            # straight from the native batcher — half the host bytes,
            # identical numerics (first op is the bf16 img matmul)
            feat_dtype="bfloat16" if self._use_fused_eval() else None,
            **self._process_kwargs())
        multiprocess = jax.process_count() > 1
        probs_all, qids_all, targets_all = [], [], []
        for batch in loader:
            inputs = (batch["img"],) if self.image_only else \
                (batch["img"], batch["ques"])
            probs = self._jit_eval(eval_params, *inputs)
            target = batch.get("target")
            if multiprocess:
                from jax.experimental import multihost_utils as mhu
                # global row order is [host0 rows, host1 rows, ...] — the
                # same order process_allgather concatenates in
                probs = mhu.process_allgather(probs, tiled=True)
                valid = mhu.process_allgather(
                    np.asarray(batch["valid"]), tiled=True)
                qid = mhu.process_allgather(
                    np.asarray(batch["qid"]), tiled=True)
                if target is not None:
                    target = mhu.process_allgather(target, tiled=True)
            else:
                probs = np.asarray(probs)
                valid = np.asarray(batch["valid"])
                qid = np.asarray(batch["qid"])
            probs_all.append(probs[valid])
            qids_all.append(qid[valid])
            if target is not None:
                targets_all.append(np.asarray(target)[valid])
        out = {"probs": np.concatenate(probs_all),
               "qids": np.concatenate(qids_all)}
        if targets_all:
            out["targets"] = np.concatenate(targets_all)
        return out

    def evaluate(self, dataset, dump_path: Optional[str] = None) -> Dict[str, Any]:
        """ROC-AUC when the dataset carries targets (MIMIC flows,
        reference: core/exec.py:399-408); VQA accuracy when ground-truth
        annotations exist; EvalAI dump when dump_path is given."""
        out = self.predict(dataset)
        results: Dict[str, Any] = {}

        # prediction-vector dump for ensembling (reference test_save_pred,
        # cfgs/base_cfgs.py:57, exec.py eval pred path)
        if self.cfg.test_save_pred:
            os.makedirs(self.cfg.pred_path, exist_ok=True)
            pred_file = os.path.join(
                self.cfg.pred_path, f"pred_run_{self.cfg.version}.npz")
            np.savez_compressed(pred_file, probs=out["probs"],
                                qids=out["qids"])
            results["pred_path"] = pred_file

        answers = None
        if self.ix_to_ans:
            top = out["probs"].argmax(axis=1)
            # answer dicts are str-keyed for VQA (frozen JSON) but int-keyed
            # for MIMIC (pickles) — accept both
            def decode(i):
                i = int(i)
                return self.ix_to_ans.get(str(i),
                                          self.ix_to_ans.get(i, str(i)))
            answers = [decode(i) for i in top]
        if dump_path and answers is not None:
            vqa_eval.dump_results(out["qids"], answers, dump_path)
            results["dump_path"] = dump_path

        if "targets" in out:
            roc = multilabel_roc_auc(out["targets"] > 0.5, out["probs"])
            results["roc_micro"] = roc["micro"]
            results["roc_macro"] = roc["macro"]

        ans_list = getattr(dataset, "ans_list", None)
        if ans_list and answers is not None:
            gts = {a["question_id"]: {
                "answers": [x["answer"] for x in a["answers"]],
                "question_type": a.get("question_type", "unknown"),
                "answer_type": a.get("answer_type", "unknown")}
                for a in ans_list}
            res_map = dict(zip((int(q) for q in out["qids"]), answers))
            common = {q: g for q, g in gts.items() if q in res_map}
            if len(common) != len(gts):
                # The official protocol requires results for every annotated
                # question (evals/vqa_eval.evaluate raises). Silently
                # shrinking the denominator would overstate accuracy.
                msg = (f"evaluate: predictions cover {len(common)}/{len(gts)}"
                       f" annotated questions; accuracy is over the"
                       f" intersection only")
                if getattr(self.cfg, "eval_strict", False):
                    raise ValueError(msg)
                self.logger.write(f"WARNING: {msg}")
            if common:
                acc = vqa_eval.evaluate(common, res_map)
                results["accuracy"] = acc["overall"]
                results["perAnswerType"] = acc["perAnswerType"]
        return results


def _merge_compatible(template: Dict, incoming: Dict, logger=None,
                      path: str = "") -> Dict:
    """Copy incoming params over the template where shapes match; keep the
    template (and log) where they don't (e.g. vocab-size mismatch on
    MIMIC warm-start)."""
    merged = {}
    for k, tv in template.items():
        iv = incoming.get(k)
        if isinstance(tv, dict):
            merged[k] = _merge_compatible(tv, iv or {}, logger, f"{path}/{k}")
        elif iv is not None and np.shape(iv) == np.shape(tv):
            merged[k] = np.asarray(iv)
        else:
            if logger is not None:
                logger.write(f"warm-start skip {path}/{k}: "
                             f"{None if iv is None else np.shape(iv)} vs "
                             f"{np.shape(tv)}")
            merged[k] = tv
    return merged
