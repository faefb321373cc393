"""Jitted training / evaluation steps.

Loss: BCE-with-logits, sum reduction — numerically superior to the
reference's sigmoid-in-graph + BCELoss(reduction='sum')
(reference: core/model/net.py:373, core/exec.py:67) but produces identical
gradients in exact arithmetic.

Gradient accumulation: the reference slices a host batch into
``grad_accu_steps`` sub-batches, backpropagating each and summing gradients
(core/exec.py:163-208). Here that is a ``lax.scan`` over micro-batches inside
ONE jitted step — the device sees a single fused program, no per-microbatch
dispatch.

Optional L1+L2 regularization matches ExecuteMIMIC: reg is added to every
micro-batch loss (reference: core/exec.py:598-607, 1298-1303).
"""

from __future__ import annotations

from typing import Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import optax

from mcan_vqa_tpu.train.train_state import TrainState


def bce_with_logits_sum(logits: jnp.ndarray, targets: jnp.ndarray) -> jnp.ndarray:
    """Sum-reduced binary cross-entropy on logits.

    Stable form: max(x, 0) - x*z + log1p(exp(-|x|)).
    """
    x = logits.astype(jnp.float32)
    z = targets.astype(jnp.float32)
    per_elem = jnp.maximum(x, 0.0) - x * z + jnp.log1p(jnp.exp(-jnp.abs(x)))
    return jnp.sum(per_elem)


def l1_l2_penalty(params) -> jnp.ndarray:
    """sum(|p|) + sum(p^2) over all parameters
    (reference: core/exec.py:1298-1303)."""
    leaves = jax.tree.leaves(params)
    l1 = sum(jnp.sum(jnp.abs(p)) for p in leaves)
    l2 = sum(jnp.sum(jnp.square(p)) for p in leaves)
    return l1 + l2


def smooth_l1_penalty(params) -> jnp.ndarray:
    """sum over params of mean Huber(p, 0) — the classifier flow's
    regularizer (reference: core/exec.py:849, 922-926; torch SmoothL1Loss
    with default mean reduction against a zero target)."""
    def huber_mean(p):
        a = jnp.abs(p)
        return jnp.mean(jnp.where(a < 1.0, 0.5 * p * p, a - 0.5))
    return sum(huber_mean(p) for p in jax.tree.leaves(params))


def make_train_step(
    model,
    tx: optax.GradientTransformation,
    grad_accu_steps: int = 1,
    reg_factor: float = 0.0,
    lr_schedule: Optional[Callable] = None,
    image_only: bool = False,
    reg_mode: str = "l1l2",
    forward_fn: Optional[Callable] = None,
    data_axis: Optional[str] = None,
    per_param_norms: bool = False,
    grad_norm_clip: float = 0.0,
) -> Callable[[TrainState, Dict[str, jnp.ndarray]], Tuple[TrainState, Dict[str, jnp.ndarray]]]:
    """Build the pure train step: (state, batch) -> (state, metrics).

    batch = {"img": [B, R, F] f32, "ques": [B, T] i32, "target": [B, A] f32}
    with B = grad_accu_steps * sub_batch_size. image_only drops "ques"
    (ClassifierNet flow); reg_mode selects the penalty: "l1l2" (MIMIC VQA,
    core/exec.py:598-607) or "smooth_l1" (classifier, core/exec.py:922-926).
    forward_fn: optional training-forward override,
    (params, img, ques, rng) -> logits — the Trainer passes the fused
    custom-VJP engine (train/fused_engine.py) here on single-TPU runs;
    grad accumulation / reg / optimizer wiring is identical either way.
    data_axis: set when the step runs INSIDE shard_map over that mesh
    axis (the fused-engine dp>1 path): the step then sees only its local
    batch shard, folds the axis index into the dropout rng, and psums
    loss+grads before the (replicated) optimizer update.
    grad_norm_clip: the clip threshold the OPTIMIZER chain applies (the
    clipping itself lives in tx); passed here only so the per-param
    grad-norm bookkeeping can report post-clip norms like the reference.
    """
    penalty = {"l1l2": l1_l2_penalty, "smooth_l1": smooth_l1_penalty}[reg_mode]

    def loss_fn(params, inputs, target, rng):
        if forward_fn is not None:
            logits = forward_fn(params, *inputs, rng)
        else:
            out = model.apply({"params": params}, *inputs,
                              deterministic=False, rngs={"dropout": rng})
            logits = out["logits"]
        loss = bce_with_logits_sum(logits, target)
        if reg_factor > 0.0:
            pen = reg_factor * penalty(params)
            if data_axis is not None:
                # Under shard_map every shard holds the full (replicated)
                # params, so an unscaled per-shard penalty would be
                # multiplied by the shard count at the loss/grad psum
                # below. Divide by the axis size so the summed penalty
                # matches the plain jit path exactly.
                pen = pen / jax.lax.psum(1.0, data_axis)
            loss = loss + pen
        return loss

    grad_fn = jax.value_and_grad(loss_fn)

    def batch_inputs(batch):
        return (batch["img"],) if image_only else (batch["img"], batch["ques"])

    def train_step(state: TrainState, batch: Dict[str, jnp.ndarray]):
        step_rng = jax.random.fold_in(state.dropout_rng, state.step)
        if data_axis is not None:
            # distinct dropout masks per data shard
            step_rng = jax.random.fold_in(
                step_rng, jax.lax.axis_index(data_axis))

        if grad_accu_steps == 1:
            loss, grads = grad_fn(state.params, batch_inputs(batch),
                                  batch["target"], step_rng)
        else:
            def reshape(x):
                return x.reshape((grad_accu_steps, -1) + x.shape[1:])

            micro = jax.tree.map(reshape, batch)
            rngs = jax.random.split(step_rng, grad_accu_steps)

            def body(carry, xs):
                loss_acc, grads_acc = carry
                mb, rng = xs
                loss, grads = grad_fn(state.params, batch_inputs(mb),
                                      mb["target"], rng)
                return (loss_acc + loss,
                        jax.tree.map(jnp.add, grads_acc, grads)), None

            zero_grads = jax.tree.map(jnp.zeros_like, state.params)
            (loss, grads), _ = jax.lax.scan(
                body, (jnp.zeros((), jnp.float32), zero_grads), (micro, rngs))

        if data_axis is not None:
            # global loss/grads; the optimizer update below is then
            # identical (replicated) on every shard
            loss = jax.lax.psum(loss, data_axis)
            grads = jax.lax.psum(grads, data_axis)

        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)

        gnorm = optax.global_norm(grads)
        metrics = {
            "loss": loss,
            "grad_norm": gnorm,
        }
        if per_param_norms:
            # per-leaf L2 norms, matched to the reference's bookkeeping
            # (core/exec.py:199-202): the reference records norms AFTER
            # clip_grad_norm_ rescaled the grads in place and multiplies
            # each by grad_accu_steps — apply the same clip scale (from
            # the already-computed global norm) and accu factor so the
            # logged numbers agree with a reference run
            clip_scale = jnp.float32(1.0)
            if grad_norm_clip > 0:
                clip_scale = jnp.minimum(
                    1.0, grad_norm_clip / jnp.maximum(gnorm, 1e-12))
            norm_scale = clip_scale * grad_accu_steps
            metrics["param_grad_norms"] = jax.tree.map(
                lambda g: jnp.linalg.norm(g.astype(jnp.float32))
                * norm_scale, grads)
        if lr_schedule is not None:
            metrics["lr"] = lr_schedule(state.step)

        new_state = state.replace(
            params=params, opt_state=opt_state, step=state.step + 1)
        return new_state, metrics

    return train_step


def make_eval_step(model, image_only: bool = False) -> Callable:
    """(params, img[, ques]) -> sigmoid probabilities [B, A]
    (the boundary where the reference's in-graph sigmoid lives,
    reference: core/model/net.py:373)."""

    if image_only:
        def eval_step(params, img):
            out = model.apply({"params": params}, img, deterministic=True)
            return jax.nn.sigmoid(out["logits"].astype(jnp.float32))
    else:
        def eval_step(params, img, ques):
            out = model.apply({"params": params}, img, ques,
                              deterministic=True)
            return jax.nn.sigmoid(out["logits"].astype(jnp.float32))

    return eval_step
