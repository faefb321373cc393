"""Optimizer and LR schedule via optax, matching the reference arithmetic.

Reference semantics (core/model/optim.py:11-71, core/exec.py:143-147):
  * AdamW(weight_decay=1e-4) with torch-default betas (0.9, 0.999), eps 1e-8
    (the reference config's opt_betas/opt_eps are dead — commented out at
    optim.py:61-62 — so torch defaults are what actually trained the zoo).
    Here cfg.opt_betas/opt_eps are LIVE knobs defaulting to those values.
  * Step-function warmup in *optimizer steps*: lr = lr_base * 0.25 / 0.5 /
    0.75 while step <= int(data_size/batch_size) * {1,2,3}, then lr_base.
  * lr_base itself decays by `lr_decay_rate` at the START of each epoch in
    `lr_decay_list` (epochs counted from 0).

Here the whole thing is one pure schedule(step) function — resumable from a
step count alone, jit-friendly, no mutable optimizer wrapper.
"""

from __future__ import annotations

from typing import Sequence

import jax.numpy as jnp
import optax


def steps_per_epoch(data_size: int, batch_size: int) -> int:
    """Optimizer steps per epoch; drop_last semantics
    (reference: core/data/load_data.py:278, optim.py:40-44)."""
    return data_size // batch_size


def make_lr_schedule(
    lr_base: float,
    data_size: int,
    batch_size: int,
    decay_epochs: Sequence[int] = (8, 12),
    decay_rate: float = 0.2,
):
    """Pure schedule: optax count (0-based) -> lr.

    The reference increments its step counter *before* computing the rate
    (optim.py:21-24), so optax count c corresponds to reference step c+1.
    """
    spe = steps_per_epoch(data_size, batch_size)
    # data_size < batch_size (tiny smoke/debug sets with a pad_final
    # loader) would make spe 0 and the epoch floor-divide below divide
    # by zero INSIDE jit — undefined on XLA, so the lr would silently be
    # garbage rather than raise. Clamp: such a run has one step/epoch.
    spe = max(spe, 1)
    # Warmup thresholds are int(data_size/batch_size * k) — NOT k*spe; the
    # two differ when data_size % batch_size != 0 (optim.py:40-44).
    t1, t2, t3 = (int(data_size / batch_size * k) for k in (1, 2, 3))
    decay_at = jnp.asarray(list(decay_epochs), jnp.int32)

    def schedule(count):
        step = count + 1
        warm = jnp.where(
            step <= t1, 0.25,
            jnp.where(step <= t2, 0.5,
                      jnp.where(step <= t3, 0.75, 1.0)))
        # epoch(step): decay applies from the first step of the decay epoch.
        # Steps 1..spe are epoch 0, so epoch = (step - 1) // spe.
        epoch = (step - 1) // spe
        n_decays = jnp.sum(epoch >= decay_at)
        return lr_base * warm * (decay_rate ** n_decays)

    return schedule


def make_optimizer(
    cfg,
    data_size: int,
    lr_base: float | None = None,
) -> optax.GradientTransformation:
    """AdamW + warmup/decay schedule (+ optional global-norm clip,
    reference: core/exec.py:192-196)."""
    schedule = make_lr_schedule(
        lr_base if lr_base is not None else cfg.lr_base,
        data_size, cfg.batch_size,
        decay_epochs=tuple(cfg.lr_decay_list),
        decay_rate=cfg.lr_decay_rate,
    )
    b1, b2 = getattr(cfg, "opt_betas", (0.9, 0.999))
    mu_dtype = getattr(cfg, "opt_mu_dtype", "") or None
    tx = optax.adamw(
        learning_rate=schedule,
        b1=float(b1), b2=float(b2),
        eps=float(getattr(cfg, "opt_eps", 1e-8)),
        weight_decay=cfg.weight_decay,
        mu_dtype=mu_dtype,
    )
    if cfg.grad_norm_clip > 0:
        tx = optax.chain(optax.clip_by_global_norm(cfg.grad_norm_clip), tx)
    return tx
