"""Standalone repro: TPU worker fault from donate_argnums + Pallas custom-VJP
inside lax.scan at hidden=1024.

Observed in this repo's fused train engine (docs/PERFORMANCE.md, "D=1024
fused-train worker fault"): every Pallas kernel runs clean standalone at
D=1024; the full fwd+bwd+optimizer+lax.scan program runs clean; adding
``donate_argnums`` to the scanned step is what crashes the TPU worker.
D=512 with donation is fine and bit-stable. This file is a self-contained
reduction (no package imports) mirroring that program shape for an upstream
XLA/Mosaic report:

  pallas fwd kernel + pallas bwd kernel (multiple f32 outputs)
  -> jax.custom_vjp -> grads -> param update, scanned over micro-batches
  -> jit(..., donate_argnums=(0,)) -> repeated calls

Usage (on a TPU host):
  python tools/repro_donate_pallas_fault.py                 # D=1024, donate
  python tools/repro_donate_pallas_fault.py --no-donate     # control: clean
  python tools/repro_donate_pallas_fault.py --hidden 512    # control: clean

STATUS (r3, measured on this v5e): this minimal reduction runs CLEAN at
D=1024 with donation — the fault needed more of the original program's
structure (the 10-output attention backward with mixed f32/bf16
emissions). The original trigger was then REMOVED outright: the r3
in-kernel-dW kernels (ops/sga_train.py) have no per-position emission
outputs and run clean donated at D=1024 (docs/PERFORMANCE.md). Kept as
(a) the documented reduction attempt and (b) a regression canary — if a
future toolchain faults on THIS program, that is a new, simpler bug.
"""

from __future__ import annotations

import argparse

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

F32 = jnp.float32
BF16 = jnp.bfloat16


# ---------------------------------------------------------------------------
# Kernels: y = relu(x @ w1) @ w2 over [rows, D] blocks, weights VMEM-resident
# ---------------------------------------------------------------------------

def _fwd_kernel(x_ref, w1_ref, w2_ref, y_ref):
    x = x_ref[0]
    h = jnp.maximum(
        jnp.dot(x.astype(BF16), w1_ref[...].astype(BF16),
                preferred_element_type=F32), 0.0)
    y_ref[0] = jnp.dot(h.astype(BF16), w2_ref[...].astype(BF16),
                       preferred_element_type=F32)


def _bwd_kernel(x_ref, w1_ref, w2_ref, g_ref, dx_ref, h_ref, dh_ref):
    """Recompute h, emit dx plus the f32 (h, dh) pair the weight grads
    need — the multi-output f32 emission pattern of the real bwd kernels."""
    x = x_ref[0]
    h = jnp.maximum(
        jnp.dot(x.astype(BF16), w1_ref[...].astype(BF16),
                preferred_element_type=F32), 0.0)
    g = g_ref[0]
    dh = jnp.dot(g.astype(BF16), w2_ref[...].T.astype(BF16),
                 preferred_element_type=F32) * (h > 0.0)
    dx_ref[0] = jnp.dot(dh.astype(BF16), w1_ref[...].T.astype(BF16),
                        preferred_element_type=F32).astype(x_ref.dtype)
    h_ref[0] = h
    dh_ref[0] = dh


def _block_specs(rows, D, F):
    xspec = pl.BlockSpec((1, rows, D), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM)
    w1 = pl.BlockSpec((D, F), lambda b: (0, 0), memory_space=pltpu.VMEM)
    w2 = pl.BlockSpec((F, D), lambda b: (0, 0), memory_space=pltpu.VMEM)
    return xspec, w1, w2


def make_block(rows: int, D: int, F: int, interpret: bool = False):
    xspec, w1s, w2s = _block_specs(rows, D, F)
    params = pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024)

    @jax.custom_vjp
    def f(x, w1, w2):
        nb = x.shape[0] // rows
        return pl.pallas_call(
            _fwd_kernel,
            grid=(nb,),
            in_specs=[xspec, w1s, w2s],
            out_specs=xspec,
            out_shape=jax.ShapeDtypeStruct((nb, rows, D), F32),
            compiler_params=params,
            interpret=interpret,
        )(x.reshape(nb, rows, D), w1, w2).reshape(x.shape[0], D)

    def f_fwd(x, w1, w2):
        return f(x, w1, w2), (x, w1, w2)

    def f_bwd(res, g):
        x, w1, w2 = res
        nb = x.shape[0] // rows
        dx, h, dh = pl.pallas_call(
            _bwd_kernel,
            grid=(nb,),
            in_specs=[xspec, w1s, w2s, xspec],
            out_specs=(xspec,
                       pl.BlockSpec((1, rows, F), lambda b: (b, 0, 0),
                                    memory_space=pltpu.VMEM),
                       pl.BlockSpec((1, rows, F), lambda b: (b, 0, 0),
                                    memory_space=pltpu.VMEM)),
            out_shape=(jax.ShapeDtypeStruct((nb, rows, D), F32),
                       jax.ShapeDtypeStruct((nb, rows, F), F32),
                       jax.ShapeDtypeStruct((nb, rows, F), F32)),
            compiler_params=params,
            interpret=interpret,
        )(x.reshape(nb, rows, D), w1, w2, g.reshape(nb, rows, D))
        hf = h.reshape(-1, F)
        dhf = dh.reshape(-1, F)
        xf = x.reshape(-1, x.shape[-1])
        dw1 = jnp.einsum("rp,rq->pq", xf.astype(BF16), dhf.astype(BF16),
                         preferred_element_type=F32)
        dw2 = jnp.einsum("rp,rq->pq", hf.astype(BF16),
                         g.reshape(-1, D).astype(BF16),
                         preferred_element_type=F32)
        return dx.reshape(x.shape), dw1, dw2

    f.defvjp(f_fwd, f_bwd)
    return f


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--hidden", type=int, default=1024)
    ap.add_argument("--ff", type=int, default=None,
                    help="FFN width (default 4*hidden)")
    ap.add_argument("--rows", type=int, default=128,
                    help="rows per grid block")
    ap.add_argument("--batch", type=int, default=512)
    ap.add_argument("--micro", type=int, default=2,
                    help="lax.scan micro-batches per step")
    ap.add_argument("--layers", type=int, default=6)
    ap.add_argument("--steps", type=int, default=20)
    ap.add_argument("--no-donate", dest="donate", action="store_false")
    ap.add_argument("--interpret", action="store_true",
                    help="CPU interpret mode (sanity check of the math)")
    args = ap.parse_args()

    if args.interpret:
        # env vars don't reliably force CPU in this container; the config
        # update before first backend use does
        try:
            jax.config.update("jax_platforms", "cpu")
        except Exception:
            pass

    D = args.hidden
    F = args.ff or 4 * D
    print(f"backend={jax.default_backend()} D={D} F={F} "
          f"batch={args.batch} micro={args.micro} layers={args.layers} "
          f"donate={args.donate}")

    block = make_block(args.rows, D, F, interpret=args.interpret)

    rng = np.random.default_rng(0)
    params = [
        (jnp.asarray(rng.normal(0, D ** -0.5, (D, F)), F32),
         jnp.asarray(rng.normal(0, F ** -0.5, (F, D)), F32))
        for _ in range(args.layers)
    ]
    x = jnp.asarray(rng.normal(size=(args.batch, D)), F32)

    def loss_fn(params, xb):
        y = xb
        for (w1, w2) in params:
            y = y + block(y, w1, w2)
        return jnp.sum(y * y) / xb.shape[0]

    grad_fn = jax.value_and_grad(loss_fn)

    def step(params, xb):
        micro = xb.reshape(args.micro, -1, D)

        def body(carry, mb):
            loss_acc, gacc = carry
            loss, g = grad_fn(params, mb)
            return (loss_acc + loss,
                    jax.tree.map(jnp.add, gacc, g)), None

        zero = jax.tree.map(jnp.zeros_like, params)
        (loss, grads), _ = jax.lax.scan(body, (jnp.zeros((), F32), zero),
                                        micro)
        new_params = jax.tree.map(lambda p, g: p - 1e-4 * g,
                                  params, grads)
        return new_params, loss

    jstep = jax.jit(step, donate_argnums=(0,) if args.donate else ())

    for i in range(args.steps):
        params, loss = jstep(params, x)
        jax.block_until_ready(jax.tree.leaves(params)[0])
        print(f"step {i}: loss={float(loss):.5f}", flush=True)
    print("CLEAN: no worker fault at this config")


if __name__ == "__main__":
    main()
