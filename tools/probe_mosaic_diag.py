"""Probe which block-diagonal constructs the real Mosaic TPU compiler
accepts (CPU interpret mode accepts everything, so on-chip compile is the
only oracle). Each probe AOT-compiles one tiny Pallas kernel; prints
PASS/FAIL per construct.

Findings drive ops/diag_attn.py + ops/sga_train.py — see the module
docstrings there."""

import functools
import sys

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

G, L, D = 4, 100, 64
M = G * L


def probe(name, kernel, out_shape):
    try:
        fn = pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct(out_shape, jnp.float32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )
        jax.jit(fn).lower(
            jax.ShapeDtypeStruct((M, D), jnp.float32),
            jax.ShapeDtypeStruct((1, M), jnp.float32),
        ).compile()
        print(f"PASS {name}", flush=True)
        return True
    except Exception as e:  # noqa: BLE001
        msg = str(e).split("\n")[0][:160]
        print(f"FAIL {name}: {msg}", flush=True)
        return False


def k_sublane_slice(x_ref, pad_ref, o_ref):
    # unaligned SUBLANE slices (offset g*L, L=100 not mult of 8) + matmul
    parts = []
    for g in range(G):
        a = x_ref[g * L:(g + 1) * L, :]
        parts.append(jax.lax.dot_general(
            a, a, dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)[:, :D])
    o_ref[...] = jnp.concatenate(parts, axis=0)


def k_lane_slice_bcast(x_ref, pad_ref, o_ref):
    # unaligned LANE slice of [1, M] + broadcast (the known failure)
    pad = pad_ref[...]
    o_ref[...] = jnp.concatenate(
        [jnp.broadcast_to(pad[:, g * L:(g + 1) * L], (L, L))
         for g in range(G)], axis=0)[:, :D]


def k_onehot_gather(x_ref, pad_ref, o_ref):
    # iota one-hot selection matmul: [1, M] @ [M, L] -> [1, L], offset-0
    pad = pad_ref[...]
    k = jax.lax.broadcasted_iota(jnp.int32, (M, L), 0)
    j = jax.lax.broadcasted_iota(jnp.int32, (M, L), 1)
    rows = []
    for g in range(G):
        sel = (k == j + g * L).astype(jnp.float32)
        pg = jax.lax.dot_general(pad, sel, (((1,), (0,)), ((), ())),
                                 preferred_element_type=jnp.float32)
        rows.append(jnp.broadcast_to(pg, (L, L)))
    o_ref[...] = jnp.concatenate(rows, axis=0)[:, :D]


def k_lane_concat(x_ref, pad_ref, o_ref):
    # lane-dim concat at unaligned boundaries (scatter_diag shape)
    rows = []
    for g in range(G):
        parts = []
        if g:
            parts.append(jnp.zeros((L, g * L), jnp.float32))
        parts.append(x_ref[:L, :L] * 1.0)
        if G - 1 - g:
            parts.append(jnp.zeros((L, (G - 1 - g) * L), jnp.float32))
        rows.append(jnp.concatenate(parts, axis=1))
    o_ref[...] = jnp.concatenate(rows, axis=0)[:, :D]


def k_reshape_3d(x_ref, pad_ref, o_ref):
    # [G*L, D] -> [G, L, D] split of the sublane dim (L not mult of 8)
    x3 = x_ref[...].reshape(G, L, D)
    o_ref[...] = jnp.concatenate([x3[g] for g in range(G)], axis=0)


if __name__ == "__main__":
    dev = jax.devices()[0]
    print(f"device: {dev}", flush=True)
    ok = True
    ok &= probe("sublane_slice_matmul", k_sublane_slice, (M, D))
    ok &= probe("lane_slice_broadcast", k_lane_slice_bcast, (M, D))
    ok &= probe("onehot_gather_matmul", k_onehot_gather, (M, D))
    ok &= probe("lane_concat_unaligned", k_lane_concat, (M, D))
    ok &= probe("reshape_split_sublane", k_reshape_3d, (M, D))
    sys.exit(0 if ok else 1)
