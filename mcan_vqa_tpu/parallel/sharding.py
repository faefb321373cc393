"""Parameter sharding rules (tensor parallelism) and sharded train-step wiring.

Megatron-style TP over the "model" axis, expressed as PartitionSpecs on the
parameter pytree; activations stay replicated-by-batch-shard and XLA's SPMD
partitioner inserts the psum after every row-parallel matmul:

  MHAtt   linear_{q,k,v}: column-parallel  [D, D]   -> P(None, "model")
          linear_merge:   row-parallel     [D, D]   -> P("model", None)
  FFN     up  (FCLayer Dense): column-parallel [D, 4D] -> P(None, "model")
          down (Dense):        row-parallel    [4D, D] -> P("model", None)

Column-parallel biases shard with their outputs; row-parallel biases are
replicated (added after the psum). Everything else (embedding, LSTM, AttFlat,
heads, norms) is small and replicated.

Head-count divisibility: multi_head=8 and head-grouped columns mean "model"
sizes of 1/2/4/8 split heads evenly; Dense columns are contiguous head
blocks, so a column shard holds whole heads.
"""

from __future__ import annotations

from typing import Any, Dict, Tuple

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from mcan_vqa_tpu.parallel.mesh import (DATA_AXIS, MODEL_AXIS,
                                        batch_sharding, replicated)


def param_pspec(path: Tuple[str, ...]) -> P:
    """PartitionSpec for one parameter, keyed by its pytree path."""
    names = [getattr(p, "key", getattr(p, "name", str(p))) for p in path]
    leaf = names[-1]
    joined = "/".join(names)

    # fused-projection kernels (linear_qkv [D,3D] / linear_kv [D,2D])
    # are REPLICATED, not column-sharded: P(None, "model") would split
    # the concatenated q|k|v blocks across shard boundaries (tp=2 puts
    # all of q plus half of k on shard 0), so the jnp.split in MHAtt
    # forces a cross-shard reshuffle every layer — SPMD keeps it
    # correct but the layout defeats the zero-communication Megatron
    # pattern this module promises. The fused layout is a single-chip
    # fast path; TP deployments use the standard per-projection layout
    # (checkpoint.unfuse_qkv_params converts).
    col_parallel = (
        "linear_q" in names or "linear_k" in names or "linear_v" in names
        or ("ffn" in names and "FCLayer_0" in names)
    )
    if "linear_qkv" in names or "linear_kv" in names:
        return P()
    row_parallel = (
        "linear_merge" in names and ("mhatt" in joined)
        or ("ffn" in names and "FCLayer_0" not in names and "Dense_0" in names)
    )

    if col_parallel:
        if leaf == "kernel":
            return P(None, MODEL_AXIS)
        if leaf == "bias":
            return P(MODEL_AXIS)
    if row_parallel:
        if leaf == "kernel":
            return P(MODEL_AXIS, None)
        if leaf == "bias":
            return P()
    return P()  # replicated


def make_param_shardings(mesh: Mesh, params: Any):
    """Pytree of NamedShardings matching ``params``."""
    return jax.tree_util.tree_map_with_path(
        lambda path, _: NamedSharding(mesh, param_pspec(path)), params)


def make_state_shardings(mesh: Mesh, state):
    """Shardings for a full TrainState: params + optimizer moments follow the
    param rule; scalars/rng replicated."""
    param_sh = make_param_shardings(mesh, state.params)

    def opt_leaf(path, leaf):
        # adamw state: mu/nu mirror the param tree under their own prefix.
        if hasattr(leaf, "ndim") and leaf.ndim >= 1:
            return NamedSharding(mesh, param_pspec(path))
        return NamedSharding(mesh, P())

    opt_sh = jax.tree_util.tree_map_with_path(opt_leaf, state.opt_state)
    rep = NamedSharding(mesh, P())
    return state.replace(params=param_sh, opt_state=opt_sh,
                         step=rep, dropout_rng=rep)


def shard_state(mesh: Mesh, state):
    """Place a host TrainState onto the mesh with TP shardings."""
    return jax.device_put(state, make_state_shardings(mesh, state))


def shard_batch(mesh: Mesh, batch: Dict[str, Any]) -> Dict[str, Any]:
    """Batch-shard host arrays over the data axis."""
    sh = batch_sharding(mesh)
    return {k: jax.device_put(v, sh) for k, v in batch.items()}


def jit_train_step(train_step, mesh: Mesh, state, donate: bool = True):
    """jit the train step with explicit state/batch shardings; XLA inserts
    the gradient all-reduce (data axis) and TP collectives (model axis)."""
    state_sh = make_state_shardings(mesh, state)
    return jax.jit(
        train_step,
        in_shardings=(state_sh, batch_sharding(mesh)),
        out_shardings=(state_sh, replicated(mesh)),
        donate_argnums=(0,) if donate else (),
    )


def shardmap_train_step(train_step, mesh: Mesh, donate: bool = True):
    """shard_map the train step over the data axis (pure-DP meshes only).

    Used for the fused-Pallas train engine: XLA's SPMD partitioner cannot
    split a pallas_call by itself, so the step runs per shard — the step
    must be built with ``make_train_step(..., data_axis=DATA_AXIS)`` so it
    psums loss/grads before the (replicated) optimizer update. State in/out
    is replicated; the batch is sharded on dim 0.
    """
    from jax import shard_map

    smapped = shard_map(
        train_step, mesh=mesh,
        in_specs=(P(), P(DATA_AXIS)),
        out_specs=(P(), P()),
        check_vma=False)
    return jax.jit(smapped, donate_argnums=(0,) if donate else ())


def jit_eval_step(eval_step, mesh: Mesh, state, image_only: bool = False):
    param_sh = make_param_shardings(mesh, state.params)
    data_sh = batch_sharding(mesh)
    n_inputs = 1 if image_only else 2
    return jax.jit(
        eval_step,
        in_shardings=(param_sh,) + (data_sh,) * n_inputs,
        out_shardings=data_sh,
    )
