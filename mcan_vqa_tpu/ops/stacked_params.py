"""Stacked-native parameter layout for the fused train engine.

The fused train kernels consume per-block dicts with pre-fused qkv
weights (ops/sga_train.prepare_sga_train_params). When the TrainState
holds the standard flax tree, that relayout runs INSIDE the
differentiated step — every step pays the qkv concats forward and the
matching splits backward — and the optimizer runs one elementwise
kernel per leaf (~260 leaves ≈ 2.3 ms at MCAN-small B=256,
docs/PERFORMANCE.md r4).

Here the params LIVE in the fused layout for the duration of training:
one [L, ...] stack per weight role (wqkv, merge, FFN, LN, cross-kv), ~54
leaves total, with the per-block view a free slice. The standard tree
exists only at the boundaries — checkpoint save/restore, eval, torch
interop — via ``from_stacked`` (so the on-disk format and every parity
test is unchanged). AdamW is elementwise, so running it over the stacked
leaves is arithmetically identical to the per-leaf run (same schedule,
same decay); ``convert_opt_state`` relayouts the mu/nu moments so
save/resume round-trips through the standard format bitwise.

Reference hot loop this accelerates: /root/reference/core/exec.py:155-208
(the torch step has no analogue relayout — param layout is a TPU/XLA
optimization axis torch never exposes).
"""

from __future__ import annotations

from typing import Any, Dict

import jax
import jax.numpy as jnp

# per-block key -> path inside the standard block tree
_ENC_PATHS = {
    "wm": ("mhatt", "linear_merge", "kernel"),
    "bm": ("mhatt", "linear_merge", "bias"),
    "ln1_s": ("norm1", "scale"), "ln1_b": ("norm1", "bias"),
    "w1": ("ffn", "mlp", "FCLayer_0", "Dense_0", "kernel"),
    "b1": ("ffn", "mlp", "FCLayer_0", "Dense_0", "bias"),
    "w2": ("ffn", "mlp", "Dense_0", "kernel"),
    "b2": ("ffn", "mlp", "Dense_0", "bias"),
    "ln2_s": ("norm2", "scale"), "ln2_b": ("norm2", "bias"),
}
_DEC_PATHS = {
    "wm1": ("mhatt1", "linear_merge", "kernel"),
    "bm1": ("mhatt1", "linear_merge", "bias"),
    "ln1_s": ("norm1", "scale"), "ln1_b": ("norm1", "bias"),
    "wq2": ("mhatt2", "linear_q", "kernel"),
    "bq2": ("mhatt2", "linear_q", "bias"),
    "wk2": ("mhatt2", "linear_k", "kernel"),
    "bk2": ("mhatt2", "linear_k", "bias"),
    "wv2": ("mhatt2", "linear_v", "kernel"),
    "bv2": ("mhatt2", "linear_v", "bias"),
    "wm2": ("mhatt2", "linear_merge", "kernel"),
    "bm2": ("mhatt2", "linear_merge", "bias"),
    "ln2_s": ("norm2", "scale"), "ln2_b": ("norm2", "bias"),
    "w1": ("ffn", "mlp", "FCLayer_0", "Dense_0", "kernel"),
    "b1": ("ffn", "mlp", "FCLayer_0", "Dense_0", "bias"),
    "w2": ("ffn", "mlp", "Dense_0", "kernel"),
    "b2": ("ffn", "mlp", "Dense_0", "bias"),
    "ln3_s": ("norm3", "scale"), "ln3_b": ("norm3", "bias"),
}
STACKED_KEY = "backbone_stacked"


def _get(tree, path):
    for k in path:
        tree = tree[k]
    return tree


def _qkv_owner(prefix: str) -> str:
    return "mhatt1" if prefix == "dec" else "mhatt"


def _stack_blocks(bb: Dict[str, Any], prefix: str, num_layers: int,
                  paths: Dict[str, tuple]) -> Dict[str, jnp.ndarray]:
    out = {}
    for key, path in paths.items():
        out[key] = jnp.stack([_get(bb[f"{prefix}_{i}"], path)
                              for i in range(num_layers)])
    att = _qkv_owner(prefix)
    out["wqkv"] = jnp.stack([
        jnp.concatenate([bb[f"{prefix}_{i}"][att][f"linear_{c}"]["kernel"]
                         for c in "qkv"], axis=1)
        for i in range(num_layers)])
    out["bqkv"] = jnp.stack([
        jnp.concatenate([bb[f"{prefix}_{i}"][att][f"linear_{c}"]["bias"]
                         for c in "qkv"])
        for i in range(num_layers)])
    return out


def to_stacked(params: Dict[str, Any], num_layers: int) -> Dict[str, Any]:
    """Standard MCANet tree -> stacked train layout. Non-backbone leaves
    (embedding, LSTM, AttFlats, head) pass through under their standard
    keys, so forward code addressing them is unchanged."""
    out = {k: v for k, v in params.items() if k != "backbone"}
    bb = params["backbone"]
    stacked = {}
    if "enc_0" in bb:
        stacked["enc"] = _stack_blocks(bb, "enc", num_layers, _ENC_PATHS)
    if "dec_0" in bb:
        stacked["dec"] = _stack_blocks(bb, "dec", num_layers, _DEC_PATHS)
    out[STACKED_KEY] = stacked
    return out


def _set(tree, path, value):
    for k in path[:-1]:
        tree = tree.setdefault(k, {})
    tree[path[-1]] = value


def _unstack_block(stacks: Dict[str, jnp.ndarray], prefix: str, i: int,
                   paths: Dict[str, tuple]) -> Dict[str, Any]:
    D = stacks["wqkv"].shape[1]
    att = _qkv_owner(prefix)
    blk: Dict[str, Any] = {}
    for key, path in paths.items():
        _set(blk, path, stacks[key][i])
    for j, c in enumerate("qkv"):
        _set(blk, (att, f"linear_{c}", "kernel"),
             stacks["wqkv"][i, :, j * D:(j + 1) * D])
        _set(blk, (att, f"linear_{c}", "bias"),
             stacks["bqkv"][i, j * D:(j + 1) * D])
    return blk


def _unstack_blocks(stacks: Dict[str, jnp.ndarray], prefix: str,
                    paths: Dict[str, tuple]) -> Dict[str, Any]:
    num_layers = int(stacks["wqkv"].shape[0])
    return {f"{prefix}_{i}": _unstack_block(stacks, prefix, i, paths)
            for i in range(num_layers)}


def enc_block_std(stacks: Dict[str, jnp.ndarray], i: int) -> Dict[str, Any]:
    """Per-layer view in the STANDARD block tree (for the XLA encoder
    path) — every leaf is a slice of a stack."""
    return _unstack_block(stacks, "enc", i, _ENC_PATHS)


def from_stacked(params: Dict[str, Any]) -> Dict[str, Any]:
    """Stacked train layout -> standard MCANet tree (checkpoint/eval
    boundary). Exact inverse of ``to_stacked`` — round-trips bitwise."""
    out = {k: v for k, v in params.items() if k != STACKED_KEY}
    bb: Dict[str, Any] = {}
    stacked = params[STACKED_KEY]
    if "enc" in stacked:
        bb.update(_unstack_blocks(stacked["enc"], "enc", _ENC_PATHS))
    if "dec" in stacked:
        bb.update(_unstack_blocks(stacked["dec"], "dec", _DEC_PATHS))
    out["backbone"] = bb
    return out


def is_stacked(params: Dict[str, Any]) -> bool:
    return STACKED_KEY in params


def enc_block(stacks: Dict[str, jnp.ndarray], i: int) -> Dict[str, Any]:
    """Per-layer view in the prepare_sa_train_params key layout — a free
    slice of each stack (no concat, no copy)."""
    return {k: v[i] for k, v in stacks.items()}


def dec_block(stacks: Dict[str, jnp.ndarray], i: int) -> Dict[str, Any]:
    """Per-layer view in the prepare_sga_train_params key layout (the
    cross-kv weights ride along as wk2/bk2/wv2/bv2)."""
    return {k: v[i] for k, v in stacks.items()}


def convert_opt_state(opt_state, convert):
    """Apply a params-tree conversion to every AdamW moment tree inside
    an optax state (handles optax.chain nesting). ``convert`` is
    to_stacked(partial) or from_stacked."""
    import optax

    def go(s):
        if isinstance(s, optax.ScaleByAdamState):
            return s._replace(mu=convert(s.mu), nu=convert(s.nu))
        if isinstance(s, tuple) and type(s) is not tuple:  # NamedTuple
            return s
        if isinstance(s, tuple):
            return tuple(go(x) for x in s)
        return s

    return go(opt_state)


def to_stacked_state(state, num_layers: int):
    """TrainState (standard tree) -> TrainState (stacked layout), moments
    included."""
    return state.replace(
        params=to_stacked(state.params, num_layers),
        opt_state=convert_opt_state(
            state.opt_state, lambda p: to_stacked(p, num_layers)))


def from_stacked_state(state):
    """Inverse of ``to_stacked_state`` (checkpoint/eval boundary).
    Identity on a state already in the standard layout."""
    if not is_stacked(state.params):
        return state
    return state.replace(
        params=from_stacked(state.params),
        opt_state=convert_opt_state(state.opt_state, from_stacked))
