"""Checkpointing: orbax-native save/restore plus reference-pickle interop.

Native format: orbax directory per epoch under ``ckpts/ckpt_<version>/epoch<N>``
holding ``{params, opt_state, step}`` — resume restores the exact optimizer
state, and the LR schedule is a pure function of ``step`` so no ``lr_base``
needs to be carried (the reference persists lr_base because its decay mutates
the optimizer in place; reference: core/exec.py:241-253, 70-94).

Interop: the reference zoo ships torch pickles of
``{'state_dict': ..., 'optimizer': ..., 'lr_base': float}``. ``import_torch``
name-maps a reference state_dict into our param pytree (transposing Linear
kernels, splitting LSTM gates' layout, renaming LayerNorm a_2/b_2) so the
published epoch13 checkpoints run on TPU unchanged; ``export_torch`` goes the
other way so our training runs can be consumed by the reference code.
"""

from __future__ import annotations

import os
import re
from typing import Any, Dict, Optional, Tuple

import jax
import numpy as np


# ---------------------------------------------------------------------------
# Orbax-native checkpoints
# ---------------------------------------------------------------------------

def _ckpt_dir(ckpts_dir: str, version: str, epoch: int) -> str:
    return os.path.abspath(
        os.path.join(ckpts_dir, f"ckpt_{version}", f"epoch{epoch}"))


def save_checkpoint(state, ckpts_dir: str, version: str, epoch: int) -> str:
    """Save {params, opt_state, step} (reference path scheme:
    ckpts/ckpt_<version>/epoch<N>, core/exec.py:247-251)."""
    import orbax.checkpoint as ocp

    path = _ckpt_dir(ckpts_dir, version, epoch)
    payload = {
        "params": jax.device_get(state.params),
        "opt_state": jax.device_get(state.opt_state),
        "step": int(state.step),
    }
    with ocp.PyTreeCheckpointer() as ckptr:
        ckptr.save(path, payload, force=True)
    return path


def restore_checkpoint(ckpts_dir: str, version: str, epoch: int,
                       template: Optional[Any] = None) -> Dict[str, Any]:
    return restore_checkpoint_path(_ckpt_dir(ckpts_dir, version, epoch),
                                   template)


def restore_checkpoint_path(path: str,
                            template: Optional[Any] = None) -> Dict[str, Any]:
    """Restore an explicit orbax checkpoint directory (e.g. a --ckpt_path)."""
    import orbax.checkpoint as ocp

    with ocp.PyTreeCheckpointer() as ckptr:
        if template is not None:
            return ckptr.restore(os.path.abspath(path), item=template)
        return ckptr.restore(os.path.abspath(path))


def latest_epoch(ckpts_dir: str, version: str) -> Optional[int]:
    d = os.path.join(ckpts_dir, f"ckpt_{version}")
    if not os.path.isdir(d):
        return None
    epochs = [int(m.group(1)) for n in os.listdir(d)
              if (m := re.fullmatch(r"epoch(\d+)", n))]
    return max(epochs) if epochs else None


def prune_checkpoints(ckpts_dir: str, version: str, keep_last: int) -> int:
    """Keep only the newest ``keep_last`` epoch checkpoints; returns #removed.

    Per-epoch saving (restored upstream behavior) would otherwise accumulate
    13 full optimizer states per run.
    """
    import shutil

    d = os.path.join(ckpts_dir, f"ckpt_{version}")
    if keep_last <= 0 or not os.path.isdir(d):
        return 0
    epochs = sorted(int(m.group(1)) for n in os.listdir(d)
                    if (m := re.fullmatch(r"epoch(\d+)", n)))
    removed = 0
    for e in epochs[:-keep_last]:
        shutil.rmtree(os.path.join(d, f"epoch{e}"), ignore_errors=True)
        removed += 1
    return removed


# ---------------------------------------------------------------------------
# Reference torch-pickle interop
# ---------------------------------------------------------------------------

def _strip_module_prefix(state_dict: Dict[str, Any]) -> Dict[str, Any]:
    """DataParallel wraps params under 'module.' (reference: core/exec.py:62-63)."""
    return {k.removeprefix("module."): v for k, v in state_dict.items()}


def _to_np(t) -> np.ndarray:
    # np.array (copy!) — torch .numpy() returns a VIEW of the live tensor;
    # without the copy, later in-place optimizer updates on the torch side
    # would silently mutate the imported params.
    return np.array(t.detach().cpu().numpy() if hasattr(t, "detach") else t,
                    np.float32)


def torch_key_to_flax(key: str) -> Tuple[Tuple[str, ...], bool]:
    """Map a reference state_dict key to (flax param path, needs_transpose).

    Reference module tree: core/model/net.py:295-381, mca.py:18-207,
    net_utils.py:11-60. Our tree: mcan_vqa_tpu/models/*.
    """
    parts = key.split(".")
    # enc_list.3 / dec_list.3 -> enc_3 / dec_3
    out = []
    i = 0
    while i < len(parts):
        p = parts[i]
        if p in ("enc_list", "dec_list") and i + 1 < len(parts):
            out.append(("enc_" if p == "enc_list" else "dec_") + parts[i + 1])
            i += 2
            continue
        out.append(p)
        i += 1
    parts = out

    leaf = parts[-1]
    path = parts[:-1]

    # torch MLP: fc.linear -> FCLayer_0/Dense_0 ; linear -> Dense_0
    norm = []
    j = 0
    while j < len(path):
        if path[j] == "fc" and j + 1 < len(path) and path[j + 1] == "linear":
            norm += ["FCLayer_0", "Dense_0"]
            j += 2
        elif path[j] == "linear" and norm and norm[-1] == "mlp":
            norm.append("Dense_0")
            j += 1
        else:
            norm.append(path[j])
            j += 1
    path = norm

    if leaf == "weight":
        if path and path[-1] == "embedding":
            return tuple(path) + ("embedding",), False
        return tuple(path) + ("kernel",), True   # torch [out,in] -> flax [in,out]
    if leaf == "bias":
        return tuple(path) + ("bias",), False
    if leaf == "a_2":
        return tuple(path) + ("scale",), False
    if leaf == "b_2":
        return tuple(path) + ("bias",), False
    # LSTM params
    if leaf in ("weight_ih_l0", "weight_hh_l0", "bias_ih_l0", "bias_hh_l0"):
        name = {"weight_ih_l0": "w_ih", "weight_hh_l0": "w_hh",
                "bias_ih_l0": "b_ih", "bias_hh_l0": "b_hh"}[leaf]
        return tuple(path) + (name,), leaf.startswith("weight")
    raise KeyError(f"unrecognized reference param: {key}")


def import_torch_state_dict(state_dict: Dict[str, Any]) -> Dict[str, Any]:
    """Reference state_dict -> nested flax params dict (gate order i,f,g,o is
    identical between torch LSTM and our LSTMEncoder, so only a transpose)."""
    state_dict = _strip_module_prefix(state_dict)
    params: Dict[str, Any] = {}
    for key, val in state_dict.items():
        path, transpose = torch_key_to_flax(key)
        arr = _to_np(val)
        if transpose:
            arr = arr.T
        node = params
        for p in path[:-1]:
            node = node.setdefault(p, {})
        node[path[-1]] = arr
    return params


def import_torch_checkpoint(path: str) -> Tuple[Dict[str, Any], Dict[str, Any]]:
    """Load a reference .pkl/.pt -> (flax params, meta {'lr_base': ...}).

    Requires torch (CPU) — available on build hosts; TPU jobs consume the
    converted orbax checkpoint instead.
    """
    import torch

    blob = torch.load(path, map_location="cpu", weights_only=False)
    state_dict = blob["state_dict"] if "state_dict" in blob else blob
    meta = {k: blob[k] for k in ("lr_base",) if isinstance(blob, dict) and k in blob}
    return import_torch_state_dict(state_dict), meta


def fuse_qkv_params(params: Dict[str, Any], num_layers: int) -> Dict[str, Any]:
    """Standard (reference) layout -> fused_qkv=True model layout:
    concat q|k|v kernels/biases per self-attention block, k|v for the SGA
    cross-attention; originals removed."""
    import jax

    out = jax.tree.map(lambda x: x, params)
    bb = out["backbone"]

    def fuse(block, names, new_name):
        block[new_name] = {
            "kernel": np.concatenate(
                [np.asarray(block[n]["kernel"]) for n in names], axis=1),
            "bias": np.concatenate(
                [np.asarray(block[n]["bias"]) for n in names]),
        }
        for n in names:
            del block[n]

    for i in range(num_layers):
        fuse(bb[f"enc_{i}"]["mhatt"], ("linear_q", "linear_k", "linear_v"),
             "linear_qkv")
        fuse(bb[f"dec_{i}"]["mhatt1"], ("linear_q", "linear_k", "linear_v"),
             "linear_qkv")
        fuse(bb[f"dec_{i}"]["mhatt2"], ("linear_k", "linear_v"), "linear_kv")
    return out


def unfuse_qkv_params(params: Dict[str, Any], num_layers: int) -> Dict[str, Any]:
    """Inverse of fuse_qkv_params (for reference-format export)."""
    import jax

    out = jax.tree.map(lambda x: x, params)
    bb = out["backbone"]

    def unfuse(block, fused_name, names):
        k = np.asarray(block[fused_name]["kernel"])
        b = np.asarray(block[fused_name]["bias"])
        ks = np.split(k, len(names), axis=1)
        bs = np.split(b, len(names))
        for n, kk, bb_ in zip(names, ks, bs):
            block[n] = {"kernel": kk, "bias": bb_}
        del block[fused_name]

    for i in range(num_layers):
        unfuse(bb[f"enc_{i}"]["mhatt"], "linear_qkv",
               ("linear_q", "linear_k", "linear_v"))
        unfuse(bb[f"dec_{i}"]["mhatt1"], "linear_qkv",
               ("linear_q", "linear_k", "linear_v"))
        unfuse(bb[f"dec_{i}"]["mhatt2"], "linear_kv",
               ("linear_k", "linear_v"))
    return out


def flatten_params(params: Dict[str, Any], prefix=()) -> Dict[Tuple[str, ...], np.ndarray]:
    flat = {}
    for k, v in params.items():
        if isinstance(v, dict):
            flat.update(flatten_params(v, prefix + (k,)))
        else:
            flat[prefix + (k,)] = np.asarray(v)
    return flat


def export_torch_state_dict(params: Dict[str, Any]) -> Dict[str, Any]:
    """Our params -> a reference-shaped torch state_dict (inverse mapping)."""
    import torch

    out = {}
    for path, arr in flatten_params(params).items():
        parts = list(path)
        leaf = parts.pop()
        # enc_3 -> enc_list.3
        parts = [("enc_list." + p[4:]) if p.startswith("enc_") else
                 ("dec_list." + p[4:]) if p.startswith("dec_") else p
                 for p in parts]
        # FCLayer_0/Dense_0 -> fc.linear ; mlp/Dense_0 -> mlp.linear
        joined = ".".join(parts)
        joined = joined.replace("FCLayer_0.Dense_0", "fc.linear")
        joined = joined.replace("mlp.Dense_0", "mlp.linear")
        arr = np.asarray(arr, np.float32)
        if leaf == "kernel":
            out[f"{joined}.weight"] = torch.from_numpy(np.ascontiguousarray(arr.T))
        elif leaf == "embedding":
            out[f"{joined}.weight"] = torch.from_numpy(arr)
        elif leaf == "bias" and joined.endswith(("norm1", "norm2", "norm3", "proj_norm")):
            out[f"{joined}.b_2"] = torch.from_numpy(arr)
        elif leaf == "bias":
            out[f"{joined}.bias"] = torch.from_numpy(arr)
        elif leaf == "scale":
            out[f"{joined}.a_2"] = torch.from_numpy(arr)
        elif leaf in ("w_ih", "w_hh"):
            name = {"w_ih": "weight_ih_l0", "w_hh": "weight_hh_l0"}[leaf]
            out[f"{joined}.{name}"] = torch.from_numpy(np.ascontiguousarray(arr.T))
        elif leaf in ("b_ih", "b_hh"):
            name = {"b_ih": "bias_ih_l0", "b_hh": "bias_hh_l0"}[leaf]
            out[f"{joined}.{name}"] = torch.from_numpy(arr)
        else:
            raise KeyError(f"unrecognized param leaf: {path}")
    return out


def export_torch_checkpoint(params, path: str, lr_base: float = 1e-4) -> None:
    import torch

    torch.save({"state_dict": export_torch_state_dict(jax.device_get(params)),
                "lr_base": lr_base}, path)
