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


class AsyncCheckpointSaver:
    """Background checkpoint writer: the training loop keeps running while
    the state is fetched to host and written to disk.

    The reference saves synchronously inside the epoch loop
    (core/exec.py:241-253) — harmless in eager torch where the tensors
    already live on host. Here the per-epoch save pays a device->host
    fetch of the full {params, opt_state} plus the orbax write; on
    interconnect-constrained hosts that is many seconds of idle chip per
    epoch. ``save()`` therefore (1) snapshots the state ON DEVICE
    (``jnp.copy`` — required for correctness, not just speed: the jitted
    train step donates its input buffers, so a background fetch of the
    live state would race buffer reuse) and (2) hands the snapshot to a
    worker thread that fetches + writes while the next epoch trains.

    ``wait()`` flushes pending writes — call it before exiting, resuming,
    or reading the directory. A failed write re-raises on the next
    ``save()`` or ``wait()``; pruning runs on the worker after each write
    so directory mutation is single-threaded.

    The queue is bounded to ONE pending snapshot: each enqueued item
    holds a full on-device {params, opt_state} copy (~3x the param
    bytes), so an unbounded queue would accumulate device memory without
    limit whenever writes are slower than epochs — exactly the
    slow-disk/slow-fetch regime this class exists for. With maxsize=1,
    ``save()`` blocks (briefly) until the PREVIOUS write has been picked
    up, bounding live snapshots at two (one writing + one queued).
    """

    def __init__(self):
        import queue
        import threading
        self._q: "queue.Queue" = queue.Queue(maxsize=1)
        self._error: Optional[BaseException] = None
        self._worker = threading.Thread(target=self._run, daemon=True,
                                        name="mcan-async-ckpt")
        self._worker.start()

    def save(self, state, ckpts_dir: str, version: str, epoch: int,
             keep_last: int = 0) -> str:
        import jax.numpy as jnp
        self._reraise()
        snapshot = {
            "params": jax.tree.map(jnp.copy, state.params),
            "opt_state": jax.tree.map(jnp.copy, state.opt_state),
            "step": int(state.step),
        }
        path = _ckpt_dir(ckpts_dir, version, epoch)
        self._q.put((snapshot, path, ckpts_dir, version, keep_last))
        return path

    def wait(self) -> None:
        """Block until every enqueued checkpoint is on disk."""
        self._q.join()
        self._reraise()

    def close(self) -> None:
        """Flush pending writes, stop and join the worker. A stored
        write error re-raises AFTER the worker is shut down — the error
        path must not leak a live daemon thread blocked on the queue
        (a long-lived process would accumulate one per failed close)."""
        try:
            self.wait()
        finally:
            self._q.put(None)
            self._worker.join()

    def _reraise(self):
        if self._error is not None:
            err, self._error = self._error, None
            raise RuntimeError("async checkpoint save failed") from err

    def _run(self):
        import orbax.checkpoint as ocp
        while True:
            item = self._q.get()
            if item is None:
                self._q.task_done()
                return
            snapshot, path, ckpts_dir, version, keep_last = item
            try:
                payload = {
                    "params": jax.device_get(snapshot["params"]),
                    "opt_state": jax.device_get(snapshot["opt_state"]),
                    "step": snapshot["step"],
                }
                with ocp.PyTreeCheckpointer() as ckptr:
                    ckptr.save(path, payload, force=True)
                if keep_last > 0:
                    prune_checkpoints(ckpts_dir, version, keep_last)
            except BaseException as e:  # noqa: BLE001 — surfaced on next save/wait
                self._error = e
            finally:
                del snapshot
                self._q.task_done()


def act_scales_path(ckpt_dir: str) -> str:
    """Side-file path for the static activation scales calibrated at the
    end of training (Trainer) — stored NEXT to the orbax epoch directory
    (orbax validates its directory contents, so nothing foreign may live
    inside it): ``.../epoch<N>`` -> ``.../epoch<N>.act_scales.json``."""
    return os.path.abspath(ckpt_dir).rstrip("/") + ".act_scales.json"


def save_act_scales(ckpt_dir: str, scales: Dict[str, tuple]) -> str:
    """Persist calibrated static activation scales next to a checkpoint.

    scales: {"enc_i"/"dec_i": (aqkv, a1, a2)} python floats, exactly what
    ops.quant.calibrate_qffn_act_scales returns. The Predictor's
    ``from_checkpoint`` auto-loads this file so deployments get the
    calibrated (level-3 int8) engine without a per-process calibration
    ritual — the Trainer has real batches at end-of-train, which is when
    this is written."""
    import json
    path = act_scales_path(ckpt_dir)
    with open(path, "w") as f:
        json.dump({k: list(v) for k, v in scales.items()}, f, indent=1)
    return path


def load_act_scales(ckpt_dir: str) -> Optional[Dict[str, tuple]]:
    """Load calibrated activation scales stored next to a checkpoint
    directory, or None when the side file does not exist."""
    import json
    path = act_scales_path(ckpt_dir)
    if not os.path.exists(path):
        return None
    with open(path) as f:
        raw = json.load(f)
    return {k: tuple(float(x) for x in v) for k, v in raw.items()}


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
        scales = act_scales_path(os.path.join(d, f"epoch{e}"))
        if os.path.exists(scales):
            os.remove(scales)
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
    """Load a reference .pkl/.pt -> (flax params, meta).

    meta carries 'lr_base' when present, plus — when the pickle holds the
    reference's optimizer state (core/exec.py:241-245 saves it; :90-92
    restores it on resume) — 'optimizer' (the raw torch AdamW state_dict)
    and 'param_keys' (the model param names in registration order, which is
    the index order AdamW's saved state uses). Feed both to
    ``import_torch_opt_state`` for a trajectory-faithful resume.

    Requires torch (CPU) — available on build hosts; TPU jobs consume the
    converted orbax checkpoint instead.
    """
    import torch

    blob = torch.load(path, map_location="cpu", weights_only=False)
    state_dict = blob["state_dict"] if "state_dict" in blob else blob
    meta = {k: blob[k] for k in ("lr_base",) if isinstance(blob, dict) and k in blob}
    if isinstance(blob, dict) and isinstance(blob.get("optimizer"), dict):
        meta["optimizer"] = blob["optimizer"]
        # state_dict key order == model.parameters() order (Net2 has no
        # buffers), which is the order the reference passed to AdamW
        # (core/model/optim.py:58-60) — i.e. the optimizer's index space.
        meta["param_keys"] = list(_strip_module_prefix(state_dict).keys())
    return import_torch_state_dict(state_dict), meta


# ---------------------------------------------------------------------------
# Optimizer-state (AdamW moments) interop — trajectory-faithful resume
# ---------------------------------------------------------------------------

def reference_param_keys(num_layers: int) -> list:
    """Net2's state_dict keys in registration order (reference:
    core/model/net.py:295-333, mca.py:18-186, net_utils.py:11-60). This is
    the index order torch AdamW state uses; validated against the actual
    reference model in tests/test_reference_parity.py."""
    def linear(p):
        return [f"{p}.weight", f"{p}.bias"]

    def norm(p):
        return [f"{p}.a_2", f"{p}.b_2"]

    def mhatt(p):
        return (linear(f"{p}.linear_v") + linear(f"{p}.linear_k")
                + linear(f"{p}.linear_q") + linear(f"{p}.linear_merge"))

    def mlp(p):
        return linear(f"{p}.fc.linear") + linear(f"{p}.linear")

    keys = ["embedding.weight", "lstm.weight_ih_l0", "lstm.weight_hh_l0",
            "lstm.bias_ih_l0", "lstm.bias_hh_l0"]
    keys += linear("img_feat_linear")
    for i in range(num_layers):
        p = f"backbone.enc_list.{i}"
        keys += (mhatt(f"{p}.mhatt") + mlp(f"{p}.ffn.mlp")
                 + norm(f"{p}.norm1") + norm(f"{p}.norm2"))
    for i in range(num_layers):
        p = f"backbone.dec_list.{i}"
        keys += (mhatt(f"{p}.mhatt1") + mhatt(f"{p}.mhatt2")
                 + mlp(f"{p}.ffn.mlp") + norm(f"{p}.norm1")
                 + norm(f"{p}.norm2") + norm(f"{p}.norm3"))
    for af in ("attflat_img", "attflat_lang"):
        keys += mlp(f"{af}.mlp") + linear(f"{af}.linear_merge")
    keys += norm("proj_norm") + linear("proj")
    return keys


def _graft_flat(tree: Dict[str, Any], flat: Dict[Tuple[str, ...], np.ndarray],
                prefix=(), matched: Optional[set] = None) -> Dict[str, Any]:
    """Replace leaves of a nested dict by flat[path] where present, keeping
    dtype/shape of the original leaf. ``matched`` (if given) collects the
    flat paths actually consumed so the caller can detect entries that
    found no home in the template."""
    out = {}
    for k, v in tree.items():
        p = prefix + (k,)
        if isinstance(v, dict):
            out[k] = _graft_flat(v, flat, p, matched)
        elif p in flat:
            if matched is not None:
                matched.add(p)
            arr = np.asarray(flat[p])
            leaf = np.asarray(v)
            assert arr.shape == leaf.shape, \
                f"optimizer moment shape mismatch at {p}: " \
                f"{arr.shape} vs {leaf.shape}"
            out[k] = arr.astype(leaf.dtype)
        else:
            out[k] = v
    return out


def _map_opt_state(node, adam_fn, count_fn):
    """Recursively rewrite an optax state tuple: ScaleByAdamState nodes via
    adam_fn, any other namedtuple with a 'count' field via count_fn."""
    if hasattr(node, "_fields"):
        if {"count", "mu", "nu"} <= set(node._fields):
            return adam_fn(node)
        if "count" in node._fields:
            return count_fn(node)
        return type(node)(*[_map_opt_state(x, adam_fn, count_fn)
                            for x in node])
    if isinstance(node, tuple):
        return tuple(_map_opt_state(x, adam_fn, count_fn) for x in node)
    return node


def import_torch_opt_state(optimizer_sd: Dict[str, Any], param_keys: list,
                           template_opt_state) -> Tuple[Any, int]:
    """torch AdamW optimizer state_dict -> (optax adamw state, step count).

    The reference's resume restores exp_avg/exp_avg_sq so a resumed run
    continues the SAME optimization trajectory (core/exec.py:90-92). optax
    adamw's update math is element-for-element identical to torch AdamW
    (mu=exp_avg, nu=exp_avg_sq; bias correction sqrt(nu/bc2)+eps; decoupled
    weight decay), so the moments transplant directly — transposed exactly
    as their params are. Both optax counts (adam bias-correction and lr
    schedule) are set to the torch step count N: optax increments before
    use, so count=N makes the next update bias-correct with t=N+1 and take
    lr(reference step N+1), exactly like torch's step N+1 would.
    """
    import jax.numpy as jnp

    state = optimizer_sd.get("state", {})
    mu_flat: Dict[Tuple[str, ...], np.ndarray] = {}
    nu_flat: Dict[Tuple[str, ...], np.ndarray] = {}
    step = 0
    for i, key in enumerate(param_keys):
        s = state.get(i, state.get(str(i)))
        if s is None:
            continue
        path, transpose = torch_key_to_flax(key)
        m, v = _to_np(s["exp_avg"]), _to_np(s["exp_avg_sq"])
        if transpose:
            m, v = m.T, v.T
        mu_flat[path] = m
        nu_flat[path] = v
        step = max(step, int(float(_to_np(s["step"]))))

    matched: set = set()

    def adam(node):
        return node._replace(
            count=jnp.asarray(step, node.count.dtype),
            mu=_graft_flat(jax.device_get(node.mu), mu_flat,
                           matched=matched),
            nu=_graft_flat(jax.device_get(node.nu), nu_flat,
                           matched=matched))

    def count(node):
        return node._replace(count=jnp.asarray(step, node.count.dtype))

    out = _map_opt_state(template_opt_state, adam, count)
    missing = set(mu_flat) - matched
    if missing:
        # silently leaving zero moments for dropped paths would produce a
        # resume that LOOKS trajectory-faithful (the trainer logs
        # "restored AdamW moments") while diverging from the reference —
        # e.g. a fused_qkv=True template has no linear_q/k/v homes for a
        # standard-layout torch state
        sample = ", ".join("/".join(p) for p in sorted(missing)[:4])
        raise ValueError(
            f"{len(missing)} torch optimizer moment(s) have no home in "
            f"the optax template (e.g. {sample}): the model layout "
            f"differs from the checkpoint's — a trajectory-faithful "
            f"resume is impossible. Match the layout (fused_qkv?), or "
            f"resume params-only (drop the pickle's 'optimizer' entry)")
    return out, step


def export_torch_opt_state(opt_state, num_layers: int, lr: float = 0.0,
                           weight_decay: float = 1e-4,
                           betas=(0.9, 0.999), eps: float = 1e-8
                           ) -> Dict[str, Any]:
    """optax adamw state -> a torch AdamW optimizer state_dict the reference
    can load_state_dict (core/exec.py:90-92): per-param {step, exp_avg,
    exp_avg_sq} indexed in Net2's registration order, one param_group."""
    import torch

    found = {}

    def adam(node):
        found["mu"] = jax.device_get(node.mu)
        found["nu"] = jax.device_get(node.nu)
        found["count"] = int(node.count)
        return node

    _map_opt_state(opt_state, adam, lambda n: n)
    if "mu" not in found:
        raise ValueError("no ScaleByAdamState in opt_state")
    mu_flat = flatten_params(found["mu"])
    nu_flat = flatten_params(found["nu"])

    state = {}
    for i, key in enumerate(reference_param_keys(num_layers)):
        path, transpose = torch_key_to_flax(key)
        m = np.asarray(mu_flat[path], np.float32)
        v = np.asarray(nu_flat[path], np.float32)
        if transpose:
            m, v = m.T, v.T
        # torch.from_numpy warns on read-only views (jax arrays surface
        # as such); ascontiguousarray alone keeps them read-only
        m = np.ascontiguousarray(m)
        v = np.ascontiguousarray(v)
        state[i] = {
            "step": torch.tensor(float(found["count"])),
            "exp_avg": torch.from_numpy(m if m.flags.writeable else m.copy()),
            "exp_avg_sq": torch.from_numpy(
                v if v.flags.writeable else v.copy()),
        }
    param_groups = [{
        "lr": lr, "betas": tuple(betas), "eps": eps,
        "weight_decay": weight_decay, "amsgrad": False, "maximize": False,
        "foreach": None, "capturable": False, "differentiable": False,
        "fused": None, "decoupled_weight_decay": True,
        "params": list(range(len(state))),
    }]
    return {"state": state, "param_groups": param_groups}


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
        if not arr.flags.writeable:
            # jax arrays surface as read-only numpy views; torch tensors
            # must own writable memory (and warn otherwise)
            arr = arr.copy()
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
    # Emit keys in Net2's registration order when the tree is a full MCANet:
    # torch AdamW state indexes params by this order, so a consistent order
    # is what makes the exported optimizer state loadable (and our own
    # importer's param_keys correct).
    enc_ids = [int(k.split(".")[2]) for k in out
               if k.startswith("backbone.enc_list.")]
    if enc_ids:
        expected = reference_param_keys(max(enc_ids) + 1)
        if set(expected) == set(out):
            out = {k: out[k] for k in expected}
    return out


def export_torch_checkpoint(params, path: str, lr_base: float = 1e-4,
                            opt_state=None, num_layers: Optional[int] = None,
                            weight_decay: float = 1e-4,
                            betas=(0.9, 0.999), eps: float = 1e-8) -> None:
    """Write a reference-format pickle {'state_dict','optimizer','lr_base'}
    (core/exec.py:241-245). Pass opt_state+num_layers to include the AdamW
    moments so the reference's resume continues the same trajectory."""
    import torch

    blob = {"state_dict": export_torch_state_dict(jax.device_get(params)),
            "lr_base": lr_base}
    if opt_state is not None:
        if num_layers is None:
            raise ValueError("num_layers required to order optimizer state")
        blob["optimizer"] = export_torch_opt_state(
            opt_state, num_layers, lr=lr_base, weight_decay=weight_decay,
            betas=betas, eps=eps)
    torch.save(blob, path)
