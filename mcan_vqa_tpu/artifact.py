"""AOT serving artifacts: freeze the serving forward to StableHLO.

``save_artifact`` exports a ``Predictor``'s jitted forward through
``jax.export`` — one ``Exported`` blob per latency bucket — and writes it
next to the parameters, vocabulary, answer map, and shape metadata as one
self-describing directory. ``load_artifact`` returns an
``ArtifactPredictor`` with the same ``predict_probs``/``answer`` API that
never touches flax or the model-building code: the compute graph is the
serialized StableHLO, which XLA compiles on the consumer side exactly as
traced at export time (fused Pallas kernels included, embedded as
``tpu_custom_call``s).

Why this is the TPU-native deployment story: StableHLO is the unit XLA
AOT-compiles, so the artifact pins the exact compiled semantics of the
serving engine at export time — a deployment host needs jax + this file's
loader, not the framework. The reference has no analogue (inference
happens inside the eval loops, /root/reference/core/exec.py:256-428); the
closest torch concept is a TorchScript/ONNX export, which the reference
also does not provide.

Engine/platform rules:
- ``plain`` (model.apply) engines export multi-platform ``("cpu", "tpu")``
  by default — one artifact serves both.
- ``fused``/``int8`` engines embed Pallas TPU kernels, so they export
  TPU-only, with the ``tpu_custom_call`` export safety-check lifted.

Layout of an artifact directory::

    meta.json          engine, platforms, buckets, shapes, leaf dtypes
    vocab.json         token_to_ix
    answers.json       ix_to_ans
    params.npz         flat param leaves p0..pN (bf16 stored as uint16)
    forward_b{B}.shlo  serialized jax.export.Exported, one per bucket
    params_{name}.npz  (format 2 only) one extra param set per routed
                       non-base engine, with meta["routes"] mapping each
                       bucket to its engine — auto-routed Predictors
                       freeze their full bucket->engine table
"""

from __future__ import annotations

import json
import os
from typing import Dict, List, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import export as jax_export

from mcan_vqa_tpu.data import answers as ans_mod
from mcan_vqa_tpu.request_prep import pad_to_bucket, prep_request_inputs

_FORMAT_VERSION = 1

# npz cannot serialize ml_dtypes; store these as same-width integer views.
_VIEW_DTYPES = {"bfloat16": np.uint16, "float8_e4m3fn": np.uint8,
                "float8_e5m2": np.uint8}


def _leaves_to_npz(leaves) -> Tuple[Dict[str, np.ndarray], List[str]]:
    arrays, dtypes = {}, []
    for i, leaf in enumerate(leaves):
        a = np.asarray(leaf)
        dtypes.append(str(a.dtype))
        view = _VIEW_DTYPES.get(str(a.dtype))
        arrays[f"p{i}"] = a.view(view) if view else a
    return arrays, dtypes


def _leaves_from_npz(npz, dtypes: Sequence[str]) -> List[jnp.ndarray]:
    out = []
    for i, dt in enumerate(dtypes):
        a = npz[f"p{i}"]
        if str(a.dtype) != dt:
            a = a.view(jnp.dtype(dt))
        out.append(jnp.asarray(a))
    return out


def save_artifact(predictor, path: str,
                  platforms: Sequence[str] | None = None) -> None:
    """Export ``predictor``'s forward to a self-describing directory.

    One StableHLO blob is exported per latency bucket (including
    ``max_batch``), so the loaded artifact routes requests exactly like
    the live ``Predictor``. ``platforms`` overrides the engine-default
    lowering platforms (plain: ``("cpu", "tpu")``; fused/int8: TPU-only).
    """
    engine = predictor.engine
    if getattr(predictor, "_mesh_live", False):
        # the mesh predictor's forwards are jit(shard_map(...)) bound to
        # an N-device mesh: exporting them either fails with an obscure
        # device-count error or bakes an N-device requirement into an
        # artifact whose loader promises "any single-device host" —
        # refuse with the fix instead
        raise ValueError(
            "cannot export a mesh-built Predictor: artifacts are "
            "single-device programs (the loader runs on any one-chip "
            "host). Build a Predictor without mesh= for export; deploy "
            "the artifact per chip and shard requests at the frontend")
    if platforms is None:
        platforms = ("cpu", "tpu") if engine == "plain" else ("tpu",)
    disabled = ()
    if engine != "plain":
        # Pallas kernels lower to the tpu_custom_call target, which the
        # export safety check rejects by default; the Mosaic payload is
        # version-stable enough for same-fleet deployment.
        disabled = (jax_export.DisabledSafetyCheck.custom_call(
            "tpu_custom_call"),)

    # snapshot the atomic (engines, routes) handle ONCE: an online
    # calibration swap mid-export must not pair an old tree's leaf
    # specs with a new engine's different prepared tree (extra
    # static-scale leaves) — that traces garbage or tears a
    # multi-bucket artifact across two engine sets
    live, routes = predictor._live
    flat = {}           # engine name -> (leaves, treedef, leaf_specs, fwd)
    for name, (fwd, params) in live.items():
        leaves, treedef = jax.tree_util.tree_flatten(params)
        specs = [jax.ShapeDtypeStruct(np.shape(l), l.dtype) for l in leaves]
        flat[name] = (leaves, treedef, specs, fwd)

    cfg = predictor.cfg
    os.makedirs(path, exist_ok=True)
    exported_names = {}
    for bucket in predictor._buckets:
        leaves, treedef, leaf_specs, fwd = flat[routes[int(bucket)]]

        def forward(flat_params, img, ques, _treedef=treedef, _fwd=fwd):
            params = jax.tree_util.tree_unflatten(_treedef, flat_params)
            return _fwd(params, img, ques)

        img_spec = jax.ShapeDtypeStruct(
            (bucket, cfg.img_feat_pad_size, cfg.img_feat_size), jnp.float32)
        ques_spec = jax.ShapeDtypeStruct((bucket, cfg.max_token), jnp.int32)
        exp = jax_export.export(
            jax.jit(forward), platforms=tuple(platforms),
            disabled_checks=disabled)(leaf_specs, img_spec, ques_spec)
        name = f"forward_b{bucket}.shlo"
        with open(os.path.join(path, name), "wb") as f:
            f.write(bytes(exp.serialize()))
        exported_names[str(bucket)] = name

    # base params keep the v1 layout (params.npz + top-level
    # leaf_dtypes); routed engines (auto-routing builds) add one
    # params_{name}.npz each plus a routes table — loaders that
    # predate routing never see these because such artifacts carry
    # format_version 2
    arrays, dtypes = _leaves_to_npz(flat["base"][0])
    np.savez(os.path.join(path, "params.npz"), **arrays)
    extra_params = {}
    for name, (leaves, _, _, _) in flat.items():
        if name == "base":
            continue
        arrs, dts = _leaves_to_npz(leaves)
        fname = f"params_{name}.npz"
        np.savez(os.path.join(path, fname), **arrs)
        extra_params[name] = {"file": fname, "leaf_dtypes": dts}
    with open(os.path.join(path, "vocab.json"), "w") as f:
        json.dump(predictor.token_to_ix, f)
    with open(os.path.join(path, "answers.json"), "w") as f:
        json.dump({str(k): v for k, v in predictor.ix_to_ans.items()}, f)
    meta = {
        # routed artifacts need at least format 2; max() keeps a future
        # _FORMAT_VERSION bump from silently writing a stale version on
        # the routed branch
        "format_version": (max(_FORMAT_VERSION, 2) if extra_params
                           else _FORMAT_VERSION),
        "engine": engine,
        "platforms": list(platforms),
        "buckets": [int(b) for b in predictor._buckets],
        "forwards": exported_names,
        "max_token": int(cfg.max_token),
        "img_feat_pad_size": int(cfg.img_feat_pad_size),
        "img_feat_size": int(cfg.img_feat_size),
        "leaf_dtypes": dtypes,
    }
    if extra_params:
        meta["routes"] = {str(b): r for b, r in routes.items()}
        meta["extra_params"] = extra_params
    with open(os.path.join(path, "meta.json"), "w") as f:
        json.dump(meta, f, indent=1)


class ArtifactPredictor:
    """Serve from an exported artifact directory — no model code, no flax.

    Same request API as ``Predictor`` (``predict_probs`` / ``answer``,
    latency-bucket padding); the forward is the deserialized
    ``jax.export.Exported`` call, jitted per bucket and compiled lazily
    on first use for the local backend.
    """

    def __init__(self, path: str):
        with open(os.path.join(path, "meta.json")) as f:
            meta = json.load(f)
        if meta["format_version"] not in (1, 2):
            raise ValueError(f"artifact format {meta['format_version']} "
                             f"not in supported (1, 2)")
        self.meta = meta
        with open(os.path.join(path, "vocab.json")) as f:
            self.token_to_ix = json.load(f)
        with open(os.path.join(path, "answers.json")) as f:
            self.ix_to_ans = json.load(f)
        # context-managed: NpzFile keeps the zip open otherwise, leaking
        # one fd per (re)loaded artifact for the predictor's lifetime
        with np.load(os.path.join(path, "params.npz")) as npz:
            leaves = {"base": _leaves_from_npz(npz, meta["leaf_dtypes"])}
        for name, spec in meta.get("extra_params", {}).items():
            # format 2: auto-routed artifacts carry one param set per
            # non-base engine (int4 nibble-packed weights etc.)
            with np.load(os.path.join(path, spec["file"])) as z:
                leaves[name] = _leaves_from_npz(z, spec["leaf_dtypes"])
        self._buckets = tuple(meta["buckets"])
        routes = meta.get("routes",
                          {str(b): "base" for b in self._buckets})
        # same introspection surface as Predictor.routes (serve /stats):
        # which engine's params each compiled bucket dispatches to
        self.routes = {int(b): r for b, r in routes.items()}
        self.max_batch = self._buckets[-1]
        self._fns = {}
        self._bucket_leaves = {}
        for bucket in self._buckets:
            with open(os.path.join(
                    path, meta["forwards"][str(bucket)]), "rb") as f:
                blob = f.read()
            exp = jax_export.deserialize(bytearray(blob))
            self._fns[bucket] = jax.jit(exp.call)
            self._bucket_leaves[bucket] = leaves[routes[str(bucket)]]

    @property
    def img_feat_size(self) -> int:
        """Per-region feature width F a request row must have."""
        return int(self.meta["img_feat_size"])

    def predict_probs(self, questions: Sequence[str],
                      image_features) -> np.ndarray:
        """Same contract as ``Predictor.predict_probs``: an [N, R, F]
        array or a sequence of N ragged [R_i, F] arrays."""
        probs, n = self.predict_probs_async(questions, image_features)
        return np.asarray(probs)[:n]

    def predict_probs_async(self, questions: Sequence[str],
                            image_features):
        """Host prep + dispatch only, returning ``(device_probs, n)`` —
        same contract as ``Predictor.predict_probs_async``."""
        n = len(questions)
        assert len(image_features) == n
        assert n <= self.max_batch, (n, self.max_batch)
        m = self.meta
        ques, img = prep_request_inputs(
            questions, image_features, self.token_to_ix, m["max_token"],
            m["img_feat_pad_size"])
        target = next(b for b in self._buckets if b >= n)
        img, ques = pad_to_bucket(img, ques, target)
        return self._fns[target](self._bucket_leaves[target], img,
                                 ques), n

    def answer(self, questions: Sequence[str],
               image_features: np.ndarray) -> List[Tuple[str, float]]:
        probs = self.predict_probs(questions, image_features)
        return [ans_mod.topk_answers(row, self.ix_to_ans, 1)[0]
                for row in probs]

    def topk(self, questions: Sequence[str], image_features,
             k: int = 5) -> List[List[Tuple[str, float]]]:
        """Top-k (answer, probability) pairs per question, highest first
        — same contract as ``Predictor.topk``."""
        probs = self.predict_probs(questions, image_features)
        return [ans_mod.topk_answers(row, self.ix_to_ans, k)
                for row in probs]


def load_artifact(path: str) -> ArtifactPredictor:
    return ArtifactPredictor(path)
