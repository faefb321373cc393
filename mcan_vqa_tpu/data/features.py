"""Image region-feature handling: padding, masking, and a packed shard cache.

The reference streams 400k+ tiny ``.npz`` files (one per image) through
DataLoader worker processes (reference: core/data/load_data.py:99-150). On a
TPU host that file-per-item pattern is the input bottleneck, so this module
adds a *packed cache*: all features are written once into a few large
``.npy``-backed shards with an index, then served via zero-copy ``np.memmap``
reads. The original per-file reader is kept for compatibility.
"""

from __future__ import annotations

import glob
import json
import os
from typing import Dict, List, Optional, Tuple

import numpy as np


def pad_img_feat(img_feat: np.ndarray, pad_size: int) -> np.ndarray:
    """Truncate to / zero-pad rows up to ``pad_size``
    (reference: core/data/data_utils.py:119-130).

    Pad rows stay all-zero: the model recovers the validity mask from them.
    """
    if img_feat.shape[0] > pad_size:
        img_feat = img_feat[:pad_size]
    out = np.zeros((pad_size,) + img_feat.shape[1:], dtype=img_feat.dtype)
    out[: img_feat.shape[0]] = img_feat
    return out


def iid_from_path(path: str) -> str:
    """Extract COCO image id from a BUTD feature filename
    (reference: core/data/data_utils.py:20-27)."""
    return str(int(path.split("/")[-1].split("_")[-1].split(".")[0]))


def glob_feature_paths(feat_dir: str) -> Dict[str, str]:
    """{image_id: npz path} for one split directory."""
    return {iid_from_path(p): p for p in glob.glob(os.path.join(feat_dir, "*.npz"))}


def load_npz_feature(path: str) -> np.ndarray:
    """Load one BUTD npz -> features [n_regions, 2048]
    (stored transposed as 'x' [2048, n]; reference: core/data/load_data.py:116-117)."""
    with np.load(path) as z:
        return z["x"].transpose(1, 0)


# ---------------------------------------------------------------------------
# Packed shard cache (TPU-native input path; no reference analogue)
# ---------------------------------------------------------------------------

class PackedFeatureCache:
    """All region features of a split packed into one flat fp16 memmap.

    Layout on disk (under ``cache_dir``):
      features.bin   float16 [total_rows, feat_dim]   (memmap)
      index.json     {image_id: [row_start, n_rows]}, feat_dim, total_rows

    fp16 halves host I/O vs the fp32 npz files; features are upcast (or cast
    straight to bfloat16) on device. Lookup is two memmap slices — no file
    open, no zlib inflate, no Python-side transpose.
    """

    def __init__(self, cache_dir: str):
        self.cache_dir = cache_dir
        with open(os.path.join(cache_dir, "index.json")) as f:
            meta = json.load(f)
        self.feat_dim: int = meta["feat_dim"]
        self.index: Dict[str, Tuple[int, int]] = {
            k: tuple(v) for k, v in meta["index"].items()
        }
        self._mm = np.memmap(
            os.path.join(cache_dir, "features.bin"),
            dtype=np.float16,
            mode="r",
            shape=(meta["total_rows"], self.feat_dim),
        )
        bbox_path = os.path.join(cache_dir, "bbox.bin")
        self._bbox = None
        if os.path.exists(bbox_path):
            self._bbox = np.memmap(bbox_path, dtype=np.float32, mode="r",
                                   shape=(meta["total_rows"], 4))

    def __contains__(self, iid: str) -> bool:
        return iid in self.index

    def get(self, iid: str) -> np.ndarray:
        start, n = self.index[iid]
        return np.asarray(self._mm[start : start + n])

    def get_padded(self, iid: str, pad_size: int, dtype=np.float32) -> np.ndarray:
        start, n = self.index[iid]
        n = min(n, pad_size)
        out = np.zeros((pad_size, self.feat_dim), dtype=dtype)
        out[:n] = self._mm[start : start + n]
        return out

    def get_bboxes(self, iid: str, pad_size: Optional[int] = None):
        """Region bounding boxes [n, 4] (None if the cache was packed
        without them); used by the visualization flow."""
        if self._bbox is None:
            return None
        start, n = self.index[iid]
        boxes = np.asarray(self._bbox[start : start + n])
        if pad_size is not None:
            boxes = pad_img_feat(boxes[:pad_size], pad_size)
        return boxes

    def native_batcher(self, n_threads: int = 0):
        """Lazily build the C++ gather+pad assembler over this cache's
        features.bin (None when no toolchain is available). Only a
        SUCCESSFUL construction is cached: a transient failure (racing
        a concurrent g++ build, FS hiccup) must not pin a long-lived
        serving cache to the slow numpy path forever. An explicit
        n_threads different from the cached batcher's rebuilds it."""
        cached = getattr(self, "_native", None)
        if cached is not None and n_threads in (0, cached.n_threads):
            return cached
        try:
            from mcan_vqa_tpu.data.native_batcher import NativeBatcher
            self._native = NativeBatcher(
                os.path.join(self.cache_dir, "features.bin"),
                self._mm.shape[0], self.feat_dim, n_threads)
        except Exception:
            return None
        return self._native

    def gather_pad_batch(self, iids, pad_size: int,
                         dtype=np.float32) -> np.ndarray:
        """Assemble [B, pad_size, feat_dim] for a batch of image ids —
        one native call (parallel C++ threads) when available.

        dtype: np.float32 (default) or "bfloat16"/ml_dtypes.bfloat16 —
        the bf16 path emits HALF the bytes (the serving engine's matmuls
        cast to bf16 anyway, so eval numerics are unchanged)."""
        bf16 = dtype is not None and str(np.dtype(dtype) if not
                                         isinstance(dtype, str) else dtype
                                         ) in ("bfloat16",)
        starts = np.empty(len(iids), np.uint64)
        lens = np.empty(len(iids), np.uint32)
        for i, iid in enumerate(iids):
            s, n = self.index[str(iid)]
            starts[i], lens[i] = s, n
        native = self.native_batcher()
        if native is not None:
            if bf16:
                return native.gather_pad_bf16(starts, lens, pad_size)
            return native.gather_pad(starts, lens, pad_size)
        out = np.zeros((len(iids), pad_size, self.feat_dim), np.float32)
        for i, (s, n) in enumerate(zip(starts, lens)):
            n = min(int(n), pad_size)
            out[i, :n] = self._mm[int(s): int(s) + n]
        if bf16:
            import ml_dtypes
            return out.astype(ml_dtypes.bfloat16)
        return out

    @staticmethod
    def build(npz_dir_or_paths, cache_dir: str, feat_dim: int = 2048,
              log_every: int = 5000) -> "PackedFeatureCache":
        """One-shot packing pass: npz files -> flat fp16 shard + index."""
        if isinstance(npz_dir_or_paths, str):
            paths = sorted(glob.glob(os.path.join(npz_dir_or_paths, "*.npz")))
        else:
            paths = list(npz_dir_or_paths)
        os.makedirs(cache_dir, exist_ok=True)

        # a rebuild in the same cache_dir must not inherit a previous
        # build's bbox.bin: a stale file either fails the mmap length
        # check on load (new split larger) or silently serves another
        # dataset's boxes (smaller) — it is rewritten below iff the new
        # npz set carries bboxes
        bbox_path = os.path.join(cache_dir, "bbox.bin")
        if os.path.exists(bbox_path):
            os.remove(bbox_path)

        index: Dict[str, List[int]] = {}
        total = 0
        for p in paths:
            with np.load(p) as z:
                n = z["x"].shape[1]
            iid = iid_from_path(p)
            if iid in index:
                # two files mapping to one id would leave the loser's
                # reserved rows as zero garbage and double-write the
                # survivor's slot — refuse rather than corrupt the pack
                raise ValueError(
                    f"duplicate image id {iid!r} in the input set "
                    f"(second occurrence: {p}) — every npz must map to "
                    f"a unique image id")
            index[iid] = [total, n]
            total += n

        mm = np.memmap(
            os.path.join(cache_dir, "features.bin"),
            dtype=np.float16, mode="w+", shape=(max(total, 1), feat_dim),
        )
        bb = None
        for i, p in enumerate(paths):
            start, n = index[iid_from_path(p)]
            with np.load(p) as z:
                mm[start : start + n] = z["x"].transpose(1, 0).astype(np.float16)
                if "bbox" in z.files:
                    if bb is None:
                        # rows for files packed BEFORE the first bbox
                        # file stay zero — memmap w+ zero-fills, and
                        # get_bboxes pads with zeros anyway
                        bb = np.memmap(bbox_path, dtype=np.float32,
                                       mode="w+",
                                       shape=(max(total, 1), 4))
                    bb[start : start + n] = z["bbox"][:, :4]
            if log_every and i % log_every == 0:
                print(f"packing features: {i}/{len(paths)}", flush=True)
        mm.flush()
        if bb is not None:
            bb.flush()

        with open(os.path.join(cache_dir, "index.json"), "w") as f:
            json.dump({"feat_dim": feat_dim, "total_rows": max(total, 1),
                       "index": index}, f)
        return PackedFeatureCache(cache_dir)
