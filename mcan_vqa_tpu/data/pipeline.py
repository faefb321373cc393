"""Host -> device input pipeline: threaded batch assembly + async device_put.

Replaces the reference's DataLoader worker *processes*
(reference: core/data/load_data.py:267-300) with a thread pool: the hot
per-item work (memmap slice, np.pad, np.stack) releases the GIL, threads
avoid fork/pickle overhead, and ``jax.device_put`` is asynchronous, so the
accelerator never waits on the host once the prefetch depth (default 2
batches) is filled.

Semantics preserved: shuffle + drop_last for training. Eval uses
shuffle=False / drop_last=False (fixing the reference quirk of shuffling and
dropping data during evaluation, load_data.py:273-279 + core/exec.py:375).
"""

from __future__ import annotations

import queue
from concurrent.futures import ThreadPoolExecutor
from typing import Any, Dict, Iterator

import numpy as np


class BatchLoader:
    def __init__(
        self,
        dataset,
        batch_size: int,
        shuffle: bool = True,
        drop_last: bool = True,
        seed: int = 444,
        num_workers: int = 4,
        prefetch: int = 2,
        sharding=None,
        pad_final: bool = False,
        process_index: int = 0,
        process_count: int = 1,
        device_keys: tuple = ("img", "ques", "target"),
        feat_dtype=None,
    ):
        """pad_final: repeat-pad the last partial batch up to batch_size (for
        fixed-shape jit'd eval; callers mask by the returned per-row 'valid'
        mask or the 'n_valid' count of locally-valid rows).

        process_index/process_count: multi-host pods — each host assembles
        only its 1/process_count slice of every global batch. When a real
        multi-process jax runtime is active, the keys in ``device_keys`` are
        assembled into GLOBAL batch-sharded arrays via
        jax.make_array_from_process_local_data; metadata keys (qid, valid,
        n_valid) always stay host-local numpy."""
        self.dataset = dataset
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.drop_last = drop_last
        self.seed = seed
        self.num_workers = max(1, num_workers)
        self.prefetch = max(1, prefetch)
        self.sharding = sharding
        self.pad_final = pad_final
        self.process_index = process_index
        self.process_count = process_count
        self.device_keys = tuple(device_keys)
        # feat_dtype="bfloat16": request half-width image features from the
        # dataset's whole-batch assembler (serving path — halves host
        # assembly bytes AND host->device transfer; the engine's matmuls
        # are bf16 anyway). Capability is detected ONCE from the
        # assembler's signature — a try/except TypeError around the call
        # would also swallow genuine TypeErrors raised INSIDE it and
        # re-run the whole batch assembly.
        if feat_dtype is not None and hasattr(dataset, "batch_examples"):
            import inspect
            try:
                ps = inspect.signature(dataset.batch_examples).parameters
                takes_kwarg = "feat_dtype" in ps or any(
                    p.kind is inspect.Parameter.VAR_KEYWORD
                    for p in ps.values())
            except (TypeError, ValueError):
                takes_kwarg = True   # non-introspectable binding: trust it
            if not takes_kwarg:
                feat_dtype = None    # dataset assembles fp32 only
        self.feat_dtype = feat_dtype
        assert batch_size % max(process_count, 1) == 0
        if process_count > 1:
            # a partial final batch cannot be split evenly across hosts
            assert drop_last or pad_final, (
                "multi-host loading requires drop_last or pad_final")
        if sharding is not None:
            import jax
            # __iter__ slices rows by self.process_count while _to_device
            # assembles the global array from jax.process_count() — if
            # they disagree, every host would contribute the FULL batch
            # and the global array silently duplicates rows
            assert jax.process_count() == 1 \
                or process_count == jax.process_count(), (
                    f"process_count={process_count} but this runtime has "
                    f"{jax.process_count()} jax processes — pass "
                    f"process_index/process_count from the runtime")
        self._epoch = 0

    def __len__(self) -> int:
        n = len(self.dataset)
        return n // self.batch_size if self.drop_last else \
            -(-n // self.batch_size)

    def set_epoch(self, epoch: int) -> None:
        """Pin the epoch the NEXT __iter__ will shuffle with. `_epoch` is the
        single source of truth: __iter__ snapshots it and advances it at
        iteration START (not on clean completion), so a run interrupted
        mid-epoch never leaves the counter ambiguous."""
        self._epoch = epoch

    def _index_order(self, epoch: int) -> np.ndarray:
        idx = np.arange(len(self.dataset))
        if self.shuffle:
            np.random.default_rng(self.seed + epoch).shuffle(idx)
        return idx

    def _assemble(self, indices: np.ndarray,
                  valid: np.ndarray) -> Dict[str, Any]:
        """Assemble this host's rows. ``indices`` is already padded/sliced by
        __iter__; ``valid`` marks which of those rows are real examples."""
        # whole-batch fast path (native C++ gather+pad) when the dataset
        # provides it
        if hasattr(self.dataset, "batch_examples"):
            if self.feat_dtype is not None:   # capability checked in __init__
                batch = self.dataset.batch_examples(
                    indices, feat_dtype=self.feat_dtype)
            else:
                batch = self.dataset.batch_examples(indices)
        else:
            examples = [self.dataset.example(int(i)) for i in indices]
            batch = {k: np.stack([e[k] for e in examples])
                     for k in examples[0]}
        batch["valid"] = valid
        batch["n_valid"] = np.int32(valid.sum())
        return batch

    def _to_device(self, batch: Dict[str, Any]) -> Dict[str, Any]:
        if self.sharding is None:
            return batch
        import jax
        multiprocess = jax.process_count() > 1
        out = {}
        for k, v in batch.items():
            if (k in self.device_keys and isinstance(v, np.ndarray)
                    and v.ndim > 0):
                if multiprocess:
                    # per-host rows -> one global batch-sharded array
                    gshape = (v.shape[0] * jax.process_count(),) + v.shape[1:]
                    out[k] = jax.make_array_from_process_local_data(
                        self.sharding, v, gshape)
                else:
                    out[k] = jax.device_put(v, self.sharding)
            else:
                out[k] = v  # metadata stays host-local (qid, valid, n_valid)
        return out

    def __iter__(self) -> Iterator[Dict[str, Any]]:
        epoch = self._epoch
        self._epoch = epoch + 1
        order = self._index_order(epoch)
        n_batches = len(self)
        starts = [i * self.batch_size for i in range(n_batches)]

        with ThreadPoolExecutor(self.num_workers) as pool:
            pending = queue.Queue()
            depth = self.prefetch

            def submit(bi):
                sl = order[starts[bi]: starts[bi] + self.batch_size]
                # pad the GLOBAL batch first so multi-host slices stay even,
                # then take this host's contiguous row block
                if self.pad_final and len(sl) < self.batch_size:
                    n = len(sl)
                    sl = np.concatenate(
                        [sl, np.repeat(sl[-1], self.batch_size - n)])
                    valid = np.arange(self.batch_size) < n
                else:
                    valid = np.ones(len(sl), bool)
                if self.process_count > 1:
                    per = self.batch_size // self.process_count
                    lo = self.process_index * per
                    sl, valid = sl[lo:lo + per], valid[lo:lo + per]
                pending.put(pool.submit(self._assemble, sl, valid))

            for bi in range(min(depth, n_batches)):
                submit(bi)
            for bi in range(n_batches):
                fut = pending.get()
                if bi + depth < n_batches:
                    submit(bi + depth)
                yield self._to_device(fut.result())
