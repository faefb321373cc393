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
    ):
        """pad_final: repeat-pad the last partial batch up to batch_size (for
        fixed-shape jit'd eval; callers mask by the returned 'valid' count).

        process_index/process_count: multi-host pods — each host assembles
        only its 1/process_count slice of every global batch (the per-host
        rows of the batch-sharded global array)."""
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
        assert batch_size % max(process_count, 1) == 0
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

    def _assemble(self, indices: np.ndarray) -> Dict[str, Any]:
        # this host's share of a full batch (per-host rows on multi-host pods)
        host_batch = self.batch_size // max(self.process_count, 1)
        # whole-batch fast path (native C++ gather+pad) when the dataset
        # provides it
        if hasattr(self.dataset, "batch_examples"):
            n_valid = len(indices)
            if self.pad_final and n_valid < host_batch:
                indices = np.concatenate(
                    [indices,
                     np.repeat(indices[-1], host_batch - n_valid)])
            batch = self.dataset.batch_examples(indices)
            batch["n_valid"] = np.int32(n_valid)
            return batch
        examples = [self.dataset.example(int(i)) for i in indices]
        n_valid = len(examples)
        if self.pad_final and n_valid < host_batch:
            examples = examples + [examples[-1]] * (host_batch - n_valid)
        batch = {k: np.stack([e[k] for e in examples])
                 for k in examples[0]}
        batch["n_valid"] = np.int32(n_valid)
        return batch

    def _to_device(self, batch: Dict[str, Any]) -> Dict[str, Any]:
        if self.sharding is None:
            return batch
        import jax
        return {k: (jax.device_put(v, self.sharding)
                    if isinstance(v, np.ndarray) and v.ndim > 0 else v)
                for k, v in batch.items()}

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
                if self.process_count > 1:
                    per = self.batch_size // self.process_count
                    sl = sl[self.process_index * per:
                            (self.process_index + 1) * per]
                pending.put(pool.submit(self._assemble, sl))

            for bi in range(min(depth, n_batches)):
                submit(bi)
            for bi in range(n_batches):
                fut = pending.get()
                if bi + depth < n_batches:
                    submit(bi + depth)
                yield self._to_device(fut.result())
