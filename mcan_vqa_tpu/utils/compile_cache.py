"""Persistent XLA compilation cache for production entrypoints.

On TPU a cold compile of the training step or a serving bucket costs
minutes (the megakernel engines especially); the reference never pays
this because torch is eager. JAX's persistent compilation cache makes it
a once-per-machine cost instead of once-per-process: compiled executables
are keyed by (program, compiler version, device kind) and written to a
directory, so a restarted trainer or serving replica skips straight to
running. bench.py/bench_train.py and the test suite already use it; this
wires the same thing into the user-facing CLIs (run_vqa, run_mimic,
run_classify, serve, sweep).

Opt out with ``--compile_cache off`` (or ``MCAN_COMPILE_CACHE=off``).
"""

from __future__ import annotations

import os
from typing import Optional

_OFF = ("off", "none", "0", "disable", "disabled")


def default_cache_dir() -> str:
    return os.path.join(os.path.expanduser("~"), ".cache",
                        "mcan_vqa_tpu", "xla")


def enable(cache_dir: Optional[str] = None,
           min_compile_secs: float = 1.0) -> Optional[str]:
    """Point JAX's persistent compilation cache at ``cache_dir``.

    Resolution order: explicit argument > ``MCAN_COMPILE_CACHE`` env var >
    ``~/.cache/mcan_vqa_tpu/xla``. A value in {"off", "none", "0",
    "disable", "disabled"} (any case) disables the cache and leaves JAX
    config untouched. Returns the directory in use, or None if disabled.

    Safe to call more than once (last call wins) and safe on any backend:
    entries are keyed by compiler/device, so CPU tests and TPU runs share
    a directory without collisions.
    """
    if cache_dir is None:
        cache_dir = os.environ.get("MCAN_COMPILE_CACHE") or default_cache_dir()
    if cache_dir.strip().lower() in _OFF:
        return None
    import jax

    cache_dir = os.path.abspath(os.path.expanduser(cache_dir))
    os.makedirs(cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs",
                      float(min_compile_secs))
    return cache_dir
