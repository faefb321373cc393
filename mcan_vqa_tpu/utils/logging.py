"""Run logging: plain-text logfile + console progress.

Mirrors the reference's observability surface (reference:
core/exec.py:132-140, 216-235): a ``log_run_<version>.txt`` file seeded with
the full config dump, then one line per epoch with loss/lr/metrics; live
step-rate console lines replace tqdm.
"""

from __future__ import annotations

import json
import os
import time
from typing import Any, Dict, Optional


class RunLogger:
    def __init__(self, log_dir: str, version: str, cfg_dict: Optional[Dict] = None,
                 echo: bool = True, fresh: bool = False):
        """fresh=True truncates an existing log (the reference's empty_log on
        a fresh training run, core/exec.py empty_log)."""
        os.makedirs(log_dir, exist_ok=True)
        self.path = os.path.join(log_dir, f"log_run_{version}.txt")
        self.echo = echo
        if fresh:
            self.clear()
        with open(self.path, "a") as f:
            f.write(f"NOW TIME: {time.strftime('%Y-%m-%d %H:%M:%S')}\n")
            if cfg_dict is not None:
                f.write(json.dumps(cfg_dict, default=str) + "\n")

    def clear(self) -> None:
        """Remove this version's log + JSONL mirror (the reference's
        empty_log, core/exec.py). The Trainer calls this on a FRESH
        (non-resume) training run alongside clearing the checkpoint dir
        — otherwise the new run's epoch records append after the old
        run's and duplicate epoch keys break JSONL consumers. Kept
        separate from __init__'s ``fresh`` because an eval-only Trainer
        constructs a logger too and must never wipe the train log."""
        for p in (self.path, self.path.replace(".txt", ".jsonl")):
            if os.path.exists(p):
                os.remove(p)

    def write(self, line: str) -> None:
        with open(self.path, "a") as f:
            f.write(line.rstrip("\n") + "\n")
        if self.echo:
            print(line, flush=True)

    def jsonl(self, obj: Dict[str, Any]) -> None:
        """Append one machine-readable record to the JSONL mirror (used for
        the per-parameter grad-norm diagnostics, reference bookkeeping:
        core/exec.py:199-202)."""
        with open(self.path.replace(".txt", ".jsonl"), "a") as f:
            f.write(json.dumps(obj, default=str) + "\n")

    def epoch(self, epoch: int, metrics: Dict[str, Any]) -> None:
        parts = ", ".join(f"{k}={v:.6g}" if isinstance(v, float) else f"{k}={v}"
                          for k, v in metrics.items())
        self.write(f"epoch {epoch}: {parts}")
        # machine-readable mirror (one JSON object per epoch); numeric
        # values coerce to float so numpy scalars serialize as numbers,
        # not default=str strings
        self.jsonl({"epoch": epoch, **{
            k: (float(v) if isinstance(v, (int, float)) else v)
            for k, v in metrics.items()}})


class StepMeter:
    """Console step-rate meter (tqdm stand-in that is log-file friendly)."""

    def __init__(self, total: int, print_every: int = 50, enabled: bool = True):
        self.total = total
        self.print_every = print_every
        self.enabled = enabled
        self.t0 = time.perf_counter()
        self.n = 0

    def update(self, metrics: Optional[Dict[str, Any]] = None) -> None:
        self.n += 1
        if not self.enabled or self.n % self.print_every:
            return
        dt = time.perf_counter() - self.t0
        rate = self.n / dt if dt > 0 else 0.0
        extra = ""
        if metrics:
            extra = " " + " ".join(
                f"{k}={float(v):.4g}" for k, v in metrics.items())
        print(f"  step {self.n}/{self.total} ({rate:.1f} it/s){extra}",
              flush=True)
