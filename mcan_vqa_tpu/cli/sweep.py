"""Local hyperparameter grid sweep (the reference's wandb sweep, rebuilt
offline: run_mimic.py:153-167 sweeps layer x lr_base on a grid).

Runs each grid point sequentially in-process, one version name per point,
and writes a summary JSON — no external tracking service (training hosts are
egress-free); per-run logs land in the usual RunLogger files.
"""

from __future__ import annotations

import argparse
import itertools
import json
import os
from typing import Any, Dict, List


def parse_args(argv=None):
    p = argparse.ArgumentParser(description="grid sweep over layer x lr_base")
    p.add_argument("--task", default="vqa", choices=["vqa", "mimic"])
    p.add_argument("--layers", type=int, nargs="+", default=[4, 6])
    p.add_argument("--lrs", type=float, nargs="+", default=[1e-4, 5e-5])
    p.add_argument("--out", default="./results/sweep_summary.json")
    # everything unrecognized is forwarded to the task CLI
    args, rest = p.parse_known_args(argv)
    args.base_args = [a for a in rest if a != "--"]
    return args


def main(argv=None) -> int:
    args = parse_args(argv)
    if args.task == "vqa":
        from mcan_vqa_tpu.cli.run_vqa import main as task_main
    else:
        from mcan_vqa_tpu.cli.run_mimic import main as task_main

    base = args.base_args
    summary: List[Dict[str, Any]] = []
    for layer, lr in itertools.product(args.layers, args.lrs):
        version = f"sweep_l{layer}_lr{lr:g}"
        argv_run = base + [f"--layer={layer}", f"--lr_base={lr}",
                           f"--version={version}"]
        print(f"=== sweep point layer={layer} lr={lr:g} ===", flush=True)
        rc = task_main(argv_run)
        summary.append({"layer": layer, "lr_base": lr, "version": version,
                        "returncode": rc})
    os.makedirs(os.path.dirname(args.out) or ".", exist_ok=True)
    with open(args.out, "w") as f:
        json.dump(summary, f, indent=1)
    print(f"sweep summary -> {args.out}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
