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
    os.makedirs(os.path.dirname(args.out) or ".", exist_ok=True)
    summary: List[Dict[str, Any]] = []

    def flush():
        # incremental: one crashed grid point must not discard the
        # completed points' records (hours of training each)
        with open(args.out, "w") as f:
            json.dump(summary, f, indent=1)

    failed = 0
    for layer, lr in itertools.product(args.layers, args.lrs):
        version = f"sweep_l{layer}_lr{lr:g}"
        argv_run = base + [f"--layer={layer}", f"--lr_base={lr}",
                           f"--version={version}"]
        print(f"=== sweep point layer={layer} lr={lr:g} ===", flush=True)
        rec = {"layer": layer, "lr_base": lr, "version": version}
        try:
            rec["returncode"] = task_main(argv_run)
        except SystemExit as e:  # argparse rejects a forwarded flag
            rec["returncode"] = int(e.code or 0)
            rec["error"] = "SystemExit (bad forwarded flag?)"
        except Exception as e:  # noqa: BLE001 — record, keep sweeping
            rec["returncode"] = 1
            rec["error"] = f"{type(e).__name__}: {e}"
            print(f"sweep point {version} FAILED: {rec['error']}",
                  flush=True)
        if rec.get("error") or rec["returncode"]:
            failed += 1
        summary.append(rec)
        flush()
    print(f"sweep summary -> {args.out} "
          f"({len(summary) - failed}/{len(summary)} points ok)")
    return 1 if failed else 0


if __name__ == "__main__":
    raise SystemExit(main())
