"""MIMIC medical-VQA CLI — the reference's run_mimic.py surface
(reference: run_mimic.py:21-176): same knobs as run_vqa plus --reg_factor,
--eval_interval, --mutan_gamma; runs train -> val -> test sequentially and
supports warm-starting from a VQA checkpoint (reference: core/exec.py:474).

wandb sweeps are intentionally not wired (zero-egress training hosts); the
RunLogger text log carries the same per-epoch metrics.
"""

from __future__ import annotations

import argparse
import os
import sys

from mcan_vqa_tpu.cli import cli_bool
from mcan_vqa_tpu.configs import Config

_YAML_DIR = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "configs")


def parse_args(argv=None) -> argparse.Namespace:
    p = argparse.ArgumentParser(description="MIMIC medical VQA on TPU")
    p.add_argument("--run", dest="run_mode", required=True,
                   choices=["train", "val", "test"])
    p.add_argument("--model", default="small", choices=["small", "large"])
    p.add_argument("--batch_size", type=int)
    p.add_argument("--max_epoch", type=int)
    p.add_argument("--lr_base", type=float)
    p.add_argument("--layer", type=int)
    p.add_argument("--seed", type=int)
    p.add_argument("--version", type=str)
    p.add_argument("--resume", type=cli_bool)
    p.add_argument("--ckpt_version", type=str)
    p.add_argument("--ckpt_epoch", type=int)
    p.add_argument("--ckpt_path", type=str)
    p.add_argument("--grad_accu", dest="grad_accu_steps", type=int)
    p.add_argument("--ckpt_async", type=cli_bool)
    p.add_argument("--reg_factor", type=float)
    p.add_argument("--eval_interval", type=int)
    p.add_argument("--mutan_gamma", type=int)
    p.add_argument("--img_feat_size", type=int)
    p.add_argument("--warm_start", type=str,
                   help="VQA checkpoint to warm-start from")
    p.add_argument("--train_eval_every", type=int, default=2,
                   help="ROC-eval the TRAIN split every N epochs during "
                        "training (reference: core/exec.py:664-679 scores "
                        "the train split on even epochs, the test split "
                        "every epoch); 0 disables the train-split eval")
    p.add_argument("--synthetic", action="store_true")
    p.add_argument("--synthetic_size", type=int, default=256)
    # architecture / env overrides (YAML tier normally sets these)
    for knob in ("hidden_size", "multi_head", "img_feat_pad_size",
                 "flat_out_size", "flat_mlp_size", "max_token"):
        p.add_argument(f"--{knob}", type=int)
    p.add_argument("--compute_dtype", type=str)
    p.add_argument("--train_engine", choices=["auto", "fused", "plain"])
    p.add_argument("--eval_engine", choices=["auto", "fused", "plain"])
    p.add_argument("--verbose", type=cli_bool)
    p.add_argument("--ckpts_dir", type=str)
    p.add_argument("--log_path", type=str)
    p.add_argument("--result_path", type=str)
    p.add_argument("--compile_cache", type=str,
                   help="persistent XLA compilation cache dir (default "
                        "~/.cache/mcan_vqa_tpu/xla; 'off' disables)")
    return p.parse_args(argv)


def main(argv=None) -> int:
    args = parse_args(argv)
    from mcan_vqa_tpu.utils.compile_cache import enable as enable_cache
    enable_cache(args.compile_cache)
    yaml_path = os.path.join(_YAML_DIR, f"{args.model}.yml")
    overrides = {k: v for k, v in vars(args).items()
                 if v is not None and k not in
                 ("model", "synthetic", "synthetic_size", "warm_start",
                  "compile_cache", "train_eval_every")}
    # MIMIC features are 1024-d (reference: core/data/load_data.py:168)
    overrides.setdefault("img_feat_size", 1024)
    cfg = Config.from_yaml(yaml_path, overrides)
    cfg.init_result_dirs()

    from mcan_vqa_tpu.train.trainer import Trainer

    if args.synthetic:
        from mcan_vqa_tpu.data.mimic import SyntheticMIMICDataset
        mk = lambda mode, size: SyntheticMIMICDataset(
            cfg, size=size, run_mode=mode)
        train_ds = mk("train", args.synthetic_size)
        val_ds = mk("val", max(64, args.synthetic_size // 4))
        test_ds = mk("test", max(64, args.synthetic_size // 4))
    else:
        missing = cfg.check_mimic_paths()
        if missing:
            print("missing MIMIC paths:\n  " + "\n  ".join(missing),
                  file=sys.stderr)
            return 1
        from mcan_vqa_tpu.data.mimic import MIMICDataset
        train_ds = MIMICDataset(cfg, "train") if cfg.run_mode == "train" else None
        # every split shares ONE train-derived vocab (see MIMICDataset);
        # passing it forward avoids re-running spaCy + the vocab build
        # per split
        shared = ((train_ds.token_to_ix, train_ds.pretrained_emb)
                  if train_ds else None)
        val_ds = MIMICDataset(cfg, "val", vocab=shared)
        test_ds = MIMICDataset(
            cfg, "test", vocab=(val_ds.token_to_ix, val_ds.pretrained_emb))

    if cfg.run_mode == "train":
        eval_datasets = {"val": val_ds, "test": test_ds}
        eval_cadence = {}
        if args.train_eval_every > 0:
            # reference cadence (core/exec.py:664-679): train-split ROC
            # on epochs 0, N, 2N... alongside the every-epoch test eval
            eval_datasets = {"train": train_ds, **eval_datasets}
            eval_cadence["train"] = args.train_eval_every
        trainer = Trainer(cfg, train_dataset=train_ds,
                          eval_datasets=eval_datasets
                          if cfg.eval_every_epoch else {},
                          eval_cadence=eval_cadence)
        if args.warm_start:
            trainer.warm_start(args.warm_start)
        trainer.train()
        # reference runs train -> val -> test sequentially (run_mimic.py:172-176)
        print("val:", trainer.evaluate(val_ds))
        print("test:", trainer.evaluate(test_ds))
    else:
        ds = val_ds if cfg.run_mode == "val" else test_ds
        trainer = Trainer(cfg, eval_datasets={cfg.run_mode: ds})
        trainer.ensure_state(resume=True)
        print(f"{cfg.run_mode}:", trainer.evaluate(ds))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
