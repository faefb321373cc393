"""Image-only multi-label classification CLI — the reference's ExecClassify
flow (reference: core/exec.py:757-1066): ClassifierNet over MIMIC image
features, 14/15-way CheXpert-style labels, SmoothL1 regularization option,
periodic in-epoch eval every --eval_interval steps.
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
    p = argparse.ArgumentParser(description="MCAN image classifier on TPU")
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
    p.add_argument("--reg_factor", type=float)
    p.add_argument("--ckpt_async", type=cli_bool)
    p.add_argument("--eval_interval", type=int)
    p.add_argument("--img_feat_size", type=int)
    p.add_argument("--synthetic", action="store_true")
    p.add_argument("--synthetic_size", type=int, default=256)
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
                 ("model", "synthetic", "synthetic_size", "compile_cache")}
    overrides.setdefault("img_feat_size", 1024)
    cfg = Config.from_yaml(yaml_path, overrides)
    cfg.init_result_dirs()

    from mcan_vqa_tpu.train.trainer import Trainer

    if args.synthetic:
        from mcan_vqa_tpu.data.mimic import SyntheticMIMICDataset
        train_ds = SyntheticMIMICDataset(cfg, size=args.synthetic_size,
                                         answer_size=14, run_mode="train")
        val_ds = SyntheticMIMICDataset(cfg, size=max(48, args.synthetic_size // 4),
                                       answer_size=14, run_mode="val", seed=1)
    else:
        missing = cfg.check_mimic_paths()
        if missing:
            print("missing MIMIC paths:\n  " + "\n  ".join(missing),
                  file=sys.stderr)
            return 1
        from mcan_vqa_tpu.data.mimic import MIMICDataset
        train_ds = MIMICDataset(cfg, "train") if cfg.run_mode == "train" else None
        # one train-derived vocab shared across splits (see MIMICDataset)
        val_ds = MIMICDataset(
            cfg, "val",
            vocab=((train_ds.token_to_ix, train_ds.pretrained_emb)
                   if train_ds else None))

    if cfg.run_mode == "train":
        trainer = Trainer(cfg, train_dataset=train_ds,
                          eval_datasets={"val": val_ds}
                          if cfg.eval_every_epoch else {}, task="classify")
        trainer.train()
        print("val:", trainer.evaluate(val_ds))
    else:
        trainer = Trainer(cfg, eval_datasets={cfg.run_mode: val_ds},
                          task="classify")
        trainer.ensure_state(resume=True)
        print(f"{cfg.run_mode}:", trainer.evaluate(val_ds))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
