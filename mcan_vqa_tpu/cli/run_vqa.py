"""VQA-v2 CLI — the reference's run.py surface rebuilt
(reference: run.py:18-148): --run={train,val,test,visualize,parity}
--model={small,large} plus version/resume/checkpoint/batch knobs,
three-tier config merge (CLI > YAML > defaults).

Extra: --synthetic runs the full pipeline on generated data (no datasets
required) — smoke-tests the stack on any host.
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
    p = argparse.ArgumentParser(description="MCAN-VQA on TPU")
    p.add_argument("--run", dest="run_mode", required=True,
                   choices=["train", "val", "test", "visualize", "parity"],
                   help="parity: the one-command real-data parity drill "
                        "(docs/ACCURACY.md runbook) — load a checkpoint "
                        "(--ckpt_path zoo .pkl or --ckpt_version/"
                        "--ckpt_epoch), score the val split with the "
                        "official evaluator, then dump the test-dev "
                        "EvalAI result file")
    p.add_argument("--model", default="small", choices=["small", "large"])
    p.add_argument("--split", dest="train_split",
                   choices=["train", "train+val", "train+val+vg"])
    p.add_argument("--eval_ee", dest="eval_every_epoch", type=cli_bool)
    p.add_argument("--save_pred", dest="test_save_pred", type=cli_bool)
    p.add_argument("--batch_size", type=int)
    p.add_argument("--max_epoch", type=int)
    p.add_argument("--preload", type=cli_bool)
    p.add_argument("--gpu", help="accepted for CLI compatibility; ignored "
                                 "(device selection is via mesh_shape)")
    p.add_argument("--seed", type=int)
    p.add_argument("--version", type=str)
    p.add_argument("--resume", type=cli_bool)
    p.add_argument("--ckpt_version", dest="ckpt_version", type=str)
    p.add_argument("--ckpt_epoch", dest="ckpt_epoch", type=int)
    p.add_argument("--ckpt_path", dest="ckpt_path", type=str)
    p.add_argument("--grad_accu", dest="grad_accu_steps", type=int)
    p.add_argument("--ckpt_async", type=cli_bool,
                   help="write per-epoch checkpoints on a background "
                        "thread (the chip trains through the fetch+write)")
    p.add_argument("--num_workers", type=int)
    p.add_argument("--verbose", type=cli_bool)
    p.add_argument("--synthetic", action="store_true",
                   help="run on generated data (no dataset files needed)")
    p.add_argument("--synthetic_size", type=int, default=512)
    p.add_argument("--use_pallas", action="store_true")
    # architecture overrides (YAML tier normally sets these)
    for knob in ("hidden_size", "layer", "multi_head", "img_feat_size",
                 "img_feat_pad_size", "flat_out_size", "flat_mlp_size",
                 "max_token"):
        p.add_argument(f"--{knob}", type=int)
    p.add_argument("--lr_base", type=float)
    p.add_argument("--lr_decay_list", type=lambda s: [
        int(x) for x in s.split(",") if x.strip()],
        help='comma-separated decay epochs (reference lr_decay_list); '
             '"" disables decay')
    p.add_argument("--compute_dtype", type=str)
    p.add_argument("--train_engine", choices=["auto", "fused", "plain"],
                   help="training engine: auto (fused Pallas blocks on "
                        "single-TPU, see docs/PERFORMANCE.md), fused, plain")
    p.add_argument("--eval_engine", choices=["auto", "fused", "plain"])
    p.add_argument("--ckpts_dir", type=str)
    p.add_argument("--log_path", type=str)
    p.add_argument("--result_path", type=str)
    # dataset locations (default ./datasets layout, setup.sh) — exposed
    # so a data-equipped host can point one command at its copies
    # (the parity drill needs no other wiring)
    p.add_argument("--dataset_path", type=str)
    p.add_argument("--feature_path", type=str)
    p.add_argument("--feature_cache_path", type=str)
    p.add_argument("--vocab_cache_path", type=str)
    p.add_argument("--pred_path", type=str)
    p.add_argument("--compile_cache", type=str,
                   help="persistent XLA compilation cache dir (default "
                        "~/.cache/mcan_vqa_tpu/xla; 'off' disables) — "
                        "restarted runs skip the minutes-long TPU compile")
    p.add_argument("--images_dir", type=str, default=None,
                   help="--run=visualize: directory with the original COCO "
                        "photos (flat or train2014/val2014/test2015 "
                        "subdirs); renders the attended-box mask over the "
                        "real image (reference core/exec.py:1082-1106) "
                        "instead of the white-canvas fallback")
    return p.parse_args(argv)


def build_config(args: argparse.Namespace) -> Config:
    yaml_path = os.path.join(_YAML_DIR, f"{args.model}.yml")
    overrides = {k: v for k, v in vars(args).items()
                 if v is not None and k not in
                 ("model", "synthetic", "synthetic_size", "use_pallas", "gpu",
                  "compile_cache", "images_dir")}
    return Config.from_yaml(yaml_path, overrides)


def main(argv=None) -> int:
    args = parse_args(argv)
    from mcan_vqa_tpu.utils.compile_cache import enable as enable_cache
    enable_cache(args.compile_cache)
    cfg = build_config(args)
    cfg.init_result_dirs()

    from mcan_vqa_tpu.train.trainer import Trainer

    if args.synthetic:
        from mcan_vqa_tpu.data.vqa_dataset import SyntheticVQADataset
        train_ds = SyntheticVQADataset(cfg, size=args.synthetic_size,
                                       run_mode="train")
        # run_mode stays "train" so examples carry targets -> ROC is computed
        val_ds = SyntheticVQADataset(cfg, size=max(64, args.synthetic_size // 4),
                                     run_mode="train", seed=1)
        datasets = {"train": train_ds, "val": val_ds}
    else:
        missing = cfg.check_vqa_paths()
        if missing:
            print("missing dataset paths:\n  " + "\n  ".join(missing),
                  file=sys.stderr)
            return 1
        from mcan_vqa_tpu.data.vqa_dataset import VQADataset
        # build only the splits this run mode touches: the val dataset
        # costs minutes of startup (the ~2 GB annotations JSON + vocab
        # pass), which --run=test never uses
        datasets = {"train": VQADataset(cfg, "train")
                    if cfg.run_mode == "train" else None}
        if cfg.run_mode in ("train", "val", "parity", "visualize"):
            datasets["val"] = VQADataset(cfg, "val")
        if cfg.run_mode in ("test", "parity"):
            datasets["test"] = VQADataset(cfg, "test")

    if cfg.run_mode == "train":
        trainer = Trainer(cfg, train_dataset=datasets["train"],
                          eval_datasets={"val": datasets["val"]}
                          if cfg.eval_every_epoch else {},
                          use_pallas=args.use_pallas)
        trainer.train()
        res = trainer.evaluate(datasets["val"])
        print("final val:", res)
    elif cfg.run_mode in ("val", "test"):
        ds = datasets.get(cfg.run_mode) or datasets["val"]
        trainer = Trainer(cfg, eval_datasets={cfg.run_mode: ds},
                          use_pallas=args.use_pallas)
        trainer.ensure_state(resume=True)
        dump = os.path.join(cfg.result_path,
                            f"result_run_{cfg.version}.json")
        res = trainer.evaluate(ds, dump_path=dump)
        print(f"{cfg.run_mode}:", res)
    elif cfg.run_mode == "parity":
        # The one-command parity drill (docs/ACCURACY.md "Reproducing
        # 70.70"): checkpoint in -> official val accuracy -> test-dev
        # EvalAI dump, zero archaeology on a data-equipped host.
        # Reference sequence it compresses: run.py --RUN=val then
        # --RUN=test (/root/reference/README.md:198-220).
        trainer = Trainer(cfg, eval_datasets={"val": datasets["val"]},
                          use_pallas=args.use_pallas)
        trainer.ensure_state(resume=True)
        val_dump = os.path.join(cfg.result_path,
                                f"result_run_{cfg.version}_val.json")
        res = trainer.evaluate(datasets["val"], dump_path=val_dump)
        print(f"parity val: {res}")
        if res.get("accuracy") is not None:
            print(f"parity val accuracy (official evaluator): "
                  f"{res['accuracy']:.2f}  "
                  f"(reference MCAN-small val ~67, test-dev 70.70)")
        test_ds = datasets.get("test") or datasets["val"]
        test_dump = os.path.join(cfg.result_path,
                                 f"result_run_{cfg.version}_testdev.json")
        trainer.evaluate(test_ds, dump_path=test_dump)
        print(f"parity test-dev EvalAI dump: {test_dump}")
        print("submit the dump to EvalAI test-dev to complete the "
              "70.70 check (docs/ACCURACY.md)")
    elif cfg.run_mode == "visualize":
        from mcan_vqa_tpu.utils.visualize import run_visualization
        ds = datasets["val"]
        trainer = Trainer(cfg, eval_datasets={"val": ds},
                          use_pallas=args.use_pallas)
        trainer.ensure_state(resume=True)
        out_dir = os.path.join(cfg.result_path, "val_imgs")
        n = run_visualization(trainer, ds, out_dir, limit=8,
                              images_dir=args.images_dir)
        print(f"wrote {n} visualizations to {out_dir}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
