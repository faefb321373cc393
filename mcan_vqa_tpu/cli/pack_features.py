"""One-shot feature packing: per-image .npz dumps -> packed fp16 memmap cache.

The TPU input path serves features from the packed cache (zero-copy memmap
slices) instead of opening 400k+ tiny npz files per epoch
(reference hot path: core/data/load_data.py:113-118). Run once per split:

    python -m mcan_vqa_tpu.cli.pack_features --split train --split val \
        --feature_path ./datasets/coco_extract \
        --cache_path ./datasets/feature_cache
"""

from __future__ import annotations

import argparse
import os

from mcan_vqa_tpu.data.features import PackedFeatureCache

_SPLIT_DIRS = {"train": "train2014", "val": "val2014", "test": "test2015"}


def main(argv=None) -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--split", action="append", required=True,
                   choices=list(_SPLIT_DIRS))
    p.add_argument("--feature_path", default="./datasets/coco_extract")
    p.add_argument("--cache_path", default="./datasets/feature_cache")
    p.add_argument("--feat_dim", type=int, default=2048)
    args = p.parse_args(argv)

    missing = 0
    for split in args.split:
        src = os.path.join(args.feature_path, _SPLIT_DIRS[split])
        dst = os.path.join(args.cache_path, split)
        if not os.path.isdir(src):
            # the split was explicitly requested: a typo'd --feature_path
            # must fail the command, not "skip" with exit 0 and let a
            # chained setup script proceed to a much later failure
            print(f"skip {split}: {src} not found")
            missing += 1
            continue
        print(f"packing {split}: {src} -> {dst}")
        cache = PackedFeatureCache.build(src, dst, feat_dim=args.feat_dim)
        rows = sum(n for _, n in cache.index.values())
        print(f"  {len(cache.index)} images, {rows} rows, fp16")
    return 1 if missing else 0


if __name__ == "__main__":
    raise SystemExit(main())
