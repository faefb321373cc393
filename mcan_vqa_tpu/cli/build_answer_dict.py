"""Offline answer-dictionary builder CLI (reference: utils/proc_ansdict.py).

Builds {answer: index} over train+val annotations keeping answers that occur
more than --min_freq times, and writes the two-dict JSON the dataset loads.
The published 3129-answer dict ships with the package; this tool exists to
regenerate it (or build dicts for new corpora).
"""

from __future__ import annotations

import argparse
import json

from mcan_vqa_tpu.configs import Config
from mcan_vqa_tpu.data.answers import build_answer_dict


def main(argv=None) -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--dataset_path", default="./datasets/vqa/")
    p.add_argument("--min_freq", type=int, default=8)
    p.add_argument("--out", default="answer_dict.json")
    args = p.parse_args(argv)

    cfg = Config(dataset_path=args.dataset_path).finalize()
    anns = []
    for split in ("train", "val"):
        with open(cfg.answer_path[split]) as f:
            anns += json.load(f)["annotations"]
    ans_to_ix, ix_to_ans = build_answer_dict(anns, min_freq=args.min_freq)
    with open(args.out, "w") as f:
        json.dump([ans_to_ix, ix_to_ans], f)
    print(f"wrote {len(ans_to_ix)} answers to {args.out}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
