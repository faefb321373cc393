"""Three-tier configuration: dataclass defaults <- YAML model file <- CLI args.

Mirrors the knob names and defaults of the reference config
(reference: cfgs/base_cfgs.py:15-239, cfgs/small_model.yml, cfgs/large_model.yml)
so a user of the reference can bring their YAML/CLI flags unchanged, but is a
clean dataclass design: derived values are computed in ``finalize()`` instead
of mutating an attribute bag in place.
"""

from __future__ import annotations

import dataclasses
import os
import random
from dataclasses import dataclass, field
from typing import Any, Dict, List, Optional

import numpy as np
import yaml


@dataclass
class Config:
    # ---- version / run control (reference: cfgs/base_cfgs.py:19-45) ----
    seed: int = 444
    version: str = ""                 # defaults to str(seed) in finalize()
    run_mode: str = "train"           # {'train','val','test','visualize'}
    resume: bool = False
    ckpt_version: str = ""
    ckpt_epoch: int = 0
    ckpt_path: str = ""               # explicit checkpoint file; overrides version/epoch
    verbose: bool = True

    # ---- data provider (reference: cfgs/base_cfgs.py:50-113) ----
    eval_every_epoch: bool = True
    test_save_pred: bool = False
    preload: bool = False
    train_split: str = "train+val+vg"
    use_glove: bool = True
    word_embed_size: int = 300
    max_token: int = 14
    img_feat_pad_size: int = 60
    img_feat_size: int = 2048
    batch_size: int = 64
    num_workers: int = 4
    grad_accu_steps: int = 1

    # ---- network (reference: cfgs/base_cfgs.py:116-141) ----
    layer: int = 6
    hidden_size: int = 512
    multi_head: int = 8
    dropout_rate: float = 0.1
    flat_mlp_size: int = 512
    flat_glimpses: int = 1
    flat_out_size: int = 1024

    # ---- optimizer (reference: cfgs/base_cfgs.py:144-165) ----
    lr_base: float = 1e-4
    lr_decay_rate: float = 0.2
    lr_decay_list: List[int] = field(default_factory=lambda: [8, 12])
    max_epoch: int = 13
    grad_norm_clip: float = -1.0
    # per-parameter grad-norm bookkeeping (reference accumulates these every
    # step, core/exec.py:108-109,199-202): 0 = off; K > 0 computes a pytree
    # of per-leaf L2 grad norms in-step, accumulates host-side, and writes
    # the sums to the JSONL log every K steps and at each epoch end.
    grad_norm_log_every: int = 0
    # AdamW betas/eps. The reference config declares (0.9, 0.98)/1e-9 but
    # never passes them to AdamW (commented out at core/model/optim.py:61-62),
    # so the zoo checkpoints were trained with torch defaults — which are the
    # live defaults here. Unlike the reference, setting these DOES take
    # effect (train/optim.py reads them).
    opt_betas: tuple = (0.9, 0.999)
    opt_eps: float = 1e-8
    weight_decay: float = 1e-4        # reference: core/model/optim.py:63
    # dtype for Adam's first moment (optax mu_dtype); "" keeps fp32.
    # "bfloat16" halves the moment's HBM traffic per step (TPU knob).
    opt_mu_dtype: str = ""

    # ---- MIMIC / classifier extras (reference: run_mimic.py:21-136) ----
    reg_factor: float = 0.0
    eval_interval: int = 1000
    mutan_gamma: int = 2
    # image-feature source for MIMIC: "regions" (60 bbox region rows, the
    # reference's live path), "anatomy" (the 26 pooled anatomical-finding
    # rows from ana_pool_finding_path — the hook the reference kept dormant,
    # core/data/load_data.py:175-179 + the commented swap at :250), or
    # "both" (regions then anatomy rows concatenated; set img_feat_pad_size
    # large enough to keep both, e.g. 86)
    mimic_feat_source: str = "regions"

    # ---- TPU-native knobs (new; no reference analogue) ----
    compute_dtype: str = "bfloat16"   # matmul compute dtype; params stay fp32
    mesh_shape: Dict[str, int] = field(default_factory=lambda: {"data": 1, "model": 1})
    donate_buffers: bool = True
    use_remat: bool = False          # rematerialize SA/SGA blocks (memory)
    attention_packing: bool = False  # sample-pack attention to fill MXU tiles
    fused_qkv: bool = False          # one [D,3D] qkv projection per block
    keep_last_ckpts: int = 0         # prune old per-epoch ckpts (0 = keep all)
    ckpt_async: bool = False         # write per-epoch ckpts on a background
                                     # thread (device snapshot first, so the
                                     # donated train step can't race it);
                                     # the chip trains through the fetch+write
    debug_nans: bool = False
    eval_strict: bool = False        # fail (not just warn) when predictions
                                     # don't cover every ground-truth qid
    # dropout PRNG implementation: "rbg" (XLA RngBitGenerator, TPU-native;
    # threefry dropout measured 42% of the MCAN-small train step) or
    # "threefry" (jax default; jax-version-stable mask sequences)
    dropout_rng_impl: str = "rbg"
    # random bits drawn per dropout keep decision: 32 (default —
    # jax.random.bernoulli, exact reference rate), 16, or 8. Measured on
    # TPU v5e at MCAN-small B=256: 32 -> 49.0 ms/step, 16 -> 58.6, 8 ->
    # 57.3 — the narrow-int bitcast/compare costs MORE than the saved
    # RngBitGenerator work, so sub-32-bit masks stay opt-in (they matter
    # only as the uint8 input format of the fused train kernels, where the
    # select runs in-kernel). See ops/dropout.py.
    dropout_bits: int = 32
    # eval engine: "auto" (fused serving engine on single-TPU, model.apply
    # elsewhere) or "plain" (always model.apply)
    eval_engine: str = "auto"
    # end-of-train serving calibration: after the final epoch the Trainer
    # calibrates static int8 activation scales on the last REAL training
    # batch and stores them next to the final checkpoint
    # (epoch<N>.act_scales.json). Predictor.from_checkpoint auto-loads the
    # side file and ships the calibrated level-3 engine — measured +13.9%
    # serving at MCAN-small / +16% at MCAN-large over the dynamic-quant
    # default (docs/PERFORMANCE.md) — with no per-process calibration
    # ritual. Costs one extra jit of the calibration replay at train end.
    ckpt_calibrate: bool = True
    # train engine: "auto" (custom-VJP fused SGA decoder + fused SA
    # encoder blocks, in-kernel TPU-PRNG dropout + in-kernel dW
    # accumulation — measured 35.9 vs 48.9 ms/step at MCAN-small B=256,
    # +36% over XLA autodiff), "fused" (force; on CPU runs the kernels in
    # interpret mode — test-only), or "plain" (always model.apply autodiff)
    train_engine: str = "auto"
    # stacked-native train parameter layout (ops/stacked_params.py):
    # params live as [L, ...] per-role stacks for the duration of
    # training — no per-step qkv concat/split, optimizer over ~54 leaves
    # instead of ~260. MEASURED NEGATIVE on-chip (r5 interleaved
    # medians: -0.9% small B=256, -4.3% large B=64 — the removed concat
    # copies were never material at ~37 MB/step ≈ 0.05 ms, while pallas
    # operands sliced from [L, ...] stacks get re-materialized as
    # contiguous copies anyway, plus scatter-shaped grad writes), so
    # "auto" resolves OFF. "on" forces it (the parity/round-trip gates
    # in tests/test_stacked_params.py keep it correct for future
    # exploration); "off" forces off.
    stacked_params: str = "auto"
    profile_dir: str = ""             # if set, jax.profiler traces go here

    # ---- paths (reference: cfgs/path_cfgs.py) ----
    dataset_path: str = "./datasets/vqa/"
    feature_path: str = "./datasets/coco_extract/"
    feature_cache_path: str = "./datasets/feature_cache/"   # packed-shard cache (new)
    cxr_data_path: str = "./datasets/mimic/mimic_"
    cxr_img_feat_path: str = "./datasets/mimic/cmb_bbox_features_full.hdf5"
    ana_pool_finding_path: str = "./datasets/mimic/bbox_disease_features_by_coords.hdf5"
    result_path: str = "./results/result_test/"
    pred_path: str = "./results/pred/"
    cache_path: str = "./results/cache/"
    log_path: str = "./results/log/"
    ckpts_dir: str = "./ckpts/"
    vocab_cache_path: str = "./results/cache/vocab.npz"     # cached (token_to_ix, emb)

    # ---- derived (filled by finalize(); do not set directly) ----
    ff_size: int = 0
    hidden_size_head: int = 0
    sub_batch_size: int = 0
    eval_batch_size: int = 0

    # ------------------------------------------------------------------
    def finalize(self) -> "Config":
        """Validate and compute derived values (reference: cfgs/base_cfgs.py:183-239)."""
        assert self.run_mode in ("train", "val", "test", "visualize",
                                 "parity"), self.run_mode
        assert self.batch_size % self.grad_accu_steps == 0, (
            f"batch_size {self.batch_size} must divide by grad_accu_steps "
            f"{self.grad_accu_steps}")
        assert self.hidden_size % self.multi_head == 0, (
            f"hidden_size {self.hidden_size} must divide by multi_head "
            f"{self.multi_head}")
        assert self.train_engine in ("auto", "fused", "plain"), \
            self.train_engine
        # bools tolerated for programmatic Config(stacked_params=True/False)
        assert self.stacked_params in ("auto", "on", "off", True, False), (
            f"stacked_params must be 'auto'/'on'/'off', "
            f"got {self.stacked_params!r}")

        if not self.version:
            self.version = str(self.seed)
        if not self.ckpt_version:
            self.ckpt_version = self.version

        self.ff_size = self.hidden_size * 4
        self.hidden_size_head = self.hidden_size // self.multi_head
        self.sub_batch_size = self.batch_size // self.grad_accu_steps
        self.eval_batch_size = self.sub_batch_size

        # Host-side seeding (device-side randomness uses jax.random keys
        # derived from self.seed; there is no global device RNG to seed).
        np.random.seed(self.seed)
        random.seed(self.seed)
        return self

    # Reference knobs with no TPU analogue: accepted (so reference YAMLs
    # load unchanged) but ignored with a notice. gpu/pin_mem are CUDA
    # plumbing; shuffle_mode 'external' was never implemented upstream.
    _LEGACY_IGNORED = ("gpu", "pin_mem", "shuffle_mode", "split")

    # ------------------------------------------------------------------
    def merge_dict(self, d: Dict[str, Any]) -> "Config":
        """Overlay a dict of overrides (YAML tier or CLI tier)."""
        names = {f.name for f in dataclasses.fields(self)}
        for k, v in d.items():
            k = k.lower()
            if k in self._LEGACY_IGNORED:
                print(f"config: ignoring legacy reference knob {k!r}")
                continue
            if k not in names:
                raise KeyError(f"unknown config key: {k!r}")
            if v is not None:
                setattr(self, k, v)
        return self

    @classmethod
    def from_yaml(cls, path: str, overrides: Optional[Dict[str, Any]] = None) -> "Config":
        cfg = cls()
        with open(path) as f:
            y = yaml.safe_load(f) or {}
        cfg.merge_dict(y)
        if overrides:
            cfg.merge_dict(overrides)
        return cfg.finalize()

    def to_dict(self) -> Dict[str, Any]:
        return dataclasses.asdict(self)

    # ---- path tables (reference: cfgs/path_cfgs.py:22-77) ----
    @property
    def img_feat_path(self) -> Dict[str, str]:
        return {
            "train": os.path.join(self.feature_path, "train2014/"),
            "val": os.path.join(self.feature_path, "val2014/"),
            "test": os.path.join(self.feature_path, "test2015/"),
        }

    @property
    def question_path(self) -> Dict[str, str]:
        return {
            "train": os.path.join(self.dataset_path, "v2_OpenEnded_mscoco_train2014_questions.json"),
            "val": os.path.join(self.dataset_path, "v2_OpenEnded_mscoco_val2014_questions.json"),
            "test": os.path.join(self.dataset_path, "v2_OpenEnded_mscoco_test2015_questions.json"),
            "vg": os.path.join(self.dataset_path, "VG_questions.json"),
        }

    @property
    def answer_path(self) -> Dict[str, str]:
        return {
            "train": os.path.join(self.dataset_path, "v2_mscoco_train2014_annotations.json"),
            "val": os.path.join(self.dataset_path, "v2_mscoco_val2014_annotations.json"),
            "vg": os.path.join(self.dataset_path, "VG_annotations.json"),
        }

    @property
    def mimic_qa_path(self) -> Dict[str, str]:
        return {
            "train": self.cxr_data_path + "dataset_train_full.pkl",
            "val": self.cxr_data_path + "dataset_val_full.pkl",
            "test": self.cxr_data_path + "dataset_test_full.pkl",
        }

    @property
    def mimic_ans_dict_path(self) -> Dict[str, str]:
        return {
            "ans2idx": self.cxr_data_path + "ans2label_full.pkl",
            "idx2ans": self.cxr_data_path + "label2ans_full.pkl",
        }

    def init_result_dirs(self) -> None:
        for p in (self.result_path, self.pred_path, self.cache_path,
                  self.log_path, self.ckpts_dir):
            os.makedirs(p, exist_ok=True)

    def check_vqa_paths(self) -> List[str]:
        """Return missing required VQA-v2 paths (reference: cfgs/path_cfgs.py:79-97)."""
        missing = []
        for table in (self.img_feat_path, self.question_path, self.answer_path):
            for p in table.values():
                if not os.path.exists(p):
                    missing.append(p)
        return missing

    def check_mimic_paths(self) -> List[str]:
        missing = []
        if not os.path.exists(self.cxr_img_feat_path):
            missing.append(self.cxr_img_feat_path)
        for p in self.mimic_qa_path.values():
            if not os.path.exists(p):
                missing.append(p)
        if getattr(self, "mimic_feat_source", "regions") != "regions":
            # "anatomy"/"both" make the pooled-finding bank REQUIRED —
            # the preflight must say so instead of passing and letting
            # the dataset load fail later
            ana = getattr(self, "ana_pool_finding_path", "")
            if not (ana and os.path.exists(ana)):
                missing.append(ana or "ana_pool_finding_path (unset)")
        return missing
