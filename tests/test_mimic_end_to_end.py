"""MIMIC real-format end-to-end: HDF5 feature bank + answer-dict pickles +
QA-split pickles -> MIMICDataset -> Trainer -> ROC-AUC. Mirrors the reference
data layout (core/data/load_data.py:157-264) at miniature scale."""

import os
import pickle

import numpy as np
import pytest

from mcan_vqa_tpu.configs import Config

N_IMG = 48
N_LABELS = 6
FEAT_DIM = 16
N_REGIONS = 10
N_ANATOMY = 4   # pooled anatomical-finding rows (26 at full scale)


@pytest.fixture(scope="module")
def mimic_env(tmp_path_factory):
    h5py = pytest.importorskip("h5py")
    root = tmp_path_factory.mktemp("mimic_e2e")
    rng = np.random.default_rng(0)

    # feature bank: label l -> signature in feature column l
    feats = rng.normal(0, 0.1, size=(N_IMG, N_REGIONS, FEAT_DIM)).astype(
        np.float32)
    labels = [sorted({int(i % N_LABELS), int((i * 7) % N_LABELS)})
              for i in range(N_IMG)]
    for i, ls in enumerate(labels):
        for l in ls:
            feats[i, :, l] += 4.0
    bank = root / "cmb_bbox_features_full.hdf5"
    with h5py.File(bank, "w") as f:
        f.create_dataset("image_features", data=feats)
        f.create_dataset("image_bb",
                         data=rng.uniform(0, 1, (N_IMG, N_REGIONS, 4)))
        f.create_dataset("spatial_features",
                         data=rng.uniform(0, 1, (N_IMG, N_REGIONS, 6)))

    # pooled anatomy bank (reference: bbox_disease_features_by_coords.hdf5,
    # core/data/load_data.py:175-179); rows carry a distinct marker value
    ana = root / "bbox_disease_features_by_coords.hdf5"
    ana_feats = np.full((N_IMG, N_ANATOMY, FEAT_DIM), 9.0, np.float32)
    with h5py.File(ana, "w") as f:
        f.create_dataset("image_features", data=ana_feats)

    ans2idx = {f"finding{l}": l for l in range(N_LABELS)}
    idx2ans = {l: f"finding{l}" for l in range(N_LABELS)}
    prefix = str(root / "mimic_")
    with open(prefix + "ans2label_full.pkl", "wb") as f:
        pickle.dump(ans2idx, f)
    with open(prefix + "label2ans_full.pkl", "wb") as f:
        pickle.dump(idx2ans, f)

    def qa_split(indices):
        return [{"question": "what findings are present in this image?",
                 "image": int(i), "answer": {"labels": labels[i]}}
                for i in indices]

    with open(prefix + "dataset_train_full.pkl", "wb") as f:
        pickle.dump(qa_split(range(0, 40)), f)
    with open(prefix + "dataset_val_full.pkl", "wb") as f:
        pickle.dump(qa_split(range(40, 48)), f)
    with open(prefix + "dataset_test_full.pkl", "wb") as f:
        pickle.dump(qa_split(range(40, 48)), f)

    cfg = Config(
        cxr_data_path=prefix, cxr_img_feat_path=str(bank),
        ana_pool_finding_path=str(ana),
        img_feat_size=FEAT_DIM, img_feat_pad_size=N_REGIONS, max_token=8,
        hidden_size=32, layer=1, multi_head=4, flat_out_size=32,
        flat_mlp_size=16, batch_size=8, lr_base=3e-3, max_epoch=40,
        use_glove=False, num_workers=2, eval_every_epoch=False,
        verbose=False, compute_dtype="float32", lr_decay_list=[],
        keep_last_ckpts=1,
        ckpts_dir=str(root / "ckpts"), log_path=str(root / "log"),
        result_path=str(root / "results"), pred_path=str(root / "pred"),
        cache_path=str(root / "cache"),
    ).finalize()
    return root, cfg, labels


class TestMIMICRealFormat:
    def test_dataset_semantics(self, mimic_env):
        from mcan_vqa_tpu.data.mimic import MIMICDataset
        _, cfg, labels = mimic_env
        ds = MIMICDataset(cfg, "train")
        assert len(ds) == 40               # no test-split leakage into train
        assert ds.ans_size == N_LABELS
        ex = ds.example(0)
        assert ex["img"].shape == (N_REGIONS, FEAT_DIM)
        np.testing.assert_array_equal(
            np.nonzero(ex["target"])[0], labels[0])
        # train aug: ~30% region rows zeroed, rest L2-normalized
        row_norms = np.linalg.norm(ex["img"], axis=1)
        assert (row_norms == 0).sum() == int(N_REGIONS * 0.3)
        np.testing.assert_allclose(row_norms[row_norms > 0], 1.0, atol=1e-5)

    def test_val_has_no_augmentation(self, mimic_env):
        from mcan_vqa_tpu.data.mimic import MIMICDataset
        _, cfg, _ = mimic_env
        ds = MIMICDataset(cfg, "val")
        ex = ds.example(0)
        assert (np.linalg.norm(ex["img"], axis=1) > 0).all()

    def test_anatomy_feature_source(self, mimic_env):
        """cfg.mimic_feat_source switches the model input to the pooled
        anatomical-finding rows (reference hook: load_data.py:175-179,250)."""
        import dataclasses
        from mcan_vqa_tpu.data.mimic import MIMICDataset
        _, cfg, _ = mimic_env

        ds = MIMICDataset(cfg, "val")
        np.testing.assert_array_equal(ds.anatomy_features(0),
                                      np.full((N_ANATOMY, FEAT_DIM), 9.0))

        cfg_a = dataclasses.replace(cfg, mimic_feat_source="anatomy",
                                    img_feat_pad_size=N_ANATOMY)
        ex = MIMICDataset(cfg_a, "val").example(0)
        assert ex["img"].shape == (N_ANATOMY, FEAT_DIM)
        np.testing.assert_array_equal(ex["img"], 9.0)

        cfg_b = dataclasses.replace(
            cfg, mimic_feat_source="both",
            img_feat_pad_size=N_REGIONS + N_ANATOMY)
        ex = MIMICDataset(cfg_b, "val").example(0)
        assert ex["img"].shape == (N_REGIONS + N_ANATOMY, FEAT_DIM)
        np.testing.assert_array_equal(ex["img"][N_REGIONS:], 9.0)
        assert not np.all(ex["img"][:N_REGIONS] == 9.0)

        # train augmentation applies to the selected source too
        ex = MIMICDataset(cfg_a, "train").example(0)
        norms = np.linalg.norm(ex["img"], axis=1)
        assert (norms == 0).sum() == int(N_ANATOMY * 0.3)

    def test_anatomy_source_requires_bank(self, mimic_env, tmp_path):
        import dataclasses
        from mcan_vqa_tpu.data.mimic import MIMICDataset
        _, cfg, _ = mimic_env
        bad = dataclasses.replace(cfg, mimic_feat_source="anatomy",
                                  ana_pool_finding_path=str(tmp_path / "x"))
        with pytest.raises(FileNotFoundError):
            MIMICDataset(bad, "val")

    def test_splits_share_train_vocab(self, mimic_env):
        """Every split encodes questions with the TRAIN-derived vocab:
        per-split vocabs (the reference's behavior, load_data.py:216)
        give token ix 5 a different meaning in val than in the train
        vocab the embedding rows were built on — scrambled eval inputs.
        An explicitly passed vocab wins (the CLI shares one build)."""
        from mcan_vqa_tpu.data.mimic import MIMICDataset
        _, cfg, _ = mimic_env
        train_ds = MIMICDataset(cfg, "train")
        val_ds = MIMICDataset(cfg, "val")
        assert val_ds.token_to_ix == train_ds.token_to_ix
        np.testing.assert_array_equal(val_ds.pretrained_emb,
                                      train_ds.pretrained_emb)
        shared = MIMICDataset(cfg, "test",
                              vocab=(train_ds.token_to_ix,
                                     train_ds.pretrained_emb))
        assert shared.token_to_ix is train_ds.token_to_ix

    def test_train_and_roc(self, mimic_env):
        from mcan_vqa_tpu.data.mimic import MIMICDataset
        from mcan_vqa_tpu.train.trainer import Trainer
        _, cfg, _ = mimic_env
        train_ds = MIMICDataset(cfg, "train")
        val_ds = MIMICDataset(cfg, "val")
        trainer = Trainer(cfg, train_dataset=train_ds)
        trainer.train()
        res = trainer.evaluate(val_ds)
        assert res["roc_macro"] > 0.9, res

    def test_fused_engine_with_reg(self, mimic_env):
        """MIMIC VQA flow through the fused train engine: the L1+L2
        regularization penalty (reference core/exec.py:598-607) composes
        with the custom-VJP fused blocks."""
        import dataclasses

        from mcan_vqa_tpu.data.mimic import MIMICDataset
        from mcan_vqa_tpu.train.trainer import Trainer
        _, cfg, _ = mimic_env
        cfg = dataclasses.replace(cfg, train_engine="fused",
                                  reg_factor=1e-4, max_epoch=1,
                                  version=f"{cfg.version}_fused")
        ds = MIMICDataset(cfg, "train")
        trainer = Trainer(cfg, train_dataset=ds)
        assert trainer._use_fused_train()
        state = trainer.train()
        assert int(state.step) > 0
        log = open(f"{cfg.log_path}/log_run_{cfg.version}.txt").read()
        assert "train engine: fused SGA blocks" in log
        assert "loss=nan" not in log
