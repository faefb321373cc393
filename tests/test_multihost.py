"""Multi-host data loading: per-process slices of the global batch.

Simulates a 2-host pod inside one process by instantiating one BatchLoader
per (process_index, process_count) and checking that the per-host row blocks
reassemble the single-process global batch exactly — the invariant
jax.make_array_from_process_local_data relies on (host i contributes rows
[i*per, (i+1)*per) of every global batch).

The reference's analogue is DataParallel's per-GPU scatter inside one
process (reference: core/exec.py:62-63); here the split happens at the
loader so no host ever materializes another host's rows.
"""

import numpy as np

from mcan_vqa_tpu.configs import Config
from mcan_vqa_tpu.data.pipeline import BatchLoader
from mcan_vqa_tpu.data.vqa_dataset import SyntheticVQADataset


def _ds(n=50, seed_cfg=None):
    cfg = seed_cfg or Config(
        img_feat_size=8, img_feat_pad_size=6, max_token=5, hidden_size=16,
        batch_size=16, use_glove=False).finalize()
    return SyntheticVQADataset(cfg, size=n, run_mode="train")


def _collect(loader):
    return [ {k: np.asarray(v) for k, v in b.items()} for b in loader ]


class TestProcessSlicing:
    def test_train_batches_reassemble(self):
        ds = _ds(64)
        kw = dict(batch_size=16, shuffle=True, drop_last=True, seed=7,
                  num_workers=2)
        g = _collect(BatchLoader(ds, **kw))
        h0 = _collect(BatchLoader(ds, **kw, process_index=0, process_count=2))
        h1 = _collect(BatchLoader(ds, **kw, process_index=1, process_count=2))
        assert len(g) == len(h0) == len(h1) == 4
        for bg, b0, b1 in zip(g, h0, h1):
            for k in ("img", "ques", "target", "qid"):
                np.testing.assert_array_equal(
                    bg[k], np.concatenate([b0[k], b1[k]]), err_msg=k)
            assert b0["img"].shape[0] == 8  # half the global batch each

    def test_eval_partial_final_batch_reassembles(self):
        """50 examples, batch 16 -> final batch has 2 valid rows. The global
        pad happens BEFORE host slicing, so both hosts see 8 rows and the
        valid masks reassemble the 50 originals in order."""
        ds = _ds(50)
        kw = dict(batch_size=16, shuffle=False, drop_last=False, seed=1,
                  num_workers=2, pad_final=True)
        g = _collect(BatchLoader(ds, **kw))
        h0 = _collect(BatchLoader(ds, **kw, process_index=0, process_count=2))
        h1 = _collect(BatchLoader(ds, **kw, process_index=1, process_count=2))
        assert len(g) == len(h0) == len(h1) == 4

        qids_global, qids_hosts = [], []
        for bg, b0, b1 in zip(g, h0, h1):
            # fixed shapes on every host, every batch
            assert b0["img"].shape[0] == b1["img"].shape[0] == 8
            np.testing.assert_array_equal(
                bg["valid"], np.concatenate([b0["valid"], b1["valid"]]))
            np.testing.assert_array_equal(
                bg["img"], np.concatenate([b0["img"], b1["img"]]))
            qids_global += list(bg["qid"][bg["valid"]])
            qids_hosts += list(np.concatenate(
                [b0["qid"][b0["valid"]], b1["qid"][b1["valid"]]]))
            # n_valid counts locally-valid rows
            assert int(b0["n_valid"]) == int(b0["valid"].sum())
            assert int(b1["n_valid"]) == int(b1["valid"].sum())
        assert qids_global == qids_hosts == list(range(50))

    def test_final_batch_entirely_on_first_host(self):
        """17 examples, batch 16, 2 hosts: the last global batch has 1 valid
        row -> host0 gets it, host1 gets only padding (valid all-False) but
        the SAME fixed shape, so jit never recompiles and collectives stay
        aligned."""
        ds = _ds(17)
        kw = dict(batch_size=16, shuffle=False, drop_last=False, seed=1,
                  num_workers=1, pad_final=True)
        h0 = _collect(BatchLoader(ds, **kw, process_index=0, process_count=2))
        h1 = _collect(BatchLoader(ds, **kw, process_index=1, process_count=2))
        assert h0[-1]["valid"].tolist() == [True] + [False] * 7
        assert h1[-1]["valid"].tolist() == [False] * 8
        assert h1[-1]["img"].shape == h0[-1]["img"].shape

    def test_multihost_requires_even_split_policy(self):
        import pytest
        ds = _ds(20)
        with pytest.raises(AssertionError):
            BatchLoader(ds, batch_size=16, shuffle=False, drop_last=False,
                        pad_final=False, process_index=0, process_count=2)


class TestTrainerWiring:
    def test_trainer_passes_process_identity(self):
        """Trainer hands jax.process_index/count to every loader it builds."""
        import jax
        from mcan_vqa_tpu.train.trainer import Trainer
        cfg = Config(img_feat_size=8, img_feat_pad_size=6, max_token=5,
                     hidden_size=16, layer=1, multi_head=2, flat_mlp_size=8,
                     flat_out_size=16, batch_size=16, use_glove=False,
                     compute_dtype="float32", verbose=False).finalize()
        ds = _ds(32, cfg)
        trainer = Trainer(cfg, train_dataset=ds)
        kw = trainer._process_kwargs()
        assert kw == {"process_index": jax.process_index(),
                      "process_count": jax.process_count()}
