"""Native C++ batch assembler: build, correctness vs numpy, edge cases, and
the end-to-end VQADataset batch path over a packed cache."""

import json
import os

import numpy as np
import pytest

from mcan_vqa_tpu.data import native_batcher
from mcan_vqa_tpu.data.features import PackedFeatureCache


@pytest.fixture(scope="module")
def packed(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("npz")
    rng = np.random.default_rng(0)
    raw = {}
    for iid in range(6):
        n = int(rng.integers(2, 9))
        feat = rng.normal(size=(16, n)).astype(np.float32)
        np.savez(tmp / f"COCO_train2014_{iid:012d}.jpg.npz", x=feat)
        raw[str(iid)] = feat.T
    cache = PackedFeatureCache.build(
        str(tmp), str(tmp_path_factory.mktemp("cache")), feat_dim=16,
        log_every=0)
    return cache, raw


class TestNativeBatcher:
    def test_toolchain_builds(self):
        assert native_batcher.available(), (
            f"native build failed: {native_batcher._build_error}")

    def test_gather_matches_numpy(self, packed):
        cache, raw = packed
        iids = ["0", "3", "5", "1"]
        out = cache.gather_pad_batch(iids, pad_size=10)
        assert out.shape == (4, 10, 16) and out.dtype == np.float32
        for i, iid in enumerate(iids):
            n = raw[iid].shape[0]
            np.testing.assert_allclose(
                out[i, :n], raw[iid].astype(np.float16).astype(np.float32))
            assert (out[i, n:] == 0).all()

    def test_bf16_gather_matches_fp32(self, packed):
        """The bf16 emission path: same gather/pad, values equal to the
        fp32 path rounded to bf16 (round-to-nearest-even), half the
        bytes."""
        import ml_dtypes
        cache, raw = packed
        iids = ["2", "4", "0"]
        f32 = cache.gather_pad_batch(iids, pad_size=10)
        b16 = cache.gather_pad_batch(iids, pad_size=10, dtype="bfloat16")
        assert b16.dtype == ml_dtypes.bfloat16
        assert b16.shape == f32.shape
        assert b16.itemsize == 2
        np.testing.assert_array_equal(
            np.asarray(b16), f32.astype(ml_dtypes.bfloat16))
        # padding rows are exactly zero
        for i, iid in enumerate(iids):
            n = raw[iid].shape[0]
            assert (np.asarray(b16[i, n:]).astype(np.float32) == 0).all()

    def test_truncates_long_items(self, packed):
        cache, raw = packed
        longest = max(raw, key=lambda k: raw[k].shape[0])
        out = cache.gather_pad_batch([longest], pad_size=2)
        np.testing.assert_allclose(
            out[0], raw[longest][:2].astype(np.float16).astype(np.float32))

    def test_fp16_specials(self, tmp_path):
        """Subnormals, inf, nan, and zero all widen correctly."""
        if not native_batcher.available():
            pytest.skip("no toolchain")
        vals = np.array([0.0, -0.0, 1.0, -2.5, 6.1e-5, 5.96e-8,  # subnormal
                         np.inf, -np.inf, np.nan, 65504.0],
                        np.float16)
        dim = vals.size
        mm = np.memmap(tmp_path / "features.bin", dtype=np.float16, mode="w+",
                       shape=(1, dim))
        mm[0] = vals
        mm.flush()
        from mcan_vqa_tpu.data.native_batcher import NativeBatcher
        nb = NativeBatcher(str(tmp_path / "features.bin"), 1, dim)
        out = nb.gather_pad(np.array([0], np.uint64),
                            np.array([1], np.uint32), 1)
        np.testing.assert_array_equal(
            np.isnan(out[0, 0]), np.isnan(vals.astype(np.float32)))
        m = ~np.isnan(vals.astype(np.float32))
        np.testing.assert_array_equal(out[0, 0][m],
                                      vals.astype(np.float32)[m])
        nb.close()

    def test_bf16_nan_preserved(self, tmp_path):
        """The bf16 emission path must keep NaN a NaN: the naive
        round-to-nearest-even add carries a NaN mantissa into the
        exponent and emits +-Inf (which then propagates through matmuls
        as huge FINITE garbage instead of surfacing)."""
        if not native_batcher.available():
            pytest.skip("no toolchain")
        import ml_dtypes
        vals = np.array([np.nan, -np.nan, np.inf, -np.inf, 1.0, 0.0],
                        np.float16)
        dim = vals.size
        mm = np.memmap(tmp_path / "features.bin", dtype=np.float16,
                       mode="w+", shape=(1, dim))
        mm[0] = vals
        mm.flush()
        from mcan_vqa_tpu.data.native_batcher import NativeBatcher
        nb = NativeBatcher(str(tmp_path / "features.bin"), 1, dim)
        out = np.asarray(nb.gather_pad_bf16(
            np.array([0], np.uint64), np.array([1], np.uint32), 1))
        ref = vals.astype(np.float32).astype(ml_dtypes.bfloat16)
        np.testing.assert_array_equal(np.isnan(out[0, 0]), np.isnan(ref))
        m = ~np.isnan(ref)
        np.testing.assert_array_equal(out[0, 0][m], ref[m])
        nb.close()

    def test_oob_index_clamped(self, packed):
        """An index inconsistent with features.bin (stale index.json,
        mixed builds) must not read past the mmap: the numpy path raises
        a Python error, the native path would SIGBUS the process — it
        clamps to the mapped rows instead."""
        cache, _ = packed
        nb = cache.native_batcher()
        if nb is None:
            pytest.skip("no toolchain")
        rows = cache._mm.shape[0]
        starts = np.array([rows - 1, rows + 10], np.uint64)
        lens = np.array([5, 3], np.uint32)   # both run past the end
        out = nb.gather_pad(starts, lens, 8)
        assert out.shape == (2, 8, 16)
        np.testing.assert_allclose(
            out[0, 0], np.asarray(cache._mm[rows - 1], np.float32))
        assert (out[0, 1:] == 0).all()       # clamped to the last row
        assert (out[1] == 0).all()           # fully out of range -> zeros

    def test_large_parallel_batch(self, packed):
        cache, raw = packed
        iids = [str(i % 6) for i in range(256)]
        out = cache.gather_pad_batch(iids, pad_size=12)
        assert out.shape == (256, 12, 16)
        n0 = raw["0"].shape[0]
        np.testing.assert_allclose(
            out[0, :n0], raw["0"].astype(np.float16).astype(np.float32))
        np.testing.assert_allclose(out[0], out[6])  # same iid -> same rows


class TestDatasetBatchPath:
    def test_vqa_dataset_batch_examples(self, tmp_path, packed):
        cache, raw = packed
        # minimal VQA-v2 file layout over the packed cache
        ds_dir = tmp_path / "vqa"; ds_dir.mkdir()
        questions = {"questions": [
            {"question_id": 100 + i, "image_id": i,
             "question": f"what is thing {i}?"} for i in range(6)]}
        anns = {"annotations": [
            {"question_id": 100 + i, "image_id": i,
             "answers": [{"answer": "yes"}] * 10,
             "question_type": "what", "answer_type": "other"}
            for i in range(6)]}
        for name in ("train2014", "val2014", "test2015"):
            (ds_dir / f"v2_OpenEnded_mscoco_{name}_questions.json").write_text(
                json.dumps(questions))
        (ds_dir / "VG_questions.json").write_text(json.dumps(questions))
        for name in ("train2014", "val2014"):
            (ds_dir / f"v2_mscoco_{name}_annotations.json").write_text(
                json.dumps(anns))
        (ds_dir / "VG_annotations.json").write_text(json.dumps(anns))

        from mcan_vqa_tpu.configs import Config
        cfg = Config(dataset_path=str(ds_dir) + "/",
                     feature_cache_path=os.path.dirname(cache.cache_dir),
                     img_feat_pad_size=10, img_feat_size=16, max_token=6,
                     train_split="train", use_glove=False,
                     vocab_cache_path=str(tmp_path / "vocab.npz"),
                     run_mode="train").finalize()
        # point the packed cache dir at the split name the dataset expects
        os.symlink(cache.cache_dir,
                   os.path.join(os.path.dirname(cache.cache_dir), "train"))

        from mcan_vqa_tpu.data.vqa_dataset import VQADataset
        ds = VQADataset(cfg, "train")
        batch = ds.batch_examples(np.arange(4))
        assert batch["img"].shape == (4, 10, 16)
        assert batch["ques"].shape == (4, 6)
        assert batch["target"].shape[1] == 3129
        # parity with the per-example path
        ex = ds.example(2)
        np.testing.assert_allclose(batch["img"][2], ex["img"], rtol=1e-3)
        np.testing.assert_array_equal(batch["ques"][2], ex["ques"])

        # the serving loader's bf16 request flows through to the native
        # bf16 gather (BatchLoader(feat_dtype=...) -> batch_examples)
        import ml_dtypes
        from mcan_vqa_tpu.data.pipeline import BatchLoader
        b16 = ds.batch_examples(np.arange(4), feat_dtype="bfloat16")
        assert b16["img"].dtype == ml_dtypes.bfloat16
        np.testing.assert_array_equal(
            np.asarray(b16["img"]),
            batch["img"].astype(ml_dtypes.bfloat16))
        loader = BatchLoader(ds, 4, shuffle=False, drop_last=False,
                             num_workers=1, feat_dtype="bfloat16")
        lb = next(iter(loader))
        assert np.asarray(lb["img"]).dtype == ml_dtypes.bfloat16
