"""Parity vs the REAL reference at PRODUCTION MCAN-small dimensions.

Round-1 parity (tests/test_reference_parity.py) pins hidden=64 / layer=2 /
heads=4 / short sequences; a transposition or padding bug that only
manifests at the trained sizes (hidden 512, 6 layers, 8 heads, L_q=14,
L_v=60, 3129 answers — /root/reference/cfgs/base_cfgs.py:116-141 +
cfgs/small_model.yml) would slip through.  This module closes that gap:

  * forward probabilities at full size (reference Net2 as oracle)
  * 3 SGD steps, EVERY parameter elementwise (linear updates keep
    softmax-invariant null directions at zero on both sides)
  * export->reference ``Net2.load_state_dict(strict=True)``->reimport
    round-trip, byte-compared (reference: core/exec.py:241-253)

One full-size oracle is built per module (it is the expensive part); every
test reuses its initial state_dict.
"""

import os
import sys

import jax
import numpy as np
import pytest

REFERENCE = "/root/reference"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(os.path.join(REFERENCE, "core")),
    reason="reference mount not available")

# Production MCAN-small (reference cfgs/base_cfgs.py:83,90,93,116-141 +
# cfgs/small_model.yml:8-13). Vocab size is corpus-dependent in the
# reference (insertion order over question files); 3000 exercises the same
# embedding code path without the full GloVe matrix.
HIDDEN, LAYER, HEADS = 512, 6, 8
IMG_FEAT, L_V, L_Q = 2048, 60, 14
FLAT_MLP, FLAT_OUT, GLIMPSES = 512, 1024, 1
TOKEN_SIZE, ANSWER_SIZE = 3000, 3129
BATCH = 4


@pytest.fixture(scope="module")
def oracle():
    """(refnet module, full-size Net2, frozen initial state_dict)."""
    import torch
    sys.path.insert(0, REFERENCE)
    try:
        import core.model.net as refnet  # noqa: PLC0415
    finally:
        sys.path.remove(REFERENCE)
    import types
    opt = types.SimpleNamespace(
        hidden_size=HIDDEN, multi_head=HEADS,
        hidden_size_head=HIDDEN // HEADS, layer=LAYER,
        img_feat_size=IMG_FEAT, flat_mlp_size=FLAT_MLP,
        flat_glimpses=GLIMPSES, flat_out_size=FLAT_OUT,
        word_embed_size=300, dropout_rate=0.0, use_glove=False,
        ff_size=HIDDEN * 4)
    torch.manual_seed(1234)
    net = refnet.Net2(opt, None, TOKEN_SIZE, ANSWER_SIZE)
    init = {k: v.clone() for k, v in net.state_dict().items()}
    return refnet, net, init


@pytest.fixture(scope="module")
def batch():
    """Realistic padding patterns: variable region counts (zero rows exactly
    where the reference's make_mask looks, net.py:379-381), questions with
    trailing PAD."""
    rng = np.random.default_rng(99)
    img = rng.normal(size=(BATCH, L_V, IMG_FEAT)).astype(np.float32)
    for b, n_regions in enumerate((60, 37, 12, 53)):
        img[b, n_regions:] = 0.0
    ques = rng.integers(1, TOKEN_SIZE, size=(BATCH, L_Q)).astype(np.int64)
    for b, n_tok in enumerate((14, 6, 3, 10)):
        ques[b, n_tok:] = 0
    target = (rng.random((BATCH, ANSWER_SIZE)) < 0.003).astype(np.float32)
    return img, ques, target


def _our_model():
    from mcan_vqa_tpu.configs import Config
    from mcan_vqa_tpu.models.net import build_mcan
    cfg = Config(hidden_size=HIDDEN, multi_head=HEADS, layer=LAYER,
                 img_feat_size=IMG_FEAT, img_feat_pad_size=L_V,
                 max_token=L_Q, flat_mlp_size=FLAT_MLP,
                 flat_glimpses=GLIMPSES, flat_out_size=FLAT_OUT,
                 dropout_rate=0.0, compute_dtype="float32",
                 batch_size=BATCH, use_glove=False).finalize()
    return build_mcan(cfg, TOKEN_SIZE, ANSWER_SIZE)


class TestFullSizeForward:
    def test_logits_match(self, oracle, batch):
        import torch
        from mcan_vqa_tpu.train.checkpoint import import_torch_state_dict

        refnet, net, init = oracle
        net.load_state_dict(init)
        net.eval()
        img, ques, _ = batch
        with torch.no_grad():
            ref_probs = net(torch.from_numpy(img),
                            torch.from_numpy(ques))[0].numpy()

        model = _our_model()
        params = import_torch_state_dict(init)
        out = model.apply({"params": params}, img, ques.astype(np.int32))
        ours = np.asarray(jax.nn.sigmoid(out["logits"]))

        # 512-wide fp32 accumulations across 12 attention blocks: allow a
        # slightly looser tolerance than the toy-dims test (2e-5 there).
        np.testing.assert_allclose(ours, ref_probs, atol=5e-5)
        # and the decision itself is identical
        np.testing.assert_array_equal(ours.argmax(1), ref_probs.argmax(1))


class TestFullSizeTraining:
    def test_sgd_steps_match_full_tree(self, oracle, batch):
        import optax
        import torch
        from mcan_vqa_tpu.train.checkpoint import (flatten_params,
                                                   import_torch_state_dict)
        from mcan_vqa_tpu.train.step import make_train_step
        from mcan_vqa_tpu.train.train_state import TrainState

        refnet, net, init = oracle
        net.load_state_dict(init)
        net.train()
        img, ques, target = batch
        lr = 1e-4
        t_optim = torch.optim.SGD(net.parameters(), lr=lr)
        t_loss_fn = torch.nn.BCELoss(reduction="sum")

        model = _our_model()
        params = import_torch_state_dict(init)
        tx = optax.sgd(lr)
        state = TrainState.create(params, tx, seed=0)
        step = jax.jit(make_train_step(model, tx))
        jb = {"img": img, "ques": ques.astype(np.int32), "target": target}

        for _ in range(3):
            t_optim.zero_grad()
            probs = net(torch.from_numpy(img), torch.from_numpy(ques))[0]
            loss = t_loss_fn(probs, torch.from_numpy(target))
            loss.backward()
            t_optim.step()
            state, metrics = step(state, jb)

        assert abs(float(metrics["loss"]) - float(loss)) / float(loss) < 1e-4
        ours_flat = flatten_params(jax.device_get(state.params))
        ref_flat = flatten_params(import_torch_state_dict(net.state_dict()))
        assert set(ours_flat) == set(ref_flat)
        for k in ours_flat:
            a, b = ours_flat[k], ref_flat[k]
            scale = max(np.abs(b).max(), 1e-3)
            np.testing.assert_allclose(a / scale, b / scale, atol=5e-5,
                                       err_msg=str(k))


class TestFullSizeCheckpointRoundTrip:
    def test_export_loads_strict_and_survives_roundtrip(self, oracle):
        """Our export must satisfy the REAL reference model's strict loader,
        and import(export(p)) must be bitwise p (the transforms are pure
        transposes/reshapes — no tolerance)."""
        import torch
        from mcan_vqa_tpu.train.checkpoint import (export_torch_state_dict,
                                                   flatten_params,
                                                   import_torch_state_dict)

        refnet, net, init = oracle
        params = import_torch_state_dict(init)
        sd = export_torch_state_dict(params)

        # strict load into the actual reference network
        net.load_state_dict({k: torch.from_numpy(np.asarray(v))
                             for k, v in sd.items()}, strict=True)

        # the loaded oracle now carries exactly the original tensors
        for k, v0 in init.items():
            np.testing.assert_array_equal(
                net.state_dict()[k].numpy(), v0.numpy(), err_msg=k)

        # bitwise pytree round-trip
        back = flatten_params(import_torch_state_dict(net.state_dict()))
        orig = flatten_params(params)
        assert set(back) == set(orig)
        for k in orig:
            np.testing.assert_array_equal(back[k], orig[k], err_msg=str(k))

    def test_pickle_file_roundtrip_full_size(self, oracle, tmp_path):
        """export_torch_checkpoint -> import_torch_checkpoint at full size
        (the reference's on-disk {'state_dict','optimizer','lr_base'} pickle,
        core/exec.py:241-253)."""
        from mcan_vqa_tpu.train.checkpoint import (export_torch_checkpoint,
                                                   flatten_params,
                                                   import_torch_checkpoint,
                                                   import_torch_state_dict)
        _, _, init = oracle
        params = import_torch_state_dict(init)
        p = str(tmp_path / "full_size.pkl")
        export_torch_checkpoint(params, p, lr_base=5e-5)
        back, extra = import_torch_checkpoint(p)
        assert extra.get("lr_base") == pytest.approx(5e-5)
        a, b = flatten_params(params), flatten_params(back)
        assert set(a) == set(b)
        for k in a:
            np.testing.assert_array_equal(a[k], b[k], err_msg=str(k))


class TestFullSizeBF16Stream:
    def test_bf16_stream_logit_delta_vs_oracle(self, oracle):
        """Full-size (512/6/8/3129) serving engine with the bf16 residual
        stream vs the torch oracle: bounded logit delta, identical top-1.
        This is the full-size half of the bf16-stream accuracy gate
        (tests/test_bf16_stream.py covers trained real-format data)."""
        import torch

        from mcan_vqa_tpu.ops.serving import make_serving_fn, prepare_params
        from mcan_vqa_tpu.train.checkpoint import import_torch_state_dict

        refnet, net, init = oracle
        net.load_state_dict(init)
        net.eval()

        B = 32
        rng = np.random.default_rng(7)
        img = rng.normal(size=(B, L_V, IMG_FEAT)).astype(np.float32)
        ques = rng.integers(1, TOKEN_SIZE, size=(B, L_Q)).astype(np.int64)
        for b in range(B):
            img[b, int(rng.integers(8, L_V + 1)):] = 0.0
            ques[b, int(rng.integers(3, L_Q + 1)):] = 0

        with torch.no_grad():
            ref_probs = net(torch.from_numpy(img),
                            torch.from_numpy(ques))[0].numpy()

        params = import_torch_state_dict(init)
        sp = prepare_params(params, LAYER, num_heads=HEADS)
        serve32 = make_serving_fn(LAYER, HEADS, use_pallas=False,
                                  bf16_stream=False)
        serve16 = make_serving_fn(LAYER, HEADS, use_pallas=False,
                                  bf16_stream=True)
        l32 = np.asarray(serve32(sp, img, ques.astype(np.int32)))
        l16 = np.asarray(serve16(sp, img, ques.astype(np.int32)))

        p32 = 1.0 / (1.0 + np.exp(-l32.astype(np.float64)))
        p16 = 1.0 / (1.0 + np.exp(-l16.astype(np.float64)))
        rel = np.abs(l16 - l32).max() / np.abs(l32).max()
        agree_t = float((l16.argmax(1) == ref_probs.argmax(1)).mean())
        print(f"\nfull-size bf16 stream: rel_logit_delta={rel:.5f} "
              f"max_prob_delta_vs_torch={np.abs(p16 - ref_probs).max():.6f} "
              f"top1_agreement_vs_torch={agree_t:.3f}")

        # The serving engine computes matmuls in bf16 by design (the TPU
        # production path; LN/softmax stay fp32) — measured ~3e-3 prob
        # delta vs the fp32 torch oracle at full size with EITHER stream.
        # The stream itself adds <2x on top of that.
        assert np.abs(p32 - ref_probs).max() < 0.01
        assert np.abs(p16 - ref_probs).max() < 0.015
        np.testing.assert_array_equal(l32.argmax(1), ref_probs.argmax(1))
        # bf16 stream: bounded perturbation, no decision flips
        assert rel < 0.02, rel
        assert agree_t == 1.0
        np.testing.assert_array_equal(l16.argmax(1), l32.argmax(1))


class TestFullSizeQffn:
    @pytest.mark.parametrize("level", [1, 2])
    def test_qffn_logit_delta_vs_oracle(self, oracle, level):
        """Full-size (512/6/8/3129) mixed int8-FFN megakernel engine
        (ops/quant.py qffn, interpret mode) vs the torch oracle: bounded
        prob delta, identical top-1. level=2 adds the qkv-int8 set the
        auto rule ships at D >= 1024. The full-size half of the qffn
        gate (tests/test_quant.py covers trained real-format data)."""
        import torch

        from mcan_vqa_tpu.ops.serving import make_serving_fn, prepare_params
        from mcan_vqa_tpu.train.checkpoint import import_torch_state_dict

        refnet, net, init = oracle
        net.load_state_dict(init)
        net.eval()

        B = 8
        rng = np.random.default_rng(11)
        img = rng.normal(size=(B, L_V, IMG_FEAT)).astype(np.float32)
        ques = rng.integers(1, TOKEN_SIZE, size=(B, L_Q)).astype(np.int64)
        for b in range(B):
            img[b, int(rng.integers(8, L_V + 1)):] = 0.0
            ques[b, int(rng.integers(3, L_Q + 1)):] = 0

        with torch.no_grad():
            ref_probs = net(torch.from_numpy(img),
                            torch.from_numpy(ques))[0].numpy()

        params = import_torch_state_dict(init)
        sp = prepare_params(params, LAYER, num_heads=HEADS, alllayer=False,
                            qffn=level)
        serve = make_serving_fn(LAYER, HEADS, use_pallas=False,
                                bf16_stream=True, use_sga_megakernel=2,
                                interpret=True, qffn=True)
        lq = np.asarray(serve(sp, img, ques.astype(np.int32)))
        pq = 1.0 / (1.0 + np.exp(-lq.astype(np.float64)))

        delta = np.abs(pq - ref_probs).max()
        agree = float((lq.argmax(1) == ref_probs.argmax(1)).mean())
        print(f"\nfull-size qffn (level {level}): "
              f"max_prob_delta_vs_torch={delta:.6f} "
              f"top1_agreement_vs_torch={agree:.3f}")
        # bf16 matmuls alone measure ~3e-3 prob delta vs the fp32 oracle
        # at full size (TestFullSizeBF16Stream); int8-FFN quantization is
        # allowed <~5x that, and no decision may flip.
        assert delta < 0.02, delta
        assert agree == 1.0


class TestFullSizeQstatic:
    @pytest.mark.parametrize("level", [2, 3])
    def test_static_scales_logit_delta_vs_oracle(self, oracle, level):
        """Full-size calibrated static-activation-scale engine — the
        ``Predictor(act_calibration=...)`` path — vs the torch oracle.
        level=3 adds the int8 merge/cross-q projections that ship ONLY
        with static scales (prepare_qffn_params(proj_int8=True)).
        Calibration runs on the evaluated batch itself (strongest-case
        scales, mirroring tests/test_quant.py::TestStaticActScales);
        bounded prob delta, identical top-1."""
        import torch

        from mcan_vqa_tpu.ops.quant import calibrate_qffn_act_scales
        from mcan_vqa_tpu.ops.serving import make_serving_fn, prepare_params
        from mcan_vqa_tpu.train.checkpoint import import_torch_state_dict

        refnet, net, init = oracle
        net.load_state_dict(init)
        net.eval()

        B = 8
        rng = np.random.default_rng(13)
        img = rng.normal(size=(B, L_V, IMG_FEAT)).astype(np.float32)
        ques = rng.integers(1, TOKEN_SIZE, size=(B, L_Q)).astype(np.int64)
        for b in range(B):
            img[b, int(rng.integers(8, L_V + 1)):] = 0.0
            ques[b, int(rng.integers(3, L_Q + 1)):] = 0

        with torch.no_grad():
            ref_probs = net(torch.from_numpy(img),
                            torch.from_numpy(ques))[0].numpy()

        params = import_torch_state_dict(init)
        sp = prepare_params(params, LAYER, num_heads=HEADS, alllayer=False,
                            qffn=level)
        scales = calibrate_qffn_act_scales(sp, img,
                                           ques.astype(np.int32),
                                           LAYER, HEADS)
        n_want = 3 if level < 3 else 4
        assert all(len(v) >= n_want for v in scales.values()), scales
        serve = make_serving_fn(LAYER, HEADS, use_pallas=False,
                                bf16_stream=True, use_sga_megakernel=2,
                                interpret=True, qffn=True,
                                qffn_act_scales=scales)
        lq = np.asarray(serve(sp, img, ques.astype(np.int32)))
        pq = 1.0 / (1.0 + np.exp(-lq.astype(np.float64)))

        delta = np.abs(pq - ref_probs).max()
        agree = float((lq.argmax(1) == ref_probs.argmax(1)).mean())
        print(f"\nfull-size qstatic (level {level}): "
              f"max_prob_delta_vs_torch={delta:.6f} "
              f"top1_agreement_vs_torch={agree:.3f}")
        # Static per-tensor scales are coarser than per-row dynamic quant
        # (the dynamic bound above is 0.02); level 3 adds three more int8
        # sites per decoder block. No decision may flip.
        assert delta < 0.03, delta
        assert agree == 1.0
