"""HRDA training-branch golden test vs the reference decorators with a
pinned crop offset, plus refine()/eta() hand-checked tests."""
import math
import random as pyrandom

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

import ref_oracle
from refign_tpu.models.heads.segformer import SegFormerHead
from refign_tpu.models.mix_transformer import MixVisionTransformer
from refign_tpu.models.segmentor import Segmentor
from refign_tpu.uda.refine import eta, refine
from refign_tpu.utils.torch_convert import convert_state_dict


def test_hrda_train_matches_reference_fixed_crop():
    mt = ref_oracle.load_ref_module("models.backbones.mix_transformer")
    sf = ref_oracle.load_ref_module("models.heads.segformer")
    hrda = ref_oracle.load_ref_module("models.hrda")
    torch.manual_seed(0)
    r_bb = mt.MixVisionTransformer("mit_b0", drop_path_rate=0.0)
    r_head = sf.SegFormerHead(in_channels=[32, 64, 160, 256],
                              in_index=[0, 1, 2, 3], num_classes=19,
                              channels=64, input_transform="multiple_select")
    r_att = sf.SegFormerHead(in_channels=[32, 64, 160, 256],
                             in_index=[0, 1, 2, 3], num_classes=19,
                             channels=64, input_transform="multiple_select")
    # apply train-mode decorators (reference segmentation_model.py:125-135)
    r_bb.forward = hrda.hrda_backbone(r_bb, 4)(r_bb.forward)
    r_head.forward = hrda.hrda_head(r_head, r_att, 4)(r_head.forward)
    # train() enables the training branch; no dropout/BN-noise with p=0 and
    # eval-normalized stats, so force eval on norm layers but keep
    # module.training True for the branch switch
    r_bb.train()
    r_head.train()
    r_att.train()
    for m in list(r_bb.modules()) + list(r_head.modules()) + list(
            r_att.modules()):
        if isinstance(m, (torch.nn.Dropout2d, torch.nn.Dropout)):
            m.eval()
        if isinstance(m, torch.nn.BatchNorm2d):
            m.eval()

    rng = np.random.RandomState(0)
    x = rng.randn(1, 128, 128, 3).astype(np.float32)

    # pin the random crop offset (reference hrda.py:24-27 uses randrange)
    offsets = iter([2, 3])  # units of divisible=8 -> oy=16, ox=24
    orig_randrange = pyrandom.randrange
    try:
        pyrandom.randrange = lambda *a, **k: next(offsets)
        with torch.no_grad():
            fused_t, hr_t, box_t = r_head(r_bb(
                torch.from_numpy(np.transpose(x, (0, 3, 1, 2)))))
    finally:
        pyrandom.randrange = orig_randrange
    assert box_t == [16, 80, 24, 88]

    vb = convert_state_dict(r_bb.state_dict())
    vh = convert_state_dict(r_head.state_dict())
    va = convert_state_dict(r_att.state_dict())
    variables = {
        "params": {"backbone": vb["params"], "head": vh["params"],
                   "scale_attention": va["params"]},
        "batch_stats": {"head": vh["batch_stats"],
                        "scale_attention": va["batch_stats"]},
    }
    model = Segmentor(
        backbone=MixVisionTransformer(model_type="mit_b0",
                                      drop_path_rate=0.0),
        head=SegFormerHead(num_classes=19, channels=64),
        scale_attention=SegFormerHead(num_classes=19, channels=64),
    )
    # train=False keeps BN on (eval-normalized) running stats to match the
    # forced-eval norm layers above; deterministic disables dropout
    fused, hr, off, lr_feats = model.apply(
        variables, x, jnp.asarray([16, 24], jnp.int32), False, True,
        method=Segmentor.hrda_train)

    np.testing.assert_allclose(
        np.transpose(np.asarray(fused), (0, 3, 1, 2)),
        fused_t.numpy(), rtol=2e-3, atol=2e-3)
    np.testing.assert_allclose(
        np.transpose(np.asarray(hr), (0, 3, 1, 2)),
        hr_t.numpy(), rtol=2e-3, atol=2e-3)
    assert len(lr_feats) == 4


def test_eta_hand_values():
    # uniform logits -> normalized entropy 1; one-hot -> ~0
    logits = np.zeros((1, 2, 2, 19), np.float32)
    np.testing.assert_allclose(np.asarray(eta(logits)), 1.0, atol=1e-6)
    logits[..., 3] = 50.0
    assert float(np.asarray(eta(logits)).max()) < 1e-6


def test_refine_math():
    rng = np.random.RandomState(0)
    B, H, W, C = 1, 4, 4, 19
    lt = rng.randn(B, H, W, C).astype(np.float32)
    lr = rng.randn(B, H, W, C).astype(np.float32)
    certs = np.full((B, H, W, 1), 0.7, np.float32)
    mask = np.ones((B, H, W), bool)
    out = np.asarray(refine(lt, lr, mask, certs, gamma=0.25))
    # output is a convex combination of the two softmaxes
    pt = np.asarray(jax.nn.softmax(jnp.asarray(lt), -1))
    pr = np.asarray(jax.nn.softmax(jnp.asarray(lr), -1))
    lo = np.minimum(pt, pr) - 1e-6
    hi = np.maximum(pt, pr) + 1e-6
    assert ((out >= lo) & (out <= hi)).all()
    # NOTE: epsilon is per-CHANNEL (the static-class mask M zeroes some
    # channels, reference :459-461), so the refined map need not sum to 1 —
    # faithful to the reference.

    # with P disabled and M disabled, epsilon = 0.5*s
    s = float(np.mean(np.asarray(eta(lt)))) ** 0.25
    out2 = np.asarray(refine(lt, lr, None, None, gamma=0.25,
                             disable_M=True))
    want = (1 - 0.5 * s) * pt + 0.5 * s * pr
    np.testing.assert_allclose(out2, want, atol=1e-5)

    # outside the warp mask the target probs pass through unchanged
    mask0 = np.zeros((B, H, W), bool)
    out3 = np.asarray(refine(lt, lr, mask0, certs, gamma=0.25))
    np.testing.assert_allclose(out3, pt, atol=1e-5)
