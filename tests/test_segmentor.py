"""Segmentor composition, HRDA eval golden vs reference decorators, slide
inference fold, IoU and CE loss oracles."""
import numpy as np
import pytest
import torch

import ref_oracle
from refign_tpu.metrics import iou_compute, iou_init, iou_update
from refign_tpu.models.heads.segformer import SegFormerHead
from refign_tpu.models.mix_transformer import MixVisionTransformer
from refign_tpu.models.segmentor import (Segmentor, compute_slide_boxes,
                                         fold_crops, slide_inference)
from refign_tpu.uda.losses import pixel_weighted_cross_entropy
from refign_tpu.utils.torch_convert import convert_state_dict


def test_slide_boxes_match_reference_grid():
    # 1080x1920 with 1080/420 -> reference yields 1x3 crops (SURVEY §3.2)
    boxes = compute_slide_boxes((1080, 1920), (1080, 1080), (420, 420))
    assert boxes == [(0, 1080, 0, 1080), (0, 1080, 420, 1500),
                     (0, 1080, 840, 1920)]


def test_slide_inference_identity_fold():
    """Folding crops of the identity function reproduces the image."""
    rng = np.random.RandomState(0)
    img = rng.randn(2, 64, 96, 3).astype(np.float32)
    out = slide_inference(lambda c: c, img, (32, 32), (16, 16))
    np.testing.assert_allclose(np.asarray(out), img, atol=1e-6)


def test_iou_matches_numpy():
    rng = np.random.RandomState(1)
    C = 5
    preds = rng.randint(0, C, size=(2, 8, 9))
    target = rng.randint(0, C, size=(2, 8, 9))
    target[0, :2] = 255  # ignored region
    cm = iou_update(iou_init(C), preds, target, ignore_index=255)
    # numpy confusion matrix
    want = np.zeros((C, C), np.int64)
    for p, t in zip(preds.reshape(-1), target.reshape(-1)):
        if t != 255:
            want[t, p] += 1
    np.testing.assert_array_equal(np.asarray(cm), want)
    inter = np.diag(want)
    union = want.sum(0) + want.sum(1) - inter
    scores = np.where(union == 0, 0, inter / np.maximum(union, 1))
    np.testing.assert_allclose(
        float(iou_compute(cm, "macro")), scores.mean(), rtol=1e-6)


def test_cross_entropy_matches_torch():
    rng = np.random.RandomState(2)
    logits = rng.randn(2, 6, 7, 5).astype(np.float32)
    target = rng.randint(0, 5, size=(2, 6, 7))
    target[:, 0] = 255
    weight = rng.rand(2, 6, 7).astype(np.float32)
    lt = torch.from_numpy(np.transpose(logits, (0, 3, 1, 2)))
    tt = torch.from_numpy(target)
    ref = torch.nn.functional.cross_entropy(
        lt, tt, ignore_index=255, reduction="none")
    ref = (ref * torch.from_numpy(weight)).mean().item()
    got = float(pixel_weighted_cross_entropy(logits, target, weight))
    assert abs(got - ref) < 1e-5

    ref_nw = torch.nn.functional.cross_entropy(
        lt, tt, ignore_index=255, reduction="none").mean().item()
    got_nw = float(pixel_weighted_cross_entropy(logits, target))
    assert abs(got_nw - ref_nw) < 1e-5


class _RefHRDAWrapper(torch.nn.Module):
    """Reference backbone+head with the reference hrda decorators applied,
    mirroring segmentation_model.py:125-135."""

    def __init__(self, backbone, head, scale_attention, os_=4):
        super().__init__()
        hrda = ref_oracle.load_ref_module("models.hrda")
        self.backbone = backbone
        self.head = head
        self.scale_attention = scale_attention
        self.backbone.forward = hrda.hrda_backbone(
            self.backbone, os_)(self.backbone.forward)
        self.head.forward = hrda.hrda_head(
            self.head, self.scale_attention, os_)(self.head.forward)

    def forward(self, x):
        return self.head(self.backbone(x))


def test_hrda_eval_matches_reference():
    mt = ref_oracle.load_ref_module("models.backbones.mix_transformer")
    sf = ref_oracle.load_ref_module("models.heads.segformer")
    torch.manual_seed(0)
    r_bb = mt.MixVisionTransformer("mit_b0", drop_path_rate=0.0)
    r_head = sf.SegFormerHead(in_channels=[32, 64, 160, 256],
                              in_index=[0, 1, 2, 3], num_classes=19,
                              channels=64,
                              input_transform="multiple_select")
    r_att = sf.SegFormerHead(in_channels=[32, 64, 160, 256],
                             in_index=[0, 1, 2, 3], num_classes=19,
                             channels=64,
                             input_transform="multiple_select")
    wrapper = _RefHRDAWrapper(r_bb, r_head, r_att)
    wrapper.eval()

    rng = np.random.RandomState(0)
    x = rng.randn(1, 128, 128, 3).astype(np.float32)
    with torch.no_grad():
        want = wrapper(torch.from_numpy(
            np.transpose(x, (0, 3, 1, 2)))).numpy()

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
    got = model.apply(variables, x, method=Segmentor.hrda_eval)
    np.testing.assert_allclose(
        np.transpose(np.asarray(got), (0, 3, 1, 2)), want,
        rtol=1e-3, atol=1e-3)
