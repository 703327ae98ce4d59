"""Full-pipeline logits golden at (scaled) bench geometry (VERDICT r1
item 4).

Runs the COMPLETE eval path — outer sliding window wrapping the HRDA
multi-resolution forward (LR pass + inner slide + scale-attention fusion)
with converted torch weights — and compares per-pixel logits against the
reference modules with the hrda decorators applied plus the reference's
slide_inference fold (segmentation_model.py:320-382, transcribed verbatim
below; the grid rule itself is pinned in test_segmentor.py).

Geometry is the 1080p bench's structure at ~half scale so it runs on CPU:
536x960 image, outer crop 536^2 / stride 212 (1x3 grid), whose crops each
run HRDA (LR 268^2 + 3x3 inner slide of 268^2 crops) — 30 crop forwards
per image, exactly like the bench's 1080p pipeline.  (536, not 540: the
reference hrda decorators need crop/2 divisible by the output stride.)
"""
import numpy as np
import torch

import jax

import ref_oracle
from refign_tpu.models.heads.segformer import SegFormerHead
from refign_tpu.models.mix_transformer import MixVisionTransformer
from refign_tpu.models.segmentor import Segmentor, slide_inference
from refign_tpu.ops.resize import interpolate
from refign_tpu.utils.torch_convert import convert_state_dict


def _ref_slide_inference(whole_fn, img, crop_size, stride, num_classes):
    """Reference slide_inference (segmentation_model.py:320-382), batched
    branch, as a function of a whole-inference callable."""
    h_stride, w_stride = stride
    h_crop, w_crop = crop_size
    batch_size, _, h_img, w_img = img.size()
    h_grids = max(h_img - h_crop + h_stride - 1, 0) // h_stride + 1
    w_grids = max(w_img - w_crop + w_stride - 1, 0) // w_stride + 1
    preds = img.new_zeros((batch_size, num_classes, h_img, w_img))
    count_mat = img.new_zeros((batch_size, 1, h_img, w_img))
    crop_imgs, crops = [], []
    for h_idx in range(h_grids):
        for w_idx in range(w_grids):
            y1 = h_idx * h_stride
            x1 = w_idx * w_stride
            y2 = min(y1 + h_crop, h_img)
            x2 = min(x1 + w_crop, w_img)
            y1 = max(y2 - h_crop, 0)
            x1 = max(x2 - w_crop, 0)
            crop_imgs.append(img[:, :, y1:y2, x1:x2])
            crops.append((y1, y2, x1, x2))
    crop_imgs = torch.cat(crop_imgs, dim=0)
    crop_seg_logits = whole_fn(crop_imgs)
    for i, (y1, y2, x1, x2) in enumerate(crops):
        crop_seg_logit = crop_seg_logits[i * batch_size:(i + 1) * batch_size]
        preds += torch.nn.functional.pad(
            crop_seg_logit, (int(x1), int(preds.shape[3] - x2), int(y1),
                             int(preds.shape[2] - y2)))
        count_mat[:, :, y1:y2, x1:x2] += 1
    assert (count_mat == 0).sum() == 0
    return preds / count_mat


def test_full_hrda_slide_pipeline_matches_reference():
    mt = ref_oracle.load_ref_module("models.backbones.mix_transformer")
    sf = ref_oracle.load_ref_module("models.heads.segformer")
    hrda = ref_oracle.load_ref_module("models.hrda")
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
    r_bb.forward = hrda.hrda_backbone(r_bb, 4)(r_bb.forward)
    r_head.forward = hrda.hrda_head(r_head, r_att, 4)(r_head.forward)
    r_bb.eval(), r_head.eval(), r_att.eval()

    H, W = 536, 960
    crop, stride = (536, 536), (212, 212)
    rng = np.random.RandomState(0)
    x = rng.randn(1, H, W, 3).astype(np.float32)
    xt = torch.from_numpy(np.transpose(x, (0, 3, 1, 2)))

    def ref_whole(img):
        logits = r_head(r_bb(img))
        return torch.nn.functional.interpolate(
            logits, img.shape[-2:], mode="bilinear", align_corners=False)

    with torch.no_grad():
        want = _ref_slide_inference(ref_whole, xt, crop, stride, 19)
        # final resize to out_size (reference forward(), out_size=orig dims)
        want = torch.nn.functional.interpolate(
            want, (H, W), mode="bilinear", align_corners=False).numpy()

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

    @jax.jit
    def forward(variables, img):
        def whole(c):
            return model.apply(variables, c, method=Segmentor.whole)
        logits = slide_inference(whole, img, crop, stride)
        return interpolate(logits, (H, W), mode="bilinear",
                           align_corners=False)

    got = np.transpose(np.asarray(forward(variables, x)), (0, 3, 1, 2))
    # fp32 end-to-end; tolerance covers conv/matmul reassociation across
    # ~30 stacked crop forwards
    np.testing.assert_allclose(got, want, rtol=1e-3, atol=2e-3)
