"""CPU software-efficiency anchor for the A100 baseline (BASELINE.md).

Times the REFERENCE torch HRDA slide pipeline and OUR pipeline on the SAME
host CPU, same geometry (536x960 scaled bench, 30 crop forwards), both
fp32, and prints the ratio.  This grounds the derived A100 baseline: if
torch-on-CPU and refign-tpu-on-CPU run at similar rates, the TPU bench
advantage is hardware + XLA scheduling, not a rigged software comparison.

The reference modules are loaded via the tests' oracle loader (reference
code is used strictly as a black-box oracle, never imported into the
framework).  Run CPU-pinned:

    PYTHONPATH= JAX_PLATFORMS=cpu python tools/bench_torch_ref.py [b0|b5]
"""
import json
import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "tests"))


def main():
    import torch

    import ref_oracle
    from refign_tpu.models.heads.segformer import SegFormerHead
    from refign_tpu.models.mix_transformer import MixVisionTransformer
    from refign_tpu.models.segmentor import Segmentor, slide_inference
    from refign_tpu.ops.resize import interpolate
    from test_full_pipeline_golden import _ref_slide_inference

    model_type = sys.argv[1] if len(sys.argv) > 1 else "b0"
    arch = f"mit_{model_type}"
    chans = {"b0": [32, 64, 160, 256]}.get(model_type,
                                           [64, 128, 320, 512])

    mt = ref_oracle.load_ref_module("models.backbones.mix_transformer")
    sf = ref_oracle.load_ref_module("models.heads.segformer")
    hrda = ref_oracle.load_ref_module("models.hrda")
    torch.manual_seed(0)
    r_bb = mt.MixVisionTransformer(arch, drop_path_rate=0.0)
    r_head = sf.SegFormerHead(in_channels=chans, in_index=[0, 1, 2, 3],
                              num_classes=19, channels=64,
                              input_transform="multiple_select")
    r_att = sf.SegFormerHead(in_channels=chans, in_index=[0, 1, 2, 3],
                             num_classes=19, channels=64,
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

    def torch_forward():
        with torch.no_grad():
            out = _ref_slide_inference(ref_whole, xt, crop, stride, 19)
            return torch.nn.functional.interpolate(
                out, (H, W), mode="bilinear", align_corners=False)

    torch_forward()  # warm caches/threads
    n = 3
    t0 = time.perf_counter()
    for _ in range(n):
        torch_forward()
    t_torch = (time.perf_counter() - t0) / n

    import jax

    model = Segmentor(
        backbone=MixVisionTransformer(model_type=arch, drop_path_rate=0.0),
        head=SegFormerHead(num_classes=19, channels=64),
        scale_attention=SegFormerHead(num_classes=19, channels=64))
    variables = model.init(jax.random.PRNGKey(0),
                           np.zeros((1, 64, 64, 3), np.float32),
                           method=Segmentor.hrda_eval)

    @jax.jit
    def forward(variables, img):
        def whole(c):
            logits = model.apply(variables, c, method=Segmentor.hrda_eval)
            return interpolate(logits, c.shape[1:3], mode="bilinear",
                               align_corners=False)
        logits = slide_inference(whole, img, crop, stride)
        return interpolate(logits, (H, W), mode="bilinear",
                           align_corners=False)

    np.asarray(forward(variables, x))  # compile
    t0 = time.perf_counter()
    for _ in range(n):
        np.asarray(forward(variables, x))
    t_jax = (time.perf_counter() - t0) / n

    print(json.dumps({
        "metric": "cpu_software_efficiency_anchor",
        "geometry": f"{arch} 536x960 slide (30 crops), fp32 CPU",
        "torch_ref_s_per_img": round(t_torch, 2),
        "refign_tpu_s_per_img": round(t_jax, 2),
        "jax_over_torch_speedup": round(t_torch / t_jax, 2),
    }))


if __name__ == "__main__":
    main()
