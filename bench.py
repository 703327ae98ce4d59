"""Benchmark: HRDA 1080p sliding-window inference throughput (images/sec/chip).

This is the driver-defined headline metric (BASELINE.md: >= 2x A100
images/sec/chip for HRDA 1080p slide inference).  The pipeline is the full
Refign-HRDA eval path on a 1080x1920 image (reference
models/segmentation_model.py:320-382 + models/hrda.py:187-232): an outer
1080^2/420 slide (1x3 crops) whose crops each run the HRDA multi-res forward
(LR 540^2 pass + 3x3 inner slide of 540^2 HR crops) through MiT-B5 +
DAFormer, fused by scale attention, folded with count-mat averaging.

Runs in bfloat16 (fp32 islands preserved inside LN/softmax/interpolate).

``vs_baseline``: measured throughput / (2 x A100_EST).  A100_EST = 2.1
img/s is the LEAST FAVORABLE end of a derived range — see BASELINE.md
"A100 throughput baseline — derivation": the pipeline is 8.75 TFLOP/image
(XLA cost analysis of this very program), and mapping the public
SegFormer-B5 V100 throughput anchor to A100+AMP bounds the torch
reference at 0.9-2.1 img/s.  No published A100 number exists (the
reference reports accuracy only, SURVEY.md §6).
"""
import json
import time

import numpy as np

A100_EST_IMG_PER_S = 2.1
TARGET = 2.0 * A100_EST_IMG_PER_S


def main():
    import jax
    import jax.numpy as jnp
    import refign_tpu  # noqa: F401  (sets matmul precision policy)
    from refign_tpu.models.heads.daformer import DAFormerHead
    from refign_tpu.models.heads.segformer import SegFormerHead
    from refign_tpu.models.mix_transformer import MixVisionTransformer
    from refign_tpu.models.segmentor import Segmentor, slide_inference
    from refign_tpu.parallel.mesh import cast_floating

    seg = Segmentor(
        backbone=MixVisionTransformer(model_type="mit_b5",
                                      drop_path_rate=0.0),
        head=DAFormerHead(num_classes=19),
        scale_attention=SegFormerHead(num_classes=19),
    )
    key = jax.random.PRNGKey(0)
    variables = seg.init(key, jnp.zeros((1, 64, 64, 3), jnp.float32),
                         method=Segmentor.hrda_eval)
    variables = {"params": cast_floating(variables["params"], jnp.bfloat16),
                 "batch_stats": variables["batch_stats"]}

    def whole(crops):
        logits = seg.apply(variables, crops, method=Segmentor.hrda_eval)
        from refign_tpu.ops.resize import interpolate
        return interpolate(logits, crops.shape[1:3], mode="bilinear",
                           align_corners=False)

    @jax.jit
    def forward(img):
        return slide_inference(whole, img, (1080, 1080), (420, 420))

    img = jnp.asarray(np.random.randn(1, 1080, 1920, 3), jnp.bfloat16)

    # canonical honest-timing loop (tools/_timing.py): chained inputs force
    # every iteration to execute on the axon relay, scalar d2h fetch is the
    # barrier, and the idle-queue fetch RPC baseline is subtracted —
    # identical methodology to every other bench tool in this repo
    import os
    import sys
    sys.path.insert(0, os.path.join(os.path.dirname(
        os.path.abspath(__file__)), "tools"))
    from _timing import chained_timeit, sync_scalar

    def chain(args, out):
        # add a zero-scaled scalar of the output to the input: identical
        # math, but makes each iteration depend on the previous one
        (im,) = args
        return (im + (out[0, 0, 0, 0] * 0).astype(im.dtype),)

    # warmup / compile — the axon remote-compile service fails transiently
    # (HTTP 500 / env-init races); retry a few times before giving up
    for attempt in range(4):
        try:
            out = forward(img)
            # also warm the tiny chaining add (compiles are slow on axon)
            (img,) = chain((img,), out)
            sync_scalar(forward(img))
            break
        except Exception as e:  # jax.errors.JaxRuntimeError and friends
            if attempt == 3:
                raise
            print(f"compile attempt {attempt + 1} failed "
                  f"({type(e).__name__}); retrying", file=sys.stderr,
                  flush=True)
            time.sleep(10)

    ms_per_img = chained_timeit(forward, chain, img, iters=10)
    img_per_s = 1e3 / ms_per_img

    print(json.dumps({
        "metric": "hrda_1080p_slide_inference_throughput",
        "value": round(img_per_s, 4),
        "unit": "images/sec/chip",
        "vs_baseline": round(img_per_s / TARGET, 4),
    }))


if __name__ == "__main__":
    main()
