"""Benchmark the Refign UDA train step on the current accelerator.

Measures steady-state step time at a configurable geometry (default: the
Refign-DAFormer protocol — 512^2 crops, batch 2 src + 2 trg, MiT-B5 student,
VGG-16 + UAWarpC aligner, fdist on).  Prints one JSON line.

NOTE on tunneled dev TPUs (axon relay): any host-resident array passed to
the step is re-uploaded through the relay EVERY step and dominates the
reading — keep all weights/batches device_put (this tool does) and use
--transfer only to deliberately include the per-step batch upload.

Usage: python tools/bench_train.py [--size 512] [--batch 2] [--steps 10]
       [--model mit_b5] [--hrda]
"""
import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--size", type=int, default=512)
    parser.add_argument("--batch", type=int, default=2)
    parser.add_argument("--steps", type=int, default=10)
    parser.add_argument("--model", default="mit_b5")
    parser.add_argument("--hrda", action="store_true")
    parser.add_argument("--remat", action="store_true",
                        help="rematerialize MiT blocks (activation ckpt)")
    parser.add_argument("--transfer", action="store_true",
                        help="include per-step host->device batch transfer "
                        "in the timing (without this flag the batch lives "
                        "on device, modeling the fit loop's double-buffered "
                        "prefetch steady state)")
    # component ablations (config knobs, not monkeypatches) — for honest
    # train-step decomposition on hardware
    parser.add_argument("--no-fdist", action="store_true")
    parser.add_argument("--no-align", action="store_true",
                        help="disable alignment+refinement (plain DACS UDA)")
    parser.add_argument("--no-dacs-aug", action="store_true",
                        help="disable color jitter + blur in DACS")
    parser.add_argument("--no-adapt", action="store_true",
                        help="adapt_to_ref=False (drops the lax.cond; "
                        "align+refine still run every step)")
    args = parser.parse_args()

    import jax
    import jax.numpy as jnp
    import refign_tpu  # noqa: F401
    from refign_tpu.models.heads.daformer import DAFormerHead
    from refign_tpu.models.heads.segformer import SegFormerHead
    from refign_tpu.models.heads.uawarpc import UAWarpCHead
    from refign_tpu.models.mix_transformer import MixVisionTransformer
    from refign_tpu.models.segmentor import Segmentor
    from refign_tpu.models.vgg import VGG
    from refign_tpu.train.optim import make_uda_optimizer
    from refign_tpu.uda.trainer import (UDAConfig, init_uda_state,
                                        make_uda_train_step)

    B, S = args.batch, args.size
    seg = Segmentor(
        backbone=MixVisionTransformer(model_type=args.model,
                                      drop_path_rate=0.1,
                                      remat=args.remat),
        head=DAFormerHead(num_classes=19),
        scale_attention=(SegFormerHead(num_classes=19) if args.hrda
                         else None))
    align_backbone = VGG(model_type="vgg16", out_indices=(2, 3, 4))
    align_head = UAWarpCHead(in_index=(0, 1), estimate_uncertainty=True)
    key = jax.random.PRNGKey(0)
    batch = {
        "image_src": np.random.randn(B, S, S, 3).astype(np.float32),
        "semantic_src": np.random.randint(0, 19, size=(B, S, S)),
        "image_trg": np.random.randn(B, S, S, 3).astype(np.float32),
        "image_ref": np.random.randn(B, S, S, 3).astype(np.float32),
    }
    try:
        cpu = jax.local_devices(backend="cpu")[0]
    except RuntimeError:
        cpu = jax.devices()[0]
    with jax.default_device(cpu):
        if args.hrda:
            variables = seg.init(key, batch["image_src"][:1],
                                 jnp.zeros((2,), jnp.int32),
                                 method=Segmentor.hrda_train)
        else:
            variables = seg.init(key, batch["image_src"][:1],
                                 method=Segmentor.logits_and_features)
        ab = align_backbone.init(key, np.zeros((1, 256, 256, 3), np.float32))
        feats = align_backbone.apply(ab, np.zeros((1, S, S, 3), np.float32),
                                     extract_only_indices=[-3, -2])
        f256 = align_backbone.apply(
            ab, np.zeros((1, 256, 256, 3), np.float32),
            extract_only_indices=[-2, -1])
        ah = align_head.init(key, feats, feats, f256, f256, (S, S))
    # device_put is NOT optional: these trees are created under
    # jax.default_device(cpu) and stay CPU-committed; passing them to the
    # TPU-jitted prefix re-uploads ~70MB of VGG+UAWarpC weights through the
    # axon relay EVERY step (the fit loop replicate()s them once instead).
    # The r3 810-965 ms/step readings for a ~280 ms step were exactly this.
    align_params = jax.device_put(
        {"backbone": ab["params"], "head": ah["params"],
         "head_stats": ah["batch_stats"]}, jax.devices()[0])
    cfg = UDAConfig(use_hrda=args.hrda,
                    use_refign=not args.no_align,
                    use_align=not args.no_align,
                    adapt_to_ref=not (args.no_align or args.no_adapt),
                    enable_fdist=not args.no_fdist,
                    color_jitter_p=0.0 if args.no_dacs_aug else 0.2,
                    blur=not args.no_dacs_aug)
    tx, _ = make_uda_optimizer(variables["params"], 6e-4, 0.01, 40000)
    state = init_uda_state(variables["params"],
                           variables.get("batch_stats", {}), tx)
    state = jax.device_put(state, jax.devices()[0])
    step = make_uda_train_step(seg, align_backbone, align_head, tx, cfg)
    if not args.transfer:
        batch = jax.device_put(batch)

    def sync(tree):
        # axon: block_until_ready returns before execution completes; a
        # scalar d2h fetch is the only true barrier
        leaf = jax.tree_util.tree_leaves(tree)[0]
        np.asarray(jax.device_get(leaf[(0,) * leaf.ndim]))

    t0 = time.time()
    state, logs = step(state, batch, align_params, key)
    sync(logs["train_loss_total"])
    compile_s = time.time() - t0
    # one more step fully drained, then estimate the idle d2h fetch cost —
    # through the axon relay a fetch can cost SECONDS and the r3 907-1268ms
    # readings for an (honest) ~400ms step were fetch-amortization noise;
    # subtracting the idle-fetch baseline and amortizing over more steps
    # matches the chained bench_core_parts methodology
    state, logs = step(state, batch, align_params, key)
    sync(logs["train_loss_total"])
    t0 = time.time()
    sync(logs["train_loss_total"])
    rpc = time.time() - t0
    t0 = time.time()
    for _ in range(args.steps):
        state, logs = step(state, batch, align_params, key)
    sync(logs["train_loss_total"])
    dt = max(time.time() - t0 - rpc, 1e-9) / args.steps
    print(json.dumps({
        "metric": "uda_train_step_time",
        "value": round(dt * 1000, 1),
        "unit": "ms/step",
        "geometry": (f"{args.model} {'hrda ' if args.hrda else ''}"
                     f"{'remat ' if args.remat else ''}{S}^2 b{B}"
                     f"{' -fdist' if args.no_fdist else ''}"
                     f"{' -align' if args.no_align else ''}"
                     f"{' -dacsaug' if args.no_dacs_aug else ''}"
                     f"{' -adapt' if args.no_adapt else ''}"),
        "compile_s": round(compile_s, 1),
        "rpc_s": round(rpc, 2),
        "hours_for_40k_steps": round(40000 * dt / 3600, 2),
        "loss": float(logs["train_loss_total"]),
    }))


if __name__ == "__main__":
    main()
