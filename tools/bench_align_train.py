"""Benchmark the UAWarpC (MegaDepth) alignment TRAIN step on the TPU.

The reference's dominant compute budget is alignment training: 400k
stage-1 + 225k stage-2 steps at batch 6, images loaded at 750^2, the
synthetic prime flow generated there and everything center-cropped to
520^2 ("several days on a single GPU", reference README.md:297,
configs/megadepth/uawarpc_stage1.yaml:161-174).  This tool times the
production train step — the exact `jax.jit(make_align_train_step(...))`
program AlignTask.fit dispatches (tasks/align_task.py:163), including
on-device prime synthesis (photometric augs + CompositeFlow), the
frozen VGG pyramids (3 image sets x 2 resolutions), three UAWarpC head
passes, both losses with adaptive weights, and torch-Adam — with the
axon-honest methodology (chained inputs, scalar d2h barrier, idle-fetch
baseline subtracted; PARITY.md "Round-2 measurement methodology fix").

Usage: python tools/bench_align_train.py [--stage 2] [--batch 6]
       [--steps 10] [--load 750] [--crop 520] [--windows 8,30,60]
"""
import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--stage", type=int, default=1, choices=(1, 2),
                    help="stage 2 adds the W-bipath visibility mask "
                    "(uawarpc_stage2.yaml:101)")
    ap.add_argument("--batch", type=int, default=6)
    ap.add_argument("--load", type=int, default=750,
                    help="pre-crop image size (dataset dims)")
    ap.add_argument("--crop", type=int, default=520,
                    help="CenterCrop-after-CompositeFlow size")
    ap.add_argument("--steps", type=int, default=10)
    ap.add_argument("--windows", default=None,
                    help="comma list of window lengths (relay "
                    "characterization; overrides --steps)")
    ap.add_argument("--remat-head", action="store_true",
                    help="use the r4 whole-pass remat instead of the r5 "
                    "per-submodule default")
    ap.add_argument("--no-remat", action="store_true",
                    help="disable head-pass remat (without it the 3-pass "
                    "step needs 28.4 GB HBM at stage geometry and OOMs "
                    "the 16 GB v5e)")
    ap.add_argument("--remat-policy", default=None, choices=("dots",),
                    help="head-remat policy: 'dots' saves matmul/conv "
                    "outputs, recomputes only the elementwise tail")
    ap.add_argument("--remat-skip-last", action="store_true",
                    help="leave the third head pass unrematerialized "
                    "(its activations backprop first, so peak HBM only "
                    "rises by ~one pass while one fwd recompute is saved)")
    ap.add_argument("--scan-floor", type=int, default=0, metavar="K",
                    help="authoritative DEVICE time: K chained train steps "
                    "inside one lax.scan dispatch (relay-immune; images "
                    "chained through the carry so the frozen-VGG pyramids "
                    "cannot be hoisted as loop-invariant)")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import refign_tpu  # noqa: F401
    from refign_tpu.alignment.trainer import (AlignConfig, init_align_state,
                                              make_align_train_step)
    from refign_tpu.models.heads.uawarpc import UAWarpCHead
    from refign_tpu.models.vgg import VGG
    from refign_tpu.train.optim import make_adam_optimizer

    B, L = args.batch, args.load
    backbone = VGG(model_type="vgg16", out_indices=(2, 3, 4))
    head = UAWarpCHead(in_index=(0, 1), estimate_uncertainty=True)
    # remat scheme mirrors the align_task production defaults (r5:
    # per-submodule remat, no whole-pass remat); --remat-head/--no-remat
    # select the r4 whole-pass scheme or no remat at all
    cfg = AlignConfig(
        prime_jitter=(0.6, 0.6, 0.6, 0.0),
        prime_channel_shuffle=True,
        prime_blur=(0.2, 7, 0.2, 2.0),
        crop_after_flow=(args.crop, args.crop),
        visibility_mask=(args.stage == 2),
        remat_head=args.remat_head,
        remat_head_policy=args.remat_policy,
        remat_skip_last=args.remat_skip_last,
        remat_modules=not (args.no_remat or args.remat_head),
    )
    key = jax.random.PRNGKey(0)
    rng = np.random.RandomState(0)
    batch = {
        "image_ref": jnp.asarray(rng.randn(B, L, L, 3), jnp.float32),
        "image_trg": jnp.asarray(rng.randn(B, L, L, 3), jnp.float32),
    }
    try:
        cpu = jax.local_devices(backend="cpu")[0]
    except RuntimeError:
        cpu = jax.devices()[0]
    C = args.crop
    with jax.default_device(cpu):
        bvars = backbone.init(key, np.zeros((1, 256, 256, 3), np.float32))
        feats = backbone.apply(bvars, np.zeros((1, C, C, 3), np.float32),
                               extract_only_indices=[-3, -2])
        f256 = backbone.apply(bvars, np.zeros((1, 256, 256, 3), np.float32),
                              extract_only_indices=[-2, -1])
        hvars = head.init(key, feats, feats, f256, f256, (C, C))
    # reference optimizer: torch Adam lr=1e-4 wd=4e-4, MultiStepLR
    # [250k, 325k] x0.5 (uawarpc_stage1.yaml:113-120)
    tx, _ = make_adam_optimizer(1e-4, [250000, 325000], gamma=0.5,
                                weight_decay=4e-4)
    state = init_align_state(hvars, bvars["params"], tx)
    state = jax.device_put(state, jax.devices()[0])
    batch = jax.device_put(batch, jax.devices()[0])
    step_fn = jax.jit(make_align_train_step(backbone, head, tx, cfg))

    def sync(x):
        np.asarray(jax.device_get(x))

    t0 = time.time()
    state, logs = step_fn(state, batch, key)
    sync(logs["train_matching_loss"])
    compile_s = time.time() - t0
    state, logs = step_fn(state, batch, key)
    sync(logs["train_matching_loss"])
    t0 = time.perf_counter()
    sync(logs["train_matching_loss"])
    rpc = time.perf_counter() - t0

    geometry = (f"vgg16+uawarpc stage{args.stage} load{L}^2 "
                f"crop{C}^2 b{B}")

    if args.scan_floor:
        K = args.scan_floor

        @jax.jit
        def scan_steps(st, b, key):
            def body(carry, k):
                st_c, eps = carry
                b2 = {kk: vv + eps for kk, vv in b.items()}
                new_st, logs = step_fn(st_c, b2, k)
                loss = logs["train_matching_loss"]
                return (new_st, loss * 0.0), loss
            keys = jax.random.split(key, K)
            (st2, _), losses = jax.lax.scan(body, (st, jnp.float32(0.0)),
                                            keys)
            return losses[-1]

        t0 = time.time()
        jax.block_until_ready(scan_steps(state, batch, key))
        scan_compile_s = time.time() - t0
        t0 = time.perf_counter()
        jax.block_until_ready(scan_steps(state, batch, key))
        dt = (time.perf_counter() - t0) / K
        print(json.dumps({
            "metric": "uawarpc_train_step_device_floor",
            "value": round(dt * 1e3, 1),
            "unit": "ms/step (single-dispatch lax.scan, relay-immune)",
            "geometry": geometry,
            "K": K,
            "compile_s": round(scan_compile_s, 1),
            "days_for_400k_stage1": round(400000 * dt / 86400, 2),
            "days_for_225k_stage2": round(225000 * dt / 86400, 2),
        }), flush=True)
    windows = ([int(x) for x in args.windows.split(",")]
               if args.windows else [args.steps])
    for w in windows:
        st = state
        t0 = time.perf_counter()
        for i in range(w):
            kk = jax.random.fold_in(key, i)
            st, logs = step_fn(st, batch, kk)
        dispatch_s = time.perf_counter() - t0
        sync(logs["train_matching_loss"])
        dt = max(time.perf_counter() - t0 - rpc, 1e-9) / w
        print(json.dumps({
            "metric": "uawarpc_train_step_time",
            "value": round(dt * 1000, 1),
            "unit": "ms/step",
            "geometry": geometry,
            "window": w,
            "dispatch_ms_per_step": round(dispatch_s / w * 1e3, 1),
            "compile_s": round(compile_s, 1),
            "rpc_s": round(rpc, 2),
            "days_for_400k_stage1": round(400000 * dt / 86400, 2),
            "days_for_225k_stage2": round(225000 * dt / 86400, 2),
            "loss": float(logs["train_matching_loss"]),
        }), flush=True)


if __name__ == "__main__":
    main()
