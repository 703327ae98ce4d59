"""Decompose the UDA train step's differentiated core (r3).

The r3 artifact is 965 ms/step at DAFormer-512^2-b2 with only ~64 ms in
the no-grad prefix (tools/bench_step_parts.py) — yet the inference bench
implies a single B5 forward at this size costs ~13 ms, so two fwd+bwd
passes plus a frozen forward "should" be ~150 ms.  This tool times the
core's ingredients separately to localize the other ~750 ms:

  fwd_infer     student forward, inference mode (no dropout rngs, no BN
                mutation) — the bench-equivalent cost
  fwd_train     student forward exactly as the core runs it (dropout +
                droppath rngs, mutable batch_stats)
  grad_src      value_and_grad of the SOURCE pass + CE only
  core_full     the production jit_core program (src + fdist + mixed +
                backward + AdamW)
  prefix        the production jit_prefix program (teacher/align/DACS)
  full_step     prefix + core + per-step host pytree work, exactly as the
                fit loop dispatches it
  adamw_only    optimizer update alone (precomputed grads)

Chained inputs + scalar d2h sync (axon timing rules, PARITY.md).

Usage: python tools/bench_core_parts.py [--size 512] [--batch 2]
"""
import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


from _timing import chained_timeit as timeit, sync_scalar as _sync  # noqa: E402


def main():
    import jax
    import jax.numpy as jnp
    import optax
    import refign_tpu  # noqa: F401
    from refign_tpu.models.heads.daformer import DAFormerHead
    from refign_tpu.models.mix_transformer import MixVisionTransformer
    from refign_tpu.models.segmentor import Segmentor
    from refign_tpu.ops.resize import interpolate
    from refign_tpu.parallel.mesh import cast_floating
    from refign_tpu.train.optim import make_uda_optimizer
    from refign_tpu.uda.losses import pixel_weighted_cross_entropy
    from refign_tpu.uda.trainer import (UDAConfig, init_uda_state,
                                        make_uda_train_step)

    ap = argparse.ArgumentParser()
    ap.add_argument("--size", type=int, default=512)
    ap.add_argument("--batch", type=int, default=2)
    ap.add_argument("--model", default="mit_b5")
    ap.add_argument("--arch", default="daformer",
                    choices=("daformer", "deeplabv2"),
                    help="daformer: MiT + DAFormer head (--model picks "
                    "the MiT variant); deeplabv2: dilated ResNet-101 v1c "
                    "+ DeepLabV2 ASPP head")
    ap.add_argument("--iters", type=int, default=8,
                    help="timing-window length; the axon relay shows an "
                    "iteration-count-dependent cost (8-iter window: 324 "
                    "ms/step; 30-step bench_train window: 810) — sweep "
                    "this to characterize it")
    ap.add_argument("--only", default=None,
                    help="comma-list of probes to run (default all)")
    ap.add_argument("--remat", action="store_true",
                    help="rematerialize MiT blocks: on this 10:1 "
                    "memory-bound core (HBM floor ~190 ms vs MXU ~18 ms) "
                    "recomputing activations in backward can cut HBM "
                    "bytes below the no-remat program's roofline")
    ap.add_argument("--remat-policy", default=None, choices=("dots",),
                    help="with --remat: 'dots' saves matmul outputs and "
                    "recomputes only the elementwise tail (finer policy "
                    "than whole-block remat)")
    ap.add_argument("--refign", action="store_true",
                    help="measure the FULL refign prefix (teacher b2x2 + "
                    "VGG/UAWarpC align + refine + DACS) instead of the "
                    "plain-UDA prefix — the real jit_prefix program with "
                    "weights as arguments, unlike bench_step_parts whose "
                    "closure-baked constants let XLA specialize")
    ap.add_argument("--hrda", action="store_true",
                    help="HRDA-star student (scale attention + LR/HR "
                    "double pass); only core_full/prefix/full_step probes "
                    "support this")
    ap.add_argument("--windows", default=None,
                    help="comma list of window lengths; runs the full_step "
                    "probe once per window in ONE process (shared compile) "
                    "to characterize the relay's iteration-count-dependent "
                    "cost (r3: 8/30-iter windows read ~277 ms, a 60-iter "
                    "window read 390)")
    ap.add_argument("--sync-every", type=int, default=0,
                    help="with --windows: fetch a log scalar every K steps "
                    "inside the window (tests the bounded-queue governor "
                    "hypothesis — if deep dispatch queues are what long "
                    "windows pay for, periodic draining removes it)")
    ap.add_argument("--lag", type=int, default=0,
                    help="with --sync-every: fetch the scalar from this "
                    "many steps AGO (a lagged fetch should be free if the "
                    "value is already materialized; a fresh fetch pays the "
                    "full pipeline drain)")
    ap.add_argument("--scan-floor", type=int, default=0, metavar="K",
                    help="authoritative DEVICE time: run K chained "
                    "iterations of jit_prefix and of jit_core each inside "
                    "a single lax.scan dispatch — one RPC, so the relay's "
                    "per-dispatch and queue effects cannot contaminate the "
                    "number.  (prefix and core stay separate programs, "
                    "matching production; fusing them into one was the r3 "
                    "monolith regression.)")
    ap.add_argument("--h2d", type=int, default=0, metavar="N",
                    help="time N host->device batch transfers (the fit "
                    "loop pays this per step; the chained probes don't)")
    args = ap.parse_args()
    B, S = args.batch, args.size

    from refign_tpu.models.heads.segformer import SegFormerHead
    if args.arch == "deeplabv2":
        # reference configs/cityscapes_robotcar/refign_deeplabv2.yaml:
        # dilated ResNet-101 v1c + DeepLabV2 ASPP head (r4 verdict
        # missing #3: first TPU perf artifact for the second backbone
        # family; dilated convs have very different XLA behavior)
        from refign_tpu.models.heads.deeplabv2 import DeepLabV2Head
        from refign_tpu.models.resnet import ResNet
        assert not args.hrda, "deeplabv2 configs do not use HRDA"
        seg = Segmentor(backbone=ResNet(model_type="resnet101_v1c",
                                        strides=(1, 2, 1, 1),
                                        dilations=(1, 1, 2, 4),
                                        remat=args.remat),
                        head=DeepLabV2Head(num_classes=19, in_index=3),
                        scale_attention=None)
    else:
        seg = Segmentor(backbone=MixVisionTransformer(
                            model_type=args.model,
                            drop_path_rate=0.1,
                            remat=args.remat,
                            remat_policy=args.remat_policy),
                        head=DAFormerHead(num_classes=19),
                        scale_attention=(SegFormerHead(num_classes=19)
                                         if args.hrda else None))
    key = jax.random.PRNGKey(0)
    rng = np.random.RandomState(0)
    img = jnp.asarray(rng.randn(B, S, S, 3), jnp.float32)
    sem = jnp.asarray(rng.randint(0, 19, size=(B, S, S)))

    try:
        cpu = jax.local_devices(backend="cpu")[0]
    except RuntimeError:
        cpu = jax.devices()[0]
    with jax.default_device(cpu):
        if args.hrda:
            variables = seg.init(key, np.zeros((1, 64, 64, 3), np.float32),
                                 jnp.zeros((2,), jnp.int32),
                                 method=Segmentor.hrda_train)
        else:
            variables = seg.init(key, np.zeros((1, 64, 64, 3), np.float32),
                                 method=Segmentor.logits_and_features)
    params = variables["params"]
    stats = variables.get("batch_stats", {})
    tx, _ = make_uda_optimizer(params, 6e-4, 0.01, 40000)
    state = init_uda_state(params, stats, tx, enable_fdist=True)
    state = jax.device_put(state, jax.devices()[0])
    cdt = jnp.bfloat16

    def chain_img(a, out):
        leaf = jax.tree_util.tree_leaves(out)[0]
        eps = (leaf.reshape(-1)[0] * 0).astype(jnp.float32)
        return (a[0] + eps,) + a[1:]

    results = {}
    only = set(args.only.split(",")) if args.only else None
    _PROBES = {"fwd_infer", "fwd_train", "grad_src", "core_full", "prefix",
               "full_step", "adamw_only", "none"}
    if only is not None and not only <= _PROBES:
        sys.exit(f"unknown probe(s) {sorted(only - _PROBES)}; "
                 f"valid: {sorted(_PROBES)}")

    def run(name, fn, chain, *a):
        if only is not None and name not in only:
            return
        results[name] = timeit(fn, chain, *a, iters=args.iters)
        print(f"  {name:>12}: {results[name]:8.1f} ms", flush=True)

    # NOTE: every big tree (params, stats, grads, opt_state) must be a jit
    # ARGUMENT, not a closure — closed-over arrays are baked into the HLO
    # as constants and the ~324MB of B5 weights blows the axon
    # remote-compile request-body limit (HTTP 413).
    dparams = state.params
    dstats = state.batch_stats

    # --- fwd inference mode
    @jax.jit
    def fwd_infer(p, st, img):
        v = {"params": cast_floating(p, cdt), "batch_stats": st}
        out, _ = seg.apply(v, img.astype(cdt), train=True,
                           mutable=["batch_stats"], method=Segmentor.whole)
        return out
    run("fwd_infer",
        lambda img: fwd_infer(dparams, dstats, img), chain_img, img)

    # --- fwd training mode (dropout/droppath, mutable stats)
    @jax.jit
    def fwd_train(p, st, img):
        v = {"params": cast_floating(p, cdt), "batch_stats": st}
        (logits, feats), mut = seg.apply(
            v, img.astype(cdt), train=True, deterministic=False,
            rngs={"dropout": key, "droppath": key},
            mutable=["batch_stats"], method=Segmentor.logits_and_features)
        return logits
    run("fwd_train",
        lambda img: fwd_train(dparams, dstats, img), chain_img, img)

    # --- grad of source CE only
    @jax.jit
    def grad_src(p0, st, img):
        def loss_fn(p):
            v = {"params": cast_floating(p, cdt), "batch_stats": st}
            (logits, feats), mut = seg.apply(
                v, img.astype(cdt), train=True, deterministic=False,
                rngs={"dropout": key, "droppath": key},
                mutable=["batch_stats"], method=Segmentor.logits_and_features)
            logits = interpolate(logits, (S, S), mode="bilinear",
                                 align_corners=False)
            return pixel_weighted_cross_entropy(logits, sem)
        l, g = jax.value_and_grad(loss_fn)(p0)
        # every grad leaf must reach the output (as a full reduction — a
        # single-element read can be slice-propagated through the dots) or
        # XLA DCEs the backward pass and this probe silently times a forward
        gsum = jax.tree_util.tree_reduce(
            lambda a, x: a + jnp.sum(x.astype(jnp.float32)), g, 0.0)
        return l, gsum
    run("grad_src",
        lambda img: grad_src(dparams, dstats, img), chain_img, img)

    # --- full production core (includes mixed pass + fdist + adamw)
    align_backbone = align_head = None
    align_params = None
    if args.refign:
        from refign_tpu.models.heads.uawarpc import UAWarpCHead
        from refign_tpu.models.vgg import VGG
        align_backbone = VGG(model_type="vgg16", out_indices=(2, 3, 4))
        align_head = UAWarpCHead(in_index=(0, 1), estimate_uncertainty=True)
        with jax.default_device(cpu):
            ab = align_backbone.init(
                key, np.zeros((1, 256, 256, 3), np.float32))
            feats = align_backbone.apply(
                ab, np.zeros((1, S, S, 3), np.float32),
                extract_only_indices=[-3, -2])
            f256 = align_backbone.apply(
                ab, np.zeros((1, 256, 256, 3), np.float32),
                extract_only_indices=[-2, -1])
            ah = align_head.init(key, feats, feats, f256, f256, (S, S))
        align_params = jax.device_put(
            {"backbone": ab["params"], "head": ah["params"],
             "head_stats": ah["batch_stats"]}, jax.devices()[0])
    cfg = UDAConfig(use_refign=args.refign, use_align=args.refign,
                    use_hrda=args.hrda, enable_fdist=True)
    step_fn = make_uda_train_step(seg, align_backbone, align_head, tx, cfg)
    mixed_img = img
    mixed_lbl = sem
    mixed_w = jnp.ones((B, S, S), jnp.float32)
    batch = {"image_src": img, "semantic_src": sem, "image_trg": img}
    if args.refign:
        batch["image_ref"] = jnp.asarray(rng.randn(B, S, S, 3), jnp.float32)

    def core_call(img):
        b = dict(batch)
        b["image_src"] = img
        new_state, logs = step_fn.jit_core(state, b, mixed_img, mixed_lbl,
                                           mixed_w, key)
        return logs["train_loss_total"]
    run("core_full", core_call, chain_img, img)

    # --- no-grad prefix program alone (teacher fwd + DACS; no align here)
    def prefix_call(img):
        b = dict(batch)
        b["image_src"] = img
        out = step_fn.jit_prefix(state, b, align_params, key,
                                 use_ref_as_target=False)
        return out[1]  # mixed_img
    run("prefix", prefix_call, chain_img, img)

    # --- the production step exactly as the fit loop runs it: prefix +
    # core + the Python-side state._replace / pytree flatten of the ~2k
    # leaf state tree each iteration.  full_step - core_full - prefix =
    # per-step host/pytree/tunnel-dispatch overhead.
    def full_step(st, img):
        b = dict(batch)
        b["image_src"] = img
        return step_fn(st, b, align_params, key)

    if args.h2d:
        import json as _json
        host_batch = {k: np.asarray(v) for k, v in batch.items()}
        nbytes = sum(a.nbytes for a in host_batch.values())
        jax.block_until_ready(jax.device_put(host_batch))  # warm path
        t0 = time.perf_counter()
        for _ in range(args.h2d):
            jax.block_until_ready(jax.device_put(host_batch))
        dt = (time.perf_counter() - t0) / args.h2d
        print(_json.dumps({
            "probe": "h2d_batch_transfer",
            "ms": round(dt * 1e3, 1),
            "mb": round(nbytes / 1e6, 1),
            "mb_per_s": round(nbytes / 1e6 / dt, 1),
        }), flush=True)

    if args.scan_floor:
        import json as _json
        K = args.scan_floor

        @jax.jit
        def scan_prefix(st, b, ap_, key):
            # chain an output-derived epsilon into the IMAGES each iteration:
            # with a loop-constant batch XLA hoists everything that depends
            # only on (batch, align_params) — i.e. the whole VGG+UAWarpC
            # align pass — out of the loop, and the floor silently excludes
            # the aligner (observed: 8.5 ms/step "prefix" at B5-512^2)
            def body(carry, k):
                st_c, eps = carry
                b2 = dict(b)
                for kk in ("image_trg", "image_ref", "image_src"):
                    if kk in b2:
                        b2[kk] = b2[kk] + eps
                tp, mi, ml, mw = step_fn.jit_prefix(
                    st_c, b2, ap_, k, use_ref_as_target=False)
                st_c = st_c._replace(teacher_params=tp)
                out = jnp.sum(mi.astype(jnp.float32))
                return (st_c, out * 0.0), out
            keys = jax.random.split(key, K)
            (st2, _), out = jax.lax.scan(body, (st, jnp.float32(0.0)), keys)
            return out[-1]

        @jax.jit
        def scan_core(st, b, key):
            # same chaining: the frozen-imnet fdist forward depends only on
            # (imnet_params, image_src), both loop-invariant — hoistable
            def body(carry, k):
                st_c, eps = carry
                b2 = dict(b)
                b2["image_src"] = b2["image_src"] + eps
                new_st, logs = step_fn.jit_core(st_c, b2, mixed_img + eps,
                                                mixed_lbl, mixed_w, k)
                loss = logs["train_loss_total"]
                return (new_st, loss * 0.0), loss
            keys = jax.random.split(key, K)
            (st2, _), losses = jax.lax.scan(body, (st, jnp.float32(0.0)),
                                            keys)
            return losses[-1]

        @jax.jit
        def scan_fused(st, b, ap_, key):
            # the r3 "monolith regression" re-test: prefix+core in ONE
            # program, device time via single dispatch.  If this matches
            # prefix+core scanned separately, the production two-program
            # split only buys dispatch overlap on a slow relay (and the
            # r3 894-vs-430 reading was relay-contaminated).
            def body(carry, k):
                st_c, eps = carry
                b2 = dict(b)
                for kk in ("image_trg", "image_ref", "image_src"):
                    if kk in b2:
                        b2[kk] = b2[kk] + eps
                kp, kc = jax.random.split(k)
                tp, mi, ml, mw = step_fn.jit_prefix(
                    st_c, b2, ap_, kp, use_ref_as_target=False)
                st_c = st_c._replace(teacher_params=tp)
                new_st, logs = step_fn.jit_core(st_c, b2, mi, ml, mw, kc)
                loss = logs["train_loss_total"]
                return (new_st, loss * 0.0), loss
            keys = jax.random.split(key, K)
            (st2, _), losses = jax.lax.scan(body, (st, jnp.float32(0.0)),
                                            keys)
            return losses[-1]

        floors = {}
        for name, call in (("prefix", lambda: scan_prefix(state, batch,
                                                          align_params, key)),
                           ("core", lambda: scan_core(state, batch, key)),
                           ("fused", lambda: scan_fused(state, batch,
                                                        align_params, key))):
            t0 = time.time()
            jax.block_until_ready(call())   # compile + first run
            compile_s = time.time() - t0
            t0 = time.perf_counter()
            jax.block_until_ready(call())
            floors[name] = (time.perf_counter() - t0) / K * 1e3
            print(_json.dumps({
                "probe": f"scan_floor_{name}",
                "K": K,
                "device_ms_per_step": round(floors[name], 1),
                "compile_s": round(compile_s, 1),
            }), flush=True)
        print(_json.dumps({
            "probe": "scan_floor_total",
            "K": K,
            "device_ms_per_step": round(floors["prefix"] + floors["core"],
                                        1),
            "fused_ms_per_step": round(floors.get("fused", float("nan")),
                                       1),
        }), flush=True)
        if not args.windows:
            return

    if args.windows:
        # window-length sweep of the production step, one shared compile.
        # For each window: time the dispatch loop alone (host cost) and the
        # loop + final drain (true per-step), optionally draining a log
        # scalar every --sync-every steps with --lag steps of slack.
        import json as _json
        st0 = state
        new_st, logs = full_step(st0, img)
        jax.block_until_ready(logs["train_loss_total"])
        warm = new_st
        _sync(logs["train_loss_total"])
        t0 = time.perf_counter()
        _sync(logs["train_loss_total"])
        rpc = time.perf_counter() - t0
        for w in [int(x) for x in args.windows.split(",")]:
            st = warm
            losses = []
            tprobe = time.perf_counter()
            for i in range(w):
                st, logs = full_step(st, img)
                losses.append(logs["train_loss_total"])
                if args.sync_every and (i + 1) % args.sync_every == 0:
                    _sync(losses[max(0, i - args.lag)])
            dispatch_s = time.perf_counter() - tprobe
            _sync(losses[-1])
            total_s = time.perf_counter() - tprobe
            print(_json.dumps({
                "probe": "full_step_window",
                "window": w,
                "sync_every": args.sync_every,
                "lag": args.lag,
                "ms_per_step": round(max(total_s - rpc, 1e-9) / w * 1e3, 1),
                "dispatch_ms_per_step": round(dispatch_s / w * 1e3, 1),
                "rpc_ms": round(rpc * 1e3, 1),
            }), flush=True)
        return

    if only is None or "full_step" in only:
        st = state
        new_st, logs = full_step(st, img)
        jax.block_until_ready(logs["train_loss_total"])
        st = new_st
        _sync(logs["train_loss_total"])
        t0 = time.perf_counter()
        _sync(logs["train_loss_total"])
        rpc = time.perf_counter() - t0
        t0 = time.perf_counter()
        for _ in range(args.iters):
            st, logs = full_step(st, img)
        _sync(logs["train_loss_total"])
        results["full_step"] = max(
            time.perf_counter() - t0 - rpc, 1e-9) / args.iters * 1e3
        print(f"  {'full_step':>12}: {results['full_step']:8.1f} ms",
              flush=True)

    # --- adamw update alone (grads = params scaled)
    grads = jax.tree_util.tree_map(lambda p: p * 1e-3, state.params)

    @jax.jit
    def opt_only(g, os_, p, img):
        g2 = jax.tree_util.tree_map(
            lambda gg: gg + img.reshape(-1)[0] * 0, g)
        updates, new_os = tx.update(g2, os_, p)
        newp = optax.apply_updates(p, updates)
        # full reductions over EVERY updated leaf + the new opt state —
        # returning a single leaf lets XLA DCE the other ~2k leaves'
        # moment/decay/update computations
        force = jax.tree_util.tree_reduce(
            lambda a, x: a + jnp.sum(x.astype(jnp.float32)), newp, 0.0)
        force = force + jax.tree_util.tree_reduce(
            lambda a, x: (a + jnp.sum(x.astype(jnp.float32))
                          if jnp.issubdtype(x.dtype, jnp.floating) else a),
            new_os, 0.0)
        return force
    run("adamw_only",
        lambda img: opt_only(grads, state.opt_state, dparams, img),
        chain_img, img)

    print("done:", ",".join(results))


if __name__ == "__main__":
    main()
