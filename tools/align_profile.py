"""Per-op profile of the UAWarpC alignment train-step ingredients (r5).

align_opt_lab.py localized the 580 ms stage-1 step to 3x151.5 ms
differentiated head passes + 125 ms prime synthesis, but not WHICH ops
inside the pass burn the time (the pass's MXU floor is ~5 ms).  This tool
captures a jax.profiler device trace of a probe and prints the top-k ops
by self time, aggregated by (op name prefix, shape) — the ground truth for
choosing between the candidate optimizations (3B pass fold, warp-backward
scatter fix, corr backward kernel, uncertainty repack).

Usage: python tools/align_profile.py [--probe passgrad] [--batch 6]
       [--load 750] [--crop 520] [--scan 3] [--top 40]
"""
import argparse
import glob
import gzip
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def analyze_trace(logdir, K, top=40):
    """Aggregate per-op device durations from the Chrome-trace export
    (<logdir>/plugins/profile/*/\\*.trace.json.gz): per-op totals with
    hlo_category, bytes_accessed and model_flops -> roofline ratios,
    plus category and shape-bucket rollups.  (The xplane.pb proto module
    is not importable on this image; the json trace carries the same
    per-op args.)"""
    import collections
    import re

    path = sorted(glob.glob(os.path.join(
        logdir, "plugins/profile/*/*.trace.json.gz")))[-1]
    data = json.load(gzip.open(path))
    dev_pids = set()
    for e in data["traceEvents"]:
        if (e.get("ph") == "M" and e.get("name") == "process_name"
                and "TPU" in e.get("args", {}).get("name", "")):
            dev_pids.add(e["pid"])
    tn = {}
    for e in data["traceEvents"]:
        if (e.get("ph") == "M" and e.get("name") == "thread_name"
                and e.get("pid") in dev_pids):
            tn[(e["pid"], e["tid"])] = e["args"]["name"]
    ops = {}
    for e in data["traceEvents"]:
        if e.get("ph") != "X" or e.get("pid") not in dev_pids:
            continue
        if tn.get((e["pid"], e["tid"])) != "XLA Ops":
            continue
        a = e.get("args", {})
        nm = e["name"]
        if nm == "while":
            continue
        o = ops.setdefault(nm, dict(
            dur=0.0, n=0, cat=a.get("hlo_category", "?"),
            bytes=float(a.get("bytes_accessed", 0) or 0),
            flops=float(a.get("model_flops", 0) or 0),
            long=a.get("long_name", "")[:200]))
        o["dur"] += e["dur"] / 1e3
        o["n"] += 1

    def bucket(long):
        m = re.search(r"\w+\[([0-9,]+)\]", long)
        s = m.group(1) if m else "?"
        return s[:24]

    cats = collections.defaultdict(float)
    bks = collections.defaultdict(float)
    rows = []
    total = 0.0
    for nm, o in ops.items():
        ms = o["dur"] / K
        total += ms
        rows.append((ms, o["bytes"] / 819e9 * 1e3 / K * o["n"],
                     o["flops"] / 197e12 * 1e3 / K * o["n"],
                     o["cat"], o["long"]))
        cats[o["cat"]] += ms
        bks[bucket(o["long"])] += ms
    out = [f"TOTAL (excl. while): {total:.1f} ms/iter over {len(ops)} ops",
           "-- by category --"]
    out += [f"{ms:8.1f} ms  {c}"
            for c, ms in sorted(cats.items(), key=lambda kv: -kv[1])]
    out.append("-- by shape bucket (top 20) --")
    out += [f"{ms:8.1f} ms  {b}"
            for b, ms in sorted(bks.items(), key=lambda kv: -kv[1])[:20]]
    out.append("-- top ops (ms | bwRoofMs | mxuRoofMs | category) --")
    out += [f"{ms:7.3f} {rb:7.3f} {rm:7.3f}  {cat:20s} {long[:120]}"
            for ms, rb, rm, cat, long in sorted(rows, reverse=True)[:top]]
    return total, out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=6)
    ap.add_argument("--load", type=int, default=750)
    ap.add_argument("--crop", type=int, default=520)
    ap.add_argument("--scan", type=int, default=3, metavar="K")
    ap.add_argument("--top", type=int, default=40)
    ap.add_argument("--probe", default="passgrad",
                    choices=("passgrad", "full", "prime"))
    ap.add_argument("--logdir", default="/tmp/align_profile")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import refign_tpu  # noqa: F401
    from refign_tpu.alignment.trainer import (AlignConfig,
                                              extract_pyramids,
                                              init_align_state,
                                              make_align_train_step,
                                              prepare_alignment_batch)
    from refign_tpu.alignment.losses import multi_scale_flow_loss
    from refign_tpu.models.heads.uawarpc import UAWarpCHead
    from refign_tpu.models.vgg import VGG
    from refign_tpu.parallel.mesh import cast_floating
    from refign_tpu.train.optim import make_adam_optimizer

    B, L, C = args.batch, args.load, args.crop
    cfg = AlignConfig(
        prime_jitter=(0.6, 0.6, 0.6, 0.0),
        prime_channel_shuffle=True,
        prime_blur=(0.2, 7, 0.2, 2.0),
        crop_after_flow=(C, C),
        remat_head=True,
    )
    cdt = jnp.dtype(cfg.compute_dtype)
    backbone = VGG(model_type="vgg16", out_indices=(2, 3, 4))
    head = UAWarpCHead(in_index=(0, 1), estimate_uncertainty=True)

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
    with jax.default_device(cpu):
        bvars = backbone.init(key, np.zeros((1, 256, 256, 3), np.float32))
        feats = backbone.apply(bvars, np.zeros((1, C, C, 3), np.float32),
                               extract_only_indices=[-3, -2])
        f256 = backbone.apply(bvars, np.zeros((1, 256, 256, 3), np.float32),
                              extract_only_indices=[-2, -1])
        hvars = head.init(key, feats, feats, f256, f256, (C, C))
    tx, _ = make_adam_optimizer(1e-4, [250000, 325000], gamma=0.5,
                                weight_decay=4e-4)
    state = init_align_state(hvars, bvars["params"], tx)
    state = jax.device_put(state, jax.devices()[0])
    batch = jax.device_put(batch, jax.devices()[0])

    t0 = (L - C) // 2
    img_i = batch["image_ref"][:, t0:t0 + C, t0:t0 + C].astype(cdt)
    img_j = batch["image_trg"][:, t0:t0 + C, t0:t0 + C].astype(cdt)
    bb_cast = cast_floating(state.backbone_params, cdt)
    hv = {"params": cast_floating(state.params, cdt),
          "batch_stats": state.batch_stats}
    K = args.scan

    if args.probe == "passgrad":
        def body(eps, k):
            ii = img_i + eps.astype(cdt)
            jj = img_j + eps.astype(cdt)
            pyrs, pyrs256 = jax.lax.stop_gradient(extract_pyramids(
                backbone, bb_cast, ii, jj, 0.5 * (ii + jj)))
            gtf = jax.lax.stop_gradient(
                jnp.zeros((B, C, C, 2), jnp.float32) + eps)

            def loss_fn(p):
                vs = {"params": cast_floating(p, cdt),
                      "batch_stats": hv["batch_stats"]}
                out = head.apply(vs, pyrs[2], pyrs[0], pyrs256[2],
                                 pyrs256[0], (C, C), train=True,
                                 mutable=["batch_stats"])[0]
                return multi_scale_flow_loss(out, gtf, None,
                                             loss_type=cfg.loss_type)
            l, g = jax.value_and_grad(loss_fn)(hv["params"])
            gsum = jax.tree_util.tree_reduce(
                lambda a, x: a + jnp.sum(x.astype(jnp.float32)), g, 0.0)
            return l + gsum
    elif args.probe == "prime":
        def body(eps, k):
            out = prepare_alignment_batch(
                k, batch["image_ref"] + eps, batch["image_trg"] + eps, cfg)
            return jnp.sum(out["image_prime"].astype(jnp.float32))
    else:  # full
        tx2, _ = make_adam_optimizer(1e-4, [250000, 325000], gamma=0.5,
                                     weight_decay=4e-4)
        step_fn = make_align_train_step(backbone, head, tx2, cfg)

        def body(eps, k):
            b2 = {kk: vv + eps for kk, vv in batch.items()}
            _, logs = step_fn(state, b2, k)
            return logs["train_matching_loss"]

    def scanned():
        def sbody(carry, k):
            out = body(carry, k)
            return jnp.sum(out) * 0.0, out
        _, outs = jax.lax.scan(sbody, jnp.float32(0.0),
                               jax.random.split(key, K))
        return outs[-1]

    fn = jax.jit(scanned)
    jax.block_until_ready(fn())  # compile + warm
    os.makedirs(args.logdir, exist_ok=True)
    with jax.profiler.trace(args.logdir):
        jax.block_until_ready(fn())

    total_ms, lines = analyze_trace(args.logdir, K, args.top)
    print(json.dumps({"probe": args.probe, "K": K,
                      "per_iter_ms": round(total_ms, 1),
                      "geometry": f"load{L} crop{C} b{B}"}), flush=True)
    for line in lines:
        print(line)


if __name__ == "__main__":
    main()
