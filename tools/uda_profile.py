"""Per-op device profile of the UDA differentiated core (r5).

roofline_train_r04 put the 512^2 DAFormer core at 131.7 ms vs a 17.8 ms
MXU floor and the 1024^2 HRDA core at 319.4 vs 39.4 — 7.4-8.1x.  This
captures a jax.profiler trace of K chained core_fn iterations (one
lax.scan dispatch) and prints the aggregated per-op table via
tools/align_profile.analyze_trace, to pick the levers (bf16 grad buffers,
dwconv backward, remat policy) from measurement instead of guesses.

Usage: python tools/uda_profile.py [--size 512] [--batch 2] [--hrda]
       [--scan 3] [--top 40]
"""
import argparse
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from align_profile import analyze_trace  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--size", type=int, default=512)
    ap.add_argument("--batch", type=int, default=2)
    ap.add_argument("--model", default="mit_b5")
    ap.add_argument("--hrda", action="store_true")
    ap.add_argument("--scan", type=int, default=3, metavar="K")
    ap.add_argument("--top", type=int, default=40)
    ap.add_argument("--logdir", default="/tmp/uda_profile")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import refign_tpu  # noqa: F401
    from refign_tpu.models.heads.daformer import DAFormerHead
    from refign_tpu.models.heads.segformer import SegFormerHead
    from refign_tpu.models.mix_transformer import MixVisionTransformer
    from refign_tpu.models.segmentor import Segmentor
    from refign_tpu.train.optim import make_uda_optimizer
    from refign_tpu.uda.trainer import (UDAConfig, init_uda_state,
                                        make_uda_train_step)

    B, S = args.batch, args.size
    seg = Segmentor(backbone=MixVisionTransformer(model_type=args.model,
                                                  drop_path_rate=0.1),
                    head=DAFormerHead(num_classes=19),
                    scale_attention=(SegFormerHead(num_classes=19)
                                     if args.hrda else None))
    key = jax.random.PRNGKey(0)
    rng = np.random.RandomState(0)
    batch = {
        "image_src": jnp.asarray(rng.randn(B, S, S, 3), jnp.float32),
        "semantic_src": jnp.asarray(rng.randint(0, 19, size=(B, S, S))),
        "image_trg": jnp.asarray(rng.randn(B, S, S, 3), jnp.float32),
        "image_ref": jnp.asarray(rng.randn(B, S, S, 3), jnp.float32),
    }
    mixed_img = jnp.asarray(rng.randn(B, S, S, 3), jnp.float32)
    mixed_lbl = jnp.asarray(rng.randint(0, 19, size=(B, S, S)))
    mixed_w = jnp.asarray(rng.rand(B, S, S), jnp.float32)

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
    tx, _ = make_uda_optimizer(variables["params"], 6e-4, 0.01, 40000)
    state = init_uda_state(variables["params"],
                           variables.get("batch_stats", {}), tx)
    state = jax.device_put(state, jax.devices()[0])

    cfg = UDAConfig(use_hrda=args.hrda, use_refign=True, use_align=True,
                    adapt_to_ref=False, enable_fdist=True)
    step = make_uda_train_step(seg, None, None, tx, cfg)
    K = args.scan

    def scanned(st, b, mi, ml, mw):
        def body(carry, k):
            st_c, eps = carry
            b2 = {kk: (vv + eps if vv.dtype == jnp.float32 else vv)
                  for kk, vv in b.items()}
            # nested jit is inlined under the outer trace
            new_st, logs = step.jit_core(st_c, b2, mi + eps, ml, mw, k)
            loss = logs["train_loss_total"]
            return (new_st, loss * 0.0), loss
        (st2, _), losses = jax.lax.scan(body, (st, jnp.float32(0.0)),
                                        jax.random.split(key, K))
        return losses[-1]

    fn = jax.jit(scanned)
    jax.block_until_ready(fn(state, batch, mixed_img, mixed_lbl, mixed_w))
    os.makedirs(args.logdir, exist_ok=True)
    with jax.profiler.trace(args.logdir):
        jax.block_until_ready(fn(state, batch, mixed_img, mixed_lbl,
                                 mixed_w))

    total_ms, lines = analyze_trace(args.logdir, K, args.top)
    print(json.dumps({"probe": "core", "K": K,
                      "per_iter_ms": round(total_ms, 1),
                      "hrda": args.hrda,
                      "geometry": f"{args.model} {S}^2 b{B}"}), flush=True)
    for line in lines:
        print(line)


if __name__ == "__main__":
    main()
