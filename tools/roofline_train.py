"""Roofline-account the UDA train step's two programs (r3).

AOT-compiles ``jit_prefix`` and ``jit_core`` at a given geometry and prints
XLA's cost analysis (FLOPs + HBM bytes accessed) next to the v5e floors,
the same accounting PARITY.md carries for the inference bench.  This
localizes whether the measured ~900 ms differentiated core is bytes (a
real roofline), or scheduling slack that optimization can recover.

Runs on whatever backend JAX selects (JAX_PLATFORMS); on CPU the compiled
layouts differ from TPU so the bytes figure is an estimate, but fusion
decisions are broadly similar.  Run under the default axon env on the
chip for the authoritative numbers; the measured ~900 ms figure it was
written to explain turned out to be a tool bug (see PARITY.md provenance
note) — the real core is ~220 ms.

Usage: python tools/roofline_train.py [--size 512] [--batch 2] [--hrda]
"""
import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

V5E_HBM_GBPS = 819.0
V5E_BF16_TFLOPS = 197.0


def report(name, compiled):
    ca = compiled.cost_analysis()
    if isinstance(ca, list):
        ca = ca[0]
    flops = ca.get("flops", 0.0)
    byts = ca.get("bytes accessed", 0.0)
    t_hbm = byts / (V5E_HBM_GBPS * 1e9) * 1e3
    t_mxu = flops / (V5E_BF16_TFLOPS * 1e12) * 1e3
    print(f"{name:>8}: {flops/1e9:10.1f} GFLOP  {byts/1e9:9.2f} GB  "
          f"HBM floor {t_hbm:7.1f} ms  MXU floor {t_mxu:6.1f} ms")
    # largest bytes contributors, if per-op keys are present
    ops = sorted(((v, k) for k, v in ca.items()
                  if k.startswith("bytes accessed") and k != "bytes accessed"),
                 reverse=True)[:8]
    for v, k in ops:
        print(f"          {k}: {v/1e9:.2f} GB")
    return flops, byts


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--size", type=int, default=512)
    ap.add_argument("--batch", type=int, default=2)
    ap.add_argument("--hrda", action="store_true")
    ap.add_argument("--remat", action="store_true")
    ap.add_argument("--no-fdist", action="store_true")
    args = ap.parse_args()

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
        backbone=MixVisionTransformer(model_type="mit_b5",
                                      drop_path_rate=0.1, remat=args.remat),
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
    align_params = {"backbone": ab["params"], "head": ah["params"],
                    "head_stats": ah["batch_stats"]}
    cfg = UDAConfig(use_hrda=args.hrda, use_refign=True, use_align=True,
                    adapt_to_ref=False,
                    enable_fdist=not args.no_fdist)
    tx, _ = make_uda_optimizer(variables["params"], 6e-4, 0.01, 40000)
    state = init_uda_state(variables["params"],
                           variables.get("batch_stats", {}), tx)
    step = make_uda_train_step(seg, align_backbone, align_head, tx, cfg)

    t0 = time.time()
    lowered = step.jit_prefix.lower(state, batch, align_params, key,
                                    use_ref_as_target=False)
    pref = lowered.compile()
    print(f"[prefix compiled in {time.time()-t0:.0f}s]")
    fp, bp = report("prefix", pref)

    # shapes of the prefix outputs feed the core
    mixed_img = batch["image_trg"]
    mixed_lbl = batch["semantic_src"]
    mixed_w = np.ones((B, S, S), np.float32)
    t0 = time.time()
    lowered = step.jit_core.lower(state, batch, mixed_img, mixed_lbl,
                                  mixed_w, key)
    core = lowered.compile()
    print(f"[core compiled in {time.time()-t0:.0f}s]")
    fc, bc = report("core", core)

    t_tot = (bp + bc) / (V5E_HBM_GBPS * 1e9) * 1e3
    print(f"   total: HBM floor {t_tot:.1f} ms/step "
          f"(MXU floor {(fp+fc)/(V5E_BF16_TFLOPS*1e12)*1e3:.1f} ms)")


if __name__ == "__main__":
    main()
