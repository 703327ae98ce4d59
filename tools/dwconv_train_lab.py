"""Mix-FFN dwconv+GELU TRAIN-path lab: fwd+bwd A/B of the formulations.

The r2 A/B that fixed grouped-conv as the default measured INFERENCE only
(PARITY.md: conv 4.34 img/s > shift 4.19 > Pallas strip 3.70).  But the
core-parts ablation shows dwconv+GELU costs ~52 ms of the 512^2 train core
(22%), and a grouped conv's BACKWARD is a different XLA lowering entirely:
dw becomes a batch+space reduction that XLA often lowers poorly, while the
shift formulation's backward is just shifts+muls that fuse.  This lab times
value_and_grad of sum(dwconv3x3_gelu(x, w, b)) per formulation at the MiT
stage shapes of the DAFormer-512^2-b2 and HRDA-1024^2 train cores, with the
single-dispatch lax.scan methodology (tools/_timing.py caveats).

Run on the TPU:  python tools/dwconv_train_lab.py [--size 512] [--batch 2]
"""
import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


# MiT-B5 Mix-FFN hidden dims per stage (embed_dim * mlp_ratio) and the
# token-map spatial size at --size 512: stage i has H = size / (4*2^i)
_STAGES = [(64 * 4, 4), (128 * 4, 8), (320 * 4, 16), (512 * 4, 32)]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--size", type=int, default=512)
    ap.add_argument("--batch", type=int, default=2)
    ap.add_argument("--iters", type=int, default=30)
    ap.add_argument("--dtype", default="float32",
                    choices=("float32", "bfloat16"),
                    help="float32 = the TRAIN path (fp32 params win the "
                    "promote_dtype in DWConvGELU); bfloat16 = inference")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import refign_tpu  # noqa: F401  (matmul precision policy)
    from refign_tpu.ops import dwconv as D

    import json

    rng = np.random.RandomState(0)
    print(f"{'stage shape':>24} {'form':>10} {'fwd ms':>8} {'f+b ms':>8}")
    results = {}
    for hidden, stride in _STAGES:
        H = args.size // stride
        B, C = args.batch, hidden
        dtype = jnp.dtype(args.dtype)
        x = jnp.asarray(rng.randn(B, H, W := H, C).astype(np.float32), dtype)
        w = jnp.asarray(rng.randn(3, 3, 1, C).astype(np.float32) * 0.1,
                        dtype)
        b = jnp.asarray(rng.randn(C).astype(np.float32) * 0.1, dtype)

        forms = {
            "conv": lambda x, w, b: D._dwconv3x3_gelu_conv(x, w, b),
            "shift": lambda x, w, b: D._fused(False, False, x, w, b),
            "pallas": lambda x, w, b: D._fused(True, False, x, w, b),
        }
        for name, f in forms.items():
            def loss(x, w, b, f=f):
                return jnp.sum(f(x, w, b).astype(jnp.float32))

            def scan_fwd(x, w, b):
                # STATIONARY input distribution: x is never replaced (the
                # r4 version fed y back as the next x, which with 0.1-scale
                # weights drove activations toward denormals and produced a
                # physically impossible fwd column).  A zero-valued eps
                # derived from each output makes iteration k+1 depend on
                # iteration k so the scan body cannot be hoisted.
                def body(eps, _):
                    y = f(x + eps.astype(x.dtype), w, b)
                    return jnp.sum(y.astype(jnp.float32)) * 0.0, ()
                out, _ = jax.lax.scan(body, jnp.float32(0.0), None,
                                      length=args.iters)
                return out

            def scan_bwd(x, w, b):
                # grads w.r.t. ALL inputs (dw is the expensive reduction in
                # a grouped-conv backward); a tiny SGD update keeps every
                # grad live in the scan carry so nothing is DCE'd, while
                # x stays fixed (stationary distribution)
                def body(c, _):
                    w, b = c
                    gx, gw, gb = jax.grad(loss, argnums=(0, 1, 2))(x, w, b)
                    return (w + 1e-6 * gw, b + 1e-6 * gb), ()
                (w, b), _ = jax.lax.scan(body, (w, b), None,
                                         length=args.iters)
                return w

            row = []
            for tag, sf in (("fwd", scan_fwd), ("f+b", scan_bwd)):
                sf_j = jax.jit(sf)
                try:
                    out = sf_j(x, w, b)
                    jax.block_until_ready(out)
                    t0 = time.perf_counter()
                    out = sf_j(x * 1.0001, w, b)
                    np.asarray(jax.device_get(out[(0,) * out.ndim]))
                    ms = (time.perf_counter() - t0) / args.iters * 1e3
                except Exception as e:  # pallas may reject a shape
                    print(f"{(B,H,W,C)!s:>24} {name:>10} FAIL {tag}: "
                          f"{type(e).__name__}", file=sys.stderr)
                    ms = float("nan")
                row.append(ms)
            results[f"{B}x{H}x{W}x{C}/{name}"] = {
                "fwd_ms": round(row[0], 3), "fwd_bwd_ms": round(row[1], 3)}
            print(f"{(B, H, W, C)!s:>24} {name:>10} "
                  f"{row[0]:8.3f} {row[1]:8.3f}", flush=True)
    print(json.dumps({"metric": "dwconv_train_lab", "size": args.size,
                      "batch": args.batch, "dtype": args.dtype,
                      "results": results}), flush=True)


if __name__ == "__main__":
    main()
