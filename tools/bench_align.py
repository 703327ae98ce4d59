"""Decompose the alignment-forward cost inside the UDA train step.

The r2 train ablation showed align+refine costs ~535 ms of the 911 ms
Refign-DAFormer step (512^2 b2) — far beyond its FLOPs.  This times each
piece standalone (honest sync) at exactly the train-step shapes.

Usage: python tools/bench_align.py
"""
import functools
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _sync(x):
    import jax
    if not hasattr(x, "ndim"):
        x = jax.tree_util.tree_leaves(x)[0]
    np.asarray(jax.device_get(x[(0,) * x.ndim]))


def timeit(fn, *args, iters=10):
    """Chained-input honest timing (seconds/iter) — see tools/_timing.py.

    Generic chain: adds a zero-scaled scalar of the previous output to the
    first array leaf of the args pytree (identical math, but every
    iteration's input depends on the previous output, so the relay cannot
    elide re-dispatches)."""
    import jax
    from _timing import chained_timeit

    def chain(a, out):
        leaves, td = jax.tree_util.tree_flatten(a)
        o0 = jax.tree_util.tree_leaves(out)[0]
        zero = (o0[(0,) * o0.ndim] * 0).astype(leaves[0].dtype)
        return jax.tree_util.tree_unflatten(td, [leaves[0] + zero]
                                            + leaves[1:])

    return chained_timeit(fn, chain, *args, iters=iters) / 1e3


def main():
    import jax
    import jax.numpy as jnp
    import refign_tpu  # noqa: F401
    from refign_tpu.models.heads.uawarpc import UAWarpCHead
    from refign_tpu.models.vgg import VGG
    from refign_tpu.ops.resize import interpolate
    from refign_tpu.ops.warp import confidence_from_logvar, warp

    B, H, W = 2, 512, 512
    vgg = VGG(model_type="vgg16", out_indices=(2, 3, 4))
    head = UAWarpCHead(in_index=(0, 1), estimate_uncertainty=True)

    rng = np.random.RandomState(0)
    img = jnp.asarray(rng.randn(2 * B, H, W, 3), jnp.bfloat16)
    img256 = jnp.asarray(rng.randn(2 * B, 256, 256, 3), jnp.bfloat16)

    try:
        cpu = jax.local_devices(backend="cpu")[0]
    except RuntimeError:
        cpu = jax.devices()[0]
    with jax.default_device(cpu):
        vvars = vgg.init(jax.random.PRNGKey(0),
                         np.zeros((1, 256, 256, 3), np.float32))
        feats = vgg.apply(vvars, np.zeros((1, H, W, 3), np.float32),
                          extract_only_indices=[-3, -2])
        feats256 = vgg.apply(vvars, np.zeros((1, 256, 256, 3), np.float32),
                             extract_only_indices=[-2, -1])
        hvars = head.init(jax.random.PRNGKey(0), feats, feats, feats256,
                          feats256, (H, W))
    from refign_tpu.parallel.mesh import cast_floating
    vp = {"params": cast_floating(vvars["params"], jnp.bfloat16)}
    # mirror align_fn: head params in the bf16 compute dtype, stats fp32
    hvars = {"params": cast_floating(hvars["params"], jnp.bfloat16),
             "batch_stats": hvars["batch_stats"]}

    f_full = jax.jit(lambda v, x: vgg.apply(
        v, x, extract_only_indices=[-3, -2]))
    t = timeit(f_full, vp, img)
    print(f"vgg full (4x512^2):   {t * 1e3:.2f}ms", flush=True)
    full = f_full(vp, img)

    f_small = jax.jit(lambda v, x: vgg.apply(
        v, x, extract_only_indices=[-2, -1]))
    t = timeit(f_small, vp, img256)
    print(f"vgg small (4x256^2):  {t * 1e3:.2f}ms", flush=True)
    small = f_small(vp, img256)

    pyr_ref = [f[:B] for f in full]
    pyr_trg = [f[B:] for f in full]
    pyr_ref_256 = [f[:B] for f in small]
    pyr_trg_256 = [f[B:] for f in small]

    f_head = jax.jit(lambda hv, a, b, c, d: head.apply(
        hv, a, b, c, d, (H, W))[-1])
    t = timeit(f_head, hvars, pyr_trg, pyr_ref, pyr_trg_256, pyr_ref_256)
    print(f"uawarpc head:         {t * 1e3:.2f}ms", flush=True)

    # chained variant — feeds the output back into the input so the tunnel
    # cannot memoize/elide repeated identical executions
    @jax.jit
    def head_step(a0, a, b, c, d):
        fl, lv = head.apply(hvars, [a0] + a[1:], b, c, d, (H, W))[-1]
        return a0 + (jnp.mean(fl) * 1e-12).astype(a0.dtype)

    a0 = pyr_trg[0]
    _sync(head_step(a0, pyr_trg, pyr_ref, pyr_trg_256, pyr_ref_256))
    a0 = head_step(a0, pyr_trg, pyr_ref, pyr_trg_256, pyr_ref_256)
    _sync(a0)
    t0 = time.perf_counter()
    _sync(a0)
    rpc = time.perf_counter() - t0
    t0 = time.perf_counter()
    for _ in range(10):
        a0 = head_step(a0, pyr_trg, pyr_ref, pyr_trg_256, pyr_ref_256)
    _sync(a0)
    tch = max(time.perf_counter() - t0 - rpc, 1e-9) / 10
    print(f"uawarpc head chained: {tch * 1e3:.2f}ms", flush=True)
    flow, logvar = f_head(hvars, pyr_trg, pyr_ref, pyr_trg_256, pyr_ref_256)

    logits_ref = jnp.asarray(rng.randn(B, H, W, 19), jnp.float32)

    @jax.jit
    def tail(flow, logvar, logits_ref):
        flow = interpolate(flow, (H, W), mode="bilinear",
                           align_corners=False)
        logvar = interpolate(logvar, (H, W), mode="bilinear",
                             align_corners=False)
        cert = confidence_from_logvar(logvar, R=1.0)
        warped, mask = warp(logits_ref, flow, return_mask=True)
        return warped, mask, cert

    t = timeit(lambda a, b, c: tail(a, b, c)[0], flow, logvar, logits_ref)
    print(f"tail (interp+warp):   {t * 1e3:.2f}ms", flush=True)


if __name__ == "__main__":
    main()
