"""Round-3 SRA-attention optimization lab (VERDICT r2 item 1).

The r2 ablation charges attention ~67.5 ms of the 195 ms/image bench, and
the per-block stage times (attn_kernel_lab) put ~2/3 of that in stage 3
(40 blocks x 0.78 ms).  Stage 3's traffic is dominated by the (B*H, N, M)
logits tensor (~100 MB bf16/block) read+written ~5x by the einsum path:
  write L | read L (max) | read L, write E (exp, + fused denom) | read E (PV)
This lab measures formulations that remove passes:

  V0 einsum_bf16      — production path (ops/attention.py), baseline.
  V1 static_shift     — softmax max-subtraction replaced by a STATIC shift
                        C: e = exp(l - C).  softmax is shift-invariant, so
                        the result is mathematically identical while the
                        max REDUCTION PASS over L disappears.  Safe domain:
                        logits <= C + 88 (fp32 exp overflow); LN'd MiT
                        features keep |l| < ~30, C=20 covers l <= 108.
  V2 mn_layout        — logits materialized as (B, H, M, N): M (289) pads
                        sublanes (16) instead of lanes (128): 304x1280 vs
                        1168x384 tiles, ~13-24% fewer bytes per pass.
  V3 shift+mn         — V1 + V2.
  V4 pallas_wholeN    — fused kernel, one grid program per (b*h): the whole
                        (N, M) logits tile stays in VMEM (1.4 MB fp32 at
                        stage 3).  fp32 dots (Mosaic rejects bf16 operands
                        on this toolchain — r2); grid overhead amortized
                        over all of N instead of 512-tiles.
  V5 pallas_bf16_pl_dot — one more bf16 attempt via pl.dot (r2 tried
                        jnp.dot/dot_general; pl.dot may lower differently).

Numerics are checked against V0 (bf16 tolerances); timing is honest
(chained inputs + scalar d2h sync, PARITY.md axon rules).

Usage: python tools/attn_opt_lab.py [stage3|all]
"""
import functools
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SHIFT_C = 20.0

# bench production shapes: (B, N, H, D, M), B = 30 slide crops
STAGES = {
    "stage1": (30, 18225, 1, 64, 256),
    "stage2": (30, 4624, 2, 64, 289),
    "stage3": (30, 1156, 5, 64, 289),
    "stage4": (30, 289, 8, 64, 289),
}
BLOCKS = {"stage1": 3, "stage2": 6, "stage3": 40, "stage4": 3}


from _timing import chained_timeit  # noqa: E402


def timeit(fn, q, k, v, iters=30):
    """Honest axon timing (tools/_timing.py); returns SECONDS/iter."""
    import jax
    jfn = jax.jit(fn)

    def chain(args, out):
        q = args[0] + (out[0, 0, 0, 0] * 0).astype(args[0].dtype)
        return (q,) + args[1:]

    return chained_timeit(jfn, chain, q, k, v, iters=iters) / 1e3


# ---------------------------------------------------------------------------
# candidates: q (B, N, H, D) UNscaled, k/v (B, M, H, D); scale folded inside
# ---------------------------------------------------------------------------

def v0_einsum_bf16(q, k, v, scale):
    from refign_tpu.ops.attention import _attn_einsum_bf16
    return _attn_einsum_bf16(q, k, v, scale)


def v1_static_shift(q, k, v, scale):
    import jax
    import jax.numpy as jnp
    logits = jnp.einsum("bnhd,bmhd->bhnm", q, k) * jnp.asarray(
        scale, jnp.bfloat16)
    e = jnp.exp(logits.astype(jnp.float32) - SHIFT_C).astype(jnp.bfloat16)
    denom = jnp.sum(e.astype(jnp.float32), axis=-1, keepdims=True)
    out = jnp.einsum("bhnm,bmhd->bnhd", e, v,
                     preferred_element_type=jnp.float32)
    return (out / denom.transpose(0, 2, 1, 3)).astype(q.dtype)


def v2_mn_layout(q, k, v, scale):
    import jax.numpy as jnp
    logits = jnp.einsum("bmhd,bnhd->bhmn", k, q) * jnp.asarray(
        scale, jnp.bfloat16)                       # (B, H, M, N)
    m = jnp.max(logits, axis=2, keepdims=True)
    e = jnp.exp((logits - m).astype(jnp.float32)).astype(jnp.bfloat16)
    denom = jnp.sum(e.astype(jnp.float32), axis=2)          # (B, H, N)
    out = jnp.einsum("bhmn,bmhd->bnhd", e, v,
                     preferred_element_type=jnp.float32)
    return (out / denom.transpose(0, 2, 1)[..., None]).astype(q.dtype)


def v3_shift_mn(q, k, v, scale):
    import jax.numpy as jnp
    logits = jnp.einsum("bmhd,bnhd->bhmn", k, q) * jnp.asarray(
        scale, jnp.bfloat16)
    e = jnp.exp(logits.astype(jnp.float32) - SHIFT_C).astype(jnp.bfloat16)
    denom = jnp.sum(e.astype(jnp.float32), axis=2)
    out = jnp.einsum("bhmn,bmhd->bnhd", e, v,
                     preferred_element_type=jnp.float32)
    return (out / denom.transpose(0, 2, 1)[..., None]).astype(q.dtype)


def _pallas_wholeN(q, k, v, scale, use_pl_dot=False, bf16=False):
    """One grid program per (b*h); full (N, M) logits resident in VMEM."""
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl

    B, N, H, D = q.shape
    M = k.shape[1]
    qf = (q * scale).transpose(0, 2, 1, 3).reshape(B * H, N, D)
    kt = k.transpose(0, 2, 3, 1).reshape(B * H, D, M)
    vf = v.transpose(0, 2, 1, 3).reshape(B * H, M, D)
    n_pad = (-N) % 8
    if n_pad:
        qf = jnp.pad(qf, ((0, 0), (0, n_pad), (0, 0)))
    Np = qf.shape[1]
    m_pad = (-M) % 128
    if m_pad:
        kt = jnp.pad(kt, ((0, 0), (0, 0), (0, m_pad)))
        vf = jnp.pad(vf, ((0, 0), (0, m_pad), (0, 0)))
    Mp = kt.shape[2]

    def kernel(q_ref, kt_ref, v_ref, o_ref):
        if bf16:
            qb, ktb, vb = q_ref[0], kt_ref[0], v_ref[0]
        else:
            qb = q_ref[0].astype(jnp.float32)
            ktb = kt_ref[0].astype(jnp.float32)
            vb = v_ref[0].astype(jnp.float32)
        if use_pl_dot:
            logits = pl.dot(qb, ktb)
        else:
            logits = jnp.dot(qb, ktb, preferred_element_type=jnp.float32)
        if m_pad:
            col = jax.lax.broadcasted_iota(jnp.int32, logits.shape, 1)
            logits = jnp.where(col >= M, -jnp.inf, logits)
        e = jnp.exp(logits - SHIFT_C)
        denom = jnp.sum(e, axis=-1, keepdims=True)
        if bf16:
            pv = jnp.dot(e.astype(jnp.bfloat16), vb,
                         preferred_element_type=jnp.float32)
        else:
            pv = jnp.dot(e, vb, preferred_element_type=jnp.float32)
        o_ref[0] = (pv / denom).astype(o_ref.dtype)

    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((B * H, Np, D), q.dtype),
        interpret=jax.default_backend() == "cpu",
        grid=(B * H,),
        in_specs=[
            pl.BlockSpec((1, Np, D), lambda b: (b, 0, 0)),
            pl.BlockSpec((1, D, Mp), lambda b: (b, 0, 0)),
            pl.BlockSpec((1, Mp, D), lambda b: (b, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, Np, D), lambda b: (b, 0, 0)),
    )(qf, kt, vf)
    out = out[:, :N] if n_pad else out
    return out.reshape(B, H, N, D).transpose(0, 2, 1, 3)


def v4_pallas_wholeN(q, k, v, scale):
    return _pallas_wholeN(q, k, v, scale, use_pl_dot=False, bf16=False)


def v5_pallas_bf16_pl_dot(q, k, v, scale):
    return _pallas_wholeN(q, k, v, scale, use_pl_dot=True, bf16=True)


VARIANTS = [
    ("v0 einsum_bf16", v0_einsum_bf16),
    ("v1 static_shift", v1_static_shift),
    ("v2 mn_layout", v2_mn_layout),
    ("v3 shift+mn", v3_shift_mn),
    ("v4 pallas_wholeN", v4_pallas_wholeN),
    ("v5 pallas_bf16", v5_pallas_bf16_pl_dot),
]


def sr_conv_experiment():
    """E7: the stage-1 spatial-reduction conv (k8 s8 on 135^2x64) vs the
    slice+reshape+matmul formulation (stride==kernel => non-overlapping
    patches; conv touches only rows/cols 0..127)."""
    import jax
    import jax.numpy as jnp

    B, Hs, C = 30, 135, 64
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(B, Hs, Hs, C), jnp.bfloat16)
    w = jnp.asarray(rng.randn(8, 8, C, C) * 0.02, jnp.bfloat16)
    b = jnp.asarray(rng.randn(C) * 0.01, jnp.bfloat16)

    def conv(x, w=w, b=b):
        return jax.lax.conv_general_dilated(
            x, w, window_strides=(8, 8), padding="VALID",
            dimension_numbers=("NHWC", "HWIO", "NHWC")) + b

    def matmul(x, w=w, b=b):
        n = Hs // 8
        xs = x[:, :n * 8, :n * 8, :]
        xs = xs.reshape(B, n, 8, n, 8, C).transpose(0, 1, 3, 2, 4, 5)
        xs = xs.reshape(B, n * n, 8 * 8 * C)
        wm = w.reshape(8 * 8 * C, C)
        return (xs @ wm + b).reshape(B, n, n, C)

    ref = np.asarray(conv(x), np.float32)
    got = np.asarray(matmul(x), np.float32)
    ok = np.allclose(got, ref, atol=0.3, rtol=0.05)
    t_conv = timeit(lambda a, _k, _v: conv(a), x, x, x) * 1e3
    t_mm = timeit(lambda a, _k, _v: matmul(a), x, x, x) * 1e3
    print(f"  sr-conv k8s8 (30,135,135,64): conv {t_conv:.3f}ms  "
          f"matmul {t_mm:.3f}ms  match={ok}")


def main():
    import jax
    import jax.numpy as jnp
    import refign_tpu  # noqa: F401

    which = sys.argv[1] if len(sys.argv) > 1 else "all"
    stages = {"stage3": ["stage3"]}.get(which, list(STAGES))
    rng = np.random.RandomState(0)
    total = {name: 0.0 for name, _ in VARIANTS}
    for sname in stages:
        B, N, H, D, M = STAGES[sname]
        scale = D ** -0.5
        q = jnp.asarray(rng.randn(B, N, H, D), jnp.bfloat16)
        k = jnp.asarray(rng.randn(B, M, H, D), jnp.bfloat16)
        v = jnp.asarray(rng.randn(B, M, H, D), jnp.bfloat16)
        ref = np.asarray(v0_einsum_bf16(q, k, v, scale), np.float32)
        print(f"{sname} (B={B} N={N} H={H} D={D} M={M}) x"
              f"{BLOCKS[sname]} blocks:")
        for name, fn in VARIANTS:
            try:
                got = np.asarray(fn(q, k, v, scale), np.float32)
                ok = np.allclose(got, ref, atol=0.08, rtol=0.05)
                ms = timeit(functools.partial(fn, scale=scale), q, k, v) * 1e3
                total[name] += ms * BLOCKS[sname]
                print(f"  {name:>18}: {ms:8.3f} ms/block  "
                      f"({ms*BLOCKS[sname]:7.2f} ms/image)  ok={ok}",
                      flush=True)
            except Exception as e:
                msg = str(e).split(chr(10))[0][:70]
                print(f"  {name:>18}:     FAIL ({type(e).__name__}: {msg})",
                      flush=True)
    if len(stages) > 1:
        print("per-image totals (all stages):")
        for name, t in total.items():
            print(f"  {name:>18}: {t:7.2f} ms/image")
    sr_conv_experiment()


if __name__ == "__main__":
    main()
