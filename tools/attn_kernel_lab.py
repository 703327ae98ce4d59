"""Experiment harness for the fused SRA-attention Pallas kernel on axon.

Round-1 status (ops/attention.py): the kernel verifies in interpret mode
but the axon Mosaic rejected its bf16 matmuls ("Bad lhs type") in several
formulations, so production uses the einsum path.  This lab tries
candidate formulations on the live toolchain, checks numerics against the
einsum path, and times the survivors honestly (chained inputs + scalar d2h
sync — see tools/microbench_tpu.py for why).

Usage: python tools/attn_kernel_lab.py [tiny|full]
"""
import functools
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _sync(x):
    import jax
    np.asarray(jax.device_get(x[(0,) * x.ndim]))


def timeit(fn, q, k, v, iters=30):
    import jax
    out = fn(q, k, v)
    _sync(out)
    for _ in range(2):
        out = fn(out, k, v)
    _sync(out)
    t0 = time.perf_counter()
    _sync(out)
    rpc = time.perf_counter() - t0
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(out, k, v)
    _sync(out)
    return max(time.perf_counter() - t0 - rpc, 1e-9) / iters


# --------------------------------------------------------------------------
# candidate kernels.  interface: q (B, N, D) pre-scaled, k/v (B, M, D)
# --------------------------------------------------------------------------

def variant_roundtrip(q, k, v):
    """V0: current fused_small_kv_attention (2D operands, batch grid,
    in-kernel q-tile loop)."""
    from refign_tpu.ops.attention import fused_small_kv_attention
    return fused_small_kv_attention(q, k, v)


def variant_qtile_grid(q, k, v, q_tile=512):
    """V1: q-tile axis partitioned by the grid/BlockSpec instead of an
    in-kernel fori loop (round-1 notes said this miscompiled — retry)."""
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl

    B, N, D = q.shape
    M = k.shape[1]
    n_pad = (-N) % q_tile
    if n_pad:
        q = jnp.pad(q, ((0, 0), (0, n_pad), (0, 0)))
    Np = q.shape[1]
    m_pad = (-M) % 8
    if m_pad:
        k = jnp.pad(k, ((0, 0), (0, m_pad), (0, 0)))
        v = jnp.pad(v, ((0, 0), (0, m_pad), (0, 0)))
    Mp = k.shape[1]
    kt = k.transpose(0, 2, 1)

    def kernel(q_ref, kt_ref, v_ref, o_ref):
        qb = q_ref[0]
        logits = jnp.dot(qb, kt_ref[0],
                         preferred_element_type=jnp.float32)
        if m_pad:
            col = jax.lax.broadcasted_iota(jnp.int32, logits.shape, 1)
            logits = jnp.where(col >= M, -jnp.inf, logits)
        probs = jax.nn.softmax(logits, axis=-1)
        o_ref[0] = jnp.dot(probs.astype(v_ref.dtype), v_ref[0],
                           preferred_element_type=jnp.float32
                           ).astype(o_ref.dtype)

    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((B, Np, D), q.dtype),
        grid=(B, Np // q_tile),
        in_specs=[
            pl.BlockSpec((1, q_tile, D), lambda b, t: (b, t, 0)),
            pl.BlockSpec((1, D, Mp), lambda b, t: (b, 0, 0)),
            pl.BlockSpec((1, Mp, D), lambda b, t: (b, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, q_tile, D), lambda b, t: (b, t, 0)),
    )(q, kt, v)
    return out[:, :N] if n_pad else out


def variant_fp32_contract(q, k, v, q_tile=512):
    """V2: like V1 but fp32 contractions (if 'Bad lhs type' is about bf16
    matmul operands)."""
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl

    B, N, D = q.shape
    M = k.shape[1]
    n_pad = (-N) % q_tile
    if n_pad:
        q = jnp.pad(q, ((0, 0), (0, n_pad), (0, 0)))
    Np = q.shape[1]
    m_pad = (-M) % 8
    if m_pad:
        k = jnp.pad(k, ((0, 0), (0, m_pad), (0, 0)))
        v = jnp.pad(v, ((0, 0), (0, m_pad), (0, 0)))
    Mp = k.shape[1]
    kt = k.transpose(0, 2, 1)

    def kernel(q_ref, kt_ref, v_ref, o_ref):
        qb = q_ref[0].astype(jnp.float32)
        logits = jnp.dot(qb, kt_ref[0].astype(jnp.float32))
        if m_pad:
            col = jax.lax.broadcasted_iota(jnp.int32, logits.shape, 1)
            logits = jnp.where(col >= M, -jnp.inf, logits)
        probs = jax.nn.softmax(logits, axis=-1)
        o_ref[0] = jnp.dot(probs, v_ref[0].astype(jnp.float32)
                           ).astype(o_ref.dtype)

    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((B, Np, D), q.dtype),
        grid=(B, Np // q_tile),
        in_specs=[
            pl.BlockSpec((1, q_tile, D), lambda b, t: (b, t, 0)),
            pl.BlockSpec((1, D, Mp), lambda b, t: (b, 0, 0)),
            pl.BlockSpec((1, Mp, D), lambda b, t: (b, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, q_tile, D), lambda b, t: (b, t, 0)),
    )(q, kt, v)
    return out[:, :N] if n_pad else out


def variant_batch_grid_fp32(q, k, v, q_tile=512):
    """V4: grid over batch only, q tiles looped in-kernel with pl.ds
    (amortizes per-program overhead), fp32 contractions."""
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl

    B, N, D = q.shape
    M = k.shape[1]
    n_pad = (-N) % q_tile
    if n_pad:
        q = jnp.pad(q, ((0, 0), (0, n_pad), (0, 0)))
    Np = q.shape[1]
    n_tiles = Np // q_tile
    m_pad = (-M) % 8
    if m_pad:
        k = jnp.pad(k, ((0, 0), (0, m_pad), (0, 0)))
        v = jnp.pad(v, ((0, 0), (0, m_pad), (0, 0)))
    Mp = k.shape[1]
    kt = k.transpose(0, 2, 1)

    def kernel(q_ref, kt_ref, v_ref, o_ref):
        kt_b = kt_ref[0].astype(jnp.float32)
        v_b = v_ref[0].astype(jnp.float32)

        def body(i, _):
            idx = pl.multiple_of(i * q_tile, q_tile)
            qb = q_ref[0, pl.ds(idx, q_tile), :].astype(jnp.float32)
            logits = jnp.dot(qb, kt_b)
            if m_pad:
                col = jax.lax.broadcasted_iota(jnp.int32, logits.shape, 1)
                logits = jnp.where(col >= M, -jnp.inf, logits)
            probs = jax.nn.softmax(logits, axis=-1)
            o_ref[0, pl.ds(idx, q_tile), :] = jnp.dot(
                probs, v_b).astype(o_ref.dtype)
            return 0

        jax.lax.fori_loop(0, n_tiles, body, 0)

    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((B, Np, D), q.dtype),
        grid=(B,),
        in_specs=[
            pl.BlockSpec((1, Np, D), lambda b: (b, 0, 0)),
            pl.BlockSpec((1, D, Mp), lambda b: (b, 0, 0)),
            pl.BlockSpec((1, Mp, D), lambda b: (b, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, Np, D), lambda b: (b, 0, 0)),
    )(q, kt, v)
    return out[:, :N] if n_pad else out


def variant_bf16_dpad(q, k, v, q_tile=512):
    """V5: bf16 matmuls with the contraction dims zero-padded to 128
    (testing whether Mosaic's bf16 rejection is a K<128 constraint).
    Logits are unchanged (zero channels contribute nothing)."""
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl

    B, N, D = q.shape
    M = k.shape[1]
    Dp = 128
    q = jnp.pad(q, ((0, 0), (0, 0), (0, Dp - D)))
    k = jnp.pad(k, ((0, 0), (0, 0), (0, Dp - D)))
    v = jnp.pad(v, ((0, 0), (0, 0), (0, Dp - D)))
    n_pad = (-N) % q_tile
    if n_pad:
        q = jnp.pad(q, ((0, 0), (0, n_pad), (0, 0)))
    Np = q.shape[1]
    m_pad = (-M) % 128                      # Mp also a lane multiple
    if m_pad:
        k = jnp.pad(k, ((0, 0), (0, m_pad), (0, 0)))
        v = jnp.pad(v, ((0, 0), (0, m_pad), (0, 0)))
    Mp = k.shape[1]
    kt = k.transpose(0, 2, 1)

    def kernel(q_ref, kt_ref, v_ref, o_ref):
        logits = jnp.dot(q_ref[0], kt_ref[0],
                         preferred_element_type=jnp.float32)
        if m_pad:
            col = jax.lax.broadcasted_iota(jnp.int32, logits.shape, 1)
            logits = jnp.where(col >= M, -jnp.inf, logits)
        probs = jax.nn.softmax(logits, axis=-1)
        o_ref[0] = jnp.dot(probs.astype(v_ref.dtype), v_ref[0],
                           preferred_element_type=jnp.float32
                           ).astype(o_ref.dtype)

    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((B, Np, Dp), q.dtype),
        grid=(B, Np // q_tile),
        in_specs=[
            pl.BlockSpec((1, q_tile, Dp), lambda b, t: (b, t, 0)),
            pl.BlockSpec((1, Dp, Mp), lambda b, t: (b, 0, 0)),
            pl.BlockSpec((1, Mp, Dp), lambda b, t: (b, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, q_tile, Dp), lambda b, t: (b, t, 0)),
    )(q, kt, v)
    out = out[:, :, :D]
    return out[:, :N] if n_pad else out


def einsum_ref(q, k, v):
    import jax.numpy as jnp
    logits = jnp.einsum("bnd,bmd->bnm", q, k)
    m = jnp.max(logits, axis=-1, keepdims=True)
    import jax
    e = jnp.exp((logits - m).astype(jnp.float32)).astype(q.dtype)
    denom = jnp.sum(e.astype(jnp.float32), axis=-1, keepdims=True)
    out = jnp.einsum("bnm,bmd->bnd", e, v,
                     preferred_element_type=jnp.float32)
    return (out / denom).astype(q.dtype)


def main():
    import jax
    import jax.numpy as jnp
    import refign_tpu  # noqa: F401

    mode = sys.argv[1] if len(sys.argv) > 1 else "tiny"
    if mode == "tiny":
        shapes = [(4, 1024, 64, 289)]
    else:  # production stage shapes, heads folded into batch
        shapes = [(30, 18225, 64, 289), (60, 4624, 64, 289),
                  (150, 1156, 64, 289), (240, 289, 64, 289)]

    variants = [("einsum", jax.jit(einsum_ref)),
                ("v5_bf16_dpad_t512", jax.jit(variant_bf16_dpad)),
                ("v5_bf16_dpad_t2048", jax.jit(functools.partial(
                    variant_bf16_dpad, q_tile=2048)))]

    for (B, N, D, M) in shapes:
        rng = np.random.RandomState(0)
        q = jnp.asarray(rng.randn(B, N, D) * 0.125, jnp.bfloat16)
        k = jnp.asarray(rng.randn(B, M, D), jnp.bfloat16)
        v = jnp.asarray(rng.randn(B, M, D), jnp.bfloat16)
        ref = None
        print(f"shape B{B} N{N} D{D} M{M}:", flush=True)
        for name, fn in variants:
            try:
                out = fn(q, k, v)
                got = np.asarray(out, np.float32)
                if ref is None:
                    ref = got
                    err = 0.0
                else:
                    err = float(np.max(np.abs(got - ref)))
                t = timeit(fn, q, k, v)
                print(f"  {name}: {t * 1e3:.3f}ms  max_err={err:.4f}",
                      flush=True)
            except Exception as e:
                msg = str(e).split("\n")[0][:160]
                print(f"  {name}: FAILED {type(e).__name__}: {msg}",
                      flush=True)


if __name__ == "__main__":
    main()
