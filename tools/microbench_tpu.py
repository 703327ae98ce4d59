"""Per-op TPU microbenchmarks for the HRDA inference hotspots.

Round-1 profiling (PARITY.md): stage-3 Mix-FFN dwconv ~15%, attention ~14%,
LayerNorm fp32 round-trips ~10% of the 1080p slide inference.  This tool
times candidate implementations at the real production shapes so bench-path
changes are driven by measured wins.

Usage (on the axon TPU chip):  python tools/microbench_tpu.py dwconv ln attn
"""
import functools
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def bench(fn, x, *rest, iters=50, warmup=2):
    """Time ``fn(x, *rest)``; fn must be shape-preserving in its first arg.

    Axon-tunnel timing rules (measured, PARITY.md): block_until_ready
    returns BEFORE execution completes, so each iteration feeds the previous
    output back as the input (the data chain forces every execution) and the
    final barrier is a scalar d2h fetch (~45ms RPC, subtracted via the
    baseline measurement below).
    """
    import jax
    import numpy as onp

    def sync(v):
        onp.asarray(jax.device_get(v[(0,) * v.ndim]))

    for attempt in range(4):
        try:
            out = fn(x, *rest)
            sync(out)
            break
        except Exception as e:
            if attempt == 3:
                raise
            print(f"  compile retry {attempt + 1} ({type(e).__name__})",
                  file=sys.stderr, flush=True)
            time.sleep(10)
    assert out.shape == x.shape and out.dtype == x.dtype, (
        "bench() requires a shape-preserving fn")
    for _ in range(warmup):
        out = fn(out, *rest)
    sync(out)
    t0 = time.perf_counter()
    sync(out)
    rpc = time.perf_counter() - t0          # fetch-only baseline
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(out, *rest)
    sync(out)
    return max(time.perf_counter() - t0 - rpc, 1e-9) / iters


# ---------------------------------------------------------------------------
# depthwise 3x3 conv + bias + GELU at the stage-3 Mix-FFN shape
# ---------------------------------------------------------------------------

def bench_dwconv():
    import jax
    import jax.numpy as jnp

    # stage shapes of the 540^2 HRDA crop batch (B=30 crops)
    shapes = [
        ("stage3", (30, 34, 34, 1280)),
        ("stage2", (30, 68, 68, 512)),
        ("stage1", (30, 135, 135, 256)),
    ]
    for name, (B, H, W, C) in shapes:
        x = jnp.asarray(np.random.randn(B, H, W, C), jnp.bfloat16)
        w = jnp.asarray(np.random.randn(3, 3, 1, C) * 0.1, jnp.bfloat16)
        b = jnp.asarray(np.random.randn(C) * 0.1, jnp.bfloat16)

        @jax.jit
        def conv_path(x, w, b):
            y = jax.lax.conv_general_dilated(
                x, w, (1, 1), ((1, 1), (1, 1)),
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
                feature_group_count=C)
            return jax.nn.gelu(y + b, approximate=False)

        @jax.jit
        def shift_path(x, w, b):
            xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
            y = None
            for i in range(3):
                for j in range(3):
                    t = xp[:, i:i + H, j:j + W, :] * w[i, j, 0]
                    y = t if y is None else y + t
            return jax.nn.gelu(y + b, approximate=False)

        t1 = bench(conv_path, x, w, b)
        t2 = bench(shift_path, x, w, b)
        bytes_min = (x.size + x.size) * 2  # read + write, bf16
        roof = bytes_min / 819e9
        print(f"dwconv {name} {x.shape}: conv={t1 * 1e3:.3f}ms "
              f"shift={t2 * 1e3:.3f}ms roofline~{roof * 1e3:.3f}ms",
              flush=True)

        try:
            from refign_tpu.ops.dwconv import dwconv3x3_gelu
            t3 = bench(jax.jit(functools.partial(dwconv3x3_gelu,
                                                 use_pallas=True)), x, w, b)
            print(f"  pallas={t3 * 1e3:.3f}ms", flush=True)
        except Exception as e:
            print(f"  pallas failed: {type(e).__name__}: {e}", flush=True)


# ---------------------------------------------------------------------------
# LayerNorm at stage shapes: fp32 round-trip vs fp32-accum bf16 math
# ---------------------------------------------------------------------------

def bench_ln():
    import jax
    import jax.numpy as jnp

    shapes = [(30, 135, 135, 64), (30, 68, 68, 128), (30, 34, 34, 320),
              (30, 17, 17, 512)]
    for shape in shapes:
        x = jnp.asarray(np.random.randn(*shape), jnp.bfloat16)
        g = jnp.ones((shape[-1],), jnp.float32)
        b = jnp.zeros((shape[-1],), jnp.float32)

        @jax.jit
        def ln_fp32(x, g, b):
            x32 = x.astype(jnp.float32)
            m = jnp.mean(x32, axis=-1, keepdims=True)
            v = jnp.mean(jnp.square(x32 - m), axis=-1, keepdims=True)
            y = (x32 - m) * jax.lax.rsqrt(v + 1e-6)
            return (y * g + b).astype(x.dtype)

        @jax.jit
        def ln_bf16(x, g, b):
            m = jnp.mean(x, axis=-1, keepdims=True, dtype=jnp.float32)
            m2 = jnp.mean(jnp.square(x.astype(jnp.float32)), axis=-1,
                          keepdims=True)
            v = m2 - jnp.square(m)
            scale = (jax.lax.rsqrt(v + 1e-6) * g).astype(x.dtype)
            shift = (b - m * jax.lax.rsqrt(v + 1e-6) * g).astype(x.dtype)
            return x * scale + shift

        t1 = bench(ln_fp32, x, g, b)
        t2 = bench(ln_bf16, x, g, b)
        roof = (np.prod(shape) * 2 * 2) / 819e9
        print(f"ln {shape}: fp32={t1 * 1e3:.3f}ms bf16={t2 * 1e3:.3f}ms "
              f"roofline~{roof * 1e3:.3f}ms", flush=True)


# ---------------------------------------------------------------------------
# SRA attention at stage shapes: einsum vs fused pallas
# ---------------------------------------------------------------------------

def bench_attn():
    import jax
    import jax.numpy as jnp
    from refign_tpu.ops.attention import sra_attention

    shapes = [  # (B, N, H, D, M)
        ("stage1", 30, 135 * 135, 1, 64, 17 * 17),
        ("stage2", 30, 68 * 68, 2, 64, 17 * 17),
        ("stage3", 30, 34 * 34, 5, 64, 17 * 17),
        ("stage4", 30, 17 * 17, 8, 64, 17 * 17),
    ]
    for name, B, N, H, D, M in shapes:
        q = jnp.asarray(np.random.randn(B, N, H, D), jnp.bfloat16)
        k = jnp.asarray(np.random.randn(B, M, H, D), jnp.bfloat16)
        v = jnp.asarray(np.random.randn(B, M, H, D), jnp.bfloat16)
        scale = D ** -0.5

        t1 = bench(jax.jit(functools.partial(sra_attention, scale=scale,
                                             use_pallas=False)), q, k, v)
        line = (f"attn {name} B{B} N{N} H{H} M{M}: "
                f"einsum={t1 * 1e3:.3f}ms")
        try:
            t2 = bench(jax.jit(functools.partial(sra_attention, scale=scale,
                                                 use_pallas=True)), q, k, v)
            line += f" pallas={t2 * 1e3:.3f}ms"
        except Exception as e:
            line += f" pallas FAILED: {type(e).__name__}: {e}"
        print(line, flush=True)




# ---------------------------------------------------------------------------
# warp (grid_sample) + local correlation at UAWarpC production shapes
# (BASELINE north-star kernels; alignment/refign train + eval path)
# ---------------------------------------------------------------------------

def bench_feedback(fn, x, *rest, iters=30, warmup=2):
    """Like bench() but for non-shape-preserving fn: the (scalar) mean of
    each output is fed back into the next input to force every execution."""
    import jax
    import jax.numpy as jnp
    import numpy as onp

    def sync(v):
        onp.asarray(jax.device_get(v[(0,) * v.ndim]))

    @jax.jit
    def step(x, *rest):
        out = fn(x, *rest)
        return x + jnp.mean(out).astype(x.dtype) * 1e-12

    for attempt in range(4):
        try:
            x = step(x, *rest)
            sync(x)
            break
        except Exception as e:
            if attempt == 3:
                raise
            print(f"  compile retry {attempt + 1} ({type(e).__name__})",
                  file=sys.stderr, flush=True)
            time.sleep(10)
    for _ in range(warmup):
        x = step(x, *rest)
    sync(x)
    t0 = time.perf_counter()
    sync(x)
    rpc = time.perf_counter() - t0
    t0 = time.perf_counter()
    for _ in range(iters):
        x = step(x, *rest)
    sync(x)
    return max(time.perf_counter() - t0 - rpc, 1e-9) / iters


def bench_corrwarp():
    import jax
    import jax.numpy as jnp
    from refign_tpu.ops.correlation import local_correlation_relu_l2norm
    from refign_tpu.ops.warp import warp

    # (B, H, W, C): UAWarpC levels for a 512^2 refign image and the
    # 520^2 megadepth pretraining crop
    shapes = [("lvl1 512^2", (2, 128, 128, 256)),
              ("lvl2 512^2", (2, 64, 64, 512)),
              ("lvl1 b8", (8, 128, 128, 256))]
    for name, (B, H, W, C) in shapes:
        t = jnp.asarray(np.random.randn(B, H, W, C), jnp.float32)
        s = jnp.asarray(np.random.randn(B, H, W, C), jnp.float32)
        from refign_tpu.ops.correlation import local_correlation
        tc = bench_feedback(
            lambda t, s: local_correlation(t, s, 9, use_pallas=False),
            t, s)
        # traffic floor: read t + read s once, write (B,H,W,81)
        floor = (2 * B * H * W * C * 4 + B * H * W * 81 * 4) / 819e9
        line = (f"local_corr {name} {t.shape}: xla={tc * 1e3:.3f}ms "
                f"(roofline~{floor * 1e3:.3f}ms)")
        try:
            tp = bench_feedback(
                lambda t, s: local_correlation(t, s, 9, use_pallas=True),
                t, s)
            line += f" pallas={tp * 1e3:.3f}ms"
        except Exception as e:
            line += f" pallas FAILED: {type(e).__name__}"
        print(line, flush=True)

        flow = jnp.asarray(np.random.randn(B, H, W, 2) * 3, jnp.float32)
        tw = bench_feedback(lambda f, s: warp(s, f), flow, s)
        floor_w = (2 * B * H * W * C * 4) / 819e9
        print(f"warp       {name}: {tw * 1e3:.3f}ms "
              f"(roofline~{floor_w * 1e3:.3f}ms)", flush=True)


if __name__ == "__main__":
    import refign_tpu  # noqa: F401
    which = sys.argv[1:] or ["dwconv", "ln", "attn"]
    for w in which:
        {"dwconv": bench_dwconv, "ln": bench_ln, "attn": bench_attn,
         "corrwarp": bench_corrwarp}[w]()
