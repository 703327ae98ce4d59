"""Fused depthwise 3x3 conv + bias + GELU — Pallas TPU kernel.

The Mix-FFN's depthwise conv (reference models/backbones/mix_transformer.py:
556-568, `DWConv`) is a pure VPU stencil: 9 shifted multiply-adds per
channel.  XLA's grouped-conv lowering runs it far from the HBM roofline at
MiT's production shapes (round-1 profile: ~15% of HRDA 1080p inference for
stage 3 alone).  This kernel keeps a (H+2, W+2, Ct) input block VMEM-resident
per (batch, channel-tile) grid cell and fuses the 9-tap stencil, the bias
add, and the exact-erf GELU into one pass: one HBM read + one write.

Channel tiling (not spatial) keeps the halo handling trivial — channels are
independent, so blocks never overlap.  Accumulation is fp32; products are
bf16xbf16 -> fp32 (same as XLA's conv accumulation).
"""
from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

# input block budget: the fp32 accumulator + product temps are ~4x the bf16
# block, and Mosaic double-buffers in/out blocks — stay well under 16MB VMEM
_BLOCK_BUDGET_BYTES = 2 * 1024 * 1024


def _pick_channel_tile(Hp: int, Wp: int, C: int,
                       itemsize: int) -> Optional[int]:
    """Largest 128-multiple divisor of C (Mosaic lane constraint) whose
    input block fits the VMEM budget; None if none fits."""
    for tc in (1024, 896, 768, 640, 512, 384, 256, 128):
        if C % tc == 0 and Hp * Wp * tc * itemsize <= _BLOCK_BUDGET_BYTES:
            return tc
    if C < 128 and Hp * Wp * C * itemsize <= _BLOCK_BUDGET_BYTES:
        return C
    return None


def _erf(z: jax.Array) -> jax.Array:
    """fp32 erf via Abramowitz-Stegun 7.1.26 (max abs err 1.5e-7 — far
    below bf16 resolution).  Mosaic has no erf primitive."""
    a1, a2, a3, a4, a5 = (0.254829592, -0.284496736, 1.421413741,
                          -1.453152027, 1.061405429)
    p = 0.3275911
    s = jnp.sign(z)
    za = jnp.abs(z)
    t = 1.0 / (1.0 + p * za)
    poly = ((((a5 * t + a4) * t + a3) * t + a2) * t + a1) * t
    return s * (1.0 - poly * jnp.exp(-za * za))


def _gelu_erf(x: jax.Array) -> jax.Array:
    return 0.5 * x * (1.0 + _erf(x * 0.7071067811865476))


def _kernel(xp_ref, w_ref, b_ref, o_ref, *, H: int, W: int):
    x = xp_ref[0]                        # (H+2, W+2, Ct)
    w = w_ref[...]                       # (3, 3, Ct)
    acc = None
    for i in range(3):
        for j in range(3):
            t = (x[i:i + H, j:j + W, :].astype(jnp.float32)
                 * w[i, j].astype(jnp.float32))
            acc = t if acc is None else acc + t
    acc = acc + b_ref[...].astype(jnp.float32)
    o_ref[0] = _gelu_erf(acc).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("interpret",))
def _dwconv3x3_gelu_pallas(x: jax.Array, w: jax.Array, b: jax.Array,
                           interpret: bool = False) -> jax.Array:
    B, H, W, C = x.shape
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
    Hp, Wp = H + 2, W + 2
    w3 = w.reshape(3, 3, C)
    tc = _pick_channel_tile(Hp, Wp, C, x.dtype.itemsize)
    if tc is None:  # block cannot fit VMEM (large spatial, e.g. stage 1)
        return _dwconv3x3_gelu_xla(x, w, b)
    grid = (B, C // tc)
    return pl.pallas_call(
        functools.partial(_kernel, H=H, W=W),
        out_shape=jax.ShapeDtypeStruct((B, H, W, C), x.dtype),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, Hp, Wp, tc), lambda b_, c: (b_, 0, 0, c)),
            pl.BlockSpec((3, 3, tc), lambda b_, c: (0, 0, c)),
            pl.BlockSpec((tc,), lambda b_, c: (c,)),
        ],
        out_specs=pl.BlockSpec((1, H, W, tc), lambda b_, c: (b_, 0, 0, c)),
        interpret=interpret,
    )(xp, w3, b)


def _dwconv3x3_gelu_xla(x: jax.Array, w: jax.Array,
                        b: jax.Array) -> jax.Array:
    """Shift-and-add formulation — lets XLA fuse the stencil as elementwise
    ops instead of lowering a grouped conv."""
    B, H, W, C = x.shape
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
    acc = None
    for i in range(3):
        for j in range(3):
            t = xp[:, i:i + H, j:j + W, :] * w[i, j, 0]
            acc = t if acc is None else acc + t
    return jax.nn.gelu(acc + b, approximate=False)


def dwconv3x3_gelu(x: jax.Array, w: jax.Array, b: jax.Array,
                   use_pallas: Optional[bool] = None,
                   interpret: bool = False) -> jax.Array:
    """Depthwise 3x3 (stride 1, pad 1) conv + bias + exact GELU.

    Args:
      x: (B, H, W, C) NHWC input.
      w: (3, 3, 1, C) HWIO depthwise kernel (feature_group_count=C layout).
      b: (C,) bias.
    """
    if use_pallas is None:
        use_pallas = jax.default_backend() == "tpu"
    if use_pallas:
        return _dwconv3x3_gelu_pallas(x, w, b, interpret=interpret)
    return _dwconv3x3_gelu_xla(x, w, b)
