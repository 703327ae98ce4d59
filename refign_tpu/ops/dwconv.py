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
import os
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


def _kernel(xp_ref, w_ref, b_ref, o_ref, *, Hs: int, W: int, n: int):
    """Compute the stencil in strips of ``Hs`` rows: the input block stays
    VMEM-resident once, while the fp32 accumulator/product temporaries are
    bounded to one strip (a full-block fp32 accumulator blows the 16MB
    scoped-VMEM limit at production shapes)."""
    w = w_ref[...]                       # (3, 3, Ct)
    b = b_ref[0].astype(jnp.float32)     # (Ct,)

    def strip(s, _):
        base = s * Hs                    # row offset into the padded block
        acc = None
        for i in range(3):
            for j in range(3):
                xs = xp_ref[0, pl.ds(base + i, Hs), j:j + W, :]
                t = xs.astype(jnp.float32) * w[i, j].astype(jnp.float32)
                acc = t if acc is None else acc + t
        o_ref[0, pl.ds(base, Hs)] = _gelu_erf(acc + b).astype(o_ref.dtype)
        return 0

    jax.lax.fori_loop(0, n, strip, 0)


# fp32 strip temporaries budget (the accumulator + a product temp live at
# once; Mosaic scoped VMEM also holds the double-buffered in/out blocks)
_STRIP_BUDGET_BYTES = 256 * 1024


@functools.partial(jax.jit, static_argnames=("interpret",))
def _dwconv3x3_gelu_pallas(x: jax.Array, w: jax.Array, b: jax.Array,
                           interpret: bool = False) -> jax.Array:
    B, H, W, C = x.shape
    w3 = w.reshape(3, 3, C)
    tc = _pick_channel_tile(H + 2, W + 2, C, x.dtype.itemsize)
    if tc is None:  # block cannot fit VMEM (large spatial, e.g. stage 1)
        return _dwconv3x3_gelu_xla(x, w, b)
    Hs = max(1, min(H, _STRIP_BUDGET_BYTES // (W * tc * 4)))
    n = -(-H // Hs)
    Hpad = n * Hs                       # rows padded so strips tile evenly
    xp = jnp.pad(x, ((0, 0), (1, 1 + Hpad - H), (1, 1), (0, 0)))
    Hp, Wp = Hpad + 2, W + 2
    grid = (B, C // tc)
    # bias is kept 2-D: Mosaic assigns 1-D operands a 1024-lane tiling that
    # rejects any partial block; (1, C) gets the standard (8, 128) tiling
    out = pl.pallas_call(
        functools.partial(_kernel, Hs=Hs, W=W, n=n),
        out_shape=jax.ShapeDtypeStruct((B, Hpad, W, C), x.dtype),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, Hp, Wp, tc), lambda b_, c: (b_, 0, 0, c)),
            pl.BlockSpec((3, 3, tc), lambda b_, c: (0, 0, c)),
            pl.BlockSpec((1, tc), lambda b_, c: (0, c)),
        ],
        out_specs=pl.BlockSpec((1, Hpad, W, tc),
                               lambda b_, c: (b_, 0, 0, c)),
        interpret=interpret,
    )(xp, w3, b.reshape(1, C))
    return out[:, :H] if Hpad != H else out


def _dwconv3x3_gelu_conv(x: jax.Array, w: jax.Array,
                         b: jax.Array) -> jax.Array:
    """Grouped-conv lowering (the default arm — fastest measured)."""
    from ..nn.layers import gelu
    y = jax.lax.conv_general_dilated(
        x, w, (1, 1), ((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=x.shape[-1])
    return gelu(y + b)


def _dwconv3x3_gelu_xla(x: jax.Array, w: jax.Array,
                        b: jax.Array) -> jax.Array:
    """Shift-and-add formulation — lets XLA fuse the stencil as elementwise
    ops instead of lowering a grouped conv."""
    B, H, W, C = x.shape
    from ..nn.layers import gelu
    # fp32 multiply-accumulate even for bf16 inputs: this formulation is
    # also the custom_vjp backward of the Pallas kernel, whose forward
    # accumulates in fp32 — the two must compute the same function
    dt = x.dtype
    xp = jnp.pad(x.astype(jnp.float32), ((0, 0), (1, 1), (1, 1), (0, 0)))
    w32 = w.astype(jnp.float32)
    b32 = b.astype(jnp.float32)
    acc = None
    for i in range(3):
        for j in range(3):
            t = xp[:, i:i + H, j:j + W, :] * w32[i, j, 0]
            acc = t if acc is None else acc + t
    return gelu(acc + b32).astype(dt)


@functools.partial(jax.custom_vjp, nondiff_argnums=(0, 1))
def _fused(use_pallas: bool, interpret: bool,
           x: jax.Array, w: jax.Array, b: jax.Array) -> jax.Array:
    if use_pallas:
        return _dwconv3x3_gelu_pallas(x, w, b, interpret=interpret)
    return _dwconv3x3_gelu_xla(x, w, b)


def _fused_fwd(use_pallas, interpret, x, w, b):
    return _fused(use_pallas, interpret, x, w, b), (x, w, b)


def _fused_bwd(use_pallas, interpret, res, g):
    # backward through the (numerically identical) XLA formulation — Pallas
    # kernels have no autodiff rule, and the XLA bwd fuses well anyway
    x, w, b = res
    _, vjp = jax.vjp(_dwconv3x3_gelu_xla, x, w, b)
    return vjp(g)


_fused.defvjp(_fused_fwd, _fused_bwd)


def dwconv3x3_gelu(x: jax.Array, w: jax.Array, b: jax.Array,
                   use_pallas: Optional[bool] = None,
                   interpret: bool = False,
                   train: bool = False) -> jax.Array:
    """Depthwise 3x3 (stride 1, pad 1) conv + bias + exact GELU.

    Args:
      x: (B, H, W, C) NHWC input.
      w: (3, 3, 1, C) HWIO depthwise kernel (feature_group_count=C layout).
      b: (C,) bias.
      train: True on differentiated paths — selects the shift formulation
        (see below).
    """
    if use_pallas is None:
        # Default: grouped-conv lowering on BOTH paths.  Evidence trail:
        #  * inference r2 A/B (PARITY.md, honest sync): conv 4.34 img/s >
        #    shift 4.19 > Pallas strip 3.70;
        #  * the ISOLATED train lab says conv f+b is 10-20x slower than
        #    shift (artifacts/dwconv_train_lab_r05.txt) — but IN CONTEXT
        #    the 512^2 UDA core got SLOWER when the train path switched
        #    to shift (125.4 -> 156-171 ms,
        #    artifacts/uda_core_dwshift_ab_r05.txt): inside the full
        #    graph XLA fuses the grouped conv with its producers/
        #    consumers and the lab's isolated number does not transfer.
        # `train` is accepted so a future toolchain re-test can re-split
        # the dispatch; REFIGN_TPU_DWCONV_PALLAS ∈ {conv, shift/0, 1}
        # forces an arm.
        env = os.environ.get("REFIGN_TPU_DWCONV_PALLAS")
        if env is None or env == "conv":
            return _dwconv3x3_gelu_conv(x, w, b)
        if env in ("0", "false", "off", "shift"):
            use_pallas = False
        else:
            use_pallas = True
    return _fused(bool(use_pallas), bool(interpret), x, w, b)
