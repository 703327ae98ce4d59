"""Flow-based warping (grid_sample) and flow/mapping conversions.

TPU-native re-implementation of the reference's dense-matching utilities
(reference helpers/matching_utils.py:11-225).  Layout is NHWC; flows and
mappings are channel-last ``(..., H, W, 2)`` with order ``(x, y)`` — matching
the reference's channel-first ``(B, 2, H, W)`` after transpose.

``grid_sample`` reproduces torch.nn.functional.grid_sample bilinear sampling
exactly (align_corners True/False, padding_mode zeros/border).  Sampling is
computed in float32 (the reference forces fp32 under AMP,
matching_utils.py:41-43) and cast back.

The gather-based implementation below compiles to XLA dynamic-gathers.  A
fused Pallas kernel can be substituted later for the hot warp paths; the
public API is stable.
"""
from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

__all__ = [
    "grid_sample",
    "warp",
    "flow_to_mapping",
    "mapping_to_flow",
    "unnormalize_mapping_to_flow",
    "gt_correspondence_mask",
    "confidence_from_logvar",
]


def _unnormalize_coord(g: jax.Array, size: int, align_corners: bool) -> jax.Array:
    if align_corners:
        return (g + 1.0) * 0.5 * (size - 1)
    return ((g + 1.0) * size - 1.0) * 0.5


def grid_sample(x: jax.Array, grid: jax.Array, align_corners: bool = True,
                padding_mode: str = "zeros") -> jax.Array:
    """Bilinear grid sample, torch semantics.

    Args:
      x: (B, H, W, C) input.
      grid: (B, Ho, Wo, 2) normalized sample coordinates in [-1, 1], order
        (x, y) like torch.
      align_corners, padding_mode: as in torch ('zeros' or 'border').

    Returns:
      (B, Ho, Wo, C) sampled output, same dtype as x.
    """
    assert padding_mode in ("zeros", "border")
    B, H, W, C = x.shape
    orig_dtype = x.dtype
    xf = x.astype(jnp.float32)
    g = grid.astype(jnp.float32)

    gx = _unnormalize_coord(g[..., 0], W, align_corners)
    gy = _unnormalize_coord(g[..., 1], H, align_corners)

    x0 = jnp.floor(gx)
    y0 = jnp.floor(gy)
    wx = gx - x0
    wy = gy - y0

    def corner(ix, iy):
        """Gather value at integer coords with padding; returns (B,Ho,Wo,C)."""
        if padding_mode == "zeros":
            valid = ((ix >= 0) & (ix <= W - 1) & (iy >= 0) & (iy <= H - 1))
        ixc = jnp.clip(ix, 0, W - 1).astype(jnp.int32)
        iyc = jnp.clip(iy, 0, H - 1).astype(jnp.int32)
        flat_idx = iyc * W + ixc  # (B, Ho, Wo)
        src = xf.reshape(B, H * W, C)
        out = jnp.take_along_axis(
            src, flat_idx.reshape(B, -1, 1), axis=1
        ).reshape(flat_idx.shape + (C,))
        if padding_mode == "zeros":
            out = out * valid[..., None].astype(out.dtype)
        return out

    v00 = corner(x0, y0)
    v01 = corner(x0 + 1, y0)
    v10 = corner(x0, y0 + 1)
    v11 = corner(x0 + 1, y0 + 1)

    wx = wx[..., None]
    wy = wy[..., None]
    out = (v00 * (1 - wx) * (1 - wy) + v01 * wx * (1 - wy)
           + v10 * (1 - wx) * wy + v11 * wx * wy)
    return out.astype(orig_dtype)


def _base_grid(H: int, W: int, dtype=jnp.float32) -> jax.Array:
    """(H, W, 2) pixel-coordinate grid with channel order (x, y)."""
    xx = jnp.arange(W, dtype=dtype)[None, :].repeat(H, axis=0)
    yy = jnp.arange(H, dtype=dtype)[:, None].repeat(W, axis=1)
    return jnp.stack([xx, yy], axis=-1)


def warp(x: jax.Array, flow: jax.Array, padding_mode: str = "zeros",
         return_mask: bool = False):
    """Backward-warp ``x`` by ``flow`` (reference matching_utils.py:11-49).

    Note: the reference short-circuits on an all-zero flow (returning the
    input and an all-ones mask); that data-dependent branch is omitted here —
    the computed result is identical except the strict in-bounds mask excludes
    the last row/column for exactly-zero flow, which never occurs in practice.

    Args:
      x: (B, H, W, C).
      flow: (B, H, W, 2), pixel-displacement (x, y).
    Returns:
      warped (B, H, W, C) [, mask (B, H, W) bool of strictly-in-bounds coords].
    """
    B, H, W, _ = flow.shape
    vgrid = _base_grid(H, W, jnp.float32) + flow.astype(jnp.float32)
    gx = 2.0 * vgrid[..., 0] / max(W - 1, 1) - 1.0
    gy = 2.0 * vgrid[..., 1] / max(H - 1, 1) - 1.0
    grid = jnp.stack([gx, gy], axis=-1)
    out = grid_sample(x, grid, align_corners=True, padding_mode=padding_mode)
    if return_mask:
        mask = (gx > -1) & (gx < 1) & (gy > -1) & (gy < 1)
        return out, mask
    return out


def flow_to_mapping(flow: jax.Array) -> jax.Array:
    """(..., H, W, 2) flow -> absolute pixel mapping."""
    H, W = flow.shape[-3], flow.shape[-2]
    return flow + _base_grid(H, W, flow.dtype)


def mapping_to_flow(mapping: jax.Array) -> jax.Array:
    """(..., H, W, 2) absolute pixel mapping -> flow."""
    H, W = mapping.shape[-3], mapping.shape[-2]
    return mapping - _base_grid(H, W, mapping.dtype)


def unnormalize_mapping_to_flow(nmap: jax.Array) -> jax.Array:
    """[-1,1]-normalized mapping (..., H, W, 2) -> pixel flow.

    Reference helpers/matching_utils.py:77-128.
    """
    H, W = nmap.shape[-3], nmap.shape[-2]
    mx = (nmap[..., 0] + 1.0) * (W - 1) / 2.0
    my = (nmap[..., 1] + 1.0) * (H - 1) / 2.0
    return mapping_to_flow(jnp.stack([mx, my], axis=-1))


def gt_correspondence_mask(flow: jax.Array) -> jax.Array:
    """Mask of flows whose target lands inside the image (inclusive bounds).

    Reference helpers/matching_utils.py:60-74.
    """
    m = flow_to_mapping(flow)
    H, W = flow.shape[-3], flow.shape[-2]
    return ((m[..., 0] >= 0) & (m[..., 0] <= W - 1)
            & (m[..., 1] >= 0) & (m[..., 1] <= H - 1))


def confidence_from_logvar(logvar: jax.Array, R: float = 1.0) -> jax.Array:
    """P_R = 1 - exp(-R^2 / (2 sigma^2)) for a single-Gaussian log-variance.

    Reference helpers/matching_utils.py:52-57.
    """
    var = jnp.exp(logvar)
    return 1.0 - jnp.exp(-(R ** 2) / (2.0 * var))
