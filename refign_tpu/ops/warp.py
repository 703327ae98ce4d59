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

import os
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
    # Formulation choice (both are exact).  The r4 C>=384 auto-pack rule
    # was justified by numbers that the cited artifact did not contain;
    # the r5 3-round re-measurement (artifacts/warp_remeasure_r05.txt, vs
    # artifacts/warp_lab_packed_r04.txt) shows the packed single-gather
    # path has NO repeatable win at any production geometry — it ties
    # within relay noise at (2,32,32,512) and (6,65,65,512), and LOSES
    # 2-5x consistently at (2,64,64,512) (0.10-0.62 ms 4-gather vs
    # 0.47-0.75 packed), a production UDA-align feature-warp shape.
    # Default is therefore the 4-gather path everywhere;
    # REFIGN_TPU_WARP_PACK=1 forces the packed path for future A/Bs
    # (standing toolchain re-test, PARITY.md).
    pack = os.environ.get("REFIGN_TPU_WARP_PACK", "0")
    if pack == "1":
        return _grid_sample_packed(x, grid, align_corners, padding_mode)
    return _grid_sample_gather4(x, grid, align_corners, padding_mode)


def _grid_sample_gather4(x: jax.Array, grid: jax.Array, align_corners: bool,
                         padding_mode: str) -> jax.Array:
    """Classic 4-corner-gather bilinear formulation (one gather row per
    corner per output pixel); the `grid_sample` docstring's semantics."""
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


def _grid_sample_packed(x: jax.Array, grid: jax.Array, align_corners: bool,
                        padding_mode: str) -> jax.Array:
    """Bilinear grid sample via ONE gather row per output pixel.

    XLA's TPU gather cost is per ROW, nearly independent of row width
    (PARITY.md warp-lab: ~32 ns/row whether C=3 or C=19).  The classic
    4-corner formulation spends 4 gathers per output pixel; here the
    input is pre-packed so packed[y, x] = (imgp[y,x], imgp[y,x+1],
    imgp[y+1,x], imgp[y+1,x+1]) over a 1-pixel bottom/right padding
    (zeros or edge to match padding_mode), and a single gather at the
    clipped anchor (floor(gy), floor(gx)) fetches all four corners —
    4x fewer gather rows for 4x wider rows (pure-bandwidth pack).

    Exactness: identical corner values, weights, clipping and padding as
    the 4-gather path.  When the anchor clips (coordinate outside the
    image), the true corner lands on the OTHER slot of the packed pair;
    the per-axis slot weights below reassign it:

      zeros:  u0 = (1-w)*[0 <= c0 <= N-1] + w*[c0 == -1]
              u1 = w*[0 <= c0 <= N-2]
        (out-of-bounds corners contribute 0 — the pad row/col is zero and
        the indicator drops them)
      border: u0 = (1-w) + w*[c0 < 0]
              u1 = w*[c0 >= 0]
        (corners clamp to the edge; the edge-pad makes slot 1 hold the
        clamped value when c0 == N-1, and negative coords fold onto
        slot 0)

    Weights/accumulation in fp32, like the 4-gather path.
    """
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

    if padding_mode == "zeros":
        xp = jnp.pad(xf, ((0, 0), (0, 1), (0, 1), (0, 0)))
    else:
        xp = jnp.pad(xf, ((0, 0), (0, 1), (0, 1), (0, 0)), mode="edge")
    packed = jnp.concatenate(
        [xp[:, :H, :W], xp[:, :H, 1:], xp[:, 1:, :W], xp[:, 1:, 1:]],
        axis=-1)  # (B, H, W, 4C)

    ax = jnp.clip(x0, 0, W - 1).astype(jnp.int32)
    ay = jnp.clip(y0, 0, H - 1).astype(jnp.int32)
    flat_idx = ay * W + ax  # (B, Ho, Wo)
    p = jnp.take_along_axis(
        packed.reshape(B, H * W, 4 * C),
        flat_idx.reshape(B, -1, 1), axis=1).reshape(flat_idx.shape + (4 * C,))

    def axis_weights(c0, w, N):
        if padding_mode == "zeros":
            u0 = ((1.0 - w) * ((c0 >= 0) & (c0 <= N - 1))
                  + w * (c0 == -1))
            u1 = w * ((c0 >= 0) & (c0 <= N - 2))
        else:
            u0 = (1.0 - w) + w * (c0 < 0)
            u1 = w * (c0 >= 0)
        return u0, u1

    u0x, u1x = axis_weights(x0, wx, W)
    u0y, u1y = axis_weights(y0, wy, H)
    s00, s01, s10, s11 = (p[..., :C], p[..., C:2 * C],
                          p[..., 2 * C:3 * C], p[..., 3 * C:])
    out = (s00 * (u0x * u0y)[..., None] + s01 * (u1x * u0y)[..., None]
           + s10 * (u0x * u1y)[..., None] + s11 * (u1x * u1y)[..., None])
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
