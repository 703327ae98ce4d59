"""Synthetic-flow generators for UAWarpC warp supervision — on-device.

TPU-first replacement for the reference's CPU per-sample transforms
(data_modules/transforms.py:573-1395): every generator is a jitted,
PRNG-keyed function producing a dense pixel flow target_prime -> target and
the warped image, batched with vmap.  The geometric math is identical:

* affine: A = R_alpha R_sh^T D R_sh + translation, sampled uniformly
  (transforms.py:604-645), evaluated on the align_corners=False grid.
* homography: 4-point DLT with corner perturbations ~ U(-t, t)
  (transforms.py:719-782), align-corners grid.
* TPS: 3x3 control grid, precomputed L^-1, thin-plate kernel U = r^2 log r^2
  (transforms.py:864-1032).
* afftps: TPS-of-affine composition via grid_sample with 1e10 out-of-bounds
  sentinels (transforms.py:1084-1109).
* elastic (transforms.py:1168-1325): Gaussian-blurred uniform noise flow
  modulated by random Gaussian blobs.  The blur uses an exact FFT Gaussian
  (circular boundary) instead of cv2's reflect boundary — sigma is
  0.1-0.18 * max(H, W), so edge handling differences are negligible.

All mappings here are [-1, 1] normalized, channel-last (x, y); flows are
pixel displacements.
"""
from __future__ import annotations

import functools
import math
from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.warp import (flow_to_mapping, grid_sample, gt_correspondence_mask,
                        mapping_to_flow, unnormalize_mapping_to_flow, warp)

# ---------------------------------------------------------------------------
# grids
# ---------------------------------------------------------------------------


def _grid_ac_false(H, W):
    """torch affine_grid align_corners=False pixel-center grid."""
    xs = (2.0 * jnp.arange(W) + 1.0) / W - 1.0
    ys = (2.0 * jnp.arange(H) + 1.0) / H - 1.0
    gx, gy = jnp.meshgrid(xs, ys)
    return gx, gy


def _grid_ac_true(H, W):
    """torch.linspace(-1, 1, n) inclusive grid (transforms.py:768-771)."""
    xs = jnp.linspace(-1.0, 1.0, W)
    ys = jnp.linspace(-1.0, 1.0, H)
    gx, gy = jnp.meshgrid(xs, ys)
    return gx, gy


# ---------------------------------------------------------------------------
# affine
# ---------------------------------------------------------------------------


def _affine_params(rng, random_alpha=0.065, random_s=0.6,
                   random_tx=0.3, random_ty=0.1,
                   preserve_aspect_ratio=True):
    """Sample the affine map (A, t) — transforms.py:604-645."""
    k = jax.random.split(rng, 5)
    rot = (jax.random.uniform(k[0]) - 0.5) * 2 * random_alpha
    sh = (jax.random.uniform(k[1]) - 0.5) * 2 * random_alpha
    l1 = 1 + (2 * jax.random.uniform(k[2]) - 1) * random_s
    # fold_in (not a 6th split slot) keeps the default path's PRNG stream
    # identical; k[2] reuse previously made l2 == l1 always (no-op flag)
    l2 = l1 if preserve_aspect_ratio else (
        1 + (2 * jax.random.uniform(jax.random.fold_in(k[2], 1)) - 1)
        * random_s)
    tx = (2 * jax.random.uniform(k[3]) - 1) * random_tx
    ty = (2 * jax.random.uniform(k[4]) - 1) * random_ty

    c, s = jnp.cos(sh), jnp.sin(sh)
    R_sh = jnp.array([[c, -s], [s, c]])
    ca, sa = jnp.cos(rot), jnp.sin(rot)
    R_a = jnp.array([[ca, -sa], [sa, ca]])
    D = jnp.diag(jnp.stack([l1, l2]))
    A = R_a @ R_sh.T @ D @ R_sh
    return A, jnp.stack([tx, ty])


def affine_mapping(rng, H: int, W: int, random_alpha=0.065, random_s=0.6,
                   random_tx=0.3, random_ty=0.1,
                   preserve_aspect_ratio=True) -> jax.Array:
    A, t = _affine_params(rng, random_alpha, random_s, random_tx, random_ty,
                          preserve_aspect_ratio)
    gx, gy = _grid_ac_false(H, W)
    mx = A[0, 0] * gx + A[0, 1] * gy + t[0]
    my = A[1, 0] * gx + A[1, 1] * gy + t[1]
    return jnp.stack([mx, my], axis=-1)


# ---------------------------------------------------------------------------
# homography (4-point DLT, transforms.py:719-782)
# ---------------------------------------------------------------------------


def homography_mapping(rng, H: int, W: int, random_t_hom=0.3,
                       theta: Optional[jax.Array] = None) -> jax.Array:
    base = jnp.array([-1., -1., 1., 1., -1., 1., -1., 1.])
    if theta is None:
        theta = base + (jax.random.uniform(rng, (8,)) - 0.5) * 2 * random_t_hom
    xp, yp = theta[:4], theta[4:]
    x = jnp.array([-1., -1., 1., 1.])
    y = jnp.array([-1., 1., -1., 1.])
    o = jnp.ones(4)
    z = jnp.zeros(4)
    rows_x = jnp.stack([-x, -y, -o, z, z, z, x * xp, y * xp, xp], axis=1)
    rows_y = jnp.stack([z, z, z, -x, -y, -o, x * yp, y * yp, yp], axis=1)
    A = jnp.concatenate([rows_x, rows_y], axis=0)  # (8, 9)
    h8 = jnp.linalg.solve(A[:, :8], -A[:, 8])
    Hm = jnp.concatenate([h8, jnp.ones((1,))])

    gx, gy = _grid_ac_true(H, W)
    X = gx * Hm[0] + gy * Hm[1] + Hm[2]
    Y = gx * Hm[3] + gy * Hm[4] + Hm[5]
    K = gx * Hm[6] + gy * Hm[7] + Hm[8]
    return jnp.stack([X / K, Y / K], axis=-1)


# ---------------------------------------------------------------------------
# TPS (transforms.py:864-1032)
# ---------------------------------------------------------------------------


@functools.lru_cache(maxsize=None)
def _tps_control(grid_size: int = 3, reg_factor: float = 0.0):
    axis = np.linspace(-1, 1, grid_size)
    P_Y, P_X = np.meshgrid(axis, axis)
    P_X = P_X.reshape(-1)  # [-1,-1,-1, 0,0,0, 1,1,1]
    P_Y = P_Y.reshape(-1)  # [-1, 0, 1, ...]
    N = grid_size * grid_size
    d2 = ((P_X[:, None] - P_X[None, :]) ** 2
          + (P_Y[:, None] - P_Y[None, :]) ** 2)
    d2[d2 == 0] = 1.0
    K = d2 * np.log(d2)
    if reg_factor:
        K = K + np.eye(N) * reg_factor
    P = np.stack([np.ones(N), P_X, P_Y], axis=1)
    L = np.block([[K, P], [P.T, np.zeros((3, 3))]])
    Li = np.linalg.inv(L).astype(np.float32)
    return (P_X.astype(np.float32), P_Y.astype(np.float32), Li, N)


def tps_mapping(rng, H: int, W: int, random_t_tps=0.3,
                grid_size: int = 3,
                theta: Optional[jax.Array] = None) -> jax.Array:
    P_X, P_Y, Li, N = _tps_control(grid_size)
    base = jnp.concatenate([jnp.asarray(P_X), jnp.asarray(P_Y)])
    if theta is None:
        theta = base + (jax.random.uniform(rng, (2 * N,)) - 0.5) * 2 * random_t_tps
    Q_X, Q_Y = theta[:N], theta[N:]
    Li = jnp.asarray(Li)
    W_X = Li[:N, :N] @ Q_X
    W_Y = Li[:N, :N] @ Q_Y
    A_X = Li[N:, :N] @ Q_X
    A_Y = Li[N:, :N] @ Q_Y

    gx, gy = _grid_ac_true(H, W)
    dx = gx[..., None] - jnp.asarray(P_X)[None, None, :]
    dy = gy[..., None] - jnp.asarray(P_Y)[None, None, :]
    d2 = dx * dx + dy * dy
    d2 = jnp.where(d2 == 0, 1.0, d2)
    U = d2 * jnp.log(d2)
    mx = A_X[0] + A_X[1] * gx + A_X[2] * gy + jnp.sum(W_X * U, axis=-1)
    my = A_Y[0] + A_Y[1] * gx + A_Y[2] * gy + jnp.sum(W_Y * U, axis=-1)
    return jnp.stack([mx, my], axis=-1)


def _oob_sentinel(grid: jax.Array) -> jax.Array:
    """Set strictly-out-of-bounds grid entries to -1e10
    (transforms.py:1086-1093)."""
    return _oob_sentinel_wrt(grid, grid)


def afftps_mapping(rng, H: int, W: int, random_alpha=0.065, random_s=0.6,
                   random_tx=0.3, random_ty=0.1,
                   random_t_tps_for_afftps=0.0,
                   preserve_aspect_ratio=True) -> jax.Array:
    ka, kt = jax.random.split(rng)
    A, t = _affine_params(ka, random_alpha, random_s, random_tx, random_ty,
                          preserve_aspect_ratio)
    tps = tps_mapping(kt, H, W, random_t_tps_for_afftps)
    # compose: the reference samples the (sentineled) affine mapping image
    # at the tps coordinates with bilinear grid_sample
    # (transforms.py:1084-1109).  The affine field is LINEAR in the pixel
    # grid, so each of grid_sample's four corner reads is itself
    # A @ grid(corner) + t — computable elementwise, no gather.  This
    # mirrors grid_sample's exact corner/weight/clip/zero-padding algebra
    # (ops/warp.py:41-92) including the -1e10 out-of-bounds sentinels, so
    # it produces the gather version's fp32 results while removing the
    # step's single most expensive op (measured 110 ms of the 755 ms
    # UAWarpC train step at 750^2 b6 — artifacts/align_prime_decomp_r04):
    # TPU gathers at C=2 are pathological (warp-lab).
    comp = _compose_affine_at(A, t, tps, H, W)
    return _oob_sentinel_wrt(comp, tps)


def _affine_value(A, t, ix, iy, H: int, W: int):
    """Sentineled affine-mapping image value at integer pixel coords
    (ix, iy): A @ grid_ac_false(ix, iy) + t, with strictly-out-of-bounds
    values replaced by -1e10 exactly like _oob_sentinel."""
    gx = (2.0 * ix + 1.0) / W - 1.0
    gy = (2.0 * iy + 1.0) / H - 1.0
    mx = A[0, 0] * gx + A[0, 1] * gy + t[0]
    my = A[1, 0] * gx + A[1, 1] * gy + t[1]
    inb = (mx > -1) & (mx < 1) & (my > -1) & (my < 1)
    f = inb.astype(mx.dtype)
    return f * mx + (f - 1.0) * 1e10, f * my + (f - 1.0) * 1e10


def _compose_affine_at(A, t, grid: jax.Array, H: int, W: int) -> jax.Array:
    """grid_sample(sentineled affine mapping, grid, align_corners=True,
    padding_mode='zeros') computed analytically — identical corner values,
    weights, clipping and zero-padding as ops/warp.grid_sample."""
    g = grid.astype(jnp.float32)
    gx = (g[..., 0] + 1.0) * 0.5 * (W - 1)
    gy = (g[..., 1] + 1.0) * 0.5 * (H - 1)
    x0 = jnp.floor(gx)
    y0 = jnp.floor(gy)
    wx = gx - x0
    wy = gy - y0

    def corner(ix, iy):
        valid = ((ix >= 0) & (ix <= W - 1) & (iy >= 0) & (iy <= H - 1))
        ixc = jnp.clip(ix, 0, W - 1).astype(jnp.int32).astype(jnp.float32)
        iyc = jnp.clip(iy, 0, H - 1).astype(jnp.int32).astype(jnp.float32)
        vx, vy = _affine_value(A, t, ixc, iyc, H, W)
        f = valid.astype(vx.dtype)
        return vx * f, vy * f

    v00x, v00y = corner(x0, y0)
    v01x, v01y = corner(x0 + 1, y0)
    v10x, v10y = corner(x0, y0 + 1)
    v11x, v11y = corner(x0 + 1, y0 + 1)
    mx = (v00x * (1 - wx) * (1 - wy) + v01x * wx * (1 - wy)
          + v10x * (1 - wx) * wy + v11x * wx * wy)
    my = (v00y * (1 - wx) * (1 - wy) + v01y * wx * (1 - wy)
          + v10y * (1 - wx) * wy + v11y * wx * wy)
    return jnp.stack([mx, my], axis=-1)


def _oob_sentinel_wrt(values: jax.Array, grid: jax.Array) -> jax.Array:
    inb = ((grid[..., 0] > -1) & (grid[..., 0] < 1)
           & (grid[..., 1] > -1) & (grid[..., 1] < 1))[..., None]
    f = inb.astype(values.dtype)
    return f * values + (f - 1.0) * 1e10


# ---------------------------------------------------------------------------
# elastic (transforms.py:1168-1325)
# ---------------------------------------------------------------------------


def _fft_gaussian_blur(x: jax.Array, sigma: jax.Array) -> jax.Array:
    """Exact Gaussian low-pass via FFT (circular boundary)."""
    H, W = x.shape
    fy = jnp.fft.fftfreq(H)
    fx = jnp.fft.rfftfreq(W)
    # FT of a Gaussian with std sigma (pixels): exp(-2 pi^2 sigma^2 f^2)
    gy = jnp.exp(-2.0 * (jnp.pi ** 2) * (sigma ** 2) * fy ** 2)
    gx = jnp.exp(-2.0 * (jnp.pi ** 2) * (sigma ** 2) * fx ** 2)
    return jnp.fft.irfft2(jnp.fft.rfft2(x) * gy[:, None] * gx[None, :],
                          s=(H, W))


def elastic_flow_field(rng, H: int, W: int,
                       min_sigma=0.1, max_sigma=0.08,
                       min_alpha=1.0, max_alpha=1.0) -> jax.Array:
    """Blurred-noise elastic displacement (transforms.py:77-117,1230-1237)."""
    k1, k2, k3, k4 = jax.random.split(rng, 4)
    m = float(max(H, W))
    sigma = m * (min_sigma + max_sigma * jax.random.uniform(k1))
    alpha = m * (min_alpha + max_alpha * jax.random.uniform(k2))
    dx = _fft_gaussian_blur(
        jax.random.uniform(k3, (H, W)) * 2.0 - 1.0, sigma) * alpha
    dy = _fft_gaussian_blur(
        jax.random.uniform(k4, (H, W)) * 2.0 - 1.0, sigma) * alpha
    return jnp.stack([dx, dy], axis=-1)


def elastic_blob_mask(rng, H: int, W: int,
                      min_nbr=5, max_nbr=13,
                      min_sigma_mask=10, max_sigma_mask=40) -> jax.Array:
    """Sum of random Gaussian blobs, clamped to [0,1]
    (transforms.py:1241-1269).  Replicates the reference's center sampling
    (first-axis center drawn from the W range, second from H)."""
    kn, krest = jax.random.split(rng)
    n = jax.random.randint(kn, (), min_nbr, max_nbr + 1)
    keys = jax.random.split(krest, max_nbr)

    rows = jnp.arange(H, dtype=jnp.float32)
    cols = jnp.arange(W, dtype=jnp.float32)

    # randint bounds depend on the traced sigma; draw uniforms instead
    def blob(i, acc):
        ks, kx, ky = jax.random.split(keys[i], 3)
        sigma = jax.random.randint(ks, (), min_sigma_mask,
                                   max_sigma_mask + 1).astype(jnp.float32)
        ux = jax.random.uniform(kx)
        uy = jax.random.uniform(ky)
        # randint(3s, dim - 3s) with traced sigma
        x = jnp.floor(3 * sigma + ux * (W - 6 * sigma + 1))
        y = jnp.floor(3 * sigma + uy * (H - 6 * sigma + 1))
        g1 = jnp.exp(-jnp.square(rows - x) / (2 * sigma * sigma))
        g2 = jnp.exp(-jnp.square(cols - y) / (2 * sigma * sigma))
        # reference div = std * math.sqrt(2*pi) ** 2 (transforms.py:1252):
        # ** binds before *, so the divisor is sigma * 2pi, NOT the
        # (sigma*sqrt(2pi))**2 a 2-D gaussian normalization would suggest —
        # it shifts the m < 1e-6 blob-skip threshold by a factor of sigma
        blob2d = jnp.outer(g1, g2) / (sigma * (2.0 * math.pi))
        mx = jnp.max(blob2d)
        blob2d = jnp.where(mx < 1e-6, 0.0,
                           jnp.clip(2.0 / jnp.maximum(mx, 1e-12) * blob2d,
                                    0.0, 1.0))
        return acc + jnp.where(i < n, 1.0, 0.0) * blob2d

    acc = jax.lax.fori_loop(0, max_nbr, blob,
                            jnp.zeros((H, W), jnp.float32))
    return jnp.clip(acc, 0.0, 1.0)


def apply_elastic(rng, flow: jax.Array) -> jax.Array:
    """Compose a pixel flow with an elastic perturbation
    (transforms.py:1203-1277).  flow: (H, W, 2) pixel units."""
    H, W = flow.shape[:2]
    k1, k2 = jax.random.split(rng)
    pert = elastic_flow_field(k1, H, W)
    mask = elastic_blob_mask(k2, H, W)
    pert = pert * mask[..., None]
    mapping = flow_to_mapping(flow)
    final_mapping = warp(mapping[None], pert[None])[0]
    return mapping_to_flow(final_mapping)


# ---------------------------------------------------------------------------
# composite + application
# ---------------------------------------------------------------------------


def composite_flow(rng, H: int, W: int,
                   include_transforms: Sequence[str] = ("hom", "tps",
                                                        "afftps"),
                   random_alpha=0.065, random_s=0.6,
                   random_tx=0.3, random_ty=0.1,
                   random_t_tps=0.0, random_t_hom=0.3,
                   random_t_tps_for_afftps=0.0,
                   add_elastic: bool = False) -> jax.Array:
    """Random choice among generators (transforms.py:1328-1369); returns a
    pixel flow (H, W, 2)."""
    k_choice, k_gen, k_el = jax.random.split(rng, 3)

    branches = []
    for t in include_transforms:
        if t == "hom":
            branches.append(lambda k: homography_mapping(
                k, H, W, random_t_hom))
        elif t == "affine":
            branches.append(lambda k: affine_mapping(
                k, H, W, random_alpha, random_s, random_tx, random_ty))
        elif t == "tps":
            branches.append(lambda k: tps_mapping(k, H, W, random_t_tps))
        elif t == "afftps":
            branches.append(lambda k: afftps_mapping(
                k, H, W, random_alpha, random_s, random_tx, random_ty,
                random_t_tps_for_afftps))
        else:
            raise ValueError(t)

    idx = jax.random.randint(k_choice, (), 0, len(branches))
    mapping = jax.lax.switch(idx, branches, k_gen)
    flow = unnormalize_mapping_to_flow(mapping)
    if add_elastic:
        flow = apply_elastic(k_el, flow)
    return flow


def apply_synthetic_flow(image: jax.Array, flow: jax.Array,
                         min_fraction_valid_corr: float = 0.1,
                         out_slice=None):
    """Warp image by the synthetic flow; build the supervision mask
    (transforms.py:1384-1395).

    Args:
      image: (H, W, 3); flow: (H, W, 2).
      out_slice: optional (top, left, th, tw) window — compute the warp
        ONLY on that output window (reading from the FULL image).  Exactly
        equals warping at full resolution then slicing: the gather indices
        of output pixel (top+h, left+w) depend only on grid+flow at that
        pixel.  The reference CenterCrops after CompositeFlow
        (megadepth.py:408-413), so the full-res warp outside the crop is
        dead work — at the MegaDepth stage geometry (750^2 load, 520^2
        crop) this removes 52% of the step's most pathological op (a C=3
        gather, measured ~121 ms of the 755 ms step —
        artifacts/align_prime_decomp_r04.txt).  The too-small-mask
        fallback keeps the reference's FULL-grid border-mask sum.
    Returns (image_prime, flow, mask), each sliced to out_slice if given.
    """
    H, W = flow.shape[:2]
    border_mask = gt_correspondence_mask(flow[None])
    too_small = (jnp.sum(border_mask) <
                 H * W * min_fraction_valid_corr)
    if out_slice is None:
        warped, warp_mask = warp(image[None], flow[None],
                                 padding_mode="zeros", return_mask=True)
        mask = jnp.where(too_small, border_mask[0], warp_mask[0])
        return warped[0], flow, mask
    top, left, th, tw = out_slice
    fc = jax.lax.dynamic_slice(flow, (top, left, 0), (th, tw, 2))
    # offset base grid: grid_full[top+h, left+w] = grid(th,tw) + (left,top)
    vgrid = (_grid_xy(th, tw) + jnp.asarray([left, top], jnp.float32)
             + fc.astype(jnp.float32))
    gx = 2.0 * vgrid[..., 0] / max(W - 1, 1) - 1.0
    gy = 2.0 * vgrid[..., 1] / max(H - 1, 1) - 1.0
    grid = jnp.stack([gx, gy], axis=-1)
    warped = grid_sample(image[None], grid[None], align_corners=True,
                         padding_mode="zeros")[0]
    warp_mask = (gx > -1) & (gx < 1) & (gy > -1) & (gy < 1)
    bm = jax.lax.dynamic_slice(border_mask[0], (top, left), (th, tw))
    mask = jnp.where(too_small, bm, warp_mask)
    return warped, fc, mask


def _grid_xy(H: int, W: int) -> jax.Array:
    """(H, W, 2) pixel grid, channel order (x, y), float32."""
    xx = jnp.arange(W, dtype=jnp.float32)[None, :].repeat(H, axis=0)
    yy = jnp.arange(H, dtype=jnp.float32)[:, None].repeat(W, axis=1)
    return jnp.stack([xx, yy], axis=-1)


def batched_composite_flow(rng, images: jax.Array, out_slice=None,
                           **kwargs):
    """vmap over the batch: per-image random flow + warped image + mask.

    images: (B, H, W, 3) -> (image_prime, flow, mask) batched, sliced to
    ``out_slice`` (top, left, th, tw) if given.
    """
    B, H, W, _ = images.shape
    keys = jax.random.split(rng, B)

    def one(key, img):
        flow = composite_flow(key, H, W, **kwargs)
        return apply_synthetic_flow(img, flow, out_slice=out_slice)

    return jax.vmap(one)(keys, images)
