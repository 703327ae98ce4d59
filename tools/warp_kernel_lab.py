"""Experiment harness for a TPU-fast grid_sample warp (VERDICT r2 item 5).

The reference's warp is a native CUDA grid_sample
(reference helpers/matching_utils.py:41-43) sitting in four hot paths
(align, refine, W-bipath loss, synthetic flows).  Our `ops/warp.py` is a
torch-exact XLA gather formulation measured ~14x off the HBM roofline at
(2,128,128,256) in round 2.  This lab tries every formulation that is
expressible on this toolchain, checks numerics against ops/warp.grid_sample,
and times survivors honestly (chained inputs + scalar d2h sync).

Candidates
----------
V0 gather          — production ops/warp.py (jnp.take_along_axis).
V1 gather_lax      — same math via one fused 4-corner gather with
                     jax.lax.gather on (B, H*W, C) and merged weights.
V2 onehot_xla      — warp as a dense matmul: out[p,c] = sum_s W[p,s] src[s,c]
                     with W the 4-corner bilinear one-hot matrix built from
                     iota compares.  O(N^2) bytes/flops: only plausible for
                     small grids (<= 64^2).
V3 onehot_pallas   — V2 as a Pallas kernel: the (P_TILE, S_TILE) selection
                     matrix is built in VMEM (never touches HBM) and fed
                     straight to the MXU; accumulate over source tiles.
                     fp32 dots (axon Mosaic rejects bf16 matmul operands).

Analysis (for the record, derived before measuring): a matmul warp costs
N^2*C flops vs the gather's N*C bytes; it wins only where N is small or the
flow is band-limited (which UAWarpC's coarse-to-fine flows are NOT at the
fine levels — the upsampled global alignment can displace by a large image
fraction, so band-limited kernels would change numerics).  Mosaic has no
vector gather (only scalar-start dynamic slices), so a direct Pallas gather
kernel is not expressible on this toolchain.

Usage: python tools/warp_kernel_lab.py [tiny|full]
"""
import functools
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


from _timing import chained_timeit  # noqa: E402


def timeit(fn, x, grid, iters=20):
    """Honest axon timing (see tools/_timing.py): chain the output back
    into the input; if the variant is not shape-preserving, feed a fresh
    perturbation of x instead (re-dispatching bit-identical arguments is
    the memoized-looking pattern the methodology forbids).  Returns
    SECONDS per iteration (callers format in ms themselves)."""
    shape_preserving = fn(x, grid).shape == x.shape

    def chain(args, out):
        if shape_preserving:
            return (out, args[1])
        return (x + (out.reshape(-1)[0] * 0).astype(x.dtype), args[1])

    return chained_timeit(fn, chain, x, grid, iters=iters) / 1e3


# --------------------------------------------------------------------------
# candidates.  interface: x (B, H, W, C), grid (B, H, W, 2) normalized,
# align_corners=True, padding zeros (the warp() configuration).
# --------------------------------------------------------------------------

def variant_gather(x, grid):
    from refign_tpu.ops.warp import grid_sample
    return grid_sample(x, grid, align_corners=True, padding_mode="zeros")


def variant_gather_padC(x, grid):
    """Production gather with the channel dim zero-padded to the 128-lane
    width first.  Hypothesis for the small-C full-res logits warp
    (1,540,960,19): gathered rows of width 19 leave 85% of each lane
    transaction empty and may push XLA to a slower strategy; an aligned
    128-wide row moves 6.7x more bytes but gathers coherently.  Measured
    to accept/refute — the sliced-back result is bit-identical."""
    import jax.numpy as jnp
    from refign_tpu.ops.warp import grid_sample

    B, H, W, C = x.shape
    pad = (-C) % 128
    if pad == 0:
        return grid_sample(x, grid, align_corners=True,
                           padding_mode="zeros")
    xp = jnp.pad(x, ((0, 0), (0, 0), (0, 0), (0, pad)))
    return grid_sample(xp, grid, align_corners=True,
                       padding_mode="zeros")[..., :C]


def variant_gather_lax(x, grid):
    """One lax.gather for all 4 corners: gather rows of a (B, H*W, C) view
    at indices stacked (B, 4*N), then combine — halves index overhead and
    gives XLA one big gather to schedule."""
    import jax.numpy as jnp

    B, H, W, C = x.shape
    g = grid.astype(jnp.float32)
    gx = (g[..., 0] + 1.0) * 0.5 * (W - 1)
    gy = (g[..., 1] + 1.0) * 0.5 * (H - 1)
    x0 = jnp.floor(gx); y0 = jnp.floor(gy)
    wx = gx - x0; wy = gy - y0
    N = H * W
    src = x.astype(jnp.float32).reshape(B, N, C)

    outs = []
    weights = [(1 - wx) * (1 - wy), wx * (1 - wy), (1 - wx) * wy, wx * wy]
    corners = [(x0, y0), (x0 + 1, y0), (x0, y0 + 1), (x0 + 1, y0 + 1)]
    idx_list, val_w = [], []
    for (ix, iy), wgt in zip(corners, weights):
        valid = ((ix >= 0) & (ix <= W - 1) & (iy >= 0) & (iy <= H - 1))
        flat = (jnp.clip(iy, 0, H - 1) * W
                + jnp.clip(ix, 0, W - 1)).astype(jnp.int32)
        idx_list.append(flat.reshape(B, N))
        val_w.append((wgt * valid).reshape(B, N))
    idx = jnp.concatenate(idx_list, axis=1)            # (B, 4N)
    wall = jnp.concatenate(val_w, axis=1)              # (B, 4N)
    gathered = jnp.take_along_axis(src, idx[..., None], axis=1)  # (B,4N,C)
    gathered = gathered * wall[..., None]
    out = gathered.reshape(B, 4, N, C).sum(axis=1)
    return out.reshape(B, H, W, C).astype(x.dtype)


def variant_gather_patch22(x, grid):
    """ONE gather of contiguous (2, 2, C) patches instead of four (1, C)
    row gathers: start = (clip(y0, 0, H-2), clip(x0, 0, W-2)), then the
    four corners are selects from the patch with clamped offsets
    (y - start in {0, 1} for every in-bounds corner; out-of-bounds corners
    are zero-weighted, zeros padding).  4x fewer gather indices and each
    read is a coherent 2-row 2C-wide block.  Gathers in the SOURCE dtype
    (production casts to fp32 before the gather — 2x the bytes for bf16)."""
    import jax
    import jax.numpy as jnp

    B, H, W, C = x.shape
    g = grid.astype(jnp.float32)
    gx = (g[..., 0] + 1.0) * 0.5 * (W - 1)
    gy = (g[..., 1] + 1.0) * 0.5 * (H - 1)
    x0 = jnp.floor(gx)
    y0 = jnp.floor(gy)
    wx = (gx - x0)[..., None]
    wy = (gy - y0)[..., None]
    N = H * W
    sy = jnp.clip(y0, 0, H - 2).astype(jnp.int32).reshape(B, N)
    sx = jnp.clip(x0, 0, W - 2).astype(jnp.int32).reshape(B, N)
    starts = jnp.stack([sy, sx], axis=-1)  # (B, N, 2)

    dnums = jax.lax.GatherDimensionNumbers(
        offset_dims=(1, 2, 3), collapsed_slice_dims=(),
        start_index_map=(0, 1))

    def one(xb, st):
        return jax.lax.gather(xb, st, dnums, slice_sizes=(2, 2, C),
                              mode="clip")
    patches = jax.vmap(one)(x, starts)          # (B, N, 2, 2, C)
    patches = patches.astype(jnp.float32)

    oy = (y0.reshape(B, N) - sy)                 # 0/1 for in-bounds corners
    ox = (x0.reshape(B, N) - sx)
    oy = jnp.clip(oy, 0, 1)[..., None].astype(jnp.float32)
    ox = jnp.clip(ox, 0, 1)[..., None].astype(jnp.float32)
    # row/col selects: r0 = patch row for y0, r1 = row for y0+1 (always
    # row oy+? -> for in-bounds y0, row index oy; y1 = oy+1 clipped ... y1
    # row = 1 when y0 in-bounds-of-start else 0 (y0=-1 case)
    oy1 = jnp.clip(y0.reshape(B, N) + 1 - sy, 0, 1)[..., None]
    ox1 = jnp.clip(x0.reshape(B, N) + 1 - sx, 0, 1)[..., None]

    p = patches.reshape(B, N, 4, C)

    def at(oyk, oxk):
        sel = (oyk * 2 + oxk).astype(jnp.int32)  # (B, N, 1)
        return jnp.take_along_axis(p, sel[..., None], axis=2)[:, :, 0]

    v00 = at(oy, ox)
    v01 = at(oy, ox1)
    v10 = at(oy1, ox)
    v11 = at(oy1, ox1)

    def valid(ix, iy):
        return (((ix >= 0) & (ix <= W - 1) & (iy >= 0)
                 & (iy <= H - 1)).reshape(B, N, 1).astype(jnp.float32))
    wxf = wx.reshape(B, N, 1)
    wyf = wy.reshape(B, N, 1)
    out = (v00 * valid(x0, y0) * (1 - wxf) * (1 - wyf)
           + v01 * valid(x0 + 1, y0) * wxf * (1 - wyf)
           + v10 * valid(x0, y0 + 1) * (1 - wxf) * wyf
           + v11 * valid(x0 + 1, y0 + 1) * wxf * wyf)
    return out.reshape(B, H, W, C).astype(x.dtype)


def variant_gather_srcdtype(x, grid):
    """Production 4-gather algebra but gathering in the SOURCE dtype and
    casting the corners to fp32 after — halves gather bytes for bf16."""
    import jax.numpy as jnp
    B, H, W, C = x.shape
    g = grid.astype(jnp.float32)
    gx = (g[..., 0] + 1.0) * 0.5 * (W - 1)
    gy = (g[..., 1] + 1.0) * 0.5 * (H - 1)
    x0 = jnp.floor(gx)
    y0 = jnp.floor(gy)
    wx = (gx - x0)[..., None]
    wy = (gy - y0)[..., None]
    src = x.reshape(B, H * W, C)

    def corner(ix, iy):
        valid = ((ix >= 0) & (ix <= W - 1) & (iy >= 0) & (iy <= H - 1))
        flat = (jnp.clip(iy, 0, H - 1) * W
                + jnp.clip(ix, 0, W - 1)).astype(jnp.int32)
        out = jnp.take_along_axis(src, flat.reshape(B, -1, 1),
                                  axis=1).reshape(flat.shape + (C,))
        return out.astype(jnp.float32) * valid[..., None]

    out = (corner(x0, y0) * (1 - wx) * (1 - wy)
           + corner(x0 + 1, y0) * wx * (1 - wy)
           + corner(x0, y0 + 1) * (1 - wx) * wy
           + corner(x0 + 1, y0 + 1) * wx * wy)
    return out.astype(x.dtype)


def _corner_data(x, grid):
    import jax.numpy as jnp
    B, H, W, C = x.shape
    g = grid.astype(jnp.float32)
    gx = (g[..., 0] + 1.0) * 0.5 * (W - 1)
    gy = (g[..., 1] + 1.0) * 0.5 * (H - 1)
    x0 = jnp.floor(gx); y0 = jnp.floor(gy)
    wx = gx - x0; wy = gy - y0
    N = H * W
    idxs, wgts = [], []
    weights = [(1 - wx) * (1 - wy), wx * (1 - wy), (1 - wx) * wy, wx * wy]
    corners = [(x0, y0), (x0 + 1, y0), (x0, y0 + 1), (x0 + 1, y0 + 1)]
    for (ix, iy), wgt in zip(corners, weights):
        valid = ((ix >= 0) & (ix <= W - 1) & (iy >= 0) & (iy <= H - 1))
        flat = (jnp.clip(iy, 0, H - 1) * W
                + jnp.clip(ix, 0, W - 1)).astype(jnp.int32)
        idxs.append(flat.reshape(B, N))
        wgts.append((wgt * valid).astype(jnp.float32).reshape(B, N))
    return jnp.stack(idxs, -1), jnp.stack(wgts, -1)  # (B, N, 4) each


def variant_onehot_xla(x, grid):
    """Dense selection-matrix einsum.  W is (B, N, N) — O(N^2) HBM, only
    sane for small grids; included to find the crossover."""
    import jax.numpy as jnp
    B, H, W, C = x.shape
    N = H * W
    idx, wgt = _corner_data(x, grid)
    iota = jnp.arange(N, dtype=jnp.int32)
    # (B, N, 4, N) one-hot -> weighted sum over the 4 corners
    sel = (idx[..., None] == iota).astype(jnp.float32)
    Wmat = jnp.einsum("bpk,bpkn->bpn", wgt, sel).astype(jnp.bfloat16)
    src = x.astype(jnp.bfloat16).reshape(B, N, C)
    out = jnp.einsum("bpn,bnc->bpc", Wmat, src,
                     preferred_element_type=jnp.float32)
    return out.reshape(B, H, W, C).astype(x.dtype)


def variant_onehot_pallas(x, grid, p_tile=256, s_tile=512):
    """Pallas: build each (p_tile, s_tile) selection tile in VMEM from the
    corner indices and dot it with the matching source tile on the MXU."""
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl

    B, H, W, C = x.shape
    N = H * W
    idx, wgt = _corner_data(x, grid)  # (B, N, 4)
    src = x.astype(jnp.float32).reshape(B, N, C)
    p_pad = (-N) % p_tile
    if p_pad:
        idx = jnp.pad(idx, ((0, 0), (0, p_pad), (0, 0)),
                      constant_values=-1)
        wgt = jnp.pad(wgt, ((0, 0), (0, p_pad), (0, 0)))
    s_pad = (-N) % s_tile
    if s_pad:
        src = jnp.pad(src, ((0, 0), (0, s_pad), (0, 0)))
    Np, Ns = idx.shape[1], src.shape[1]

    def kernel(idx_ref, wgt_ref, src_ref, o_ref):
        s = pl.program_id(2)
        base = s * s_tile

        @pl.when(s == 0)
        def _():
            o_ref[...] = jnp.zeros_like(o_ref)

        iot = jax.lax.broadcasted_iota(jnp.int32, (p_tile, s_tile), 1) + base
        acc = jnp.zeros((p_tile, s_tile), jnp.float32)
        for kcorner in range(4):
            ik = idx_ref[0, :, kcorner][:, None]          # (p_tile, 1)
            wk = wgt_ref[0, :, kcorner][:, None]
            acc = acc + jnp.where(ik == iot, wk, 0.0)
        o_ref[0] += jnp.dot(acc, src_ref[0],
                            preferred_element_type=jnp.float32)

    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((B, Np, C), jnp.float32),
        interpret=jax.default_backend() == "cpu",
        grid=(B, Np // p_tile, Ns // s_tile),
        in_specs=[
            pl.BlockSpec((1, p_tile, 4), lambda b, p, s: (b, p, 0)),
            pl.BlockSpec((1, p_tile, 4), lambda b, p, s: (b, p, 0)),
            pl.BlockSpec((1, s_tile, C), lambda b, p, s: (b, s, 0)),
        ],
        out_specs=pl.BlockSpec((1, p_tile, C), lambda b, p, s: (b, p, 0)),
    )(idx, wgt, src)
    return out[:, :N].reshape(B, H, W, C).astype(x.dtype)


# --------------------------------------------------------------------------

GEOMETRIES = [
    # (B, H, W, C): the four warp call sites at bench-ish geometry
    (2, 32, 32, 512),    # L3 feature warp
    (2, 64, 64, 512),    # L2 (1/8) feature warp (540-scale: 68^2, rounded)
    (2, 128, 128, 256),  # L1 (1/4) feature warp — the round-2 headline
    (1, 540, 960, 19),   # logits warp in align() at eval res
    # alignment-training call sites (stage 520^2 b6; r4 campaign)
    (6, 130, 130, 256),  # head L1 feature warp x3 passes
    (6, 65, 65, 512),    # head L2 feature warp x3 passes
    (6, 750, 750, 3),    # synthetic-flow image warp (fp32 images)
]

def variant_gather_packed(x, grid):
    """The shipped packed path (ops/warp._grid_sample_packed,
    REFIGN_TPU_WARP_PACK): 2x2 corner neighborhoods pre-packed into 4C
    channels + ONE gather row per output pixel with per-axis slot-weight
    reassignment for clipped anchors."""
    from refign_tpu.ops.warp import _grid_sample_packed
    return _grid_sample_packed(x, grid, True, "zeros")


VARIANTS = [
    ("gather(prod)", variant_gather, None),
    ("gather_packed", variant_gather_packed, None),
    ("gather_padC", variant_gather_padC, None),
    ("gather_lax", variant_gather_lax, None),
    ("gather_p22", variant_gather_patch22, None),
    ("gather_srcdt", variant_gather_srcdtype, None),
    ("onehot_xla", variant_onehot_xla, 64 * 64),     # N cap
    ("onehot_pallas", variant_onehot_pallas, 128 * 128),
]


def roofline_ms(B, H, W, C, bytes_per=2):
    # minimal traffic: read src once + write out once (+ grid, negligible)
    gb = 2 * B * H * W * C * bytes_per / 1e9
    # v5e ~819 GB/s; time_ms = GB / (GB/s) * 1e3.  (r4 fix: an earlier
    # version divided by 0.819 AND multiplied by 1e3 — 1000x too high,
    # which made the printed "x roof" ratios meaningless)
    return gb / 819.0 * 1e3


def main():
    import jax
    import jax.numpy as jnp
    import refign_tpu  # noqa: F401

    tiny = len(sys.argv) > 1 and sys.argv[1] == "tiny"
    geoms = GEOMETRIES[:1] if tiny else GEOMETRIES
    if len(sys.argv) > 2 and sys.argv[1] == "--geoms":
        geoms = [GEOMETRIES[int(i)] for i in sys.argv[2].split(",")]
    global VARIANTS
    if len(sys.argv) > 4 and sys.argv[3] == "--variants":
        want = set(sys.argv[4].split(","))
        VARIANTS = [v for v in VARIANTS if v[0] in want]
    rng = np.random.RandomState(0)
    print(f"{'geometry':>22} {'variant':>14} {'ms':>9} {'x roof':>7}  ok")
    for (B, H, W, C) in geoms:
        # image-like call sites (C<=4: synthetic-flow warp) run fp32 in
        # production; feature warps run bf16
        dt = jnp.float32 if C <= 4 else jnp.bfloat16
        x = jnp.asarray(rng.randn(B, H, W, C), dt)
        # flows up to ~25% of the image + out-of-bounds tails
        flow = rng.randn(B, H, W, 2).astype(np.float32) * (0.15 * W)
        from refign_tpu.ops.warp import _base_grid
        vgrid = np.asarray(_base_grid(H, W)) + flow
        g = np.stack([2 * vgrid[..., 0] / (W - 1) - 1,
                      2 * vgrid[..., 1] / (H - 1) - 1], axis=-1)
        g = jnp.asarray(g, jnp.float32)
        ref = np.asarray(variant_gather(x, g), np.float32)
        roof = roofline_ms(B, H, W, C)
        for name, fn, cap in VARIANTS:
            if cap is not None and H * W > cap:
                # not a missing measurement: the onehot warp is an O(N^2)
                # matmul; print the MXU-floor lower bound showing it is
                # arithmetically non-viable at this size (VERDICT r3 #9)
                n = H * W
                tf = 2.0 * B * n * n * C / 1e12  # fp32-dot TFLOP
                floor_ms = tf / 98.0 * 1e3       # v5e fp32 ~98 TFLOP/s
                print(f"{str((B,H,W,C)):>22} {name:>14}   SKIP   "
                      f"(O(N^2): >= {floor_ms:,.0f} ms MXU floor)")
                continue
            try:
                got = np.asarray(fn(x, g), np.float32)
                ok = np.allclose(got, ref, atol=0.15, rtol=0.05)
                ms = timeit(jax.jit(fn), x, g) * 1e3
                print(f"{str((B,H,W,C)):>22} {name:>14} {ms:9.3f} "
                      f"{ms/roof:7.1f}  {ok}")
            except Exception as e:
                msg = str(e).split(chr(10))[0][:60]
                print(f"{str((B,H,W,C)):>22} {name:>14}     FAIL  "
                      f"({type(e).__name__}: {msg})")


if __name__ == "__main__":
    main()
