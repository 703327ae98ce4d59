"""grid_sample/warp and correlation ops vs torch oracles."""
import numpy as np
import pytest
import torch
import torch.nn.functional as F

from refign_tpu.ops.correlation import (global_correlation_relu_l2norm,
                                        local_correlation)
from refign_tpu.ops.warp import (flow_to_mapping, grid_sample,
                                 gt_correspondence_mask, mapping_to_flow,
                                 unnormalize_mapping_to_flow, warp)


@pytest.mark.parametrize("align_corners", [True, False])
@pytest.mark.parametrize("padding_mode", ["zeros", "border"])
def test_grid_sample_matches_torch(align_corners, padding_mode):
    rng = np.random.RandomState(0)
    x = rng.randn(2, 9, 13, 4).astype(np.float32)
    grid = (rng.rand(2, 7, 11, 2).astype(np.float32) * 2.6 - 1.3)
    want = F.grid_sample(
        torch.from_numpy(np.transpose(x, (0, 3, 1, 2))),
        torch.from_numpy(grid), mode="bilinear",
        align_corners=align_corners, padding_mode=padding_mode).numpy()
    want = np.transpose(want, (0, 2, 3, 1))
    got = np.asarray(grid_sample(x, grid, align_corners=align_corners,
                                 padding_mode=padding_mode))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_warp_matches_torch_reference_math():
    """warp() == grid_sample with flow-built grid (matching_utils.py:11-49)."""
    rng = np.random.RandomState(1)
    B, H, W, C = 2, 8, 10, 3
    x = rng.randn(B, H, W, C).astype(np.float32)
    flow = (rng.randn(B, H, W, 2) * 2).astype(np.float32)

    xt = torch.from_numpy(np.transpose(x, (0, 3, 1, 2)))
    flo = torch.from_numpy(np.transpose(flow, (0, 3, 1, 2)))
    xx = torch.arange(W).view(1, -1).repeat(H, 1)
    yy = torch.arange(H).view(-1, 1).repeat(1, W)
    grid = torch.stack([xx, yy]).unsqueeze(0).repeat(B, 1, 1, 1).float()
    vgrid = grid + flo
    vgrid[:, 0] = 2.0 * vgrid[:, 0] / max(W - 1, 1) - 1.0
    vgrid[:, 1] = 2.0 * vgrid[:, 1] / max(H - 1, 1) - 1.0
    want = F.grid_sample(xt, vgrid.permute(0, 2, 3, 1), align_corners=True,
                         padding_mode="zeros").numpy()
    want_mask = ((vgrid[:, 0] > -1) & (vgrid[:, 0] < 1)
                 & (vgrid[:, 1] > -1) & (vgrid[:, 1] < 1)).numpy()

    got, mask = warp(x, flow, return_mask=True)
    np.testing.assert_allclose(
        np.asarray(got), np.transpose(want, (0, 2, 3, 1)),
        rtol=1e-5, atol=1e-5)
    np.testing.assert_array_equal(np.asarray(mask), want_mask)


def test_flow_mapping_roundtrip():
    rng = np.random.RandomState(2)
    flow = rng.randn(2, 6, 7, 2).astype(np.float32)
    m = flow_to_mapping(flow)
    f2 = mapping_to_flow(m)
    np.testing.assert_allclose(np.asarray(f2), flow, atol=1e-6)

    # unnormalize: build normalized mapping, compare to manual formula
    nmap = rng.rand(2, 6, 7, 2).astype(np.float32) * 2 - 1
    got = np.asarray(unnormalize_mapping_to_flow(nmap))
    W, H = 7, 6
    mx = (nmap[..., 0] + 1) * (W - 1) / 2.0
    my = (nmap[..., 1] + 1) * (H - 1) / 2.0
    gx, gy = np.meshgrid(np.arange(W), np.arange(H))
    want = np.stack([mx - gx, my - gy], axis=-1)
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_gt_correspondence_mask():
    flow = np.zeros((1, 4, 5, 2), np.float32)
    flow[0, 0, 0] = [-1.0, 0.0]   # maps to x=-1 -> invalid
    flow[0, 1, 1] = [3.0, 2.0]    # maps to (4, 3) -> valid (inclusive)
    flow[0, 2, 2] = [2.5, 0.0]    # maps to x=4.5 -> invalid
    mask = np.asarray(gt_correspondence_mask(flow))
    assert not mask[0, 0, 0]
    assert mask[0, 1, 1]
    assert not mask[0, 2, 2]
    assert mask[0, 3, 3]


def _np_local_correlation(t, s, patch=9):
    """Oracle re-derivation of correlation.cpp:13-41 (k=1, pad=0, stride=1)."""
    B, H, W, C = t.shape
    R = (patch - 1) // 2
    out = np.zeros((B, H, W, patch * patch), np.float32)
    for dy in range(-R, R + 1):
        for dx in range(-R, R + 1):
            pi = (dy + R) * patch + (dx + R)
            for h in range(H):
                for w in range(W):
                    h2, w2 = h + dy, w + dx
                    if 0 <= h2 < H and 0 <= w2 < W:
                        out[:, h, w, pi] = np.sum(
                            t[:, h, w] * s[:, h2, w2], axis=-1)
    return out


def test_local_correlation_matches_cpp_oracle():
    rng = np.random.RandomState(3)
    t = rng.randn(2, 6, 7, 8).astype(np.float32)
    s = rng.randn(2, 6, 7, 8).astype(np.float32)
    want = _np_local_correlation(t, s, patch=5)
    got = np.asarray(local_correlation(t, s, patch_size=5))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_global_correlation_matches_torch_reference():
    import ref_oracle
    modules = ref_oracle.load_ref_module("models.modules")
    layer = modules.GlobalFeatureCorrelationLayer(cyclic_consistency=True)
    rng = np.random.RandomState(4)
    s = rng.randn(2, 8, 5, 6).astype(np.float32)   # B,C... source NHWC
    t = rng.randn(2, 7, 4, 6).astype(np.float32)
    st = torch.from_numpy(np.transpose(s, (0, 3, 1, 2)))
    tt = torch.from_numpy(np.transpose(t, (0, 3, 1, 2)))
    want = layer(st, tt).detach().numpy()  # (B, hs*ws, ht, wt)
    got = np.asarray(global_correlation_relu_l2norm(s, t))
    got_cf = np.transpose(got, (0, 3, 1, 2))
    np.testing.assert_allclose(got_cf, want, rtol=1e-4, atol=1e-5)


def test_local_correlation_pallas_matches_xla():
    """The Pallas local-correlation kernel (interpret mode on CPU) matches
    the XLA shift-loop formulation, including the strip-padding edge."""
    import jax
    import jax.numpy as jnp
    from refign_tpu.ops.correlation import (_local_correlation_xla,
                                            local_correlation)
    rng = np.random.RandomState(11)
    for shape in [(2, 16, 16, 32), (1, 13, 10, 8)]:
        t = jnp.asarray(rng.randn(*shape).astype(np.float32))
        s = jnp.asarray(rng.randn(*shape).astype(np.float32))
        got = local_correlation(t, s, 9, use_pallas=True, interpret=True)
        want = _local_correlation_xla(t, s, 9)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=1e-5, atol=1e-5)


def test_local_correlation_pallas_vjp_matches_autodiff():
    import jax
    import jax.numpy as jnp
    from refign_tpu.ops.correlation import (_local_correlation_xla,
                                            local_correlation)
    rng = np.random.RandomState(12)
    t = jnp.asarray(rng.randn(1, 8, 9, 16).astype(np.float32))
    s = jnp.asarray(rng.randn(1, 8, 9, 16).astype(np.float32))

    def loss_fused(t, s):
        return jnp.sum(jnp.sin(local_correlation(
            t, s, 5, use_pallas=True, interpret=True)))

    def loss_ref(t, s):
        return jnp.sum(jnp.sin(_local_correlation_xla(t, s, 5)))

    g1 = jax.grad(loss_fused, argnums=(0, 1))(t, s)
    g2 = jax.grad(loss_ref, argnums=(0, 1))(t, s)
    for a, e in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(e),
                                   rtol=1e-4, atol=1e-5)


@pytest.mark.fast
@pytest.mark.parametrize("align_corners", [True, False])
@pytest.mark.parametrize("padding_mode", ["zeros", "border"])
def test_grid_sample_packed_matches_torch_extreme_oob(align_corners,
                                                      padding_mode):
    import jax.numpy as jnp
    """The packed single-gather formulation (ops/warp._grid_sample_packed,
    auto-dispatched for C>=384) vs torch, with coordinates far outside the
    image so every anchor-clip slot-reassignment branch is hit."""
    from refign_tpu.ops.warp import _grid_sample_packed
    rng = np.random.RandomState(3)
    x = rng.randn(2, 9, 13, 4).astype(np.float32)
    grid = (rng.rand(2, 7, 11, 2).astype(np.float32) * 5.0 - 2.5)
    want = F.grid_sample(
        torch.from_numpy(np.transpose(x, (0, 3, 1, 2))),
        torch.from_numpy(grid), mode="bilinear",
        align_corners=align_corners, padding_mode=padding_mode).numpy()
    want = np.transpose(want, (0, 2, 3, 1))
    got = np.asarray(_grid_sample_packed(x, jnp.asarray(grid),
                                         align_corners, padding_mode))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


@pytest.mark.fast
def test_grid_sample_packed_grad_matches_4gather():
    import jax.numpy as jnp
    """VJP equality of the two exact formulations (warp sits inside the
    differentiated alignment train step)."""
    import jax
    rng = np.random.RandomState(4)
    x = jnp.asarray(rng.randn(1, 6, 7, 2).astype(np.float32))
    grid = jnp.asarray((rng.rand(1, 5, 5, 2) * 3.0 - 1.5).astype(np.float32))
    from refign_tpu.ops.warp import _grid_sample_packed

    from refign_tpu.ops.warp import _grid_sample_gather4

    def f_packed(x, g):
        return jnp.sum(_grid_sample_packed(x, g, True, "zeros") ** 2)

    def f_gather(x, g):
        return jnp.sum(_grid_sample_gather4(x, g, True, "zeros") ** 2)

    gp = jax.grad(f_packed, argnums=(0, 1))(x, grid)
    gg = jax.grad(f_gather, argnums=(0, 1))(x, grid)
    for a, b in zip(gp, gg):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-5)
