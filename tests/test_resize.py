"""Resize ops vs torch.nn.functional.interpolate (the fidelity gate,
SURVEY.md §7.3 item 1)."""
import numpy as np
import pytest
import torch
import torch.nn.functional as F

from refign_tpu.ops.resize import adaptive_avg_pool, interpolate

SHAPES = [
    ((2, 16, 24, 3), (32, 48)),   # upsample
    ((2, 33, 47, 5), (16, 24)),   # downsample, odd
    ((1, 7, 7, 2), (19, 23)),     # non-integer scale
    ((2, 128, 128, 4), (32, 32)),  # 4x down
]


def _torch_resize(x_nhwc, size, mode, align_corners):
    t = torch.from_numpy(np.transpose(x_nhwc, (0, 3, 1, 2)))
    kwargs = {} if mode in ("nearest", "area") else {
        "align_corners": align_corners}
    y = F.interpolate(t, size=size, mode=mode, **kwargs)
    return np.transpose(y.numpy(), (0, 2, 3, 1))


@pytest.mark.parametrize("shape,size", SHAPES)
@pytest.mark.parametrize("mode,align_corners", [
    ("bilinear", False), ("bilinear", True), ("nearest", None),
    ("area", None),
])
def test_interpolate_matches_torch(shape, size, mode, align_corners):
    rng = np.random.RandomState(0)
    x = rng.randn(*shape).astype(np.float32)
    want = _torch_resize(x, size, mode, align_corners)
    got = np.asarray(interpolate(x, size, mode=mode,
                                 align_corners=align_corners))
    # separable two-pass lerp reorders fp32 arithmetic vs torch's fused
    # 4-corner formula; agreement to ~1e-4 absolute is exact-modulo-rounding
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


def test_adaptive_avg_pool_matches_torch():
    rng = np.random.RandomState(1)
    x = rng.randn(2, 37, 53, 4).astype(np.float32)
    t = torch.from_numpy(np.transpose(x, (0, 3, 1, 2)))
    want = np.transpose(
        F.adaptive_avg_pool2d(t, (7, 9)).numpy(), (0, 2, 3, 1))
    got = np.asarray(adaptive_avg_pool(x, (7, 9)))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_global_pool():
    rng = np.random.RandomState(2)
    x = rng.randn(2, 13, 17, 4).astype(np.float32)
    got = np.asarray(adaptive_avg_pool(x, 1))
    want = x.mean(axis=(1, 2), keepdims=True)
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)
