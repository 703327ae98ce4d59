"""Host-side transform pipeline tests (PIL/numpy)."""
import numpy as np
import pytest
from PIL import Image

from refign_tpu.data import transforms as T


def _sample(w=32, h=24, with_pts=False):
    rng = np.random.RandomState(0)
    s = {
        "image": Image.fromarray(
            rng.randint(0, 255, (h, w, 3), dtype=np.uint8)),
        "semantic": Image.fromarray(
            rng.randint(0, 19, (h, w)).astype(np.uint8)),
        "filename": "x.png",
    }
    if with_pts:
        s["image_ref"] = Image.fromarray(
            rng.randint(0, 255, (h, w, 3), dtype=np.uint8))
        s["corr_pts"] = np.array([[4.0, 5.0], [30.0, 20.0]], np.float32)
        s["corr_pts_ref"] = np.array([[6.0, 7.0], [29.0, 21.0]], np.float32)
        del s["semantic"]
    return s


def test_resize_exact_and_short_side():
    s = _sample()
    out = T.Resize(size=[12, 16])(dict(s))
    assert out["image"].size == (16, 12)
    assert out["semantic"].size == (16, 12)
    # short-side int resize
    out = T.Resize(size=12)(dict(s))
    assert min(out["image"].size) == 12


def test_resize_scales_corr_pts():
    s = _sample(with_pts=True)
    out = T.Resize(size=[12, 16], apply_keys=[
        "image", "image_ref", "corr_pts", "corr_pts_ref"])(dict(s))
    np.testing.assert_allclose(out["corr_pts"][0],
                               [4.0 * 16 / 32, 5.0 * 12 / 24])


def test_to_tensor_and_normalize():
    s = T.ToTensor()(_sample())
    assert s["image"].dtype == np.uint8 and s["image"].shape == (24, 32, 3)
    s = T.ConvertImageDtype()(s)
    assert s["image"].dtype == np.float32 and s["image"].max() <= 1.0
    assert s["semantic"].dtype == np.int32
    s = T.Normalize()(s)
    assert abs(float(s["image"].mean())) < 3.0


def test_random_crop_and_flip_pts():
    s = T.ToTensor()(_sample(with_pts=True))
    out = T.RandomCrop(size=[16, 16], apply_keys=[
        "image", "image_ref", "corr_pts", "corr_pts_ref"])(dict(s))
    assert out["image"].shape[:2] == (16, 16)
    assert (out["corr_pts"] >= -0.5).all()
    assert (out["corr_pts"] < 16.5).all()
    assert len(out["corr_pts"]) == len(out["corr_pts_ref"])

    s2 = T.ToTensor()(_sample(with_pts=True))
    flipped = T.RandomHorizontalFlip(p=1.0, apply_keys=[
        "image", "image_ref", "corr_pts", "corr_pts_ref"])(dict(s2))
    np.testing.assert_allclose(flipped["corr_pts"][0, 0], 32 - 1 - 4.0)


def test_pad_bottom_right():
    s = T.ToTensor()(_sample())
    out = T.PadBottomRight(size=[30, 40])(dict(s))
    assert out["image"].shape == (30, 40, 3)
    assert out["semantic"].shape == (30, 40)
    assert (out["semantic"][25:] == 255).all()
    assert (out["image"][25:] == 0).all()


def test_center_crop_pts():
    s = T.ToTensor()(_sample(with_pts=True))
    # one pair inside the 16x16 center crop (origin x=8, y=4), one outside
    s["corr_pts"] = np.array([[12.0, 10.0], [30.0, 20.0]], np.float32)
    s["corr_pts_ref"] = np.array([[14.0, 11.0], [29.0, 21.0]], np.float32)
    out = T.CenterCrop(size=[16, 16], apply_keys=[
        "image", "image_ref", "corr_pts", "corr_pts_ref"])(dict(s))
    assert out["image"].shape[:2] == (16, 16)
    # out-of-crop pair dropped; surviving pair shifted by the crop origin
    assert len(out["corr_pts"]) == 1
    np.testing.assert_allclose(out["corr_pts"][0], [12.0 - 8, 10.0 - 4])
    np.testing.assert_allclose(out["corr_pts_ref"][0], [14.0 - 8, 11.0 - 4])


def test_channel_shuffle_and_jitter():
    import random as pyrandom
    pyrandom.seed(0)
    s = T.ToTensor()(_sample(with_pts=True))
    s["image_prime"] = s["image"].copy()
    out = T.ChannelShuffle(apply_keys=["image_prime"])(dict(s))
    assert sorted(out["image_prime"].reshape(-1, 3).sum(0).tolist()) == \
        sorted(s["image"].reshape(-1, 3).sum(0).tolist())
    out = T.ColorJitter(apply_keys=["image"], brightness=0.4, contrast=0.4,
                        saturation=0.4, hue=0.1)(dict(s))
    assert out["image"].dtype == np.uint8
    assert out["image"].shape == s["image"].shape


def test_rotation_normalize_mask():
    s = _sample()
    out = T.RandomRotation(degrees=10)(dict(s))
    assert "normalize_mask" in out
    out = T.ToTensor()(out)
    out = T.ConvertImageDtype()(out)
    out = T.Normalize()(out)
    assert "normalize_mask" not in out  # consumed by Normalize
    assert np.isfinite(out["image"]).all()
