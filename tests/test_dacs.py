"""DACS ClassMix / jitter / blur property tests (kornia is unavailable, so
the reference implementation can't serve as an oracle here; semantics are
pinned by properties instead)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from refign_tpu.uda.dacs import (dacs_mix, denorm, gaussian_blur_image,
                                 get_class_masks, one_mix, renorm)


def test_class_masks_select_half_of_present_classes():
    rng = jax.random.PRNGKey(0)
    labels = np.zeros((2, 16, 16), np.int64)
    labels[0, :8] = 3
    labels[0, 8:] = 7
    labels[1, :4] = 11
    labels[1, 4:] = 255  # ignore bucket also participates (reference bug
    #                      keeps unique over the whole batch incl. 255)
    masks = np.asarray(get_class_masks(rng, jnp.asarray(labels)))
    assert masks.shape == (2, 16, 16)
    assert set(np.unique(masks)) <= {0.0, 1.0}
    # per image, the mask is constant within each class region
    for b in range(2):
        for c in np.unique(labels[b]):
            region = masks[b][labels[b] == c]
            assert region.min() == region.max()


def test_class_masks_batch_level_candidates():
    """Classes absent from an image can still be 'selected' for it (the
    reference's deliberate batch-level unique, dacs_transforms.py:84-85) —
    but its mask stays 0 there since no pixel matches."""
    rng = jax.random.PRNGKey(1)
    labels = np.full((2, 8, 8), 5, np.int64)
    labels[1] = 9
    masks = np.asarray(get_class_masks(rng, jnp.asarray(labels)))
    # each image's mask is all-0 or all-1 (single class per image)
    for b in range(2):
        assert masks[b].min() == masks[b].max()


def test_one_mix_blends():
    mask = jnp.zeros((4, 4)).at[:2].set(1.0)
    a = jnp.ones((4, 4, 3))
    b = jnp.zeros((4, 4, 3))
    out = np.asarray(one_mix(mask, a, b))
    assert out[:2].min() == 1.0 and out[2:].max() == 0.0


def test_denorm_renorm_roundtrip():
    rng = np.random.RandomState(0)
    x = rng.randn(4, 4, 3).astype(np.float32)
    np.testing.assert_allclose(np.asarray(renorm(denorm(x))), x, atol=1e-5)


def test_gaussian_blur_preserves_mean():
    rng = np.random.RandomState(1)
    img = rng.rand(32, 40, 3).astype(np.float32)
    out = np.asarray(gaussian_blur_image(jnp.asarray(img),
                                         jnp.asarray(1.0)))
    assert out.shape == img.shape
    np.testing.assert_allclose(out.mean(), img.mean(), rtol=0.02)
    # blur reduces variance
    assert out.var() < img.var()


def test_dacs_mix_outputs():
    key = jax.random.PRNGKey(2)
    rng = np.random.RandomState(2)
    B, H, W = 2, 32, 32
    images_trg = rng.randn(B, H, W, 3).astype(np.float32)
    probs = jax.nn.softmax(
        jnp.asarray(rng.randn(B, H, W, 19) * 3), axis=-1)
    images_src = rng.randn(B, H, W, 3).astype(np.float32)
    gt_src = rng.randint(0, 19, size=(B, H, W))
    img, lbl, w = dacs_mix(key, jnp.asarray(images_trg), probs,
                           jnp.asarray(images_src), jnp.asarray(gt_src),
                           psweight_ignore_top=2)
    assert img.shape == (B, H, W, 3)
    assert lbl.shape == (B, H, W)
    assert w.shape == (B, H, W)
    w = np.asarray(w)
    # top rows of the pseudo-weight zeroed only where the mask took target
    lbl_np = np.asarray(lbl)
    assert np.isfinite(np.asarray(img)).all()
    # labels come from either source gt or the pseudo-label
    pseudo = np.asarray(jnp.argmax(probs, -1))
    valid = (lbl_np == gt_src) | (lbl_np == pseudo)
    assert valid.all()
    # determinism
    img2, lbl2, w2 = dacs_mix(key, jnp.asarray(images_trg), probs,
                              jnp.asarray(images_src), jnp.asarray(gt_src),
                              psweight_ignore_top=2)
    np.testing.assert_array_equal(np.asarray(lbl), np.asarray(lbl2))
    np.testing.assert_allclose(np.asarray(img), np.asarray(img2))
