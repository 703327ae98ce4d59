"""DACS ClassMix + strong augmentation, batched and on-device.

TPU-first re-design of the reference's per-image Python loop
(helpers/dacs_transforms.py:14-112, models/segmentation_model.py:525-582):
everything is a jitted, PRNG-keyed batched transform — no host round-trips.

Semantics preserved:
* class selection replicates the reference's batch-level ``torch.unique``
  (a bug the reference deliberately keeps, dacs_transforms.py:84-85): the
  candidate class set is shared across the batch; each image draws its own
  half-subset.  Static shapes: presence is a (num_classes+1)-wide boolean
  (ignore maps to the last slot) and the subset is drawn via uniform scores
  ranked among present classes (top-ceil(n/2)) — exactly uniform over
  subsets, like np.random.choice(replace=False).
* color jitter with **kornia 0.5.8** op semantics (the version the
  reference pins: additive brightness, pure-scale contrast, HSV-S-scale
  saturation — see color_jitter_image), per-image factors in random order,
  applied on denormalized images when the step coin > p.
* Gaussian blur with sigma ~ U(0.15, 1.15) per image, odd kernel ~0.1*dim,
  reflect padding, when the step coin > 0.5.

Deliberate deviation under data parallelism: the batch-level quantities
(ClassMix candidate set, confident-pixel pseudo-weight fraction, the
jitter/blur step coins) are computed over the GLOBAL sharded batch,
whereas the reference's DDP computes them per process.  The reference's
published protocol is single-GPU (README commands use gpus=1), where the
two coincide; at global batch = reference batch our statistics match the
paper's setup exactly, which multi-process DDP would not.
"""
from __future__ import annotations

import math
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

IMAGENET_MEAN = np.array([0.485, 0.456, 0.406], np.float32)
IMAGENET_STD = np.array([0.229, 0.224, 0.225], np.float32)


def denorm(img: jax.Array) -> jax.Array:
    return img * IMAGENET_STD + IMAGENET_MEAN


def renorm(img: jax.Array) -> jax.Array:
    return (img - IMAGENET_MEAN) / IMAGENET_STD


# ---------------------------------------------------------------------------
# ClassMix masks
# ---------------------------------------------------------------------------

def get_class_masks(rng: jax.Array, labels: jax.Array,
                    num_classes: int = 19,
                    ignore_index: int = 255) -> jax.Array:
    """Per-image ClassMix masks (reference dacs_transforms.py:81-98).

    Args:
      labels: (B, H, W) int source labels.
    Returns:
      (B, H, W) float 0/1 masks — 1 where the pixel's class was selected.
    """
    B = labels.shape[0]
    C1 = num_classes + 1  # ignore bucket last
    lab = jnp.where(labels == ignore_index, num_classes, labels)
    # batch-level presence (the reference's deliberate unique(labels) bug)
    present = jnp.zeros((C1,), jnp.bool_).at[lab.reshape(-1)].set(True)
    n = jnp.sum(present.astype(jnp.int32))
    k = (n + n % 2) // 2  # ceil(n/2)

    def one_mask(key, label):
        scores = jnp.where(present,
                           jax.random.uniform(key, (C1,)), -jnp.inf)
        # rank of each class among scores (desc); selected iff rank < k
        order = jnp.argsort(-scores)
        rank = jnp.zeros((C1,), jnp.int32).at[order].set(
            jnp.arange(C1, dtype=jnp.int32))
        selected = (rank < k) & present
        return selected[label].astype(jnp.float32)

    keys = jax.random.split(rng, B)
    return jax.vmap(one_mask)(keys, lab)


def one_mix(mask: jax.Array, a: jax.Array, b: jax.Array) -> jax.Array:
    """mask*a + (1-mask)*b with mask broadcast over channels."""
    while mask.ndim < a.ndim:
        mask = mask[..., None]
    return mask * a + (1.0 - mask) * b


# ---------------------------------------------------------------------------
# Color jitter (torchvision op semantics, random order)
# ---------------------------------------------------------------------------

def _rgb_to_grayscale(img: jax.Array) -> jax.Array:
    w = jnp.asarray([0.299, 0.587, 0.114], img.dtype)
    return jnp.sum(img * w, axis=-1, keepdims=True)


def _adjust_brightness(img, f):
    return jnp.clip(img * f, 0.0, 1.0)


def _adjust_contrast(img, f):
    mean = jnp.mean(_rgb_to_grayscale(img), axis=(-3, -2, -1), keepdims=True)
    return jnp.clip(img * f + mean * (1.0 - f), 0.0, 1.0)


def _adjust_saturation(img, f):
    gray = _rgb_to_grayscale(img)
    return jnp.clip(img * f + gray * (1.0 - f), 0.0, 1.0)


def _rgb_to_hsv(img):
    r, g, b = img[..., 0], img[..., 1], img[..., 2]
    maxc = jnp.maximum(jnp.maximum(r, g), b)
    minc = jnp.minimum(jnp.minimum(r, g), b)
    v = maxc
    delta = maxc - minc
    s = jnp.where(maxc > 0, delta / jnp.maximum(maxc, 1e-12), 0.0)
    safe_delta = jnp.maximum(delta, 1e-12)
    rc = (maxc - r) / safe_delta
    gc = (maxc - g) / safe_delta
    bc = (maxc - b) / safe_delta
    h = jnp.where(maxc == r, bc - gc,
                  jnp.where(maxc == g, 2.0 + rc - bc, 4.0 + gc - rc))
    h = jnp.where(delta == 0, 0.0, h)
    h = (h / 6.0) % 1.0
    return jnp.stack([h, s, v], axis=-1)


def _hsv_to_rgb(hsv):
    h, s, v = hsv[..., 0], hsv[..., 1], hsv[..., 2]
    i = jnp.floor(h * 6.0)
    f = h * 6.0 - i
    p = v * (1.0 - s)
    q = v * (1.0 - f * s)
    t = v * (1.0 - (1.0 - f) * s)
    i = i.astype(jnp.int32) % 6
    r = jnp.select([i == 0, i == 1, i == 2, i == 3, i == 4, i == 5],
                   [v, q, p, p, t, v])
    g = jnp.select([i == 0, i == 1, i == 2, i == 3, i == 4, i == 5],
                   [t, v, v, q, p, p])
    b = jnp.select([i == 0, i == 1, i == 2, i == 3, i == 4, i == 5],
                   [p, p, t, v, v, q])
    return jnp.stack([r, g, b], axis=-1)


def _adjust_hue(img, f):
    hsv = _rgb_to_hsv(jnp.clip(img, 0.0, 1.0))
    h = (hsv[..., 0] + f) % 1.0
    return _hsv_to_rgb(jnp.stack([h, hsv[..., 1], hsv[..., 2]], axis=-1))


def color_jitter_bcsh(rng: jax.Array, img: jax.Array, b: float, c: float,
                      s: float, h: float) -> jax.Array:
    """torchvision ColorJitter(b, c, s, h) on ONE denormalized (H, W, 3)
    image in [0,1]: factors ~ U(max(0,1-v), 1+v) (U(-h,h) for hue),
    applied in a random order.  Statically-zero strengths become no-op
    branches (torchvision skips them; also avoids compiling the HSV
    round-trip when hue is disabled, as in the alignment prime augs)."""
    k_order, kb, kc, ks, kh = jax.random.split(rng, 5)
    fb = jax.random.uniform(kb, (), minval=max(0.0, 1 - b), maxval=1 + b)
    fc = jax.random.uniform(kc, (), minval=max(0.0, 1 - c), maxval=1 + c)
    fs = jax.random.uniform(ks, (), minval=max(0.0, 1 - s), maxval=1 + s)
    fh = jax.random.uniform(kh, (), minval=-h, maxval=h)
    order = jax.random.permutation(k_order, 4)

    def apply_op(i, im):
        idx = order[i]
        return jax.lax.switch(idx, [
            (lambda x: _adjust_brightness(x, fb)) if b else (lambda x: x),
            (lambda x: _adjust_contrast(x, fc)) if c else (lambda x: x),
            (lambda x: _adjust_saturation(x, fs)) if s else (lambda x: x),
            (lambda x: _adjust_hue(x, fh)) if h else (lambda x: x),
        ], im)

    return jax.lax.fori_loop(0, 4, apply_op, img)


def color_jitter_image(rng: jax.Array, img: jax.Array,
                       s: float = 0.2) -> jax.Array:
    """Jitter ONE denormalized (H, W, 3) image in [0,1] (DACS flavor:
    one strength for all four ops) with **kornia 0.5.8 semantics**.

    The reference pins kornia==0.5.8 (requirements.txt) whose ColorJitter
    differs from torchvision's (kornia deprecated it into ColorJiggle for
    exactly this reason):
      * brightness: factor ~ U(1-s, 1+s), applied ADDITIVELY as
        clamp(img + (f-1)) — i.e. a uniform +-s shift;
      * contrast:   factor ~ U(max(0,1-s), 1+s), pure scaling
        clamp(img * f) with no gray-mean blend;
      * saturation: factor ~ U(max(0,1-s), 1+s), scales the HSV S channel
        (not a luma blend), no clamp before converting back;
      * hue:        factor ~ U(-s, s) fraction of the circle (kornia
        applies hue_factor * 2pi radians);
      * the four ops run in a random order (like torchvision).
    The torchvision-semantics jitter (color_jitter_bcsh) stays for the
    alignment prime augs, whose reference counterpart IS torchvision
    (data_modules/transforms.py ColorJitter)."""
    k_order, kb, kc, ks, kh = jax.random.split(rng, 5)
    fb = jax.random.uniform(kb, (), minval=max(0.0, 1 - s),
                            maxval=min(2.0, 1 + s))
    fc = jax.random.uniform(kc, (), minval=max(0.0, 1 - s), maxval=1 + s)
    fs = jax.random.uniform(ks, (), minval=max(0.0, 1 - s), maxval=1 + s)
    fh = jax.random.uniform(kh, (), minval=-s, maxval=s)
    order = jax.random.permutation(k_order, 4)

    def brightness(x):
        return jnp.clip(x + (fb - 1.0), 0.0, 1.0)

    def contrast(x):
        return jnp.clip(x * fc, 0.0, 1.0)

    def saturation(x):
        hsv = _rgb_to_hsv(jnp.clip(x, 0.0, 1.0))
        return _hsv_to_rgb(jnp.stack(
            [hsv[..., 0], hsv[..., 1] * fs, hsv[..., 2]], axis=-1))

    def apply_op(i, im):
        return jax.lax.switch(order[i], [
            brightness, contrast, saturation,
            lambda x: _adjust_hue(x, fh),
        ], im)

    return jax.lax.fori_loop(0, 4, apply_op, img)


# ---------------------------------------------------------------------------
# Gaussian blur (kornia GaussianBlur2d semantics: reflect pad, odd kernel)
# ---------------------------------------------------------------------------

def _gauss_kernel_size(dim: int) -> int:
    return int(math.floor(math.ceil(0.1 * dim) - 0.5
                          + math.ceil(0.1 * dim) % 2))


def gaussian_blur_image(img: jax.Array, sigma: jax.Array,
                        kernel_size: int = None) -> jax.Array:
    """Separable Gaussian blur of one (H, W, C) image, reflect padding.
    Kernel sizes default to the reference DACS ~0.1*dim odd rule
    (dacs_transforms.py:66-74); pass ``kernel_size`` for the torchvision
    GaussianBlur(kernel_size=...) flavor (alignment prime augs)."""
    H, W, _ = img.shape
    kh = _gauss_kernel_size(H) if kernel_size is None else kernel_size
    kw = _gauss_kernel_size(W) if kernel_size is None else kernel_size
    for axis, k in ((0, kh), (1, kw)):
        if k < 1:
            continue
        half = (k - 1) // 2
        x = jnp.arange(k, dtype=jnp.float32) - (k - 1) / 2.0
        kern = jnp.exp(-0.5 * jnp.square(x / jnp.maximum(sigma, 1e-6)))
        kern = kern / jnp.sum(kern)
        pad = [(0, 0)] * 3
        pad[axis] = (half, k - 1 - half)
        padded = jnp.pad(img, pad, mode="reflect")
        shape = [1, 1, 1]
        shape[axis] = k
        kern = kern.reshape(shape)
        windows = [
            jax.lax.dynamic_slice_in_dim(padded, i, img.shape[axis], axis)
            for i in range(k)
        ]
        img = sum(w * kern.reshape(-1)[i]
                  for i, w in enumerate(windows))
    return img


# ---------------------------------------------------------------------------
# Full DACS mix (reference get_dacs_mix, segmentation_model.py:525-582)
# ---------------------------------------------------------------------------

def dacs_mix(rng: jax.Array,
             images_trg: jax.Array, probs_trg: jax.Array,
             images_src: jax.Array, gt_src: jax.Array,
             pseudo_label_threshold: float = 0.968,
             color_jitter_s: float = 0.2,
             color_jitter_p: float = 0.2,
             blur: bool = True,
             psweight_ignore_top: int = 0,
             psweight_ignore_bottom: int = 0,
             num_classes: int = 19):
    """Returns (mixed_img, mixed_lbl, mixed_weight).

    images_*: (B, H, W, 3) normalized; probs_trg: (B, H, W, C) teacher
    probabilities; gt_src: (B, H, W) int labels.
    """
    B = images_trg.shape[0]
    images_src = images_src[:B]
    gt_src = gt_src[:B]

    k_coin_j, k_coin_b, k_masks, k_jit = jax.random.split(rng, 4)
    jitter_coin = jax.random.uniform(k_coin_j, ())
    blur_coin = jax.random.uniform(k_coin_b, ()) if blur else jnp.zeros(())

    pseudo_prob = jnp.max(probs_trg, axis=-1)
    pseudo_label = jnp.argmax(probs_trg, axis=-1).astype(gt_src.dtype)
    frac_confident = jnp.mean(
        (pseudo_prob >= pseudo_label_threshold).astype(jnp.float32))
    pseudo_weight = jnp.full(pseudo_prob.shape, 1.0) * frac_confident
    if psweight_ignore_top > 0:
        pseudo_weight = pseudo_weight.at[:, :psweight_ignore_top, :].set(0.0)
    if psweight_ignore_bottom > 0:
        pseudo_weight = pseudo_weight.at[:, -psweight_ignore_bottom:, :].set(
            0.0)

    masks = get_class_masks(k_masks, gt_src, num_classes)  # (B, H, W)

    mixed_img = one_mix(masks, images_src, images_trg)
    mixed_lbl = jnp.where(masks > 0, gt_src, pseudo_label)
    mixed_weight = one_mix(masks, jnp.ones_like(pseudo_weight), pseudo_weight)

    # strong augmentation on the mixed images only
    def aug_one(key, img):
        kj, ks2 = jax.random.split(key)
        d = denorm(img)
        d = jax.lax.cond(jitter_coin > color_jitter_p,
                         lambda x: color_jitter_image(kj, x, color_jitter_s),
                         lambda x: x, d)
        sigma = jax.random.uniform(ks2, (), minval=0.15, maxval=1.15)
        d = jax.lax.cond(blur_coin > 0.5,
                         lambda x: gaussian_blur_image(x, sigma),
                         lambda x: x, d)
        return renorm(d)

    keys = jax.random.split(k_jit, B)
    mixed_img = jax.vmap(aug_one)(keys, mixed_img)
    return mixed_img, mixed_lbl, mixed_weight
