"""Refign's adaptive pseudo-label refinement + ImageNet feature distance.

Pure functions mirroring reference models/segmentation_model.py:438-491
(refine / eta) and :584-668 (fdist family).
"""
from __future__ import annotations

import math
from typing import Optional, Sequence

import jax
import jax.numpy as jnp

# channels 0-4 and 8-10 are the large static Cityscapes classes kept in M
# (reference :452,:460-461: static_large_classes = [0,1,2,3,4,8,9,10];
#  channels 5:8 and 11: are zeroed)
STATIC_LARGE_CLASSES = (0, 1, 2, 3, 4, 8, 9, 10)


def eta(logits: jax.Array) -> jax.Array:
    """Normalized entropy (reference :484-491).  logits: (B, H, W, C)."""
    C = logits.shape[-1]
    logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    p = jnp.exp(logp)
    ent = -jnp.sum(p * logp, axis=-1)
    return ent / math.log(C)


def refine(logits_trg: jax.Array, logits_ref: jax.Array,
           warp_mask: Optional[jax.Array], certs: Optional[jax.Array],
           gamma: float = 0.25,
           disable_M: bool = False,
           disable_P: bool = False) -> jax.Array:
    """Adaptive label correction (reference :438-482).

    Args:
      logits_trg / logits_ref: (B, H, W, 19) — ref may be warped.
      warp_mask: (B, H, W) bool in-bounds mask or None.
      certs: (B, H, W, 1) P_R confidence or None.
    Returns refined (B, H, W, 19) probabilities.
    """
    C = logits_trg.shape[-1]
    assert C == 19, "refine assumes cityscapes classes (reference :441)"
    probs_trg = jax.nn.softmax(logits_trg.astype(jnp.float32), axis=-1)
    probs_ref = jax.nn.softmax(logits_ref.astype(jnp.float32), axis=-1)
    pred_trg = jnp.argmax(probs_trg, axis=-1)
    pred_ref = jnp.argmax(probs_ref, axis=-1)

    # trust score s: mean normalized entropy ** gamma, per image
    s = jnp.mean(eta(logits_trg), axis=(1, 2)) ** gamma  # (B,)

    static = jnp.zeros((C,), jnp.bool_).at[jnp.array(
        STATIC_LARGE_CLASSES)].set(True)
    m2d = static[pred_trg] & static[pred_ref]            # (B, H, W)
    # expand over channels, then zero the small-static and dynamic channels
    chan_keep = jnp.zeros((C,), jnp.bool_).at[jnp.array(
        STATIC_LARGE_CLASSES)].set(True)
    M = m2d[..., None] & chan_keep[None, None, None, :]
    if disable_M:
        M = jnp.zeros_like(M)

    if disable_P or certs is None:
        P = jnp.full(probs_trg.shape, 0.5)
    else:
        P = jnp.broadcast_to(certs.astype(jnp.float32), probs_trg.shape)

    epsilon = s[:, None, None, None] * jnp.maximum(P, M.astype(P.dtype))
    if warp_mask is not None:
        epsilon = epsilon * warp_mask[..., None].astype(epsilon.dtype)
    return (1.0 - epsilon) * probs_trg + epsilon * probs_ref


# ---------------------------------------------------------------------------
# ImageNet feature distance (reference :584-668)
# ---------------------------------------------------------------------------

def downscale_label_ratio(gt: jax.Array, scale_factor: int,
                          min_ratio: float, n_classes: int,
                          ignore_index: int = 255) -> jax.Array:
    """Majority-vote label downscale with purity threshold
    (reference :637-668).  gt: (B, H, W) -> (B, H/s, W/s)."""
    assert scale_factor > 1
    B, H, W = gt.shape
    sub = jnp.where(gt == ignore_index, n_classes, gt)
    onehot = jax.nn.one_hot(sub, n_classes + 1, dtype=jnp.float32)
    # average pool with kernel=stride=scale_factor
    pooled = jax.lax.reduce_window(
        onehot, 0.0, jax.lax.add,
        (1, scale_factor, scale_factor, 1),
        (1, scale_factor, scale_factor, 1), "VALID") / (scale_factor ** 2)
    ratio = jnp.max(pooled, axis=-1)
    out = jnp.argmax(pooled, axis=-1)
    out = jnp.where(out == n_classes, ignore_index, out)
    out = jnp.where(ratio < min_ratio, ignore_index, out)
    return out


def masked_feat_dist(f1: jax.Array, f2: jax.Array,
                     mask: Optional[jax.Array] = None) -> jax.Array:
    """Mean L2 norm of feature difference over masked positions
    (reference :621-635).  f*: (B, h, w, C); mask: (B, h, w) bool."""
    ss = jnp.sum(jnp.square((f1 - f2).astype(jnp.float32)), axis=-1)
    d = jnp.sqrt(jnp.maximum(ss, 1e-24))  # zero-safe gradient
    if mask is None:
        return jnp.mean(d)
    m = mask.astype(jnp.float32)
    return jnp.sum(d * m) / jnp.maximum(jnp.sum(m), 1.0)


def fdist_loss(feat: jax.Array, feat_imnet: jax.Array, gt: jax.Array,
               fdist_classes: Sequence[int],
               scale_min_ratio: float = 0.75,
               num_classes: int = 19,
               fdist_lambda: float = 0.005) -> jax.Array:
    """Thing-class ImageNet feature distance (reference :584-619).
    feat/feat_imnet: stage -1 NHWC features; gt: (B, H, W)."""
    scale = gt.shape[-1] // feat.shape[-2]  # W // w
    gt_small = downscale_label_ratio(gt, scale, scale_min_ratio, num_classes)
    fdc = jnp.zeros((num_classes + 256,), jnp.bool_).at[jnp.array(
        list(fdist_classes))].set(True)
    mask = fdc[jnp.clip(gt_small, 0, num_classes + 255)]
    dist = masked_feat_dist(feat, jax.lax.stop_gradient(feat_imnet), mask)
    return fdist_lambda * dist
