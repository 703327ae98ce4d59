"""Segmentation losses (reference models/losses.py:10-22)."""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

__all__ = ["pixel_weighted_cross_entropy"]


def pixel_weighted_cross_entropy(logits: jax.Array, target: jax.Array,
                                 pixel_weight: Optional[jax.Array] = None,
                                 ignore_index: int = 255) -> jax.Array:
    """CE with ignore_index holes and optional per-pixel weights.

    Matches torch F.cross_entropy(reduction='none') then mean over ALL pixels
    (ignored pixels contribute 0 to the sum but ARE counted in the mean
    denominator — torch.mean over the full map, reference losses.py:16-22).

    Args:
      logits: (B, H, W, C) raw scores.
      target: (B, H, W) int labels.
      pixel_weight: (B, H, W) optional weights.
    """
    C = logits.shape[-1]
    valid = target != ignore_index
    t = jnp.where(valid, target, 0).astype(jnp.int32)
    logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    nll = -jnp.take_along_axis(logp, t[..., None], axis=-1)[..., 0]
    nll = jnp.where(valid, nll, 0.0)
    if pixel_weight is not None:
        nll = nll * pixel_weight.astype(nll.dtype)
    return jnp.mean(nll)
