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
    # logp[..., t] as a one-hot contraction, NOT take_along_axis: a per-
    # pixel gather pays XLA's per-ROW gather cost (~7.7 ms per 512^2 CE on
    # v5e, 500x off roofline — artifacts/uda_core_profile_512_r05.txt);
    # the C-wide compare+select fuses into the log_softmax pass.  Same
    # value exactly (one-hot picks the identical element, sum in fp32 over
    # C terms of which C-1 are exact zeros).
    onehot = t[..., None] == jnp.arange(C, dtype=jnp.int32)
    # select-then-sum (not multiply): immune to inf*0 if a non-target
    # class's logp ever hit -inf
    nll = -jnp.sum(jnp.where(onehot, logp, 0.0), axis=-1)
    nll = jnp.where(valid, nll, 0.0)
    if pixel_weight is not None:
        nll = nll * pixel_weight.astype(nll.dtype)
    return jnp.mean(nll)
