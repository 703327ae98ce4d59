"""Local and global feature correlation for dense matching.

TPU-native replacements for the reference's native correlation op
(models/correlation_ops/correlation.cpp:13-183, correlation_cuda_kernel.cu)
and the bmm-based global correlation (models/modules.py:277-392).

Layout is NHWC.  The local correlation computes, for patch size P (odd):

    corr[b, h, w, (dy+R)*P + (dx+R)] = sum_c t[b, h, w, c] * s[b, h+dy, w+dx, c]

with zero padding outside bounds, R = (P-1)//2 — identical math to the
reference CPU oracle with kernel_size=1, stride=1, pad=0 (input1 = target,
input2 = source).  Computed in float32 (the reference wraps the op in AMP
``custom_fwd(cast_inputs=float32)``, correlation_function.py:51).

The XLA formulation below (static shift loop, elementwise multiply + C-axis
reduction) fuses well on TPU at the resolutions UAWarpC uses (<=1/4 scale).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

__all__ = [
    "local_correlation",
    "local_correlation_relu_l2norm",
    "global_correlation",
    "mutual_matching",
    "global_correlation_relu_l2norm",
]


def local_correlation(target: jax.Array, source: jax.Array,
                      patch_size: int = 9) -> jax.Array:
    """(B,H,W,C) x (B,H,W,C) -> (B,H,W,P*P) local correlation volume."""
    assert patch_size % 2 == 1
    B, H, W, C = target.shape
    R = (patch_size - 1) // 2
    t = target.astype(jnp.float32)
    s = source.astype(jnp.float32)
    s_pad = jnp.pad(s, ((0, 0), (R, R), (R, R), (0, 0)))
    outs = []
    for dy in range(-R, R + 1):
        for dx in range(-R, R + 1):
            s_shift = jax.lax.dynamic_slice(
                s_pad, (0, dy + R, dx + R, 0), (B, H, W, C))
            outs.append(jnp.sum(t * s_shift, axis=-1))
    return jnp.stack(outs, axis=-1)


def local_correlation_relu_l2norm(target: jax.Array, source: jax.Array,
                                  patch_size: int = 9) -> jax.Array:
    """ReLU + L2-normalize over the correlation channel.

    Reference models/modules.py:266-274 (torch F.normalize default eps 1e-12).
    """
    corr = local_correlation(target, source, patch_size)
    corr = jnp.maximum(corr, 0.0)
    # safe norm: clamped branch has zero (not NaN) gradient
    ss = jnp.sum(jnp.square(corr), axis=-1, keepdims=True)
    return corr / jnp.sqrt(jnp.maximum(ss, 1e-24))


def global_correlation(source: jax.Array, target: jax.Array) -> jax.Array:
    """Full pairwise correlation.

    Args:
      source, target: (B, Hs, Ws, C) and (B, Ht, Wt, C).
    Returns:
      (B, Ht, Wt, Hs*Ws) — channel-last analog of the reference's
      (B, Hs*Ws, Ht, Wt) tensor (modules.py:362-374, H-first in channel).
    """
    B, Hs, Ws, C = source.shape
    corr = jnp.einsum(
        "bijc,bklc->bijkl",
        target.astype(jnp.float32), source.astype(jnp.float32))
    return corr.reshape(B, target.shape[1], target.shape[2], Hs * Ws)


def mutual_matching(corr: jax.Array) -> jax.Array:
    """Cyclic-consistency reweighting (reference modules.py:310-333).

    Args:
      corr: (B, Ht, Wt, Hs*Ws).
    Returns same shape: corr * (corr/max_over_source) * (corr/max_over_target).
    """
    eps = 1e-5
    # max over source positions (last axis) per target location
    max_src = jnp.max(corr, axis=-1, keepdims=True)
    corr_a = corr / (max_src + eps)
    # max over target positions per source location
    max_trg = jnp.max(corr, axis=(1, 2), keepdims=True)
    corr_b = corr / (max_trg + eps)
    return corr * (corr_a * corr_b)


def global_correlation_relu_l2norm(source: jax.Array, target: jax.Array,
                                   cyclic_consistency: bool = True) -> jax.Array:
    """GlobalFeatureCorrelationLayer.forward (reference modules.py:294-308)."""
    B, Hs, Ws, C = source.shape
    corr = global_correlation(source, target)
    if cyclic_consistency:
        corr = mutual_matching(corr)
    corr = jnp.maximum(corr, 0.0)
    ss = jnp.sum(jnp.square(corr), axis=-1, keepdims=True)
    return corr / jnp.sqrt(jnp.maximum(ss, 1e-24))
