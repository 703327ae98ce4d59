"""UAWarpC matching losses (reference models/losses.py:25-328).

MultiScaleFlowLoss: per-pyramid-level (probabilistic) flow loss — Huber/L1/L2
summed over the 2 flow channels, optionally turned into a Gaussian NLL with a
1- or 2-component log-variance (logsumexp mixture), masked-mean reduced, and
summed over levels with weights.

WBipathLoss: warp-bipath composition — compose estimated flows
target_prime->source and source->target (the latter warped by the former)
and supervise the composition against the known synthetic flow.

Flows are channel-last (..., 2); uncertainties channel-last (..., 1 or 2).
"""
from __future__ import annotations

import math
from typing import List, Optional, Sequence, Tuple, Union

import jax
import jax.numpy as jnp

from ..ops.resize import interpolate
from ..ops.warp import gt_correspondence_mask, warp

__all__ = ["multi_scale_flow_loss", "wbipath_loss", "huber", "adaptive_loss_weights"]


def huber(d: jax.Array, delta: float = 1.0) -> jax.Array:
    """2 * smooth_l1(beta=delta) * delta (reference losses.py:25-34)."""
    ad = jnp.abs(d)
    sl1 = jnp.where(ad < delta, 0.5 * d * d / delta, ad - 0.5 * delta)
    return 2.0 * sl1 * delta


_LOSS_FNS = {
    "L1Loss": lambda d: jnp.abs(d),
    "L2Loss": lambda d: d * d,
    "HuberLoss": huber,
}


def _downsample_mask(mask: jax.Array, hw: Tuple[int, int]) -> jax.Array:
    """bilinear-interp then floor -> bool (reference losses.py:95-97)."""
    if mask.shape[1:3] == hw:
        return mask.astype(bool)
    m = interpolate(mask.astype(jnp.float32)[..., None], hw,
                    mode="bilinear", align_corners=False)[..., 0]
    return jnp.floor(m).astype(bool)


def _masked_mean(x: jax.Array, mask: Optional[jax.Array]) -> jax.Array:
    if mask is None:
        return jnp.mean(x)
    m = mask.astype(x.dtype)
    total = jnp.sum(m)
    # reference returns 0 when the mask is empty (losses.py:98-99)
    return jnp.where(total > 0, jnp.sum(x * m) / jnp.maximum(total, 1.0), 0.0)


def _one_scale(est_flow: jax.Array, gt_flow: jax.Array,
               est_uncert: Optional[jax.Array],
               mask: Optional[jax.Array],
               loss_type: str) -> jax.Array:
    h, w = est_flow.shape[1:3]
    gt = interpolate(gt_flow, (h, w), mode="bilinear", align_corners=False)
    if mask is not None:
        mask = _downsample_mask(mask, (h, w))
    loss = jnp.sum(_LOSS_FNS[loss_type]((est_flow - gt).astype(jnp.float32)),
                   axis=-1)
    if est_uncert is not None:
        assert loss_type in ("L2Loss", "HuberLoss")
        if est_uncert.shape[-1] == 1:
            log_var = est_uncert[..., 0]
        elif est_uncert.shape[-1] == 2:
            log_var = jax.nn.logsumexp(est_uncert, axis=-1)
        else:
            raise ValueError(est_uncert.shape)
        log_var = log_var.astype(jnp.float32)
        loss = (0.5 * jnp.exp(-log_var) * loss + log_var
                + math.log(2 * math.pi))
    return _masked_mean(loss, mask)


def multi_scale_flow_loss(flow_output, gt_flow: jax.Array,
                          mask=None,
                          loss_type: str = "HuberLoss",
                          level_weights: Optional[Sequence[float]] = None
                          ) -> jax.Array:
    """Sum of per-level (probabilistic) flow losses
    (reference losses.py:158-188).

    Args:
      flow_output: list over levels of flow (B,h,w,2) or (flow, uncert).
      gt_flow: (B, H, W, 2) synthetic ground-truth flow at image res.
      mask: (B, H, W) validity mask, or a per-level list of masks.
    """
    if not isinstance(flow_output, (list, tuple)):
        flow_output = [flow_output]
    weights = (list(level_weights) if level_weights
               else [1.0] * len(flow_output))
    assert len(weights) == len(flow_output)
    total = 0.0
    for i, (out, w_lvl) in enumerate(zip(flow_output, weights)):
        m = mask[i] if isinstance(mask, (list, tuple)) else mask
        if isinstance(out, tuple):
            flow, uncert = out
        else:
            flow, uncert = out, None
        total = total + w_lvl * _one_scale(flow, gt_flow, uncert, m,
                                           loss_type)
    return total


def _cyclic_consistency_mask(flow_a: jax.Array, warped_b: jax.Array,
                             gt_flow: jax.Array,
                             alpha_1: float, alpha_2: float) -> jax.Array:
    """Forward-backward occlusion mask (reference losses.py:233-250).

    All flows in gt-image pixel units at level resolution; the synthetic
    flow is bilinearly resized to level resolution WITHOUT value rescaling
    (reference :237-238).  A pixel is visible when the composition error
    ||a + b_warped - gt||^2 stays below alpha_1 * (sum of squared
    magnitudes) + alpha_2.
    """
    h, w = flow_a.shape[1:3]
    gt = interpolate(gt_flow, (h, w), mode="bilinear",
                     align_corners=False).astype(jnp.float32)
    fa = jax.lax.stop_gradient(flow_a).astype(jnp.float32)
    wb = jax.lax.stop_gradient(warped_b).astype(jnp.float32)

    def length_sq(x):
        return jnp.sum(x * x, axis=-1)

    mag_sq = length_sq(fa) + length_sq(wb) + length_sq(gt)
    occluded = length_sq(fa + wb - gt) > (alpha_1 * mag_sq + alpha_2)
    return ~occluded


def wbipath_loss(flows_tp_to_s, flows_s_to_t, gt_flow: jax.Array,
                 mask_used: Optional[jax.Array],
                 loss_type: str = "HuberLoss",
                 level_weights: Optional[Sequence[float]] = None,
                 visibility_mask: bool = False,
                 alpha_1: float = 0.03,
                 alpha_2: float = 0.5,
                 ) -> jax.Array:
    """W-bipath composition loss (reference losses.py:256-328).

    Args:
      flows_tp_to_s / flows_s_to_t: per-level lists of flow (B,h,w,2) or
        (flow, uncert (B,h,w,1)) tuples, in gt-image pixel units.
      gt_flow: (B, H, W, 2) synthetic flow target_prime -> target.
      mask_used: (B, H, W) validity of the synthetic flow.
      visibility_mask: apply the cyclic-consistency (occlusion) mask
        (reference losses.py:314-318; ``visibility_mask: True`` in
        configs/megadepth/uawarpc_stage2.yaml:144).
    """
    H, W = gt_flow.shape[1:3]
    if not isinstance(flows_tp_to_s, (list, tuple)):
        flows_tp_to_s = [flows_tp_to_s]
    if not isinstance(flows_s_to_t, (list, tuple)):
        flows_s_to_t = [flows_s_to_t]

    composed, masks = [], []
    for a, b in zip(flows_tp_to_s, flows_s_to_t):
        if isinstance(a, tuple):
            flow_a, unc_a = a
            flow_b, unc_b = b
            probabilistic = True
        else:
            flow_a, unc_a = a, None
            flow_b, unc_b = b, None
            probabilistic = False
        h, w = flow_a.shape[1:3]
        # level-resolution units for warping (detached,
        # reference losses.py:283-292)
        warp_flow = jax.lax.stop_gradient(
            jnp.stack([flow_a[..., 0] * (w / W),
                       flow_a[..., 1] * (h / H)], axis=-1))
        warped_b = warp(flow_b, warp_flow)
        comp = flow_a + warped_b
        if probabilistic:
            warped_unc_b = warp(unc_b, warp_flow)
            comp = (comp, jnp.concatenate([unc_a, warped_unc_b], axis=-1))
        composed.append(comp)

        m = gt_correspondence_mask(jax.lax.stop_gradient(warp_flow))
        if mask_used is not None:
            m = m & _downsample_mask(mask_used, (h, w))
        if visibility_mask:
            m = m & _cyclic_consistency_mask(flow_a, warped_b, gt_flow,
                                             alpha_1, alpha_2)
        masks.append(m)

    return multi_scale_flow_loss(composed, gt_flow, mask=masks,
                                 loss_type=loss_type,
                                 level_weights=level_weights)


def adaptive_loss_weights(loss_ss: jax.Array, loss_un: jax.Array,
                          weight_ss: float = 1.0, weight_un: float = 1.0,
                          apply_constant: bool = False):
    """Adaptive ss/us weighting (reference alignment_model.py:217-232).

    NOTE: the reference calls this with ``apply_constant_flow_weights`` in
    the ``weight_ss`` slot (alignment_model.py:141-143) — with the default
    config (False) this makes ratio = 0, i.e. weights (0,1) when
    loss_un > loss_ss and (1, 100) otherwise.  We reproduce the formula
    exactly; callers decide what to pass.
    """
    if apply_constant:
        return (jnp.asarray(weight_ss, jnp.float32),
                jnp.asarray(weight_un, jnp.float32))
    ratio = weight_ss / weight_un
    s_when_un_bigger = jnp.clip(
        loss_un / jnp.maximum(loss_ss, 1e-8) * ratio, max=100.0)
    u_when_ss_bigger = jnp.clip(
        jnp.where(ratio > 0,
                  loss_ss / jnp.maximum(loss_un, 1e-8) / max(ratio, 1e-38),
                  jnp.inf), max=100.0)
    un_bigger = loss_un > loss_ss
    s_l_w = jnp.where(un_bigger, s_when_un_bigger, 1.0)
    u_l_w = jnp.where(un_bigger, 1.0, u_when_ss_bigger)
    return jax.lax.stop_gradient(s_l_w), jax.lax.stop_gradient(u_l_w)
