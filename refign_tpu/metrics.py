"""Functional, psum-able evaluation metrics.

Replaces the reference's torchmetrics wrappers (helpers/metrics.py:264-387 IoU,
:35-261 SparseEPE).  Metric state is a plain pytree of accumulators so it can
be carried through jitted eval steps and reduced across devices with
``jax.lax.psum`` (the reference uses ``dist_reduce_fx='sum'``).
"""
from __future__ import annotations

from typing import Dict, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["iou_init", "iou_update", "iou_compute",
           "epe_init", "epe_update", "epe_compute"]


# ---------------------------------------------------------------------------
# IoU over a confusion matrix (reference helpers/metrics.py:264-387)
# ---------------------------------------------------------------------------

def iou_init(num_classes: int) -> jax.Array:
    """(C, C) int32 confusion matrix accumulator."""
    return jnp.zeros((num_classes, num_classes), jnp.int32)


def iou_update(confmat: jax.Array, preds: jax.Array, target: jax.Array,
               ignore_index: int = 255) -> jax.Array:
    """Accumulate a confusion matrix.

    Args:
      confmat: (C, C) running confusion matrix [target, pred].
      preds: (B, H, W, C) logits or (B, H, W) class indices.
      target: (B, H, W) int labels with ignore_index holes.
    """
    C = confmat.shape[0]
    if preds.ndim == target.ndim + 1:
        preds = jnp.argmax(preds, axis=-1)
    preds = preds.reshape(-1).astype(jnp.int32)
    target = target.reshape(-1).astype(jnp.int32)
    valid = target != ignore_index
    # route ignored pixels to a scrap row we never read
    t = jnp.where(valid, target, 0)
    idx = t * C + preds
    counts = jnp.zeros((C * C,), jnp.int32).at[idx].add(
        valid.astype(jnp.int32))
    return confmat + counts.reshape(C, C)


def iou_compute(confmat: jax.Array, average: str = "macro",
                absent_score: float = 0.0,
                over_present_classes: bool = False) -> jax.Array:
    """Jaccard from confusion matrix (reference metrics.py:305-387)."""
    confmat = confmat.astype(jnp.float64 if jax.config.read("jax_enable_x64")
                             else jnp.float32)
    inter = jnp.diag(confmat)
    union = confmat.sum(0) + confmat.sum(1) - inter
    scores = jnp.where(union == 0, absent_score, inter / jnp.maximum(union, 1))
    present = confmat.sum(axis=1) != 0
    if average in ("none", None):
        # per-class scores; with over_present_classes, absent classes are
        # NaN (like torchmetrics average='none')
        if over_present_classes:
            return jnp.where(present, scores, jnp.nan)
        return scores
    if average == "macro":
        if over_present_classes:
            n = jnp.maximum(present.sum(), 1)
            return jnp.sum(jnp.where(present, scores, 0.0)) / n
        return jnp.mean(scores)
    raise ValueError(f"unsupported average: {average}")


# ---------------------------------------------------------------------------
# Sparse EPE / PCK for dense matching (reference helpers/metrics.py:35-261)
# ---------------------------------------------------------------------------

class EPEState(NamedTuple):
    """Accumulators: total EPE, per-threshold correct counts, total count."""
    epe_sum: jax.Array           # ()
    pck_correct: jax.Array       # (len(thresholds),)
    total: jax.Array             # ()


def epe_init(num_thresholds: int = 4) -> EPEState:
    return EPEState(jnp.zeros(()), jnp.zeros((num_thresholds,)),
                    jnp.zeros(()))


def epe_update(state: EPEState, pred_flow: jax.Array, gt_flow: jax.Array,
               valid: jax.Array,
               thresholds: Tuple[float, ...] = (1.0, 3.0, 5.0, 10.0)
               ) -> EPEState:
    """Accumulate sparse end-point error and PCK counts.

    Args:
      pred_flow / gt_flow: (N, 2) flows at valid correspondence points.
      valid: (N,) bool — which rows are real correspondences (padding mask).
      thresholds: PCK pixel thresholds.
    """
    dist = jnp.linalg.norm(
        (pred_flow - gt_flow).astype(jnp.float32), axis=-1)
    v = valid.astype(jnp.float32)
    epe_sum = state.epe_sum + jnp.sum(dist * v)
    correct = jnp.stack(
        [jnp.sum((dist <= t).astype(jnp.float32) * v) for t in thresholds])
    return EPEState(epe_sum, state.pck_correct + correct,
                    state.total + jnp.sum(v))


def epe_compute(state: EPEState,
                thresholds: Tuple[float, ...] = (1.0, 3.0, 5.0, 10.0)
                ) -> Dict[str, jax.Array]:
    n = jnp.maximum(state.total, 1.0)
    out = {"AEPE": state.epe_sum / n}
    for i, t in enumerate(thresholds):
        out[f"PCK_{int(t)}"] = state.pck_correct[i] / n
    return out
