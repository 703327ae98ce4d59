"""Functional, psum-able evaluation metrics.

Replaces the reference's torchmetrics wrappers (helpers/metrics.py:264-387 IoU,
:35-261 SparseEPE).  Metric state is a plain pytree of accumulators so it can
be carried through jitted eval steps and reduced across devices with
``jax.lax.psum`` (the reference uses ``dist_reduce_fx='sum'``).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

__all__ = ["iou_init", "iou_update", "iou_compute"]


# ---------------------------------------------------------------------------
# IoU over a confusion matrix (reference helpers/metrics.py:264-387)
# ---------------------------------------------------------------------------

def iou_init(num_classes: int) -> jax.Array:
    """(C, C) int32 confusion matrix accumulator.

    int32 is exact for any single batch (and for psum across devices), but
    a cell can exceed 2**31 over a large full-dataset evaluation — the
    reference's torchmetrics confmat is int64.  Long-running hosts should
    accumulate per-batch counts into a numpy int64 matrix (as
    tasks/seg_task.py does) rather than chaining one device accumulator.
    """
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


# SparseEPE/PCK/AUSE live in utils/sparse_epe.py (host-side numpy): the
# reference metric is a per-sample mean-of-means over RAGGED correspondence
# lists (helpers/metrics.py:35-261), which has no natural static-shape
# device formulation; its accumulator dict is a plain sum for distributed
# reduction.
