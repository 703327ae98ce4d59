"""Optimizers and LR schedules.

Reproduces the reference's param-group policy
(models/segmentation_model.py:390-419): head vs backbone x weight vs
bias/norm, with ``backbone_lr_factor`` on backbone groups and zero weight
decay on 1-D params; and the mmseg-style linear-warmup + polynomial decay
schedule (helpers/lr_scheduler.py:8-57), plus the multi-step schedule used
by UAWarpC training (configs/megadepth/uawarpc_stage1.yaml:161-174).

Implemented with optax: one global schedule, per-group lr factors via
``optax.multi_transform`` over a label tree.
"""
from __future__ import annotations

from typing import Any, Dict, Optional, Sequence

import jax
import jax.numpy as jnp
import optax


def warmup_poly_schedule(base_lr: float, max_steps: int,
                         warmup_iters: int = 1500,
                         warmup_ratio: float = 1e-6,
                         power: float = 0.9,
                         min_lr: float = 0.0):
    """LinearWarmupPolynomialLR (reference lr_scheduler.py:45-57).

    Matches torch's step ordering: the lr used at optimizer step t is the
    scheduler value at last_epoch=t (scheduler.step() after opt.step()).
    """

    def schedule(step):
        step = jnp.asarray(step, jnp.float32)
        warm_k = (1.0 - step / warmup_iters) * (1.0 - warmup_ratio)
        warm_lr = base_lr * (1.0 - warm_k)
        coeff = (1.0 - (step - warmup_iters)
                 / float(max_steps - warmup_iters)) ** power
        poly_lr = (base_lr - min_lr) * coeff + min_lr
        return jnp.where(step < warmup_iters, warm_lr, poly_lr)

    return schedule


def multistep_schedule(base_lr: float, milestones: Sequence[int],
                       gamma: float = 0.5):
    """torch MultiStepLR equivalent."""
    ms = jnp.asarray(list(milestones))

    def schedule(step):
        n = jnp.sum((jnp.asarray(step)[None] >= ms).astype(jnp.int32))
        return base_lr * (gamma ** n)

    return schedule


def param_group_label(path: Sequence[str], value: Any) -> str:
    """head/backbone x weight/bias grouping (reference :390-419).
    1-D params (biases, norm scales) get no weight decay."""
    top = path[0] if path else ""
    is_backbone = str(top).startswith("backbone")
    is_1d = getattr(value, "ndim", 0) <= 1
    return ("backbone" if is_backbone else "head") + (
        "_bias" if is_1d else "_weight")


def make_uda_optimizer(params, base_lr: float, weight_decay: float,
                       max_steps: int, backbone_lr_factor: float = 0.1,
                       warmup_iters: int = 1500, power: float = 0.9,
                       warmup_ratio: float = 1e-6, min_lr: float = 0.0,
                       betas=(0.9, 0.999), accumulate_steps: int = 1):
    """AdamW with the reference's 4 param groups and warmup-poly schedule."""
    sched = warmup_poly_schedule(base_lr, max_steps,
                                 warmup_iters=warmup_iters, power=power,
                                 warmup_ratio=warmup_ratio, min_lr=min_lr)

    def group_tx(lr_factor: float, wd: float):
        # the reference scheduler operates on each param group's OWN base lr
        # (factor * lr) with a SHARED min_lr floor ((base-min_lr)*coeff +
        # min_lr, lr_scheduler.py:55-57) — scaling the shared schedule's
        # output by the factor would wrongly scale min_lr too
        gsched = warmup_poly_schedule(
            base_lr * lr_factor, max_steps, warmup_iters=warmup_iters,
            power=power, warmup_ratio=warmup_ratio, min_lr=min_lr)
        return optax.chain(
            optax.scale_by_adam(b1=betas[0], b2=betas[1]),
            optax.add_decayed_weights(wd),
            optax.scale_by_learning_rate(gsched),
        )

    labels = jax.tree_util.tree_map_with_path(
        lambda p, v: param_group_label([k.key for k in p], v), params)
    tx = optax.multi_transform(
        {"head_weight": group_tx(1.0, weight_decay),
         "head_bias": group_tx(1.0, 0.0),
         "backbone_weight": group_tx(backbone_lr_factor, weight_decay),
         "backbone_bias": group_tx(backbone_lr_factor, 0.0)},
        labels)
    if accumulate_steps > 1:
        # gradient accumulation (reference mentions it via callbacks.py:13-15
        # but never configures it; we expose it properly)
        tx = optax.MultiSteps(tx, every_k_schedule=accumulate_steps)
    return tx, sched


def make_adam_optimizer(base_lr: float, milestones: Sequence[int],
                        gamma: float = 0.5, weight_decay: float = 0.0,
                        betas=(0.9, 0.999)):
    """Plain Adam + MultiStepLR for UAWarpC training
    (uawarpc_stage1.yaml:161-174).

    torch.optim.Adam semantics: weight decay is classic L2 regularization
    — ``wd * p`` is added to the GRADIENT before the moment estimates
    (decay precedes scale_by_adam), unlike AdamW's decoupled decay."""
    sched = multistep_schedule(base_lr, milestones, gamma)
    tx = optax.chain(
        optax.add_decayed_weights(weight_decay) if weight_decay else
        optax.identity(),
        optax.scale_by_adam(b1=betas[0], b2=betas[1]),
        optax.scale_by_learning_rate(sched),
    )
    return tx, sched
