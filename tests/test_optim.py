"""Optimizer/schedule fidelity vs torch.

make_adam_optimizer must reproduce torch.optim.Adam exactly — including
classic L2-into-gradient weight decay (NOT AdamW's decoupled decay) and
betas — because UAWarpC training fidelity depends on it
(reference configs/megadepth/uawarpc_stage1.yaml optimizer block).
"""
import numpy as np
import optax
import torch

import jax.numpy as jnp

from refign_tpu.train.optim import (make_adam_optimizer, make_uda_optimizer,
                                    warmup_poly_schedule)


def test_adam_matches_torch_with_weight_decay():
    rng = np.random.RandomState(0)
    w0 = rng.randn(4, 3).astype(np.float32)
    lr, wd, betas = 1e-2, 4e-4, (0.8, 0.95)

    tp = torch.nn.Parameter(torch.from_numpy(w0.copy()))
    topt = torch.optim.Adam([tp], lr=lr, weight_decay=wd, betas=betas)

    tx, _ = make_adam_optimizer(lr, milestones=[10 ** 9], gamma=0.5,
                                weight_decay=wd, betas=betas)
    params = {"w": jnp.asarray(w0)}
    opt_state = tx.init(params)

    for step in range(3):
        g = rng.randn(4, 3).astype(np.float32)
        tp.grad = torch.from_numpy(g.copy())
        topt.step()
        updates, opt_state = tx.update({"w": jnp.asarray(g)}, opt_state,
                                       params)
        params = optax.apply_updates(params, updates)
        np.testing.assert_allclose(np.asarray(params["w"]),
                                   tp.detach().numpy(),
                                   rtol=1e-5, atol=1e-6,
                                   err_msg=f"diverged at step {step}")


def test_uda_optimizer_matches_torch_adamw():
    """The UDA path is torch.optim.AdamW (decoupled decay)."""
    rng = np.random.RandomState(1)
    w0 = rng.randn(4, 3).astype(np.float32)   # 2-D => 'head_weight' group
    lr, wd = 6e-4, 0.01

    tp = torch.nn.Parameter(torch.from_numpy(w0.copy()))
    topt = torch.optim.AdamW([tp], lr=lr, weight_decay=wd)

    params = {"w": jnp.asarray(w0)}
    # warmup_iters=0 -> pure poly decay; at steps 0-2 of a 1e6-step run the
    # coeff is 1-O(1e-6), i.e. the constant-lr torch reference
    tx, _ = make_uda_optimizer(params, lr, wd, max_steps=10 ** 6,
                               warmup_iters=0)
    opt_state = tx.init(params)
    for step in range(3):
        g = rng.randn(4, 3).astype(np.float32)
        tp.grad = torch.from_numpy(g.copy())
        topt.step()
        updates, opt_state = tx.update({"w": jnp.asarray(g)}, opt_state,
                                       params)
        params = optax.apply_updates(params, updates)
        # schedules differ by the poly coeff (~1e-6 rel at these steps)
        np.testing.assert_allclose(np.asarray(params["w"]),
                                   tp.detach().numpy(),
                                   rtol=1e-4, atol=1e-6,
                                   err_msg=f"diverged at step {step}")


def test_warmup_ratio_and_min_lr_reach_schedule():
    """Config warmup_ratio/min_lr must not be silently dropped
    (regression: make_uda_optimizer hardcoded the defaults)."""
    sched = warmup_poly_schedule(1.0, max_steps=100, warmup_iters=10,
                                 warmup_ratio=0.25, min_lr=0.125)
    # step 0: lr = base * warmup_ratio exactly (torch semantics at t=0)
    np.testing.assert_allclose(float(sched(0)), 0.25, rtol=1e-6)
    # last step: decays to min_lr, not 0
    np.testing.assert_allclose(float(sched(100)), 0.125, rtol=1e-6)

    _, sched2 = make_uda_optimizer(
        {"w": jnp.zeros((2, 2))}, 1.0, 0.0, max_steps=100,
        warmup_iters=10, warmup_ratio=0.25, min_lr=0.125)
    np.testing.assert_allclose(float(sched2(0)), 0.25, rtol=1e-6)
    np.testing.assert_allclose(float(sched2(100)), 0.125, rtol=1e-6)
