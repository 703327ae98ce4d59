"""Alignment-training TRAJECTORY golden vs the live torch reference.

Runs 3 full UAWarpC train steps (frozen VGG, 3 head passes, MultiScaleFlow +
WBipath(visibility_mask) losses, adaptive ss/us weighting, torch-Adam with
L2-into-gradient weight decay, MultiStepLR) through BOTH frameworks from
identical converted init and identical data, comparing per-step losses and
the head-parameter trace.  Companion to test_trajectory_golden.py (UDA);
pins the alignment dynamics end to end — in particular the torch-Adam
weight-decay semantics and the stage-2 visibility mask inside a real step.

LR is tiny and WD large on purpose: the W-bipath NLL with its ~100x adaptive
clamp weight and hard visibility threshold amplifies Adam's ~sign(grad)*lr
updates chaotically (a 1e-7 cross-framework forward difference flips update
signs, and by step 2 the losses differ several percent at lr=1e-4 — and
differ run to run).  At lr=1e-6 the trajectory stays in the linear regime
while wd=0.1 dominates most gradients, so a decay-semantics bug (e.g.
decoupled AdamW-style decay instead of torch-Adam L2-into-gradient) still
flips update signs en masse and fails the norm-trace assert.

Reference: models/alignment_model.py:81-146 (training_step),
configure_optimizers :208-214; batch keys from §3.3 of SURVEY.md.

Both sides consume the SAME fixed prime data: the reference gets it in the
batch (as from the host transform pipeline); ours is injected by
monkeypatching alignment.trainer.prepare_alignment_batch (our step
generates the prime view on device, which is RNG-incompatible with torch).
"""
import numpy as np
import pytest
import torch

import ref_oracle
from refign_tpu.models.heads.uawarpc import UAWarpCHead
from refign_tpu.models.vgg import VGG
from refign_tpu.utils.torch_convert import convert_state_dict

B, H, W = 2, 64, 64
LR, WD = 1e-6, 0.1
N_STEPS = 3


def _nchw(a):
    return torch.from_numpy(np.transpose(a, (0, 3, 1, 2)))


@pytest.fixture(scope="module")
def data_np():
    rng = np.random.RandomState(11)
    flow = rng.randn(B, H, W, 2).astype(np.float32) * 2.0
    return {
        "image_ref": rng.randn(B, H, W, 3).astype(np.float32) * 0.5,
        "image_trg": rng.randn(B, H, W, 3).astype(np.float32) * 0.5,
        "image_prime": rng.randn(B, H, W, 3).astype(np.float32) * 0.5,
        "flow_prime": flow,
        "mask_prime": (rng.rand(B, H, W) > 0.2),
        "prime_trg_idx": np.array([0, 1], np.int64),
    }


def _torch_trajectory(data_np):
    am = ref_oracle.load_ref_alignment_model_module()
    vm = ref_oracle.load_ref_module("models.backbones.vgg")
    um = ref_oracle.load_ref_module("models.heads.uawarpc")
    lm = ref_oracle.load_ref_module("models.losses")

    torch.manual_seed(3)
    backbone = vm.VGG("vgg11", out_indices=[2, 3, 4])
    head = um.UAWarpCHead(in_index=[0, 1],
                          input_transform="multiple_select",
                          estimate_uncertainty=True, batch_norm=True)
    model = am.AlignmentModel(
        optimizer_init={"class_path": "torch.optim.Adam",
                        "init_args": {"lr": LR, "weight_decay": WD}},
        lr_scheduler_init={
            "class_path": "torch.optim.lr_scheduler.MultiStepLR",
            "init_args": {"milestones": [100], "gamma": 0.5}},
        alignment_backbone=backbone,
        alignment_head=head,
        selfsupervised_loss=lm.MultiScaleFlowLoss(loss_type="HuberLoss"),
        unsupervised_loss=lm.WBipathLoss(objective="multi_scale_flow_loss",
                                         loss_type="HuberLoss",
                                         visibility_mask=True),
    )
    [opt], [sched_cfg] = model.configure_optimizers()
    sched = sched_cfg["scheduler"]
    model.train()

    import copy
    init_sd = {
        "backbone": copy.deepcopy(backbone.state_dict()),
        "head": copy.deepcopy(head.state_dict()),
    }

    batch_t = {
        "image_ref": _nchw(data_np["image_ref"]),
        "image_trg": _nchw(data_np["image_trg"]),
        "image_prime": _nchw(data_np["image_prime"]),
        "flow_prime": _nchw(data_np["flow_prime"]),
        "mask_prime": torch.from_numpy(data_np["mask_prime"]),
        "prime_trg_idx": torch.from_numpy(data_np["prime_trg_idx"]),
    }
    logged = {}
    model.log = lambda name, value, *a, **k: logged.__setitem__(
        name, float(value))
    losses_trace, norm_trace = [], []
    for _step in range(N_STEPS):
        logged.clear()
        loss = model.training_step(batch_t, _step)
        opt.zero_grad()
        loss.backward()
        opt.step()
        sched.step()
        losses_trace.append(logged["train_matching_loss"])
        with torch.no_grad():
            norm_trace.append(float(sum(
                (p * p).sum() for p in head.parameters())))
    return model, init_sd, losses_trace, norm_trace


def test_align_training_trajectory_matches_reference(data_np, monkeypatch):
    import jax
    import jax.numpy as jnp
    import refign_tpu.alignment.trainer as trainer_mod
    from refign_tpu.alignment.trainer import (AlignConfig, init_align_state,
                                              make_align_train_step)
    from refign_tpu.train.optim import make_adam_optimizer
    from refign_tpu.utils.torch_convert import check_tree_match

    model, init_sd, ref_losses, ref_norms = _torch_trajectory(data_np)

    bb_conv = convert_state_dict(init_sd["backbone"])
    hd_conv = convert_state_dict(init_sd["head"])

    backbone = VGG(model_type="vgg11", out_indices=(2, 3, 4))
    head = UAWarpCHead(in_index=(0, 1), estimate_uncertainty=True)
    key = jax.random.PRNGKey(0)
    feats = backbone.apply({"params": bb_conv["params"]},
                           np.zeros((1, H, W, 3), np.float32),
                           extract_only_indices=[-3, -2])
    feats256 = backbone.apply({"params": bb_conv["params"]},
                              np.zeros((1, 256, 256, 3), np.float32),
                              extract_only_indices=[-2, -1])
    hvars_init = head.init(key, feats, feats, feats256, feats256, (H, W))
    errs = check_tree_match(hd_conv["params"], hvars_init["params"])
    assert not errs, "\n".join(errs[:10])

    # inject the SAME fixed prime data our torch run consumed
    fixed_prime = {
        "image_prime": jnp.asarray(data_np["image_prime"]),
        "flow_prime": jnp.asarray(data_np["flow_prime"]),
        "mask_prime": jnp.asarray(data_np["mask_prime"]),
        "prime_trg_idx": jnp.asarray(data_np["prime_trg_idx"], jnp.int32),
    }
    monkeypatch.setattr(
        trainer_mod, "prepare_alignment_batch",
        lambda rng, ref, trg, cfg, out_slice=None: dict(fixed_prime))

    cfg = AlignConfig(visibility_mask=True, compute_dtype="float32")
    tx, _ = make_adam_optimizer(LR, [100], gamma=0.5, weight_decay=WD)
    state = init_align_state(
        {"params": hd_conv["params"],
         "batch_stats": hd_conv["batch_stats"]},
        bb_conv["params"], tx)
    step_fn = jax.jit(make_align_train_step(backbone, head, tx, cfg))

    batch = {"image_ref": jnp.asarray(data_np["image_ref"]),
             "image_trg": jnp.asarray(data_np["image_trg"])}
    my_losses, my_norms = [], []
    for step in range(N_STEPS):
        state, logs = step_fn(state, batch, jax.random.PRNGKey(step))
        my_losses.append(float(logs["train_matching_loss"]))
        my_norms.append(sum(float(jnp.sum(jnp.square(x)))
                            for x in jax.tree_util.tree_leaves(state.params)))

    for step in range(N_STEPS):
        np.testing.assert_allclose(
            my_losses[step], ref_losses[step], rtol=2e-3, atol=2e-4,
            err_msg=f"step {step} train_matching_loss")
        np.testing.assert_allclose(
            my_norms[step], ref_norms[step], rtol=1e-5,
            err_msg=f"head param sq-norm diverged at step {step}")

    # final params elementwise (same flip-tolerant bound rationale as
    # test_trajectory_golden.py: Adam's early updates are ~sign(grad)*lr)
    hd_final = convert_state_dict(
        model.alignment_head.state_dict())["params"]
    flat_ref = jax.tree_util.tree_leaves(hd_final)
    flat_my = jax.tree_util.tree_leaves(state.params)
    worst = max(float(np.max(np.abs(np.asarray(a) - np.asarray(b))))
                for a, b in zip(flat_my, flat_ref))
    # each noise-driven Adam sign flip contributes up to 2*LR per step
    assert worst < 8 * LR, f"max |param diff| after {N_STEPS} steps: {worst}"
