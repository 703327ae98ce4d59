"""Checkpoint interop: torch full-UDA checkpoint grouping, backbone prefix
stripping, and orbax save/restore round-trip."""
import os

import numpy as np
import pytest
import torch

import ref_oracle
from refign_tpu.utils.checkpoint import (load_torch_backbone,
                                         load_torch_full_uda,
                                         restore_checkpoint,
                                         save_checkpoint)


def test_full_uda_checkpoint_grouping(tmp_path):
    """A reference-style UDA checkpoint (student+teacher+imnet+aligner in one
    state_dict, segmentation_model.py:66-88) splits into per-module trees."""
    mt = ref_oracle.load_ref_module("models.backbones.mix_transformer")
    torch.manual_seed(0)
    bb = mt.MixVisionTransformer("mit_b0", drop_path_rate=0.0)
    sd = {}
    for prefix in ("backbone.", "m_backbone.", "imnet_backbone."):
        for k, v in bb.state_dict().items():
            sd[prefix + k] = v
    sd["head.conv_seg.weight"] = torch.zeros(19, 32, 1, 1)
    sd["head.conv_seg.bias"] = torch.zeros(19)
    sd["alignment_head.reduce.weight"] = torch.zeros(2, 32, 1, 1)
    sd["alignment_head.reduce.bias"] = torch.zeros(2)
    path = str(tmp_path / "uda.ckpt")
    torch.save({"state_dict": sd}, path)

    groups = load_torch_full_uda(path)
    assert set(groups) == {"backbone", "m_backbone", "imnet_backbone",
                           "head", "alignment_head"}
    assert groups["head"]["params"]["conv_seg"]["kernel"].shape == \
        (1, 1, 32, 19)
    assert "patch_embed1" in groups["backbone"]["params"]
    assert "patch_embed1" in groups["m_backbone"]["params"]


def test_backbone_prefix_stripping(tmp_path):
    mt = ref_oracle.load_ref_module("models.backbones.mix_transformer")
    torch.manual_seed(1)
    bb = mt.MixVisionTransformer("mit_b0", drop_path_rate=0.0)
    sd = {"backbone." + k: v for k, v in bb.state_dict().items()}
    sd["head.something.weight"] = torch.zeros(4, 4)
    path = str(tmp_path / "seg.pth")
    torch.save(sd, path)
    out = load_torch_backbone(path)
    assert "patch_embed1" in out["params"]
    assert "head" not in out["params"]

    # the converted tree loads into the flax model and reproduces outputs
    from refign_tpu.models.mix_transformer import MixVisionTransformer
    rng = np.random.RandomState(0)
    x = rng.randn(1, 32, 32, 3).astype(np.float32)
    mine = MixVisionTransformer(model_type="mit_b0", drop_path_rate=0.0)
    outs = mine.apply({"params": out["params"]}, x)
    bb.eval()
    with torch.no_grad():
        want = bb(torch.from_numpy(np.transpose(x, (0, 3, 1, 2))))
    np.testing.assert_allclose(
        np.transpose(np.asarray(outs[0]), (0, 3, 1, 2)), want[0].numpy(),
        rtol=1e-4, atol=1e-4)


def test_orbax_roundtrip(tmp_path):
    state = {
        "step": np.asarray(7, np.int32),
        "params": {"w": np.arange(12, dtype=np.float32).reshape(3, 4)},
    }
    ckpt_dir = str(tmp_path / "ckpts")
    save_checkpoint(ckpt_dir, state, step=7)
    save_checkpoint(ckpt_dir, state, step=8)
    assert os.path.exists(os.path.join(ckpt_dir, "last"))
    restored = restore_checkpoint(os.path.join(ckpt_dir, "last"), state)
    np.testing.assert_array_equal(restored["params"]["w"],
                                  state["params"]["w"])
    assert int(restored["step"]) == 7 or int(restored["step"]) == 8
    # prune keeps at most 3
    for s in (9, 10, 11):
        save_checkpoint(ckpt_dir, state, step=s)
    steps = [d for d in os.listdir(ckpt_dir) if d.startswith("step_")]
    assert len(steps) <= 3


def test_prune_never_strands_last(tmp_path):
    """Crash-resume guard: `last` always resolves to a live checkpoint,
    even when the link lags behind the newest saves (e.g. after a crash
    between save and symlink swap on an older run)."""
    state = {"step": np.asarray(0, np.int32),
             "params": {"w": np.zeros((2,), np.float32)}}
    ckpt_dir = str(tmp_path / "ckpts")
    save_checkpoint(ckpt_dir, state, step=1)
    # simulate a stale `last` from an interrupted run: re-point it at step_1
    last = os.path.join(ckpt_dir, "last")
    os.remove(last)
    os.symlink(os.path.join(ckpt_dir, "step_1"), last)
    # subsequent saves with save_last=False prune aggressively but must
    # keep step_1 alive because `last` points at it
    for s in (2, 3, 4, 5):
        save_checkpoint(ckpt_dir, state, step=s, keep=2, save_last=False)
    assert os.path.isdir(os.path.join(ckpt_dir, "step_1"))
    restored = restore_checkpoint(last, state)
    np.testing.assert_array_equal(restored["params"]["w"],
                                  state["params"]["w"])
    # normal save re-points `last` atomically to the newest step
    save_checkpoint(ckpt_dir, state, step=6, keep=2)
    assert os.readlink(last).endswith("step_6")
    assert not os.path.isdir(os.path.join(ckpt_dir, "step_1"))


def test_prune_survives_orbax_tmp_dirs(tmp_path):
    """A crash mid-save leaves `step_<N>.orbax-checkpoint-tmp-<ts>` dirs;
    pruning must skip them instead of dying on int() (regression)."""
    state = {"step": np.asarray(0, np.int32),
             "params": {"w": np.zeros((2,), np.float32)}}
    ckpt_dir = str(tmp_path / "ckpts")
    save_checkpoint(ckpt_dir, state, step=1)
    os.makedirs(os.path.join(
        ckpt_dir, "step_2.orbax-checkpoint-tmp-1699999999"))
    # must neither raise nor delete the temp dir's prefix sibling
    save_checkpoint(ckpt_dir, state, step=3)
    assert os.path.isdir(os.path.join(ckpt_dir, "step_3"))


def test_seg_task_pretrained_backbone_loads_running_stats(tmp_path):
    """SegTask's pretrained-backbone bootstrap must land BN running
    mean/var, not just params (regression: batch_stats stayed at flax
    init 0/1 for ResNet/DeepLabV2 configs)."""
    rm = ref_oracle.load_ref_module("models.backbones.resnet")
    torch.manual_seed(3)
    ref = rm.ResNet("resnet18_v1c", strides=(1, 2, 2, 2),
                    dilations=(1, 1, 1, 1), out_indices=(0, 1, 2, 3))
    # make running stats distinguishable from flax init (mean 0 / var 1)
    with torch.no_grad():
        for m in ref.modules():
            if isinstance(m, torch.nn.BatchNorm2d):
                m.running_mean.uniform_(0.5, 1.5)
                m.running_var.uniform_(2.0, 3.0)
    path = str(tmp_path / "r18.pth")
    torch.save(ref.state_dict(), path)

    from refign_tpu.config import OptimizerSpec, SchedulerSpec
    from refign_tpu.tasks.seg_task import SegTask
    margs = {
        "backbone": {"class_path": "models.backbones.ResNet",
                     "init_args": {"model_type": "resnet18_v1c",
                                   "pretrained": path}},
        "head": {"class_path": "models.heads.DeepLabV2Head",
                 "init_args": {"in_channels": 512, "in_index": 3,
                               "num_classes": 19}},
        "enable_fdist": False,
        "use_refign": False,
    }
    import jax
    task = SegTask(margs, OptimizerSpec("AdamW", 6e-4, 0.01),
                   SchedulerSpec("LinearWarmupPolynomialLR", max_steps=10),
                   {}, datamodule=None)
    state, _ = task.init_state(jax.random.PRNGKey(0))
    stem_stats = state.batch_stats["backbone"]["stem_1"]
    want = ref.stem[1].running_mean.numpy()
    np.testing.assert_allclose(np.asarray(stem_stats["mean"]), want,
                               rtol=1e-6)
    assert float(np.asarray(stem_stats["var"]).min()) > 1.5
