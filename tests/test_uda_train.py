"""UDA train-step smoke tests: loss finiteness, EMA update, grad flow,
determinism under fixed PRNG (SURVEY.md §4 item 3)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from refign_tpu.models.heads.daformer import DAFormerHead
from refign_tpu.models.heads.segformer import SegFormerHead
from refign_tpu.models.heads.uawarpc import UAWarpCHead
from refign_tpu.models.mix_transformer import MixVisionTransformer
from refign_tpu.models.segmentor import Segmentor
from refign_tpu.models.vgg import VGG
from refign_tpu.train.optim import make_uda_optimizer
from refign_tpu.uda.trainer import (UDAConfig, UDATrainState, init_uda_state,
                                    make_uda_train_step)


def _build(use_hrda):
    backbone = MixVisionTransformer(model_type="mit_b0", drop_path_rate=0.1)
    head = DAFormerHead(num_classes=19, channels=32, embed_dims=32)
    att = SegFormerHead(num_classes=19, channels=32) if use_hrda else None
    return Segmentor(backbone=backbone, head=head, scale_attention=att)


def _batch(rng, B=2, H=64, W=64):
    return {
        "image_src": rng.randn(B, H, W, 3).astype(np.float32),
        "semantic_src": rng.randint(0, 19, size=(B, H, W)),
        "image_trg": rng.randn(B, H, W, 3).astype(np.float32),
        "image_ref": rng.randn(B, H, W, 3).astype(np.float32),
    }


@pytest.mark.parametrize("use_hrda", [False, True])
def test_uda_train_step_runs(use_hrda):
    seg = _build(use_hrda)
    rng = np.random.RandomState(0)
    batch = _batch(rng)
    key = jax.random.PRNGKey(0)
    if use_hrda:
        variables = seg.init(key, batch["image_src"],
                             jnp.zeros((2,), jnp.int32),
                             method=Segmentor.hrda_train)
    else:
        variables = seg.init(key, batch["image_src"],
                             method=Segmentor.logits_and_features)
    cfg = UDAConfig(use_hrda=use_hrda, use_refign=False, enable_fdist=True)
    tx, _ = make_uda_optimizer(variables["params"], 6e-4, 0.01, 100)
    state = init_uda_state(variables["params"],
                           variables.get("batch_stats", {}), tx)
    step = make_uda_train_step(seg, None, None, tx, cfg)
    new_state, logs = step(state, batch, None, key)
    assert np.isfinite(float(logs["train_loss_total"]))
    assert np.isfinite(float(logs["train_loss_src"]))
    assert np.isfinite(float(logs["train_loss_featdist_src"]))
    assert int(new_state.step) == 1

    # params changed, imnet params frozen
    p0 = jax.tree_util.tree_leaves(state.params)[0]
    p1 = jax.tree_util.tree_leaves(new_state.params)[0]
    # warmup lr at step 0 is base*1e-6, so updates are tiny but nonzero
    assert not np.array_equal(np.asarray(p0), np.asarray(p1))
    i0 = jax.tree_util.tree_leaves(state.imnet_params)[0]
    i1 = jax.tree_util.tree_leaves(new_state.imnet_params)[0]
    np.testing.assert_array_equal(np.asarray(i0), np.asarray(i1))

    # EMA: at step 0 momentum = min(1-1/1, 0.999) = 0 -> teacher == student
    t1 = jax.tree_util.tree_leaves(new_state.teacher_params)[0]
    np.testing.assert_allclose(np.asarray(t1), np.asarray(p0), atol=1e-6)

    # determinism: same inputs + key -> same result
    new_state2, logs2 = step(state, batch, None, key)
    np.testing.assert_allclose(float(logs2["train_loss_total"]),
                               float(logs["train_loss_total"]), rtol=1e-6)


def test_uda_train_step_refign_align():
    seg = _build(False)
    align_backbone = VGG(model_type="vgg11", out_indices=(2, 3, 4))
    align_head = UAWarpCHead(in_index=(0, 1), estimate_uncertainty=True)
    rng = np.random.RandomState(1)
    batch = _batch(rng)
    key = jax.random.PRNGKey(1)
    variables = seg.init(key, batch["image_src"],
                         method=Segmentor.logits_and_features)

    # init align params: backbone on a 256 image; head on matching pyramids
    ab_vars = align_backbone.init(key, np.zeros((1, 256, 256, 3), np.float32))
    x = np.zeros((1, 64, 64, 3), np.float32)
    feats = align_backbone.apply(ab_vars, x, extract_only_indices=[-3, -2])
    feats256 = align_backbone.apply(
        ab_vars, np.zeros((1, 256, 256, 3), np.float32),
        extract_only_indices=[-2, -1])
    ah_vars = align_head.init(key, feats, feats, feats256, feats256, (64, 64))
    align_params = {"backbone": ab_vars["params"],
                    "head": ah_vars["params"],
                    "head_stats": ah_vars["batch_stats"]}

    cfg = UDAConfig(use_refign=True, use_align=True, adapt_to_ref=True,
                    enable_fdist=False)
    tx, _ = make_uda_optimizer(variables["params"], 6e-4, 0.01, 100)
    state = init_uda_state(variables["params"],
                           variables.get("batch_stats", {}), tx,
                           enable_fdist=False)
    step = make_uda_train_step(seg, align_backbone, align_head, tx, cfg)
    new_state, logs = step(state, batch, align_params, key)
    assert np.isfinite(float(logs["train_loss_total"]))
    assert int(new_state.step) == 1

    # the adapt_to_ref coin (host-side) switches to the plain branch
    new_state2, logs2 = step(state, batch, align_params, key,
                             use_ref_as_target=True)
    assert np.isfinite(float(logs2["train_loss_total"]))


def test_uda_train_step_bn_backbone_fdist():
    """DeepLabV2-style config: ResNet (BatchNorm) student + fdist.  The
    frozen imnet forward must run eval-mode BN against the init-snapshot
    running stats (regression: the apply provided no batch_stats and
    crashed on the first step), and the student's BN must actually run in
    batch-stats mode (train=True reaches the backbone through Segmentor)."""
    from refign_tpu.models.heads.deeplabv2 import DeepLabV2Head
    from refign_tpu.models.resnet import ResNet

    seg = Segmentor(
        backbone=ResNet(model_type="resnet18_v1c", strides=(1, 2, 1, 1),
                        dilations=(1, 1, 2, 4)),
        head=DeepLabV2Head(num_classes=19, in_index=3))
    rng = np.random.RandomState(1)
    batch = _batch(rng)
    key = jax.random.PRNGKey(1)
    variables = seg.init(key, batch["image_src"],
                         method=Segmentor.logits_and_features)
    cfg = UDAConfig(use_hrda=False, use_refign=False, enable_fdist=True)
    tx, _ = make_uda_optimizer(variables["params"], 6e-4, 0.01, 100)
    state = init_uda_state(variables["params"],
                           variables["batch_stats"], tx)
    step = make_uda_train_step(seg, None, None, tx, cfg)
    new_state, logs = step(state, batch, None, key)
    assert np.isfinite(float(logs["train_loss_total"]))
    assert np.isfinite(float(logs["train_loss_featdist_src"]))

    # imnet stats stayed frozen at the init snapshot
    i0 = jax.tree_util.tree_leaves(state.imnet_batch_stats)[0]
    i1 = jax.tree_util.tree_leaves(new_state.imnet_batch_stats)[0]
    np.testing.assert_array_equal(np.asarray(i0), np.asarray(i1))
    # the student's BN running stats DID update (train mode reached BN)
    s0 = jax.tree_util.tree_leaves(state.batch_stats)
    s1 = jax.tree_util.tree_leaves(new_state.batch_stats)
    assert any(not np.allclose(np.asarray(a), np.asarray(b))
               for a, b in zip(s0, s1)), "BN stats never updated"


def test_device_normalize_matches_host_normalize():
    """cfg.device_normalize: a uint8 batch normalized ON DEVICE
    ((x/255 - mean)/std inside jit_prefix/jit_core) must produce the same
    step as the host-normalized fp32 batch — same math, moved across the
    PCIe boundary (4x fewer host->device bytes).  fp32 compute so the
    comparison is exact-tolerance."""
    seg = _build(False)
    rng = np.random.RandomState(11)
    B, H, W = 2, 64, 64
    MEAN = np.array([0.485, 0.456, 0.406], np.float32)
    STD = np.array([0.229, 0.224, 0.225], np.float32)
    u8 = {
        "image_src": rng.randint(0, 256, (B, H, W, 3)).astype(np.uint8),
        "semantic_src": rng.randint(0, 19, size=(B, H, W)),
        "image_trg": rng.randint(0, 256, (B, H, W, 3)).astype(np.uint8),
        "image_ref": rng.randint(0, 256, (B, H, W, 3)).astype(np.uint8),
    }
    host = dict(u8)
    for k in ("image_src", "image_trg", "image_ref"):
        host[k] = ((u8[k].astype(np.float32) / 255.0 - MEAN) / STD)

    key = jax.random.PRNGKey(3)
    out = {}
    for name, cfg, batch in (
            ("host", UDAConfig(use_refign=False, enable_fdist=True,
                               compute_dtype="float32"), host),
            ("device", UDAConfig(use_refign=False, enable_fdist=True,
                                 compute_dtype="float32",
                                 device_normalize=True), u8)):
        variables = seg.init(key, np.zeros((1, H, W, 3), np.float32),
                             method=Segmentor.logits_and_features)
        tx, _ = make_uda_optimizer(variables["params"], 6e-4, 0.01, 100)
        state = init_uda_state(variables["params"],
                               variables.get("batch_stats", {}), tx)
        step = make_uda_train_step(seg, None, None, tx, cfg)
        state, logs = step(state, batch, None, key)
        out[name] = {k: float(v) for k, v in logs.items()}
    for k in out["host"]:
        np.testing.assert_allclose(
            out["device"][k], out["host"][k], rtol=1e-6, atol=1e-7,
            err_msg=f"{k} diverged between host and device normalize")
