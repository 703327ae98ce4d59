"""Data-parallel consistency on the 8-device virtual CPU mesh
(SURVEY.md §4 item 4): the same global batch gives identical results
sharded vs single-device — this replaces the reference's untested DDP path."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from refign_tpu.metrics import iou_init, iou_update
from refign_tpu.parallel.mesh import (compute_mesh, make_mesh, replicate,
                                      shard_batch)


def test_virtual_mesh_has_8_devices():
    assert len(jax.devices()) == 8


def test_sharded_iou_update_matches_single_device():
    rng = np.random.RandomState(0)
    logits = rng.randn(8, 16, 16, 19).astype(np.float32)
    labels = rng.randint(0, 19, size=(8, 16, 16))
    labels[:, 0] = 255

    update = jax.jit(lambda cm, lg, y: iou_update(cm, lg, y))
    cm_single = update(iou_init(19), jnp.asarray(logits),
                       jnp.asarray(labels))

    mesh = make_mesh()
    sharded = shard_batch(mesh, {"logits": logits, "labels": labels})
    cm0 = replicate(mesh, iou_init(19))
    cm_sharded = update(cm0, sharded["logits"], sharded["labels"])
    np.testing.assert_array_equal(np.asarray(cm_single),
                                  np.asarray(cm_sharded))


def test_sharded_train_loss_matches_single_device():
    """Global-batch loss (and hence grads) must be identical whether the
    batch lives on 1 device or is split over 8 — BN batch statistics and
    loss means are global reductions under pjit."""
    from refign_tpu.models.heads.segformer import SegFormerHead
    from refign_tpu.models.mix_transformer import MixVisionTransformer
    from refign_tpu.models.segmentor import Segmentor
    from refign_tpu.uda.losses import pixel_weighted_cross_entropy

    seg = Segmentor(
        backbone=MixVisionTransformer(model_type="mit_b0",
                                      drop_path_rate=0.0),
        head=SegFormerHead(num_classes=19, channels=32))
    rng = np.random.RandomState(1)
    x = rng.randn(8, 32, 32, 3).astype(np.float32)
    y = rng.randint(0, 19, size=(8, 32, 32))
    variables = seg.init(jax.random.PRNGKey(0), x[:1],
                         method=Segmentor.logits_and_features)

    from refign_tpu.ops.resize import interpolate

    @jax.jit
    def loss_fn(variables, x, y):
        (logits, _), mut = seg.apply(
            variables, x, train=True, mutable=["batch_stats"],
            method=Segmentor.logits_and_features)
        logits = interpolate(logits, y.shape[1:3], mode="bilinear",
                             align_corners=False)
        return (pixel_weighted_cross_entropy(logits, y),
                mut["batch_stats"])

    loss1, stats1 = loss_fn(variables, jnp.asarray(x), jnp.asarray(y))

    mesh = make_mesh()
    vrep = replicate(mesh, variables)
    sb = shard_batch(mesh, {"x": x, "y": y})
    loss8, stats8 = loss_fn(vrep, sb["x"], sb["y"])

    np.testing.assert_allclose(float(loss1), float(loss8), rtol=1e-5)
    for a, b in zip(jax.tree_util.tree_leaves(stats1),
                    jax.tree_util.tree_leaves(stats8)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-5)


def test_sharded_hrda_eval_matches_single_device():
    """compute_mesh + shard_rows: the HRDA eval crop stack sharded over the
    mesh must produce the same logits as the single-device trace
    (VERDICT r1 item 6: sharded evaluation)."""
    from refign_tpu.models.heads.segformer import SegFormerHead
    from refign_tpu.models.mix_transformer import MixVisionTransformer
    from refign_tpu.models.segmentor import Segmentor

    seg = Segmentor(
        backbone=MixVisionTransformer(model_type="mit_b0",
                                      drop_path_rate=0.0),
        head=SegFormerHead(num_classes=19, channels=32),
        scale_attention=SegFormerHead(num_classes=19, channels=32))
    rng = np.random.RandomState(2)
    x = jnp.asarray(rng.randn(1, 64, 64, 3).astype(np.float32))
    variables = seg.init(jax.random.PRNGKey(0), x,
                         method=Segmentor.hrda_eval)

    def fwd(variables, x):
        return seg.apply(variables, x, method=Segmentor.hrda_eval)

    single = jax.jit(fwd)(variables, x)

    mesh = make_mesh()
    with compute_mesh(mesh):
        sharded = jax.jit(fwd)(replicate(mesh, variables), x)
    np.testing.assert_allclose(np.asarray(single), np.asarray(sharded),
                               rtol=1e-4, atol=1e-5)


def test_sharded_slide_eval_matches_single_device_536x960():
    """Sharded SLIDE evaluation at the scaled-bench geometry (536x960,
    outer crop 536^2 / stride 212, inner HRDA slide — the 30-crop pipeline
    of test_full_pipeline_golden): the crop stack spread over 8 devices
    must reproduce the single-device logits (VERDICT r2 item 6)."""
    from refign_tpu.models.heads.segformer import SegFormerHead
    from refign_tpu.models.mix_transformer import MixVisionTransformer
    from refign_tpu.models.segmentor import Segmentor, slide_inference
    from refign_tpu.ops.resize import interpolate

    seg = Segmentor(
        backbone=MixVisionTransformer(model_type="mit_b0",
                                      drop_path_rate=0.0),
        head=SegFormerHead(num_classes=19, channels=32),
        scale_attention=SegFormerHead(num_classes=19, channels=32))
    rng = np.random.RandomState(5)
    x = jnp.asarray(rng.randn(1, 536, 960, 3).astype(np.float32))
    variables = seg.init(jax.random.PRNGKey(0),
                         jnp.zeros((1, 64, 64, 3), jnp.float32),
                         method=Segmentor.hrda_eval)

    def forward(variables, img):
        def whole(crops):
            logits = seg.apply(variables, crops, method=Segmentor.hrda_eval)
            return interpolate(logits, crops.shape[1:3], mode="bilinear",
                               align_corners=False)
        return slide_inference(whole, img, (536, 536), (212, 212))

    single = jax.jit(forward)(variables, x)

    mesh = make_mesh()
    with compute_mesh(mesh):
        sharded = jax.jit(forward)(replicate(mesh, variables), x)
    np.testing.assert_allclose(np.asarray(single), np.asarray(sharded),
                               rtol=1e-4, atol=1e-5)


@pytest.mark.parametrize("dtype", ["bfloat16", "float32"])
def test_full_uda_train_step_sharded_equivalence(dtype):
    """The FULL Refign-HRDA train step (EMA, align+refine, DACS, fdist) on
    one device vs sharded over 8 devices: losses and updated params must
    match (VERDICT r1 item 5 — the CI guard for dryrun_multichip).

    The fp32 variant pins rtol 1e-5 on every loss (VERDICT r2 item 8):
    reduction-order regressions hide inside the bf16 variant's 2e-2."""
    from refign_tpu.models.heads.daformer import DAFormerHead
    from refign_tpu.models.heads.segformer import SegFormerHead
    from refign_tpu.models.heads.uawarpc import UAWarpCHead
    from refign_tpu.models.mix_transformer import MixVisionTransformer
    from refign_tpu.models.segmentor import Segmentor
    from refign_tpu.models.vgg import VGG
    from refign_tpu.train.optim import make_uda_optimizer
    from refign_tpu.uda.trainer import (UDAConfig, init_uda_state,
                                        make_uda_train_step)

    seg = Segmentor(
        backbone=MixVisionTransformer(model_type="mit_b0",
                                      drop_path_rate=0.0),
        head=DAFormerHead(num_classes=19, channels=32, embed_dims=32),
        scale_attention=SegFormerHead(num_classes=19, channels=32))
    align_backbone = VGG(model_type="vgg11", out_indices=(2, 3, 4))
    align_head = UAWarpCHead(in_index=(0, 1), estimate_uncertainty=True)

    key = jax.random.PRNGKey(0)
    B, H, W = 8, 64, 64
    rng = np.random.RandomState(3)
    batch = {
        "image_src": rng.randn(B, H, W, 3).astype(np.float32),
        "semantic_src": rng.randint(0, 19, size=(B, H, W)),
        "image_trg": rng.randn(B, H, W, 3).astype(np.float32),
        "image_ref": rng.randn(B, H, W, 3).astype(np.float32),
    }

    variables = seg.init(key, batch["image_src"],
                         jnp.zeros((2,), jnp.int32),
                         method=Segmentor.hrda_train)
    ab_vars = align_backbone.init(key, np.zeros((1, 256, 256, 3),
                                                np.float32))
    feats = align_backbone.apply(ab_vars,
                                 np.zeros((1, H, W, 3), np.float32),
                                 extract_only_indices=[-3, -2])
    feats256 = align_backbone.apply(
        ab_vars, np.zeros((1, 256, 256, 3), np.float32),
        extract_only_indices=[-2, -1])
    ah_vars = align_head.init(key, feats, feats, feats256, feats256, (H, W))
    align_params = {"backbone": ab_vars["params"],
                    "head": ah_vars["params"],
                    "head_stats": ah_vars["batch_stats"]}

    cfg = UDAConfig(use_hrda=True, use_refign=True, use_align=True,
                    adapt_to_ref=True, enable_fdist=True,
                    compute_dtype=dtype)
    tx, _ = make_uda_optimizer(variables["params"], 6e-4, 0.01, 40000)
    state0 = init_uda_state(variables["params"], variables["batch_stats"],
                            tx)
    step = make_uda_train_step(seg, align_backbone, align_head, tx, cfg)

    s1, logs1 = step(state0, jax.tree_util.tree_map(jnp.asarray, batch),
                     align_params, key)

    mesh = make_mesh()
    s8, logs8 = step(replicate(mesh, state0), shard_batch(mesh, batch),
                     replicate(mesh, align_params), key)

    fp32 = dtype == "float32"
    loss_rtol, loss_atol = (1e-5, 1e-7) if fp32 else (2e-2, 1e-3)
    par_rtol, par_atol = (1e-5, 1e-8) if fp32 else (1e-3, 2e-5)
    for k in logs1:
        np.testing.assert_allclose(float(logs1[k]), float(logs8[k]),
                                   rtol=loss_rtol, atol=loss_atol,
                                   err_msg=k)
    p1 = jax.tree_util.tree_leaves(s1.params)
    p8 = jax.tree_util.tree_leaves(s8.params)
    for a, b in zip(p1, p8):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=par_rtol, atol=par_atol)
    t1 = jax.tree_util.tree_leaves(s1.teacher_params)
    t8 = jax.tree_util.tree_leaves(s8.teacher_params)
    for a, b in zip(t1, t8):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=par_rtol, atol=par_atol)
