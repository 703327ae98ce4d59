"""Data-parallel consistency on the 8-device virtual CPU mesh
(SURVEY.md §4 item 4): the same global batch gives identical results
sharded vs single-device — this replaces the reference's untested DDP path."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from refign_tpu.metrics import iou_init, iou_update
from refign_tpu.parallel.mesh import make_mesh, replicate, shard_batch


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
