"""Remat variants must be numerically inert.

jax.checkpoint (whole-block) and the finer 'dots' policy
(save matmul outputs, recompute the elementwise tail) change WHEN
activations are computed, never WHAT — value and grads must match the
no-remat program to fp32 reduction-reassociation noise (XLA fuses the
recompute differently, so the last-bit sums differ at ~1e-13).
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from refign_tpu.models.mix_transformer import MixVisionTransformer


@pytest.mark.parametrize("remat_kw", [
    dict(remat=True),
    dict(remat=True, remat_policy="dots"),
])
def test_remat_value_and_grad_identical(remat_kw):
    key = jax.random.PRNGKey(0)
    x = jnp.asarray(np.random.RandomState(0).randn(1, 64, 64, 3),
                    jnp.float32)
    base = MixVisionTransformer(model_type="mit_b0", drop_path_rate=0.0)
    variables = base.init(key, x)

    def make_loss(model):
        def loss_fn(params, x):
            outs = model.apply({"params": params}, x)
            return sum(jnp.sum(jnp.square(o.astype(jnp.float32)))
                       for o in outs)
        return jax.jit(jax.value_and_grad(loss_fn))

    l0, g0 = make_loss(base)(variables["params"], x)
    model_r = MixVisionTransformer(model_type="mit_b0", drop_path_rate=0.0,
                                   **remat_kw)
    l1, g1 = make_loss(model_r)(variables["params"], x)
    np.testing.assert_allclose(np.asarray(l1), np.asarray(l0), rtol=1e-6)
    for p0, p1 in zip(jax.tree_util.tree_leaves(g0),
                      jax.tree_util.tree_leaves(g1)):
        a0, a1 = np.asarray(p0), np.asarray(p1)
        scale = max(float(np.max(np.abs(a0))), 1e-12)
        np.testing.assert_allclose(a1, a0, rtol=1e-5, atol=1e-6 * scale)


def test_remat_policy_unknown_rejected():
    x = np.zeros((1, 64, 64, 3), np.float32)
    model = MixVisionTransformer(model_type="mit_b0", remat=True,
                                 remat_policy="nope")
    with pytest.raises(ValueError, match="remat_policy"):
        model.init(jax.random.PRNGKey(0), x)
