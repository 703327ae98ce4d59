"""Native C++ correlation library vs the XLA op and vs autodiff grads."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from refign_tpu.native import correlation_backward, correlation_forward
from refign_tpu.ops.correlation import local_correlation


def test_native_forward_matches_xla():
    rng = np.random.RandomState(0)
    t = rng.randn(2, 10, 12, 16).astype(np.float32)
    s = rng.randn(2, 10, 12, 16).astype(np.float32)
    want = np.asarray(local_correlation(t, s, patch_size=5))
    got = correlation_forward(t, s, patch_size=5)
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_native_backward_matches_autodiff():
    rng = np.random.RandomState(1)
    t = rng.randn(1, 6, 7, 8).astype(np.float32)
    s = rng.randn(1, 6, 7, 8).astype(np.float32)
    g = rng.randn(1, 6, 7, 9).astype(np.float32)

    def f(t, s):
        return jnp.sum(local_correlation(t, s, patch_size=3) * g)

    gt_want, gs_want = jax.grad(f, argnums=(0, 1))(jnp.asarray(t),
                                                   jnp.asarray(s))
    gt, gs = correlation_backward(t, s, g, patch_size=3)
    np.testing.assert_allclose(gt, np.asarray(gt_want), rtol=1e-4,
                               atol=1e-5)
    np.testing.assert_allclose(gs, np.asarray(gs_want), rtol=1e-4,
                               atol=1e-5)
