"""Fused depthwise-3x3+bias+GELU op (refign_tpu/ops/dwconv.py).

Pins: (a) the XLA shift-and-add path against the grouped-conv reference
formulation, (b) the Pallas kernel (interpret mode on CPU) against the XLA
path, (c) the custom VJP against autodiff of the reference formulation,
(d) the MixFFN module wiring (param tree unchanged, output unchanged).
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from refign_tpu.ops.dwconv import dwconv3x3_gelu


def _ref(x, w, b):
    y = jax.lax.conv_general_dilated(
        x, w, (1, 1), ((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=x.shape[-1])
    return jax.nn.gelu(y + b, approximate=False)


def _rand(shape, key, dtype=jnp.float32):
    return jnp.asarray(jax.random.normal(key, shape), dtype)


@pytest.mark.parametrize("C", [8, 128, 256])
def test_xla_path_matches_grouped_conv(C):
    k = jax.random.PRNGKey(0)
    x = _rand((2, 9, 11, C), k)
    w = _rand((3, 3, 1, C), jax.random.fold_in(k, 1)) * 0.2
    b = _rand((C,), jax.random.fold_in(k, 2)) * 0.1
    got = dwconv3x3_gelu(x, w, b, use_pallas=False)
    want = _ref(x, w, b)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("C", [128, 256])
def test_pallas_interpret_matches_xla(C):
    k = jax.random.PRNGKey(1)
    x = _rand((2, 6, 7, C), k)
    w = _rand((3, 3, 1, C), jax.random.fold_in(k, 1)) * 0.2
    b = _rand((C,), jax.random.fold_in(k, 2)) * 0.1
    got = dwconv3x3_gelu(x, w, b, use_pallas=True, interpret=True)
    want = dwconv3x3_gelu(x, w, b, use_pallas=False)
    # the kernel's A&S-polynomial erf differs from jax erf by <=1.5e-7
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-4, atol=1e-5)


def test_vmem_fallback_large_spatial():
    # spatial block over the VMEM budget must silently take the XLA path
    C = 128
    k = jax.random.PRNGKey(2)
    x = _rand((1, 140, 140, C), k)
    w = _rand((3, 3, 1, C), jax.random.fold_in(k, 1)) * 0.2
    b = _rand((C,), jax.random.fold_in(k, 2)) * 0.1
    got = dwconv3x3_gelu(x, w, b, use_pallas=True, interpret=True)
    want = _ref(x, w, b)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-4, atol=1e-5)


def test_custom_vjp_matches_autodiff():
    C = 128
    k = jax.random.PRNGKey(3)
    x = _rand((2, 5, 5, C), k)
    w = _rand((3, 3, 1, C), jax.random.fold_in(k, 1)) * 0.2
    b = _rand((C,), jax.random.fold_in(k, 2)) * 0.1

    def loss_fused(x, w, b):
        return jnp.sum(jnp.sin(dwconv3x3_gelu(x, w, b, use_pallas=False)))

    def loss_ref(x, w, b):
        return jnp.sum(jnp.sin(_ref(x, w, b)))

    g1 = jax.grad(loss_fused, argnums=(0, 1, 2))(x, w, b)
    g2 = jax.grad(loss_ref, argnums=(0, 1, 2))(x, w, b)
    for a, e in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(e),
                                   rtol=1e-4, atol=1e-5)


def test_mixffn_wiring_param_tree_and_output():
    from refign_tpu.models.mix_transformer import MixFFN
    m = MixFFN(hidden_dim=128, out_dim=32)
    x = _rand((1, 8, 8, 32), jax.random.PRNGKey(4))
    variables = m.init(jax.random.PRNGKey(5), x)
    p = variables["params"]
    assert set(p.keys()) == {"fc1", "dwconv", "fc2"}
    assert p["dwconv"]["kernel"].shape == (3, 3, 1, 128)
    assert p["dwconv"]["bias"].shape == (128,)
    y = m.apply(variables, x)
    # reference formulation with the same params
    h = jax.lax.conv_general_dilated(
        x, p["fc1"]["kernel"], (1, 1), ((0, 0), (0, 0)),
        dimension_numbers=("NHWC", "HWIO", "NHWC")) + p["fc1"]["bias"]
    h = _ref(h, p["dwconv"]["kernel"], p["dwconv"]["bias"])
    want = jax.lax.conv_general_dilated(
        h, p["fc2"]["kernel"], (1, 1), ((0, 0), (0, 0)),
        dimension_numbers=("NHWC", "HWIO", "NHWC")) + p["fc2"]["bias"]
    np.testing.assert_allclose(np.asarray(y), np.asarray(want),
                               rtol=1e-5, atol=1e-5)


def test_bf16_gelu_tanh_within_bf16_resolution():
    """The bf16 path's tanh-GELU stays within ~1 bf16 ulp of the exact-erf
    GELU everywhere (the fp32 path keeps exact erf — golden parity)."""
    from refign_tpu.nn.layers import gelu
    x32 = jnp.linspace(-6.0, 6.0, 4097, dtype=jnp.float32)
    xb = x32.astype(jnp.bfloat16)
    # exact erf GELU of the *rounded* input — isolates the tanh-vs-erf
    # error from the input quantization
    exact = np.asarray(jax.nn.gelu(xb.astype(jnp.float32),
                                   approximate=False))
    approx = np.asarray(gelu(xb).astype(jnp.float32))
    tol = np.maximum(np.abs(exact) * 0.008, 0.004)
    assert (np.abs(approx - exact) <= tol).all()
    # fp32 input must still use the exact erf
    got32 = np.asarray(gelu(x32))
    want32 = np.asarray(jax.nn.gelu(x32, approximate=False))
    np.testing.assert_allclose(got32, want32, rtol=0, atol=1e-7)


def test_bf16_layernorm_tracks_fp32():
    """The bf16 LN formulation (fp32 stats, folded bf16 affine) stays
    within ~2 bf16 ulps of the fp32 normalize-then-affine output."""
    from refign_tpu.nn.layers import TorchLayerNorm
    rng = np.random.RandomState(7)
    x = (rng.randn(4, 33, 129) * 2 + 1.5).astype(np.float32)
    ln = TorchLayerNorm(epsilon=1e-6)
    v = ln.init(jax.random.PRNGKey(0), jnp.asarray(x))
    # non-trivial affine
    v = {"params": {"scale": jnp.asarray(rng.rand(129), jnp.float32) + 0.5,
                    "bias": jnp.asarray(rng.randn(129), jnp.float32)}}
    xb = jnp.asarray(x, jnp.bfloat16)
    # fp32 LN of the *rounded* input — isolates the formulation error from
    # the input quantization
    want = np.asarray(ln.apply(v, xb.astype(jnp.float32)))
    got = np.asarray(ln.apply(v, xb).astype(jnp.float32))
    # fp32 FMA + bf16 output rounding: within ~1 bf16 ulp of the exact
    # fp32 result plus a small absolute floor for near-zero outputs
    tol = np.maximum(np.abs(want) * 0.008, 0.004)
    assert (np.abs(got - want) <= tol).all()
