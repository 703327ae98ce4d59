"""Fused Pallas SRA attention vs the einsum reference path."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from refign_tpu.ops.attention import (fused_small_kv_attention,
                                      sra_attention)


@pytest.mark.parametrize("N,M,D,H", [(300, 17, 64, 1), (1024, 289, 64, 2)])
def test_pallas_attention_matches_einsum(N, M, D, H):
    rng = np.random.RandomState(0)
    B = 2
    q = rng.randn(B, N, H, D).astype(np.float32)
    k = rng.randn(B, M, H, D).astype(np.float32)
    v = rng.randn(B, M, H, D).astype(np.float32)
    scale = D ** -0.5
    want = np.asarray(sra_attention(jnp.asarray(q), jnp.asarray(k),
                                    jnp.asarray(v), scale,
                                    use_pallas=False))
    # interpret-mode pallas on CPU
    qf = (jnp.asarray(q) * scale).transpose(0, 2, 1, 3).reshape(B * H, N, D)
    kf = jnp.asarray(k).transpose(0, 2, 1, 3).reshape(B * H, M, D)
    vf = jnp.asarray(v).transpose(0, 2, 1, 3).reshape(B * H, M, D)
    got = fused_small_kv_attention(qf, kf, vf, interpret=True)
    got = np.asarray(got.reshape(B, H, N, D).transpose(0, 2, 1, 3))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_pallas_attention_bf16():
    rng = np.random.RandomState(1)
    B, N, M, D = 1, 140, 49, 64
    q = jnp.asarray(rng.randn(B, N, D), jnp.bfloat16)
    k = jnp.asarray(rng.randn(B, M, D), jnp.bfloat16)
    v = jnp.asarray(rng.randn(B, M, D), jnp.bfloat16)
    got = fused_small_kv_attention(q, k, v, interpret=True)
    logits = jnp.einsum("bnd,bmd->bnm", q, k,
                        preferred_element_type=jnp.float32)
    want = jnp.einsum("bnm,bmd->bnd",
                      jax.nn.softmax(logits, -1).astype(jnp.bfloat16), v)
    np.testing.assert_allclose(np.asarray(got, np.float32),
                               np.asarray(want, np.float32),
                               rtol=2e-2, atol=2e-2)


def test_bf16_einsum_path_close_to_fp32():
    """The bf16-logit softmax path tracks the fp32 path within bf16
    tolerance (it replaces the reference's fp16-AMP attention)."""
    rng = np.random.RandomState(2)
    B, N, M, H, D = 2, 200, 49, 2, 64
    q = rng.randn(B, N, H, D).astype(np.float32)
    k = rng.randn(B, M, H, D).astype(np.float32)
    v = rng.randn(B, M, H, D).astype(np.float32)
    scale = D ** -0.5
    want = np.asarray(sra_attention(jnp.asarray(q), jnp.asarray(k),
                                    jnp.asarray(v), scale,
                                    use_pallas=False))
    got = np.asarray(sra_attention(
        jnp.asarray(q, jnp.bfloat16), jnp.asarray(k, jnp.bfloat16),
        jnp.asarray(v, jnp.bfloat16), scale,
        use_pallas=False).astype(jnp.float32))
    assert np.abs(got - want).max() < 0.1
    # probabilistically: mean abs deviation small
    assert np.abs(got - want).mean() < 0.01


def test_fused_path_and_vjp_match_fp32_einsum():
    """The production fused path (sra_attention use_pallas=True, interpret
    on CPU) and its custom VJP match the fp32 einsum formulation."""
    from refign_tpu.ops.attention import _attn_einsum_fp32

    rng = np.random.RandomState(3)
    B, N, M, H, D = 2, 300, 289, 2, 64
    q = jnp.asarray(rng.randn(B, N, H, D).astype(np.float32))
    k = jnp.asarray(rng.randn(B, M, H, D).astype(np.float32))
    v = jnp.asarray(rng.randn(B, M, H, D).astype(np.float32))
    scale = D ** -0.5

    got = sra_attention(q, k, v, scale, use_pallas=True, interpret=True)
    want = _attn_einsum_fp32(q, k, v, scale)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)

    def loss_fused(q, k, v):
        return jnp.sum(jnp.sin(sra_attention(q, k, v, scale,
                                             use_pallas=True,
                                             interpret=True)))

    def loss_ref(q, k, v):
        return jnp.sum(jnp.sin(_attn_einsum_fp32(q, k, v, scale)))

    g1 = jax.grad(loss_fused, argnums=(0, 1, 2))(q, k, v)
    g2 = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for a, e in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(e),
                                   rtol=1e-4, atol=1e-4)


def test_fused_path_large_kv_falls_back():
    """M beyond the VMEM guard silently takes the einsum path."""
    from refign_tpu.ops import attention as att

    rng = np.random.RandomState(4)
    B, N, M, H, D = 1, 64, att._MAX_KV + 8, 1, 32
    q = jnp.asarray(rng.randn(B, N, H, D).astype(np.float32))
    k = jnp.asarray(rng.randn(B, M, H, D).astype(np.float32))
    v = jnp.asarray(rng.randn(B, M, H, D).astype(np.float32))
    out = sra_attention(q, k, v, 0.1, use_pallas=True)  # would crash if
    assert out.shape == (B, N, H, D)                    # kernel were used


def test_static_shift_matches_max_subtraction():
    """r3 bf16 path (static-shift softmax + padded-bytes layout choice)
    vs the r2 max-subtracted (N, M) formulation — mathematically identical
    (softmax shift invariance), so they agree to bf16 rounding, in both
    layout branches and with large-magnitude logits."""
    from refign_tpu.ops.attention import (_attn_einsum_bf16,
                                          _attn_einsum_bf16_max)

    rng = np.random.RandomState(5)
    scale = 64 ** -0.5
    # (N<M-ish -> MN layout) and (N>>M -> NM layout); logit scale x5 to
    # push |logits| toward the LN-bounded extreme.
    for (N, M, H, mag) in [(300, 289, 2, 1.0), (2000, 49, 1, 1.0),
                           (300, 289, 1, 5.0)]:
        q = jnp.asarray(rng.randn(2, N, H, 64) * mag, jnp.bfloat16)
        k = jnp.asarray(rng.randn(2, M, H, 64) * mag, jnp.bfloat16)
        v = jnp.asarray(rng.randn(2, M, H, 64), jnp.bfloat16)
        a = np.asarray(_attn_einsum_bf16(q, k, v, scale), np.float32)
        b = np.asarray(_attn_einsum_bf16_max(q, k, v, scale), np.float32)
        np.testing.assert_allclose(a, b, rtol=3e-2, atol=3e-2)
