"""Fused spatial-reduction attention — Pallas TPU kernel.

MiT's SRA attention (reference models/backbones/mix_transformer.py:137-164)
has a LARGE query count (up to ~32k tokens per crop) but a SMALL key/value
count (spatially reduced by sr_ratio 8/4/2/1 — always ~17^2=289 keys at the
production crop sizes).  The XLA path materializes the (N, M) attention
matrix in HBM several times (logits, exp, and the PV read); this kernel
tiles the query axis over the grid and keeps each (Tq, M) logits tile
VMEM-resident through qk^T -> softmax -> @v, so the attention matrix never
touches HBM — a flash-attention specialization for the tiny-KV regime (no
online softmax needed because all M keys fit at once).

Mosaic notes (axon v5e toolchain, re-verified round 2 with
tools/attn_kernel_lab.py): bf16 matmul operands are rejected ("Bad lhs
type") in every formulation tried; the SAME kernel with operands cast to
fp32 before the dot compiles, beats the einsum ~4x at SMALL N, but loses
~2x at all four MiT production shapes (fp32 MXU rate dominates there) —
so the einsum path is the default and this kernel ships behind
REFIGN_TPU_ATTN_PALLAS=1 for future toolchains.  Softmax/logits in the
kernel are full fp32.

Interface is channel-last: q (B, N, D), k/v (B, M, D) per head (callers
fold the head axis into B).  Backward runs through the numerically-matching
fp32 einsum formulation via custom_vjp (Pallas kernels have no autodiff).

A/B env switch: REFIGN_TPU_ATTN_PALLAS=0 forces the einsum path.
"""
from __future__ import annotations

import functools
import os
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

DEFAULT_Q_TILE = 512
# kv + logits tiles must fit VMEM; M beyond this falls back to einsum
_MAX_KV = 4096


def _make_kernel(m_real: int, m_pad: int):
    def kernel(q_ref, kt_ref, v_ref, o_ref):
        q = q_ref[0].astype(jnp.float32)          # (Tq, D), pre-scaled
        kt = kt_ref[0].astype(jnp.float32)        # (D, Mp)
        logits = jnp.dot(q, kt)
        if m_pad != m_real:
            col = jax.lax.broadcasted_iota(jnp.int32, logits.shape, 1)
            logits = jnp.where(col >= m_real, -jnp.inf, logits)
        probs = jax.nn.softmax(logits, axis=-1)
        o_ref[0] = jnp.dot(probs, v_ref[0].astype(jnp.float32)
                           ).astype(o_ref.dtype)

    return kernel


@functools.partial(jax.jit, static_argnames=("q_tile", "interpret"))
def fused_small_kv_attention(q: jax.Array, k: jax.Array, v: jax.Array,
                             q_tile: int = DEFAULT_Q_TILE,
                             interpret: bool = False) -> jax.Array:
    """softmax(q k^T) v with the attention matrix VMEM-resident.

    Args:
      q: (B, N, D) pre-scaled queries (multiply by scale before calling).
      k, v: (B, M, D).
    Returns (B, N, D) in q's dtype.
    """
    B, N, D = q.shape
    M = k.shape[1]
    q_tile = min(q_tile, -(-N // 128) * 128)
    n_pad = (-N) % q_tile
    if n_pad:
        q = jnp.pad(q, ((0, 0), (0, n_pad), (0, 0)))
    Np = q.shape[1]
    m_pad = (-M) % 8
    if m_pad:
        k = jnp.pad(k, ((0, 0), (0, m_pad), (0, 0)))
        v = jnp.pad(v, ((0, 0), (0, m_pad), (0, 0)))
    Mp = k.shape[1]
    kt = k.transpose(0, 2, 1)
    out = pl.pallas_call(
        _make_kernel(M, Mp),
        out_shape=jax.ShapeDtypeStruct((B, Np, D), q.dtype),
        grid=(B, Np // q_tile),
        in_specs=[
            pl.BlockSpec((1, q_tile, D), lambda b, t: (b, t, 0)),
            pl.BlockSpec((1, D, Mp), lambda b, t: (b, 0, 0)),
            pl.BlockSpec((1, Mp, D), lambda b, t: (b, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, q_tile, D), lambda b, t: (b, t, 0)),
        interpret=interpret,
    )(q, kt, v)
    return out[:, :N] if n_pad else out


def _attn_einsum_fp32(q, k, v, scale):
    """fp32-softmax einsum formulation — numerics of the fused kernel; also
    its backward (via jax.vjp) and the non-bf16 production path."""
    attn = jnp.einsum("bnhd,bmhd->bhnm", q, k,
                      preferred_element_type=jnp.float32) * scale
    attn = jax.nn.softmax(attn, axis=-1)
    out = jnp.einsum("bhnm,bmhd->bnhd", attn.astype(v.dtype), v,
                     preferred_element_type=jnp.float32)
    return out.astype(q.dtype)


def _attn_einsum_bf16_max(q, k, v, scale):
    """r2 bf16 path (max-subtracted softmax, (N, M) layout) — kept for A/B
    via REFIGN_TPU_ATTN_SHIFT=0.  Normalization is folded AFTER the PV
    matmul — (e@v)/d == (e/d)@v exactly (d is per-row, the contraction is
    over M) and skips one full read+write of the (N, M) matrix."""
    logits = jnp.einsum("bnhd,bmhd->bhnm", q, k) * jnp.asarray(
        scale, jnp.bfloat16)
    m = jnp.max(logits, axis=-1, keepdims=True)
    e = jnp.exp((logits - m).astype(jnp.float32)).astype(jnp.bfloat16)
    denom = jnp.sum(e.astype(jnp.float32), axis=-1, keepdims=True)
    out = jnp.einsum("bhnm,bmhd->bnhd", e, v,
                     preferred_element_type=jnp.float32)
    return (out / denom.transpose(0, 2, 1, 3)).astype(q.dtype)


# Static softmax shift (tools/attn_opt_lab.py, PARITY.md r3): softmax is
# shift-invariant, so replacing the per-row max with a STATIC constant is
# mathematically identical while the max REDUCTION PASS over the (N, M)
# logits matrix — a full extra HBM read of the largest tensor in the
# block — disappears.  The exponent is clamped to ±80 for hard safety:
# the upper clamp only engages for logits > C+80 = 100 (LN-bounded MiT
# logits stay < ~30), and entries at the lower clamp contribute < e^-50
# relative weight for any plausible row max, i.e. below bf16 resolution
# of the denominator.  Measured: -30% to -65% per block at the large-N
# stages (PARITY.md r3 lab table).
_SHIFT_C = 20.0


def _attn_einsum_bf16(q, k, v, scale):
    """bf16-logit einsum path (AMP-like; halves (N,M) HBM traffic vs fp32)
    with static-shift softmax and a layout choice that minimizes padded
    tile bytes: the logits matrix lives in whichever of (N, M) / (M, N)
    orientation wastes less on the 8-sublane x 128-lane tiling (M = 289
    pads 33% as lanes but 2% as sublanes at the MiT production shapes)."""
    if os.environ.get("REFIGN_TPU_ATTN_SHIFT", "1") in ("0", "false", "off"):
        return _attn_einsum_bf16_max(q, k, v, scale)
    N = q.shape[1]
    M = k.shape[1]
    scale_b = jnp.asarray(scale, jnp.bfloat16)

    def _pad_bytes(rows, cols):
        return (-(-rows // 8) * 8) * (-(-cols // 128) * 128)

    if _pad_bytes(M, N) < _pad_bytes(N, M):
        logits = jnp.einsum("bmhd,bnhd->bhmn", k, q) * scale_b    # (B,H,M,N)
        e = jnp.exp(jnp.clip(logits.astype(jnp.float32) - _SHIFT_C,
                             -80.0, 80.0)).astype(jnp.bfloat16)
        denom = jnp.sum(e.astype(jnp.float32), axis=2)            # (B,H,N)
        out = jnp.einsum("bhmn,bmhd->bnhd", e, v,
                         preferred_element_type=jnp.float32)
        return (out / denom.transpose(0, 2, 1)[..., None]).astype(q.dtype)
    logits = jnp.einsum("bnhd,bmhd->bhnm", q, k) * scale_b        # (B,H,N,M)
    e = jnp.exp(jnp.clip(logits.astype(jnp.float32) - _SHIFT_C,
                         -80.0, 80.0)).astype(jnp.bfloat16)
    denom = jnp.sum(e.astype(jnp.float32), axis=-1, keepdims=True)
    out = jnp.einsum("bhnm,bmhd->bnhd", e, v,
                     preferred_element_type=jnp.float32)
    return (out / denom.transpose(0, 2, 1, 3)).astype(q.dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def _attn_fused(q, k, v, scale, interpret=False):
    B, N, H, D = q.shape
    M = k.shape[1]
    qf = (q * scale).transpose(0, 2, 1, 3).reshape(B * H, N, D)
    kf = k.transpose(0, 2, 1, 3).reshape(B * H, M, D)
    vf = v.transpose(0, 2, 1, 3).reshape(B * H, M, D)
    out = fused_small_kv_attention(qf, kf, vf, interpret=interpret)
    return out.reshape(B, H, N, D).transpose(0, 2, 1, 3)


def _attn_fused_fwd(q, k, v, scale, interpret):
    return _attn_fused(q, k, v, scale, interpret), (q, k, v)


def _attn_fused_bwd(scale, interpret, res, g):
    q, k, v = res
    _, vjp = jax.vjp(lambda q, k, v: _attn_einsum_fp32(q, k, v, scale),
                     q, k, v)
    return vjp(g)


_attn_fused.defvjp(_attn_fused_fwd, _attn_fused_bwd)


def sra_attention(q: jax.Array, k: jax.Array, v: jax.Array, scale: float,
                  use_pallas: Optional[bool] = None,
                  interpret: bool = False) -> jax.Array:
    """Multi-head wrapper: q (B, N, H, D), k/v (B, M, H, D) -> (B, N, H, D).

    Chooses the fused Pallas kernel on TPU (when KV fits VMEM) and the
    einsum path elsewhere (or per ``use_pallas`` / REFIGN_TPU_ATTN_PALLAS).
    """
    M = k.shape[1]
    if use_pallas is None:
        # Default: einsum.  Honest per-shape timing on the axon v5e
        # (tools/attn_kernel_lab.py, PARITY.md r2): the einsum path beats
        # every Mosaic-compilable kernel variant ~2x at all four MiT
        # production shapes, because Mosaic rejects bf16 matmul operands
        # ("Bad lhs type") and the fp32-contraction workaround pays the
        # fp32 MXU rate.  Flip REFIGN_TPU_ATTN_PALLAS=1 to A/B the kernel
        # when the toolchain updates.
        env = os.environ.get("REFIGN_TPU_ATTN_PALLAS")
        use_pallas = (env is not None
                      and env not in ("0", "false", "off"))
    if use_pallas and M <= _MAX_KV:
        return _attn_fused(q, k, v, scale, interpret)
    if q.dtype == jnp.bfloat16:
        return _attn_einsum_bf16(q, k, v, scale)
    return _attn_einsum_fp32(q, k, v, scale)
