"""MiT (Mix Vision Transformer, SegFormer encoder) — TPU-native flax/NHWC.

Re-implements the architecture of the reference backbone
(models/backbones/mix_transformer.py:79-568): 4-stage hierarchical ViT with
overlapping patch embeddings (7/4 then 3/2), spatial-reduction attention
(sr_ratios 8/4/2/1), Mix-FFN with a 3x3 depthwise conv, and stochastic depth.

Differences from the reference (deliberate, TPU-first):
* NHWC feature maps throughout; tokens are kept as (B, H, W, C) and only
  logically flattened — XLA fuses the reshapes away.
* Attention logits/softmax run in float32 regardless of the compute dtype
  (bf16-safe); matmuls use the MXU via preferred_element_type.
* Stochastic-depth schedule is computed with numpy (identical linspace rule,
  reference mix_transformer.py:361-363).

Param tree naming mirrors torch checkpoint keys for mechanical conversion:
``patch_embed{k}/proj``, ``block{k}_{i}/{norm1,attn,norm2,mlp}``,
``norm{k}``.
"""
from __future__ import annotations

from typing import Any, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from ..nn.layers import (DropPath, TorchLayerNorm, conv2d,
                         kaiming_normal_fanout, normal_init)
from ..ops.attention import sra_attention
from ..ops.dwconv import dwconv3x3_gelu

# reference init rules (mix_transformer.py:429-442): Linear ->
# trunc_normal(std=.02) (±2.0 absolute truncation == untruncated at this
# std) with zero bias; Conv2d -> N(0, sqrt(2/(k*k*out/groups)))
_LINEAR_INIT = normal_init(0.02)
_ZEROS = nn.initializers.zeros

ARCH_SETTINGS = {
    # embed_dims, num_heads, mlp_ratios, depths, sr_ratios
    "mit_b0": dict(embed_dims=[32, 64, 160, 256], num_heads=[1, 2, 5, 8],
                   mlp_ratios=[4, 4, 4, 4], depths=[2, 2, 2, 2],
                   sr_ratios=[8, 4, 2, 1]),
    "mit_b1": dict(embed_dims=[64, 128, 320, 512], num_heads=[1, 2, 5, 8],
                   mlp_ratios=[4, 4, 4, 4], depths=[2, 2, 2, 2],
                   sr_ratios=[8, 4, 2, 1]),
    "mit_b2": dict(embed_dims=[64, 128, 320, 512], num_heads=[1, 2, 5, 8],
                   mlp_ratios=[4, 4, 4, 4], depths=[3, 4, 6, 3],
                   sr_ratios=[8, 4, 2, 1]),
    "mit_b3": dict(embed_dims=[64, 128, 320, 512], num_heads=[1, 2, 5, 8],
                   mlp_ratios=[4, 4, 4, 4], depths=[3, 4, 18, 3],
                   sr_ratios=[8, 4, 2, 1]),
    "mit_b4": dict(embed_dims=[64, 128, 320, 512], num_heads=[1, 2, 5, 8],
                   mlp_ratios=[4, 4, 4, 4], depths=[3, 8, 27, 3],
                   sr_ratios=[8, 4, 2, 1]),
    "mit_b5": dict(embed_dims=[64, 128, 320, 512], num_heads=[1, 2, 5, 8],
                   mlp_ratios=[4, 4, 4, 4], depths=[3, 6, 40, 3],
                   sr_ratios=[8, 4, 2, 1]),
}


class SRAttention(nn.Module):
    """Spatial-reduction attention (reference mix_transformer.py:106-164).

    Operates on NHWC maps.  KV tokens are spatially reduced by a strided conv
    of kernel=stride=sr_ratio followed by LayerNorm (eps 1e-5) when
    sr_ratio > 1.
    """
    dim: int
    num_heads: int
    sr_ratio: int = 1
    qkv_bias: bool = True
    qk_scale: Optional[float] = None

    @nn.compact
    def __call__(self, x: jax.Array, deterministic: bool = True) -> jax.Array:
        B, H, W, C = x.shape
        nh = self.num_heads
        hd = C // nh
        scale = self.qk_scale or hd ** -0.5

        q = nn.Dense(C, use_bias=self.qkv_bias, param_dtype=jnp.float32,
                     kernel_init=_LINEAR_INIT, bias_init=_ZEROS,
                     name="q")(x)
        q = q.reshape(B, H * W, nh, hd)

        if self.sr_ratio > 1:
            kv_in = conv2d(C, kernel_size=self.sr_ratio,
                           stride=self.sr_ratio, padding=0,
                           kernel_init=kaiming_normal_fanout(),
                           bias_init=_ZEROS, name="sr")(x)
            kv_in = TorchLayerNorm(epsilon=1e-5, name="norm")(kv_in)
            kv_in = kv_in.reshape(B, -1, C)
        else:
            kv_in = x.reshape(B, H * W, C)
        kv = nn.Dense(2 * C, use_bias=self.qkv_bias,
                      param_dtype=jnp.float32,
                      kernel_init=_LINEAR_INIT, bias_init=_ZEROS,
                      name="kv")(kv_in)
        kv = kv.reshape(B, -1, 2, nh, hd)
        k = kv[:, :, 0]
        v = kv[:, :, 1]

        # fused flash-style kernel on TPU (fp32 logits/softmax in VMEM),
        # einsum fallback elsewhere — numerics identical
        out = sra_attention(q, k, v, scale)
        out = out.reshape(B, H, W, C)
        out = nn.Dense(C, param_dtype=jnp.float32,
                       kernel_init=_LINEAR_INIT, bias_init=_ZEROS,
                       name="proj")(out)
        return out


class DWConvGELU(nn.Module):
    """Fused depthwise 3x3 conv + bias + exact GELU (ops/dwconv.py: Pallas
    kernel on TPU, XLA shift-and-add elsewhere).  Param tree ('kernel',
    'bias', HWIO depthwise layout) matches the plain conv2d it replaces, so
    converted torch checkpoints load unchanged."""
    dim: int

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        kernel = self.param("kernel", kaiming_normal_fanout(self.dim),
                            (3, 3, 1, self.dim), jnp.float32)
        bias = self.param("bias", _ZEROS, (self.dim,), jnp.float32)
        from flax.linen.dtypes import promote_dtype
        x, kernel, bias = promote_dtype(x, kernel, bias, dtype=None)
        return dwconv3x3_gelu(x, kernel, bias, train=train)


class MixFFN(nn.Module):
    """Mix-FFN: fc1 -> 3x3 depthwise conv -> GELU -> fc2
    (reference mix_transformer.py:79-103,556-568)."""
    hidden_dim: int
    out_dim: int

    @nn.compact
    def __call__(self, x: jax.Array, deterministic: bool = True) -> jax.Array:
        # fc1/fc2 as 1x1 convs keeps the whole FFN in conv layout (fewer
        # relayout copies between token-view Dense and the depthwise conv)
        # fc1/fc2 are nn.Linear in the reference -> trunc_normal(.02);
        # dwconv is Conv2d -> kaiming fan_out divided by groups
        h = conv2d(self.hidden_dim, kernel_size=1, padding=0,
                   kernel_init=_LINEAR_INIT, bias_init=_ZEROS,
                   name="fc1")(x)
        # deterministic=False marks the differentiated train path, which
        # uses the shift dwconv formulation (ops/dwconv.py measured split)
        h = DWConvGELU(self.hidden_dim, name="dwconv")(
            h, train=not deterministic)
        return conv2d(self.out_dim, kernel_size=1, padding=0,
                      kernel_init=_LINEAR_INIT, bias_init=_ZEROS,
                      name="fc2")(h)


class Block(nn.Module):
    dim: int
    num_heads: int
    mlp_ratio: float = 4.0
    sr_ratio: int = 1
    drop_path: float = 0.0
    qkv_bias: bool = True
    qk_scale: Optional[float] = None

    @nn.compact
    def __call__(self, x: jax.Array, deterministic: bool = True) -> jax.Array:
        h = TorchLayerNorm(epsilon=1e-6, name="norm1")(x)
        h = SRAttention(self.dim, self.num_heads, self.sr_ratio,
                        self.qkv_bias, self.qk_scale, name="attn")(
                            h, deterministic=deterministic)
        x = x + DropPath(self.drop_path, name="drop_path1")(
            h, deterministic=deterministic)
        h = TorchLayerNorm(epsilon=1e-6, name="norm2")(x)
        h = MixFFN(int(self.dim * self.mlp_ratio), self.dim, name="mlp")(
            h, deterministic=deterministic)
        x = x + DropPath(self.drop_path, name="drop_path2")(
            h, deterministic=deterministic)
        return x


class OverlapPatchEmbed(nn.Module):
    """Strided overlapping conv patch embedding + LN (eps 1e-5)
    (reference mix_transformer.py:210-242)."""
    patch_size: int
    stride: int
    embed_dim: int

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        x = conv2d(self.embed_dim, kernel_size=self.patch_size,
                   stride=self.stride, padding=self.patch_size // 2,
                   kernel_init=kaiming_normal_fanout(), bias_init=_ZEROS,
                   name="proj")(x)
        x = TorchLayerNorm(epsilon=1e-5, name="norm")(x)
        return x


class MixVisionTransformer(nn.Module):
    """4-stage MiT backbone; returns a list of 4 NHWC feature maps at
    1/4, 1/8, 1/16, 1/32 resolution.

    ``remat=True`` rematerializes each transformer block on the backward
    pass (jax.checkpoint) — the TPU analog of the reference's activation
    checkpointing option (models/modules.py:118,139-142), trading FLOPs for
    HBM at large crop sizes.  ``remat_policy='dots'`` keeps every matmul
    OUTPUT resident (jax.checkpoint_policies.dots_with_no_batch_dims
    _saveable) and recomputes only the elementwise tail (LN/GELU/softmax/
    bias) in the backward — less recompute on the MXU for a modest HBM
    increase over full-block remat; measured A/B lives in
    tools/bench_core_parts.py --remat-policy.
    """
    model_type: str = "mit_b5"
    drop_path_rate: float = 0.1
    qk_scale: Optional[float] = None
    in_chans: int = 3
    remat: bool = False
    remat_policy: Optional[str] = None

    @nn.compact
    def __call__(self, x: jax.Array,
                 deterministic: bool = True,
                 train: bool = False) -> List[jax.Array]:
        # `train` is accepted for backbone-interface uniformity (ResNet's BN
        # needs it; MiT has no BN — dropout/droppath follow `deterministic`)
        del train
        cfg = ARCH_SETTINGS[self.model_type]
        depths = cfg["depths"]
        dpr = np.linspace(0, self.drop_path_rate, sum(depths)).tolist()
        patch_cfg = [(7, 4), (3, 2), (3, 2), (3, 2)]
        if self.remat:
            policy = None
            if self.remat_policy == "dots":
                policy = jax.checkpoint_policies.\
                    dots_with_no_batch_dims_saveable
            elif self.remat_policy is not None:
                raise ValueError(
                    f"unknown remat_policy {self.remat_policy!r}")
            block_cls = nn.remat(Block, static_argnums=(2,), policy=policy)
        else:
            block_cls = Block
        outs = []
        cur = 0
        for s in range(4):
            x = OverlapPatchEmbed(patch_cfg[s][0], patch_cfg[s][1],
                                  cfg["embed_dims"][s],
                                  name=f"patch_embed{s + 1}")(x)
            for i in range(depths[s]):
                x = block_cls(dim=cfg["embed_dims"][s],
                              num_heads=cfg["num_heads"][s],
                              mlp_ratio=cfg["mlp_ratios"][s],
                              sr_ratio=cfg["sr_ratios"][s],
                              drop_path=dpr[cur + i],
                              qk_scale=self.qk_scale,
                              name=f"block{s + 1}_{i}")(
                                  x, deterministic)
            x = TorchLayerNorm(epsilon=1e-6, name=f"norm{s + 1}")(x)
            outs.append(x)
            cur += depths[s]
        return outs

    @property
    def embed_dims(self) -> List[int]:
        return ARCH_SETTINGS[self.model_type]["embed_dims"]
