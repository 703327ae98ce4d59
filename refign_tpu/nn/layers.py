"""Core NN layers with PyTorch-matching numerics, flax.linen, NHWC.

These are the building blocks shared by every model in the framework
(reference models/modules.py:16-68,564-596).  Numerics notes:

* ``TorchBatchNorm`` reproduces torch.nn.BatchNorm2d exactly: biased variance
  for normalization, unbiased variance written into the running stats,
  ``running = (1-momentum)*running + momentum*batch`` with momentum=0.1.
  Cross-replica synchronization (the reference's ``sync_batchnorm: True``)
  is a ``lax.pmean`` over ``axis_name`` when inside pmap/shard_map.
* Convs are NHWC with HWIO kernels; symmetric integer padding matches torch.
* GELU is the exact (erf) variant — torch's default.
* ``DropPath`` implements per-sample stochastic depth with keep-prob
  rescaling (reference models/modules.py:564-596).
"""
from __future__ import annotations

import functools
import os
from typing import Any, Callable, Optional, Sequence, Tuple, Union

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

__all__ = [
    "TorchBatchNorm", "ConvBNReLU", "MLPEmbed", "DropPath", "gelu",
    "leaky_relu", "TorchLayerNorm", "Dropout2d", "conv2d",
    "torch_default_kernel_init", "torch_default_bias_init",
    "kaiming_normal_fanout", "normal_init",
]


# ---------------------------------------------------------------------------
# torch-matching weight initializers (VERDICT r1 item 7).  Relevant for
# from-scratch training parity (UAWarpC pretraining, reference
# README.md:285-307); irrelevant when loading converted checkpoints.
# ---------------------------------------------------------------------------

def torch_default_kernel_init(key, shape, dtype=jnp.float32):
    """torch Conv2d/Linear default: kaiming_uniform(a=sqrt(5)) ==
    U(±1/sqrt(fan_in)).  shape is HWIO (conv) or (in, out) (dense)."""
    fan_in = (shape[0] * shape[1] * shape[2] if len(shape) == 4
              else shape[0])
    bound = 1.0 / np.sqrt(fan_in)
    return jax.random.uniform(key, shape, dtype, -bound, bound)


def torch_default_bias_init(fan_in: int):
    """torch Conv2d/Linear default bias: U(±1/sqrt(fan_in))."""
    bound = 1.0 / np.sqrt(fan_in)

    def init(key, shape, dtype=jnp.float32):
        return jax.random.uniform(key, shape, dtype, -bound, bound)

    return init


def kaiming_normal_fanout(groups: int = 1):
    """kaiming_normal_(mode='fan_out', nonlinearity='relu'):
    N(0, sqrt(2/fan_out)) with fan_out = kh*kw*O (torch semantics; the MiT
    backbone additionally divides by groups for its depthwise conv,
    reference mix_transformer.py:438-441 — pass groups for that variant)."""

    def init(key, shape, dtype=jnp.float32):
        fan_out = (shape[0] * shape[1] * shape[3] // groups
                   if len(shape) == 4 else shape[1])
        std = np.sqrt(2.0 / fan_out)
        return std * jax.random.normal(key, shape, dtype)

    return init


def normal_init(std: float):
    """N(0, std) — mmseg classifier init (std 0.01) and the MiT
    trunc_normal(std=.02) (whose ±2.0 absolute truncation is ±100 sigma at
    std .02, i.e. effectively untruncated)."""

    def init(key, shape, dtype=jnp.float32):
        return std * jax.random.normal(key, shape, dtype)

    return init


def gelu(x: jax.Array) -> jax.Array:
    """GELU: exact erf in full precision, tanh approximation under bf16.

    XLA's erf lowering costs ~14% of the entire HRDA 1080p bench (ablation
    231 -> 198.5 ms/image, PARITY.md r2); the tanh approximation's max abs
    error (~3e-4) is below bf16 resolution (ulp 3.9e-3 at 1.0), so the
    bf16/AMP compute path uses it — the analog of the reference computing
    GELU in fp16 under autocast.  fp32 keeps the exact erf (torch default)
    for reference-golden parity.
    """
    if x.dtype == jnp.bfloat16:
        return jax.nn.gelu(x, approximate=True)
    return jax.nn.gelu(x, approximate=False)


def leaky_relu(x: jax.Array, negative_slope: float = 0.1) -> jax.Array:
    return jax.nn.leaky_relu(x, negative_slope=negative_slope)


class TorchLayerNorm(nn.Module):
    """LayerNorm over the last axis with torch-style eps placement.

    fp32 inputs use the exact fp32 normalize-then-affine (golden parity).
    bf16 inputs fold the whole transform into one fp32 FMA
    (``y = x*s' + t'`` with s' = rsqrt(var+eps)*scale, t' = bias - mean*s'
    — the algebraic reassociation of (x-m)*r*scale+bias): same math to
    within one fp32 rounding, but a single apply pass instead of
    subtract/normalize/affine (bench ablation: 198.5 -> 194.7 ms/image,
    PARITY.md r2).  The FMA runs fp32, NOT bf16 — a bf16 fold cancels
    catastrophically where |y| << |x*s'| (measured 18% relative error).
    """
    epsilon: float = 1e-5

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        dtype = x.dtype
        scale = self.param("scale", nn.initializers.ones, (x.shape[-1],),
                           jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (x.shape[-1],),
                          jnp.float32)
        if dtype == jnp.bfloat16:
            m = jnp.mean(x, axis=-1, keepdims=True, dtype=jnp.float32)
            m2 = jnp.mean(jax.lax.square(x.astype(jnp.float32)), axis=-1,
                          keepdims=True)
            # E[x^2]-E[x]^2 can go slightly negative in fp32 for rows with
            # large mean and tiny variance; clamp so rsqrt never sees <eps.
            r = jax.lax.rsqrt(
                jnp.maximum(m2 - jnp.square(m), 0.0) + self.epsilon)
            s = r * scale
            t = bias - m * r * scale
            return (x.astype(jnp.float32) * s + t).astype(dtype)
        x32 = x.astype(jnp.float32)
        mean = jnp.mean(x32, axis=-1, keepdims=True)
        var = jnp.mean(jnp.square(x32 - mean), axis=-1, keepdims=True)
        y = (x32 - mean) * jax.lax.rsqrt(var + self.epsilon)
        return (y * scale + bias).astype(dtype)


class TorchBatchNorm(nn.Module):
    """torch.nn.BatchNorm2d semantics on NHWC, with optional cross-device sync.

    When ``use_running_average`` is False the batch statistics are computed
    over (N, H, W); if ``axis_name`` is set they are additionally averaged
    across that mesh axis (SyncBN, reference configs `sync_batchnorm: True`).

    ``groups`` > 1 reproduces G SEQUENTIAL train-mode BN applications on a
    batch that stacks the G calls along axis 0 (batch order = call order):
    each group of N/G samples is normalized with its OWN batch statistics,
    and the running stats receive the G EMA updates in group order
    (``ra = (1-m)^G ra + m * sum_g (1-m)^(G-1-g) stats_g``) — exactly what
    G serial calls would leave behind.  This is what makes the folded
    3B-batched UAWarpC train step (alignment/trainer.py fold_passes) give
    the same math as the reference's three serial head passes.
    """
    momentum: float = 0.1
    epsilon: float = 1e-5
    use_scale_bias: bool = True
    axis_name: Optional[str] = None
    groups: int = 1
    # overridable for zero-init-residual (reference resnet.py:330-339)
    scale_init: Callable = nn.initializers.ones

    @nn.compact
    def __call__(self, x: jax.Array,
                 use_running_average: bool = True) -> jax.Array:
        C = x.shape[-1]
        dtype = x.dtype
        ra_mean = self.variable("batch_stats", "mean",
                                lambda: jnp.zeros((C,), jnp.float32))
        ra_var = self.variable("batch_stats", "var",
                               lambda: jnp.ones((C,), jnp.float32))
        x32 = x.astype(jnp.float32)
        G = self.groups
        if use_running_average:
            mean, var = ra_mean.value, ra_var.value
        elif G > 1:
            N = x.shape[0]
            assert N % G == 0, (N, G)
            xg = x32.reshape((G, N // G) + x.shape[1:])
            axes = tuple(range(1, xg.ndim - 1))
            mean_g = jnp.mean(xg, axis=axes)              # (G, C)
            mean_sq_g = jnp.mean(jnp.square(xg), axis=axes)
            if self.axis_name is not None:
                mean_g = jax.lax.pmean(mean_g, self.axis_name)
                mean_sq_g = jax.lax.pmean(mean_sq_g, self.axis_name)
            var_g = mean_sq_g - jnp.square(mean_g)
            n = x32.size // (C * G)
            if self.axis_name is not None:
                n = n * jax.lax.psum(1, self.axis_name)
            unbiased_g = var_g * (n / max(n - 1, 1))
            if not self.is_initializing():
                m = self.momentum
                ra_m, ra_v = ra_mean.value, ra_var.value
                for g in range(G):
                    ra_m = (1 - m) * ra_m + m * mean_g[g]
                    ra_v = (1 - m) * ra_v + m * unbiased_g[g]
                ra_mean.value = ra_m
                ra_var.value = ra_v
            bshape = (G,) + (1,) * (xg.ndim - 2) + (C,)
            if self.use_scale_bias:
                scale = self.param("scale", self.scale_init, (C,),
                                   jnp.float32)
                bias = self.param("bias", nn.initializers.zeros, (C,),
                                  jnp.float32)
            else:
                scale, bias = 1.0, 0.0
            if dtype == jnp.bfloat16:
                # FMA fold (see the ungrouped branch note): y = x*a + b
                a = (scale * jax.lax.rsqrt(var_g + self.epsilon)).reshape(
                    bshape)
                b = bias - mean_g.reshape(bshape) * a
                return (xg * a + b).reshape(x.shape).astype(dtype)
            mean = mean_g.reshape(bshape)
            var = var_g.reshape(bshape)
            y = ((xg - mean) * jax.lax.rsqrt(var + self.epsilon)
                 ).reshape(x.shape)
            if self.use_scale_bias:
                y = y * scale + bias
            return y.astype(dtype)
        else:
            reduce_axes = tuple(range(x.ndim - 1))
            mean = jnp.mean(x32, axis=reduce_axes)
            mean_sq = jnp.mean(jnp.square(x32), axis=reduce_axes)
            if self.axis_name is not None:
                mean = jax.lax.pmean(mean, self.axis_name)
                mean_sq = jax.lax.pmean(mean_sq, self.axis_name)
            var = mean_sq - jnp.square(mean)  # biased, used for normalization
            n = x32.size // C
            if self.axis_name is not None:
                n = n * jax.lax.psum(1, self.axis_name)
            unbiased = var * (n / max(n - 1, 1))
            if not self.is_initializing():
                m = self.momentum
                ra_mean.value = (1 - m) * ra_mean.value + m * mean
                ra_var.value = (1 - m) * ra_var.value + m * unbiased
        if self.use_scale_bias:
            scale = self.param("scale", self.scale_init, (C,),
                               jnp.float32)
            bias = self.param("bias", nn.initializers.zeros, (C,),
                              jnp.float32)
        else:
            scale, bias = 1.0, 0.0
        if dtype == jnp.bfloat16:
            # FMA fold for bf16 streams: y = x*a + b with
            # a = scale*rsqrt(var+eps), b = bias - mean*a — the same fp32
            # math reassociated (one fp32 rounding), but reverse-mode AD
            # through this form saves only per-channel vectors + the bf16
            # x (already live as the conv output) instead of a full fp32
            # x-hat per BN: the r5 profile showed those fp32 residual
            # tuples at ~42 ms of the 148 ms differentiated head pass
            # (artifacts/align_profile_passgrad_r05.txt, loop fusions).
            # fp32 inputs keep the exact sub-then-scale order (goldens).
            a = scale * jax.lax.rsqrt(var + self.epsilon)
            b = bias - mean * a
            return (x32 * a + b).astype(dtype)
        y = (x32 - mean) * jax.lax.rsqrt(var + self.epsilon)
        if self.use_scale_bias:
            y = y * scale + bias
        return y.astype(dtype)


def _pair(v):
    return (v, v) if isinstance(v, int) else tuple(v)


def _depthwise3x3_shift(x: jax.Array, kernel: jax.Array,
                        padding, dilation) -> jax.Array:
    """Pure-depthwise 3x3 stride-1 conv as 9 shifted multiply-adds.

    XLA's grouped-conv lowering is pathological on TPU for groups == C:
    tools/dwconv_train_lab.py (r5, stationary-input fix) measures its
    fwd+bwd at 14-32 ms per MiT stage shape where this formulation costs
    1.0-1.4 ms — and the UDA core profile shows the DAFormer head's
    separable-ASPP depthwise convs (3,3,1,1024 @ 128^2, T(2,128) degenerate
    tiling) as the core's single largest cost block
    (artifacts/uda_core_profile_512_r05.txt).  fp32 multiply-accumulate
    (matching XLA's conv accumulation for bf16 inputs); returns fp32 —
    the caller adds bias and casts.
    """
    (pt, pb), (pl_, pr) = padding
    dh, dw = dilation
    H, W = x.shape[1:3]
    Ho = H + pt + pb - 2 * dh
    Wo = W + pl_ + pr - 2 * dw
    # pad in the INPUT dtype and cast per tap: the pad buffer and the
    # backward cotangents then stay bf16 (an early version cast x to f32
    # before padding, which silently ran the whole chain — and its
    # reverse-mode buffers — in f32: measured 131.7 -> 172.4 ms core
    # regression + HBM OOM at the dilated ASPP taps)
    xp = jnp.pad(x, ((0, 0), (pt, pb), (pl_, pr), (0, 0)))
    w32 = kernel.astype(jnp.float32)[:, :, 0]   # (3, 3, C)
    acc = None
    for i in range(3):
        for j in range(3):
            xs = xp[:, i * dh:i * dh + Ho, j * dw:j * dw + Wo, :]
            t = xs.astype(jnp.float32) * w32[i, j]
            acc = t if acc is None else acc + t
    return acc


class TorchConv(nn.Module):
    """torch.nn.Conv2d equivalent: NHWC input, HWIO kernel, symmetric pad,
    and torch's *default initialization* (kaiming_uniform(a=sqrt(5)) kernel,
    U(±1/sqrt(fan_in)) bias) unless overridden.

    Param tree matches flax nn.Conv ('kernel'/'bias'), so converted torch
    checkpoints load unchanged.
    """
    features: int
    kernel_size: Tuple[int, int] = (3, 3)
    strides: Tuple[int, int] = (1, 1)
    padding: Tuple[Tuple[int, int], Tuple[int, int]] = ((0, 0), (0, 0))
    kernel_dilation: Tuple[int, int] = (1, 1)
    feature_group_count: int = 1
    use_bias: bool = True
    kernel_init: Optional[Callable] = None
    bias_init: Optional[Callable] = None

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        kh, kw = self.kernel_size
        in_per_group = x.shape[-1] // self.feature_group_count
        kshape = (kh, kw, in_per_group, self.features)
        kinit = self.kernel_init or torch_default_kernel_init
        kernel = self.param("kernel", kinit, kshape, jnp.float32)
        bias = None
        if self.use_bias:
            binit = self.bias_init or torch_default_bias_init(
                in_per_group * kh * kw)
            bias = self.param("bias", binit, (self.features,), jnp.float32)
        from flax.linen.dtypes import promote_dtype
        x, kernel, bias = promote_dtype(x, kernel, bias, dtype=None)
        if (self.feature_group_count > 1
                and self.feature_group_count == x.shape[-1]
                and self.features == x.shape[-1]
                and (kh, kw) == (3, 3) and self.strides == (1, 1)
                and os.environ.get("REFIGN_TPU_DW_SHIFT", "0") == "1"):
            # pure depthwise 3x3: shift-add formulation, OPT-IN A/B arm
            # (REFIGN_TPU_DW_SHIFT=1).  The isolated dwconv lab shows it
            # 10-20x faster than XLA's grouped conv fwd+bwd
            # (artifacts/dwconv_train_lab_r05.txt), but IN CONTEXT the
            # 512^2 UDA core measured SLOWER with it (all-shift 156.4 ms,
            # ASPP-conv+FFN-shift 171.2 vs all-conv 125.4 — XLA fuses the
            # grouped conv with its neighbors in the full graph;
            # artifacts/uda_core_dwshift_ab_r05.txt), so grouped conv
            # stays the default everywhere.
            y = _depthwise3x3_shift(x, kernel, self.padding,
                                    self.kernel_dilation)
            if bias is not None:
                y = y + bias.astype(jnp.float32)
            return y.astype(x.dtype)
        y = jax.lax.conv_general_dilated(
            x, kernel, window_strides=self.strides, padding=self.padding,
            rhs_dilation=self.kernel_dilation,
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            feature_group_count=self.feature_group_count)
        if bias is not None:
            y = y + bias
        return y


def conv2d(features: int,
           kernel_size: Union[int, Tuple[int, int]] = 3,
           stride: Union[int, Tuple[int, int]] = 1,
           padding: Union[int, Tuple[int, int]] = 0,
           dilation: Union[int, Tuple[int, int]] = 1,
           groups: int = 1,
           use_bias: bool = True,
           kernel_init: Optional[Callable] = None,
           bias_init: Optional[Callable] = None,
           name: Optional[str] = None) -> TorchConv:
    """torch.nn.Conv2d equivalent (see TorchConv)."""
    k = _pair(kernel_size)
    p = _pair(padding)
    return TorchConv(
        features=features,
        kernel_size=k,
        strides=_pair(stride),
        padding=((p[0], p[0]), (p[1], p[1])),
        kernel_dilation=_pair(dilation),
        feature_group_count=groups,
        use_bias=use_bias,
        kernel_init=kernel_init,
        bias_init=bias_init,
        name=name,
    )


class ConvBNReLU(nn.Module):
    """conv (+ BN) (+ activation), with depthwise-separable option.

    Mirrors reference models/modules.py:16-56: padding defaults to
    ``dilation*(kernel_size-1)//2``; bias='auto' means bias iff no norm.
    ``activation`` is a callable like :func:`leaky_relu` or jax.nn.relu.
    """
    out_channels: int
    kernel_size: int = 3
    stride: int = 1
    dilation: int = 1
    groups: int = 1
    padding: Optional[int] = None
    use_norm: bool = True
    activation: Optional[Callable] = jax.nn.relu
    bias: Union[str, bool] = "auto"
    depthwise_separable: bool = False
    bn_axis_name: Optional[str] = None
    bn_groups: int = 1
    kernel_init: Optional[Callable] = None
    bias_init: Optional[Callable] = None

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        padding = (self.dilation * (self.kernel_size - 1) // 2
                   if self.padding is None else self.padding)
        if self.depthwise_separable:
            assert self.kernel_size > 1 and self.groups == 1
            x = ConvBNReLU(
                out_channels=x.shape[-1], kernel_size=self.kernel_size,
                stride=self.stride, padding=padding, dilation=self.dilation,
                groups=x.shape[-1], use_norm=self.use_norm,
                activation=self.activation, bn_axis_name=self.bn_axis_name,
                bn_groups=self.bn_groups,
                kernel_init=self.kernel_init, bias_init=self.bias_init,
                name="depthwise_conv")(x, train=train)
            x = ConvBNReLU(
                out_channels=self.out_channels, kernel_size=1,
                use_norm=self.use_norm, activation=self.activation,
                bn_axis_name=self.bn_axis_name, bn_groups=self.bn_groups,
                kernel_init=self.kernel_init, bias_init=self.bias_init,
                name="pointwise_conv")(x, train=train)
            return x
        use_bias = (not self.use_norm) if self.bias == "auto" else bool(self.bias)
        x = conv2d(self.out_channels, self.kernel_size, self.stride,
                   padding, self.dilation, self.groups, use_bias,
                   kernel_init=self.kernel_init, bias_init=self.bias_init,
                   name="conv")(x)
        if self.use_norm:
            x = TorchBatchNorm(axis_name=self.bn_axis_name,
                               groups=self.bn_groups, name="bn")(
                x, use_running_average=not train)
        if self.activation is not None:
            x = self.activation(x)
        return x


class MLPEmbed(nn.Module):
    """Per-pixel linear embedding (reference models/modules.py:59-68).

    NHWC in, NHWC out (the reference flattens to tokens; spatially identical).
    """
    embed_dim: int

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        # torch nn.Linear default init (the reference head init loops do not
        # touch the MLP embeds)
        return nn.Dense(self.embed_dim, dtype=x.dtype,
                        param_dtype=jnp.float32,
                        kernel_init=torch_default_kernel_init,
                        bias_init=torch_default_bias_init(x.shape[-1]),
                        name="proj")(x)


class DropPath(nn.Module):
    """Per-sample stochastic depth (reference models/modules.py:564-596)."""
    drop_prob: float = 0.0

    @nn.compact
    def __call__(self, x: jax.Array, deterministic: bool = True) -> jax.Array:
        if self.drop_prob == 0.0 or deterministic:
            return x
        keep_prob = 1.0 - self.drop_prob
        rng = self.make_rng("droppath")
        shape = (x.shape[0],) + (1,) * (x.ndim - 1)
        keep = jax.random.bernoulli(rng, keep_prob, shape=shape)
        return x * keep.astype(x.dtype) / keep_prob


class Dropout2d(nn.Module):
    """Channel-wise dropout on NHWC (torch.nn.Dropout2d)."""
    rate: float = 0.1

    @nn.compact
    def __call__(self, x: jax.Array, deterministic: bool = True) -> jax.Array:
        if self.rate == 0.0 or deterministic:
            return x
        rng = self.make_rng("dropout")
        keep_prob = 1.0 - self.rate
        mask_shape = (x.shape[0], 1, 1, x.shape[-1])
        keep = jax.random.bernoulli(rng, keep_prob, shape=mask_shape)
        return x * keep.astype(x.dtype) / keep_prob
