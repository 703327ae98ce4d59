"""Dense-matching building blocks for UAWarpC (NHWC, flax).

Re-implements the behavior of the reference modules
(models/modules.py:395-561): the residual-skip optical-flow decoder, the
dilated-conv refinement module, and the correlation-statistics uncertainty
module.  Activation is LeakyReLU(0.1); norm is BatchNorm (torch semantics).
"""
from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..nn.layers import ConvBNReLU, conv2d, leaky_relu


def max_pool_2x2(x: jax.Array) -> jax.Array:
    """torch.nn.MaxPool2d(2, 2) on NHWC."""
    return jax.lax.reduce_window(
        x, -jnp.inf, jax.lax.max, (1, 2, 2, 1), (1, 2, 2, 1), "VALID")


class OpticalFlowEstimator(nn.Module):
    """Residual-skip flow decoder (reference modules.py:395-443)."""
    out_channels: int = 2
    batch_norm: bool = True
    bn_axis_name: Optional[str] = None
    bn_groups: int = 1

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False):
        cbr = functools.partial(ConvBNReLU, use_norm=self.batch_norm,
                                activation=None,
                                bn_axis_name=self.bn_axis_name,
                                bn_groups=self.bn_groups)
        x0 = cbr(128, kernel_size=3, name="conv_0")(x, train=train)
        x0_relu = leaky_relu(x0)
        x1 = leaky_relu(
            cbr(128, kernel_size=3, name="conv_1")(x0_relu, train=train))
        x2 = cbr(96, kernel_size=3, name="conv_2")(x1, train=train)
        x2_skip = x2 + cbr(96, kernel_size=1, name="conv0_skip")(
            x0, train=train)
        x2_skip_relu = leaky_relu(x2_skip)
        x3 = leaky_relu(
            cbr(64, kernel_size=3, name="conv_3")(x2_skip_relu, train=train))
        x4 = cbr(32, kernel_size=3, name="conv_4")(x3, train=train)
        x4_skip = x4 + cbr(32, kernel_size=1, name="conv2_skip")(
            x2_skip, train=train)
        feat = leaky_relu(x4_skip)
        mapping = conv2d(self.out_channels, kernel_size=3, padding=1,
                         name="predict_mapping")(feat)
        return mapping, feat


class RefinementModule(nn.Module):
    """Dilated-conv residual flow refiner (reference modules.py:446-477):
    dilations 1,2,4,8,16,1 then 3x3 prediction."""
    out_channels: int = 2
    batch_norm: bool = True
    bn_axis_name: Optional[str] = None
    bn_groups: int = 1

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        cbr = functools.partial(ConvBNReLU, use_norm=self.batch_norm,
                                activation=leaky_relu,
                                bn_axis_name=self.bn_axis_name,
                                bn_groups=self.bn_groups)
        chans = [128, 128, 128, 96, 64, 32]
        dils = [1, 2, 4, 8, 16, 1]
        for i, (c, d) in enumerate(zip(chans, dils)):
            x = cbr(c, kernel_size=3, dilation=d, name=f"dc_convs_{i}")(
                x, train=train)
        return conv2d(self.out_channels, kernel_size=3, padding=1,
                      name="dc_convs_6")(x)


import numpy as np


def _toeplitz_expand(w: jax.Array, n_in: int, n_out: int) -> jax.Array:
    """Embed a length-k leading axis into a (n_out, n_in) Toeplitz band:
    ``T[o, i, ...] = w[i - o, ...]`` for ``0 <= i - o < k``, else 0.

    Built with pad + tile + reshape only — the classic convolution-matrix
    construction.  Row o of the reshape of the tiled period-(n_in+1)
    pattern starts at offset ``o*n_in mod (n_in+1) = -o``, i.e. each row
    shifts right by one; valid (no wraparound) whenever
    ``n_out <= n_in - k + 1``, which holds for a VALID conv."""
    k = w.shape[0]
    assert n_out <= n_in - k + 1, (n_out, n_in, k)
    pad = jnp.zeros((n_in + 1 - k,) + w.shape[1:], w.dtype)
    period = jnp.concatenate([w, pad])                     # (n_in+1, ...)
    tiled = jnp.tile(period, (n_out,) + (1,) * (w.ndim - 1))
    return tiled[:n_out * n_in].reshape((n_out, n_in) + w.shape[1:])


class _PatchConv(nn.Module):
    """3x3 VALID conv over B*H*W little (ih,iw,cin) patch images, computed
    as ONE structured matmul over the channel axis of the (B,H,W,ih*iw*cin)
    layout.  Identical math to the little-images conv, but the contraction
    runs on the MXU instead of a batch-32k C=1 conv that maps to ~1% of
    the TPU's lanes.

    The (ih*iw*cin, oh*ow*cout) matrix M — M[(y,x,ci),(oy,ox,co)] =
    K[y-oy, x-ox, ci, co] inside the band, 0 outside — is built from the
    (3,3,cin,cout) kernel by two nested Toeplitz expansions
    (pad/tile/reshape/transpose, see _toeplitz_expand).  The r4 version
    scattered the same values with ``M.at[idx].set`` — on TPU that lowers
    to a SERIAL per-element loop costing ~2.5 ms per 230k-entry build,
    rebuilt in every head pass and every remat recompute; the r5 profile
    (artifacts/align_profile_passgrad_r05.txt) showed those builds at
    ~33 ms of the 148 ms pass.  The Toeplitz build is exact-same-values
    and compiles to cheap loop fusions.

    Param names/shapes match conv2d ('kernel' HWIO, optional 'bias'), so
    torch checkpoints load unchanged."""
    ih: int
    iw: int
    cin: int
    cout: int
    use_bias: bool = False

    @nn.compact
    def __call__(self, x: jax.Array):
        from ..nn.layers import torch_default_kernel_init
        B, H, W, C = x.shape
        assert C == self.ih * self.iw * self.cin
        kernel = self.param("kernel", torch_default_kernel_init,
                            (3, 3, self.cin, self.cout), jnp.float32)
        ih, iw, cin, cout = self.ih, self.iw, self.cin, self.cout
        oh, ow = ih - 2, iw - 2
        # (oy, y, dx, ci, co): K[y-oy, dx, ci, co] banded over (oy, y)
        a = _toeplitz_expand(kernel, ih, oh)
        # (ox, x, ...) band on the dx axis: move dx in front first
        a = jnp.moveaxis(a, 2, 0)                  # (dx, oy, y, ci, co)
        b = _toeplitz_expand(a, iw, ow)            # (ox, x, oy, y, ci, co)
        M = jnp.transpose(b, (3, 1, 4, 2, 0, 5)).reshape(
            ih * iw * cin, oh * ow * cout)         # (y,x,ci),(oy,ox,co)
        y = jnp.einsum("bhwi,io->bhwo", x, M.astype(x.dtype),
                       preferred_element_type=jnp.float32).astype(x.dtype)
        if self.use_bias:
            from ..nn.layers import torch_default_bias_init
            bias = self.param("bias",
                              torch_default_bias_init(9 * self.cin),
                              (self.cout,), jnp.float32)
            y = y + jnp.tile(bias, oh * ow).astype(y.dtype)
        return y, (oh, ow)


class _PackedBN(nn.Module):
    """TorchBatchNorm semantics on the PACKED (B,H,W,P*C) patch layout
    (P patch positions, C channels, C fastest-varying).

    The obvious alternative — reshape to (B*H*W*P, 1, 1, C) and call
    TorchBatchNorm — materializes an fp32 copy whose (…,1,C=32) trailing
    dims the TPU (8,128) tiling pads 4x: at the MegaDepth stage geometry
    (520² b6, finest level) that single temp is 2.37 GB and the train step
    OOMs.  Here the per-channel affine is applied on the packed layout
    (trailing dim P*C ≈ multiple of 128, ~6% padding) in the input dtype;
    only the (C,)-sized statistics run in fp32.  Param/variable names and
    torch running-stat semantics (biased var for normalization, unbiased
    for the running update, momentum 0.1) match TorchBatchNorm exactly, so
    converted checkpoints load unchanged.
    """
    channels: int
    momentum: float = 0.1
    epsilon: float = 1e-5
    axis_name: Optional[str] = None
    # like TorchBatchNorm.groups: per-group batch stats over axis-0 groups
    # + sequential running-stat EMA in group order (fold_passes exactness)
    groups: int = 1

    @nn.compact
    def __call__(self, x: jax.Array, use_running_average: bool = True):
        C = self.channels
        P = x.shape[-1] // C
        assert x.shape[-1] == P * C
        G = self.groups
        ra_mean = self.variable("batch_stats", "mean",
                                lambda: jnp.zeros((C,), jnp.float32))
        ra_var = self.variable("batch_stats", "var",
                               lambda: jnp.ones((C,), jnp.float32))
        if use_running_average:
            mean, var = ra_mean.value, ra_var.value
        elif G > 1:
            N = x.shape[0]
            assert N % G == 0, (N, G)
            xr = x.reshape((G, N // G) + x.shape[1:-1] + (P, C)).astype(
                jnp.float32)
            axes = tuple(range(1, xr.ndim - 1))
            mean_g = jnp.mean(xr, axis=axes)            # (G, C)
            mean_sq_g = jnp.mean(jnp.square(xr), axis=axes)
            if self.axis_name is not None:
                mean_g = jax.lax.pmean(mean_g, self.axis_name)
                mean_sq_g = jax.lax.pmean(mean_sq_g, self.axis_name)
            var_g = mean_sq_g - jnp.square(mean_g)
            n = x.size // (C * G)
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
            scale = self.param("scale", nn.initializers.ones, (C,),
                               jnp.float32)
            bias = self.param("bias", nn.initializers.zeros, (C,),
                              jnp.float32)
            a_g = scale * jax.lax.rsqrt(var_g + self.epsilon)   # (G, C)
            b_g = bias - mean_g * a_g
            a_full = jnp.repeat(jnp.tile(a_g, (1, P)), N // G, axis=0)
            b_full = jnp.repeat(jnp.tile(b_g, (1, P)), N // G, axis=0)
            bshape = (N,) + (1,) * (x.ndim - 2) + (P * C,)
            return x * a_full.reshape(bshape).astype(x.dtype) \
                + b_full.reshape(bshape).astype(x.dtype)
        else:
            # fp32 reductions over (B,H,W,P) per channel; the reshape feeds
            # a fused reduce, nothing big is materialized
            xr = x.reshape(x.shape[:-1] + (P, C)).astype(jnp.float32)
            axes = tuple(range(xr.ndim - 1))
            mean = jnp.mean(xr, axis=axes)
            mean_sq = jnp.mean(jnp.square(xr), axis=axes)
            if self.axis_name is not None:
                mean = jax.lax.pmean(mean, self.axis_name)
                mean_sq = jax.lax.pmean(mean_sq, self.axis_name)
            var = mean_sq - jnp.square(mean)
            n = x.size // C
            if self.axis_name is not None:
                n = n * jax.lax.psum(1, self.axis_name)
            unbiased = var * (n / max(n - 1, 1))
            if not self.is_initializing():
                m = self.momentum
                ra_mean.value = (1 - m) * ra_mean.value + m * mean
                ra_var.value = (1 - m) * ra_var.value + m * unbiased
        scale = self.param("scale", nn.initializers.ones, (C,), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (C,), jnp.float32)
        a = scale * jax.lax.rsqrt(var + self.epsilon)
        b = bias - mean * a
        return x * jnp.tile(a, P).astype(x.dtype) \
            + jnp.tile(b, P).astype(x.dtype)


class _PatchCBR(nn.Module):
    """_PatchConv + BatchNorm + LeakyReLU with ConvBNReLU's param tree
    ('conv'/'bn') and BN statistics over exactly the same sample set as the
    little-images formulation (every patch position of every pixel)."""
    ih: int
    iw: int
    cin: int
    cout: int
    use_norm: bool = True
    bn_axis_name: Optional[str] = None
    bn_groups: int = 1

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False):
        y, (oh, ow) = _PatchConv(self.ih, self.iw, self.cin, self.cout,
                                 use_bias=not self.use_norm,
                                 name="conv")(x)
        if self.use_norm:
            y = _PackedBN(self.cout, axis_name=self.bn_axis_name,
                          groups=self.bn_groups,
                          name="bn")(y, use_running_average=not train)
        return leaky_relu(y), (oh, ow)


class UncertaintyModule(nn.Module):
    """Correlation-uncertainty head (reference modules.py:480-561).

    The reference treats the (B,H,W,S*S) correlation volume as B*H*W
    little SxS images and convs them down to 6 statistics.  On TPU that
    batch-B*H*W, C=1 conv layout is pathological (measured: the uncertainty
    chain dominated the whole alignment forward); for S=9 the same math
    runs as structured channel matmuls on the (B,H,W,81) layout directly
    (see _PatchConv).  S=16 (level 4, 16^2 grid — negligible cost) keeps
    the little-images formulation.
    """
    search_size: int = 9
    feed_in_previous: bool = False
    batch_norm: bool = True
    bn_axis_name: Optional[str] = None
    bn_groups: int = 1

    @nn.compact
    def __call__(self, corr: jax.Array, feat: jax.Array,
                 prev_uncert: Optional[jax.Array] = None,
                 prev_flow: Optional[jax.Array] = None,
                 train: bool = False) -> jax.Array:
        B, H, W, SS = corr.shape
        S = self.search_size
        assert SS == S * S
        cbr = functools.partial(ConvBNReLU, use_norm=self.batch_norm,
                                activation=leaky_relu,
                                bn_axis_name=self.bn_axis_name,
                                bn_groups=self.bn_groups)
        if S == 9:
            pcbr = functools.partial(_PatchCBR, use_norm=self.batch_norm,
                                     bn_axis_name=self.bn_axis_name,
                                     bn_groups=self.bn_groups)
            x = corr
            x, (ih, iw) = pcbr(9, 9, 1, 32, name="conv_0")(x, train=train)
            x, (ih, iw) = pcbr(ih, iw, 32, 32, name="conv_1")(x, train=train)
            x, (ih, iw) = pcbr(ih, iw, 32, 16, name="conv_2")(x, train=train)
            u, _ = _PatchConv(ih, iw, 16, 6, use_bias=True,
                              name="predict_uncertainty")(x)
            uncert_corr = u
        elif S == 16:
            x = corr.reshape(B * H * W, S, S, 1)
            x = cbr(32, kernel_size=3, padding=0, name="conv_0")(x, train=train)
            x = max_pool_2x2(x)
            x = cbr(32, kernel_size=3, padding=0, name="conv_1")(x, train=train)
            x = cbr(16, kernel_size=3, padding=0, name="conv_2")(x, train=train)
            u = conv2d(6, kernel_size=3, padding=0,
                       name="predict_uncertainty")(x)
            uncert_corr = u.reshape(B, H, W, 6)
        else:
            raise ValueError(f"unsupported search_size {S}")

        if self.feed_in_previous:
            x = jnp.concatenate(
                [uncert_corr, feat, prev_uncert, prev_flow], axis=-1)
        else:
            x = jnp.concatenate([uncert_corr, feat], axis=-1)
        x = cbr(32, kernel_size=3, name="pred_conv_0")(x, train=train)
        x = cbr(16, kernel_size=3, name="pred_conv_1")(x, train=train)
        return conv2d(1, kernel_size=3, padding=1,
                      name="predict_uncertainty_final")(x)
