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

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False):
        cbr = functools.partial(ConvBNReLU, use_norm=self.batch_norm,
                                activation=None,
                                bn_axis_name=self.bn_axis_name)
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

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        cbr = functools.partial(ConvBNReLU, use_norm=self.batch_norm,
                                activation=leaky_relu,
                                bn_axis_name=self.bn_axis_name)
        chans = [128, 128, 128, 96, 64, 32]
        dils = [1, 2, 4, 8, 16, 1]
        for i, (c, d) in enumerate(zip(chans, dils)):
            x = cbr(c, kernel_size=3, dilation=d, name=f"dc_convs_{i}")(
                x, train=train)
        return conv2d(self.out_channels, kernel_size=3, padding=1,
                      name="dc_convs_6")(x)


class UncertaintyModule(nn.Module):
    """Correlation-uncertainty head (reference modules.py:480-561).

    Treats the (B,H,W,S*S) correlation volume as B*H*W little SxS images,
    convs them down to 6 statistics, concatenates with the decoder feature
    (+ upsampled previous flow/log-var when ``feed_in_previous``), and
    predicts a 1-channel log-variance.
    """
    search_size: int = 9
    feed_in_previous: bool = False
    batch_norm: bool = True
    bn_axis_name: Optional[str] = None

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
                                bn_axis_name=self.bn_axis_name)
        x = corr.reshape(B * H * W, S, S, 1)
        if S == 9:
            x = cbr(32, kernel_size=3, padding=0, name="conv_0")(x, train=train)
            x = cbr(32, kernel_size=3, padding=0, name="conv_1")(x, train=train)
            x = cbr(16, kernel_size=3, padding=0, name="conv_2")(x, train=train)
            u = conv2d(6, kernel_size=3, padding=0,
                       name="predict_uncertainty")(x)
        elif S == 16:
            x = cbr(32, kernel_size=3, padding=0, name="conv_0")(x, train=train)
            x = max_pool_2x2(x)
            x = cbr(32, kernel_size=3, padding=0, name="conv_1")(x, train=train)
            x = cbr(16, kernel_size=3, padding=0, name="conv_2")(x, train=train)
            u = conv2d(6, kernel_size=3, padding=0,
                       name="predict_uncertainty")(x)
        else:
            raise ValueError(f"unsupported search_size {S}")
        uncert_corr = u.reshape(B, H, W, 6)

        if self.feed_in_previous:
            x = jnp.concatenate(
                [uncert_corr, feat, prev_uncert, prev_flow], axis=-1)
        else:
            x = jnp.concatenate([uncert_corr, feat], axis=-1)
        x = cbr(32, kernel_size=3, name="pred_conv_0")(x, train=train)
        x = cbr(16, kernel_size=3, name="pred_conv_1")(x, train=train)
        return conv2d(1, kernel_size=3, padding=1,
                      name="predict_uncertainty_final")(x)
