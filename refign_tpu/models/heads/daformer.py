"""DAFormer context-aware fusion decode head
(reference models/heads/daformer.py:15-227).

Per-stage MLP embeddings upsampled to the 1/4 grid, concatenated, fused by a
depthwise-separable ASPP (dilations 1,6,12,18, no image pool), then a 1x1
classifier.  NHWC throughout.
"""
from __future__ import annotations

from typing import List, Optional, Sequence, Union

import jax
import jax.numpy as jnp
from flax import linen as nn

from ...nn.layers import (ConvBNReLU, Dropout2d, MLPEmbed, conv2d,
                          kaiming_normal_fanout, normal_init)
from flax.linen import initializers as _fl_init

# mmseg init (reference daformer.py:187-201): ConvBNReLU convs kaiming
# fan_out/relu with zero bias; classifier N(0, 0.01) with zero bias
_CBR_INIT = dict(kernel_init=kaiming_normal_fanout(),
                 bias_init=_fl_init.zeros)
from ...ops.resize import interpolate
from .base import transform_inputs


class DepthwiseSeparableASPP(nn.Module):
    """ASPP with depthwise-separable dilated branches + bottleneck fuse
    (reference daformer.py:46-126, sep=True, pool=False)."""
    channels: int
    dilations: Sequence[int] = (1, 6, 12, 18)
    bn_axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        outs = []
        for i, d in enumerate(self.dilations):
            if d == 1:
                branch = ConvBNReLU(self.channels, kernel_size=1, padding=0,
                                    bn_axis_name=self.bn_axis_name,
                                    **_CBR_INIT,
                                    name=f"aspp_modules_{i}")
            else:
                branch = ConvBNReLU(self.channels, kernel_size=3, dilation=d,
                                    padding=d, depthwise_separable=True,
                                    bn_axis_name=self.bn_axis_name,
                                    **_CBR_INIT,
                                    name=f"aspp_modules_{i}")
            outs.append(branch(x, train=train))
        x = jnp.concatenate(outs, axis=-1)
        x = ConvBNReLU(self.channels, kernel_size=3, padding=1,
                       bn_axis_name=self.bn_axis_name, **_CBR_INIT,
                       name="bottleneck")(x, train=train)
        return x


class DAFormerHead(nn.Module):
    num_classes: int
    channels: int = 256
    embed_dims: int = 256
    dropout_ratio: float = 0.1
    in_index: Sequence[int] = (0, 1, 2, 3)
    input_transform: Optional[str] = "multiple_select"
    bn_axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, inputs: Sequence[jax.Array], train: bool = False,
                 deterministic: bool = True) -> jax.Array:
        # this head's fusion structurally needs per-scale features; fail
        # loudly on a configured transform it cannot honor instead of
        # silently ignoring the field
        assert self.input_transform == "multiple_select", (
            f"DAFormerHead supports input_transform='multiple_select' "
            f"only, got {self.input_transform!r}")
        feats = transform_inputs(inputs, list(self.in_index),
                                 self.input_transform)
        size = feats[0].shape[1:3]
        embedded = []
        for i, f in enumerate(feats):
            e = MLPEmbed(self.embed_dims, name=f"embed_layers_{i}")(f)
            if e.shape[1:3] != size:
                e = interpolate(e, size, mode="bilinear", align_corners=False)
            embedded.append(e)
        x = jnp.concatenate(embedded, axis=-1)
        x = DepthwiseSeparableASPP(self.channels,
                                   bn_axis_name=self.bn_axis_name,
                                   name="fuse_layer")(x, train=train)
        x = Dropout2d(self.dropout_ratio, name="dropout")(
            x, deterministic=deterministic)
        x = conv2d(self.num_classes, kernel_size=1, padding=0,
                   kernel_init=normal_init(0.01), bias_init=_fl_init.zeros,
                   name="conv_seg")(x)
        return x
