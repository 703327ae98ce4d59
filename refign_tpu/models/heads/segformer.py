"""SegFormer all-MLP decode head (reference models/heads/segformer.py:15-111).

NHWC: each stage feature is linearly embedded, bilinearly upsampled
(align_corners=False) to the 1/4-scale stage-1 grid, concatenated in
[c4, c3, c2, c1] order (matching the reference's channel order for
checkpoint fidelity), fused by a 1x1 ConvBNReLU, and classified 1x1.

Also reused as the HRDA scale-attention head (single-channel output).
"""
from __future__ import annotations

from typing import List, Optional, Sequence, Union

import jax
import jax.numpy as jnp
from flax import linen as nn

from ...nn.layers import (ConvBNReLU, Dropout2d, MLPEmbed, conv2d,
                          kaiming_normal_fanout, normal_init)
from ...ops.resize import interpolate
from .base import transform_inputs


class SegFormerHead(nn.Module):
    num_classes: int
    channels: int = 256
    dropout_ratio: float = 0.1
    in_index: Sequence[int] = (0, 1, 2, 3)
    input_transform: Optional[str] = "multiple_select"
    bn_axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, inputs: Sequence[jax.Array], train: bool = False,
                 deterministic: bool = True) -> jax.Array:
        assert self.input_transform == "multiple_select", (
            f"SegFormerHead supports input_transform='multiple_select' "
            f"only, got {self.input_transform!r}")
        c1, c2, c3, c4 = transform_inputs(inputs, list(self.in_index),
                                          self.input_transform)
        size = c1.shape[1:3]

        def embed_up(c, name):
            e = MLPEmbed(self.channels, name=name)(c)
            if e.shape[1:3] != size:
                e = interpolate(e, size, mode="bilinear", align_corners=False)
            return e

        _c4 = embed_up(c4, "linear_c4")
        _c3 = embed_up(c3, "linear_c3")
        _c2 = embed_up(c2, "linear_c2")
        _c1 = embed_up(c1, "linear_c1")

        x = jnp.concatenate([_c4, _c3, _c2, _c1], axis=-1)
        # mmseg init (reference segformer.py:62-76)
        x = ConvBNReLU(self.channels, kernel_size=1,
                       bn_axis_name=self.bn_axis_name,
                       kernel_init=kaiming_normal_fanout(),
                       bias_init=nn.initializers.zeros,
                       name="linear_fuse")(x, train=train)
        x = Dropout2d(self.dropout_ratio, name="dropout")(
            x, deterministic=deterministic)
        x = conv2d(self.num_classes, kernel_size=1, padding=0,
                   kernel_init=normal_init(0.01),
                   bias_init=nn.initializers.zeros,
                   name="linear_pred")(x)
        return x
