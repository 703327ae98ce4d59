"""DeepLabV2 ASPP head (reference models/heads/deeplabv2.py:8-27):
sum of 4 parallel dilated 3x3 convs (dilations 6,12,18,24)."""
from __future__ import annotations

from typing import Optional, Sequence, Union

import jax
from flax import linen as nn

from ...nn.layers import conv2d, normal_init
from .base import transform_inputs


class DeepLabV2Head(nn.Module):
    num_classes: int
    dilation_series: Sequence[int] = (6, 12, 18, 24)
    in_index: Union[int, Sequence[int]] = -1
    input_transform: Optional[str] = None

    @nn.compact
    def __call__(self, inputs, train: bool = False,
                 deterministic: bool = True) -> jax.Array:
        x = transform_inputs(inputs, self.in_index, self.input_transform)
        out = None
        for i, d in enumerate(self.dilation_series):
            # reference deeplabv2.py:21-23: N(0, 0.01) weights, zero bias
            y = conv2d(self.num_classes, kernel_size=3, stride=1, padding=d,
                       dilation=d, kernel_init=normal_init(0.01),
                       bias_init=nn.initializers.zeros,
                       name=f"conv2d_list_{i}")(x)
            out = y if out is None else out + y
        return out
