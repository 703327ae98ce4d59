"""mmseg-style ResNet v1c backbone (reference models/backbones/resnet.py).

Deep 3x3-conv stem, BasicBlock/Bottleneck stages with configurable strides
and dilations (DeepLabV2 uses strides (1,2,1,1) + dilations (1,1,2,4)),
frozen-stage and norm-eval support.  NHWC, flax; param names mirror torch
keys (``stem_0``, ``layer1_0/conv1``, ``layer1_0/downsample_0`` ...) for
mechanical checkpoint conversion.
"""
from __future__ import annotations

from typing import List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..nn.layers import TorchBatchNorm, conv2d, kaiming_normal_fanout
from flax.linen import initializers as _fl_init

# reference resnet.py:320-339: kaiming fan_out/relu convs, BN 1/0, and
# zero-init of the last BN scale in each residual branch
_KAIMING = kaiming_normal_fanout()

ARCH_SETTINGS = {
    "resnet18_v1c": dict(block="basic", stage_blocks=(2, 2, 2, 2)),
    "resnet50_v1c": dict(block="bottleneck", stage_blocks=(3, 4, 6, 3)),
    "resnet101_v1c": dict(block="bottleneck", stage_blocks=(3, 4, 23, 3)),
}


def _max_pool_3x3_s2(x: jax.Array, ceil_mode: bool = False) -> jax.Array:
    """torch MaxPool2d(3, stride=2, padding=1)."""
    H, W = x.shape[1:3]
    pad_h = [1, 1]
    pad_w = [1, 1]
    if ceil_mode:
        # extra bottom/right padding when (dim + 2 - 3) % 2 != 0
        if (H + 2 - 3) % 2 != 0:
            pad_h[1] += 1
        if (W + 2 - 3) % 2 != 0:
            pad_w[1] += 1
    x = jnp.pad(x, ((0, 0), tuple(pad_h), tuple(pad_w), (0, 0)),
                constant_values=-jnp.inf)
    return jax.lax.reduce_window(x, -jnp.inf, jax.lax.max,
                                 (1, 3, 3, 1), (1, 2, 2, 1), "VALID")


class BasicBlock(nn.Module):
    """reference models/modules.py:71-146."""
    planes: int
    stride: int = 1
    dilation: int = 1
    has_downsample: bool = False
    bn_axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False,
                 norm_train: Optional[bool] = None) -> jax.Array:
        bn_train = train if norm_train is None else norm_train
        identity = x
        out = conv2d(self.planes, 3, self.stride, self.dilation,
                     self.dilation, use_bias=False,
                     kernel_init=_KAIMING, name="conv1")(x)
        out = TorchBatchNorm(axis_name=self.bn_axis_name, name="bn1")(
            out, use_running_average=not bn_train)
        out = jax.nn.relu(out)
        out = conv2d(self.planes, 3, 1, 1, use_bias=False,
                     kernel_init=_KAIMING, name="conv2")(out)
        out = TorchBatchNorm(axis_name=self.bn_axis_name, name="bn2",
                             scale_init=_fl_init.zeros)(
            out, use_running_average=not bn_train)
        if self.has_downsample:
            identity = conv2d(self.planes, 1, self.stride, 0, use_bias=False,
                              kernel_init=_KAIMING, name="downsample_0")(x)
            identity = TorchBatchNorm(axis_name=self.bn_axis_name,
                                      name="downsample_1")(
                identity, use_running_average=not bn_train)
        return jax.nn.relu(out + identity)


class Bottleneck(nn.Module):
    """reference models/modules.py:149-244 (style='pytorch': stride on the
    3x3 conv)."""
    planes: int
    stride: int = 1
    dilation: int = 1
    has_downsample: bool = False
    bn_axis_name: Optional[str] = None
    expansion: int = 4

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False,
                 norm_train: Optional[bool] = None) -> jax.Array:
        bn_train = train if norm_train is None else norm_train
        identity = x
        out = conv2d(self.planes, 1, 1, 0, use_bias=False,
                     kernel_init=_KAIMING, name="conv1")(x)
        out = TorchBatchNorm(axis_name=self.bn_axis_name, name="bn1")(
            out, use_running_average=not bn_train)
        out = jax.nn.relu(out)
        out = conv2d(self.planes, 3, self.stride, self.dilation,
                     self.dilation, use_bias=False,
                     kernel_init=_KAIMING, name="conv2")(out)
        out = TorchBatchNorm(axis_name=self.bn_axis_name, name="bn2")(
            out, use_running_average=not bn_train)
        out = jax.nn.relu(out)
        out = conv2d(self.planes * self.expansion, 1, 1, 0, use_bias=False,
                     kernel_init=_KAIMING, name="conv3")(out)
        out = TorchBatchNorm(axis_name=self.bn_axis_name, name="bn3",
                             scale_init=_fl_init.zeros)(
            out, use_running_average=not bn_train)
        if self.has_downsample:
            identity = conv2d(self.planes * self.expansion, 1, self.stride,
                              0, use_bias=False, kernel_init=_KAIMING,
                              name="downsample_0")(x)
            identity = TorchBatchNorm(axis_name=self.bn_axis_name,
                                      name="downsample_1")(
                identity, use_running_average=not bn_train)
        return jax.nn.relu(out + identity)


class ResNet(nn.Module):
    model_type: str = "resnet101_v1c"
    strides: Sequence[int] = (1, 2, 2, 2)
    dilations: Sequence[int] = (1, 1, 1, 1)
    out_indices: Sequence[int] = (0, 1, 2, 3)
    stem_channels: int = 64
    base_channels: int = 64
    contract_dilation: bool = False
    norm_eval: bool = False
    max_pool_ceil_mode: bool = False
    bn_axis_name: Optional[str] = None
    # jax.checkpoint per residual block — the reference's with_cp
    # (models/modules.py:118,139-142,237-240)
    remat: bool = False

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False,
                 deterministic: bool = True) -> List[jax.Array]:
        cfg = ARCH_SETTINGS[self.model_type]
        block_cls = BasicBlock if cfg["block"] == "basic" else Bottleneck
        if self.remat:
            block_cls = nn.remat(block_cls, static_argnums=(2, 3))
        expansion = 1 if cfg["block"] == "basic" else 4
        # norm_eval freezes BN statistics even in train mode
        # (reference resnet.py:378-385)
        bn_train = train and not self.norm_eval

        # deep stem: 3x (conv3x3 + BN + ReLU), first stride 2
        c = self.stem_channels
        for i, (ch, st) in enumerate([(c // 2, 2), (c // 2, 1), (c, 1)]):
            x = conv2d(ch, 3, st, 1, use_bias=False,
                       kernel_init=_KAIMING, name=f"stem_{3 * i}")(x)
            x = TorchBatchNorm(axis_name=self.bn_axis_name,
                               name=f"stem_{3 * i + 1}")(
                x, use_running_average=not bn_train)
            x = jax.nn.relu(x)
        x = _max_pool_3x3_s2(x, self.max_pool_ceil_mode)

        outs = []
        in_ch = self.stem_channels
        for si, num_blocks in enumerate(cfg["stage_blocks"]):
            stride = self.strides[si]
            dilation = self.dilations[si]
            out_ch = self.base_channels * 2 ** si
            for bi in range(num_blocks):
                if bi == 0:
                    first_dil = (dilation // 2
                                 if dilation > 1 and self.contract_dilation
                                 else dilation)
                    has_ds = (stride != 1 or in_ch != out_ch * expansion)
                    x = block_cls(out_ch, stride, first_dil, has_ds,
                                  self.bn_axis_name,
                                  name=f"layer{si + 1}_{bi}")(
                        x, train, bn_train)
                else:
                    x = block_cls(out_ch, 1, dilation, False,
                                  self.bn_axis_name,
                                  name=f"layer{si + 1}_{bi}")(
                        x, train, bn_train)
            in_ch = out_ch * expansion
            if si in self.out_indices:
                outs.append(x)
        return outs
