"""VGG feature-pyramid backbone for UAWarpC (reference models/backbones/vgg.py).

torchvision-config VGG exposing per-level features; ``extract_only_indices``
slices the level list exactly like the reference (vgg.py:108-120): levels are
[after-first-ReLU, after-pool1, ..., after-pool5], filtered by
``out_indices`` at construction.

NHWC.  Param names mirror torch keys ``features.{i}`` (fused to
``features_{i}``) so torchvision checkpoints convert mechanically.
"""
from __future__ import annotations

from typing import List, Optional, Sequence

import jax
from flax import linen as nn

from flax.linen import initializers as _fl_init

from ..nn.layers import TorchBatchNorm, conv2d, kaiming_normal_fanout
from .matching_modules import max_pool_2x2

# reference vgg.py:81-90: kaiming fan_out/relu convs with zero bias
_KAIMING = kaiming_normal_fanout()

CFGS = {
    "A": [64, "M", 128, "M", 256, 256, "M", 512, 512, "M", 512, 512, "M"],
    "B": [64, 64, "M", 128, 128, "M", 256, 256, "M", 512, 512, "M",
          512, 512, "M"],
    "D": [64, 64, "M", 128, 128, "M", 256, 256, 256, "M", 512, 512, 512, "M",
          512, 512, 512, "M"],
    "E": [64, 64, "M", 128, 128, "M", 256, 256, 256, 256, "M",
          512, 512, 512, 512, "M", 512, 512, 512, 512, "M"],
}

ARCH_SETTINGS = {
    "vgg11": ("A", False), "vgg11_bn": ("A", True),
    "vgg13": ("B", False), "vgg13_bn": ("B", True),
    "vgg16": ("D", False), "vgg16_bn": ("D", True),
    "vgg19": ("E", False), "vgg19_bn": ("E", True),
}


class VGG(nn.Module):
    model_type: str = "vgg16"
    out_indices: Sequence[int] = (0, 1, 2, 3, 4, 5)

    @nn.compact
    def __call__(self, x: jax.Array, extract_only_indices=None,
                 deterministic: bool = True) -> List[jax.Array]:
        cfg_key, batch_norm = ARCH_SETTINGS[self.model_type]
        cfg = CFGS[cfg_key]

        # torch layer indices: emit after the first conv+ReLU and after each
        # MaxPool (vgg.py:122-149)
        level_marks = []  # torch Sequential index AFTER which to emit
        idx = 0
        first_relu = True
        plan = []  # (kind, torch_conv_idx or None, channels)
        for v in cfg:
            if v == "M":
                plan.append(("pool", None, None))
                idx += 1
                level_marks.append(idx)
            else:
                plan.append(("conv", idx, v))
                idx += 3 if batch_norm else 2
                if first_relu:
                    first_relu = False
                    level_marks.append(idx)

        selected = [level_marks[i] for i in self.out_indices]
        if extract_only_indices is not None:
            selected = [selected[i] for i in extract_only_indices]
        last_needed = max(selected)

        outs = []
        pos = 0
        for kind, conv_idx, ch in plan:
            if pos >= last_needed:
                break
            if kind == "pool":
                x = max_pool_2x2(x)
                pos += 1
            else:
                x = conv2d(ch, kernel_size=3, padding=1,
                           kernel_init=_KAIMING, bias_init=_fl_init.zeros,
                           name=f"features_{conv_idx}")(x)
                pos += 1
                if batch_norm:
                    x = TorchBatchNorm(name=f"features_{conv_idx + 1}")(
                        x, use_running_average=True)
                    pos += 1
                x = jax.nn.relu(x)
                pos += 1
            if pos in selected:
                outs.append(x)
        return outs
