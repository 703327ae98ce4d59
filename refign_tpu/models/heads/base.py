"""Head input-transform helpers (reference models/heads/base.py:7-44)."""
from __future__ import annotations

from typing import List, Optional, Sequence, Union

import jax
import jax.numpy as jnp

from ...ops.resize import interpolate


def transform_inputs(inputs: Sequence[jax.Array],
                     in_index: Union[int, Sequence[int]],
                     input_transform: Optional[str] = None):
    """Select/merge multi-level NHWC features for a decode head."""
    if input_transform == "resize_concat":
        sel = [inputs[i] for i in in_index]
        target = sel[0].shape[1:3]
        up = [interpolate(x, target, mode="bilinear", align_corners=False)
              for x in sel]
        return jnp.concatenate(up, axis=-1)
    if input_transform == "multiple_select":
        return [inputs[i] for i in in_index]
    if isinstance(in_index, (list, tuple)):
        assert len(in_index) == 1
        return inputs[in_index[0]]
    return inputs[in_index]
