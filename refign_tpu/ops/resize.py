"""PyTorch-exact image resizing for TPU.

Re-implements the semantics of ``torch.nn.functional.interpolate`` for the
modes the reference uses everywhere (bilinear with ``align_corners`` True and
False, nearest, area — see e.g. reference models/heads/segformer.py:88-99,
models/segmentation_model.py:163-170, :498-501).  ``jax.image.resize`` does NOT
match PyTorch's coordinate conventions, so we build the index/weight tables
with numpy at trace time (shapes are static under jit) and apply them as
separable per-axis gathers + lerps (bilinear/nearest) or small matmuls (area).

All functions operate on NHWC arrays (TPU-native layout).  Interpolation
arithmetic is performed in float32 regardless of input dtype (matching the
reference's AMP behaviour of running interpolate in fp32 islands) and cast
back to the input dtype.
"""
from __future__ import annotations

import functools
from typing import Optional, Sequence, Tuple, Union

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["interpolate", "resize", "adaptive_avg_pool"]


@functools.lru_cache(maxsize=None)
def _linear_tables(in_size: int, out_size: int, align_corners: bool):
    """Source indices (lo, hi) and hi-weights for 1-D linear interpolation.

    Mirrors PyTorch's ``area_pixel_compute_source_index``:
      align_corners=True :  src = dst * (in-1)/(out-1)
      align_corners=False:  src = max(0, (dst+0.5) * in/out - 0.5)
    """
    dst = np.arange(out_size, dtype=np.float64)
    if align_corners:
        if out_size == 1:
            src = np.zeros_like(dst)
        else:
            src = dst * (in_size - 1) / (out_size - 1)
    else:
        src = np.maximum((dst + 0.5) * in_size / out_size - 0.5, 0.0)
    lo = np.floor(src).astype(np.int64)
    lo = np.clip(lo, 0, in_size - 1)
    hi = np.minimum(lo + 1, in_size - 1)
    w_hi = (src - lo).astype(np.float32)
    return (
        tuple(lo.tolist()),
        tuple(hi.tolist()),
        tuple(w_hi.tolist()),
    )


@functools.lru_cache(maxsize=None)
def _nearest_table(in_size: int, out_size: int):
    """PyTorch 'nearest' (legacy, the mode the reference uses):
    src = min(floor(dst * in/out), in-1)."""
    dst = np.arange(out_size, dtype=np.float64)
    src = np.minimum(np.floor(dst * (in_size / out_size)), in_size - 1)
    return tuple(src.astype(np.int64).tolist())


@functools.lru_cache(maxsize=None)
def _area_matrix(in_size: int, out_size: int) -> np.ndarray:
    """Row-stochastic (out,in) averaging matrix for 'area' interpolation.

    PyTorch 'area' mode == adaptive average pooling: output j averages inputs
    [floor(j*in/out), ceil((j+1)*in/out)) with equal weights.
    """
    mat = np.zeros((out_size, in_size), dtype=np.float32)
    for j in range(out_size):
        start = (j * in_size) // out_size
        end = -((-(j + 1) * in_size) // out_size)  # ceil
        mat[j, start:end] = 1.0 / (end - start)
    return mat


@functools.lru_cache(maxsize=None)
def _linear_matrix(in_size: int, out_size: int,
                   align_corners: bool) -> np.ndarray:
    """(out, in) row-sparse lerp matrix: row o has (1-w) at lo, w at hi."""
    lo, hi, w = _linear_tables(in_size, out_size, align_corners)
    mat = np.zeros((out_size, in_size), dtype=np.float32)
    rows = np.arange(out_size)
    mat[rows, np.asarray(lo)] += 1.0 - np.asarray(w, np.float32)
    mat[rows, np.asarray(hi)] += np.asarray(w, np.float32)
    return mat


def _resize_axis_linear(x: jax.Array, axis: int, out_size: int,
                        align_corners: bool) -> jax.Array:
    """Lerp along one axis as a static matmul.

    TPU note: the gather formulation (jnp.take with index arrays) lowers to
    a SERIAL while+dynamic-update-slice loop on TPU — profiled at ~40% of
    HRDA inference time.  A dense (out, in) matrix with <=2 nonzeros per row
    runs on the MXU instead and is numerically identical (same two-term
    lerp per output element).
    """
    in_size = x.shape[axis]
    if in_size == out_size:
        return x
    mat = jnp.asarray(_linear_matrix(in_size, out_size, align_corners),
                      dtype=x.dtype)
    x = jnp.moveaxis(x, axis, -1)
    y = jnp.einsum("...i,oi->...o", x, mat,
                   preferred_element_type=jnp.float32).astype(x.dtype)
    return jnp.moveaxis(y, -1, axis)


@functools.lru_cache(maxsize=None)
def _nearest_matrix(in_size: int, out_size: int) -> np.ndarray:
    mat = np.zeros((out_size, in_size), dtype=np.float32)
    mat[np.arange(out_size), np.asarray(_nearest_table(in_size, out_size))] \
        = 1.0
    return mat


def _resize_axis_nearest(x: jax.Array, axis: int, out_size: int) -> jax.Array:
    in_size = x.shape[axis]
    if in_size == out_size:
        return x
    if jnp.issubdtype(x.dtype, jnp.floating):
        # selection matrix on the MXU — static-index gathers serialize on TPU
        mat = jnp.asarray(_nearest_matrix(in_size, out_size), dtype=x.dtype)
        x = jnp.moveaxis(x, axis, -1)
        y = jnp.einsum("...i,oi->...o", x, mat,
                       preferred_element_type=jnp.float32).astype(x.dtype)
        return jnp.moveaxis(y, -1, axis)
    idx = jnp.asarray(_nearest_table(in_size, out_size), dtype=jnp.int32)
    return jnp.take(x, idx, axis=axis)


def _resize_axis_area(x: jax.Array, axis: int, out_size: int) -> jax.Array:
    in_size = x.shape[axis]
    if in_size == out_size:
        return x
    mat = jnp.asarray(_area_matrix(in_size, out_size), dtype=x.dtype)
    x = jnp.moveaxis(x, axis, -1)
    y = jnp.einsum("...i,oi->...o", x, mat,
                   preferred_element_type=jnp.float32).astype(x.dtype)
    return jnp.moveaxis(y, -1, axis)


def interpolate(x: jax.Array,
                size: Tuple[int, int],
                mode: str = "bilinear",
                align_corners: Optional[bool] = None,
                spatial_axes: Tuple[int, int] = (1, 2)) -> jax.Array:
    """torch.nn.functional.interpolate equivalent on NHWC (axes configurable).

    Args:
      x: input array; spatial dims given by ``spatial_axes`` (default NHWC).
      size: output (H, W).
      mode: 'bilinear' | 'nearest' | 'area'.
      align_corners: required for bilinear, must be None for nearest/area.
    """
    ah, aw = spatial_axes
    oh, ow = int(size[0]), int(size[1])
    if mode == "nearest":
        assert align_corners is None
        x = _resize_axis_nearest(x, ah, oh)
        x = _resize_axis_nearest(x, aw, ow)
        return x
    # matmul-based modes run in the input dtype with fp32 accumulation:
    # exact for fp32 inputs; for bf16 the weight rounding (~1e-3) is well
    # inside the reference's fp16-AMP interpolate error.  Integer inputs
    # would silently truncate every fractional weight to 0 — torch raises
    # for them too, so fail loudly (use mode='nearest' for label maps).
    if not jnp.issubdtype(x.dtype, jnp.floating):
        raise TypeError(
            f"interpolate mode '{mode}' requires a floating dtype, got "
            f"{x.dtype} (torch.nn.functional.interpolate raises here too; "
            "use mode='nearest' for integer label maps)")
    if mode == "bilinear":
        assert align_corners is not None, "bilinear requires align_corners"
        x = _resize_axis_linear(x, ah, oh, align_corners)
        x = _resize_axis_linear(x, aw, ow, align_corners)
    elif mode == "area":
        assert align_corners is None
        x = _resize_axis_area(x, ah, oh)
        x = _resize_axis_area(x, aw, ow)
    else:
        raise ValueError(f"unsupported mode: {mode}")
    return x


def resize(x: jax.Array, size: Tuple[int, int], mode: str = "bilinear",
           align_corners: Optional[bool] = False) -> jax.Array:
    """NHWC resize; thin alias of :func:`interpolate`."""
    return interpolate(x, size, mode=mode, align_corners=align_corners)


def adaptive_avg_pool(x: jax.Array, out_size: Union[int, Tuple[int, int]],
                      spatial_axes: Tuple[int, int] = (1, 2)) -> jax.Array:
    """torch.nn.AdaptiveAvgPool2d equivalent (NHWC by default)."""
    if isinstance(out_size, int):
        out_size = (out_size, out_size)
    orig_dtype = x.dtype
    x = x.astype(jnp.float32)
    x = _resize_axis_area(x, spatial_axes[0], out_size[0])
    x = _resize_axis_area(x, spatial_axes[1], out_size[1])
    return x.astype(orig_dtype)
