"""Device mesh + sharding helpers (SURVEY.md §2.8, §5.8).

The reference's only distribution mode is Lightning DDP over NCCL with
sync-BN.  TPU-native equivalent: a 1-D ``Mesh('data')`` with batch arrays
sharded on 'data' and parameters replicated; XLA inserts the ICI collectives.
Because every batch reduction (BN statistics, loss means, metric sums) is a
global reduce over the sharded axis, sync-BN and distributed metric
reduction come out of pjit automatically — no explicit psum code.
"""
from __future__ import annotations

from typing import Any, Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

__all__ = ["make_mesh", "shard_batch", "replicate", "data_sharding",
           "cast_floating", "compute_mesh", "shard_rows"]


def make_mesh(devices: Optional[Sequence] = None,
              axis_name: str = "data") -> Mesh:
    devices = devices if devices is not None else jax.devices()
    return Mesh(np.array(devices), (axis_name,))


def data_sharding(mesh: Mesh, axis_name: str = "data") -> NamedSharding:
    return NamedSharding(mesh, P(axis_name))


def shard_batch(mesh: Mesh, batch: Any, axis_name: str = "data") -> Any:
    """Shard every array's leading (batch) axis across the mesh.

    Arrays whose leading axis is not divisible by the mesh size are
    replicated instead of sharded (a committed uneven device_put raises):
    e.g. ignore_every_second_semantic_training_batch randomly halves
    image_src per step, which can break divisibility mid-run.
    """
    n = int(np.prod(mesh.devices.shape))
    sh = NamedSharding(mesh, P(axis_name))
    rep = NamedSharding(mesh, P())

    def put(x):
        divisible = (hasattr(x, "shape") and getattr(x, "ndim", 0) > 0
                     and x.shape[0] % n == 0)
        return jax.device_put(x, sh if divisible else rep)

    return jax.tree_util.tree_map(put, batch)


def replicate(mesh: Mesh, tree: Any) -> Any:
    sh = NamedSharding(mesh, P())
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sh), tree)


_COMPUTE_MESH: list = [None]


class compute_mesh:
    """Context manager marking ``mesh`` as the active compute mesh.

    While active, :func:`shard_rows` constrains row-batched intermediates
    (slide/HRDA crop stacks, eval batches) to be sharded over the mesh's
    data axis, so a single logical forward spreads its crops across all
    devices (SURVEY §5.8: "a v5e-8 evaluates 8 crops concurrently").
    GSPMD handles non-divisible row counts by internal padding, so callers
    never pad.
    """

    def __init__(self, mesh: Optional[Mesh]):
        self.mesh = mesh if (mesh is not None
                             and np.prod(mesh.devices.shape) > 1) else None

    def __enter__(self):
        self._prev = _COMPUTE_MESH[0]
        _COMPUTE_MESH[0] = self.mesh
        return self.mesh

    def __exit__(self, *exc):
        _COMPUTE_MESH[0] = self._prev
        return False


def active_mesh() -> Optional[Mesh]:
    return _COMPUTE_MESH[0]


def shard_rows(x: Any, axis_name: str = "data") -> Any:
    """Constrain axis 0 of ``x`` to be sharded over the active compute mesh
    (no-op when none is active — single-device paths are unchanged)."""
    mesh = _COMPUTE_MESH[0]
    if mesh is None:
        return x
    return jax.lax.with_sharding_constraint(x, NamedSharding(mesh,
                                                             P(axis_name)))


def cast_floating(tree: Any, dtype) -> Any:
    """Cast floating leaves (bf16 inference/compute policy)."""
    import jax.numpy as jnp

    def cast(x):
        if hasattr(x, "dtype") and jnp.issubdtype(x.dtype, jnp.floating):
            return x.astype(dtype)
        return x

    return jax.tree_util.tree_map(cast, tree)
