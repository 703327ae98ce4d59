"""Canonical honest-timing helpers for the axon TPU tunnel.

Methodology (PARITY.md "Round-2 measurement methodology fix"):
`jax.block_until_ready` does NOT synchronize through the axon relay and
identical-argument re-dispatches of small programs are not reliably
timed, so every measurement must

  1. barrier via a scalar d2h fetch (``sync_scalar``), subtracting a
     fetch-only baseline taken against an idle queue, and
  2. chain each iteration's output into the next input so every
     execution is forced (the ``chain`` callback).

New bench tools should use ``chained_timeit`` rather than growing
another diverging copy of this loop.
"""
import time

import numpy as np


def sync_scalar(x):
    """True barrier: fetch one scalar of ``x`` to the host."""
    import jax
    np.asarray(jax.device_get(x[(0,) * getattr(x, "ndim", 0)]
                              if getattr(x, "ndim", 0) else x))


def chained_timeit(fn, chain, *args, iters=8):
    """Time ``fn(*args)`` per-iteration with chained inputs.

    ``chain(args, out) -> new args`` must make each iteration's input
    depend on the previous output (forces execution on the relay).
    Returns milliseconds per iteration with the idle-queue RPC fetch
    baseline subtracted.
    """
    import jax
    out = fn(*args)
    jax.block_until_ready(out)
    args = chain(args, out)
    out = fn(*args)
    sync_scalar(jax.tree_util.tree_leaves(out)[0])
    t0 = time.perf_counter()
    sync_scalar(jax.tree_util.tree_leaves(out)[0])
    rpc = time.perf_counter() - t0
    t0 = time.perf_counter()
    for _ in range(iters):
        args = chain(args, out)
        out = fn(*args)
    sync_scalar(jax.tree_util.tree_leaves(out)[0])
    return max(time.perf_counter() - t0 - rpc, 1e-9) / iters * 1e3
