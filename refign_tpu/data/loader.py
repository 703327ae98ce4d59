"""Batching, collation, and parallel prefetch for host datasets.

Replaces the reference's torch DataLoader usage
(data_modules/combined_data_module.py:203-261 + my_collate :18-28).
Two worker modes, selected by ``REFIGN_TPU_LOADER``:

- ``thread`` (default): PIL decode releases the GIL, so a thread pool
  parallelizes the decode without worker processes.  The numpy transform
  work (RandomCrop re-crop loop, flips, fp32 normalize) stays GIL-bound.
- ``process``: worker *processes*, matching the reference's
  ``num_workers: 4`` DataLoader semantics
  (configs/cityscapes_acdc/refign_hrda_star.yaml:6).  Each worker
  materializes and collates a WHOLE batch (torch DataLoader's
  assignment), so IPC ships one contiguous pickled block per batch and
  the GIL-bound numpy transform work runs truly in parallel.  Workers
  must never touch jax/the TPU (same contract as torch's "no CUDA in
  workers").  Fork start is the default (``REFIGN_TPU_LOADER_CTX`` to
  override); datasets are inherited by COW, nothing is pickled per task
  but the returned batch.

Batches are prefetched into a bounded queue so the TPU never stalls on
input (SURVEY.md §7.3 item 5).

Collation stacks numpy arrays; ragged correspondence arrays
('corr_pts', 'corr_pts_ref') stay as lists (sparse metrics sample dense
flows host-side, no static shapes needed).
"""
from __future__ import annotations

import multiprocessing
import os
import queue
import random as pyrandom
import threading
from concurrent.futures import ThreadPoolExecutor
from typing import Any, Dict, Iterator, List, Optional

import numpy as np

RAGGED_KEYS = ("corr_pts", "corr_pts_ref")


def collate(samples: List[Dict[str, Any]]) -> Dict[str, Any]:
    out: Dict[str, Any] = {}
    for key in samples[0]:
        vals = [s[key] for s in samples]
        if key in RAGGED_KEYS:
            out[key] = [np.asarray(v) for v in vals]
        elif isinstance(vals[0], np.ndarray):
            out[key] = np.stack(vals)
        elif isinstance(vals[0], (int, float, np.integer, np.floating)):
            out[key] = np.asarray(vals)
        else:
            out[key] = vals  # e.g. filenames
    return out


# --- process-mode worker plumbing -------------------------------------
# The dataset reaches fork workers by COW inheritance of this module
# global (set just before Pool() forks, under _FORK_LOCK, restored after)
# — nothing dataset-sized is ever pickled.  Under a spawn context it is
# pickled once per worker via the initializer instead.
_WORKER_DS = None
_FORK_LOCK = threading.Lock()


def _worker_init(ds):
    global _WORKER_DS
    if ds is not None:
        _WORKER_DS = ds


def _worker_batch(task):
    """Materialize + collate one whole batch in a worker process.

    Workers inherit (fork) or re-derive (spawn) the parent's global RNG
    state, so without reseeding every batch would replay the SAME random
    crop/flip/jitter sequence.  Seed both host RNGs from (seed, epoch,
    batch_index) — deterministic for a fixed loader seed, decorrelated
    across batches and workers.
    """
    seed, epoch, bidx, idxs = task
    mix = (seed * 1000003 + epoch * 8191 + bidx) % (2 ** 32)
    pyrandom.seed(mix)
    np.random.seed(mix)
    return collate([_WORKER_DS[i] for i in idxs])


class DataLoader:
    """Map-style loader: shuffle, batch, drop_last, parallel prefetch."""

    def __init__(self, dataset, batch_size: int, shuffle: bool = False,
                 drop_last: bool = False, num_workers: int = 4,
                 prefetch: int = 2, seed: int = 0,
                 mode: Optional[str] = None):
        self.dataset = dataset
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.drop_last = drop_last
        self.num_workers = max(1, num_workers)
        self.prefetch = prefetch
        self.seed = seed
        self.epoch = 0
        self.mode = mode or os.environ.get("REFIGN_TPU_LOADER", "thread")
        if self.mode not in ("thread", "process"):
            raise ValueError(f"REFIGN_TPU_LOADER={self.mode!r}: "
                             "expected 'thread' or 'process'")

    def __len__(self):
        n = len(self.dataset)
        return n // self.batch_size if self.drop_last else (
            (n + self.batch_size - 1) // self.batch_size)

    def _index_batches(self):
        idx = list(range(len(self.dataset)))
        if self.shuffle:
            pyrandom.Random(self.seed + self.epoch).shuffle(idx)
        batches = [idx[i:i + self.batch_size]
                   for i in range(0, len(idx), self.batch_size)]
        if self.drop_last:
            batches = [b for b in batches if len(b) == self.batch_size]
        return batches

    def __iter__(self) -> Iterator[Dict[str, Any]]:
        if self.mode == "process":
            yield from self._iter_process()
        else:
            yield from self._iter_thread()

    def _make_pool(self):
        """Worker-process pool; fork (default) inherits the dataset by
        COW, spawn pickles it once per worker via the initializer."""
        ctx_name = os.environ.get("REFIGN_TPU_LOADER_CTX", "fork")
        ctx = multiprocessing.get_context(ctx_name)
        global _WORKER_DS
        if ctx_name == "fork":
            with _FORK_LOCK:  # global is per-pool; serialize fork windows
                _WORKER_DS = self.dataset
                try:
                    return ctx.Pool(self.num_workers,
                                    initializer=_worker_init,
                                    initargs=(None,))
                finally:
                    _WORKER_DS = None
        return ctx.Pool(self.num_workers, initializer=_worker_init,
                        initargs=(self.dataset,))

    def _iter_process(self) -> Iterator[Dict[str, Any]]:
        batches = self._index_batches()
        epoch, self.epoch = self.epoch, self.epoch + 1
        pool = self._make_pool()
        try:
            # sliding in-flight window (torch: workers * prefetch_factor)
            # so ready-but-unconsumed batches can't pile up unboundedly
            limit = self.num_workers + max(1, self.prefetch)
            pending: List[Any] = []
            it = iter(enumerate(batches))
            done = False
            while pending or not done:
                while not done and len(pending) < limit:
                    try:
                        bidx, idxs = next(it)
                    except StopIteration:
                        done = True
                        break
                    pending.append(pool.apply_async(
                        _worker_batch, ((self.seed, epoch, bidx, idxs),)))
                if pending:
                    yield pending.pop(0).get()  # re-raises worker errors
        finally:
            pool.terminate()
            pool.join()

    def _iter_thread(self) -> Iterator[Dict[str, Any]]:
        batches = self._index_batches()
        self.epoch += 1
        pool = ThreadPoolExecutor(max_workers=self.num_workers)
        q: "queue.Queue" = queue.Queue(maxsize=self.prefetch)
        stop = threading.Event()

        def _put(item) -> bool:
            # bounded put that polls the stop event: an abandoned iterator
            # (early break) must not leave this thread blocked forever on a
            # full queue, leaking the pool and a collated batch
            while not stop.is_set():
                try:
                    q.put(item, timeout=0.5)
                    return True
                except queue.Full:
                    continue
            return False

        def produce():
            try:
                for b in batches:
                    if stop.is_set():
                        return
                    samples = list(pool.map(
                        self.dataset.__getitem__, b))
                    if not _put(("ok", collate(samples))):
                        return
            except BaseException as e:
                # a corrupt sample must surface in the training loop, not
                # masquerade as a silently-short epoch
                _put(("err", e))
            finally:
                _put(None)

        t = threading.Thread(target=produce, daemon=True)
        t.start()
        try:
            while True:
                item = q.get()
                if item is None:
                    break
                kind, payload = item
                if kind == "err":
                    raise payload
                yield payload
        finally:
            stop.set()
            pool.shutdown(wait=False)


class DevicePrefetcher:
    """Double-buffers sharded device batches (SURVEY §7.3, VERDICT r1
    item 8): a daemon thread assembles the next host batch AND issues its
    host->device transfer while the current step runs on the device, so the
    step never waits on input assembly or PCIe/tunnel latency.

    Args:
      make_batch: () -> host batch (e.g. merge of the per-source iterators).
      put: host batch -> device batch (e.g. ``shard_batch(mesh, b)``).
      depth: queue depth (2 = classic double buffering).
    """

    def __init__(self, make_batch, put, depth: int = 2):
        self._q: "queue.Queue" = queue.Queue(maxsize=depth)
        self._stop = threading.Event()

        def produce():
            try:
                while not self._stop.is_set():
                    try:
                        item = put(make_batch())
                    except BaseException as e:  # surface on next()
                        # same stop-polling as the ok path: an unbounded
                        # put() on a full queue after close() would hang
                        # this thread forever (and stall close's join)
                        while not self._stop.is_set():
                            try:
                                self._q.put(("err", e), timeout=0.5)
                                break
                            except queue.Full:
                                continue
                        return
                    while not self._stop.is_set():
                        try:
                            self._q.put(("ok", item), timeout=0.5)
                            break
                        except queue.Full:
                            continue
            finally:
                # best-effort sentinel; next() also polls liveness so a full
                # queue here cannot cause a consumer deadlock
                try:
                    self._q.put_nowait(("end", None))
                except queue.Full:
                    pass

        self._t = threading.Thread(target=produce, daemon=True)
        self._t.start()

    def next(self):
        while True:
            try:
                kind, item = self._q.get(timeout=0.5)
            except queue.Empty:
                if not self._t.is_alive():
                    raise RuntimeError(
                        "DevicePrefetcher exhausted: producer thread has "
                        "exited (closed or errored); no further batches "
                        "will arrive")
                continue
            if kind == "err":
                raise item
            if kind == "end":
                raise RuntimeError(
                    "DevicePrefetcher exhausted: producer thread has exited "
                    "(closed or errored); no further batches will arrive")
            return item

    def close(self):
        self._stop.set()
        self._t.join(timeout=5.0)


class InfiniteLoader:
    """Cycles a DataLoader forever (training uses step counts, not epochs;
    reference trainer `max_steps`, refign_hrda_star.yaml:148-161)."""

    def __init__(self, loader: DataLoader):
        self.loader = loader

    def __iter__(self):
        while True:
            yield from self.loader
