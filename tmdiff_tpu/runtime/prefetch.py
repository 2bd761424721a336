"""Background batch prefetcher.

Overlaps host-side batch assembly (C++ gather kernels, h5 slicing) with
device compute: a worker thread keeps a small bounded queue of ready batches
while the TPU runs the previous step — the role torch DataLoader workers
play in the reference, without process-fork overhead (the heavy byte-moving
runs in native code that releases the GIL).
"""
from __future__ import annotations

import queue
import threading
from typing import Iterator


class Prefetcher:
    def __init__(self, iterator: Iterator, depth: int = 2):
        self._it = iterator
        self._q: queue.Queue = queue.Queue(maxsize=depth)
        self._stop = threading.Event()
        self._thread = threading.Thread(target=self._worker, daemon=True)
        self._thread.start()

    def _worker(self):
        try:
            for item in self._it:
                if self._stop.is_set():
                    return
                self._q.put(item)
        except Exception as exc:  # surface worker errors to the consumer
            self._q.put(exc)
        self._q.put(StopIteration())

    def __iter__(self):
        return self

    def __next__(self):
        item = self._q.get()
        if isinstance(item, StopIteration):
            raise StopIteration
        if isinstance(item, Exception):
            raise item
        return item

    def close(self):
        self._stop.set()
        while not self._q.empty():
            self._q.get_nowait()


class DeviceFeeder:
    """Prefetcher + double-buffered device staging for the train loop.

    Composes two overlaps the reference gets from torch DataLoader worker
    processes + pinned-memory H2D (`data/__init__.py:9-16`):

      * host batch assembly (h5 slicing + the C++ gather kernels, which
        release the GIL) runs on the :class:`Prefetcher` worker thread while
        the device executes the previous step;
      * the *next* batch's `device_put` is issued before the current one is
        handed to the caller — JAX transfers are async, so the H2D for step
        k+1 rides the transfer engine while step k computes.

    `stage_fn(item) -> staged` does the device placement (sharded
    device_put + prompt-embedding lookup); it runs on the CONSUMER thread
    (JAX dispatch is not thread-safe-by-default from worker threads), so
    only the numpy-side assembly is off-thread. Item order is exactly the
    wrapped iterator's order — prefetching never changes the batch sequence
    (bit-reproducible training; pinned by tests/test_runtime.py).

    `depth=0` disables the worker thread (synchronous pull) but keeps the
    one-ahead device staging; use `DeviceFeeder(it, fn, depth=0,
    ahead=False)` for the fully-serial reference behaviour (the A/B
    baseline in benchmarks/train_e2e.py).
    """

    def __init__(self, iterator: Iterator, stage_fn, depth: int = 2,
                 ahead: bool = True):
        self._src = Prefetcher(iterator, depth=depth) if depth > 0 else iterator
        self._stage = stage_fn
        self._ahead = ahead
        self._pending = None

    def __iter__(self):
        return self

    def __next__(self):
        if not self._ahead:
            return self._stage(next(self._src))
        if self._pending is None:
            self._pending = self._stage(next(self._src))
        out = self._pending
        # stage the NEXT item now — its H2D overlaps the device work the
        # caller is about to enqueue on `out`
        self._pending = self._stage(next(self._src))
        return out

    def close(self):
        if isinstance(self._src, Prefetcher):
            self._src.close()
