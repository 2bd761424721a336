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
