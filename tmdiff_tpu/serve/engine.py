"""Production inference engine: dynamic request batching over a persistent
compiled sampler.

The reference has no serving story — its val loop (`/root/reference/
general_sharpening_joint_random_batch_finetune.py:126-152`) runs the sampler
batch-1 with a fresh Python dispatch per NFE. On TPU the economics invert:
the sampler is ONE compiled program whose cost is dominated by how full the
batch is, and compiles are expensive (minutes through the dev tunnel), so a
server must (a) never recompile in steady state and (b) coalesce concurrent
requests into full batches.

Design:
  * requests (one image each) are grouped by MS shape — sensors mix freely
    within a batch (per-sample prompt embeddings; the reference can only run
    one sensor per batch) — one compiled program per (shape bucket, sampler
    config), cached by the underlying `Pansharpener`;
  * batches are padded up to a fixed bucket size (default powers of two up
    to `max_batch`) by edge-replicating the last request, so the number of
    distinct compiled programs is bounded and known ahead of time
    (`warmup()` precompiles them before traffic arrives);
  * a single worker thread owns the device: it drains the queue, waits at
    most `max_delay_ms` after the first request for co-batchable traffic,
    runs the sampler, and resolves per-request futures. One device program
    in flight at a time — matching a single-chip serving cell; scale-out is
    N processes behind a load balancer or a ("data",) mesh inside one cell.
"""
from __future__ import annotations

import dataclasses
import queue
import threading
import time
from concurrent.futures import Future
from typing import Optional, Sequence

import numpy as np


@dataclasses.dataclass
class _Request:
    pan: np.ndarray  # (1, H, W)
    ms: np.ndarray  # (bands, H, W)
    sensor: str
    future: Future
    enqueued_at: float
    guidance: Optional[float] = None  # CFG scale; None = engine default


class EngineOverloaded(RuntimeError):
    """Raised by submit() when the pending queue exceeds `max_queue` —
    backpressure for the HTTP layer to surface as 503 instead of letting
    latency grow without bound."""


def _bucket(n: int, buckets: Sequence[int]) -> int:
    for b in buckets:
        if n <= b:
            return b
    return buckets[-1]


@dataclasses.dataclass
class InferenceEngine:
    """Batches concurrent pansharpening requests onto one compiled sampler.

    `sharp` is a `tmdiff_tpu.pipeline.Pansharpener` (model + params +
    schedule). `submit()` is thread-safe and returns a `Future` resolving to
    the (bands, H, W) sharpened image in [0, 1].
    """

    sharp: object
    method: str = "dpm++"
    steps: Optional[int] = None
    guidance: float = 3.0  # default CFG scale (dpm++_cfg only)
    max_batch: int = 8
    max_delay_ms: float = 15.0
    buckets: Optional[Sequence[int]] = None
    max_queue: Optional[int] = None  # pending-request bound; None = unbounded
    # extra sampler kwargs forwarded verbatim to Pansharpener.sample — the
    # deployment surface for method-specific knobs (e.g. ddim_cached's
    # refresh_every / cache_level / forecast). Part of the compile key
    # downstream, so fixed per engine.
    sampler_kw: Optional[dict] = None

    def __post_init__(self):
        if self.buckets is None:
            b, bs = 1, []
            while b < self.max_batch:
                bs.append(b)
                b *= 2
            self.buckets = tuple(bs) + (self.max_batch,)
        self._queue: "queue.Queue[Optional[_Request]]" = queue.Queue()
        self._seed = 0
        self._lock = threading.Lock()
        self.stats = {
            "requests": 0,
            "batches": 0,
            "padded_slots": 0,
            "batch_size_hist": {},
            "latency_ms_sum": 0.0,
            "rejected": 0,  # present from t=0 so /v1/stats schema is stable
        }
        self._worker = threading.Thread(target=self._run, daemon=True)
        self._worker.start()

    # -- public API ----------------------------------------------------------

    def submit(self, pan, ms, sensor: str = "QB",
               guidance: Optional[float] = None) -> Future:
        """`guidance` (dpm++_cfg engines only) overrides the engine default
        per request; mixed scales co-batch — guidance rides as a per-sample
        (B,) vector into ONE compiled sampler (pipeline.py)."""
        pan = np.asarray(pan, np.float32)
        ms = np.asarray(ms, np.float32)
        if pan.ndim == 2:
            pan = pan[None]
        if pan.ndim != 3 or ms.ndim != 3:
            raise ValueError(
                f"submit() takes one image per request: pan (1,H,W), "
                f"ms (bands,H,W); got {pan.shape} / {ms.shape}"
            )
        if pan.shape[-2:] != ms.shape[-2:]:
            # reject early: a mismatched request must not reach _execute,
            # where np.stack would fail the whole co-batched group
            raise ValueError(
                f"pan spatial dims {pan.shape[-2:]} must match ms "
                f"{ms.shape[-2:]} (ms is the upsampled LMS)"
            )
        if guidance is not None and self.method != "dpm++_cfg":
            # guidance only affects the CFG sampler; silently ignoring it
            # would let a client believe it swept scales on a ddim/dpm++
            # deployment
            raise ValueError(
                f"guidance= is only meaningful on a dpm++_cfg engine "
                f"(this engine runs {self.method!r})"
            )
        if self.max_queue is not None and self._queue.qsize() >= self.max_queue:
            self.stats["rejected"] += 1
            raise EngineOverloaded(
                f"pending queue at limit ({self.max_queue}); retry later"
            )
        fut: Future = Future()
        self._queue.put(
            _Request(pan, ms, sensor, fut, time.monotonic(), guidance))
        return fut

    def warmup(self, shapes: Sequence[tuple[int, int, int]],
               sensor: str = "QB") -> None:
        """Precompile every (shape, bucket) program before serving traffic.

        `shapes` are (bands, H, W) tuples. Compilation happens through the
        normal submit path so the cache keys are identical to production's
        (sensor identity doesn't affect the compiled program — embeddings are
        runtime data). Each bucket's batch is submitted and AWAITED
        separately — submitting everything at once would let the worker
        coalesce across buckets and only ever compile the largest one.
        """
        for bands, h, w in shapes:
            ms = np.zeros((bands, h, w), np.float32)
            pan = np.zeros((1, h, w), np.float32)
            for b in self.buckets:
                futs = [self.submit(pan, ms, sensor) for _ in range(b)]
                for f in futs:
                    f.result()

    def shutdown(self) -> None:
        self._queue.put(None)
        self._worker.join(timeout=60)

    # -- worker ----------------------------------------------------------------

    def _run(self):
        while True:
            req = self._queue.get()
            if req is None:
                return
            group = [req]
            # co-batchable = same MS shape; sensors may mix freely (the
            # sampler takes per-sample prompt embeddings), which keeps batch
            # occupancy high under heterogeneous-sensor traffic
            key = req.ms.shape
            deadline = time.monotonic() + self.max_delay_ms / 1e3
            leftovers = []
            while len(group) < self.max_batch:
                timeout = deadline - time.monotonic()
                if timeout <= 0:
                    break
                try:
                    nxt = self._queue.get(timeout=timeout)
                except queue.Empty:
                    break
                if nxt is None:
                    # shutting down: don't re-queue leftovers into the dead
                    # queue — run the collected group, fail the rest directly
                    self._execute(group, [])
                    for r in leftovers:
                        if not r.future.done():
                            r.future.set_exception(
                                RuntimeError("engine shut down"))
                    return
                if nxt.ms.shape == key:
                    group.append(nxt)
                else:
                    leftovers.append(nxt)
            self._execute(group, leftovers)

    def _execute(self, group: list, leftovers: list):
        # non-co-batchable requests observed while collecting go back first,
        # preserving arrival order ahead of anything newly enqueued (under the
        # queue mutex — producers may be put()ing concurrently; no notify is
        # needed because the sole consumer is this thread)
        with self._queue.mutex:
            for r in reversed(leftovers):
                self._queue.queue.appendleft(r)
        try:
            n = len(group)
            b = _bucket(n, self.buckets)
            pan = np.stack([r.pan for r in group] + [group[-1].pan] * (b - n))
            ms = np.stack([r.ms for r in group] + [group[-1].ms] * (b - n))
            with self._lock:
                seed = self._seed
                self._seed += 1
            sensors = [r.sensor for r in group] + [group[-1].sensor] * (b - n)
            kw = dict(self.sampler_kw or {})
            if self.method == "dpm++_cfg":
                # per-sample guidance vector: requests at different scales
                # share the batch AND the compiled program (scalar vs vector
                # guidance is the only retrace boundary, so non-CFG engines
                # keep the scalar signature direct callers use)
                gvec = [r.guidance if r.guidance is not None else self.guidance
                        for r in group]
                kw["guidance"] = np.asarray(
                    gvec + [gvec[-1]] * (b - n), np.float32)
            out = self.sharp.sample(
                {"PAN": pan, "MS": ms}, sensor=sensors,
                method=self.method, steps=self.steps, seed=seed, **kw,
            )
            now = time.monotonic()
            self.stats["requests"] += n
            self.stats["batches"] += 1
            self.stats["padded_slots"] += b - n
            hist = self.stats["batch_size_hist"]
            hist[n] = hist.get(n, 0) + 1
            for i, r in enumerate(group):
                self.stats["latency_ms_sum"] += (now - r.enqueued_at) * 1e3
                r.future.set_result(np.asarray(out[i]))
        except Exception as err:  # resolve, don't kill the worker
            for r in group:
                if not r.future.done():
                    r.future.set_exception(err)
