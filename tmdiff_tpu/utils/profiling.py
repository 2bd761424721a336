"""Tracing, throughput counters, and cost analysis.

The reference has essentially no observability (ad-hoc time.time() prints,
`general_…finetune.py:131-147`, and broken thop FLOPs scripts,
`utils/counter_flops_params.py`). Here these are first-class:

  * `trace(logdir)` — context manager around `jax.profiler` (XLA traces
    viewable in TensorBoard/Perfetto/XProf);
  * `Throughput` — steps/sec (/chip) + images/sec EMA counters for train
    loops (the BASELINE.md headline numbers);
  * `cost_analysis(fn, *args)` — compiled-HLO FLOPs / bytes-accessed from
    XLA itself (replaces thop estimates with compiler ground truth);
  * `param_count(params)` — trainable parameter count.
"""
from __future__ import annotations

import contextlib
import time
from typing import Optional

import jax
import numpy as np


@contextlib.contextmanager
def trace(logdir: str):
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class Throughput:
    """EMA throughput tracker: call .step(n_images) once per train step."""

    def __init__(self, ema: float = 0.95):
        self.ema = ema
        self._last: Optional[float] = None
        self.steps_per_sec = 0.0
        self.images_per_sec = 0.0
        self.total_steps = 0

    def step(self, n_images: int = 0):
        now = time.perf_counter()
        if self._last is not None:
            dt = max(now - self._last, 1e-9)
            sps = 1.0 / dt
            ips = n_images / dt
            if self.total_steps <= 1:
                self.steps_per_sec, self.images_per_sec = sps, ips
            else:
                self.steps_per_sec = self.ema * self.steps_per_sec + (1 - self.ema) * sps
                self.images_per_sec = self.ema * self.images_per_sec + (1 - self.ema) * ips
        self._last = now
        self.total_steps += 1

    def per_chip(self) -> dict:
        n = jax.device_count()
        return {
            "steps_per_sec": self.steps_per_sec,
            "steps_per_sec_per_chip": self.steps_per_sec / n,
            "images_per_sec": self.images_per_sec,
            "images_per_sec_per_chip": self.images_per_sec / n,
        }


def cost_analysis(fn, *args, **kwargs) -> dict:
    """XLA compiler cost analysis of jit(fn)(*args): flops, bytes accessed."""
    compiled = jax.jit(fn).lower(*args, **kwargs).compile()
    costs = compiled.cost_analysis()
    if isinstance(costs, list):  # per-device list on some backends
        costs = costs[0]
    return {
        "flops": float(costs.get("flops", -1)),
        "bytes_accessed": float(costs.get("bytes accessed", -1)),
        "transcendentals": float(costs.get("transcendentals", -1)),
    }


def param_count(params) -> int:
    return int(sum(np.prod(p.shape) for p in jax.tree.leaves(params)))
