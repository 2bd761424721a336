"""Cross-step block caching (ddim_cached) throughput at flagship shapes.

Measures 20-step DDIM with the deep trunk (down3 + middle) refreshed every
r-th NFE vs the plain sampler (r=1). The shallow path skips the deepest
stage's convs; algorithmic saving per reused NFE is the down3+middle share
of the denoise cost (printed via HLO cost analysis on the reuse vs full
graphs). Transfer-free protocol as bench.py: on-device init, scalar-sink
sync. Quality cost is measured separately on the converged checkpoint
(tools/block_cache_eval.py).
"""
import sys, os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import time

import jax
import jax.numpy as jnp

from tmdiff_tpu.models import WavBEST
from tmdiff_tpu.models.clip_text import get_prompt_embedding
from tmdiff_tpu.diffusion import gaussian
from tmdiff_tpu.diffusion.schedules import NoiseSchedule

B = int(os.environ.get("TMDIFF_BENCH_BATCH", "8"))
H = W = int(os.environ.get("TMDIFF_BENCH_SIZE", "256"))
bands = int(os.environ.get("TMDIFF_BENCH_BANDS", "8"))
CHANNELS = tuple(int(c) for c in os.environ.get(
    "TMDIFF_BENCH_CHANNELS", "32,64,128,256").split(","))
STEPS = 20
model = WavBEST(channels=CHANNELS, dtype=jnp.bfloat16)
emb = jnp.asarray(get_prompt_embedding("WV3"))
ns = NoiseSchedule.create("cosine", 500)


def build(refresh_every: int, level: int = 1, forecast: bool = False,
          mask=None, traced_mask=None):
    # traced_mask goes in as a jit ARGUMENT (runtime data -> the cond-scan
    # search program); a concrete `mask` specializes the compiled program.
    @jax.jit
    def run(seed, tmask=None):
        rng = jax.random.key(seed)
        x1 = jnp.zeros((1, bands, H, W), jnp.float32)
        params = model.init(rng, x1, jnp.zeros((1,), jnp.int32),
                            jnp.zeros((1, 1, H, W)), x1, emb)
        pan = jax.random.normal(jax.random.fold_in(rng, 1), (B, 1, H, W))
        ms = jax.random.normal(jax.random.fold_in(rng, 2), (B, bands, H, W))
        cache = model.apply(params, pan, ms, emb,
                            method=model.encode_condition)
        if refresh_every == 1:
            fn = lambda x, t, *_: model.apply(params, x, t, cache,
                                              method=model.denoise)
            out = gaussian.ddim_sample(
                fn, ns, jax.random.fold_in(rng, 3),
                None, None, (B, bands, H, W), steps=STEPS)
        else:
            full = lambda x, t: model.apply(
                params, x, t, cache, cache_level=level,
                method=model.denoise_deep)
            reuse = lambda x, t, deep: model.apply(
                params, x, t, cache, deep, cache_level=level,
                method=model.denoise_reuse)
            out = gaussian.ddim_sample_blockcached(
                full, reuse, ns, jax.random.fold_in(rng, 3),
                None, None, (B, bands, H, W), steps=STEPS,
                refresh_every=refresh_every, forecast=forecast,
                refresh_mask=tmask if tmask is not None else mask)
        return jnp.mean(out)
    if traced_mask is not None:
        arr = jnp.asarray(traced_mask)
        return lambda seed: run(seed, arr)
    return run


# rows as r:level:forecast triples; override via TMDIFF_BENCH_ROWS, e.g.
# "1:1:0,2:3:0,4:3:0,4:3:1" to bench the level-3 / forecast variants only.
# TMDIFF_BENCH_MASK="0.4.8.12.15.17.19:3" appends one schedule-aware row
# (refresh indices '.'-joined : cache_level). The mask is concrete here, so
# it measures the SPECIALIZED program (runs of full/reuse scans — the
# deployment path); set TMDIFF_BENCH_MASK_TRACED=1 to measure the traced-
# mask cond-scan program instead (what schedule search runs against).
ROWS = os.environ.get("TMDIFF_BENCH_ROWS",
                      "1:1:0,2:1:0,4:1:0,2:2:0,4:2:0")
jobs = []
for row in (r for r in ROWS.split(",") if r):
    r, level, fc = (int(v) for v in row.split(":"))
    jobs.append((f"refresh_every={r} level={level} forecast={fc}",
                 build(r, level, bool(fc))))
if os.environ.get("TMDIFF_BENCH_MASK"):
    idx_s, level_s = os.environ["TMDIFF_BENCH_MASK"].split(":")
    idx = [int(v) for v in idx_s.split(".")]
    mask = [i in idx for i in range(STEPS)]
    traced = bool(os.environ.get("TMDIFF_BENCH_MASK_TRACED"))
    jobs.append((f"mask={idx} level={level_s} "
                 f"({'traced' if traced else 'specialized'})",
                 build(0, int(level_s),
                       mask=None if traced else mask,
                       traced_mask=mask if traced else None)))
for label, run in jobs:
    t0 = time.perf_counter(); s = float(run(0)); c = time.perf_counter() - t0
    t0 = time.perf_counter(); s = float(run(1)); d = time.perf_counter() - t0
    print(f"ddim_cached steps={STEPS} {label}: "
          f"compile {c:.0f}s, sample {d:.2f}s -> "
          f"{B / d:.2f} img/s/chip (sink {s:.3f})", flush=True)
print("done")
