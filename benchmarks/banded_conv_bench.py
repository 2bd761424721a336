"""Fused band-banded Pallas conv vs the shipped lowerings (VERDICT r3 #1).

Isolated A/B at the model's two hot multi-tap levels (8-band flagship):
  level0: (8, 8, 256, 256, 32) -> 32   bandlanes infl 2.67x, banded 2.00x
  level1: (8, 8, 128, 128, 64) -> 64   bandlanes infl 2.67x, banded 1.33x

Variants: bandlanes (shipped auto), bandtiles (XLA tile loop — the r2
negative result), banded Pallas (bh 8/16), native lax 3-D. All chained
through data dependencies per the transfer-free methodology (CLAUDE.md).
Reports ms/conv + algorithmic TFLOP/s (useful-FLOP rate: what matters for
the headline) and executed TFLOP/s per variant's own inflation.
"""
import sys, os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import time

import jax
import jax.numpy as jnp
import jax.lax as lax

from tmdiff_tpu.ops.modconv import (
    _conv3d_bandlanes, _conv3d_bandtiles, _conv3d_fold2d)
from tmdiff_tpu.ops.pallas.banded_conv3d import banded_conv3d, banded_conv3d_v2

log = open(os.environ.get("BENCH_LOG", "/dev/stdout"), "a")
def P(*a):
    print(*a, file=log, flush=True)

N_ITER = 20


def bench(name, fn, B, D, H, W, C, infl):
    @jax.jit
    def run(seed):
        rng = jax.random.key(seed)
        x = jax.random.normal(rng, (B, D, H, W, C), jnp.bfloat16)
        k = jax.random.normal(
            jax.random.fold_in(rng, 1), (3, 3, 3, C, C), jnp.bfloat16) * 0.02
        return jnp.mean(lax.fori_loop(0, N_ITER, lambda _, v: fn(v, k), x))

    try:
        t0 = time.perf_counter(); float(run(0)); c = time.perf_counter() - t0
        ds = []
        for s in (1, 2):
            t0 = time.perf_counter(); float(run(s)); ds.append(time.perf_counter() - t0)
        per = min(ds) / N_ITER
        alg = 2 * B * D * H * W * 27 * C * C  # algorithmic (kd*kh*kw taps)
        P(f"{name} B{B} D{D} {H}x{W} C{C}: compile {c:.0f}s, {per*1e3:.2f}ms, "
          f"alg {alg/per/1e12:.1f} TFLOP/s, exec {alg*infl/per/1e12:.1f} "
          f"(infl {infl:.2f}x)")
    except Exception as e:
        P(f"{name} B{B} D{D} {H}x{W} C{C} FAILED: "
          f"{type(e).__name__} {str(e)[:200]}")


lax3d = lambda x, k: lax.conv_general_dilated(
    x, k, (1, 1, 1), "SAME", dimension_numbers=("NDHWC", "DHWIO", "NDHWC"))

for (B, D, H, W, C) in [(8, 8, 256, 256, 32), (8, 8, 128, 128, 64)]:
    tile_d = 128 // C
    infl_banded = (tile_d + 2) / 3 * (-(-D // tile_d) * tile_d / D)
    only = os.environ.get("TMDIFF_BENCH_ONLY")  # e.g. "v2": pallas-only rerun
    if only != "v2":
        bench("bandlanes", _conv3d_bandlanes, B, D, H, W, C, D / 3)
        bench("bandtiles",
              lambda x, k: _conv3d_bandtiles(x, k, 128 // k.shape[-1]),
              B, D, H, W, C, infl_banded)
        for bh in (8, 16):
            bench(f"banded-pallas bh{bh}",
                  lambda x, k, bh=bh: banded_conv3d(x, k, bh, False),
                  B, D, H, W, C, infl_banded)
    for bh in (8, 16):
        bench(f"banded-pallas-v2 bh{bh}",
              lambda x, k, bh=bh: banded_conv3d_v2(x, k, bh, False),
              B, D, H, W, C, infl_banded)
    if only == "v2":
        continue
    bench("lax native", lax3d, B, D, H, W, C, 1.0)
    bench("fold2d", _conv3d_fold2d, B, D, H, W, C, 1.0)
P("done")
