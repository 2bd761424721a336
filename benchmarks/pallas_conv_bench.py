"""Pallas halo-strip conv vs XLA conv at the band-folded hot shapes."""
import sys, os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import time

import jax
import jax.numpy as jnp
import jax.lax as lax

from tmdiff_tpu.ops.pallas.conv2d import conv3x3_nhwc

log = open(os.environ.get("BENCH_LOG", "/dev/stdout"), "a")
def P(*a):
    print(*a, file=log, flush=True)

N_ITER = 20


def bench(name, fn, B, H, W, C, bh=None):
    @jax.jit
    def run(seed):
        rng = jax.random.key(seed)
        x = jax.random.normal(rng, (B, H, W, C), jnp.bfloat16)
        k = jax.random.normal(jax.random.fold_in(rng, 1), (3, 3, C, C), jnp.bfloat16) * 0.02
        return jnp.mean(jax.lax.fori_loop(0, N_ITER, lambda _, v: fn(v, k), x))
    try:
        t0 = time.perf_counter(); s0 = float(run(0)); c = time.perf_counter() - t0
        ds = []
        for s in (1, 2):
            t0 = time.perf_counter(); float(run(s)); ds.append(time.perf_counter() - t0)
        per = min(ds) / N_ITER
        fl = 2 * B * H * W * 9 * C * C
        P(f"{name} B{B} {H}x{W} C{C}: compile {c:.0f}s, {per*1e3:.2f}ms, {fl/per/1e12:.1f} TFLOP/s")
    except Exception as e:
        P(f"{name} B{B} {H}x{W} C{C} FAILED: {type(e).__name__} {str(e)[:150]}")


xla = lambda x, k: lax.conv_general_dilated(
    x, k, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC"))

for (B, H, W, C) in [(8, 256, 256, 256), (8, 128, 128, 512)]:
    bench("xla", xla, B, H, W, C)
    for bh in (8, 16, 32):
        bench(f"pallas bh{bh}", lambda x, k, bh=bh: conv3x3_nhwc(x, k, block_h=bh, interpret=False), B, H, W, C)
P("done")
