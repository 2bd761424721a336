"""A/B microbench of 3-D conv lowerings on the real TPU.

Shapes are the WavBEST hot levels (BASELINE.md per-op table): the outer
C=32 @ 256² and C=64 @ 128² levels are MXU-lane-bound under the batch-folded
lowering (Cout of 128 lanes); the band-into-lanes lowering trades D/kd× FLOPs
for full lanes. Run on the TPU tunnel — one process at a time (CLAUDE.md).
"""
import sys, os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import time

import jax
import jax.numpy as jnp
import jax.lax as lax

from tmdiff_tpu.ops.modconv import _conv3d_fold2d, _conv3d_bandlanes

log = open(os.environ.get("BENCH_LOG", "/dev/stdout"), "a")
def P(*a):
    print(*a, file=log, flush=True)

N_ITER = 20


def bench(name, conv_fn, B, D, H, W, C, kd=3):
    Cout = C  # iterations chain through data dependencies, so Cout == Cin

    @jax.jit
    def run(seed):
        rng = jax.random.key(seed)
        x = jax.random.normal(rng, (B, D, H, W, C), jnp.bfloat16)
        k = jax.random.normal(
            jax.random.fold_in(rng, 1), (kd, 3, 3, C, Cout), jnp.bfloat16
        ) * 0.01
        return jnp.mean(
            jax.lax.fori_loop(0, N_ITER, lambda _, v: conv_fn(v, k), x)
        )

    t0 = time.perf_counter(); s0 = float(run(0)); c = time.perf_counter() - t0
    t0 = time.perf_counter(); s1 = float(run(1)); d1 = time.perf_counter() - t0
    t0 = time.perf_counter(); s2 = float(run(2)); d2 = time.perf_counter() - t0
    per = min(d1, d2) / N_ITER
    gflop = 2 * B * D * H * W * C * Cout * 9 * kd / 1e9  # true (compact) FLOPs
    P(f"{name} B{B} D{D} {H}x{W} C{C}->{Cout} kd{kd}: compile {c:.1f}s, "
      f"per-conv {per*1e3:.2f}ms, {gflop/per/1000:.1f} TFLOP/s-effective "
      f"(sink {s1:.4f})")


lax3d = lambda x, k: lax.conv_general_dilated(
    x, k, (1, 1, 1), "SAME", dimension_numbers=("NDHWC", "DHWIO", "NDHWC"))

# Outer level: C=32 @ 256², 8-band (bandlanes predicted 3.4× win)
for name, fn in [("fold2d", _conv3d_fold2d), ("bandlanes", _conv3d_bandlanes)]:
    bench(name, fn, B=8, D=8, H=256, W=256, C=32)
# Second level: C=64 @ 128², 8-band (heuristic says fold2d; check)
for name, fn in [("fold2d", _conv3d_fold2d), ("bandlanes", _conv3d_bandlanes)]:
    bench(name, fn, B=8, D=8, H=128, W=128, C=64)
# 4-band variants (QB/GF2 models): both outer levels predicted bandlanes wins
for name, fn in [("fold2d", _conv3d_fold2d), ("bandlanes", _conv3d_bandlanes)]:
    bench(name, fn, B=8, D=4, H=256, W=256, C=32)
for name, fn in [("fold2d", _conv3d_fold2d), ("bandlanes", _conv3d_bandlanes)]:
    bench(name, fn, B=8, D=4, H=128, W=128, C=64)
P("done")
