"""r5 conv auto-rule A/B at the BIG config's hot shapes (VERDICT r4 weak #3).

The r4 rule routes deep-band C>=64 levels to the native lax 3-D conv,
tuned on the flagship's C64 level at H=128 (isolated 5.09 vs 5.36 ms).
The big config [64,128,256,512] has its C64 level at FULL resolution
(H=256, and the headline row runs batch 4), where that A/B was never
measured — and the r4 headline re-measure showed 10.36 -> 10.09 steps/s,
i.e. the flip plausibly LOSES there. This grid measures bandlanes vs
native at the exact disputed shapes so `_bandlanes_wins` can key on a
measured per-shape table instead of a flagship heuristic:

  (8, 8, 128, 128, 64)  flagship L1  — r4 decision point (expect native)
  (8, 8, 256, 256, 64)  big L0 @bench batch 8
  (4, 8, 256, 256, 64)  big L0 @headline batch 4

Methodology: transfer-free (on-device init, fori-chained, scalar sink).
"""
import sys, os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import time

import jax
import jax.numpy as jnp
import jax.lax as lax

from tmdiff_tpu.ops.modconv import _conv3d_bandlanes

N_ITER = 20

lax3d = lambda x, k: lax.conv_general_dilated(
    x, k, (1, 1, 1), "SAME", dimension_numbers=("NDHWC", "DHWIO", "NDHWC"))


def bench(name, fn, B, D, H, W, C):
    @jax.jit
    def run(seed):
        rng = jax.random.key(seed)
        x = jax.random.normal(rng, (B, D, H, W, C), jnp.bfloat16)
        k = jax.random.normal(
            jax.random.fold_in(rng, 1), (3, 3, 3, C, C), jnp.bfloat16) * 0.02
        return jnp.mean(lax.fori_loop(0, N_ITER, lambda _, v: fn(v, k), x))

    t0 = time.perf_counter(); float(run(0)); c = time.perf_counter() - t0
    ds = []
    for s in (1, 2):
        t0 = time.perf_counter(); float(run(s)); ds.append(time.perf_counter() - t0)
    per = min(ds) / N_ITER
    alg = 2 * B * D * H * W * 27 * C * C
    print(f"{name} B{B} D{D} {H}x{W} C{C}: compile {c:.0f}s, "
          f"{per * 1e3:.2f}ms, alg {alg / per / 1e12:.1f} TFLOP/s", flush=True)
    return per


for (B, D, H, W, C) in [(8, 8, 128, 128, 64),
                        (8, 8, 256, 256, 64),
                        (4, 8, 256, 256, 64)]:
    t_bl = bench("bandlanes", _conv3d_bandlanes, B, D, H, W, C)
    t_nat = bench("lax native", lax3d, B, D, H, W, C)
    print(f"  -> winner at B{B} {H}x{W} C{C}: "
          f"{'bandlanes' if t_bl < t_nat else 'native'} "
          f"({min(t_bl, t_nat) / max(t_bl, t_nat):.2f}x)", flush=True)
print("done")
