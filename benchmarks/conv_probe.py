"""Probe: where does bandlanes conv time go? (v5e via tunnel)

a) bandlanes as shipped: (B,D,H,W,C) in/out — includes 2 layout transposes
b) bandlanes core: input/output already (B,H,W,D*C) — pure conv + banding
c) pure dense conv, no kernel banding — the XLA conv roofline at D*C channels
d) XLA native 3-D conv with band as the LAST spatial dim, (B,H,W,D,C)
   dimension numbers — the inner-level candidate layout
"""
import sys, os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import time
import jax, jax.numpy as jnp, jax.lax as lax
from tmdiff_tpu.ops.modconv import _conv3d_bandlanes
import numpy as np

log = open(os.environ.get("BENCH_LOG", "/dev/stdout"), "a")
def P(*a):
    print(*a, file=log, flush=True)

N_ITER = 20


def run_bench(name, make_x, conv_fn, flops):
    @jax.jit
    def run(seed):
        rng = jax.random.key(seed)
        x = make_x(rng)
        return jnp.mean(jax.lax.fori_loop(0, N_ITER, lambda _, v: conv_fn(v, rng), x))
    t0 = time.perf_counter(); run(0); c = time.perf_counter() - t0
    ds = []
    for s in (1, 2):
        t0 = time.perf_counter(); float(run(s)); ds.append(time.perf_counter() - t0)
    per = min(ds) / N_ITER
    P(f"{name}: compile {c:.0f}s per-op {per*1e3:.2f}ms eff {flops/per/1e12:.1f} TFLOP/s")


def banded_kernel(kc, d, kd, c):
    pad = kd // 2
    din = np.arange(d)[:, None]; dout = np.arange(d)[None, :]
    idx = din - dout + pad
    valid = (0 <= idx) & (idx < kd)
    kg = kc[np.clip(idx, 0, kd - 1)]
    kg = kg * jnp.asarray(valid, kc.dtype)[:, :, None, None, None, None]
    return kg.transpose(2, 3, 0, 4, 1, 5).reshape(3, 3, d * c, d * c)


for (D, C, H) in [(8, 32, 256), (8, 64, 128)]:
    B = 8
    true_flops = 2 * B * D * H * H * C * C * 27

    def kparam(rng, c=C):
        return jax.random.normal(jax.random.fold_in(rng, 1), (3, 3, 3, c, c), jnp.bfloat16) * 0.01

    # a) shipped (with transposes)
    run_bench(
        f"a D{D} C{C} {H}² shipped",
        lambda rng, d=D, c=C, h=H: jax.random.normal(rng, (B, d, h, h, c), jnp.bfloat16),
        lambda v, rng: _conv3d_bandlanes(v, kparam(rng)),
        true_flops,
    )

    # b) core: flat layout in/out, banding included
    def core(v, rng, d=D, c=C):
        w2 = banded_kernel(kparam(rng), d, 3, c)
        return lax.conv_general_dilated(v, w2, (1, 1), "SAME",
                                        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    run_bench(
        f"b D{D} C{C} {H}² flat+banding",
        lambda rng, d=D, c=C, h=H: jax.random.normal(rng, (B, h, h, d * c), jnp.bfloat16),
        core, true_flops,
    )

    # c) pure dense conv roofline at D*C channels (no banding)
    def dense(v, rng, d=D, c=C):
        w = jax.random.normal(jax.random.fold_in(rng, 2), (3, 3, d * c, d * c), jnp.bfloat16) * 0.01
        return lax.conv_general_dilated(v, w, (1, 1), "SAME",
                                        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    run_bench(
        f"c D{D} C{C} {H}² dense-roofline",
        lambda rng, d=D, c=C, h=H: jax.random.normal(rng, (B, h, h, d * c), jnp.bfloat16),
        dense, 2 * B * H * H * 9 * (D * C) ** 2,
    )

# d) inner level: XLA native with band-last spatial dims (B,H,W,D,C)
for (D, C, H) in [(8, 128, 64), (8, 256, 32)]:
    B = 8
    true_flops = 2 * B * D * H * H * C * C * 27

    def kp5(rng, c=C):
        return jax.random.normal(jax.random.fold_in(rng, 1), (3, 3, 3, c, c), jnp.bfloat16) * 0.01

    def native_hwd(v, rng, c=C):
        k = kp5(rng).transpose(1, 2, 0, 3, 4)  # (kh,kw,kd,cin,cout)
        return lax.conv_general_dilated(v, k, (1, 1, 1), "SAME",
                                        dimension_numbers=("NHWDC", "HWDIO", "NHWDC"))
    run_bench(
        f"d D{D} C{C} {H}² native-NHWDC",
        lambda rng, d=D, c=C, h=H: jax.random.normal(rng, (B, h, h, d, c), jnp.bfloat16),
        native_hwd, true_flops,
    )

    def fold2d_from_hwdc(v, rng, c=C, d=D, h=H):
        k = kp5(rng)
        x = v.transpose(0, 3, 1, 2, 4)  # (B,D,H,W,C)
        from tmdiff_tpu.ops.modconv import _conv3d_fold2d
        y = _conv3d_fold2d(x, k)
        return y.transpose(0, 2, 3, 1, 4)
    run_bench(
        f"d D{D} C{C} {H}² fold2d+transposes",
        lambda rng, d=D, c=C, h=H: jax.random.normal(rng, (B, h, h, d, c), jnp.bfloat16),
        fold2d_from_hwdc, true_flops,
    )
P("done")
