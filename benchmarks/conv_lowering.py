import sys; sys.path.insert(0, __import__("os").path.dirname(__import__("os").path.dirname(__import__("os").path.abspath(__file__))))
import time, functools, jax, jax.numpy as jnp
import jax.lax as lax
from tmdiff_tpu.ops.modconv import _conv3d_fold2d

log = open("/dev/stdout", "a")
def P(*a): print(*a, file=log, flush=True)

B, D, H, W, C = 8, 8, 256, 256, 32
N_ITER = 20

def bench(name, conv_fn):
    @jax.jit
    def run(seed):
        rng = jax.random.key(seed)
        x = jax.random.normal(rng, (B, D, H, W, C), jnp.bfloat16)
        k = jax.random.normal(jax.random.fold_in(rng, 1), (3, 3, 3, C, C), jnp.bfloat16) * 0.01
        def body(_, v):
            return conv_fn(v, k)
        return jnp.mean(jax.lax.fori_loop(0, N_ITER, body, x))
    t0 = time.perf_counter(); s0 = float(run(0)); c = time.perf_counter()-t0
    t0 = time.perf_counter(); s1 = float(run(1)); d1 = time.perf_counter()-t0
    t0 = time.perf_counter(); s2 = float(run(2)); d2 = time.perf_counter()-t0
    per = min(d1, d2) / N_ITER
    gflop = 2 * B*D*H*W*C*C*27 / 1e9
    P(f"{name}: compile {c:.1f}s, per-conv {per*1e3:.2f}ms, {gflop/per/1000:.1f} TFLOP/s (sink {s1:.4f})")

bench("fold2d", _conv3d_fold2d)
bench("lax3d", lambda x, k: lax.conv_general_dilated(x, k, (1,1,1), "SAME", dimension_numbers=("NDHWC","DHWIO","NDHWC")))
# pure 2D conv reference ceiling (same FLOPs/9 ... use 3x3 over folded batch with 3C in channels to match fold2d's inner op)
def conv2d_ref(x, k):
    xx = x.reshape(B*D, H, W, C)
    kk = k[1]
    y = lax.conv_general_dilated(xx, kk, (1,1), "SAME", dimension_numbers=("NHWC","HWIO","NHWC"))
    return y.reshape(B, D, H, W, C)
bench("conv2d-centeronly(1/3 flops)", conv2d_ref)
P("done")
