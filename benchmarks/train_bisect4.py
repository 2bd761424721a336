"""Is the grad-SIGILL size-dependent? Sweep model widths; also try remat."""
import sys, os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import time

import jax
import jax.numpy as jnp

from tmdiff_tpu.models import WavBEST
from tmdiff_tpu.models.clip_text import get_prompt_embedding
from tmdiff_tpu.diffusion.schedules import NoiseSchedule
from tmdiff_tpu.diffusion import gaussian

log = open(os.environ.get("BENCH_LOG", "/dev/stdout"), "a")
def P(*a):
    print(*a, file=log, flush=True)

batch, size, bands = 4, 64, 8
ns = NoiseSchedule.create("cosine", 1000)
emb = jnp.asarray(get_prompt_embedding("WV3"))


def try_grad(channels, remat=False):
    model = WavBEST(channels=channels, dtype=jnp.bfloat16)

    @jax.jit
    def init(seed):
        rng = jax.random.key(seed)
        x1 = jnp.zeros((1, bands, size, size), jnp.float32)
        params = model.init(rng, x1, jnp.zeros((1,), jnp.int32),
                            jnp.zeros((1, 1, size, size)), x1, emb)
        res = jax.random.normal(jax.random.fold_in(rng, 1), (batch, bands, size, size))
        pan = jax.random.normal(jax.random.fold_in(rng, 2), (batch, 1, size, size))
        ms = jax.random.normal(jax.random.fold_in(rng, 3), (batch, bands, size, size))
        return params, res, pan, ms

    try:
        params, res, pan, ms = init(0)
        jax.block_until_ready(ms)
        rng = jax.random.key(7)

        apply = model.apply
        if remat:
            apply = jax.checkpoint(model.apply, static_argnums=())

        def loss_fn(p):
            return gaussian.diffusion_loss(
                lambda x, t, pan_, ms_: apply(p, x, t, pan_, ms_, emb),
                ns, rng, res, pan, ms)

        g = jax.jit(jax.value_and_grad(loss_fn))
        t0 = time.perf_counter()
        loss, grads = g(params)
        v = float(loss)
        P(f"grad ch={channels} remat={remat}: ok {time.perf_counter()-t0:.0f}s loss {v:.4f}")
        return True
    except Exception as e:
        P(f"grad ch={channels} remat={remat} FAILED: {type(e).__name__} {str(e)[:90]}")
        return False


for ch in [(4, 8, 8, 16), (16, 32, 64, 128), (32, 64, 128, 256)]:
    ok = try_grad(ch)
    if not ok and ch == (32, 64, 128, 256):
        try_grad(ch, remat=True)
P("done")
