"""Bisect which construct SIGILLs the tunnel's remote-compile helper in the
fused train step, and get a steady-state number from the largest variant
that compiles. Variants:
  A: scan-chained loss+grad+AdamW (no EMA)
  B: single step loss+grad+AdamW+EMA (no scan)
  C: single step loss+grad+AdamW (r1: compiled)
"""
import sys, os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import time

import jax
import jax.numpy as jnp
import optax

from tmdiff_tpu.models import WavBEST
from tmdiff_tpu.models.clip_text import get_prompt_embedding
from tmdiff_tpu.diffusion.schedules import NoiseSchedule
from tmdiff_tpu.diffusion import gaussian

log = open(os.environ.get("BENCH_LOG", "/dev/stdout"), "a")
def P(*a):
    print(*a, file=log, flush=True)

batch, size, bands, K = 4, 64, 8, 8
model = WavBEST(channels=(32, 64, 128, 256), dtype=jnp.bfloat16)
ns = NoiseSchedule.create("cosine", 1000)
emb = jnp.asarray(get_prompt_embedding("WV3"))
tx = optax.adamw(1e-4, weight_decay=1e-4)


def setup(rng):
    x1 = jnp.zeros((1, bands, size, size), jnp.float32)
    params = model.init(rng, x1, jnp.zeros((1,), jnp.int32),
                        jnp.zeros((1, 1, size, size)), x1, emb)
    opt_state = tx.init(params)
    res = jax.random.normal(jax.random.fold_in(rng, 1), (batch, bands, size, size))
    pan = jax.random.normal(jax.random.fold_in(rng, 2), (batch, 1, size, size))
    ms = jax.random.normal(jax.random.fold_in(rng, 3), (batch, bands, size, size))
    return params, opt_state, res, pan, ms


def loss_fn(p, step_rng, res, pan, ms):
    return gaussian.diffusion_loss(
        lambda x, t, pan_, ms_: model.apply(p, x, t, pan_, ms_, emb),
        ns, step_rng, res, pan, ms)


def trial(name, build):
    try:
        fn = jax.jit(build())
        t0 = time.perf_counter(); float(fn(0)); c = time.perf_counter() - t0
        ds = []
        for s in (1, 2):
            t0 = time.perf_counter(); float(fn(s)); ds.append(time.perf_counter() - t0)
        P(f"{name}: compile {c:.0f}s, best {min(ds)*1e3:.0f}ms")
    except Exception as e:
        P(f"{name} FAILED: {type(e).__name__} {str(e)[:100]}")


def variant_A():
    def run(seed):
        rng = jax.random.key(seed)
        params, opt_state, res, pan, ms = setup(rng)

        def step(carry, i):
            params, opt_state = carry
            loss, grads = jax.value_and_grad(loss_fn)(
                params, jax.random.fold_in(rng, 100 + i), res, pan, ms)
            updates, opt_state = tx.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            return (params, opt_state), loss

        _, losses = jax.lax.scan(step, (params, opt_state), jnp.arange(K))
        return losses.mean()
    return run


def variant_B():
    def run(seed):
        rng = jax.random.key(seed)
        params, opt_state, res, pan, ms = setup(rng)
        loss, grads = jax.value_and_grad(loss_fn)(
            params, jax.random.fold_in(rng, 100), res, pan, ms)
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        ema = jax.tree.map(lambda e, p: e * 0.9999 + p * 0.0001, params, params)
        return loss + jax.tree.reduce(
            lambda a, b: a + b, jax.tree.map(lambda x: x.sum(), ema)) * 0.0
    return run


def variant_C():
    def run(seed):
        rng = jax.random.key(seed)
        params, opt_state, res, pan, ms = setup(rng)
        loss, grads = jax.value_and_grad(loss_fn)(
            params, jax.random.fold_in(rng, 100), res, pan, ms)
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return loss + jax.tree.reduce(
            lambda a, b: a + b, jax.tree.map(lambda x: x.sum(), params)) * 0.0
    return run


which = sys.argv[1] if len(sys.argv) > 1 else "ABC"
if "A" in which:
    trial("A scan(loss+grad+adamw) x8", variant_A)
if "B" in which:
    trial("B single step + ema", variant_B)
if "C" in which:
    trial("C single step", variant_C)
P("bisect done")
