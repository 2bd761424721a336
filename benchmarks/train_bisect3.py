"""Finer SIGILL bisect of the train-step program on the tunnel compiler:
  G: value_and_grad only
  S: grad + SGD apply
  W: grad + AdamW apply
  F: forward-only loss (control; known to compile)
"""
import sys, os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import functools
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

batch, size, bands = 4, 64, 8
model = WavBEST(channels=(32, 64, 128, 256), dtype=jnp.bfloat16)
ns = NoiseSchedule.create("cosine", 1000)
emb = jnp.asarray(get_prompt_embedding("WV3"))


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


def loss_fn(p, rng, res, pan, ms):
    return gaussian.diffusion_loss(
        lambda x, t, pan_, ms_: model.apply(p, x, t, pan_, ms_, emb),
        ns, rng, res, pan, ms)


def trial(name, fn, *args):
    try:
        t0 = time.perf_counter()
        out = fn(*args)
        val = float(jax.tree.leaves(out)[0].ravel()[0])
        P(f"{name}: ok compile+run {time.perf_counter()-t0:.0f}s ({val:.4f})")
        return True
    except Exception as e:
        P(f"{name} FAILED: {type(e).__name__} {str(e)[:110]}")
        return False


params, res, pan, ms = init(0)
jax.block_until_ready(ms)
P("init ok")
rng = jax.random.key(7)

f_loss = jax.jit(lambda p: loss_fn(p, rng, res, pan, ms))
trial("F forward loss", f_loss, params)

g_fn = jax.jit(lambda p: jax.value_and_grad(lambda q: loss_fn(q, rng, res, pan, ms))(p))
ok_g = trial("G value_and_grad", g_fn, params)

if ok_g:
    sgd = optax.sgd(1e-4)

    @jax.jit
    def s_fn(p, o):
        loss, grads = jax.value_and_grad(lambda q: loss_fn(q, rng, res, pan, ms))(p)
        upd, o = sgd.update(grads, o, p)
        return optax.apply_updates(p, upd), o, loss
    trial("S grad+sgd", s_fn, params, sgd.init(params))

    adamw = optax.adamw(1e-4, weight_decay=1e-4)

    @jax.jit
    def w_fn(p, o):
        loss, grads = jax.value_and_grad(lambda q: loss_fn(q, rng, res, pan, ms))(p)
        upd, o = adamw.update(grads, o, p)
        return optax.apply_updates(p, upd), o, loss
    trial("W grad+adamw", w_fn, params, adamw.init(params))
P("done")
