"""Steady-state fused train step on the real chip, two-program structure:
  program 1 (init): params/opt_state/data materialised ON device
  program 2 (step): loss+grad+AdamW+EMA, donated, called N times with async
                    dispatch (sync once at the end) — RTT-free steady state.
This is the structure the real Trainer uses; the r1-deferred measurement.
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

bands = 8
model = WavBEST(channels=(32, 64, 128, 256), dtype=jnp.bfloat16)
ns = NoiseSchedule.create("cosine", 1000)
emb = jnp.asarray(get_prompt_embedding("WV3"))
tx = optax.adamw(1e-4, weight_decay=1e-4)


def measure(batch, size, n_steps=24):
    @jax.jit
    def init(seed):
        rng = jax.random.key(seed)
        x1 = jnp.zeros((1, bands, size, size), jnp.float32)
        params = model.init(rng, x1, jnp.zeros((1,), jnp.int32),
                            jnp.zeros((1, 1, size, size)), x1, emb)
        opt_state = tx.init(params)
        res = jax.random.normal(jax.random.fold_in(rng, 1), (batch, bands, size, size))
        pan = jax.random.normal(jax.random.fold_in(rng, 2), (batch, 1, size, size))
        ms = jax.random.normal(jax.random.fold_in(rng, 3), (batch, bands, size, size))
        ema = jax.tree.map(lambda x: x, params)
        return params, ema, opt_state, res, pan, ms

    # jax.checkpoint: trades recompute for activation memory AND (decisive
    # here) restructures the backward HLO so the tunnel's remote-compile
    # helper doesn't SIGILL — the un-rematerialised gradient of this model
    # crashes it at every size/lowering (benchmarks/train_bisect.py).
    apply_ckpt = jax.checkpoint(model.apply)

    @functools.partial(jax.jit, donate_argnums=(0, 1, 2))
    def step(params, ema, opt_state, res, pan, ms, i):
        rng = jax.random.fold_in(jax.random.key(7), i)

        def loss_fn(p):
            return gaussian.diffusion_loss(
                lambda x, t, pan_, ms_: apply_ckpt(p, x, t, pan_, ms_, emb),
                ns, rng, res, pan, ms)

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        ema = jax.tree.map(lambda e, p: e * 0.9999 + p * 0.0001, ema, params)
        return params, ema, opt_state, loss

    try:
        t0 = time.perf_counter()
        params, ema, opt_state, res, pan, ms = init(0)
        jax.block_until_ready(ms)
        t_init = time.perf_counter() - t0
        t0 = time.perf_counter()
        params, ema, opt_state, loss = step(params, ema, opt_state, res, pan, ms, 0)
        _ = float(loss)
        t_compile = time.perf_counter() - t0
        # steady state: dispatch N donated steps, sync once via final loss
        t0 = time.perf_counter()
        for i in range(1, n_steps + 1):
            params, ema, opt_state, loss = step(params, ema, opt_state, res, pan, ms, i)
        final = float(loss)
        dt = time.perf_counter() - t0
        P(f"train_steady batch{batch} {size}²: init {t_init:.0f}s, "
          f"step-compile {t_compile:.0f}s, steady {dt/n_steps*1e3:.1f} ms/step "
          f"= {batch*n_steps/dt:.1f} img/s/chip (loss {final:.4f})")
    except Exception as e:
        P(f"train_steady batch{batch} {size}² FAILED: {type(e).__name__} {str(e)[:150]}")


if __name__ == "__main__":
    measure(4, 64)
    measure(16, 64)
    measure(2, 256)
    P("done")
