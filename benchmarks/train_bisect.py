"""Diagnostic record: the r2 remote-compile SIGILL bisection of the fused
train step (findings + resolution in BASELINE.md "Fused train step").

On the r2 tunnel, the *gradient* of the model SIGILLed the remote-compile
helper at every model size and conv lowering while the forward always
compiled; `jax.checkpoint` on the model restructures the backward HLO enough
to compile (and halves activation HBM), so Trainer defaults to remat=True.

Stages (arg 1, default "coarse"):
  coarse — which fused-step construct fails:
      A: scan-chained loss+grad+AdamW (no EMA)
      B: single step loss+grad+AdamW+EMA (no scan)
      C: single step loss+grad+AdamW (r1: compiled)
  fine   — which part of one step fails:
      F: forward-only loss (control)   G: value_and_grad only
      S: grad + SGD apply              W: grad + AdamW apply
  size   — is the grad failure size-dependent? width sweep + remat rescue
"""
import sys, os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import time

STAGES = ("coarse", "fine", "size")
stage = sys.argv[1] if len(sys.argv) > 1 else "coarse"
if stage not in STAGES:  # bail before jax touches the TPU tunnel
    sys.exit(f"usage: train_bisect.py [{'|'.join(STAGES)}]")

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
ns = NoiseSchedule.create("cosine", 1000)
emb = jnp.asarray(get_prompt_embedding("WV3"))
FLAGSHIP = (32, 64, 128, 256)


def make_setup(model):
    def setup(rng):
        x1 = jnp.zeros((1, bands, size, size), jnp.float32)
        params = model.init(rng, x1, jnp.zeros((1,), jnp.int32),
                            jnp.zeros((1, 1, size, size)), x1, emb)
        res = jax.random.normal(
            jax.random.fold_in(rng, 1), (batch, bands, size, size))
        pan = jax.random.normal(
            jax.random.fold_in(rng, 2), (batch, 1, size, size))
        ms = jax.random.normal(
            jax.random.fold_in(rng, 3), (batch, bands, size, size))
        return params, res, pan, ms
    return setup


def make_loss(model, apply=None):
    apply = apply or model.apply

    def loss_fn(p, step_rng, res, pan, ms):
        return gaussian.diffusion_loss(
            lambda x, t, pan_, ms_: apply(p, x, t, pan_, ms_, emb),
            ns, step_rng, res, pan, ms)
    return loss_fn


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


def stage_coarse():
    model = WavBEST(channels=FLAGSHIP, dtype=jnp.bfloat16)
    setup, loss_fn = make_setup(model), make_loss(model)
    tx = optax.adamw(1e-4, weight_decay=1e-4)

    def variant_A(seed):
        rng = jax.random.key(seed)
        params, res, pan, ms = setup(rng)
        opt_state = tx.init(params)

        def step(carry, i):
            params, opt_state = carry
            loss, grads = jax.value_and_grad(loss_fn)(
                params, jax.random.fold_in(rng, 100 + i), res, pan, ms)
            updates, opt_state = tx.update(grads, opt_state, params)
            return (optax.apply_updates(params, updates), opt_state), loss

        _, losses = jax.lax.scan(step, (params, opt_state), jnp.arange(K))
        return losses.mean()

    def one_step(seed, with_ema):
        rng = jax.random.key(seed)
        params, res, pan, ms = setup(rng)
        opt_state = tx.init(params)
        loss, grads = jax.value_and_grad(loss_fn)(
            params, jax.random.fold_in(rng, 100), res, pan, ms)
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        sink = params
        if with_ema:
            sink = jax.tree.map(
                lambda e, p: e * 0.9999 + p * 1e-4, params, params)
        return loss + jax.tree.reduce(
            lambda a, b: a + b,
            jax.tree.map(lambda x: x.sum(), sink)) * 0.0

    trial("A scan(loss+grad+adamw) x8", jax.jit(variant_A), 0)
    trial("B single step + ema", jax.jit(lambda s: one_step(s, True)), 0)
    trial("C single step", jax.jit(lambda s: one_step(s, False)), 0)


def stage_fine():
    model = WavBEST(channels=FLAGSHIP, dtype=jnp.bfloat16)
    setup, loss_fn = make_setup(model), make_loss(model)
    params, res, pan, ms = jax.jit(
        lambda s: setup(jax.random.key(s)))(0)
    jax.block_until_ready(ms)
    P("init ok")
    rng = jax.random.key(7)

    trial("F forward loss",
          jax.jit(lambda p: loss_fn(p, rng, res, pan, ms)), params)
    ok = trial(
        "G value_and_grad",
        jax.jit(lambda p: jax.value_and_grad(
            lambda q: loss_fn(q, rng, res, pan, ms))(p)), params)
    if not ok:
        return
    for name, tx in [("S grad+sgd", optax.sgd(1e-4)),
                     ("W grad+adamw", optax.adamw(1e-4, weight_decay=1e-4))]:
        @jax.jit
        def step(p, o, tx=tx):
            loss, grads = jax.value_and_grad(
                lambda q: loss_fn(q, rng, res, pan, ms))(p)
            upd, o = tx.update(grads, o, p)
            return optax.apply_updates(p, upd), o, loss
        trial(name, step, params, tx.init(params))


def stage_size():
    def try_grad(channels, remat=False):
        model = WavBEST(channels=channels, dtype=jnp.bfloat16)
        apply = jax.checkpoint(model.apply) if remat else None
        loss_fn = make_loss(model, apply)
        params, res, pan, ms = jax.jit(
            lambda s: make_setup(model)(jax.random.key(s)))(0)
        jax.block_until_ready(ms)
        rng = jax.random.key(7)
        return trial(
            f"grad ch={channels} remat={remat}",
            jax.jit(jax.value_and_grad(
                lambda p: loss_fn(p, rng, res, pan, ms))), params)

    for ch in [(4, 8, 8, 16), (16, 32, 64, 128), FLAGSHIP]:
        ok = try_grad(ch)
        if not ok and ch == FLAGSHIP:
            try_grad(ch, remat=True)


{"coarse": stage_coarse, "fine": stage_fine, "size": stage_size}[stage]()
P("bisect done")
