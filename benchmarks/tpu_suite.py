"""Sequential TPU measurement suite (one process — the tunnel wedges under
concurrent clients): fused train step, sampling scaling, flash attention.

Writes progress lines to BENCH_LOG (flush-per-line; the relay buffers pipes).
"""
import sys, os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import time

import jax
import jax.numpy as jnp
import numpy as np

log = open(os.environ.get("BENCH_LOG", "/dev/stdout"), "a")
def P(*a):
    print(*a, file=log, flush=True)


def timed(fn, *args, reps=3):
    t0 = time.perf_counter(); fn(*args); compile_s = time.perf_counter() - t0
    ds = []
    for i in range(reps):
        t0 = time.perf_counter(); fn(*args); ds.append(time.perf_counter() - t0)
    return compile_s, min(ds)


# ---------------------------------------------------------------- train step
def bench_train_step():
    """VERDICT #5: steady-state fused train step on the real chip. The fully
    fused program (LR closure + EMA + grad-norm) SIGILLed the tunnel's
    remote compiler in r1; measure the two-program split instead: hot
    program = loss+grad+AdamW+EMA (donated), cold program = grad-norm. Here
    we time the hot program with K chained steps inside one jit."""
    import optax
    from tmdiff_tpu.models import WavBEST
    from tmdiff_tpu.models.clip_text import get_prompt_embedding
    from tmdiff_tpu.diffusion.schedules import NoiseSchedule
    from tmdiff_tpu.diffusion import gaussian

    for batch, size in ((4, 64), (2, 256)):
        bands = 8
        K = 8
        model = WavBEST(channels=(32, 64, 128, 256), dtype=jnp.bfloat16)
        ns = NoiseSchedule.create("cosine", 1000)
        emb = jnp.asarray(get_prompt_embedding("WV3"))
        tx = optax.adamw(1e-4, weight_decay=1e-4)

        @jax.jit
        def run(seed):
            rng = jax.random.key(seed)
            x1 = jnp.zeros((1, bands, size, size), jnp.float32)
            params = model.init(rng, x1, jnp.zeros((1,), jnp.int32),
                                jnp.zeros((1, 1, size, size)), x1, emb)
            opt_state = tx.init(params)
            res = jax.random.normal(jax.random.fold_in(rng, 1),
                                    (batch, bands, size, size))
            pan = jax.random.normal(jax.random.fold_in(rng, 2),
                                    (batch, 1, size, size))
            ms = jax.random.normal(jax.random.fold_in(rng, 3),
                                   (batch, bands, size, size))

            def loss_fn(p, step_rng):
                return gaussian.diffusion_loss(
                    lambda x, t, pan_, ms_: model.apply(p, x, t, pan_, ms_, emb),
                    ns, step_rng, res, pan, ms)

            def step(carry, i):
                params, opt_state, ema = carry
                loss, grads = jax.value_and_grad(loss_fn)(
                    params, jax.random.fold_in(rng, 100 + i))
                updates, opt_state = tx.update(grads, opt_state, params)
                params = optax.apply_updates(params, updates)
                ema = jax.tree.map(
                    lambda e, p: e * 0.9999 + p * 0.0001, ema, params)
                return (params, opt_state, ema), loss

            ema0 = jax.tree.map(lambda x: x, params)
            (_, _, _), losses = jax.lax.scan(
                step, (params, opt_state, ema0), jnp.arange(K))
            return losses.mean()

        try:
            c, dt = timed(lambda s: float(run(s)), 0)
            P(f"train_step fused+EMA batch{batch} {size}²: compile {c:.0f}s, "
              f"{dt/K*1e3:.1f} ms/step = {batch*K/dt:.1f} img/s/chip")
        except Exception as e:  # tunnel SIGILL etc.
            P(f"train_step batch{batch} {size}² FAILED: {type(e).__name__} {str(e)[:120]}")


# ------------------------------------------------------------ sampling scale
def bench_sampling():
    """VERDICT #10: img/s at 20-step dpm++ multistep-2 across batch sizes and
    dtypes, with the cond-encoder cache (scan path)."""
    from tmdiff_tpu.models import WavBEST
    from tmdiff_tpu.models.clip_text import get_prompt_embedding
    from tmdiff_tpu.diffusion.dpm_solver import DPMSolver, NoiseScheduleVP, WrappedModel
    from tmdiff_tpu.diffusion.schedules import make_beta_schedule

    bands, size = 8, 256
    betas = make_beta_schedule("cosine", 1000)
    nsvp = NoiseScheduleVP("discrete", betas=betas)
    emb = jnp.asarray(get_prompt_embedding("WV3"))

    for batch, dtype_name in ((8, "bf16"), (16, "bf16"), (8, "fp32")):
        dtype = jnp.bfloat16 if dtype_name == "bf16" else jnp.float32
        model = WavBEST(channels=(32, 64, 128, 256), dtype=dtype)

        @jax.jit
        def run(seed):
            rng = jax.random.key(seed)
            x1 = jnp.zeros((1, bands, size, size), jnp.float32)
            params = model.init(rng, x1, jnp.zeros((1,), jnp.int32),
                                jnp.zeros((1, 1, size, size)), x1, emb)
            pan = jax.random.normal(jax.random.fold_in(rng, 1),
                                    (batch, 1, size, size))
            ms = jax.random.normal(jax.random.fold_in(rng, 2),
                                   (batch, bands, size, size))
            cache = model.apply(params, pan, ms, emb,
                                method=model.encode_condition)
            wrapped = WrappedModel(
                lambda x, t, *_: model.apply(params, x, t, cache,
                                             method=model.denoise))
            solver = DPMSolver(wrapped, nsvp)
            out = solver.sample(
                jax.random.normal(jax.random.fold_in(rng, 3),
                                  (batch, bands, size, size)),
                steps=20, order=2, skip_type="logSNR", method="multistep")
            return out.mean()

        try:
            c, dt = timed(lambda s: float(run(s)), 0)
            P(f"sampling 20-step ms2 batch{batch} {dtype_name}: compile {c:.0f}s, "
              f"{batch/dt:.2f} img/s/chip")
        except Exception as e:
            P(f"sampling batch{batch} {dtype_name} FAILED: {type(e).__name__} {str(e)[:120]}")


# ------------------------------------------------------------ flash attention
def bench_flash():
    """VERDICT #7 follow-through: compile + run the KV-streamed kernel on the
    real chip, including S=65k (256² tokens) where the old full-KV VMEM spec
    could not fit; A/B vs plain einsum attention where that fits."""
    from tmdiff_tpu.ops.pallas.flash_attention import attention_reference, flash_attention

    for (s, d, ref_ok) in ((4096, 64, True), (8192, 64, True), (65536, 64, False)):
        @jax.jit
        def run(seed, s=s, d=d):
            rng = jax.random.key(seed)
            q = jax.random.normal(rng, (1, 1, s, d), jnp.bfloat16)
            k = jax.random.normal(jax.random.fold_in(rng, 1), (1, 1, s, d), jnp.bfloat16)
            v = jax.random.normal(jax.random.fold_in(rng, 2), (1, 1, s, d), jnp.bfloat16)
            return flash_attention(q, k, v, interpret=False).mean()

        try:
            c, dt = timed(lambda x: float(run(x)), 0)
            flops = 4 * s * s * d
            P(f"flash S={s} D={d}: compile {c:.0f}s, {dt*1e3:.2f}ms, "
              f"{flops/dt/1e12:.1f} TFLOP/s")
        except Exception as e:
            P(f"flash S={s} FAILED: {type(e).__name__} {str(e)[:200]}")
        if ref_ok:
            @jax.jit
            def run_ref(seed, s=s, d=d):
                rng = jax.random.key(seed)
                q = jax.random.normal(rng, (1, 1, s, d), jnp.bfloat16)
                k = jax.random.normal(jax.random.fold_in(rng, 1), (1, 1, s, d), jnp.bfloat16)
                v = jax.random.normal(jax.random.fold_in(rng, 2), (1, 1, s, d), jnp.bfloat16)
                return attention_reference(q, k, v).mean()
            try:
                c, dt = timed(lambda x: float(run_ref(x)), 0)
                P(f"einsum-ref S={s}: compile {c:.0f}s, {dt*1e3:.2f}ms")
            except Exception as e:
                P(f"einsum-ref S={s} FAILED: {type(e).__name__}")
        # numeric check on-chip at moderate S
        if s == 4096:
            try:
                rng = jax.random.key(7)
                q = jax.random.normal(rng, (1, 2, 300, 64), jnp.float32)
                k = jax.random.normal(jax.random.fold_in(rng, 1), (1, 2, 300, 64), jnp.float32)
                v = jax.random.normal(jax.random.fold_in(rng, 2), (1, 2, 300, 64), jnp.float32)
                a = np.asarray(flash_attention(q, k, v, interpret=False))
                b = np.asarray(attention_reference(q, k, v))
                P(f"flash numeric check on-chip: max err {np.abs(a-b).max():.2e}")
            except Exception as e:
                P(f"flash numeric check FAILED: {type(e).__name__} {str(e)[:200]}")


if __name__ == "__main__":
    which = sys.argv[1] if len(sys.argv) > 1 else "all"
    if which in ("all", "flash"):
        bench_flash()
    if which in ("all", "train"):
        bench_train_step()
    if which in ("all", "sampling"):
        bench_sampling()
    P("suite done")
