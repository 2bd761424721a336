"""r3 TPU refresh (VERDICT items 1 & 5), one sequential process:

  1. cond-encoder attribution A/B — the same fori-chained forward with
     PAN/MS loop-INVARIANT (LICM hoists the encoder; what bench.py times)
     vs loop-VARYING (encoder must execute every iteration). The gap is the
     measured encoder share of the fused step.
  2. 20-step dpm++ sampling @256² batch 8 (refresh the 1.56 img/s r2 row
     with r3-final code).
  3. reference-default sampler: 30-step singlestep order-3 logSNR +
     denoise_to_zero (stale 0.62 img/s row was r1 code).
  4. big config [64,128,256,512] batch 4 forward (stale 9.63 row was
     pre-concat-free commit 8126cd9).
  5. 512² 4-band forward batch sweep 1/2/4 (BASELINE config 4 roofline).

Writes flush-per-line progress to BENCH_LOG (default stdout). No outer
timeout — a killed TPU client wedges the tunnel (CLAUDE.md).
"""
import sys, os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import time

import jax
import jax.numpy as jnp

from tmdiff_tpu.models import WavBEST
from tmdiff_tpu.models.clip_text import get_prompt_embedding

log = open(os.environ.get("BENCH_LOG", "/dev/stdout"), "a")


def P(*a):
    print(*a, file=log, flush=True)


EMB = jnp.asarray(get_prompt_embedding("WV3"))


def fwd_bench(tag, channels, bands, size, batch, chain=8, vary_cond=False,
              reps=3):
    model = WavBEST(channels=channels, dtype=jnp.bfloat16)

    @jax.jit
    def run(seed):
        rng = jax.random.key(seed)
        x1 = jnp.zeros((1, bands, size, size), jnp.float32)
        params = model.init(rng, x1, jnp.zeros((1,), jnp.int32),
                            jnp.zeros((1, 1, size, size)), x1, EMB)
        x = jax.random.normal(jax.random.fold_in(rng, 1),
                              (batch, bands, size, size))
        pan = jax.random.normal(jax.random.fold_in(rng, 2),
                                (batch, 1, size, size))
        ms = jax.random.normal(jax.random.fold_in(rng, 3),
                               (batch, bands, size, size))
        t = jnp.full((batch,), 500, jnp.int32)

        if vary_cond:
            # thread a scalar of the carry into PAN/MS: the cond encoder
            # becomes loop-dependent, LICM cannot hoist it
            def body(_, v):
                eps = 1e-6 * jnp.mean(v)
                return model.apply(params, v, t, pan + eps, ms + eps, EMB)
        else:
            def body(_, v):
                return model.apply(params, v, t, pan, ms, EMB)

        return jnp.mean(jax.lax.fori_loop(0, chain, body, x))

    t0 = time.perf_counter(); s = float(run(0))
    compile_s = time.perf_counter() - t0
    ds = []
    for i in range(reps):
        t0 = time.perf_counter(); s = float(run(i + 1))
        ds.append(time.perf_counter() - t0)
    best = min(ds)
    sps = chain * batch / best
    P(f"{tag}: compile {compile_s:.0f}s best {best*1e3:.0f}ms "
      f"-> {sps:.2f} steps/s/chip (sink {s:.4f})")
    return sps


def sampling_bench(tag, steps, order, method, denoise_to_zero, batch=8,
                   bands=8, size=256, reps=2):
    from tmdiff_tpu.diffusion.dpm_solver import (
        DPMSolver, NoiseScheduleVP, WrappedModel)
    from tmdiff_tpu.diffusion.schedules import make_beta_schedule

    model = WavBEST(channels=(32, 64, 128, 256), dtype=jnp.bfloat16)
    nsvp = NoiseScheduleVP("discrete", betas=make_beta_schedule("cosine", 1000))

    @jax.jit
    def run(seed):
        rng = jax.random.key(seed)
        x1 = jnp.zeros((1, bands, size, size), jnp.float32)
        params = model.init(rng, x1, jnp.zeros((1,), jnp.int32),
                            jnp.zeros((1, 1, size, size)), x1, EMB)
        pan = jax.random.normal(jax.random.fold_in(rng, 1),
                                (batch, 1, size, size))
        ms = jax.random.normal(jax.random.fold_in(rng, 2),
                               (batch, bands, size, size))
        cache = model.apply(params, pan, ms, EMB,
                            method=model.encode_condition)
        fn = lambda x, t: model.apply(params, x, t, cache,
                                      method=model.denoise)
        solver = DPMSolver(WrappedModel(fn, model_type="x_start"), nsvp)
        out = solver.sample(
            jax.random.normal(jax.random.fold_in(rng, 3),
                              (batch, bands, size, size)),
            steps=steps, order=order, skip_type="logSNR", method=method,
            denoise_to_zero=denoise_to_zero,
        )
        return jnp.mean(out)

    t0 = time.perf_counter(); s = float(run(0))
    compile_s = time.perf_counter() - t0
    ds = []
    for i in range(reps):
        t0 = time.perf_counter(); s = float(run(i + 1))
        ds.append(time.perf_counter() - t0)
    best = min(ds)
    P(f"{tag}: compile {compile_s:.0f}s {best:.2f}s/batch "
      f"-> {batch/best:.3f} img/s/chip (sink {s:.4f})")
    return batch / best


if __name__ == "__main__":
    P(f"r3_refresh start {time.strftime('%F %T')} devices={jax.devices()}")
    # 1. encoder attribution
    a = fwd_bench("fwd 256p8b b8 cond-INVARIANT (headline regime)",
                  (32, 64, 128, 256), 8, 256, 8)
    b = fwd_bench("fwd 256p8b b8 cond-VARYING (encoder in loop)",
                  (32, 64, 128, 256), 8, 256, 8, vary_cond=True)
    P(f"encoder share (measured): 1 - {b:.2f}/{a:.2f} = {1 - b / a:.3f} "
      f"(cost-analysis predicts ~0.325 executed)")
    # 2. 20-step sampling refresh
    sampling_bench("dpm++ 20-step multistep o2 b8 256p (r3)", 20, 2,
                   "multistep", False)
    # 3. reference-default sampler refresh
    sampling_bench("dpm++ 30-step singlestep o3 +denoise_to_zero b4 256p (r3)",
                   30, 3, "singlestep", True, batch=4)
    # 4. big config refresh
    fwd_bench("fwd big[64,128,256,512] 8b 256p b4 (r3)",
              (64, 128, 256, 512), 8, 256, 4)
    # 5. 512² batch sweep
    for bsz in (1, 2, 4):
        fwd_bench(f"fwd 512p 4band b{bsz} (r3)", (32, 64, 128, 256), 4, 512,
                  bsz, chain=4)
    P("r3_refresh done")
