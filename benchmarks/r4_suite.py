"""r4 measurement suite (VERDICT r3 #3/#4): TPU rows for the adaptive
solver, tiled big-scene inference, and the serving-engine loopback.

Stages (arg 1):
  adaptive — adaptive step-size dpm solver (diffusion/dpm_solver.py
    sample_adaptive: ONE lax.while_loop) at the flagship config, with the
    accepted/attempted step counts the r3 review asked for. Transfer-free
    (on-device init, scalar sink).
  tiled — Pansharpener.sample_tiled on a 1024² 8-band synthetic scene
    (16 overlapping 256² crops through the normal compiled 20-step
    sampler). Host-side crop/blend by design, so the number INCLUDES the
    dev tunnel's pixel transfer; the compute-only rate is derived from the
    measured per-batch sampler time.
  loopback — serving-engine overhead isolated from transfer: the engine
    (serve/engine.py, 32 concurrent single-image requests) vs 4 direct
    np-in/np-out Pansharpener.sample calls on the same batches. Both sides
    pay identical host<->device transfer, so the delta IS the engine's own
    queueing/batching/future machinery.
"""
import sys, os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import time

STAGES = ("adaptive", "tiled", "loopback")
stage = sys.argv[1] if len(sys.argv) > 1 else "adaptive"
if stage not in STAGES:
    sys.exit(f"usage: r4_suite.py [{'|'.join(STAGES)}]")

import jax
import jax.numpy as jnp
import numpy as np

from tmdiff_tpu.models import WavBEST
from tmdiff_tpu.models.clip_text import get_prompt_embedding

log = open(os.environ.get("BENCH_LOG", "/dev/stdout"), "a")
def P(*a):
    print(*a, file=log, flush=True)

B, bands, H, W = 8, 8, 256, 256
model = WavBEST(channels=(32, 64, 128, 256), dtype=jnp.bfloat16)
emb = jnp.asarray(get_prompt_embedding("WV3"))


def stage_adaptive():
    from tmdiff_tpu.diffusion.dpm_solver import (
        DPMSolver, NoiseScheduleVP, WrappedModel)
    from tmdiff_tpu.diffusion.schedules import make_beta_schedule

    nsvp = NoiseScheduleVP("discrete", betas=make_beta_schedule("cosine", 1000))

    def build(order):
        @jax.jit
        def run(seed):
            rng = jax.random.key(seed)
            x1 = jnp.zeros((1, bands, H, W), jnp.float32)
            params = model.init(rng, x1, jnp.zeros((1,), jnp.int32),
                                jnp.zeros((1, 1, H, W)), x1, emb)
            pan = jax.random.normal(jax.random.fold_in(rng, 1), (B, 1, H, W))
            ms = jax.random.normal(jax.random.fold_in(rng, 2), (B, bands, H, W))
            cache = model.apply(params, pan, ms, emb,
                                method=model.encode_condition)
            fn = lambda x, t: model.apply(params, x, t, cache,
                                          method=model.denoise)
            solver = DPMSolver(
                WrappedModel(fn, model_type="x_start"), nsvp,
                algorithm_type="dpmsolver", correcting_x0_fn=None)
            x_T = jax.random.normal(jax.random.fold_in(rng, 3),
                                    (B, bands, H, W))
            # max_loops=64 (vs the 500 default): bounds the single
            # while_loop dispatch to ~1 min on-device — the 500-loop worst
            # case is one 4+ min dispatch, which crashed the relay's TPU
            # worker on the first attempt (r4 log)
            out, stats = solver.sample_adaptive(
                x_T, order=order, return_stats=True, max_loops=64)
            return jnp.mean(out), stats["steps_attempted"], stats["steps_accepted"]

        return run

    for order in (2, 3):
        run = build(order)
        t0 = time.perf_counter(); s, n, na = run(0)
        s = float(s); c = time.perf_counter() - t0
        t0 = time.perf_counter(); s, n, na = run(1)
        s, n, na = float(s), int(n), int(na)
        d = time.perf_counter() - t0
        P(f"adaptive order={order}: compile {c:.0f}s, {d:.2f}s/batch -> "
          f"{B/d:.2f} img/s/chip; steps attempted {n} accepted {na} "
          f"(NFE ~= {n * order}) (sink {s:.3f})")


def _build_sharp():
    from tmdiff_tpu.pipeline import Pansharpener

    @jax.jit
    def init(seed):
        rng = jax.random.key(seed)
        x1 = jnp.zeros((1, bands, H, W), jnp.float32)
        return model.init(rng, x1, jnp.zeros((1,), jnp.int32),
                          jnp.zeros((1, 1, H, W)), x1, emb)

    params = init(0)
    jax.block_until_ready(jax.tree.leaves(params)[0])
    return Pansharpener(model, params, schedule_name="cosine",
                        n_timestep=1000)


def stage_tiled():
    sharp = _build_sharp()
    rng = np.random.default_rng(0)
    scene = {"PAN": rng.random((1, 1, 1024, 1024), np.float32),
             "MS": rng.random((1, bands, 1024, 1024), np.float32)}
    # warmup: compile the 256² batch-8 dpm++ program on a single tile batch
    small = {"PAN": scene["PAN"][:, :, :256, :256],
             "MS": scene["MS"][:, :, :256, :256]}
    t0 = time.perf_counter()
    sharp.sample(
        {"PAN": np.repeat(small["PAN"], 8, 0),
         "MS": np.repeat(small["MS"], 8, 0)}, sensor="WV3", method="dpm++",
        steps=20)
    P(f"tiled: warmup compile+first batch {time.perf_counter()-t0:.0f}s")
    t0 = time.perf_counter()
    out = sharp.sample_tiled(scene, sensor="WV3", tile=256, overlap=32,
                             tile_batch=8, method="dpm++", steps=20)
    d = time.perf_counter() - t0
    n_crops = 25  # starts(1024, tile 256, overlap 32) -> 5 x 5
    P(f"tiled 1024² 8-band (25 crops, batches of 8, 20-step dpm++): "
      f"{d:.1f}s/scene = {n_crops/d:.2f} crop-img/s e2e incl. tunnel "
      f"transfer; out range [{out.min():.3f},{out.max():.3f}] shape {out.shape}")


def stage_loopback():
    from tmdiff_tpu.serve.engine import InferenceEngine

    sharp = _build_sharp()
    rng = np.random.default_rng(0)
    pans = rng.random((32, 1, H, W), np.float32)
    mss = rng.random((32, bands, H, W), np.float32)
    engine = InferenceEngine(sharp, method="dpm++", steps=20, max_batch=8,
                             max_delay_ms=30, buckets=(8,))
    engine.warmup([(bands, H, W)])
    # direct: same np-in/np-out semantics, 4 sequential full batches
    for tag in ("warm", "timed"):
        t0 = time.perf_counter()
        for g in range(4):
            sharp.sample({"PAN": pans[g*8:(g+1)*8], "MS": mss[g*8:(g+1)*8]},
                         sensor="WV3", method="dpm++", steps=20)
        d_direct = time.perf_counter() - t0
        P(f"loopback direct ({tag}): 32 img in {d_direct:.1f}s = "
          f"{32/d_direct:.2f} img/s (np-in/np-out incl. transfer)")
    for tag in ("warm", "timed"):
        t0 = time.perf_counter()
        futs = [engine.submit(pans[i], mss[i], sensor="WV3")
                for i in range(32)]
        for f in futs:
            f.result(timeout=600)
        d_engine = time.perf_counter() - t0
        P(f"loopback engine ({tag}): 32 img in {d_engine:.1f}s = "
          f"{32/d_engine:.2f} img/s; engine overhead vs direct "
          f"{100*(d_engine-d_direct)/d_direct:+.1f}%")
    engine.shutdown()


{"adaptive": stage_adaptive, "tiled": stage_tiled,
 "loopback": stage_loopback}[stage]()
P("done")
