import sys; sys.path.insert(0, __import__("os").path.dirname(__import__("os").path.dirname(__import__("os").path.abspath(__file__))))
import time, jax, jax.numpy as jnp
from tmdiff_tpu.models import WavBEST
from tmdiff_tpu.models.clip_text import get_prompt_embedding
from tmdiff_tpu.diffusion.dpm_solver import DPMSolver, NoiseScheduleVP, WrappedModel
from tmdiff_tpu.diffusion.schedules import make_beta_schedule

log = open("/dev/stdout", "a")
def P(*a): print(*a, file=log, flush=True)

B, bands, H, W = 8, 8, 256, 256
model = WavBEST(channels=(32, 64, 128, 256), dtype=jnp.bfloat16)
emb = jnp.asarray(get_prompt_embedding("WV3"))
nsvp = NoiseScheduleVP("discrete", betas=make_beta_schedule("cosine", 1000))

def build_sample(cached: bool):
    @jax.jit
    def run(seed):
        rng = jax.random.key(seed)
        x1 = jnp.zeros((1, bands, H, W), jnp.float32)
        params = model.init(rng, x1, jnp.zeros((1,), jnp.int32), jnp.zeros((1,1,H,W)), x1, emb)
        pan = jax.random.normal(jax.random.fold_in(rng, 1), (B, 1, H, W))
        ms = jax.random.normal(jax.random.fold_in(rng, 2), (B, bands, H, W))
        if cached:
            cache = model.apply(params, pan, ms, emb, method=model.encode_condition)
            fn = lambda x, t: model.apply(params, x, t, cache, method=model.denoise)
        else:
            fn = lambda x, t: model.apply(params, x, t, pan, ms, emb)
        solver = DPMSolver(WrappedModel(fn, model_type="x_start"), nsvp)
        out = solver.sample(jax.random.normal(jax.random.fold_in(rng, 3), (B, bands, H, W)),
                            steps=20, order=2, skip_type="logSNR", method="multistep")
        return jnp.mean(out)
    return run

for cached in (True, False):
    run = build_sample(cached)
    t0 = time.perf_counter(); s = float(run(0)); c = time.perf_counter()-t0
    t0 = time.perf_counter(); s = float(run(1)); d = time.perf_counter()-t0
    P(f"cached={cached}: compile {c:.0f}s, 20-step sample {d:.2f}s -> {B/d:.2f} img/s/chip (sink {s:.3f})")
P("done")
