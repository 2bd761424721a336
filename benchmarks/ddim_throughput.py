"""Few-NFE sampling throughput at flagship shapes (8-band 256², batch 8).

Sampling is denoise-bound (BASELINE.md "sampling structural ceiling"), so a
progressively-distilled N-step DDIM student converts its NFE reduction
≈ linearly into img/s. Quality at few NFE is proven separately on the
synthetic convergence setup (tools/distill_eval.py); throughput is
weight-independent, so this measures the real serving rate of a distilled
model at production shapes. Transfer-free protocol as bench.py: on-device
init, scalar-sink sync.
"""
import sys, os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import time

import jax
import jax.numpy as jnp

from tmdiff_tpu.models import WavBEST
from tmdiff_tpu.models.clip_text import get_prompt_embedding
from tmdiff_tpu.diffusion import gaussian
from tmdiff_tpu.diffusion.schedules import NoiseSchedule

B, H, W = 8, 256, 256
bands = int(os.environ.get("TMDIFF_BENCH_BANDS", "8"))  # 8=WV3, 4=QB/GF2
model = WavBEST(channels=(32, 64, 128, 256), dtype=jnp.bfloat16)
emb = jnp.asarray(get_prompt_embedding("WV3"))
ns = NoiseSchedule.create("cosine", 500)


def build(steps: int):
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
        fn = lambda x, t, *_: model.apply(params, x, t, cache,
                                          method=model.denoise)
        out = gaussian.ddim_sample(fn, ns, jax.random.fold_in(rng, 3),
                                   None, None, (B, bands, H, W), steps=steps)
        return jnp.mean(out)
    return run


for steps in (20, 10, 5, 2, 1):
    run = build(steps)
    t0 = time.perf_counter(); s = float(run(0)); c = time.perf_counter() - t0
    t0 = time.perf_counter(); s = float(run(1)); d = time.perf_counter() - t0
    print(f"ddim steps={steps}: compile {c:.0f}s, sample {d:.2f}s -> "
          f"{B / d:.2f} img/s/chip (sink {s:.3f})", flush=True)
print("done")
