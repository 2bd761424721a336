"""Benchmark: UNet denoise steps/sec/chip at 256×256 on the real TPU.

Prints ONE JSON line {"metric", "value", "unit", "vs_baseline"}.
Baseline target: ≥2,000 denoise steps/sec/chip at 256×256 (BASELINE.md).
A "denoise step" is one UNet forward for one image (batch counts multiply).
"""
import json
import time

import jax
import jax.numpy as jnp
import numpy as np


def main():
    from tmdiff_tpu.models import WavBEST
    from tmdiff_tpu.models.clip_text import get_prompt_embedding

    batch = int(jax.device_count()) * 8
    bands, H, W = 8, 256, 256
    model = WavBEST(channels=(32, 64, 128, 256), dtype=jnp.bfloat16)

    rng = jax.random.key(0)
    x = jax.random.normal(rng, (batch, bands, H, W), jnp.float32)
    t = jnp.full((batch,), 500, jnp.int32)
    pan = jax.random.normal(rng, (batch, 1, H, W), jnp.float32)
    ms = jax.random.normal(rng, (batch, bands, H, W), jnp.float32)
    emb = jnp.asarray(get_prompt_embedding("WV3"))
    params = model.init(jax.random.key(1), x[:1], t[:1], pan[:1], ms[:1], emb)

    fwd = jax.jit(lambda p, *a: model.apply(p, *a))
    out = fwd(params, x, t, pan, ms, emb)
    out.block_until_ready()  # compile + warm

    iters = 30
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fwd(params, x, t, pan, ms, emb)
    out.block_until_ready()
    dt = time.perf_counter() - t0

    steps_per_sec = iters * batch / dt / jax.device_count()
    result = {
        "metric": "UNet denoise steps/sec/chip @256x256 (8-band, bf16, batch %d)" % batch,
        "value": round(steps_per_sec, 2),
        "unit": "steps/sec/chip",
        "vs_baseline": round(steps_per_sec / 2000.0, 4),
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
