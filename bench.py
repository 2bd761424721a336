"""Benchmark: UNet denoise steps/sec/chip at 256×256 on the real TPU.

Prints ONE JSON line {"metric", "value", "unit", "vs_baseline"}.
Baseline target: ≥2,000 denoise steps/sec/chip at 256×256 (BASELINE.md).
A "denoise step" is one UNet forward for one image (batch counts multiply).

Measurement is device-truth: K forwards are chained through a fori_loop data
dependency inside ONE jitted call, and the result is fetched to the host —
async-dispatch artifacts (block_until_ready is unreliable through the axon
tunnel) cannot inflate the number.
"""
import json
import time

import jax
import jax.numpy as jnp


def main():
    from tmdiff_tpu.models import WavBEST
    from tmdiff_tpu.models.clip_text import get_prompt_embedding

    batch = 4
    bands, H, W = 8, 256, 256
    chain_len = 8
    model = WavBEST(channels=(32, 64, 128, 256), dtype=jnp.bfloat16)

    rng = jax.random.key(0)
    x = jax.random.normal(rng, (batch, bands, H, W), jnp.float32)
    t = jnp.full((batch,), 500, jnp.int32)
    pan = jax.random.normal(rng, (batch, 1, H, W), jnp.float32)
    ms = jax.random.normal(rng, (batch, bands, H, W), jnp.float32)
    emb = jnp.asarray(get_prompt_embedding("WV3"))
    params = model.init(jax.random.key(1), x[:1], t[:1], pan[:1], ms[:1], emb)

    @jax.jit
    def chained(p, x0):
        def body(_, v):
            return model.apply(p, v, t, pan, ms, emb)

        return jax.lax.fori_loop(0, chain_len, body, x0)

    # Compile + warm, forcing a real round-trip.
    float(jnp.mean(chained(params, x)))

    reps = 3
    t0 = time.perf_counter()
    for _ in range(reps):
        out = chained(params, x)
    sink = float(jnp.mean(out))  # ground-truth sync
    dt = time.perf_counter() - t0

    steps = reps * chain_len * batch
    steps_per_sec = steps / dt / jax.device_count()
    result = {
        "metric": "UNet denoise steps/sec/chip @256x256 (8-band, bf16, "
                  f"batch {batch}, fori-chained x{chain_len}, sink={sink:.3f})",
        "value": round(steps_per_sec, 2),
        "unit": "steps/sec/chip",
        "vs_baseline": round(steps_per_sec / 2000.0, 4),
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
