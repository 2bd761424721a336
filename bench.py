"""Benchmark: UNet denoise steps/sec/chip at 256×256 on the real TPU.

Prints ONE JSON line {"metric", "value", "unit", "vs_baseline"}.
Baseline target: ≥2,000 denoise steps/sec/chip at 256×256 (BASELINE.md).
A "denoise step" is one UNet forward for one image (batch counts multiply).

The TPU is reached through a bandwidth-limited stdio relay, so the bench is
transfer-free: parameter init, input generation, and K data-dependency-
chained forwards all happen inside ONE jitted program that returns a single
scalar. Timing a steady-state call therefore measures device execution, not
pipe throughput; the scalar fetch is the ground-truth sync.
"""
import json
import time

import jax
import jax.numpy as jnp


def main():
    from tmdiff_tpu.models import WavBEST
    from tmdiff_tpu.models.clip_text import get_prompt_embedding

    batch = 8
    bands, H, W = 8, 256, 256
    chain_len = 8
    model = WavBEST(channels=(32, 64, 128, 256), dtype=jnp.bfloat16)
    emb = jnp.asarray(get_prompt_embedding("WV3"))  # (768,) — tiny transfer

    def init_params(rng):
        x1 = jnp.zeros((1, bands, H, W), jnp.float32)
        return model.init(
            rng, x1, jnp.zeros((1,), jnp.int32),
            jnp.zeros((1, 1, H, W), jnp.float32), x1, emb,
        )

    @jax.jit
    def bench_once(seed):
        rng = jax.random.key(seed)
        params = init_params(rng)
        x = jax.random.normal(jax.random.fold_in(rng, 1), (batch, bands, H, W))
        pan = jax.random.normal(jax.random.fold_in(rng, 2), (batch, 1, H, W))
        ms = jax.random.normal(jax.random.fold_in(rng, 3), (batch, bands, H, W))
        t = jnp.full((batch,), 500, jnp.int32)

        def body(_, v):
            return model.apply(params, v, t, pan, ms, emb)

        out = jax.lax.fori_loop(0, chain_len, body, x)
        return jnp.mean(out)

    # Compile + first run (scalar round-trip only). The dev TPU tunnel is
    # flaky (remote-compile HTTP hiccups); retry the cold call.
    last_err = None
    for attempt in range(3):
        try:
            t0 = time.perf_counter()
            sink = float(bench_once(0))
            compile_s = time.perf_counter() - t0
            break
        except Exception as err:  # pragma: no cover - environment flake
            last_err = err
            time.sleep(20)
    else:
        raise last_err

    reps = 3
    t0 = time.perf_counter()
    vals = [float(bench_once(i + 1)) for i in range(reps)]
    dt = time.perf_counter() - t0

    steps = reps * chain_len * batch
    steps_per_sec = steps / dt / jax.device_count()
    result = {
        "metric": "UNet denoise steps/sec/chip @256x256 (8-band, bf16, "
                  f"batch {batch}, fori-chained x{chain_len}, on-device init; "
                  "denoise-only path: cond encoder is loop-invariant and "
                  "LICM-hoisted, matching the samplers' cached-encoder "
                  f"regime — see BASELINE.md FLOP accounting; compile {compile_s:.0f}s)",
        "value": round(steps_per_sec, 2),
        "unit": "steps/sec/chip",
        "vs_baseline": round(steps_per_sec / 2000.0, 4),
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
