"""ControlNet adapter cost on the real TPU: controlled vs plain LegacyUNet.

Same transfer-free methodology as bench.py (on-device init, fori-chained
forwards, scalar-fetch sync). Three variants at the flagship legacy
geometry (channels 32-256, 8-band, 256², batch 8, bf16):

  base        plain LegacyUNet forward
  controlled  ControlledLegacyUNet with an active hint (full control branch:
              trainable encoder copy + task-MoE hint encoder + zero convs)
  mid_only    only_mid_control=True (skip-level residuals dropped)

Expected: the control branch re-runs the x-encoder + middle and adds the
hint stem/trunk, so controlled ≈ 1.4-1.6x the base cost — the standard
ControlNet deal. Prints one JSON line per variant; results recorded in
BASELINE.md.
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

# Smoke mode: tiny shapes on forced CPU to validate the harness itself
# (TMDIFF_BENCH_SMOKE=1 python benchmarks/controlnet_bench.py).
SMOKE = bool(os.environ.get("TMDIFF_BENCH_SMOKE"))
if SMOKE:
    jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp

from tmdiff_tpu.models.controlnet import (
    TASKS_TO_ID,
    ControlledLegacyUNet,
    task_feature,
)
from tmdiff_tpu.models.legacy_unet import LegacyUNet

if SMOKE:
    BATCH, BANDS, H, W = 2, 4, 16, 16
    CHAIN = 2
    CH = (8, 12, 16, 20)
else:
    BATCH, BANDS, H, W = 8, 8, 256, 256
    CHAIN = 8
    CH = (32, 64, 128, 256)
TASK = "control_canny"


def run(label, model, with_hint):
    feat = jnp.asarray(task_feature(TASK))
    emb = jnp.zeros((768,), jnp.float32)

    def extra(rng):
        if not with_hint:
            return {}
        return {
            "hint": jax.random.normal(jax.random.fold_in(rng, 4), (BATCH, H, W, 3)),
            "task_id": TASKS_TO_ID[TASK],
            "task_feat": feat,
        }

    @jax.jit
    def bench_once(seed):
        rng = jax.random.key(seed)
        x1 = jnp.zeros((1, BANDS, H, W), jnp.float32)
        init_kw = (
            {"hint": jnp.zeros((1, H, W, 3)), "task_id": TASKS_TO_ID[TASK],
             "task_feat": feat}
            if with_hint else {}
        )
        params = model.init(rng, x1, jnp.zeros((1,), jnp.int32), x1, x1,
                            emb, **init_kw)
        x = jax.random.normal(jax.random.fold_in(rng, 1), (BATCH, BANDS, H, W))
        pan = jax.random.normal(jax.random.fold_in(rng, 2), (BATCH, BANDS, H, W))
        ms = jax.random.normal(jax.random.fold_in(rng, 3), (BATCH, BANDS, H, W))
        t = jnp.full((BATCH,), 500, jnp.int32)
        kw = extra(rng)

        def body(_, v):
            return model.apply(params, v, t, pan, ms, emb, **kw)

        return jnp.mean(jax.lax.fori_loop(0, CHAIN, body, x))

    last_err = None
    for _ in range(3):
        try:
            t0 = time.perf_counter()
            float(bench_once(0))
            compile_s = time.perf_counter() - t0
            break
        except Exception as err:  # pragma: no cover - tunnel flake
            last_err = err
            time.sleep(20)
    else:
        raise last_err

    reps = 3
    t0 = time.perf_counter()
    for i in range(reps):
        float(bench_once(i + 1))
    dt = time.perf_counter() - t0
    sps = reps * CHAIN * BATCH / dt / jax.device_count()
    print(json.dumps({
        "variant": label,
        "steps_per_sec_chip": round(sps, 2),
        "compile_s": round(compile_s, 1),
    }), flush=True)
    return sps


def main():
    base = run("base", LegacyUNet(channels=CH, dtype=jnp.bfloat16), False)
    ctrl = run("controlled",
               ControlledLegacyUNet(channels=CH, dtype=jnp.bfloat16), True)
    mid = run("mid_only",
              ControlledLegacyUNet(channels=CH, only_mid_control=True,
                                   dtype=jnp.bfloat16), True)
    print(json.dumps({
        "controlled_over_base": round(base / ctrl, 3),
        "mid_only_over_base": round(base / mid, 3),
    }), flush=True)


if __name__ == "__main__":
    main()
