"""End-to-end CLI train throughput: async input pipeline A/B (real TPU).

Measures what a user of `python -m tmdiff_tpu.cli -p train` actually gets,
closing the gap analysis the r4 VERDICT asked for: the fused train step
does 94.3 img/s (batch 16 @64², BASELINE.md) but the r4 convergence runs
fed 12-22 img/s through the then-serial `next(mixer)` loop. Three numbers:

  * step-only ceiling — the jitted train step re-fed the SAME device-
    resident batch (no host work, no H2D): the device capability on this
    transport for this config.
  * e2e prefetch=0 — the old serial loop (assemble -> device_put -> step,
    nothing overlapped): the r4 baseline, reproduced via the knob.
  * e2e prefetch=2 — the DeviceFeeder pipeline (worker-thread assembly +
    one-batch-ahead sharded device_put overlapping the running step).

The residual (ceiling − prefetch=2) gap is H2D transfer the overlap cannot
hide when transfer time > step time — on the dev tunnel's stdio relay that
is most of it; on host-attached TPU (PCIe) the same code path is sub-ms per
batch. Reference analogue: torch DataLoader worker processes + pinned H2D
(`/root/reference/data/__init__.py:9-16`, `utils/util.py:158-161`).

Runs the REAL CLI train path (cli.main) on synthetic multi-scene data;
rates parsed from the run's train.log img/s lines (print_freq windows),
median over the steady tail. One process, one sensor (uniform shapes).
"""
import sys, os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import glob
import json
import statistics
import time

import numpy as np

B = int(os.environ.get("TMDIFF_BENCH_BATCH", "16"))
SIZE = int(os.environ.get("TMDIFF_BENCH_SIZE", "64"))
BANDS = int(os.environ.get("TMDIFF_BENCH_BANDS", "8"))
STEPS = int(os.environ.get("TMDIFF_BENCH_STEPS", "120"))
PRINT_FREQ = 20
CHANNELS = [int(c) for c in os.environ.get(
    "TMDIFF_BENCH_CHANNELS", "32,64,128,256").split(",")]

ROOT = os.environ.get("TMDIFF_BENCH_ROOT", "/tmp/train_e2e_bench")


def make_config(name, prefetch, data_path):
    return {
        "name": name,
        "phase": "train",
        "path": {"log": "logs", "results": "results",
                 "checkpoint": "checkpoint", "resume": None},
        "datasets": {
            "train_wv3": {"dataroot": data_path, "batch_size": B,
                          "use_shuffle": True, "data_len": -1},
        },
        "model": {
            "beta_schedule": {
                "train": {"schedule": "cosine", "n_timestep": 500},
                "val": {"schedule": "cosine", "n_timestep": 500},
            },
            "init_type": "torch",
            "unet": {"channel_multiplier": CHANNELS},
            "diffusion": {"loss_type": "l1"},
        },
        "train": {"val_freq": 10**9, "print_freq": PRINT_FREQ,
                  "max_iter": STEPS, "optimizer": {"lr": 1e-4},
                  "prefetch": prefetch},
    }


def parse_rates(exp_glob):
    d = sorted(glob.glob(exp_glob))[-1]
    rates = []
    for line in open(os.path.join(d, "logs", "train.log")):
        if "img/s: " in line:
            rates.append(float(line.rsplit("img/s: ", 1)[1]))
    # drop the first window (includes compile) — steady tail only
    return rates, (statistics.median(rates[1:]) if len(rates) > 1 else None)


def main():
    if os.environ.get("TMDIFF_BENCH_PLATFORM") == "cpu":
        # smoke-test harness: env vars are too late (jax pre-imported) —
        # only the config update moves the backend (CLAUDE.md)
        import jax

        jax.config.update("jax_platforms", "cpu")

    from tmdiff_tpu.data.synthetic import write_h5

    os.makedirs(ROOT, exist_ok=True)
    data_path = os.path.join(ROOT, f"train_wv3_{SIZE}_{BANDS}.h5")
    if not os.path.exists(data_path):
        write_h5(data_path, n=max(4 * B, 64), bands=BANDS, size=SIZE,
                 seed=0, img_scale=2047.0)

    os.chdir(ROOT)
    from tmdiff_tpu.cli import main as cli_main

    results = {}
    for prefetch in (0, 2):
        name = f"e2e_pf{prefetch}"
        cfg = make_config(name, prefetch, data_path)
        cfg_path = os.path.join(ROOT, name + ".json")
        json.dump(cfg, open(cfg_path, "w"))
        t0 = time.perf_counter()
        cli_main(["-c", cfg_path, "-p", "train"])
        wall = time.perf_counter() - t0
        rates, med = parse_rates(os.path.join(ROOT, "experiments", name + "_*"))
        results[name] = {"windows_img_s": rates, "median_img_s": med,
                         "wall_s": round(wall, 1)}
        print(f"{name}: windows {rates} -> median(steady) {med} img/s "
              f"(wall {wall:.0f}s incl. compile)", flush=True)

    # step-only ceiling: same trainer geometry, batch staged on device ONCE
    import jax
    import jax.numpy as jnp

    from tmdiff_tpu.diffusion.schedules import NoiseSchedule
    from tmdiff_tpu.models import WavBEST
    from tmdiff_tpu.models.clip_text import get_prompt_embedding
    from tmdiff_tpu.parallel import mesh as mesh_lib
    from tmdiff_tpu.train.trainer import Trainer

    model = WavBEST(channels=tuple(CHANNELS))
    trainer = Trainer(model=model, schedule=NoiseSchedule.create("cosine", 500),
                      lr=1e-4, max_iter=STEPS)
    rng = np.random.default_rng(0)
    batch = {
        "Res": rng.standard_normal((B, BANDS, SIZE, SIZE)).astype(np.float32),
        "PAN": rng.standard_normal((B, 1, SIZE, SIZE)).astype(np.float32),
        "MS": rng.standard_normal((B, BANDS, SIZE, SIZE)).astype(np.float32),
    }
    emb = jnp.asarray(get_prompt_embedding("WV3"))
    dev_batch = mesh_lib.shard_batch(trainer.mesh, batch)
    state = trainer.init_state(batch, np.asarray(emb))
    step = trainer.compiled_step()
    state, m = step(state, dev_batch, emb)          # compile
    jax.block_until_ready(m["l_pix"])
    warm = 4
    for _ in range(warm):
        state, m = step(state, dev_batch, emb)
    float(m["l_pix"])                               # sync (relay-safe)
    n = 24
    t0 = time.perf_counter()
    for _ in range(n):
        state, m = step(state, dev_batch, emb)
    float(m["l_pix"])
    dt = time.perf_counter() - t0
    ceiling = B * n / dt
    results["step_only"] = {"img_s": round(ceiling, 1)}
    print(f"step_only ceiling: {ceiling:.1f} img/s", flush=True)

    out = os.environ.get("TMDIFF_BENCH_OUT", "/tmp/train_e2e_bench.json")
    json.dump({"batch": B, "size": SIZE, "bands": BANDS,
               "channels": CHANNELS, "steps": STEPS, **results},
              open(out, "w"), indent=2)
    print("done ->", out)


if __name__ == "__main__":
    main()
