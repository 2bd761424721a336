"""Greedy search for the best block-cache refresh schedule.

Block caching (`diffusion/gaussian.py::ddim_sample_blockcached`) takes an
arbitrary per-step refresh mask; `Pansharpener.sample` passes the mask as a
TRACED argument, so every schedule of one length shares a single compiled
program — which makes search cheap: each candidate costs one device call,
not one ~90-150 s tunnel compile.

This tool runs greedy backward elimination: start from the all-True mask
(identically plain DDIM), and repeatedly drop the refresh whose removal
hurts mean SAM (vs GT, over the convergence val sets) the least, down to
--min-budget. The whole greedy path is recorded, so one run yields the
budget-quality frontier AND, at each budget, a uniform-schedule control
scored with the same program — answering "does WHERE the refreshes sit
matter, and can a searched schedule beat uniform at equal cost?".

Same checkpoint/protocol as tools/block_cache_eval.py (convergence run,
seed 7, RR val sets). The reference has no analogue — its samplers re-run
the full network every NFE (`diffusion_general.py:227-255`).

Usage: python tools/schedule_search.py --root /tmp/tmdiff_convergence \
           [--platform tpu] [--min-budget 5] [--out /tmp/schedule_search.json]
"""
from __future__ import annotations

import argparse
import glob
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def segment_count(mask) -> int:
    """Compiled top-level scan segments of the static-specialized program
    for `mask` (`gaussian.py` concrete-mask path): chunks = maximal runs of
    [refresh, reuse…]; consecutive equal-length chunks roll into ONE scan,
    so the program has one segment per maximal run of equal chunk lengths.
    Each extra segment costs ~15 ms/sample-batch at flagship shapes
    (BASELINE.md 'Searched refresh schedules')."""
    starts = [i for i, m in enumerate(mask) if m]
    if not starts:
        return 0
    lens = [b - a for a, b in zip(starts, starts[1:] + [len(mask)])]
    return 1 + sum(1 for a, b in zip(lens, lens[1:]) if a != b)


def uniform_mask(steps: int, budget: int):
    """Budget refreshes spread evenly over `steps` steps (first always on)."""
    import numpy as np

    idx = np.round(np.linspace(0, steps, budget, endpoint=False)).astype(int)
    mask = [False] * steps
    for i in idx:
        mask[min(int(i), steps - 1)] = True
    # rounding collisions can drop below budget; backfill from the front
    for i in range(steps):
        if sum(mask) >= budget:
            break
        if not mask[i]:
            mask[i] = True
    mask[0] = True
    return tuple(mask)


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--root", default="/tmp/tmdiff_convergence")
    p.add_argument("--out", default="/tmp/schedule_search.json")
    p.add_argument("--platform", default="cpu", choices=["cpu", "tpu"])
    p.add_argument("--steps", type=int, default=20)
    p.add_argument("--cache-level", type=int, default=3)
    p.add_argument("--min-budget", type=int, default=5,
                   help="stop when this many refreshes remain")
    p.add_argument("--sensors", default="QB,WV3")
    p.add_argument("--form-tol", type=float, default=0.0,
                   help="program-form regularisation: among candidate drops "
                        "within this much mean-SAM of the round's best, "
                        "prefer the mask compiling to the fewest scan "
                        "segments (r5: each segment boundary costs ~15 ms "
                        "at deploy time — see segment_count). 0 keeps the "
                        "pure-quality r4 behaviour")
    args = p.parse_args(argv)

    import jax

    if args.platform == "cpu":
        jax.config.update("jax_platforms", "cpu")

    import numpy as np

    from tmdiff_tpu.data.h5 import PanDataset
    from tmdiff_tpu.eval import metrics as M
    from tmdiff_tpu.models import WavBEST
    from tmdiff_tpu.models.clip_text import clip_mode
    from tmdiff_tpu.pipeline import Pansharpener
    from tmdiff_tpu.train import checkpoint as ckpt_lib
    from tmdiff_tpu.train.trainer import Trainer
    from tmdiff_tpu.diffusion.schedules import NoiseSchedule

    cfg = json.load(open(os.path.join(args.root, "convergence.json")))
    channels = tuple(cfg["model"]["unet"]["channel_multiplier"])
    timesteps = int(cfg["model"]["beta_schedule"]["train"]["n_timestep"])
    model = WavBEST(channels=channels)
    sharp = Pansharpener(model, params=None, schedule_name="cosine",
                         n_timestep=timesteps)

    sensors = args.sensors.split(",")
    val_sets = {
        s: PanDataset(os.path.join(args.root, f"test_{s.lower()}_data_RR.h5"))
        for s in sensors}

    ckpt_dir = sorted(glob.glob(
        os.path.join(args.root, "experiments", "*", "checkpoint")))[-1]
    b0 = val_sets[sensors[0]].batch(np.arange(1))
    trainer = Trainer(model=model,
                      schedule=NoiseSchedule.create("cosine", timesteps))
    state0 = trainer.init_state(
        b0, np.asarray(sharp.prompt_embedding(sensors[0])))
    state = ckpt_lib.restore_checkpoint(ckpt_dir, state0)
    print(f"restored step {int(state.step)} from {ckpt_dir}", flush=True)

    # stage the val pixels on device ONCE: sample() calls jnp.asarray on the
    # batch, a no-op for device arrays — the greedy loop's ~hundreds of calls
    # must not re-push pixels through the bandwidth-limited tunnel each time
    import jax.numpy as jnp

    batches = {
        s: {k: jnp.asarray(v) for k, v in ds.batch(np.arange(len(ds))).items()}
        for s, ds in val_sets.items()}
    gts = {s: [ds[i]["HR"] for i in range(len(ds))]
           for s, ds in val_sets.items()}

    calls = 0

    def evaluate(mask):
        """mean SAM across sensors (objective) + per-sensor scores."""
        nonlocal calls
        per = {}
        for s in sensors:
            out = sharp.sample(
                batches[s], sensor=s, method="ddim_cached",
                steps=args.steps, cache_level=args.cache_level,
                refresh_mask=mask, seed=7, params=state.params)
            per[s] = M.mean_scores(gts[s], list(np.asarray(out)), round_to=5)
            calls += 1
        return float(np.mean([per[s]["sam"] for s in sensors])), per

    steps = args.steps
    mask = [True] * steps
    obj_full, per_full = evaluate(tuple(mask))
    print(f"all-True (= plain ddim): obj {obj_full:.5f}", flush=True)

    path = {steps: {"mask": list(mask), "objective": obj_full,
                    "scores": per_full,
                    "segments": segment_count(mask)}}
    while sum(mask) > args.min_budget:
        cands = []
        for i in range(1, steps):
            if not mask[i]:
                continue
            cand = list(mask)
            cand[i] = False
            obj, per = evaluate(tuple(cand))
            cands.append((obj, segment_count(cand), i, per))
        best_obj = min(c[0] for c in cands)
        # program-form tie-break: among quality-tied drops take the fewest
        # compiled segments (then lowest objective)
        obj, segs, drop, per = min(
            (c for c in cands if c[0] <= best_obj + args.form_tol),
            key=lambda c: (c[1], c[0]))
        mask[drop] = False
        budget = sum(mask)
        # uniform control at the same budget, same compiled program
        uni = uniform_mask(steps, budget)
        obj_uni, per_uni = evaluate(uni)
        path[budget] = {
            "mask": list(mask), "objective": obj, "scores": per,
            "segments": segs, "best_objective_unregularised": best_obj,
            "uniform_mask": list(uni), "uniform_objective": obj_uni,
            "uniform_scores": per_uni,
        }
        print(f"budget {budget}: dropped step {drop}, obj {obj:.5f} "
              f"segs {segs} (round best {best_obj:.5f}, uniform "
              f"{obj_uni:.5f})", flush=True)

    results = {"step": int(state.step), "clip_mode": clip_mode(),
               "steps": steps, "cache_level": args.cache_level,
               "objective": "mean SAM over " + ",".join(sensors),
               "device_calls": calls, "path": path}
    with open(args.out, "w") as f:
        json.dump(results, f, indent=2)
    print("RESULT", json.dumps(results), flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
