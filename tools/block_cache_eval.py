"""Quality cost of cross-step block caching on the converged checkpoint.

Scores 20-step DDIM against its block-cached variants (deep trunk — down3 +
middle — refreshed every r-th NFE, shallow path in between;
`diffusion/gaussian.py::ddim_sample_blockcached`) on the convergence run's
val sets, same protocol as tools/sampler_zoo_eval.py. The speedup is
measured separately at flagship shapes (benchmarks/block_cache_bench.py);
this tool answers whether the staleness is visible in SAM/ERGAS/SSIM.

Usage: python tools/block_cache_eval.py --root /tmp/tmdiff_convergence \
           [--platform tpu] [--out /tmp/block_cache_eval.json]
"""
from __future__ import annotations

import argparse
import glob
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--root", default="/tmp/tmdiff_convergence")
    p.add_argument("--out", default="/tmp/block_cache_eval.json")
    p.add_argument("--platform", default="cpu", choices=["cpu", "tpu"])
    p.add_argument("--steps", type=int, default=20)
    p.add_argument("--variants", default="base",
                   choices=["base", "forecast", "masks", "level3"])
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

    val_sets = {
        "QB": PanDataset(os.path.join(args.root, "test_qb_data_RR.h5")),
        "WV3": PanDataset(os.path.join(args.root, "test_wv3_data_RR.h5")),
    }

    ckpt_dir = sorted(glob.glob(
        os.path.join(args.root, "experiments", "*", "checkpoint")))[-1]
    b0 = val_sets["QB"].batch(np.arange(1))
    trainer = Trainer(model=model,
                      schedule=NoiseSchedule.create("cosine", timesteps))
    state0 = trainer.init_state(b0, np.asarray(sharp.prompt_embedding("QB")))
    state = ckpt_lib.restore_checkpoint(ckpt_dir, state0)
    print(f"restored step {int(state.step)} from {ckpt_dir}", flush=True)

    def score(ds, preds):
        gts = [ds[i]["HR"] for i in range(len(preds))]
        return M.mean_scores(gts, preds, round_to=4)

    if args.variants == "base":
        variants = [
            ("ddim", {"steps": args.steps}),
            ("ddim_cached", {"steps": args.steps, "refresh_every": 2}),
            ("ddim_cached", {"steps": args.steps, "refresh_every": 4}),
            ("ddim_cached", {"steps": args.steps, "refresh_every": 2,
                             "cache_level": 2}),
            ("ddim_cached", {"steps": args.steps, "refresh_every": 4,
                             "cache_level": 2})]
    elif args.variants == "level3":  # the deploy-relevant subset (r5 big run)
        variants = [
            ("ddim", {"steps": args.steps}),
            ("ddim_cached", {"steps": args.steps, "refresh_every": 2,
                             "cache_level": 3}),
            ("ddim_cached", {"steps": args.steps, "refresh_every": 4,
                             "cache_level": 3})]
    elif args.variants == "forecast":  # level-3 trunk + forecasting (r4b)
        variants = [
            ("ddim", {"steps": args.steps}),
            ("ddim_cached", {"steps": args.steps, "refresh_every": 2,
                             "cache_level": 3}),
            ("ddim_cached", {"steps": args.steps, "refresh_every": 4,
                             "cache_level": 3}),
            ("ddim_cached", {"steps": args.steps, "refresh_every": 4,
                             "cache_level": 2, "forecast": True}),
            ("ddim_cached", {"steps": args.steps, "refresh_every": 2,
                             "cache_level": 3, "forecast": True}),
            ("ddim_cached", {"steps": args.steps, "refresh_every": 4,
                             "cache_level": 3, "forecast": True})]
    else:  # equal-budget refresh schedules (schedule-aware caching, r4b)
        # 7 refreshes in 20 steps (between r=2's 10 and r=4's 5), level 3:
        # does WHERE the refreshes sit move the staleness cost?
        def _mask(idx):
            m = [False] * args.steps
            for i in idx:
                m[i] = True
            return tuple(m)

        schedules = {
            "uni7": (0, 3, 6, 9, 12, 15, 18),      # uniform control
            "late7": (0, 4, 8, 12, 15, 17, 19),    # dense near t=0
            "early7": (0, 2, 4, 6, 9, 13, 17),     # dense near t=T
        }
        variants = [("ddim", {"steps": args.steps})] + [
            ("ddim_cached", {"steps": args.steps, "cache_level": 3,
                             "refresh_mask": _mask(idx), "_tag": name})
            for name, idx in schedules.items()]
    results = {"step": int(state.step), "clip_mode": clip_mode(),
               "steps": args.steps}
    for sensor, ds in val_sets.items():
        idx = np.arange(len(ds))
        batch = ds.batch(idx)
        results[f"lms_{sensor}"] = score(ds, [ds[i]["MS"] for i in idx])
        for method, kw in variants:
            kw = dict(kw)
            tag = method + ("_r%d" % kw["refresh_every"]
                            if "refresh_every" in kw else "")
            if kw.get("cache_level", 1) != 1:
                tag += "_L%d" % kw["cache_level"]
            if kw.get("forecast"):
                tag += "_F"
            if "_tag" in kw:
                tag += "_" + kw.pop("_tag")
            out = np.asarray(sharp.sample(batch, sensor=sensor, method=method,
                                          seed=7, params=state.params, **kw))
            results[f"{tag}_{sensor}"] = score(ds, list(out))
            print(sensor, tag, results[f"{tag}_{sensor}"], flush=True)

    with open(args.out, "w") as f:
        json.dump(results, f, indent=2)
    print("RESULT", json.dumps(results), flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
