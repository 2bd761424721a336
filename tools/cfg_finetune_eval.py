"""Prove CFG works once the model is dropout-trained (`Trainer.p_uncond`).

BASELINE.md's sampler zoo quantifies the no-dropout CFG failure (SAM 40.5 vs
0.34 — the model never saw a zeroed MS, exactly the upstream situation:
`classifier_free_guidance_train`, `diffusion_general.py:385-397`, has zero
callers). This tool fine-tunes the converged step-3000 checkpoint from
tools/train_convergence.py for --extra_steps with per-sample condition
dropout, then re-scores `dpm++_cfg` at several guidance scales against the
plain `dpm++` sampler and the lms identity baseline.

Usage: python tools/cfg_finetune_eval.py --root /tmp/tmdiff_convergence \
           [--platform tpu] [--p_uncond 0.2] [--extra_steps 1000]
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
    p.add_argument("--out", default="/tmp/cfg_finetune.json")
    p.add_argument("--platform", default="cpu", choices=["cpu", "tpu"])
    p.add_argument("--timesteps", type=int, default=500)
    p.add_argument("--extra_steps", type=int, default=1000)
    p.add_argument("--p_uncond", type=float, default=0.2)
    p.add_argument("--guidances", default="1.0,3.0")
    args = p.parse_args(argv)

    import jax

    if args.platform == "cpu":
        jax.config.update("jax_platforms", "cpu")

    import numpy as np

    from tmdiff_tpu.data.h5 import PanDataset
    from tmdiff_tpu.eval import metrics as M
    from tmdiff_tpu.models import WavBEST
    from tmdiff_tpu.pipeline import Pansharpener
    from tmdiff_tpu.train import checkpoint as ckpt_lib
    from tmdiff_tpu.train.trainer import Trainer
    from tmdiff_tpu.diffusion.schedules import NoiseSchedule

    os.chdir(args.root)
    base_ckpt = sorted(glob.glob(
        os.path.join(args.root, "experiments", "convergence_*", "checkpoint")))[-1]
    base_step = ckpt_lib.latest_step(base_ckpt)
    print(f"fine-tuning from {base_ckpt} step {base_step}", flush=True)

    # same data/model as the convergence run; +extra_steps with dropout
    cfg = json.load(open(os.path.join(args.root, "convergence.json")))
    cfg["name"] = "cfg_finetune"
    cfg["train"]["max_iter"] = base_step + args.extra_steps
    cfg["train"]["p_uncond"] = args.p_uncond
    cfg["train"]["val_freq"] = 10 ** 9  # no mid-train val; we score below
    cfg["path"]["resume"] = base_ckpt
    cfg_path = os.path.join(args.root, "cfg_finetune.json")
    json.dump(cfg, open(cfg_path, "w"))

    from tmdiff_tpu import cli

    cli.main(["-c", cfg_path, "-p", "train", "--sampler", "dpm++"])

    channels = tuple(cfg["model"]["unet"]["channel_multiplier"])
    model = WavBEST(channels=channels)
    sharp = Pansharpener(model, params=None, schedule_name="cosine",
                         n_timestep=args.timesteps)
    val_sets = {
        "QB": PanDataset(os.path.join(args.root, "test_qb_data_RR.h5")),
        "WV3": PanDataset(os.path.join(args.root, "test_wv3_data_RR.h5")),
    }
    ft_ckpt = sorted(glob.glob(
        os.path.join(args.root, "experiments", "cfg_finetune_*",
                     "checkpoint")))[-1]
    b0 = val_sets["QB"].batch(np.arange(1))
    trainer = Trainer(model=model,
                      schedule=NoiseSchedule.create("cosine", args.timesteps))
    state0 = trainer.init_state(b0, np.asarray(sharp.prompt_embedding("QB")))
    state = ckpt_lib.restore_checkpoint(ft_ckpt, state0)
    print(f"restored fine-tuned step {int(state.step)}", flush=True)

    def score(ds, preds):
        gts = [ds[i]["HR"] for i in range(len(preds))]
        return M.mean_scores(gts, preds, round_to=4)

    results = {"step": int(state.step), "p_uncond": args.p_uncond}
    from tmdiff_tpu.models.clip_text import clip_mode
    results["clip_mode"] = clip_mode()
    for sensor, ds in val_sets.items():
        idx = np.arange(len(ds))
        batch = ds.batch(idx)
        results[f"lms_{sensor}"] = score(ds, [ds[i]["MS"] for i in idx])
        runs = [("dpm++", {})] + [
            ("dpm++_cfg", {"guidance": float(g)})
            for g in args.guidances.split(",")
        ]
        if sensor != "QB":  # CFG compiles are 2x-batched; sweep QB only
            runs = runs[:1]
        for method, kw in runs:
            tag = method + ("".join(f"_g{v}" for v in kw.values()) if kw else "")
            out = np.asarray(sharp.sample(batch, sensor=sensor, method=method,
                                          seed=7, params=state.params, **kw))
            results[f"{tag}_{sensor}"] = score(ds, list(out))
            print(sensor, tag, results[f"{tag}_{sensor}"], flush=True)

    # pass = CFG has a usable operating point: SOME guidance in the sweep is
    # within 3x of plain dpm++ SAM (vs 119x at every scale before dropout
    # training) and still beats lms. Guidance is a user knob — the r3 sweep
    # shows the usual CFG curve (mild scales fine, large scales
    # over-extrapolate), so "all scales pass" was the wrong bar; the curve
    # itself is the capability evidence and is recorded in full.
    usable = [
        g for g in args.guidances.split(",")
        if results[f"dpm++_cfg_g{float(g)}_QB"]["sam"]
        < 3.0 * results["dpm++_QB"]["sam"]
        and results[f"dpm++_cfg_g{float(g)}_QB"]["sam"]
        < results["lms_QB"]["sam"]
    ]
    ok = bool(usable)
    results["cfg_usable"] = ok
    results["usable_guidances"] = usable
    # The serving CLI ships a default CFG operating point
    # (serve/__main__.py SERVE_GUIDANCE_DEFAULT); read it from there — not a
    # copy — and record whether it is in the usable set so a PASS here can't
    # silently coexist with an over-extrapolating deployed default.
    from tmdiff_tpu.serve.__main__ import SERVE_GUIDANCE_DEFAULT

    serve_default = SERVE_GUIDANCE_DEFAULT
    results["serve_default_guidance"] = serve_default
    results["serve_default_usable"] = any(
        float(g) == serve_default for g in usable)
    if ok and not results["serve_default_usable"]:
        print(f"WARNING: serve default guidance {serve_default} is NOT in "
              f"the usable set {usable} — pass --guidance from the sweep "
              f"when serving this checkpoint", flush=True)
    with open(args.out, "w") as f:
        json.dump(results, f, indent=2)
    print("RESULT", json.dumps(results), flush=True)
    print("PASS" if ok else "FAIL")
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
