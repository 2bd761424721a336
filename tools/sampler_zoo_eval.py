"""Score every sampler family on a trained checkpoint.

Complements tools/train_convergence.py (which proves learning with dpm++):
loads the converged checkpoint and scores the OTHER sampler families the
framework ships — 1-NFE regression, ancestral (x0-consistent), ancestral
legacy (reference `p_mean_variance` noise-inversion replication,
`/root/reference/GeneralModel/diffusion_general.py:154-171`), and the
reference-default 30-step singlestep order-3 dpm++ — against the same val
sets and the lms identity baseline. Records which sampler families produce
usable imagery from one x0-trained model (the reference never quantifies
this; its val loop runs one sampler).

Usage: python tools/sampler_zoo_eval.py --root /tmp/tmdiff_convergence \
           [--platform tpu] [--out /tmp/sampler_zoo.json]
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
    p.add_argument("--out", default="/tmp/sampler_zoo.json")
    p.add_argument("--platform", default="cpu", choices=["cpu", "tpu"])
    p.add_argument("--timesteps", type=int, default=None,
                   help="override; default reads the convergence run's own "
                        "n_timestep (a mismatch scores silently wrong)")
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

    # channels come from the convergence run's own config (a hardcoded tuple
    # here would crash restore for non-default channel_multiplier runs)
    cfg = json.load(open(os.path.join(args.root, "convergence.json")))
    channels = tuple(cfg["model"]["unet"]["channel_multiplier"])
    if args.timesteps is None:
        args.timesteps = int(cfg["model"]["beta_schedule"]["train"]["n_timestep"])
    model = WavBEST(channels=channels)
    sharp = Pansharpener(model, params=None, schedule_name="cosine",
                         n_timestep=args.timesteps)

    val_sets = {
        "QB": PanDataset(os.path.join(args.root, "test_qb_data_RR.h5")),
        "WV3": PanDataset(os.path.join(args.root, "test_wv3_data_RR.h5")),
    }

    # restore the trained state through the template path
    ckpt_dir = sorted(glob.glob(
        os.path.join(args.root, "experiments", "*", "checkpoint")))[-1]
    b0 = val_sets["QB"].batch(np.arange(1))
    trainer = Trainer(model=model,
                      schedule=NoiseSchedule.create("cosine", args.timesteps))
    state0 = trainer.init_state(b0, np.asarray(sharp.prompt_embedding("QB")))
    state = ckpt_lib.restore_checkpoint(ckpt_dir, state0)
    print(f"restored step {int(state.step)} from {ckpt_dir}", flush=True)

    def score(ds, preds):
        gts = [ds[i]["HR"] for i in range(len(preds))]
        return M.mean_scores(gts, preds, round_to=4)

    # Pansharpener method map (pipeline.py::_build): "dpm++" = the
    # reference-default recipe (30-step singlestep order-3 logSNR +
    # denoise-to-zero); "dpm++_cfg" = classifier-free guidance over zeroed
    # MS; "ancestral" = full-T scan, optionally with the reference's
    # noise-inversion wart. Each (sampler, band-geometry) pair is one
    # compile — the heavier loops run on the 4-band set only.
    samplers = {
        "QB": [
            ("regression", {}),                          # 1 NFE
            ("dpm++", {}),                               # reference default
            ("dpm++_cfg", {"guidance": 3.0}),
            ("ancestral", {}),                           # 500-step scan
            ("ancestral", {"legacy_noise_inversion": True}),
            ("ddim", {"steps": 5}),                      # deterministic η=0
            ("ddim", {"steps": 1}),                      # in-range 1 NFE
        ],
        "WV3": [
            ("regression", {}),
            ("dpm++", {}),
            ("ddim", {"steps": 1}),
        ],
    }

    results = {"step": int(state.step)}
    from tmdiff_tpu.models.clip_text import clip_mode
    results["clip_mode"] = clip_mode()
    for sensor, ds in val_sets.items():
        idx = np.arange(len(ds))
        batch = ds.batch(idx)
        results[f"lms_{sensor}"] = score(ds, [ds[i]["MS"] for i in idx])
        for method, kw in samplers[sensor]:
            tag = method + ("_" + "_".join(f"{k}{v}" for k, v in kw.items())
                            if kw else "")
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
