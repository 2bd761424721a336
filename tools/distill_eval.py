"""Progressive-distillation proof: halve sampler NFE, keep quality.

Starting from the converged step-3000 checkpoint produced by
tools/train_convergence.py, run progressive-distillation phases
(train/distill.py; Salimans & Ho 2022) — N=10 with the all-t model as
teacher, then N=5 with the 10-step student as teacher — and score each
student with its matching `ddim(steps=N)` sampler against:

  * the teacher's reference-default dpm++ 30(+1)-NFE run,
  * the UNDISTILLED checkpoint through the same few-step ddim grid
    (what you'd get by just running fewer steps — the honest baseline),
  * the 1-NFE regression shortcut and the lms identity.

Sampling throughput is denoise-bound (BASELINE.md "sampling structural
ceiling"), so NFE reduction converts ≈ linearly into img/s: a 5-NFE student
at dpm++-30 quality is ≈ 6x serving throughput. The reference has no
distillation path at all.

Usage: python tools/distill_eval.py --root /tmp/tmdiff_convergence \
           [--platform tpu] [--phases 10,5] [--steps_per_phase 600]
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
    p.add_argument("--out", default="/tmp/distill_eval.json")
    p.add_argument("--platform", default="cpu", choices=["cpu", "tpu"])
    p.add_argument("--timesteps", type=int, default=500)
    p.add_argument("--phases", default="10,5",
                   help="halving chain; each N needs T %% 2N == 0 and the "
                        "previous phase's grid to contain its query times")
    p.add_argument("--steps_per_phase", type=int, default=600)
    p.add_argument("--batch", type=int, default=8)
    p.add_argument("--lr", type=float, default=1e-4)
    args = p.parse_args(argv)

    import jax

    if args.platform == "cpu":
        jax.config.update("jax_platforms", "cpu")

    import numpy as np

    from tmdiff_tpu.data import BatchIterator
    from tmdiff_tpu.data.h5 import PanDataset
    from tmdiff_tpu.eval import metrics as M
    from tmdiff_tpu.models import WavBEST
    from tmdiff_tpu.pipeline import Pansharpener
    from tmdiff_tpu.train import checkpoint as ckpt_lib
    from tmdiff_tpu.train.distill import DistillTrainer
    from tmdiff_tpu.train.trainer import Trainer
    from tmdiff_tpu.diffusion.schedules import NoiseSchedule

    cfg = json.load(open(os.path.join(args.root, "convergence.json")))
    channels = tuple(cfg["model"]["unet"]["channel_multiplier"])
    model = WavBEST(channels=channels)
    schedule = NoiseSchedule.create("cosine", args.timesteps)
    sharp = Pansharpener(model, params=None, schedule_name="cosine",
                         n_timestep=args.timesteps)

    train_sets = {
        s: PanDataset(os.path.join(args.root, f"train_{s.lower()}_data.h5"))
        for s in ("QB", "GF2", "WV3")
    }
    val_sets = {
        "QB": PanDataset(os.path.join(args.root, "test_qb_data_RR.h5")),
        "WV3": PanDataset(os.path.join(args.root, "test_wv3_data_RR.h5")),
    }

    base_ckpt = sorted(glob.glob(
        os.path.join(args.root, "experiments", "convergence_*", "checkpoint")))[-1]
    b0 = val_sets["QB"].batch(np.arange(1))
    emb_qb = np.asarray(sharp.prompt_embedding("QB"))
    tmpl = Trainer(model=model, schedule=schedule).init_state(b0, emb_qb)
    teacher = ckpt_lib.restore_checkpoint(base_ckpt, tmpl).params
    print(f"teacher: {base_ckpt}", flush=True)

    def score(ds, preds):
        gts = [ds[i]["HR"] for i in range(len(preds))]
        return M.mean_scores(gts, preds, round_to=4)

    def score_sampler(tag, params, method, **kw):
        for sensor, ds in val_sets.items():
            out = []
            for s in range(0, len(ds), 8):
                idx = np.arange(s, min(s + 8, len(ds)))
                out.extend(np.asarray(sharp.sample(
                    ds.batch(idx), sensor=sensor, method=method, seed=11,
                    params=params, **kw)))
            results[f"{tag}_{sensor}"] = score(ds, out)
            print(tag, sensor, results[f"{tag}_{sensor}"], flush=True)

    results = {"config": {"channels": channels, "phases": args.phases,
                          "steps_per_phase": args.steps_per_phase,
                          "timesteps": args.timesteps}}
    from tmdiff_tpu.models.clip_text import clip_mode
    
    results["clip_mode"] = clip_mode()
    for sensor, ds in val_sets.items():
        results[f"lms_{sensor}"] = score(
            ds, [ds[i]["MS"] for i in range(len(ds))])

    phases = [int(n) for n in args.phases.split(",")]
    # baselines on the UNDISTILLED teacher checkpoint
    score_sampler("teacher_dpm++30", teacher, "dpm++")
    score_sampler("teacher_regression1", teacher, "regression")
    for n in phases:
        score_sampler(f"undistilled_ddim{n}", teacher, "ddim", steps=n)

    # halving chain; mixed-sensor schedule mirrors the CLI's 4:4:8 weighting
    mix = ["QB", "GF2", "WV3", "WV3"]
    iters = {s: BatchIterator(train_sets[s], batch_size=args.batch, seed=5)
             for s in train_sets}
    embs = {s: np.asarray(sharp.prompt_embedding(s)) for s in train_sets}
    current_teacher = teacher
    for n in phases:
        trainer = DistillTrainer(
            model=model, schedule=schedule, n_student_steps=n,
            lr=args.lr, warmup_steps=20, max_iter=args.steps_per_phase,
        )
        state = trainer.state_from_params(current_teacher)
        # replicate over the trainer's mesh (a bare device_put would commit
        # to device 0 and clash with mesh-sharded batches on multi-device)
        from tmdiff_tpu.parallel import mesh as mesh_lib

        t_dev = jax.device_put(current_teacher,
                               mesh_lib.replicated(trainer.mesh))
        for k in range(args.steps_per_phase):
            sensor = mix[k % len(mix)]
            state, m = trainer.train_step(
                state, next(iters[sensor]), embs[sensor], t_dev)
            if k % 100 == 0 or k == args.steps_per_phase - 1:
                print(f"phase N={n} step {k} loss {float(m['l_pix']):.4e}",
                      flush=True)
        current_teacher = jax.device_get(state.params)
        score_sampler(f"distilled_ddim{n}", current_teacher, "ddim", steps=n)

    n_last = phases[-1]
    ok = all(
        results[f"distilled_ddim{n_last}_{s}"]["sam"]
        < results[f"undistilled_ddim{n_last}_{s}"]["sam"]
        and results[f"distilled_ddim{n_last}_{s}"]["sam"]
        < results[f"teacher_regression1_{s}"]["sam"]
        and results[f"distilled_ddim{n_last}_{s}"]["sam"]
        < results[f"lms_{s}"]["sam"]
        for s in val_sets
    )
    results["distill_effective"] = ok
    with open(args.out, "w") as f:
        json.dump(results, f, indent=2)
    print("RESULT", json.dumps(results), flush=True)
    print("PASS" if ok else "FAIL")
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
