"""Config-driven train / val entry point.

Mirrors `/root/reference/general_sharpening_joint_random_batch_finetune.py`:
  python -m tmdiff_tpu.cli -c config.json -p train|val [-debug]
Builds per-sensor train iterators (train_qb / train_gf2 / train_wv3 dataset
entries), joint random-batch mixing with 4:4:8 length-weighted probabilities,
periodic validation (val_QB / val_GF2 / val_WV3) with .mat artifacts and
metric logging, and orbax checkpoints. `-gpu` is accepted for CLI parity but
ignored (device selection is JAX's).
"""
from __future__ import annotations

import argparse
import logging
import os
import sys

import numpy as np

from tmdiff_tpu.config import dict2str, parse_config


def setup_logger(name, root, filename, screen=False):
    logger = logging.getLogger(name)
    logger.setLevel(logging.INFO)
    # drop handlers from any previous run in this process — otherwise a
    # second main() (tests, notebooks) keeps writing into the old run's files
    for h in list(logger.handlers):
        logger.removeHandler(h)
        h.close()
    fmt = logging.Formatter(
        "%(asctime)s.%(msecs)03d - %(levelname)s: %(message)s", "%y-%m-%d %H:%M:%S"
    )
    fh = logging.FileHandler(os.path.join(root, f"{filename}.log"), mode="w")
    fh.setFormatter(fmt)
    logger.addHandler(fh)
    if screen:
        sh = logging.StreamHandler()
        sh.setFormatter(fmt)
        logger.addHandler(sh)
    return logger


def snapshot_provenance(opt, config_path: str):
    """Reproducibility snapshot into the experiments dir — the reference
    copies its entry script + GeneralModel/ + config/ into results
    (`general_…finetune.py:119-123`); we snapshot the resolved config, the
    package source tree, and the git revision."""
    import json
    import shutil
    import subprocess

    root = opt["path"]["experiments_root"]
    code_dir = os.path.join(root, "code")
    pkg_dir = os.path.dirname(os.path.abspath(__file__))
    if not os.path.exists(code_dir):
        shutil.copytree(
            pkg_dir, os.path.join(code_dir, "tmdiff_tpu"),
            ignore=shutil.ignore_patterns("__pycache__", "*.pyc", "*.so"),
        )
    shutil.copyfile(config_path,
                    os.path.join(root, os.path.basename(config_path)))
    try:
        rev = subprocess.run(
            ["git", "rev-parse", "HEAD"], cwd=pkg_dir,
            capture_output=True, text=True, timeout=10,
        ).stdout.strip()
    except Exception:
        rev = ""
    with open(os.path.join(root, "provenance.json"), "w") as f:
        json.dump({"git_rev": rev, "config": dict(opt),
                   "argv": sys.argv}, f, indent=2, default=str)


SENSOR_OF_PHASE = {
    "train_qb": "QB", "train_gf2": "GF2", "train_wv3": "WV3",
    "val_QB": "QB", "val_GF2": "GF2", "val_WV3": "WV3",
}


def build_datasets(opt, phase):
    from tmdiff_tpu.data import BatchIterator, PanDataset, SensorMixer

    # explicit None check: seed=0 is a valid, distinct seed
    seed_opt = (opt["train"] or {}).get("seed")
    seed = 3407 if seed_opt is None else int(seed_opt)
    train_iters, val_sets = {}, {}
    for name, ds_opt in (opt["datasets"] or {}).items():
        sensor = SENSOR_OF_PHASE.get(name)
        if sensor is None:
            continue
        if name.startswith("train") and phase == "train":
            ds = PanDataset(ds_opt["dataroot"], data_len=ds_opt["data_len"] or -1)
            train_iters[sensor] = BatchIterator(
                ds, batch_size=ds_opt["batch_size"] or 8,
                shuffle=bool(ds_opt["use_shuffle"]), seed=seed,
            )
        elif name.startswith("val"):
            val_sets[sensor] = PanDataset(
                ds_opt["dataroot"], data_len=ds_opt["data_len"] or -1
            )
    mixer = SensorMixer(train_iters, seed=seed) if train_iters else None
    return mixer, val_sets


def make_feeder(mixer, sharp, trainer, train_opt):
    """Async input pipeline for the train/distill loops: host batch assembly
    (h5 slicing + C++ gather) on a worker thread, sharded `device_put` one
    batch ahead, per-sensor prompt embeddings staged on device once. The
    reference gets this from DataLoader worker processes + pinned H2D
    (`data/__init__.py:9-16`, `utils/util.py:158-161`); `train.prefetch = 0`
    reproduces the old fully-serial loop (the A/B baseline). The consumed
    batch sequence is identical either way (prefetching preserves order)."""
    import jax

    from tmdiff_tpu.parallel import mesh as mesh_lib
    from tmdiff_tpu.runtime.prefetch import DeviceFeeder

    emb_cache = {}

    def stage(item):
        batch, sensor = item
        emb = emb_cache.get(sensor)
        if emb is None:
            emb = jax.device_put(
                np.asarray(sharp.prompt_embedding(sensor)),
                mesh_lib.replicated(trainer.mesh),
            )
            emb_cache[sensor] = emb
        dev = mesh_lib.shard_batch(
            trainer.mesh, {k: batch[k] for k in ("Res", "PAN", "MS")}
        )
        return dev, emb, len(batch["Res"])

    depth_opt = train_opt.get("prefetch")
    depth = 2 if depth_opt is None else int(depth_opt)
    return DeviceFeeder(mixer, stage, depth=depth, ahead=depth > 0)


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("-c", "--config", type=str, required=True)
    parser.add_argument("-p", "--phase", type=str, default="val",
                        choices=["train", "val", "distill"])
    parser.add_argument("-gpu", "--gpu_ids", type=str, default=None)  # parity; unused
    parser.add_argument("-debug", "-d", action="store_true", dest="debug")
    parser.add_argument("-log_eval", action="store_true")
    parser.add_argument("--sampler", type=str, default="dpm++",
                        choices=["dpm++", "dpm++_noise", "ancestral",
                                 "regression", "ddim"])
    args = parser.parse_args(argv)

    opt = parse_config(args.config, phase=args.phase, debug=args.debug)
    opt["log_eval"] = args.log_eval

    # Graceful preemption: install stop handlers BEFORE the (minutes-long on
    # a cold cache) model build, so a SIGTERM at any point after startup
    # requests a clean checkpoint-and-exit instead of killing the process.
    # Signals are only touchable from the main thread (signal.signal raises
    # ValueError elsewhere — embedded/test harnesses run main() in workers).
    import threading

    stop = {"flag": False}
    prev_handlers = {}
    if (args.phase in ("train", "distill")
            and threading.current_thread() is threading.main_thread()):
        import signal

        def _request_stop(signum, frame):
            if stop["flag"] and signum == signal.SIGINT:
                # second Ctrl-C: abort immediately — the flag is only polled
                # between train steps, which during a minutes-long compile
                # would otherwise swallow the interrupt entirely
                raise KeyboardInterrupt
            stop["flag"] = True

        for s in (signal.SIGTERM, signal.SIGINT):
            prev_handlers[s] = signal.signal(s, _request_stop)
    try:
        _run(args, opt, stop)
    finally:
        # restore even when _run raises before reaching the train loop
        if prev_handlers:
            import signal

            for s, h in prev_handlers.items():
                signal.signal(s, h)


def _run(args, opt, stop):
    logger = setup_logger("base", opt["path"]["log"], "train", screen=True)
    val_logger = setup_logger("val", opt["path"]["log"], "val")
    logger.info(opt.get("info", opt["name"]))
    logger.info(dict2str(opt))
    snapshot_provenance(opt, args.config)

    from tmdiff_tpu.diffusion.schedules import NoiseSchedule
    from tmdiff_tpu.eval.harness import validate
    from tmdiff_tpu.models import WavBEST
    from tmdiff_tpu.pipeline import Pansharpener
    from tmdiff_tpu.train.trainer import Trainer
    from tmdiff_tpu.train import checkpoint as ckpt_lib

    mixer, val_sets = build_datasets(
        opt, "train" if args.phase == "distill" else args.phase)
    logger.info("Initial Dataset Finished")

    sched_opt = opt["model"]["beta_schedule"][
        "val" if args.phase == "val" else "train"]
    channels = tuple(opt["model"]["unet"]["channel_multiplier"] or (32, 64, 128, 256))
    model = WavBEST(channels=channels)
    schedule = NoiseSchedule.create(sched_opt["schedule"], sched_opt["n_timestep"])

    # SPMD mesh: every visible chip by default (data parallelism), shaped by
    # an optional `parallel: {"data": N, "space": M}` config block. The same
    # mesh drives training AND validation sampling; single-chip runs skip it.
    import jax

    mesh = None
    par_opt = opt["parallel"] or {}
    if jax.device_count() > 1 or par_opt.get("data") or par_opt.get("space"):
        from tmdiff_tpu.parallel import make_mesh

        space = int(par_opt.get("space") or 1)
        data = int(par_opt.get("data") or (jax.device_count() // space))
        mesh = make_mesh(data=data, space=space)
        logger.info(f"SPMD mesh: data={data} space={space} "
                    f"({jax.device_count()} devices)")

    train_opt = opt["train"] or {}
    trainer = Trainer(
        model=model,
        schedule=schedule,
        lr=(train_opt.get("optimizer") or {}).get("lr", 1e-4),
        max_iter=train_opt.get("max_iter", 300_000),
        loss_type=(opt["model"]["diffusion"] or {}).get("loss_type", "l1"),
        p_uncond=train_opt.get("p_uncond", 0.0),
        seed=(3407 if train_opt.get("seed") is None
              else int(train_opt.get("seed"))),
        mesh=mesh,
    )

    # Init / resume state.
    if args.phase in ("train", "distill"):
        first_batch, first_sensor = next(mixer)
    else:
        sensor0, ds0 = next(iter(val_sets.items()))
        first_batch, first_sensor = ds0.batch(np.arange(1)), sensor0

    # One facade instance: prompt table + jitted sampler cache reused across
    # the run; per-call params select online vs EMA weights.
    sharp = Pansharpener(
        model, params=None,
        schedule_name=sched_opt["schedule"], n_timestep=sched_opt["n_timestep"],
        mesh=mesh,
    )
    prompt_emb = np.asarray(sharp.prompt_embedding(first_sensor))
    state = trainer.init_state(first_batch, prompt_emb)

    init_type = opt["model"]["init_type"]
    if args.phase == "train" and init_type:
        import jax
        from tmdiff_tpu.models.init_styles import apply_init_style

        # init RNG: key 7 when train.seed is unset (bit-reproduces every
        # artifact recorded before the knob existed), else derived from it
        # (None check, not truthiness: seed=0 is a valid seed)
        seed_opt = (opt["train"] or {}).get("seed")
        init_key = jax.random.key(
            7 if seed_opt is None else int(seed_opt) + 7)
        styled = apply_init_style(state.params, init_type, init_key)
        state = state.replace(
            params=styled, ema_params=jax.tree.map(lambda x: x.copy(), styled)
        )
        logger.info(f"Applied init_type [{init_type}]")

    resume = opt["path"]["resume"]
    if resume == "auto":
        # preemption-friendly resume: restart with the same config and pick
        # up the newest checkpoint in this experiment's checkpoint dir (the
        # reference requires hand-editing the resume path after every crash)
        ckpt_dir = opt["path"]["checkpoint"]
        if ckpt_lib.latest_step(ckpt_dir) is not None:
            state = ckpt_lib.restore_checkpoint(ckpt_dir, state)
            logger.info(
                f"Auto-resumed from {ckpt_dir} at step {int(state.step)}")
        else:
            logger.info(f"Auto-resume: no checkpoint in {ckpt_dir}, fresh start")
    elif resume:
        if resume.endswith(".pth") or os.path.exists(resume + "_gen.pth"):
            path = resume if resume.endswith(".pth") else resume + "_gen.pth"
            state = ckpt_lib.import_reference_checkpoint(path, state)
            logger.info(f"Imported reference torch checkpoint {path}")
        else:
            state = ckpt_lib.restore_checkpoint(resume, state)
            logger.info(f"Restored checkpoint from {resume}")
    current_step = int(state.step)
    logger.info("Initial Model Finished")

    def run_validation(state, method=None, steps=None, use_ema=None):
        if use_ema is None:
            use_ema = bool(train_opt.get("use_ema_eval"))
        eval_params = state.ema_params if use_ema else state.params
        for sensor, ds in val_sets.items():
            scores = validate(
                sharp, ds, sensor,
                result_dir=os.path.join(opt["path"]["results"], sensor),
                method=method or args.sampler,
                steps=steps,
                batch_size=int(opt.get("val_batch_size") or 4),
                max_images=int(opt.get("val_max_images") or -1),
                params=eval_params,
                log_file=(
                    os.path.join(opt["path"]["results"], "eval_metrics.jsonl")
                    if opt["log_eval"] else None
                ),
            )
            logger.info(f"step {int(state.step)} {sensor} {scores}")
            val_logger.info(f"step {int(state.step)} {sensor} {scores}")
            print(int(state.step), sensor, scores)

    if args.phase == "train":
        max_iter = train_opt.get("max_iter", 300_000)
        print_freq = train_opt.get("print_freq", 50)
        val_freq = train_opt.get("val_freq", 5000)

        import time as _time

        last_print = (_time.monotonic(), current_step)
        last_saved = current_step  # resume point (or 0) is already on disk
        feeder = make_feeder(mixer, sharp, trainer, train_opt)
        try:
            while current_step < max_iter and not stop["flag"]:
                dev_batch, emb, bsz = next(feeder)
                state, metrics = trainer.train_step(state, dev_batch, emb)
                current_step += 1
                if current_step % print_freq == 0:
                    now = _time.monotonic()
                    dt = now - last_print[0]
                    dsteps = current_step - last_print[1]
                    last_print = (now, current_step)
                    rate = (dsteps * bsz / dt) if dt > 0 else 0.0
                    logger.info(
                        f"step {current_step} "
                        + " ".join(f"{k}: {float(v):.3e}"
                                   for k, v in metrics.items())
                        + f" img/s: {rate:.1f}"
                    )
                if current_step % val_freq == 0:
                    run_validation(state)
                    ckpt_lib.save_checkpoint(
                        opt["path"]["checkpoint"], state,
                        keep=train_opt.get("ckpt_keep"),  # None = keep all (ref)
                    )
                    last_saved = current_step
        finally:
            feeder.close()
        if current_step != last_saved:
            # normal completion (or preemption) between val boundaries: the
            # final state must still land on disk — a max_iter not divisible
            # by val_freq previously ended the run with NO checkpoint at all
            path = ckpt_lib.save_checkpoint(
                opt["path"]["checkpoint"], state,
                keep=train_opt.get("ckpt_keep"),
            )
            if stop["flag"]:
                logger.info(
                    f"Preemption signal: checkpointed step {current_step} "
                    f"to {path}; resume with path.resume='auto'"
                )
            else:
                logger.info(f"Final checkpoint: step {current_step} to {path}")
    elif args.phase == "distill":
        # Progressive distillation as a first-class workflow (train/distill.py;
        # results/methodology: BASELINE.md "Progressive distillation"). Config:
        #   "train": {"distill": {"phases": [10, 5], "steps_per_phase": 600,
        #                          "lr": 1e-4}}
        # `path.resume` must point at the teacher checkpoint. Each phase-N
        # student is checkpointed under checkpoint/distill_N{N} and validated
        # with its matching ddim(steps=N) sampler.
        import jax

        from tmdiff_tpu.parallel import mesh as mesh_lib
        from tmdiff_tpu.train.distill import DistillTrainer

        if not resume:
            raise ValueError(
                "distill phase requires path.resume = the teacher checkpoint")
        d_opt = train_opt.get("distill") or {}
        phases = [int(n) for n in (d_opt.get("phases") or [10, 5])]
        steps_per_phase = int(d_opt.get("steps_per_phase") or 600)
        print_freq = train_opt.get("print_freq", 50)
        # Distill from the weights the teacher checkpoint actually deploys:
        # EMA when use_ema_eval (validation/serving use those), overridable
        # per-config via distill.teacher = "ema"|"online".
        teacher_kind = d_opt.get("teacher") or (
            "ema" if train_opt.get("use_ema_eval") else "online")
        if teacher_kind not in ("ema", "online"):
            raise ValueError(
                f"train.distill.teacher must be 'ema' or 'online', got "
                f"{teacher_kind!r}")
        teacher = state.ema_params if teacher_kind == "ema" else state.params
        logger.info(f"Begin progressive distillation: phases={phases} "
                    f"steps_per_phase={steps_per_phase} from step "
                    f"{int(state.step)} {teacher_kind} teacher")
        feeder = make_feeder(mixer, sharp, trainer, train_opt)
        try:
            for n in phases:
                if stop["flag"]:
                    break
                done_steps = 0
                d_trainer = DistillTrainer(
                    model=model, schedule=schedule, n_student_steps=n,
                    lr=float(d_opt.get("lr") or 1e-4), warmup_steps=20,
                    max_iter=steps_per_phase,
                    loss_type=trainer.loss_type, mesh=trainer.mesh,
                )
                p_state = d_trainer.state_from_params(teacher)
                t_dev = jax.device_put(
                    teacher, mesh_lib.replicated(d_trainer.mesh))
                for k in range(steps_per_phase):
                    if stop["flag"]:
                        break
                    dev_batch, emb, _ = next(feeder)
                    p_state, m = d_trainer.train_step(
                        p_state, dev_batch, emb, t_dev)
                    done_steps = k + 1
                    if (k + 1) % print_freq == 0:
                        logger.info(f"distill N={n} step {k + 1} "
                                    f"l_distill: {float(m['l_pix']):.3e}")
                # the phase EMA is teacher-seeded and barely moves over a short
                # phase (0.9999^600 ≈ 94% teacher) — persist the STUDENT in both
                # weight slots so --use-ema consumers can't silently deploy the
                # teacher through a few-step sampler it was never distilled for
                p_state = p_state.replace(ema_params=jax.tree.map(
                    lambda x: x.copy(), p_state.params))
                if stop["flag"] and done_steps < steps_per_phase:
                    # preempted mid-phase: label the artifact as partial and skip
                    # validation (a multi-minute sampler compile has no place in
                    # the preemption grace window). Distill restarts re-run the
                    # chain from path.resume — the partial student is evidence,
                    # not a resume point.
                    path = ckpt_lib.save_checkpoint(
                        os.path.join(opt["path"]["checkpoint"],
                                     f"distill_N{n}_partial"),
                        p_state,
                    )
                    logger.info(
                        f"Preemption signal: phase N={n} stopped at step "
                        f"{done_steps}/{steps_per_phase}; PARTIAL student "
                        f"checkpointed to {path}, validation skipped")
                    break
                teacher = p_state.params
                path = ckpt_lib.save_checkpoint(
                    os.path.join(opt["path"]["checkpoint"], f"distill_N{n}"),
                    p_state,
                )
                logger.info(f"distill N={n} done -> {path}")
                # score the STUDENT params (use_ema=False belt-and-braces even
                # though ema_params now also hold the student)
                run_validation(p_state, method="ddim", steps=n, use_ema=False)

        finally:
            feeder.close()
    else:
        logger.info("Begin Model Evaluation.")
        run_validation(state)


if __name__ == "__main__":
    main()
