"""End-to-end CLI smoke: config-driven train (3 steps, 3 sensors, mixing,
validation, .mat artifacts, checkpoint) then val phase with resume —
the synthetic-data equivalent of the reference entry script flow."""
import json
import os

import numpy as np
import pytest

from tmdiff_tpu.data.synthetic import write_h5


@pytest.fixture(scope="module")
def workspace(tmp_path_factory):
    root = tmp_path_factory.mktemp("cli")
    paths = {}
    for i, sensor in enumerate(["qb", "gf2", "wv3"]):
        scale = 1023.0 if sensor == "gf2" else 2047.0
        paths[f"train_{sensor}"] = write_h5(
            str(root / f"train_{sensor}_data.h5"), n=6, bands=4, size=16,
            seed=i, img_scale=scale,
        )
        paths[f"val_{sensor}"] = write_h5(
            str(root / f"test_{sensor}_data_RR.h5"), n=2, bands=4, size=16,
            seed=10 + i, img_scale=scale,
        )
    cfg = {
        "name": "smoke",
        "phase": "train",
        "path": {"log": "logs", "results": "results", "checkpoint": "checkpoint",
                 "resume": None},
        "datasets": {
            "train_qb": {"dataroot": paths["train_qb"], "batch_size": 2,
                          "use_shuffle": True, "data_len": -1},
            "train_gf2": {"dataroot": paths["train_gf2"], "batch_size": 2,
                           "use_shuffle": True, "data_len": -1},
            "train_wv3": {"dataroot": paths["train_wv3"], "batch_size": 2,
                           "use_shuffle": True, "data_len": -1},
            "val_QB": {"dataroot": paths["val_qb"], "data_len": 1},
            "val_GF2": {"dataroot": paths["val_gf2"], "data_len": 1},
            "val_WV3": {"dataroot": paths["val_wv3"], "data_len": 1},
        },
        "model": {
            "beta_schedule": {
                "train": {"schedule": "cosine", "n_timestep": 10},
                "val": {"schedule": "cosine", "n_timestep": 10},
            },
            "init_type": "kaiming",
            "unet": {"channel_multiplier": [4, 8, 8, 16]},
            "diffusion": {"loss_type": "l1"},
        },
        # max_iter NOT divisible by val_freq: the run must still end with a
        # final checkpoint (regression: runs ending between val boundaries
        # previously wrote no checkpoint at all)
        "train": {"val_freq": 3, "print_freq": 1, "max_iter": 4,
                  "optimizer": {"lr": 1e-3}},
        "val_max_images": 1,
    }
    cfg_path = root / "smoke.json"
    cfg_path.write_text(json.dumps(cfg))
    return root, str(cfg_path)


def test_train_phase_end_to_end(workspace, monkeypatch):
    root, cfg_path = workspace
    monkeypatch.chdir(root)
    from tmdiff_tpu import cli

    cli.main(["-c", cfg_path, "-p", "train", "--sampler", "regression"])
    exp = [d for d in (root / "experiments").iterdir()][0]
    assert (exp / "logs" / "train.log").exists()
    ckpts = list((exp / "checkpoint").glob("I*"))
    assert ckpts, "checkpoint not written"
    from tmdiff_tpu.train import checkpoint as ckpt_lib

    assert ckpt_lib.latest_step(str(exp / "checkpoint")) == 4, (
        "final (non-val-boundary) state not checkpointed")
    mats = list((exp / "results").rglob("output_mulExm_*.mat"))
    assert mats, ".mat artifacts not written"
    import scipy.io as scio

    mat = scio.loadmat(str(mats[0]))
    sr = mat["sr"]
    assert sr.shape == (16, 16, 4)
    # every eval artifact self-identifies its CLIP conditioning mode so
    # placeholder-table outputs can't masquerade as real-CLIP results
    from tmdiff_tpu.models.clip_text import clip_mode

    assert str(mat["clip_mode"][0]) == clip_mode()


def test_distill_phase_end_to_end(workspace, monkeypatch):
    """`-p distill`: progressive distillation as a first-class CLI workflow —
    resumes the teacher, runs halving phases over the sensor mixer, saves a
    per-phase student checkpoint, and validates with ddim(steps=N)."""
    root, cfg_path = workspace
    monkeypatch.chdir(root)
    from tmdiff_tpu import cli
    from tmdiff_tpu.train import checkpoint as ckpt_lib

    if not (root / "experiments").exists():  # robust under -k filtering
        cli.main(["-c", cfg_path, "-p", "train", "--sampler", "regression"])
    teacher_ckpt = sorted((root / "experiments").iterdir())[0] / "checkpoint"

    cfg = json.loads((root / "smoke.json").read_text())
    cfg["name"] = "smoke_distill"
    cfg["path"]["resume"] = str(teacher_ckpt)
    # T=10, N=5: seg=2, teacher half-jumps on integer times (T % 2N == 0)
    cfg["train"]["distill"] = {"phases": [5], "steps_per_phase": 2}
    distill_cfg = root / "smoke_distill.json"
    distill_cfg.write_text(json.dumps(cfg))

    cli.main(["-c", str(distill_cfg), "-p", "distill"])
    exp = [d for d in (root / "experiments").iterdir()
           if d.name.startswith("smoke_distill")][0]
    student_dir = str(exp / "checkpoint" / "distill_N5")
    assert ckpt_lib.latest_step(student_dir) == 2, "student not checkpointed"
    mats = list(exp.rglob("output_mulExm_*.mat"))
    assert mats, "ddim validation did not run"


@pytest.mark.slow  # two full CLI sessions ≈ 7 min; TMDIFF_RUN_SLOW=1 tier
def test_auto_resume_and_preemption(workspace, monkeypatch):
    """Production train-loop robustness: a SIGTERM mid-training checkpoints
    and exits cleanly; a re-run with `path.resume: "auto"` and a stable
    `path.experiments_root` picks up from that checkpoint (the reference
    requires hand-editing the resume path after every interruption)."""
    import os as _os
    import signal
    import threading
    import time

    root, cfg_path = workspace
    monkeypatch.chdir(root)
    from tmdiff_tpu import cli
    from tmdiff_tpu.train import checkpoint as ckpt_lib

    cfg = json.loads((root / "smoke.json").read_text())
    cfg["name"] = "smoke_auto"
    cfg["path"]["experiments_root"] = str(root / "exp_auto")
    cfg["path"]["resume"] = "auto"
    cfg["train"]["max_iter"] = 100_000  # never reached; SIGTERM ends it
    cfg["train"]["val_freq"] = 100_000
    auto_cfg = root / "smoke_auto.json"
    auto_cfg.write_text(json.dumps(cfg))
    log_path = root / "exp_auto" / "logs" / "train.log"

    def run_until(marker):
        """Run training; SIGTERM the process once `marker` shows in the log
        (i.e. after real progress, however long compiles take)."""
        done = threading.Event()

        def killer():
            deadline = time.time() + 400
            while not done.is_set() and time.time() < deadline:
                try:
                    if marker in log_path.read_text():
                        _os.kill(_os.getpid(), signal.SIGTERM)
                        return
                except OSError:
                    pass
                time.sleep(0.2)

        t = threading.Thread(target=killer, daemon=True)
        t.start()
        try:
            cli.main(["-c", str(auto_cfg), "-p", "train",
                      "--sampler", "regression"])
        finally:
            done.set()

    run_until("step 1 ")
    ckpt_dir = str(root / "exp_auto" / "checkpoint")
    step1 = ckpt_lib.latest_step(ckpt_dir)
    assert step1 is not None and step1 >= 1, "preemption checkpoint missing"

    # second run resumes past step1, gets preempted again, checkpoints later
    run_until(f"step {step1 + 1} ")
    step2 = ckpt_lib.latest_step(ckpt_dir)
    assert step2 > step1, f"auto-resume did not continue ({step1} -> {step2})"


def test_val_phase_with_resume(workspace, monkeypatch):
    root, cfg_path = workspace
    monkeypatch.chdir(root)
    exp = sorted((root / "experiments").iterdir())[0]
    ckpt_dir = str(exp / "checkpoint")

    cfg = json.loads((root / "smoke.json").read_text())
    cfg["path"]["resume"] = ckpt_dir
    cfg["name"] = "smoke_val"
    val_cfg = root / "smoke_val.json"
    val_cfg.write_text(json.dumps(cfg))

    from tmdiff_tpu import cli

    cli.main(["-c", str(val_cfg), "-p", "val", "--sampler", "regression"])
    val_exps = [d for d in (root / "experiments").iterdir()
                if d.name.startswith("smoke_val")]
    assert val_exps
    mats = list(val_exps[0].rglob("output_mulExm_*.mat"))
    assert mats
