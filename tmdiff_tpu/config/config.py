"""Config system: commented JSON → NoneDict tree + experiments dir layout.

Behavioral contract (`/root/reference/core/logger.py:21-127`):
  * JSON configs may carry `//` comments — stripped per line;
  * missing keys read as None at any depth (NoneDict);
  * a timestamped `experiments/{name}_{ts}` tree is created with the
    `path` entries (log / results / checkpoint / tb_logger) rebased into it,
    except resume-like keys;
  * `-debug` prefixes the name with `debug_` and shrinks
    freqs/timesteps/data lengths for smoke runs.

Deviation: no CUDA_VISIBLE_DEVICES export — device selection is JAX's;
`distributed` is inferred from `jax.device_count()` at use sites.
"""
from __future__ import annotations

import json
import os
from datetime import datetime
from typing import Optional


class NoneDict(dict):
    """dict returning None for missing keys (arbitrary nesting)."""

    def __missing__(self, key):
        return None


def to_nonedict(obj):
    if isinstance(obj, dict):
        return NoneDict({k: to_nonedict(v) for k, v in obj.items()})
    if isinstance(obj, list):
        return [to_nonedict(v) for v in obj]
    return obj


def load_commented_json(path: str) -> dict:
    text = []
    with open(path, "r", encoding="utf-8") as f:
        for line in f:
            text.append(line.split("//")[0])
    return json.loads("\n".join(text))


def timestamp() -> str:
    return datetime.now().strftime("%y%m%d_%H%M%S")


def parse_config(
    config_path: str,
    phase: str = "train",
    debug: bool = False,
    experiments_root: Optional[str] = None,
    make_dirs: bool = True,
) -> NoneDict:
    opt = load_commented_json(config_path)
    opt["phase"] = phase
    if debug:
        opt["name"] = f"debug_{opt['name']}"

    opt.setdefault("path", {})
    # a stable root (config key or kwarg) makes re-runs land in the same
    # tree — the precondition for `path.resume: "auto"` preemption recovery;
    # default stays the reference's timestamped experiments/{name}_{ts}
    root = (
        experiments_root
        or opt["path"].get("experiments_root")
        or os.path.join("experiments", f"{opt['name']}_{timestamp()}")
    )
    opt["path"]["experiments_root"] = root
    for key, sub in list(opt["path"].items()):
        if "resume" in key or "experiments" in key:
            continue
        opt["path"][key] = os.path.join(root, sub)
        if make_dirs:
            os.makedirs(opt["path"][key], exist_ok=True)

    if debug or "debug" in opt["name"]:
        train = opt.setdefault("train", {})
        train["val_freq"] = 2
        train["print_freq"] = 2
        train["save_checkpoint_freq"] = 3
        for ds in opt.get("datasets", {}).values():
            ds["data_len"] = 6
            if "batch_size" in ds:
                ds["batch_size"] = 2
        for sched in opt.get("model", {}).get("beta_schedule", {}).values():
            sched["n_timestep"] = 10
        # keep the halving chain valid at the shrunk T=10 (DistillTrainer
        # requires T % 2N == 0): 5 -> 1. Created even when the config ships
        # no distill block so `-p distill -debug` smokes instead of raising
        # T=10 % 2N=20 against the CLI default phases [10, 5].
        distill = train.get("distill")
        if not isinstance(distill, dict):
            distill = train["distill"] = {}
        distill["phases"] = [5, 1]
        distill["steps_per_phase"] = 2

    return to_nonedict(opt)


def dict2str(opt, indent: int = 1) -> str:
    msg = []
    for k, v in opt.items():
        if isinstance(v, dict):
            msg.append("  " * indent + f"{k}:[")
            msg.append(dict2str(v, indent + 1).rstrip("\n"))
            msg.append("  " * indent + "]")
        else:
            msg.append("  " * indent + f"{k}: {v}")
    return "\n".join(msg) + "\n"
