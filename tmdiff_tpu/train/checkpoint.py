"""Checkpoint / resume via orbax.

Reference semantics (`/root/reference/GeneralModel/model.py:100-140`): a
checkpoint per `val_freq` as `I{step}_gen.pth` (weights) + `I{step}_opt.pth`
(iter/scheduler/optimizer); resume restores weights non-strictly and only
`begin_step` (the optimizer restore is commented out). Here a checkpoint is
one orbax directory `I{step}` holding the full train state {step, params,
opt_state, ema_params}; resume restores everything by default, with a
`weights_only` mode mirroring the reference behavior. Reference `.pth`
checkpoints convert via `tmdiff_tpu.utils.torch_import`.
"""
from __future__ import annotations

import os
import re
from typing import Optional

import jax
import numpy as np
import orbax.checkpoint as ocp

from tmdiff_tpu.train.trainer import TrainState


def _ckpt_path(root: str, step: int) -> str:
    return os.path.join(os.path.abspath(root), f"I{step}")


def save_checkpoint(root: str, state: TrainState, keep: Optional[int] = None):
    """Atomic orbax save; `keep` prunes to the newest N checkpoints (the
    reference accumulates unboundedly, `model.py:100-120`)."""
    step = int(state.step)
    with ocp.StandardCheckpointer() as saver:
        saver.save(_ckpt_path(root, step), jax.device_get(state))
    if keep is not None:
        steps = sorted(
            int(m.group(1))
            for name in os.listdir(root)
            if (m := re.fullmatch(r"I(\d+)", name))
        )
        for old in steps[:-keep]:
            import shutil

            shutil.rmtree(_ckpt_path(root, old), ignore_errors=True)
    return _ckpt_path(root, step)


def latest_step(root: str) -> Optional[int]:
    if not os.path.isdir(root):
        return None
    steps = [
        int(m.group(1))
        for name in os.listdir(root)
        if (m := re.fullmatch(r"I(\d+)", name))
    ]
    return max(steps) if steps else None


def restore_checkpoint(root: str, template: TrainState,
                       step: Optional[int] = None,
                       weights_only: bool = False) -> TrainState:
    """Restore into the structure of `template`. `weights_only` replicates
    the reference's resume (params + step, fresh optimizer/EMA)."""
    if step is None:
        step = latest_step(root)
        if step is None:
            raise FileNotFoundError(f"no I<step> checkpoints under {root}")
    with ocp.StandardCheckpointer() as loader:
        restored = loader.restore(
            _ckpt_path(root, step), jax.device_get(template)
        )
    if weights_only:
        return template.replace(
            step=restored.step, params=restored.params, ema_params=restored.params
        )
    return restored


def import_reference_checkpoint(gen_pth: str, template: TrainState,
                                model=None) -> TrainState:
    """Load a reference `I{step}_gen.pth` into a fresh train state.

    A trained reference checkpoint only reproduces the reference's outputs
    when driven by the TRUE CLIP prompt vectors it was trained with, so this
    path refuses the placeholder table (tests transplant *random-init* torch
    models through our own exported embeddings and set TMDIFF_ALLOW_FAKE_CLIP)."""
    from tmdiff_tpu.models.clip_text import require_real_clip
    from tmdiff_tpu.utils.torch_import import import_state_dict, load_torch_state_dict

    require_real_clip(f"importing reference checkpoint {gen_pth!r}")

    sd = load_torch_state_dict(gen_pth)
    params = import_state_dict(sd, jax.device_get(template.params))
    m = re.search(r"I(\d+)_gen", os.path.basename(gen_pth))
    step = int(m.group(1)) if m else 0
    return template.replace(
        step=np.int32(step), params=params, ema_params=params
    )
