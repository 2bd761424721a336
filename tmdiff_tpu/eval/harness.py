"""Validation harness: run a sampler over a dataset, write .mat artifacts,
aggregate metrics.

Contract (`/root/reference/general_sharpening_joint_random_batch_finetune.py:126-152`):
per val image — sample, clamp to [0, 1], save `output_mulExm_{idx}.mat` with
key "sr" scaled back to sensor counts (H, W, C), accumulate SSIM + SAM
against ground truth, report per-sensor means and seconds/image. Deviations
(documented): images are batched through the sampler instead of batch-1
Python loops, the mean divides by the *correct* per-sensor count (the
reference divides every sensor's sum by len(val_loader_qb), `:147-149`),
and the full metric suite is reported rather than SSIM/SAM only.

Full-resolution (no-ground-truth) sets route to the no-reference suite
(D_λ / D_s / QNR / FCC / SF / SD — reference `core/metrics.py:287-384`)
instead of pretending the blurry lms upsample is ground truth.
"""
from __future__ import annotations

import os
import time
from typing import Optional

import numpy as np

from tmdiff_tpu.data.h5 import PanDataset
from tmdiff_tpu.eval import metrics as M
from tmdiff_tpu.pipeline import Pansharpener


def validate(
    sharpener: Pansharpener,
    dataset: PanDataset,
    sensor: str,
    result_dir: Optional[str] = None,
    method: str = "dpm++",
    batch_size: int = 4,
    max_images: int = -1,
    save_mat: bool = True,
    full_suite: bool = False,
    seed: int = 0,
    params=None,
    log_file: Optional[str] = None,
) -> dict:
    """`log_file` appends one JSON line of metrics per image — the working
    replacement for the reference's parsed-but-dead `-log_eval` wandb hook
    (`general_…finetune.py:64`, `core/logger.py:85-86`)."""
    n = len(dataset) if max_images <= 0 else min(max_images, len(dataset))
    if result_dir:
        os.makedirs(result_dir, exist_ok=True)
    log_fh = open(log_file, "a") if log_file else None
    sums: dict[str, float] = {}
    t0 = time.time()
    idx_out = 0
    for start in range(0, n, batch_size):
        idx = np.arange(start, min(start + batch_size, n))
        batch = dataset.batch(idx)
        preds = sharpener.sample(batch, sensor=sensor, method=method,
                                 seed=seed + start, params=params)
        for b in range(preds.shape[0]):
            pred_hwc = np.transpose(preds[b], (1, 2, 0))
            gt_hwc = np.transpose(batch["HR"][b], (1, 2, 0))
            if save_mat and result_dir:
                import scipy.io as scio

                scio.savemat(
                    os.path.join(result_dir, f"output_mulExm_{idx_out}.mat"),
                    {"sr": pred_hwc * dataset.img_scale},
                )
            if not dataset.has_reference:
                # FR set: no ground truth — no-reference quality indices
                # against the original low-res MS and the PAN.
                vals = M.evaluate_fr(
                    np.transpose(batch["LR"][b], (1, 2, 0)),
                    batch["PAN"][b, 0],  # (H, W) — FR metrics take 2-D PAN
                    pred_hwc,
                )
            elif full_suite:
                vals = M.evaluate_rr(gt_hwc, pred_hwc, 1.0)
            else:
                vals = {
                    "ssim": M.ssim(pred_hwc, gt_hwc, 1.0),
                    "sam": M.sam(pred_hwc, gt_hwc),
                }
            if log_fh:
                import json

                log_fh.write(json.dumps(
                    {"idx": idx_out, "sensor": sensor,
                     **{k: float(v) for k, v in vals.items()}}
                ) + "\n")
            for k, v in vals.items():
                sums[k] = sums.get(k, 0.0) + v
            idx_out += 1
    if log_fh:
        log_fh.close()
    seconds_per_image = (time.time() - t0) / max(idx_out, 1)
    out = {f"{k}_{sensor}": v / idx_out for k, v in sums.items()}
    out[f"sec_per_image_{sensor}"] = seconds_per_image
    return out
