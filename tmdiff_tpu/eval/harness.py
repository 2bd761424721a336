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
) -> dict:
    n = len(dataset) if max_images <= 0 else min(max_images, len(dataset))
    if result_dir:
        os.makedirs(result_dir, exist_ok=True)
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
            if full_suite:
                vals = M.evaluate_rr(gt_hwc, pred_hwc, 1.0)
            else:
                vals = {
                    "ssim": M.ssim(pred_hwc, gt_hwc, 1.0),
                    "sam": M.sam(pred_hwc, gt_hwc),
                }
            for k, v in vals.items():
                sums[k] = sums.get(k, 0.0) + v
            idx_out += 1
    seconds_per_image = (time.time() - t0) / max(idx_out, 1)
    out = {f"{k}_{sensor}": v / idx_out for k, v in sums.items()}
    out[f"sec_per_image_{sensor}"] = seconds_per_image
    return out
