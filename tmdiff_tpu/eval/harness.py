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


_BATCH_METRICS = None


def _device_batch_metrics():
    """Module-cached jitted SSIM+SAM pair: repeated validate() calls (every
    val_freq during training) reuse one program per batch shape instead of
    re-jitting a fresh closure per call."""
    global _BATCH_METRICS
    if _BATCH_METRICS is None:
        import jax

        from tmdiff_tpu.eval import metrics_jnp as MJ

        @jax.jit
        def f(pred, gt):
            return (MJ.ssim_per_image(pred, gt, 1.0),
                    MJ.sam_per_image(gt, pred))

        _BATCH_METRICS = f
    return _BATCH_METRICS


def validate(
    sharpener: Pansharpener,
    dataset: PanDataset,
    sensor: str,
    result_dir: Optional[str] = None,
    method: str = "dpm++",
    steps: Optional[int] = None,
    batch_size: int = 4,
    max_images: int = -1,
    save_mat: bool = True,
    full_suite: bool = False,
    seed: int = 0,
    params=None,
    log_file: Optional[str] = None,
    reference_parity: bool = False,
    device_metrics: bool = True,
) -> dict:
    """`log_file` appends one JSON line of metrics per image — the working
    replacement for the reference's parsed-but-dead `-log_eval` wandb hook
    (`general_…finetune.py:64`, `core/logger.py:85-86`).

    `reference_parity=True` declares the run's numbers will be compared
    against the PyTorch reference (the BASELINE "SAM/ERGAS within 1%"
    criterion). That comparison is meaningless while the sensor-prompt table
    is the placeholder (the model would be conditioned on noise), so the
    flag routes through `require_real_clip` and fails loudly.

    `device_metrics=True` (default) computes the standard SSIM+SAM pair
    on-device in ONE jitted call per batch (`eval/metrics_jnp.py` — the
    reference's torch-twin regime, `core/metrics.py:388-503`) instead of a
    per-image numpy loop. Honest accounting: `Pansharpener.sample` returns
    host numpy (the .mat writer needs it anyway), so this path re-uploads
    the batch once — the win is batched metric math, not transfer
    avoidance; fully-on-device scoring is `metrics_jnp` used directly
    against the sampler output inside one jit (see tests/test_metrics_jnp). SSIM deviates from the numpy suite by ≤1e-3
    (window boundary convention); SAM matches to 1e-5. The numpy path
    remains for `full_suite`/no-reference sets and `device_metrics=False`."""
    if reference_parity:
        from tmdiff_tpu.models.clip_text import require_real_clip

        require_real_clip("eval.harness.validate(reference_parity=True)")
    n = len(dataset) if max_images <= 0 else min(max_images, len(dataset))
    if result_dir:
        os.makedirs(result_dir, exist_ok=True)
    log_fh = open(log_file, "a") if log_file else None
    sums: dict[str, float] = {}
    t0 = time.time()
    idx_out = 0
    fast = device_metrics and dataset.has_reference and not full_suite
    if fast:
        import jax.numpy as jnp

        _batch_metrics = _device_batch_metrics()

    for start in range(0, n, batch_size):
        idx = np.arange(start, min(start + batch_size, n))
        batch = dataset.batch(idx)
        preds = sharpener.sample(batch, sensor=sensor, method=method,
                                 steps=steps, seed=seed + start, params=params)
        if fast:
            ssim_v, sam_v = _batch_metrics(
                jnp.asarray(preds), jnp.asarray(batch["HR"]))
            ssim_v, sam_v = np.asarray(ssim_v), np.asarray(sam_v)
        for b in range(preds.shape[0]):
            pred_hwc = np.transpose(preds[b], (1, 2, 0))
            gt_hwc = np.transpose(batch["HR"][b], (1, 2, 0))
            if save_mat and result_dir:
                from tmdiff_tpu.utils.export import save_mat as _write_mat

                _write_mat(
                    os.path.join(result_dir, f"output_mulExm_{idx_out}.mat"),
                    pred_hwc, img_scale=dataset.img_scale)
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
            elif fast:
                vals = {"ssim": float(ssim_v[b]), "sam": float(sam_v[b])}
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
