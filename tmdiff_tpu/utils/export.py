"""Data export utilities.

Parity surface: `/root/reference/utils/PNGfile.py` (h5 → per-image PNG +
question.jsonl exporter used for a VQA/GeoChat experiment) — generalised into
an h5 → PNG/GeoTIFF-ish dump with band selection, plus the .mat writer shape
used by the val loop.
"""
from __future__ import annotations

import json
import os
from typing import Optional, Sequence

import numpy as np


def to_uint8(img: np.ndarray, percentile_clip: float = 99.5) -> np.ndarray:
    """(H, W, C) float → uint8 with percentile stretch (satellite counts are
    heavy-tailed; a plain max scales to near-black images)."""
    hi = np.percentile(img, percentile_clip)
    lo = np.percentile(img, 100 - percentile_clip)
    out = np.clip((img - lo) / max(hi - lo, 1e-9), 0, 1)
    return (out * 255.0).round().astype(np.uint8)


def export_h5_to_png(
    h5_path: str,
    out_dir: str,
    rgb_bands: Sequence[int] = (2, 1, 0),
    max_images: int = -1,
    questions: Optional[str] = None,
    img_scale: Optional[float] = None,
):
    """Dump `gt` (or `lms`) RGB composites as PNGs; optionally emit a
    question.jsonl naming each image (PNGfile.py behavior)."""
    import cv2

    from tmdiff_tpu.data.h5 import load_pancollection

    data = load_pancollection(h5_path, img_scale)
    os.makedirs(out_dir, exist_ok=True)
    imgs = data["gt"]
    n = imgs.shape[0] if max_images <= 0 else min(max_images, imgs.shape[0])
    rows = []
    for i in range(n):
        rgb = np.transpose(imgs[i][list(rgb_bands)], (1, 2, 0))
        path = os.path.join(out_dir, f"img_{i}.png")
        cv2.imwrite(path, cv2.cvtColor(to_uint8(rgb), cv2.COLOR_RGB2BGR))
        rows.append({"image": os.path.basename(path), "question": questions or ""})
    if questions is not None:
        with open(os.path.join(out_dir, "question.jsonl"), "w") as f:
            for row in rows:
                f.write(json.dumps(row) + "\n")
    return n


def save_mat(path: str, sr_hwc: np.ndarray, img_scale: float = 1.0):
    """Val-loop artifact: {"sr": (H, W, C) × scale}
    (`general_…finetune.py:141-142`), stamped with the CLIP-conditioning
    mode so placeholder-table outputs are self-identifying."""
    import scipy.io as scio

    from tmdiff_tpu.models.clip_text import clip_mode

    scio.savemat(path, {"sr": sr_hwc * img_scale, "clip_mode": clip_mode()})
