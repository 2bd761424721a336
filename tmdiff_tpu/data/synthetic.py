"""Synthetic PanCollection-format data for tests and CI.

Generates small correlated MS/PAN scenes (smooth random fields + shared
structure so pansharpening metrics behave sensibly), optionally written as
.h5 files with the reference key layout, so the full train/val path runs
with no real satellite data or downloads (SURVEY.md §4 test plan item c).
"""
from __future__ import annotations

import numpy as np


def make_scene(rng: np.random.Generator, bands: int, size: int, scale: int = 4):
    """One scene: returns (gt, ms, lms, pan) in [0, 1], reference layouts."""
    base = rng.random((size // 8, size // 8))
    up = np.kron(base, np.ones((8, 8)))[:size, :size]
    gt = np.stack([
        np.clip(0.2 + 0.6 * up + 0.15 * rng.standard_normal((size, size)) * 0.1
                + 0.05 * b / max(bands - 1, 1), 0, 1)
        for b in range(bands)
    ])
    pan = gt.mean(axis=0, keepdims=True)
    small = size // scale
    ms = gt.reshape(bands, small, scale, small, scale).mean(axis=(2, 4))
    lms = np.kron(ms, np.ones((scale, scale)))[:, :size, :size]
    return gt.astype(np.float32), ms.astype(np.float32), lms.astype(np.float32), pan.astype(np.float32)


def make_arrays(n: int = 8, bands: int = 4, size: int = 32, seed: int = 0) -> dict:
    rng = np.random.default_rng(seed)
    scenes = [make_scene(rng, bands, size) for _ in range(n)]
    gt, ms, lms, pan = (np.stack(z) for z in zip(*scenes))
    return {"gt": gt, "ms": ms, "lms": lms, "pan": pan, "img_scale": 1.0}


def write_h5(path: str, n: int = 8, bands: int = 4, size: int = 32,
             seed: int = 0, img_scale: float = 2047.0,
             full_resolution: bool = False):
    """Write a synthetic file in raw counts so loaders exercise the ÷scale.

    `full_resolution=True` omits the `gt` key — the PanCollection FR (real
    full-scale, no-reference) file layout."""
    import h5py

    data = make_arrays(n, bands, size, seed)
    keys = ("ms", "lms", "pan") if full_resolution else ("gt", "ms", "lms", "pan")
    with h5py.File(path, "w") as f:
        for key in keys:
            f.create_dataset(key, data=data[key] * img_scale)
    return path
