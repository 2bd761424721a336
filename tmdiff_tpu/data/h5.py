"""PanCollection h5 data model.

Contract (`/root/reference/data/LRHR_dataset.py:87-133`): files hold `gt`
(HRMS), `ms` (LRMS), `lms` (bicubic-upsampled MS) and `pan`, each (N, C, H, W)
uint/float counts; values divide by 1023 (GaoFen-2, 10-bit) or 2047 (11-bit
sensors), inferred from the filename or passed explicitly. A sample is
  {LR, PAN, MS(=lms), HR, Res = HR − MS}  with Res ∈ [-1, 1]
(the diffusion target is the residual, `utils/util.py:140-142`).

Host-side numpy only — the TPU never sees the h5 layer. Arrays load once
into RAM (PanCollection sets fit comfortably); batches are sliced views.
Also ships the offline 4×4 patch merge/split utilities used for the 256²
repacked variants (`LRHR_dataset.py:17-53, 136-178`).
"""
from __future__ import annotations

import os
from typing import Optional

import numpy as np

KEYS = ("gt", "ms", "lms", "pan")


def infer_img_scale(path: str) -> float:
    return 1023.0 if "gf2" in os.path.basename(path).lower() else 2047.0


def load_pancollection(path: str, img_scale: Optional[float] = None) -> dict:
    import h5py

    from tmdiff_tpu.runtime import counts_to_float

    scale = infer_img_scale(path) if img_scale is None else img_scale
    out = {}
    with h5py.File(path, "r") as f:
        for key in KEYS:
            if key in f:
                out[key] = counts_to_float(np.asarray(f[key]), scale)
    # Full-resolution sets ship no ground truth; keep the lms stand-in for
    # shape purposes but RECORD the absence so evaluation routes to the
    # no-reference (D_λ/D_s/QNR) suite instead of fake-RR-against-lms
    # (reference behavior: `core/metrics.py:287-335`).
    out["has_reference"] = "gt" in out
    if not out["has_reference"]:
        out["gt"] = out["lms"]
    out["img_scale"] = scale
    return out


class PanDataset:
    """In-RAM dataset with reference sample semantics."""

    def __init__(self, path_or_arrays, img_scale: Optional[float] = None,
                 data_len: int = -1):
        if isinstance(path_or_arrays, str):
            data = load_pancollection(path_or_arrays, img_scale)
        else:
            data = dict(path_or_arrays)
        self.gt = data.get("gt")
        self.ms = data["ms"]
        self.lms = data["lms"]
        self.pan = data["pan"]
        self.has_reference = bool(data.get("has_reference", self.gt is not None))
        if self.gt is None:
            self.gt = self.lms
        self.img_scale = float(data.get("img_scale", img_scale or 2047.0))
        n = self.ms.shape[0]
        self.length = n if data_len <= 0 else min(data_len, n)

    def __len__(self):
        return self.length

    @property
    def bands(self) -> int:
        return self.gt.shape[1]

    def __getitem__(self, index):
        hr = self.gt[index]
        lms = self.lms[index]
        return {
            "LR": self.ms[index],
            "PAN": self.pan[index],
            "MS": lms,
            "HR": hr,
            "Res": hr - lms,
        }

    def batch(self, idx: np.ndarray) -> dict:
        """Batched gather via the native host kernels (numpy fallback)."""
        from tmdiff_tpu.runtime import gather_residual, gather_scale

        hr = gather_scale(self.gt, idx)
        lms = gather_scale(self.lms, idx)
        return {
            "LR": gather_scale(self.ms, idx),
            "PAN": gather_scale(self.pan, idx),
            "MS": lms,
            "HR": hr,
            "Res": gather_residual(self.gt, self.lms, idx),
        }


class LazyPanDataset:
    """Streaming variant of :class:`PanDataset` for sets larger than RAM:
    arrays stay in the h5 file (HDF5's chunk cache does the buffering) and
    each batch gathers + normalises only its rows. Same sample semantics and
    duck-typed API (len / bands / batch / __getitem__ / has_reference), so
    `BatchIterator`, the mixer, and the eval harness take it unchanged.

    The reference (and `PanDataset`) load everything up front
    (`LRHR_dataset.py:91-122`) — fine for PanCollection, not for production
    archives.
    """

    def __init__(self, path: str, img_scale: Optional[float] = None,
                 data_len: int = -1):
        import h5py

        self._file = h5py.File(path, "r")
        self.img_scale = float(
            infer_img_scale(path) if img_scale is None else img_scale
        )
        self.has_reference = "gt" in self._file
        self._gt_key = "gt" if self.has_reference else "lms"
        n = self._file["ms"].shape[0]
        self.length = n if data_len <= 0 else min(data_len, n)

    def __len__(self):
        return self.length

    @property
    def bands(self) -> int:
        return self._file[self._gt_key].shape[1]

    def _read(self, key: str, uniq: np.ndarray) -> np.ndarray:
        from tmdiff_tpu.runtime import counts_to_float

        return counts_to_float(
            np.asarray(self._file[key][uniq]), self.img_scale
        )

    def batch(self, idx: np.ndarray) -> dict:
        idx = np.asarray(idx)
        # h5py fancy indexing demands strictly-increasing unique indices;
        # gather the unique rows once and fan back out
        uniq, inv = np.unique(idx, return_inverse=True)
        hr = self._read(self._gt_key, uniq)[inv]
        lms = self._read("lms", uniq)[inv]
        return {
            "LR": self._read("ms", uniq)[inv],
            "PAN": self._read("pan", uniq)[inv],
            "MS": lms,
            "HR": hr,
            "Res": hr - lms,
        }

    def __getitem__(self, index):
        b = self.batch(np.array([index]))
        return {k: v[0] for k, v in b.items()}

    def close(self):
        self._file.close()


def merge_patches_4x4(imgs: np.ndarray) -> np.ndarray:
    """(16, C, h, w) → (C, 4h, 4w), row-major tiling."""
    b, c, h, w = imgs.shape
    assert b == 16
    grid = imgs.reshape(4, 4, c, h, w)
    return grid.transpose(2, 0, 3, 1, 4).reshape(c, 4 * h, 4 * w)


def split_patches_4x4(patch: np.ndarray) -> np.ndarray:
    """(C, 4h, 4w) → (16, C, h, w), inverse of :func:`merge_patches_4x4`."""
    c, ph, pw = patch.shape
    h, w = ph // 4, pw // 4
    grid = patch.reshape(c, 4, h, 4, w)
    return grid.transpose(1, 3, 0, 2, 4).reshape(16, c, h, w)


def repack_h5_merged(src: str, dst: str):
    """Offline 16→1 patch merger producing the 256² training variant
    (`read_h5`, `LRHR_dataset.py:136-178`)."""
    import h5py

    with h5py.File(src, "r") as f:
        arrays = {k: np.asarray(f[k], np.float32) for k in KEYS if k in f}
    merged = {k: [] for k in arrays}
    n = next(iter(arrays.values())).shape[0]
    for i in range(0, n - 15, 16):
        for k, v in arrays.items():
            merged[k].append(merge_patches_4x4(v[i : i + 16]))
    with h5py.File(dst, "w") as f:
        for k, v in merged.items():
            f.create_dataset(k, data=np.stack(v))
