"""Import reference PyTorch WavBEST checkpoints into flax param trees.

The reference saves `I{step}_gen.pth` as a CPU state_dict of the
GeneralDiffusion wrapper (`/root/reference/GeneralModel/model.py:100-120`),
whose denoiser keys are prefixed `denoise_fn.`. This converter maps each flax
parameter leaf to its torch key and transposes layouts:

  torch Conv3d  weight (O, I, kd, kh, kw) → flax kernel (kd, kh, kw, I, O)
  torch Linear  weight (O, I)             → flax kernel (I, O)

Dead reference parameters are dropped on purpose: the modulated convs' unused
biases (`Hyper_unet_general.py:74` passes bias=None), WaveletUPorDown's
unused `dense2`, and the frozen CLIP tower (excluded from the reference
optimizer, `model.py:26-27`).

Works on plain dict[str, np.ndarray]; use `load_torch_state_dict` to read a
.pth file (requires torch at conversion time only).
"""
from __future__ import annotations

from typing import Mapping

import jax
import numpy as np

# flax modconv layer name -> torch style-Dense sibling name
_MODCONV_STYLE = {"conv21": "dense2", "Conv_1": "dense1", "conv24": "dense2"}
# flax TimeMLP/PromptMLP layer -> torch Sequential index
_MLP_INDEX = {"lin0": "0", "lin1": "2", "lin2": "4"}


def _torch_key(path: tuple[str, ...]) -> tuple[str, str]:
    """flax param path -> (torch key, transform) where transform is one of
    'conv', 'linear', 'none'."""
    parts = [p for p in path if p != "params"]
    leaf = parts[-1]
    mods = parts[:-1]

    # MLP heads: embed/linN, embed2/linN -> embed.{0,2,4}.weight
    if mods and mods[0] in ("embed", "embed2") and mods[-1] in _MLP_INDEX:
        base = ".".join(mods[:-1] + [_MLP_INDEX[mods[-1]]])
        if leaf == "kernel":
            return base + ".weight", "linear"
        return base + ".bias", "none"

    # Style dense inside a modulated conv: <parent>/<mod>/style/{kernel,bias}
    if len(mods) >= 2 and mods[-1] == "style" and mods[-2] in _MODCONV_STYLE:
        parent = mods[:-2]
        torch_dense = _MODCONV_STYLE[mods[-2]]
        base = ".".join(parent + [torch_dense, "dense"])
        if leaf == "kernel":
            return base + ".weight", "linear"
        return base + ".bias", "none"

    # Modulated conv kernel (bias-free): <parent>/<mod>/kernel
    if mods and mods[-1] in _MODCONV_STYLE and leaf == "kernel":
        return ".".join(mods) + ".weight", "conv"

    # ResBlock temb Dense wrapper: dense1 -> dense1.dense.{weight,bias}
    if mods and mods[-1] == "dense1":
        base = ".".join(mods + ["dense"])
        return (base + ".weight", "linear") if leaf == "kernel" else (base + ".bias", "none")

    # WaveletUPorDown plain Linear: Dense_0
    if mods and mods[-1] == "Dense_0":
        base = ".".join(mods)
        return (base + ".weight", "linear") if leaf == "kernel" else (base + ".bias", "none")

    # Grouped high-frequency conv is a Sequential of one conv in the reference.
    if mods and mods[-1] == "convH_0":
        base = ".".join(mods) + ".0"
        return (base + ".weight", "conv") if leaf == "kernel" else (base + ".bias", "none")

    # Legacy transpose-conv up block (unet_util.py ResblockUpOneModulateBEST):
    # flax holds the kernel/bias directly as up_kernel/up_bias.
    if leaf == "up_kernel":
        return ".".join(mods + ["up1"]) + ".weight", "convtranspose"
    if leaf == "up_bias":
        return ".".join(mods + ["up1"]) + ".bias", "none"

    # Plain convs (conv20, Conv_0, Conv_2, res_conv, ...)
    base = ".".join(mods)
    if leaf == "kernel":
        return base + ".weight", "conv"
    return base + ".bias", "none"


def _transform(arr: np.ndarray, kind: str) -> np.ndarray:
    if kind == "conv":
        return np.transpose(arr, (2, 3, 4, 1, 0))
    if kind == "convtranspose":
        # torch ConvTranspose3d weight (in, out, kd, kh, kw) → (kd, kh, kw, in, out)
        return np.transpose(arr, (2, 3, 4, 0, 1))
    if kind == "linear":
        return np.transpose(arr, (1, 0))
    return arr


def import_state_dict(
    state_dict: Mapping[str, np.ndarray],
    flax_params,
    prefix: str = "denoise_fn.",
    strict: bool = True,
):
    """Fill `flax_params` (a template tree, e.g. from model.init) with the
    torch weights. Returns a new tree of the same structure."""
    sd = {k: np.asarray(v) for k, v in state_dict.items()}

    def fill(path, template):
        key, kind = _torch_key(tuple(str(p.key) for p in path))
        full = prefix + key
        if full not in sd and key in sd:
            full = key
        if full not in sd:
            if strict:
                raise KeyError(f"torch key {full!r} not found for flax leaf {path}")
            return template
        arr = _transform(sd[full], kind)
        if arr.shape != template.shape:
            raise ValueError(
                f"shape mismatch at {full}: torch {arr.shape} vs flax {template.shape}"
            )
        return arr.astype(np.asarray(template).dtype)

    return jax.tree_util.tree_map_with_path(fill, flax_params)


def _inverse_transform(arr: np.ndarray, kind: str) -> np.ndarray:
    if kind == "conv":
        # flax (kd, kh, kw, I, O) → torch (O, I, kd, kh, kw)
        return np.transpose(arr, (4, 3, 0, 1, 2))
    if kind == "convtranspose":
        # flax (kd, kh, kw, in, out) → torch (in, out, kd, kh, kw)
        return np.transpose(arr, (3, 4, 0, 1, 2))
    if kind == "linear":
        return np.transpose(arr, (1, 0))
    return arr


def export_state_dict(
    flax_params, prefix: str = "denoise_fn."
) -> dict[str, np.ndarray]:
    """Inverse of `import_state_dict`: map a flax WavBEST param tree onto
    the reference's torch state_dict keys/layouts so OUR trained weights
    load into the upstream model (`GeneralModel/model.py:122-140` resumes
    with strict=False, so the dead reference leaves we never materialise —
    modulated-conv biases, WaveletUPorDown.dense2, the frozen CLIP tower —
    may simply be absent). Round-trip with import_state_dict is exact
    (pinned by tests/test_torch_checkpoint.py)."""
    out = {}
    for path, leaf in jax.tree_util.tree_flatten_with_path(flax_params)[0]:
        key, kind = _torch_key(tuple(str(p.key) for p in path))
        out[prefix + key] = _inverse_transform(np.asarray(leaf), kind)
    return out


def save_torch_checkpoint(flax_params, path: str, prefix: str = "denoise_fn."):
    """Write an `I{step}_gen.pth`-compatible file from a flax param tree
    (torch import is local to conversion time, as in load_torch_state_dict)."""
    import torch

    # copy=True: jax-backed arrays are non-writable, torch wants ownership
    sd = {k: torch.from_numpy(np.array(v, copy=True))
          for k, v in export_state_dict(flax_params, prefix).items()}
    torch.save(sd, path)


def load_torch_state_dict(path: str) -> dict[str, np.ndarray]:
    """Read a reference .pth checkpoint into numpy (torch import is local)."""
    import torch

    sd = torch.load(path, map_location="cpu", weights_only=True)
    return {k: v.numpy() for k, v in sd.items() if not k.startswith("clip_text")
            and "clip_text" not in k}
