"""Pansharpening loss library.

Parity surface: the experimental loss zoo in
`/root/reference/core/mylib.py:310-1540` (loss_func1…32) distils into a few
orthogonal, composable terms — spectral consistency through a low-pass
degradation, PAN-gradient matching through Sobel/Laplacian high-frequency
operators, and plain pixel losses — which is what the 30 variants combine
with different weights. Only l1/l2/smooth_l1 are on the reference's active
path (`diffusion_general.py:76-84`); the rest ship here as a library.

All channels-last (B, H, W, C), pure jnp, jit/grad-safe.
"""
from __future__ import annotations

import dataclasses
from typing import Callable, Sequence

import jax.numpy as jnp

from tmdiff_tpu.utils import image_ops as ops


def l1(pred, target):
    return jnp.mean(jnp.abs(pred - target))


def l2(pred, target):
    return jnp.mean((pred - target) ** 2)


def smooth_l1(pred, target):
    d = jnp.abs(pred - target)
    return jnp.mean(jnp.where(d < 1.0, 0.5 * d**2, d - 0.5))


def spectral_consistency(pred, lr_ms, size: int = 5, sigma: float = 1.0,
                         scale: int = 4):
    """Blur+subsample the prediction and match the low-resolution MS —
    the Wald-protocol spectral term (mylib loss_func8-style blur path)."""
    lp = ops.gaussian_blur(pred, size, sigma)[:, ::scale, ::scale, :]
    return l1(lp, lr_ms)


def gradient_matching(pred, pan, mode: str = "sobel"):
    """Match the prediction's per-band spatial gradients to the PAN's
    (mylib `sobel_gradient:253` / `lpls_gradient:275` families)."""
    pan_b = jnp.broadcast_to(pan, pred.shape)
    if mode == "sobel":
        gx_p, gy_p = ops.sobel_gradient(pred)
        gx_t, gy_t = ops.sobel_gradient(pan_b)
        return 0.5 * (l1(gx_p, gx_t) + l1(gy_p, gy_t))
    if mode == "laplacian":
        return l1(ops.laplacian(pred), ops.laplacian(pan_b))
    raise NotImplementedError(mode)


def highpass_matching(pred, pan, size: int = 5, sigma: float = 1.0):
    """Match high-pass detail to the PAN's (mylib `get_hp:192` family)."""
    pan_b = jnp.broadcast_to(pan, pred.shape)
    return l1(ops.get_hp(pred, size, sigma), ops.get_hp(pan_b, size, sigma))


def ssim_loss(pred, target, data_range: float = 1.0):
    return 1.0 - ops.ssim(pred, target, data_range)


@dataclasses.dataclass
class CompositeLoss:
    """Weighted sum of named loss terms — the general shape every
    mylib.loss_funcN instantiates."""

    terms: Sequence[tuple[str, float, Callable]]

    def __call__(self, **kwargs):
        total = 0.0
        logs = {}
        for name, weight, fn in self.terms:
            val = fn(**kwargs) if _wants_kwargs(fn) else fn(
                kwargs["pred"], kwargs["target"]
            )
            logs[name] = val
            total = total + weight * val
        return total, logs


def _wants_kwargs(fn):
    import inspect

    params = inspect.signature(fn).parameters
    return any(p.kind == p.VAR_KEYWORD for p in params.values()) or set(
        params
    ) - {"pred", "target"}


class AverageMeter:
    """Running average tracker (`core/mylib.py:156-176`)."""

    def __init__(self):
        self.reset()

    def reset(self):
        self.val = 0.0
        self.sum = 0.0
        self.count = 0

    def update(self, val, n: int = 1):
        self.val = float(val)
        self.sum += float(val) * n
        self.count += n

    @property
    def avg(self):
        return self.sum / max(self.count, 1)
