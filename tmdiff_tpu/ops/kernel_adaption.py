"""Sensor-adaptive degradation operators (learnable PSF + subsample).

Reference: `/root/reference/core/kernelAdaption.py` — blur-then-subsample
degradations whose point-spread function is either a parametric Gaussian
built from a learnable 2×2 lower-triangular precision factor Q
(`kernel_generator:12-47`, `GaussianKernel:143-175`) or a free-form softmax
kernel (`EntireKernel:117-140`). Used to model each sensor's MS degradation
for degradation-consistency losses.

TPU form: depthwise `lax.conv_general_dilated` (feature_group_count=bands)
with a VALID window followed by stride-`scale` top-left subsampling, matching
the reference's `F.conv2d(...)[:, :, 0::s, 0::s]` exactly. Channels-last.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import linen as nn


def gaussian_kernel_from_q(q: jnp.ndarray, kernel_size: int, scale_factor: int,
                           shift: str = "center") -> jnp.ndarray:
    """(k, k) Gaussian PSF from the learnable factor Q: Σ⁻¹ = (Q∘mask)ᵀ(Q∘mask)."""
    mask = jnp.array([[1.0, 0.0], [1.0, 1.0]], q.dtype)
    m = q * mask
    inv_sigma = m.T @ m
    if shift == "left":
        mu = kernel_size // 2 - 0.5 * (scale_factor - 1)
    elif shift == "center":
        mu = kernel_size // 2
    elif shift == "right":
        mu = kernel_size // 2 + 0.5 * (scale_factor - 1)
    else:
        raise ValueError(shift)
    grid = jnp.stack(
        jnp.meshgrid(jnp.arange(kernel_size), jnp.arange(kernel_size),
                     indexing="ij"),
        axis=-1,
    ).astype(q.dtype) - mu  # (k, k, 2)
    quad = jnp.einsum("hwi,ij,hwj->hw", grid, inv_sigma, grid)
    raw = jnp.exp(-0.5 * quad)
    return raw / jnp.sum(raw)


def _blur_subsample(x, psf, scale):
    """x (B, H, W, C) depthwise-VALID conv with (k, k) psf, then 0::scale."""
    c = x.shape[-1]
    kernel = jnp.broadcast_to(psf[:, :, None, None], (*psf.shape, 1, c))
    out = jax.lax.conv_general_dilated(
        x, kernel.astype(x.dtype),
        window_strides=(1, 1), padding="VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=c,
    )
    return out[:, ::scale, ::scale, :]


class GaussianDegradation(nn.Module):
    """Learnable-Gaussian blur + subsample (`GaussianKernel:143-175`).
    Initialised at 5·I like the reference."""

    kernel_size: int
    scale_factor: int

    @nn.compact
    def __call__(self, x):
        q = self.param(
            "KernelParam", lambda key: 5.0 * jnp.eye(2, dtype=jnp.float32)
        )
        psf = gaussian_kernel_from_q(q, self.kernel_size, self.scale_factor)
        return _blur_subsample(x, psf, self.scale_factor)


class FreePSFDegradation(nn.Module):
    """Free-form softmax PSF of size (scale, scale) (`EntireKernel:117-140`)."""

    scale_factor: int

    @nn.compact
    def __call__(self, x):
        raw = self.param(
            "KernelAdaption", nn.initializers.normal(1.0),
            (self.scale_factor, self.scale_factor), jnp.float32,
        )
        psf = jax.nn.softmax(raw.reshape(-1)).reshape(raw.shape)
        return _blur_subsample(x, psf, self.scale_factor)
