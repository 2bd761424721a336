"""Differentiable image filters and quality ops (jnp).

Parity surface: the kornia-style toolbox in `/root/reference/utils/util.py`
(`filter2D:173`, `BoxBlur:256`, `get_gaussian_kernel2d:452`, `SSIM:503-632`,
`psnr_loss:389`, `Laplacian:695`, `get_edge:123`) and the gradient operators
in `core/mylib.py` (`sobel_gradient:253`, `lpls_gradient:275`,
`Gaussian_Blur:292`, `get_hp/get_lp:192-243`). All channels-last
(B, H, W, C), pure jnp, differentiable — usable inside jitted losses.
"""
from __future__ import annotations

import math

import jax
import jax.numpy as jnp
from jax import lax


def filter2d(x: jax.Array, kernel: jax.Array, padding: str = "SAME") -> jax.Array:
    """Depthwise 2-D correlation with a shared (kh, kw) kernel."""
    c = x.shape[-1]
    k = jnp.broadcast_to(kernel[:, :, None, None], (*kernel.shape, 1, c))
    return lax.conv_general_dilated(
        x, k.astype(x.dtype), (1, 1), padding,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=c,
    )


def box_kernel(size: int) -> jnp.ndarray:
    return jnp.full((size, size), 1.0 / (size * size), jnp.float32)


def box_blur(x: jax.Array, size: int = 5) -> jax.Array:
    return filter2d(x, box_kernel(size))


def gaussian_kernel1d(size: int, sigma: float) -> jnp.ndarray:
    coords = jnp.arange(size, dtype=jnp.float32) - (size - 1) / 2.0
    g = jnp.exp(-(coords**2) / (2.0 * sigma**2))
    return g / jnp.sum(g)


def gaussian_kernel2d(size: int, sigma: float) -> jnp.ndarray:
    g = gaussian_kernel1d(size, sigma)
    return jnp.outer(g, g)


def gaussian_blur(x: jax.Array, size: int = 5, sigma: float = 1.0) -> jax.Array:
    return filter2d(x, gaussian_kernel2d(size, sigma))


def get_lp(x: jax.Array, size: int = 5, sigma: float = 1.0) -> jax.Array:
    """Low-pass (Gaussian blur) component."""
    return gaussian_blur(x, size, sigma)


def get_hp(x: jax.Array, size: int = 5, sigma: float = 1.0) -> jax.Array:
    """High-pass component: x − blur(x)."""
    return x - gaussian_blur(x, size, sigma)


def get_edge(x: jax.Array, size: int = 5) -> jax.Array:
    """Box-filter high-pass (`utils/util.py:123-131`)."""
    return x - box_blur(x, size)


SOBEL_X = jnp.array([[-1, 0, 1], [-2, 0, 2], [-1, 0, 1]], jnp.float32)
SOBEL_Y = jnp.array([[-1, -2, -1], [0, 0, 0], [1, 2, 1]], jnp.float32)
LAPLACIAN_K = jnp.array([[0, 1, 0], [1, -4, 1], [0, 1, 0]], jnp.float32)


def sobel_gradient(x: jax.Array):
    """(gx, gy) Sobel gradients per channel."""
    return filter2d(x, SOBEL_X), filter2d(x, SOBEL_Y)


def laplacian(x: jax.Array) -> jax.Array:
    return filter2d(x, LAPLACIAN_K)


def psnr(pred: jax.Array, target: jax.Array, data_range: float = 1.0):
    mse = jnp.mean((pred - target) ** 2)
    return 10.0 * jnp.log10(data_range**2 / mse)


def ssim(
    pred: jax.Array,
    target: jax.Array,
    data_range: float = 1.0,
    window_size: int = 11,
    sigma: float = 1.5,
    k1: float = 0.01,
    k2: float = 0.03,
):
    """Gaussian-window SSIM (the torch-side variant, `utils/util.py:503-632`),
    differentiable; mean over the map."""
    c1 = (k1 * data_range) ** 2
    c2 = (k2 * data_range) ** 2
    w = gaussian_kernel2d(window_size, sigma)
    mu_p = filter2d(pred, w, "VALID")
    mu_t = filter2d(target, w, "VALID")
    mu_pp = filter2d(pred * pred, w, "VALID")
    mu_tt = filter2d(target * target, w, "VALID")
    mu_pt = filter2d(pred * target, w, "VALID")
    var_p = mu_pp - mu_p**2
    var_t = mu_tt - mu_t**2
    cov = mu_pt - mu_p * mu_t
    s = ((2 * mu_p * mu_t + c1) * (2 * cov + c2)) / (
        (mu_p**2 + mu_t**2 + c1) * (var_p + var_t + c2)
    )
    return jnp.mean(s)


def sam_loss(pred: jax.Array, target: jax.Array, eps: float = 1e-8):
    """Differentiable spectral-angle (radians) over (B, H, W, C)."""
    dot = jnp.sum(pred * target, axis=-1)
    denom = jnp.linalg.norm(pred, axis=-1) * jnp.linalg.norm(target, axis=-1)
    cos = jnp.clip(dot / (denom + eps), -1 + 1e-7, 1 - 1e-7)
    return jnp.mean(jnp.arccos(cos))
