"""On-device (jnp) metric twins of the reference's torch metric twins.

The reference ships torch variants of the core quality indices for
training-time / GPU evaluation alongside the numpy suite
(`/root/reference/core/metrics.py:388-503`: SAM_torch, SCC_torch,
QIndex_torch, D_lambda_torch, D_s_torch). These are their jnp equivalents:
batched NCHW, pure functions, jit/vmap/grad-safe — usable both as
device-side validation (no per-image device→host transfer; see
`eval/harness.py` fast path) and as differentiable losses.

Semantics follow the torch twins exactly (golden-pinned,
tests/golden/metrics_jnp.npz), including the reference's quirks:

  * `sam` converts with the literal constant 180/3.1415926 (`:406`), not π;
  * `scc`'s sobel is the 8-centre omnidirectional kernel with VALID
    padding (`:418-421`). Deviation: the torch original passes (N,C,H,W)
    straight into a 1-in-channel F.conv2d, which CRASHES for C>1 — here
    the kernel is applied per band (the only semantics that can run);
    C=1 matches torch bit-for-bit.
  * `d_lambda`/`d_s` average |ΔQ| over band pairs per the QNR paper; the
    band loops unroll at trace time (L ≤ 8 → at most 56 Q-index calls,
    each a handful of reductions — negligible against a UNet forward).

Aggregate means are over the batch (matching `torch.mean` over N), so a
whole validation batch costs ONE device program and returns scalars.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax

# the reference's degree conversion constant, NOT np.pi (`core/metrics.py:406`)
_DEG = 180.0 / 3.1415926

# 8-centre omnidirectional sobel (`core/metrics.py:418`)
_SOBEL8 = jnp.array(
    [[-1.0, -1.0, -1.0], [-1.0, 8.0, -1.0], [-1.0, -1.0, -1.0]], jnp.float32
)


def sam(x_true: jax.Array, x_pred: jax.Array) -> jax.Array:
    """Mean spectral angle in degrees over (N, C, H, W) batches
    (`SAM_torch:388-408`)."""
    dot = jnp.sum(x_true * x_pred, axis=1)
    n1 = jnp.linalg.norm(x_true, axis=1)
    n2 = jnp.linalg.norm(x_pred, axis=1)
    res = jnp.clip(dot / n2 / n1, -1.0, 1.0)
    return jnp.mean(jnp.arccos(res)) * _DEG


def sam_per_image(x_true: jax.Array, x_pred: jax.Array) -> jax.Array:
    """(N,) per-image SAM degrees — the harness fast path's per-image log."""
    dot = jnp.sum(x_true * x_pred, axis=1)
    n1 = jnp.linalg.norm(x_true, axis=1)
    n2 = jnp.linalg.norm(x_pred, axis=1)
    res = jnp.clip(dot / n2 / n1, -1.0, 1.0)
    return jnp.mean(jnp.arccos(res), axis=(1, 2)) * _DEG


def _sobel8(x: jax.Array) -> jax.Array:
    """VALID 3×3 conv with the 8-centre kernel, per band: (N, C, H, W) →
    (N, C, H-2, W-2)."""
    n, c, h, w = x.shape
    y = lax.conv_general_dilated(
        x.reshape(n * c, 1, h, w),
        _SOBEL8[None, None].astype(x.dtype),
        (1, 1), "VALID",
        dimension_numbers=("NCHW", "OIHW", "NCHW"),
    )
    return y.reshape(n, c, h - 2, w - 2)


def scc(x: jax.Array, y: jax.Array) -> jax.Array:
    """Mean spatial correlation of sobel high-pass maps (`SCC_torch:424-439`).
    Correlation per (image, band) over spatial dims, then mean."""
    x = _sobel8(x)
    y = _sobel8(y)
    vx = x - jnp.mean(x, axis=(2, 3), keepdims=True)
    vy = y - jnp.mean(y, axis=(2, 3), keepdims=True)
    num = jnp.sum(vx * vy, axis=(2, 3))
    den = jnp.sqrt(jnp.sum(vx * vx, axis=(2, 3))) * jnp.sqrt(
        jnp.sum(vy * vy, axis=(2, 3))
    )
    return jnp.mean(num / den)


def q_index(a: jax.Array, b: jax.Array, eps: float = 1e-8) -> jax.Array:
    """Universal quality index over (N, H, W) single-band batches
    (`QIndex_torch:442-461`): per-image moments, mean over the batch."""
    e_a = jnp.mean(a, axis=(1, 2))
    e_a2 = jnp.mean(a * a, axis=(1, 2))
    e_b = jnp.mean(b, axis=(1, 2))
    e_b2 = jnp.mean(b * b, axis=(1, 2))
    e_ab = jnp.mean(a * b, axis=(1, 2))
    var_a = e_a2 - e_a * e_a
    var_b = e_b2 - e_b * e_b
    cov = e_ab - e_a * e_b
    return jnp.mean(
        4 * cov * e_a * e_b / ((var_a + var_b) * (e_a**2 + e_b**2) + eps)
    )


def d_lambda(l_ms: jax.Array, ps: jax.Array) -> jax.Array:
    """Spectral distortion index over (N, C, H, W) (`D_lambda_torch:464-482`)."""
    L = ps.shape[1]
    acc = jnp.zeros(())
    for i in range(L):
        for j in range(L):
            if j != i:
                acc += jnp.abs(
                    q_index(ps[:, i], ps[:, j])
                    - q_index(l_ms[:, i], l_ms[:, j])
                )
    return acc / L / (L - 1)


def d_s(l_ms: jax.Array, pan: jax.Array, l_pan: jax.Array,
        ps: jax.Array) -> jax.Array:
    """Spatial distortion index (`D_s_torch:485-503`): pan/l_pan are
    (N, 1, H, W)/(N, 1, h, w)."""
    L = ps.shape[1]
    acc = jnp.zeros(())
    for i in range(L):
        acc += jnp.abs(
            q_index(ps[:, i], pan[:, 0]) - q_index(l_ms[:, i], l_pan[:, 0])
        )
    return acc / L


def ssim_per_image(pred: jax.Array, target: jax.Array,
                   data_range: float = 1.0) -> jax.Array:
    """(N,) Gaussian-window SSIM over NCHW batches — channels-last adapter
    around `utils/image_ops.ssim`, vmapped per image for the harness log."""
    from tmdiff_tpu.utils.image_ops import ssim as _ssim

    hwc_pred = jnp.transpose(pred, (0, 2, 3, 1))
    hwc_tgt = jnp.transpose(target, (0, 2, 3, 1))
    return jax.vmap(
        lambda p, t: _ssim(p[None], t[None], data_range)
    )(hwc_pred, hwc_tgt)
